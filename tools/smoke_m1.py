"""Quick M1 smoke: brute-force knn on sf0.001, compare bit-exactness vs DuckDB."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pq_vector_spark import get_spark, brute_force_topk
from pq_vector_spark.functions.distance import array_distance
from pyspark.sql import functions as F

spark = get_spark(shuffle_partitions=8)
sf = "/root/testdata/sf0.001"
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]

res = brute_force_topk(emb, "embedding", q, 10, tie_break="vec_id", keep_distance=True)
rows = res.select("vec_id", "_pq_distance").collect()
spark_out = [(r[0], r[1]) for r in rows]
print("spark:", spark_out)

con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
oracle = con.sql(
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
      sqrt(list_reduce(
        list_transform(list_zip(embedding, (SELECT qe FROM q)),
          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
        (a, b) -> a + b)) AS d
    FROM embeddings ORDER BY d, vec_id LIMIT 10
    """
).fetchall()
print("duck :", oracle)
assert [r[0] for r in spark_out] == [r[0] for r in oracle], "vec_id mismatch"
bitexact = all(abs(a[1] - b[1]) == 0.0 for a, b in zip(spark_out, oracle))
print("bit-exact distances:", bitexact)

# SQL path via pq_sql macro expansion
from pq_vector_spark import pq_sql

emb.createOrReplaceTempView("embeddings")
qlit = "array(" + ",".join(repr(float(x)) for x in q) + ")"
sql_res = pq_sql(
    spark,
    f"SELECT vec_id FROM embeddings ORDER BY array_distance(embedding, {qlit}), vec_id LIMIT 10",
).collect()
print("sql path:", [r[0] for r in sql_res])
assert [r[0] for r in sql_res] == [r[0] for r in oracle]

res.explain("formatted")
spark.stop()
print("M1 SMOKE OK")
