"""End-to-end drive of the public package surface for /verify."""
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pq_vector_spark import (
    get_spark,
    topk,
    build_index,
    has_index,
    indexed_topk,
    pq_sql,
    validate_vector_column,
)
from pq_vector_spark.schema import VectorSchemaError
from pq_vector_spark.index.search import IndexError_
from pq_vector_spark.session import IndexBuildOptions, VectorTopKOptions
from pq_vector_spark.plans.sql import register_indexed_table
from pyspark.sql import functions as F

spark = get_spark(shuffle_partitions=8)
sf = "/root/testdata/sf0.001"
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]

# 1. brute-force topk through public API
bf = [r["vec_id"] for r in topk(emb, "embedding", q, 10, tie_break="vec_id").select("vec_id").collect()]
print("1 brute-force top10:", bf)

# 2. index build → sidecar exists
out = "/root/repo/.cache/emb_indexed"
shutil.rmtree(out, ignore_errors=True)
meta = build_index(spark, f"{sf}/embeddings.parquet", out, "embedding",
                   IndexBuildOptions(n_clusters=16, seed=42))
print("2 build meta:", meta)
assert has_index(out), "sidecar missing"
print("2 has_index:", has_index(out))

# 3. indexed topk, nprobe=all ⇒ exact equality with brute force
iv = [r["vec_id"] for r in indexed_topk(spark, out, q, 10,
        options=VectorTopKOptions(nprobe=16), tie_break="vec_id").select("vec_id").collect()]
print("3 ivf nprobe=all top10:", iv)
assert iv == bf, f"exactness envelope violated: {iv} vs {bf}"

# 4. indexed topk with small nprobe → recall
iv2 = [r["vec_id"] for r in indexed_topk(spark, out, q, 10,
        options=VectorTopKOptions(nprobe=4), tie_break="vec_id").select("vec_id").collect()]
recall = len(set(iv2) & set(bf)) / 10
print("4 ivf nprobe=4 recall@10:", recall)

# 5. SQL path routed through the indexed table
register_indexed_table(spark, "emb_idx", out)
qlit = "array(" + ",".join(repr(float(x)) for x in q) + ")"
sql_ids = [r["vec_id"] for r in pq_sql(
    spark, f"SELECT vec_id FROM emb_idx ORDER BY array_distance(embedding, {qlit}) LIMIT 5",
    options=VectorTopKOptions(nprobe=16)).collect()]
print("5 pq_sql indexed route top5:", sql_ids)
assert sql_ids[:5] == bf[:5]

# PROBES
# P1: DESC falls back to plain SQL (farthest, not nearest)
desc_ids = [r["vec_id"] for r in pq_sql(
    spark, f"SELECT vec_id FROM emb_idx ORDER BY array_distance(embedding, {qlit}) DESC LIMIT 3").collect()]
print("P1 DESC fallback top3 (farthest):", desc_ids, "— disjoint from nearest:", not set(desc_ids) & set(bf[:3]))

# P2: query dim mismatch → clean error
try:
    indexed_topk(spark, out, [1.0, 2.0], 5).collect()
    print("P2 FAIL: no error")
except IndexError_ as e:
    print("P2 dim-mismatch error:", e)

# P3: wrong column name → clean error
try:
    indexed_topk(spark, out, q, 5, column="nope")
    print("P3 FAIL: no error")
except IndexError_ as e:
    print("P3 column-mismatch error:", e)

# P4: build-time validation rejects NULL vectors
bad = spark.createDataFrame([(1, [1.0, 2.0]), (2, None)], "id INT, v ARRAY<FLOAT>")
try:
    validate_vector_column(bad, "v")
    print("P4 FAIL: no error")
except VectorSchemaError as e:
    print("P4 null-vector rejected:", e)

# P5: ragged dims rejected
ragged = spark.createDataFrame([(1, [1.0, 2.0]), (2, [1.0])], "id INT, v ARRAY<FLOAT>")
try:
    validate_vector_column(ragged, "v")
    print("P5 FAIL: no error")
except VectorSchemaError as e:
    print("P5 ragged rejected:", e)

# P6: n_clusters > rows rejected
try:
    build_index(spark, f"{sf}/embeddings.parquet", out + "2", "embedding",
                IndexBuildOptions(n_clusters=10_000))
    print("P6 FAIL: no error")
except VectorSchemaError as e:
    print("P6 n_clusters>rows rejected:", e)

# P7: indexed table reads back as a PLAIN parquet table (standard-reader invariant)
import duckdb
n = duckdb.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
print("P7 duckdb reads indexed layout as plain parquet, rows:", n)
assert n == 500

spark.stop()
print("VERIFY DRIVE OK")
