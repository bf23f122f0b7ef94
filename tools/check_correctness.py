"""Mimic the driver's t2 correctness gate: run every __spark_entry__
queries() entry and its oracle_sql() via DuckDB at sf0.01 (or $SF_DIR),
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from pq_vector_spark import get_spark
from pq_vector_spark.sources.parquet import TABLES

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — we promise bit-identical doubles
        return repr(v)
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_cell(vals[i]) for i in order))
    return sorted(out)


def main():
    only = set(sys.argv[1:])
    spark = get_spark(shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        # Driver-canonicalizer contract: the gate pandas-sorts every output
        # column, which dies on non-hashable cells (lists/dicts). Reject
        # array/map/struct output columns HERE so local green implies
        # driver green (r6: embedding_centroids shipped an array<double>
        # column that passed this repr-based checker and failed the gate).
        if sql is not None:
            bad = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad:
                print(
                    f"FAIL {name}: non-scalar output columns {bad} — the "
                    "driver canonicalizer cannot hash these; emit a long "
                    "format or array_join to a string"
                )
                failures.append(name)
                continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(sql)
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            failures.append(name)
            continue
        sn, on_ = norm_rows(scols, [tuple(r) for r in srows]), norm_rows(ocols, orows)
        if sn != on_:
            ndiff = sum(1 for a, b in zip(sn, on_) if a != b)
            print(f"FAIL {name}: values differ in {ndiff}/{len(sn)} rows")
            for a, b in list(zip(sn, on_))[:200]:
                if a != b:
                    print(f"   spark: {a}\n   duck : {b}")
                    break
            failures.append(name)
            continue
        print(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
