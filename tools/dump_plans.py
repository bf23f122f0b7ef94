"""Dump .explain("formatted") for headline queries to plans/$PQ_PLANS_ROUND/ (default r17).

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name suffix)
  query:  names to dump (default: every HEADLINE entry in bench.py)

The explain goes through QueryExecution.explainString on the final
DataFrame exactly as the bench would execute it (the bench's timed
action is .collect() on the same frame).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
import bench
from pq_vector_spark import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PQ_PLANS_ROUND", "r17"),
)


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(bench.HEADLINE)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("pq_plan_dump")
    qs = entry_mod.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not a declared query")
            continue
        try:
            df = fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {e!r}"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
