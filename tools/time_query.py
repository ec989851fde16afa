"""Isolated min-of-N timing of single registry queries (guide §1.4):
one warm-up execution at sf0.001 (codegen compile), then N timed
executions at $SPARK_GRAFT_SF_DIR, each materialized through the noop
sink (computes every column of every row, no driver transfer) unless
the entry is one the bench times via count() — pass --count to match
the bench's action instead.

Usage: python tools/time_query.py [--n 3] [--count] <query> [<query>...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from customer_revenue_analysis_sql_tableau_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    n = 3
    use_count = False
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    if "--count" in args:
        use_count = True
        args.remove("--count")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entrymod.queries()
    spark = get_spark("time-query")

    def run(fn, d: str) -> float:
        t0 = time.perf_counter()
        df = fn(spark, d)
        if use_count:
            assert df.count() >= 0
        else:
            df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        run(fn, "/root/testdata/sf0.001")  # codegen warmup
        samples = [run(fn, sf_dir) for _ in range(n)]
        print(
            f"{name}: min={min(samples):.3f}s samples="
            f"{[round(s, 3) for s in samples]}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
