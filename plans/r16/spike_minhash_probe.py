"""Probe the EXECUTED adaptive plans of dedup_minhash_lsh / _grouped for
duplicate-scan / duplicate-subtree opportunities (VERDICT r15 item 4).

Runs each entry once at $SPARK_GRAFT_SF_DIR, prints the final executed
plan's FileScan / ReusedExchange / Exchange / HashAggregate census and
the full executed plan to a file for inspection.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import __spark_entry__ as entrymod
from customer_revenue_analysis_sql_tableau_spark.session import get_spark


def census(plan: str) -> dict:
    import re

    return {
        "FileScan": len(re.findall(r"FileScan|Scan parquet", plan)),
        "ScanRDD": plan.count("Scan ExistingRDD"),
        "Exchange": len(re.findall(r"\bExchange\b", plan)) - plan.count("ReusedExchange"),
        "ReusedExchange": plan.count("ReusedExchange"),
        "HashAggregate": plan.count("HashAggregate"),
        "SortMergeJoin": plan.count("SortMergeJoin"),
        "ShuffledHashJoin": plan.count("ShuffledHashJoin"),
        "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minhash-probe")
    qs = entrymod.queries()
    for name in sys.argv[1:] or ["dedup_minhash_lsh", "dedup_minhash_lsh_grouped"]:
        df = qs[name](spark, sf_dir)
        df.collect()  # executes df's own QueryExecution so AQE finalizes
        executed = df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"probe_{name}_executed.txt")
        with open(out, "w") as f:
            f.write(executed)
        print(name, census(executed), "->", out)


if __name__ == "__main__":
    main()
