"""A/B the directed-pagerank edge build (VERDICT r16 item 6): current
two-DISTINCT two-scan form vs a concurrency-preserving one-pass form —
the flagged (customer, part) aggregate materialized ONCE, both legs
emitted as a union over the checkpoint (one fact scan, two cheap
branch reads). Verifies the edge set identical, then interleaved
min-of-N on the full graph_pagerank_directed entry.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.session import get_spark
from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators import graph as G


def onepass_edges(spark, sf_dir):
    t = load_tables(spark, sf_dir, names=("lineitem", "orders"), register=False)
    li, o = t["lineitem"], t["orders"]
    joined = li.join(
        o.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_custkey").alias("custkey"),
        ),
        "l_orderkey",
    )
    flagged = (
        joined.groupBy("custkey", "l_partkey")
        .agg(
            F.max(
                F.when(
                    (F.col("l_returnflag") == "R")
                    & (F.col("l_quantity") >= G.RETURN_QTY_MIN),
                    1,
                ).otherwise(0)
            ).alias("ret")
        )
        .localCheckpoint()
    )
    fwd = flagged.select(
        (F.col("custkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    ret = flagged.filter(F.col("ret") == 1).select(
        (F.col("l_partkey") * 2 + 1).alias("src"),
        (F.col("custkey") * 2).alias("dst"),
    )
    return fwd.union(ret)


def timed_entry(spark, sf_dir):
    t0 = time.perf_counter()
    df = G.graph_pagerank_directed(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N", "5"))
    spark = get_spark("pagerank-edge-ab")

    old = G._supply_return_edges
    # edge-set identity
    e_old = set(map(tuple, old(spark, sf_dir).collect()))
    e_new = set(map(tuple, onepass_edges(spark, sf_dir).collect()))
    assert e_old == e_new, (len(e_old), len(e_new), list(e_old ^ e_new)[:5])
    print(f"edge sets identical: OK ({len(e_old)} edges)")

    # warmup both
    G._supply_return_edges = old
    timed_entry(spark, sf_dir)
    G._supply_return_edges = onepass_edges
    timed_entry(spark, sf_dir)

    res = {"old": [], "new": []}
    for i in range(n):
        G._supply_return_edges = old
        res["old"].append(timed_entry(spark, sf_dir))
        G._supply_return_edges = onepass_edges
        res["new"].append(timed_entry(spark, sf_dir))
    for k, v in res.items():
        print(k, "min", round(min(v), 3), [round(x, 3) for x in v])


if __name__ == "__main__":
    main()
