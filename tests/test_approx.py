"""Sketch-tier distinct counts: error bound vs exact (§7.4.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.relational import (
    approx_distinct_customers_by_nation,
)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r["nation"]: r["approx_customers"]
        for r in approx_distinct_customers_by_nation(spark, sf_dir).collect()
    }
    t = load_tables(
        spark, sf_dir, names=("orders", "customer", "nation"), register=False
    )
    exact = {
        r["nation"]: r["n"]
        for r in t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            t["nation"].select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for nation, n in exact.items():
        # 2% rsd sketch: allow 6% (3 sigma) relative error
        assert abs(approx[nation] - n) <= max(3, 0.06 * n), (
            nation,
            approx[nation],
            n,
        )
