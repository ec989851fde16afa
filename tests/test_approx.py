"""Sketch-tier distinct counts: error bound vs exact (§7.4.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.relational import (
    approx_distinct_customers_by_nation,
)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r["status"]: r["approx_customers"]
        for r in approx_distinct_customers_by_nation(spark, sf_dir).collect()
    }
    o = load_tables(spark, sf_dir, names=("orders",), register=False)["orders"]
    exact = {
        r["status"]: r["n"]
        for r in o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for status, n in exact.items():
        # 2% rsd sketch: allow 6% (3 sigma) relative error
        assert abs(approx[status] - n) <= max(3, 0.06 * n), (
            status,
            approx[status],
            n,
        )
