"""Property tests on the analytical view (SURVEY.md §5.3.5).

Invariants the reference's goldens encode implicitly:
- total revenue is conserved across any regrouping (q4 == q9 == view sum);
- Avg × count ≈ revenue (±rounding);
- every customer appears exactly once (inner join keeps all — every
  testdata customer has ≥1 order, mirroring the 599/599 reference fact).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.operators.queries import (
    q4_frequency_segmentation,
    q9_revenue_by_nation,
)
from customer_revenue_analysis_sql_tableau_spark.operators.warehouse import (
    customer_value_summary,
)


@pytest.fixture(scope="module")
def view(spark, sf_dir):
    df = customer_value_summary(spark, sf_dir)
    df.cache()
    yield df
    df.unpersist()


def test_one_row_per_customer(spark, view, sf_dir):
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert view.count() == n_customers
    assert view.select("Customer_ID").distinct().count() == n_customers


def test_revenue_conserved_across_groupings(spark, view, sf_dir):
    total = view.agg(
        F.sum(F.col("Total_Revenue").cast("decimal(18,2)")).alias("t")
    ).collect()[0]["t"]
    q4 = q4_frequency_segmentation(spark, sf_dir).agg(
        F.sum(F.col("Total_Revenue").cast("decimal(18,2)")).alias("t")
    ).collect()[0]["t"]
    q9 = q9_revenue_by_nation(spark, sf_dir).agg(
        F.sum(F.col("Total_Revenue").cast("decimal(18,2)")).alias("t")
    ).collect()[0]["t"]
    assert total == q4 == q9


def test_avg_times_count_matches_revenue(view):
    rows = view.select(
        "Total_Revenue", "Avg_Spending_Per_Order", "Total_Orders"
    ).collect()
    for r in rows:
        if r.Total_Revenue is None:
            continue
        assert math.isclose(
            r.Avg_Spending_Per_Order * r.Total_Orders,
            r.Total_Revenue,
            abs_tol=0.005 * r.Total_Orders + 1e-9,
        )


def test_line_items_never_exceed_orders_count(view):
    bad = view.filter(F.col("Total_Line_Items") > F.col("Total_Orders")).count()
    assert bad == 0
