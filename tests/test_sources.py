"""Source/sink coverage: month-partitioned fact layout with pruned
scans (§7.4.7) and the golden-output CSV materialization step (S8)."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators import sakila
from customer_revenue_analysis_sql_tableau_spark.sources.csv import read_csv
from customer_revenue_analysis_sql_tableau_spark.sources.parquet import (
    MONTH_COL,
    materialize_golden_outputs,
    read_months,
    write_month_partitioned,
)


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_month_partitioned_write_and_pruned_read(spark, sf_dir):
    orders = load_tables(spark, sf_dir, names=("orders",), register=False)["orders"]
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/orders_by_month"
        write_month_partitioned(orders, "o_orderdate", path)
        # physical layout: one directory per month
        dirs = sorted(glob.glob(f"{path}/{MONTH_COL}=*"))
        assert len(dirs) > 1

        months = [d.split("=")[-1] for d in dirs[:2]]
        pruned = read_months(spark, path, months)
        p = _plan(pruned)
        # partition pruning must reach the scan as PartitionFilters,
        # not a post-scan Filter
        assert "PartitionFilters" in p and MONTH_COL in p.split("PartitionFilters", 1)[1][:200]

        expected = orders.filter(
            F.date_format("o_orderdate", "yyyy-MM").isin(months)
        ).count()
        assert pruned.count() == expected


def test_golden_output_materialization(spark):
    tables = sakila.load_reference_tables(spark)
    view = sakila.customer_revenue_summary(spark, tables)
    q9 = sakila.q9(view)
    with tempfile.TemporaryDirectory() as tmp:
        materialize_golden_outputs(view, {"q9": q9}, tmp)
        dw_back = read_csv(spark, f"{tmp}/dw")
        assert dw_back.count() == 599
        assert dw_back.columns == sakila.VIEW_COLUMNS
        q9_back = read_csv(spark, f"{tmp}/q9")
        assert q9_back.count() == 108
        # single-file export (golden-style), plus Spark's _SUCCESS marker
        assert len(glob.glob(f"{tmp}/dw/part-*.csv")) == 1
