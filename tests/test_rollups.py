"""Rollup-pyramid invariants (the DuckDB gate already proves each tier
equals a direct-from-raw recompute; these pin tier-to-tier algebra)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.rollups import (
    daily_from_hours,
    hourly_from_minutes,
    minute_rollup,
)


def test_tiers_conserve_mass(spark, sf_dir):
    """Event counts and cent sums are identical at every resolution —
    rollups re-bucket, they never drop or double-count."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    n = ev.count()
    cents = ev.agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
    ).collect()[0][0]
    for tier in (
        minute_rollup(spark, sf_dir),
        hourly_from_minutes(spark, sf_dir),
        daily_from_hours(spark, sf_dir),
    ):
        tot = tier.agg(
            F.sum("n_events").alias("n"), F.sum("value_cents").alias("c")
        ).collect()[0]
        assert tot["n"] == n and tot["c"] == cents


def test_tier_cardinality_shrinks_monotonically(spark, sf_dir):
    m = minute_rollup(spark, sf_dir).count()
    h = hourly_from_minutes(spark, sf_dir).count()
    d = daily_from_hours(spark, sf_dir).count()
    assert m >= h >= d > 0


def test_max_survives_two_merge_hops(spark, sf_dir):
    """The day tier's max_value (merged minute→hour→day) equals the
    direct per-day max over raw events."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    direct = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).agg(F.max("value").alias("mx"))
    merged = daily_from_hours(spark, sf_dir).select(
        "bucket", "event_type", "max_value"
    )
    diff = merged.join(direct, ["bucket", "event_type"]).filter(
        F.col("max_value") != F.col("mx")
    )
    assert diff.count() == 0
