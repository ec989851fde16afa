"""Continuous-aggregate rollup pyramid (hypertable-style tiers).

Time-series warehouses maintain multi-resolution continuous aggregates:
a minute-grain rollup absorbs raw events, and each coarser tier (hour,
day) is maintained by **merging the next-finer tier**, never by
re-scanning raw data. The reference's monthly trend query
(``queries_shan.sql:109-115``, DATE_FORMAT '%Y-%m' cohorts) is the
single-tier ancestor of this pattern.

Every measure is mergeable by construction: counts and cent-quantized
value sums are exact longs (order-independent under partial
aggregation — the ``features.py`` moments argument), min/max are
idempotent-mergeable. **The oracle twin computes each tier directly
from raw events**, so the driver's hash check is a proof that
merge-from-finer-tier ≡ recompute-from-raw — the invariant continuous
aggregates depend on.

Scale posture (100 TB): the minute tier is one shuffle over
(minute, event_type) — the natural time-series partition key; hour and
day tiers aggregate frames that are 60× / 1440× smaller than their
input tier. At cluster scale each tier is a date-partitioned table and
a new micro-batch folds in via the same merge (see
``operators/incremental.py`` for the batch-fold machinery on the
customer view); here the tiers derive lazily in one plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def _minute_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.select(
        F.date_trunc("minute", "ts").alias("bucket"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        "value",
    )


def _finalize(df: DataFrame) -> DataFrame:
    """Attach the derived double amount; cents stay in the output so a
    consumer can keep merging without re-quantizing."""
    return df.select(
        "bucket",
        "event_type",
        "n_events",
        "value_cents",
        (F.col("value_cents").cast("double") / F.lit(100.0)).alias("total_value"),
        "max_value",
    )


def minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finest tier: per (minute, event_type) mergeable aggregates."""
    return _finalize(
        _minute_base(spark, sf_dir)
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
            F.max("value").alias("max_value"),
        )
    )


def _merge_tier(finer: DataFrame, unit: str) -> DataFrame:
    """Derive a coarser tier purely from the finer tier's mergeable
    measures — no raw-event access."""
    return _finalize(
        finer.groupBy(
            F.date_trunc(unit, "bucket").alias("bucket"), "event_type"
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
            F.max("max_value").alias("max_value"),
        )
    )


def hourly_from_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour tier merged from the minute tier (oracle: direct from raw)."""
    return _merge_tier(minute_rollup(spark, sf_dir), "hour")


def daily_from_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day tier merged from the hour tier — two merge hops from raw
    (oracle: direct from raw)."""
    return _merge_tier(hourly_from_minutes(spark, sf_dir), "day")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rollup_minute": minute_rollup,
    "rollup_hourly_from_minutes": hourly_from_minutes,
    "rollup_daily_from_hours": daily_from_hours,
}


def _direct_sql(unit: str) -> str:
    """Oracle: the tier computed straight from raw events — equality
    with the merged form proves the pyramid's merge invariant."""
    return f"""
        SELECT date_trunc('{unit}', ts) AS bucket, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS total_value,
               max(value) AS max_value
        FROM events GROUP BY 1, 2"""


ORACLES: dict[str, str] = {
    "rollup_minute": _direct_sql("minute"),
    "rollup_hourly_from_minutes": _direct_sql("hour"),
    "rollup_daily_from_hours": _direct_sql("day"),
}
