"""Semantic invariants for the event-analytics family (beyond the
DuckDB hash check): funnel monotonicity, retention totals, bigram
conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.analytics import (
    event_type_bigrams,
    funnel_conversion_lag,
    funnel_stage_counts,
    retention_day_cohorts,
)


def test_funnel_counts_are_monotone_nonincreasing(spark, sf_dir):
    """Each ordered stage can only lose users relative to the previous
    one — a funnel that gains users mid-way is mis-joined."""
    rows = funnel_stage_counts(spark, sf_dir).orderBy("stage_ord").collect()
    counts = [r["users"] for r in rows]
    assert len(counts) == 3
    assert counts[0] >= counts[1] >= counts[2] >= 0


def test_funnel_lag_ordering_and_cardinality(spark, sf_dir):
    """Lags are non-negative (stages happen in order) and the lag table
    has exactly one row per user completing the last stage."""
    lag = funnel_conversion_lag(spark, sf_dir)
    assert lag.filter(
        (F.col("view_to_click_us") < 0)
        | (F.col("click_to_purchase_us") < 0)
        | (
            F.col("total_us")
            != F.col("view_to_click_us") + F.col("click_to_purchase_us")
        )
    ).count() == 0
    stage3 = (
        funnel_stage_counts(spark, sf_dir)
        .filter(F.col("stage_ord") == 3)
        .collect()[0]["users"]
    )
    assert lag.count() == stage3 == lag.select("user_id").distinct().count()


def test_retention_day_zero_accounts_for_every_user(spark, sf_dir):
    """Every user is active on their own cohort day, so the offset-0
    diagonal sums to the total distinct-user count."""
    r = retention_day_cohorts(spark, sf_dir)
    assert r.filter(F.col("day_offset") < 0).count() == 0
    day0 = (
        r.filter(F.col("day_offset") == 0)
        .agg(F.sum("active_users"))
        .collect()[0][0]
    )
    users = (
        load_tables(spark, sf_dir, names=("events",))["events"]
        .select("user_id")
        .distinct()
        .count()
    )
    assert day0 == users


def test_bigram_pairs_conserve_event_count(spark, sf_dir):
    """A stream of n events per user yields exactly n-1 adjacent pairs:
    Σ pairs = total events − distinct users."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    total = ev.count()
    users = ev.select("user_id").distinct().count()
    pairs = (
        event_type_bigrams(spark, sf_dir).agg(F.sum("pairs")).collect()[0][0]
    )
    assert pairs == total - users


def test_sessionize_conserves_events_and_respects_gap(spark, sf_dir):
    """Sessions partition the event stream: Σ n_events = total events;
    every session's internal gaps are <= the threshold and consecutive
    sessions of a user are separated by > the threshold (checked via a
    python re-derivation for a sample user)."""
    from customer_revenue_analysis_sql_tableau_spark.operators.analytics import (
        _GAP_US,
        sessionize_events,
    )

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    out = sessionize_events(spark, sf_dir)
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    assert out.filter(F.col("duration_us") < 0).count() == 0
    assert out.filter(F.col("end_us") < F.col("start_us")).count() == 0
    # python twin for the busiest user
    busiest = (
        ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first()
    )["user_id"]
    times = sorted(
        (r.us, r.event_id)
        for r in ev.filter(F.col("user_id") == busiest)
        .select(F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    sessions, cur = [], [times[0][0]]
    for (prev, _), (t, _) in zip(times, times[1:]):
        if t - prev > _GAP_US:
            sessions.append(cur)
            cur = []
        cur.append(t)
    sessions.append(cur)
    got = (
        out.filter(F.col("user_id") == busiest)
        .orderBy("session_idx")
        .collect()
    )
    assert [r.n_events for r in got] == [len(s) for s in sessions]
    assert [r.start_us for r in got] == [s[0] for s in sessions]
    assert [r.end_us for r in got] == [s[-1] for s in sessions]
