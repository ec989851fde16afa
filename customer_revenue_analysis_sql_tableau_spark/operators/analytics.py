"""Event-stream product analytics (funnel, retention, sequences).

The reference's analytics surface is customer-revenue BI (the
``customer_revenue_summary`` view and q1-q11, ``queries_shan.sql:7-144``);
its insight list (README.md:10-15) includes churn and engagement. These
operators extend that surface to the event-stream shape of the driver's
``events`` table — the behavioral-analytics queries a warehouse over
clickstream data answers: funnel conversion, cohort retention, and
event-sequence frequency.

All four are pure DataFrame compositions (no Python UDFs) with DuckDB
oracle twins:

- **Funnel stage counts** — users reaching view → click → purchase *in
  order* (each stage's first event at-or-after the previous stage's
  first event). Each stage is a per-user ``groupBy``/``min`` plus an
  equi-join on ``user_id`` — all shuffles key on ``user_id`` so AQE can
  reuse the partitioning; nothing is windowed globally.
- **Funnel conversion lag** — per completing user, microsecond gaps
  between stage firsts (``F.unix_micros`` ↔ DuckDB ``epoch_us`` — the
  exact-integer timestamp idiom from ``temporal.py``).
- **Retention cohorts** — users bucketed by first-seen day, activity
  counted per (cohort, day-offset). Cohort dates are rendered as
  strings in both dialects (compare_frames stringifies date vs
  datetime64 differently — same hazard as ``functions/gallery.py``).
- **Event-type bigrams** — per-user ordered transition pairs via
  ``lead`` over a ``user_id``-partitioned window (never a global
  window; state is bounded by one user's events, exactly the
  sessionization posture from ``streaming/windows.py``).

Scale posture (100 TB): every shuffle here keys on ``user_id`` — the
natural high-cardinality partition key of a clickstream; with facts
bucketed by ``user_id`` (``sources/parquet.py:save_bucketed``) the three
funnel joins and the bigram window would all be shuffle-free. Stage
counts reduce to one row per stage via partial+final aggregation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

#: Ordered funnel stages over ``events.event_type``.
FUNNEL_STAGES: tuple[str, ...] = ("view", "click", "purchase")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("events",))["events"]


def _stage_firsts(ev: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Per-user first timestamp of each funnel stage, ordered: the first
    click at-or-after the first view, the first purchase at-or-after
    that click."""
    v = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.min("t_view").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("t_purchase"),
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
        )
    )
    return v, c, p


def funnel_stage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage_ord, stage, users): users reaching each ordered stage."""
    v, c, p = _stage_firsts(_events(spark, sf_dir))

    def row(ord_: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("users")).select(
            F.lit(ord_).alias("stage_ord"), F.lit(name).alias("stage"), "users"
        )

    return (
        row(1, FUNNEL_STAGES[0], v)
        .unionAll(row(2, FUNNEL_STAGES[1], c))
        .unionAll(row(3, FUNNEL_STAGES[2], p))
    )


def funnel_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user completing the whole funnel: microsecond lags between
    stage firsts. Exact integers — no float time arithmetic."""
    _, _, p = _stage_firsts(_events(spark, sf_dir))
    return p.select(
        "user_id",
        (F.unix_micros("t_click") - F.unix_micros("t_view")).alias(
            "view_to_click_us"
        ),
        (F.unix_micros("t_purchase") - F.unix_micros("t_click")).alias(
            "click_to_purchase_us"
        ),
        (F.unix_micros("t_purchase") - F.unix_micros("t_view")).alias(
            "total_us"
        ),
    )


def retention_day_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_date, day_offset, active_users): classic retention
    triangle. Cohort = first-seen calendar day; activity deduplicated to
    (user, day) before counting so a busy day counts once."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    )
    act = ev.distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


def event_type_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type, pairs): adjacent event-type transition
    counts per user stream, ordered by (ts, event_id) for a total
    deterministic order under timestamp ties."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w))
    return (
        pairs.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("prev_type"),
            "next_type",
        )
        .agg(F.count("*").alias("pairs"))
    )


#: Session gap: a pause longer than this starts a new session. 120
#: minutes suits the sparse synthetic clickstream (~2 events/user/day);
#: production clickstreams use the same operator with 30.
SESSION_GAP_MIN = 120
_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: split each user's event stream wherever
    the pause exceeds ``SESSION_GAP_MIN``, then per-session stats.

    The classic two-window recipe — ``lag`` marks session starts, a
    running ``sum`` over the same (user_id)-partitioned ordering numbers
    them — followed by one (user_id, session_idx) aggregation. This is
    the batch twin of ``streaming/windows.py``'s session windows, as a
    warehouse query: all three steps shuffle on ``user_id`` only (state
    bounded by one user's events), so with facts bucketed by user_id
    the whole plan is shuffle-free. Microsecond-exact integer time
    arithmetic (``unix_micros`` ↔ ``epoch_us``). SQL-checked.
    """
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            (F.col("us") - F.lag("us").over(w)) > F.lit(_GAP_US), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "analytics_funnel_stage_counts": funnel_stage_counts,
    "analytics_funnel_conversion_lag": funnel_conversion_lag,
    "analytics_retention_day_cohorts": retention_day_cohorts,
    "analytics_event_type_bigrams": event_type_bigrams,
    "analytics_sessionize_events": sessionize_events,
}

_FUNNEL_CTES = f"""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = '{FUNNEL_STAGES[0]}'
        GROUP BY user_id),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click, min(v.t_view) AS t_view
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts >= v.t_view
        GROUP BY e.user_id),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase,
               min(c.t_view) AS t_view, min(c.t_click) AS t_click
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts >= c.t_click
        GROUP BY e.user_id)
"""

ORACLES: dict[str, str] = {
    "analytics_funnel_stage_counts": _FUNNEL_CTES
    + f"""
    SELECT 1 AS stage_ord, '{FUNNEL_STAGES[0]}' AS stage,
           (SELECT count(*) FROM v) AS users
    UNION ALL
    SELECT 2, '{FUNNEL_STAGES[1]}', (SELECT count(*) FROM c)
    UNION ALL
    SELECT 3, '{FUNNEL_STAGES[2]}', (SELECT count(*) FROM p)""",
    "analytics_funnel_conversion_lag": _FUNNEL_CTES
    + """
    SELECT user_id,
           epoch_us(t_click) - epoch_us(t_view) AS view_to_click_us,
           epoch_us(t_purchase) - epoch_us(t_click) AS click_to_purchase_us,
           epoch_us(t_purchase) - epoch_us(t_view) AS total_us
    FROM p""",
    "analytics_retention_day_cohorts": """
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    f AS (
        SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_date,
           date_diff('day', f.cohort_day, act.day) AS day_offset,
           count(*) AS active_users
    FROM act JOIN f ON act.user_id = f.user_id
    GROUP BY 1, 2""",
    "analytics_event_type_bigrams": """
    WITH o AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events)
    SELECT event_type AS prev_type, next_type, count(*) AS pairs
    FROM o WHERE next_type IS NOT NULL
    GROUP BY 1, 2""",
    "analytics_sessionize_events": f"""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        FROM events),
    marked AS (
        SELECT *,
               CASE WHEN us - lag(us) OVER w > {_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    numbered AS (
        SELECT *,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM marked)
    SELECT user_id, session_idx,
           count(*) AS n_events,
           min(us) AS start_us,
           max(us) AS end_us,
           max(us) - min(us) AS duration_us,
           count(DISTINCT event_type) AS n_event_types
    FROM numbered
    GROUP BY 1, 2""",
}
