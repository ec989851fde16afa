"""Temporal operators over ``events``: as-of join, range join, pivot,
percentiles (driver mandate — operators Spark lacks as single builtins,
re-expressed as compositions of DataFrame ops, SURVEY §7.5 pattern (a)).

The reference is batch BI with no temporal joins; a training-data /
event-analytics engine needs them:

- **As-of join** — for each purchase, the latest click by the same user
  at-or-before the purchase. Spark has no ASOF JOIN; the scalable form
  is union-the-streams + per-user ordered window + ``last(ignorenulls)``
  carry-forward: one shuffle on user_id, no pairwise blowup, works at
  any history length. (A per-key ``applyInPandas`` merge would cap the
  per-user history in executor memory; the window form streams it.)
  Oracle: DuckDB's native ``ASOF LEFT JOIN``.
- **Range join** — clicks within the 10 minutes preceding each error,
  same user. Naive inequality joins explode (Spark would nested-loop);
  the scale path bins both sides to window-width buckets and equi-joins
  on (user, bin) with the click side exploded to its two candidate
  bins, then applies the exact range filter. Shuffle is bounded by
  bucket fan-out = 2.
- **Pivot** — per-user event_type × sum(value) matrix with a FIXED
  column list (never let ``pivot()`` scan for distinct values at 100 TB
  — that is an extra full pass). Money-style decimal cast keeps sums
  order-independent; the oracle is conditional aggregation.
- **Percentiles** — exact interpolated ``percentile`` per event_type
  (DuckDB ``quantile_cont`` twin). Exact percentile is a sort-based agg;
  the sketch tier for 100 TB is ``approx_percentile`` (same shape as
  the HLL tier in ``relational.approx_distinct_customers_by_nation``).

Both engines interpolate at index p*(n-1); scores rounded to 9 dp as in
``text.tfidf_top_terms`` (JVM vs libm last-ulp).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

#: Range-join window width (also the binning width — they must match).
RANGE_MINUTES = 10

#: Fixed pivot column list (event_type is a closed enum in this domain).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("events",))["events"]


def _clicks_dedup(e: DataFrame) -> DataFrame:
    """One click per (user_id, ts) — max event_id — so the as-of pick
    among same-instant clicks is deterministic in both engines."""
    return (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )


def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, ts, click_id, click_ts, gap_us): each
    purchase matched to the latest same-user click with click.ts <= ts;
    NULLs when no prior click exists (left as-of semantics)."""
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = _clicks_dedup(e)

    # Tag and union the two streams; at equal ts the click sorts first
    # (is_p 0 < 1) so an exactly-simultaneous click is matched (>=).
    left = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_p"),
        "event_id",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    right = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_p"),
        F.lit(None).cast("long").alias("event_id"),
        "click_id",
        F.col("ts").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = left.unionByName(right)
    return (
        u.withColumn("m_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("m_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m_id").alias("click_id"),
            F.col("m_ts").alias("click_ts"),
            (F.unix_micros("ts") - F.unix_micros("m_ts")).alias("gap_us"),
        )
    )


def range_join_clicks_before_errors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(event_id, user_id, ts, n_recent_clicks): same-user clicks in
    [ts - 10 min, ts] counted per error event. Binned equi-join: a
    click in bucket b can only serve errors in buckets {b, b+1}, so the
    click side is exploded to those two keys and the join is a plain
    hash join on (user_id, bin) — no inequality-join blowup."""
    width_us = RANGE_MINUTES * 60 * 1_000_000
    e = _events(spark, sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros("ts") / F.lit(width_us)).cast("long").alias("bin"),
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            (F.unix_micros("ts") / F.lit(width_us)).cast("long").alias("cbin"),
        )
        .select(
            "c_user_id",
            "click_ts",
            F.explode(F.array(F.col("cbin"), F.col("cbin") + 1)).alias("c_bin"),
        )
    )
    # Range predicate INSIDE the join condition: an error whose candidate
    # clicks all fall outside the window must survive with count 0 (a
    # post-join filter would drop it). Each (error, click) pair can match
    # through at most one of the click's two emitted bins.
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("bin") == F.col("c_bin"))
        & (F.col("click_ts") <= F.col("ts"))
        & (F.unix_micros("click_ts") >= F.unix_micros("ts") - F.lit(width_us))
    )
    joined = errors.join(clicks, cond, "left")
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("click_ts").alias("n_recent_clicks")
    )


def pivot_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide matrix: sum(value) per event_type as columns (the
    warehouse pivot shape Tableau consumes). Decimal-cast before the
    sum keeps the result order-independent; NULL where a user never
    produced that event type."""
    e = _events(spark, sf_dir)
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")))
    )
    # Sum exactly in decimal, then ONE cast to double per cell so both
    # engines materialize identical float64 (a Decimal object column
    # sorts as text in the comparator and scrambles row order).
    return piv.select(
        "user_id",
        *[F.col(t).cast("double").alias(f"{t}_value") for t in EVENT_TYPES],
    )


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, ts, event_id, event_type, value): each user's most
    recent event — the CDC/upsert compaction primitive (incremental
    ingest keeps only the latest state per key). Window top-1 per user:
    one shuffle on the key, ties broken by event_id DESC so replays are
    deterministic. At scale this is the operator that compacts a
    changelog into a snapshot; partition count follows the key space."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "event_type", "value")
    )


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distribution summary: exact interpolated p50/p90 plus
    min/max/count (the profiling pass a quality pipeline runs before
    choosing filter thresholds)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.round(F.expr("percentile(value, 0.5)"), 9).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.9)"), 9).alias("p90_value"),
        F.max("value").alias("max_value"),
    )


def unpivot_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the pivot back to long form: (user_id, event_type,
    total_value) — wide→long is how a per-metric matrix re-enters a
    grouped pipeline. ``DataFrame.unpivot`` with the same fixed column
    list; NULL cells (type never seen for the user) are dropped so the
    roundtrip equals the plain grouped sum."""
    wide = pivot_user_event_values(spark, sf_dir)
    return (
        wide.unpivot(
            "user_id",
            [f"{t}_value" for t in EVENT_TYPES],
            "event_type",
            "total_value",
        )
        .filter(F.col("total_value").isNotNull())
        .select(
            "user_id",
            F.regexp_replace("event_type", "_value$", "").alias("event_type"),
            "total_value",
        )
    )


def rolling_value_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time rolling aggregate: per event, the same-user sum/count
    of value over [ts − 10 min, ts] — a RANGE window frame on the epoch
    key (rows frames count rows; range frames bound event TIME, the
    form feature pipelines need). Frame peers at an identical timestamp
    are included regardless of sort-tie order, so the result is
    deterministic; decimal sum keeps it order-independent. One shuffle
    on user_id; frame state is bounded by the 10-minute span."""
    width_us = RANGE_MINUTES * 60 * 1_000_000
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-width_us, 0)
    )
    val = F.col("value").cast("decimal(18,2)")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(val).over(w).cast("double").alias("rolling_value_10min"),
        F.count(F.lit(1)).over(w).cast("long").alias("rolling_events_10min"),
    )


#: Sketch accuracy for the approx tier (rank error ≤ n/accuracy).
APPROX_ACCURACY = 1000


def events_value_percentiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch tier of ``events_value_percentiles`` (the 100 TB path —
    exact percentile is a per-group sort; the GK sketch is mergeable,
    one pass, bounded memory). Rows-only in the registry: sketch output
    depends on merge order. pytest bounds its rank error against the
    exact tier."""
    e = _events(spark, sf_dir)
    pair = F.expr(
        f"approx_percentile(value, array(0.5, 0.9), {APPROX_ACCURACY})"
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        pair[0].alias("p50_approx"),
        pair[1].alias("p90_approx"),
    )


#: Tolerance bound for the bounded as-of variant (pandas
#: ``merge_asof(tolerance=...)`` semantics): matches older than this
#: are discarded, the left row survives with NULLs.
ASOF_TOL_MINUTES = 60


def asof_join_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left as-of join with a TOLERANCE bound — the pandas
    ``merge_asof(tolerance=Timedelta('60m'))`` semantics a user
    migrating a feature pipeline expects: the latest prior click still
    matches only when it is at most ``ASOF_TOL_MINUTES`` old;
    staler matches are discarded (click columns NULL) while the
    purchase row survives. Composes the union+window as-of plan
    (:func:`asof_join_purchase_click` — no pairwise join, one
    user-keyed window) with a pure projection, so the scale posture is
    unchanged; the oracle applies the same CASE gate over DuckDB's
    native ASOF LEFT JOIN."""
    tol_us = ASOF_TOL_MINUTES * 60 * 1_000_000
    base = asof_join_purchase_click(spark, sf_dir)
    within = F.col("gap_us") <= tol_us
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("click_id")).alias("click_id"),
        F.when(within, F.col("click_ts")).alias("click_ts"),
        F.when(within, F.col("gap_us")).alias("gap_us"),
    )


def gap_fill_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILL + forward fill — the resampling step every
    feature/metrics pipeline needs before a model sees regular-interval
    series, and one Spark has no builtin for: per user, the hourly
    sum(value) series densified to EVERY hour between that user's first
    and last event, missing hours carrying the last observed value
    forward and flagged ``is_gap``.

    Spark-first shape: (1) one groupBy to the hourly actuals (decimal
    sum — order-independent); (2) the dense grid from
    ``explode(sequence(h0, h1))`` per user — generated, not joined
    against a calendar table, so there is no second scan and the
    fan-out is bounded by each key's own span; (3) a left join back to
    actuals on (user, hour) — same key as the grid's partitioning, so
    AQE plans it without an extra exchange of the big side; (4) one
    ``last(ignorenulls)`` window per user for the carry-forward. Hour
    buckets are integer ``unix_micros div 3600e6`` — no timezone or
    calendar arithmetic to diverge between engines. The first bucket
    per user is an actual by construction, so the fill is total.
    Scale: everything is keyed by user_id end-to-end (one shuffle),
    grid size ∝ Σ per-user spans, never |users| × global span."""
    e = _events(spark, sf_dir)
    hour = F.expr("unix_micros(ts) div 3600000000").alias("hour_bucket")
    actual = e.groupBy("user_id", hour).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    span = actual.groupBy("user_id").agg(
        F.min("hour_bucket").alias("h0"), F.max("hour_bucket").alias("h1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour_bucket")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(actual, ["user_id", "hour_bucket"], "left")
        .select(
            "user_id",
            "hour_bucket",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.last("v", ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("value_filled"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 interval build — the warehouse pattern for "what was
    this entity's state at time t": collapse each user's event stream
    into validity intervals, one row per RUN of equal ``event_type``,
    with ``valid_from``/``valid_to`` (NULL = current) and a version
    number. The CDC-to-dimension step every history-preserving
    warehouse load performs.

    Shape: one lag() to mark run starts, one filter, one lead() for
    the closing timestamp — two windows over the same (user_id) keying,
    so a single shuffle end-to-end; no self-join, no explode. Ordering
    ties at identical ts break on event_id in both engines, so the
    intervals are deterministic."""
    e = _events(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(wo).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return starts.select(
        "user_id",
        F.row_number().over(wv).cast("long").alias("version"),
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "temporal_asof_join": asof_join_purchase_click,
    "temporal_scd2_user_state": scd2_user_state,
    "temporal_asof_tolerance": asof_join_with_tolerance,
    "temporal_range_join": range_join_clicks_before_errors,
    "temporal_pivot_user_values": pivot_user_event_values,
    "temporal_unpivot_user_values": unpivot_user_event_values,
    "temporal_rolling_value_10min": rolling_value_10min,
    "temporal_latest_per_user": latest_event_per_user,
    "temporal_value_percentiles": events_value_percentiles,
    "temporal_value_percentiles_approx": events_value_percentiles_approx,
    "temporal_gap_fill": gap_fill_hourly_value,
}

_CLICKS_SQL = """
    SELECT user_id, ts, max(event_id) AS click_id
    FROM events WHERE event_type = 'click' GROUP BY 1, 2"""

ORACLES: dict[str, str] = {
    "temporal_asof_join": f"""
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
        clicks AS ({_CLICKS_SQL})
        SELECT p.event_id, p.user_id, p.ts,
               c.click_id, c.ts AS click_ts,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM purchases p
        ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts >= c.ts""",
    # tolerance gate over the same native ASOF join: stale matches
    # (> ASOF_TOL_MINUTES) revert to NULL, left rows survive
    "temporal_asof_tolerance": f"""
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
        clicks AS ({_CLICKS_SQL}),
        base AS (
            SELECT p.event_id, p.user_id, p.ts,
                   c.click_id, c.ts AS click_ts,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
            FROM purchases p
            ASOF LEFT JOIN clicks c
                ON p.user_id = c.user_id AND p.ts >= c.ts)
        SELECT event_id, user_id, ts,
               CASE WHEN gap_us <= {ASOF_TOL_MINUTES * 60 * 1_000_000}
                    THEN click_id END AS click_id,
               CASE WHEN gap_us <= {ASOF_TOL_MINUTES * 60 * 1_000_000}
                    THEN click_ts END AS click_ts,
               CASE WHEN gap_us <= {ASOF_TOL_MINUTES * 60 * 1_000_000}
                    THEN gap_us END AS gap_us
        FROM base""",
    "temporal_range_join": f"""
        WITH errors AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'error'),
        clicks AS (
            SELECT user_id, ts AS click_ts FROM events
            WHERE event_type = 'click')
        SELECT e.event_id, e.user_id, e.ts,
               count(c.click_ts) AS n_recent_clicks
        FROM errors e
        LEFT JOIN clicks c
            ON c.user_id = e.user_id
            AND c.click_ts <= e.ts
            AND epoch_us(c.click_ts) >=
                epoch_us(e.ts) - {RANGE_MINUTES * 60 * 1_000_000}
        GROUP BY 1, 2, 3""",
    "temporal_pivot_user_values": """
        SELECT user_id,
            CAST(sum(CASE WHEN event_type = 'click'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                AS click_value,
            CAST(sum(CASE WHEN event_type = 'error'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                AS error_value,
            CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                AS purchase_value,
            CAST(sum(CASE WHEN event_type = 'signup'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                AS signup_value,
            CAST(sum(CASE WHEN event_type = 'view'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                AS view_value
        FROM events GROUP BY user_id""",
    "temporal_unpivot_user_values": """
        SELECT user_id, event_type,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM events GROUP BY user_id, event_type""",
    "temporal_rolling_value_10min": f"""
        SELECT event_id, user_id, ts,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS rolling_value_10min,
               CAST(count(*) OVER w AS BIGINT) AS rolling_events_10min
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN {RANGE_MINUTES * 60 * 1_000_000} PRECEDING
            AND CURRENT ROW)""",
    "temporal_latest_per_user": """
        WITH ranked AS (
            SELECT user_id, ts, event_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
        SELECT user_id, ts, event_id, event_type, value
        FROM ranked WHERE rn = 1""",
    "temporal_value_percentiles": """
        SELECT event_type, count(*) AS n_events,
               min(value) AS min_value,
               round(quantile_cont(value, 0.5), 9) AS p50_value,
               round(quantile_cont(value, 0.9), 9) AS p90_value,
               max(value) AS max_value
        FROM events GROUP BY event_type""",
    # identical run-start detection + closing lead() in SQL
    "temporal_scd2_user_state": """
        WITH ordered AS (
            SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events),
        starts AS (
            SELECT user_id, ts, event_id, event_type
            FROM ordered
            WHERE prev_type IS NULL OR prev_type != event_type)
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               event_type,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to
        FROM starts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    # same integer hour buckets, generate_series grid, IGNORE NULLS fill
    "temporal_gap_fill": """
        WITH actual AS (
            SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket,
                   SUM(CAST(value AS DECIMAL(18,2))) AS v,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        span AS (
            SELECT user_id, min(hour_bucket) AS h0, max(hour_bucket) AS h1
            FROM actual GROUP BY user_id),
        grid AS (
            SELECT user_id, unnest(generate_series(h0, h1)) AS hour_bucket
            FROM span)
        SELECT g.user_id, g.hour_bucket,
               COALESCE(a.n, 0) AS n_events,
               CAST(last_value(a.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour_bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS value_filled,
               a.v IS NULL AS is_gap
        FROM grid g
        LEFT JOIN actual a
          ON a.user_id = g.user_id AND a.hour_bucket = g.hour_bucket""",
}
