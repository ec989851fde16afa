"""Feature-engineering operators for training-data mixes.

Extends the split/packing family (``splits.py``) with the numeric- and
text-feature preparation stages a large-scale training pipeline runs
between cleaning and export:

- **Stratified sampling** — per-language keep-fractions via the
  deterministic md5-bucket idiom from ``splits.py`` (stateless, retry-
  and repartition-stable — the only sampling that reproduces at 100 TB).
- **Quantile binning** — exact quartile cutoffs (one global agg on the
  ``percentile``/``quantile_cont`` parity idiom from ``temporal.py``)
  broadcast back over the facts; assignment is a codegen CASE ladder.
  At 100 TB the cutoff pass switches to ``approx_percentile`` (see
  ``temporal.events_value_percentiles_approx`` for the sketch tier).
- **Z-score standardization + outlier flags** — per-type moments over
  *cent-quantized* values: sums of ``cents`` and ``cents²`` are exact
  longs (order-independent across partial aggregation), so mean/std and
  every z-score are bit-identical across engines; float sums would
  differ in the last ulp under Spark's nondeterministic partial-agg
  order. Long ``cents²`` sums hold to ~1e9 rows per group; beyond that
  promote the buffers to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
  same plan shape, bigger buffer.
- **Min-max normalization** — per-type min/max are exact doubles
  (comparisons, not sums), so the scaled value is safely deterministic.
- **Vocabulary coverage** — token counts with share and cumulative
  coverage: the explode/count shuffle is keyed by token (arbitrarily
  wide), and the ordered ranking window runs over a ``TakeOrdered``
  top-``VOCAB_TOP`` capture of the post-agg vocabulary — never the
  unbounded distinct-token frame (at 100 TB distinct tokens/bigrams
  are themselves huge; the cap bounds the single-partition pass at K
  rows while leaving the ranked output bit-identical).
- **Word bigrams** — per-document adjacent token pairs generated
  row-locally (``transform`` over the split array — no per-element
  regex recompute, the ``dedup.py`` perf lesson), then one count
  shuffle and the same top-K-before-ranking cap. Guards ``size >= 2``:
  ``sequence(1, 0)`` would generate a *descending* phantom range (the
  multimodal frame-sample hazard).

All operators are whole-stage-codegen SQL (no Python UDFs) with DuckDB
oracle twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

#: Per-language keep percentage (md5 bucket < pct) — downsample the
#: dominant language, keep half of everything else.
LANG_PCTS: dict[str, int] = {"en": 20}
DEFAULT_PCT = 50

#: Ranked-output caps (post-aggregation, driver-safe sizes).
VOCAB_TOP = 50
BIGRAM_TOP = 40

#: Outlier threshold in standard deviations.
Z_CUT = 2.0


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("events",))["events"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("documents",))["documents"]


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample: md5-bucket each doc_id into
    0-99 and keep rows under the language's configured percentage."""
    d = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    pct = F.lit(DEFAULT_PCT)
    for lang, p in LANG_PCTS.items():
        pct = F.when(F.col("lang") == lang, p).otherwise(pct)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"), pct.alias("keep_pct"))
        .filter(F.col("bucket") < F.col("keep_pct"))
    )


def value_quartile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, value, quartile): exact interpolated quartile cutoffs
    (rounded 9dp for cross-engine parity) broadcast over the facts."""
    ev = _events(spark, sf_dir)
    cuts = ev.agg(
        F.round(F.expr("percentile(value, 0.25)"), 9).alias("q1"),
        F.round(F.expr("percentile(value, 0.5)"), 9).alias("q2"),
        F.round(F.expr("percentile(value, 0.75)"), 9).alias("q3"),
    )
    return ev.crossJoin(F.broadcast(cuts)).select(
        "event_id",
        "value",
        F.when(F.col("value") <= F.col("q1"), 1)
        .when(F.col("value") <= F.col("q2"), 2)
        .when(F.col("value") <= F.col("q3"), 3)
        .otherwise(4)
        .cast("int")
        .alias("quartile"),
    )


#: Shared Spark/DuckDB expression text for the z-score — one source
#: string so the float expression tree is identical in both dialects.
_Z_EXPR = (
    "round((value - (CAST(sc AS DOUBLE) / n / 100.0)) / "
    "(sqrt((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n)"
    " / (n - 1)) / 100.0), 9)"
)


def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, value, z, is_outlier): standardize value
    against per-type moments over cent-quantized values."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sc"),
        F.sum(F.col("cents") * F.col("cents")).alias("sc2"),
    )
    z = F.expr(_Z_EXPR)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("z"),
            (F.abs(z) > Z_CUT).alias("is_outlier"),
        )
    )


def minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, value, scaled): per-type min-max scaling.
    min/max are exact (no float summation), so no quantization needed."""
    ev = _events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(
            (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin")), 9
        ).alias("scaled"),
    )


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N token vocabulary with corpus share and cumulative coverage
    — the 'how big a vocab covers 95% of tokens' planning query."""
    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ", -1)).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    # TakeOrdered top-K BEFORE the ranking/cumulative window: the rank
    # prefix is the same set in the same total order ((cnt, token) is
    # tie-free), so rank/share/cum_share are unchanged — but the
    # single-partition window now sees K rows, not the whole vocabulary
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(VOCAB_TOP)
    w = Window.orderBy(F.desc("cnt"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return top.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("token")))
        .cast("long")
        .alias("rank"),
        F.round(F.col("cnt").cast("double") / F.col("total"), 9).alias("share"),
        F.round(
            F.sum("cnt").over(w).cast("double") / F.col("total"), 9
        ).alias("cum_share"),
    )


def vocab_topk_sketch(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Sketch tier of :func:`vocab_coverage`: ``approx_top_k`` (a
    mergeable frequent-items sketch) instead of the exact
    count-then-rank pass. At 100 TB the exact path shuffles every
    distinct token; the sketch reduces to one constant-memory buffer
    per partition merged at the driver side of the agg. Rows-only
    registry entry (no ANSI twin); accuracy vs the exact counts is
    asserted in tests/test_features.py (with the tracked-item budget
    above the true cardinality the sketch is exact)."""
    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ", -1)).alias("token"))
        .filter(F.col("token") != "")
    )
    sketch = toks.agg(
        F.expr(f"approx_top_k(token, {k}, 100000)").alias("top")
    )
    return sketch.select(F.explode("top").alias("e")).select(
        F.col("e.item").alias("token"),
        F.col("e.count").alias("approx_cnt"),
    )


def word_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N adjacent word pairs across the corpus (bigram language-
    model counts)."""
    s = (
        _docs(spark, sf_dir)
        .select(F.split("text", " ", -1).alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    big = s.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram")
    )
    counts = big.groupBy("bigram").agg(F.count("*").alias("cnt"))
    # same top-K-before-ranking cap as vocab_coverage
    top = counts.orderBy(F.desc("cnt"), F.asc("bigram")).limit(BIGRAM_TOP)
    return top.select(
        "bigram",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("bigram")))
        .cast("long")
        .alias("rank"),
    )


def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted activity feature — the exponential-decay score
    feature pipelines keep per entity (fraud, engagement, churn): fold
    each user's events in (ts, event_id) order with ``s' = s/2 + v``,
    so every later event halves the influence of all history before it
    (half-life = one event; count-decay rather than wall-clock decay —
    ``pow(0.5, Δt/τ)`` is a libm call whose last ulp differs across
    engines, while ``/2`` is exact IEEE scaling).

    Exactness: the fold is float, but in a FIXED order — collect,
    ``array_sort`` by the unique (ts, event_id) key, fold — the same
    bit-exact-ordering discipline as the unigram-LM scorer, so the
    result is identical at any partitioning and both engines execute
    the identical IEEE-double sequence (DuckDB ``list_reduce`` seeds
    with the first element; ``0/2 + v₁ = v₁`` makes the recurrences
    equal). State is bounded by one user's events."""
    e = _events(spark, sf_dir)
    evs = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.col("value")))
    )
    g = e.groupBy("user_id").agg(
        evs.alias("evs"), F.count(F.lit(1)).cast("long").alias("n_events")
    )
    score = F.aggregate(
        F.transform("evs", lambda s: s.getField("value")),
        F.lit(0.0),
        lambda acc, x: acc / F.lit(2.0) + x,
    )
    return g.select("user_id", "n_events", score.alias("ewma_value"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "feat_stratified_sample": stratified_sample,
    "feat_ewma_user_value": ewma_user_value,
    "feat_value_quartile_bins": value_quartile_bins,
    "feat_zscore_outliers": zscore_outliers,
    "feat_minmax_normalize": minmax_normalize,
    "feat_vocab_coverage": vocab_coverage,
    "feat_vocab_topk_sketch": vocab_topk_sketch,
    "feat_word_bigram_counts": word_bigram_counts,
}

_PCT_CASE = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{lang}' THEN {p}" for lang, p in LANG_PCTS.items()
    )
    + f" ELSE {DEFAULT_PCT} END"
)

ORACLES: dict[str, str] = {
    # list_reduce seeds with the first element; the Spark fold seeds
    # 0.0 — identical recurrence since 0/2 + v1 = v1
    "feat_ewma_user_value": """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               list_reduce(list(value ORDER BY ts, event_id),
                           (acc, x) -> acc / 2 + x) AS ewma_value
        FROM events GROUP BY user_id""",
    "feat_stratified_sample": f"""
        WITH b AS (
            SELECT doc_id, lang,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 AS bucket,
                   {_PCT_CASE} AS keep_pct
            FROM documents)
        SELECT doc_id, lang, bucket, keep_pct FROM b WHERE bucket < keep_pct""",
    "feat_value_quartile_bins": """
        SELECT event_id, value,
               CAST(CASE WHEN value <= q1 THEN 1
                         WHEN value <= q2 THEN 2
                         WHEN value <= q3 THEN 3
                         ELSE 4 END AS INT) AS quartile
        FROM events CROSS JOIN (
            SELECT round(quantile_cont(value, 0.25), 9) AS q1,
                   round(quantile_cont(value, 0.5), 9) AS q2,
                   round(quantile_cont(value, 0.75), 9) AS q3
            FROM events)""",
    "feat_zscore_outliers": f"""
        WITH c AS (
            SELECT event_id, event_type, value,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events),
        s AS (
            SELECT event_type, count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS sc,
                   CAST(sum(cents * cents) AS BIGINT) AS sc2
            FROM c GROUP BY event_type)
        SELECT event_id, c.event_type, value,
               {_Z_EXPR} AS z,
               abs({_Z_EXPR}) > {Z_CUT} AS is_outlier
        FROM c JOIN s ON c.event_type = s.event_type""",
    "feat_minmax_normalize": """
        WITH s AS (
            SELECT event_type, min(value) AS vmin, max(value) AS vmax
            FROM events GROUP BY event_type)
        SELECT event_id, e.event_type, value,
               round((value - vmin) / (vmax - vmin), 9) AS scaled
        FROM events e JOIN s ON e.event_type = s.event_type""",
    "feat_vocab_coverage": f"""
        WITH t AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        c AS (
            SELECT token, count(*) AS cnt FROM t WHERE token <> ''
            GROUP BY token),
        r AS (
            SELECT token, cnt,
                   row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
                   round(CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM c), 9)
                       AS share,
                   round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS DOUBLE) / (SELECT sum(cnt) FROM c), 9) AS cum_share
            FROM c)
        SELECT token, cnt, rank, share, cum_share FROM r
        WHERE rank <= {VOCAB_TOP}""",
    "feat_word_bigram_counts": f"""
        WITH s AS (
            SELECT string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 2),
        i AS (
            SELECT toks, unnest(range(1, len(toks))) AS pos FROM s),
        c AS (
            SELECT toks[pos] || ' ' || toks[pos + 1] AS bigram, count(*) AS cnt
            FROM i GROUP BY 1)
        SELECT bigram, cnt,
               row_number() OVER (ORDER BY cnt DESC, bigram ASC) AS rank
        FROM c QUALIFY rank <= {BIGRAM_TOP}""",
}
