"""Corpus-level reporting + curriculum operators (training-data
pipeline surface, SURVEY §7.5; no reference analogue — the reference's
corpus is the fixed Sakila catalog).

Two operators a large-scale pipeline runs on every delivery:

- **Data-card stats report** — the per-(source, lang) summary every
  dataset release ships: doc/token/char totals plus the exact-duplicate
  volume inside each slice (corpus-wide duplicate groups attributed to
  the slices their members sit in). One token-size projection + one
  corpus-wide hash count + one groupBy.
- **Quality-decile curriculum assignment** — curriculum training orders
  data by quality; this assigns each doc its corpus-wide quality decile
  (exactly ``ntile(10)`` over the composite score with a deterministic
  tie-break) and a coarse phase tag. The assignment is computed WITHOUT
  a global ordered window: deterministic score-range buckets (the count
  self-scales with corpus size) shard the corpus, exact per-bucket
  counts (a bounded ≤``MAX_RANK_BUCKETS``-row collect) turn local
  row_numbers into exact global ranks, and the
  decile is a literal CASE ladder over the rank — every heavy stage is
  partitioned, so the plan survives 100×.
- **Quality-decile cutoffs** — the sketch-friendly tier of the same
  assignment: 9 exact percentile cutoffs broadcast-joined back as value
  thresholds (swap ``percentile`` → ``approx_percentile`` at 100 TB).
  Agrees with the ntile form except for rows tied into a decile-edge
  neighborhood (pytest pins pair-equality away from the edges).

All exact relational computations → hash-checked DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from .text import QUALITY_SQL, TOKENS_EXPR, TOKENS_SQL
from .text import quality_scored


def corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) data-card row: docs, chars, tokens, and the
    number of docs that are exact duplicates of some other corpus doc
    (normalized-text md5 with corpus-wide count > 1)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    per_doc = d.select(
        "doc_id",
        "source",
        "lang",
        F.length("text").cast("long").alias("chars"),
        F.size(F.expr(TOKENS_EXPR)).cast("long").alias("tokens"),
        F.md5(F.trim(F.lower("text"))).alias("h"),
    )
    dup = F.count(F.lit(1)).over(Window.partitionBy("h")) > 1
    flagged = per_doc.withColumn("is_dup", dup.cast("int"))
    return (
        flagged.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars").alias("total_chars"),
            F.sum("tokens").alias("total_tokens"),
            F.sum("is_dup").alias("n_exact_dup_docs"),
        )
        .orderBy("source", "lang")
    )


#: Curriculum phase cut points over the 10 quality deciles.
PHASE_HIGH, PHASE_MID = 3, 7

#: Deciles in the curriculum assignment.
N_DECILES = 10

#: Range-bucket sizing for the distributed exact-rank pass: the bucket
#: count is DERIVED from the corpus row count (already collected for the
#: ntile boundaries) so one bucket's window slice stays ~TARGET rows per
#: task at any corpus size, floored for small corpora and capped so the
#: per-bucket-counts collect stays a bounded scalar (≤4096 rows). Past
#: the cap slices grow again (100 TB / 4096 ≈ 25 GB/task) — that is the
#: regime where the one-pass ``quality_decile_cutoffs`` sketch tier is
#: the right operator; the exact-rank form documents the trade.
MIN_RANK_BUCKETS = 32
MAX_RANK_BUCKETS = 4096
TARGET_ROWS_PER_BUCKET = 1_000_000

#: Bucket id for NULL quality scores (NULL text / zero-length text make
#: the score NULL): a dedicated bucket ordered AFTER every score range,
#: reproducing the oracle ntile's NULLS LAST. Without it, Spark's
#: null-skipping ``least(RANK_BUCKETS-1, NULL)`` would silently route
#: NULL scores into the TOP bucket (ADVICE r5).
NULL_BUCKET = -1


def _n_rank_buckets(n: int) -> int:
    """Bucket count for an ``n``-row corpus (floored, capped)."""
    return max(MIN_RANK_BUCKETS, min(MAX_RANK_BUCKETS, n // TARGET_ROWS_PER_BUCKET))


def _phase(decile: F.Column) -> F.Column:
    return (
        F.when(decile <= PHASE_HIGH, "high")
        .when(decile <= PHASE_MID, "mid")
        .otherwise("low")
    )


def _ntile_upper_bounds(n: int, buckets: int) -> list[int]:
    """Last 1-based rank in each ntile bucket (SQL ntile semantics: the
    first n % buckets buckets hold one extra row)."""
    base, rem = divmod(n, buckets)
    return [d * base + min(d, rem) for d in range(1, buckets + 1)]


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scored(
        load_tables(spark, sf_dir, names=("documents",))["documents"]
    ).select("doc_id", "quality_score")


def quality_decile_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each doc's corpus-wide quality decile (1 = best) and curriculum
    phase — bit-identical to ``ntile(10) OVER (ORDER BY quality_score
    DESC, doc_id ASC)`` but computed WITHOUT routing the corpus through
    one ordered partition:

    1. one global agg → (min, max, count) — a 1-row collect; the bucket
       count is derived from the count (``_n_rank_buckets``) so slices
       stay ~``TARGET_ROWS_PER_BUCKET`` rows at any corpus size;
    2. bucket each row by its score's position in that many equal-width
       value ranges (a pure function of the score, so the sharding is
       deterministic across jobs and partitionings); NULL scores (NULL
       or zero-length text) go to a dedicated bucket ordered after all
       ranges — the oracle ntile's NULLS LAST;
    3. exact per-bucket counts → per-bucket rank offsets — a
       ≤``MAX_RANK_BUCKETS``-row collect folded into a CASE ladder;
    4. global rank = offset(bucket) + row_number over the BUCKET
       partition (ordered by score DESC, doc_id ASC; equal scores can
       never straddle a value-range boundary, so concatenating buckets
       in range order reproduces the total order exactly);
    5. decile = CASE ladder over the rank using the ntile bucket
       boundaries computed from the exact row count.

    Every shuffle is keyed (bucket), both collects are bounded scalars,
    and per-task memory is one bucket's slice — the shape that survives
    100 TB (skewed score distributions only cost bucket imbalance, and
    the bucket count grows with the corpus). ``quality_decile_cutoffs``
    is the one-pass sketch tier of the same assignment."""
    scored = _scored_docs(spark, sf_dir)
    smin, smax, n = scored.agg(
        F.min("quality_score"), F.max("quality_score"), F.count(F.lit(1))
    ).first()
    if not n:
        return spark.createDataFrame(
            [], "doc_id bigint, quality_score double, decile bigint, phase string"
        )
    n_buckets = _n_rank_buckets(n)
    width = (smax - smin) / n_buckets if smin is not None else 0.0
    if width > 0:
        score_bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("quality_score") - F.lit(smin)) / F.lit(width)),
        ).cast("int")
    else:  # all (non-null) scores equal: one bucket, rank = doc_id order
        score_bucket = F.lit(0)
    # NULL guard FIRST: least() skips NULL args, so an unguarded NULL
    # score would land in the top bucket instead of sorting last.
    bucket = F.when(
        F.col("quality_score").isNull(), F.lit(NULL_BUCKET)
    ).otherwise(score_bucket)
    b = scored.withColumn("bkt", bucket)
    # exact bucket sizes (deterministic: bkt is a pure function of the
    # score) → rank offset of each bucket = rows in HIGHER-score buckets;
    # NULL_BUCKET = -1 sorts past every score range = NULLS LAST
    sizes = {r["bkt"]: r["cnt"] for r in
             b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for k in sorted(sizes, reverse=True):
        offsets[k] = acc
        acc += sizes[k]
    off = F.lit(0)
    for k, v in offsets.items():
        off = F.when(F.col("bkt") == k, v).otherwise(off)
    w = Window.partitionBy("bkt").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    ranked = b.withColumn("rank", off + F.row_number().over(w))
    ubs = _ntile_upper_bounds(n, N_DECILES)
    decile = F.lit(N_DECILES)
    for d in range(N_DECILES - 1, 0, -1):
        decile = F.when(F.col("rank") <= ubs[d - 1], d).otherwise(decile)
    return ranked.select(
        "doc_id",
        "quality_score",
        decile.cast("long").alias("decile"),
    ).withColumn("phase", _phase(F.col("decile")))


#: Quantile points for the 9 decile cutoffs, best-first: a score >= the
#: 0.9-quantile is decile 1, and so on down.
CUTOFF_QS = [round(1 - d / N_DECILES, 1) for d in range(1, N_DECILES)]


def quality_decile_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-threshold tier of :func:`quality_decile_curriculum`: the 9
    decile cutoffs as exact interpolated percentiles of the score
    (rounded 9dp for cross-engine parity — the ``value_quartile_bins``
    idiom), broadcast back over the corpus as a CASE ladder. One agg +
    one stateless projection — no ranking pass at all; at 100 TB the
    cutoff agg swaps ``percentile`` for the ``approx_percentile`` sketch
    (mergeable, constant memory) and the assignment is unchanged.
    Deciles agree with the exact-rank form everywhere except rows tied
    into a decile-edge neighborhood (tests/test_corpus.py pins
    pair-equality away from the edges)."""
    scored = _scored_docs(spark, sf_dir)
    cuts = scored.agg(
        *[
            F.round(F.expr(f"percentile(quality_score, {q})"), 9).alias(
                f"c{i}"
            )
            for i, q in enumerate(CUTOFF_QS, 1)
        ]
    )
    decile = F.lit(N_DECILES)
    for d in range(N_DECILES - 1, 0, -1):
        decile = F.when(
            F.col("quality_score") >= F.col(f"c{d}"), d
        ).otherwise(decile)
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "quality_score",
        decile.cast("long").alias("decile"),
    ).withColumn("phase", _phase(F.col("decile")))


#: Sketch accuracy for the 100 TB tier of the cutoffs (``approx_percentile``
#: guarantees rank error <= n/accuracy); the bound check asserts at 10x
#: that eps plus one row, the ``sketch_checks.GK_EPS`` discipline.
CUTOFF_SKETCH_ACCURACY = 10_000
CUTOFF_GK_EPS = 10.0 / CUTOFF_SKETCH_ACCURACY


def quality_decile_cutoffs_approx_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-checkable bound twin for the ``approx_percentile`` tier of
    :func:`quality_decile_cutoffs` (the documented 100 TB swap): one job
    computes the sketch cutoffs AND the exact rank counts around them,
    emitting one ``within_bound`` row per decile edge. The sketch's
    contract is rank error <= eps*n, which is exactly checkable:
    count(score <= c_hat) must reach q*n - slack and count(score < c_hat)
    must not exceed q*n + slack. Oracle: the all-TRUE frame
    (``operators/sketch_checks.py`` recipe — a probabilistic operator's
    deterministic FACT is its bound, not its value)."""
    scored = _scored_docs(spark, sf_dir)
    qs_sql = ", ".join(str(q) for q in CUTOFF_QS)
    ap = scored.agg(
        F.expr(
            f"approx_percentile(quality_score, array({qs_sql}),"
            f" {CUTOFF_SKETCH_ACCURACY})"
        ).alias("ap")
    )
    j = scored.crossJoin(F.broadcast(ap))
    # n counts NON-NULL scores only: approx_percentile and the le/lt
    # rank sums both ignore NULL quality scores (empty/NULL text), so
    # the rank targets must be computed over the same population — a
    # count(*) n would shift target by the NULL fraction and break the
    # bound on corpora where that fraction exceeds the eps slack.
    aggs = [F.count("quality_score").alias("n")]
    for i in range(1, N_DECILES):
        c = F.col("ap")[i - 1]
        aggs.append(
            F.sum((F.col("quality_score") <= c).cast("long")).alias(f"le{i}")
        )
        aggs.append(
            F.sum((F.col("quality_score") < c).cast("long")).alias(f"lt{i}")
        )
    cnt = j.agg(*aggs)
    slack = F.lit(CUTOFF_GK_EPS) * F.col("n") + F.lit(1.0)
    rows = []
    for i, q in enumerate(CUTOFF_QS, 1):
        target = F.lit(q) * F.col("n")
        ok = (F.col(f"le{i}") >= target - slack) & (
            F.col(f"lt{i}") <= target + slack
        )
        rows.append(
            F.struct(
                F.lit(int(round(q * 100))).cast("long").alias("cutoff_pct"),
                ok.alias("within_bound"),
            )
        )
    return (
        cnt.select(F.explode(F.array(*rows)).alias("e"))
        .select("e.cutoff_pct", "e.within_bound")
        .orderBy("cutoff_pct")
    )


#: Sequence packing: training-sequence length in tokens, and the shard
#: fan-out of the two-level prefix sum (production: one shard per
#: output writer; the base-offset table stays O(shards)).
PACK_SEQ_LEN = 512
PACK_SHARDS = 8


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk SEQUENCE PACKING — the step that turns a
    tokenized corpus into fixed-length training sequences (GPT-style:
    documents concatenated in a deterministic order, the token stream
    cut every ``PACK_SEQ_LEN`` tokens, documents allowed to straddle a
    cut). Returns one row per training sequence: how many documents
    contribute, how many tokens it holds (= PACK_SEQ_LEN except the
    final partial sequence), and the contributing doc-id range.

    Complements ``splits.pack_sequences`` (the DOC-GRANULAR tier: each
    document lands whole in the per-source character-budget bin its
    prefix reaches — no straddling, window partitioned by source);
    this entry is the TOKEN-EXACT tier trainers feed directly: every
    sequence but the last holds exactly ``PACK_SEQ_LEN`` tokens, so
    documents must straddle cuts and the offsets must be corpus-global
    — hence the two-level prefix sum below.

    Scale shape (the reason this isn't one global cumsum window): the
    corpus is sharded (``doc_id % PACK_SHARDS``; production: one shard
    per output writer), intra-shard token offsets come from a window
    PARTITIONED by shard, and the shard BASE offsets are an exclusive
    prefix sum over the O(shards)-row totals — a driver-side literal,
    like the IVF centroid frames. Every heavy stage is partitioned;
    the only global object is the shards-row offset table. A document
    spanning several sequences explodes into exactly its overlap
    count via ``sequence()`` — fan-out ∝ ceil(doc_tokens/seq_len)."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.expr(f"size({TOKENS_EXPR})").cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "local_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    totals = {
        int(r["shard"]): int(r["tot"])
        for r in d.groupBy("shard")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    base_rows, acc = [], 0
    for s in range(PACK_SHARDS):
        base_rows.append((s, acc))
        acc += totals.get(s, 0)
    base = spark.createDataFrame(base_rows, "shard bigint, base bigint")
    g = (
        d.join(F.broadcast(base), "shard")
        .withColumn("s", F.col("base") + F.col("local_off"))
        .withColumn("e", F.col("s") + F.col("n_tokens"))
    )
    L = F.lit(PACK_SEQ_LEN)
    per = g.select(
        "doc_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / L), F.floor((F.col("e") - 1) / L)
            )
        ).alias("chunk_id"),
    )
    return (
        per.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.least(F.col("e"), (F.col("chunk_id") + 1) * L)
                - F.greatest(F.col("s"), F.col("chunk_id") * L)
            ).alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("chunk_id")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_stats_report": corpus_stats_report,
    "corpus_pack_sequences": corpus_pack_sequences,
    "quality_decile_curriculum": quality_decile_curriculum,
    "quality_decile_cutoffs": quality_decile_cutoffs,
    "quality_decile_cutoffs_approx_check": quality_decile_cutoffs_approx_check,
}

_CUT_SELECT = ", ".join(
    f"round(quantile_cont(quality_score, {q}), 9) AS c{i}"
    for i, q in enumerate(CUTOFF_QS, 1)
)
_CUT_CASE = (
    "CASE "
    + " ".join(
        f"WHEN quality_score >= c{d} THEN {d}" for d in range(1, N_DECILES)
    )
    + f" ELSE {N_DECILES} END"
)

ORACLES: dict[str, str] = {
    # same shard-major document order, token counts, and chunk overlap
    # arithmetic — the prefix sums done with SQL windows (DuckDB may
    # run them globally; the Spark side must not)
    "corpus_pack_sequences": f"""
        WITH d AS (
            SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
                   CAST(len({TOKENS_SQL}) AS BIGINT) AS n_tokens
            FROM documents),
        nz AS (SELECT * FROM d WHERE n_tokens > 0),
        loc AS (
            SELECT doc_id, shard, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS local_off
            FROM nz),
        tot AS (SELECT shard, SUM(n_tokens) AS tot FROM nz GROUP BY shard),
        b AS (
            SELECT shard,
                   COALESCE(SUM(tot) OVER (ORDER BY shard
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS base
            FROM tot),
        g AS (
            SELECT l.doc_id, b.base + l.local_off AS s,
                   b.base + l.local_off + l.n_tokens AS e
            FROM loc l JOIN b USING (shard)),
        per AS (
            SELECT g.doc_id, g.s, g.e, CAST(u.c AS BIGINT) AS chunk_id
            FROM g, UNNEST(range(CAST(g.s // {PACK_SEQ_LEN} AS BIGINT),
                                 CAST((g.e - 1) // {PACK_SEQ_LEN} + 1
                                      AS BIGINT))) AS u(c))
        SELECT chunk_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEAST(e, (chunk_id + 1) * {PACK_SEQ_LEN})
                        - GREATEST(s, chunk_id * {PACK_SEQ_LEN}))
                    AS BIGINT) AS n_tokens,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM per GROUP BY chunk_id ORDER BY chunk_id""",
    "corpus_stats_report": f"""
        WITH per_doc AS (
            SELECT doc_id, source, lang,
                   length(text) AS chars,
                   len({TOKENS_SQL}) AS tokens,
                   md5(trim(lower(text))) AS h
            FROM documents),
        flagged AS (
            SELECT *, CASE WHEN count(*) OVER (PARTITION BY h) > 1
                           THEN 1 ELSE 0 END AS is_dup
            FROM per_doc)
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(chars) AS BIGINT) AS total_chars,
               CAST(sum(tokens) AS BIGINT) AS total_tokens,
               CAST(sum(is_dup) AS BIGINT) AS n_exact_dup_docs
        FROM flagged GROUP BY source, lang ORDER BY source, lang""",
    "quality_decile_curriculum": f"""
        WITH scored AS (
            SELECT doc_id, {QUALITY_SQL} AS quality_score
            FROM documents)
        SELECT doc_id, quality_score,
               CAST(ntile(10) OVER (
                   ORDER BY quality_score DESC, doc_id ASC) AS BIGINT)
                   AS decile,
               CASE WHEN ntile(10) OVER (
                        ORDER BY quality_score DESC, doc_id ASC) <= 3
                    THEN 'high'
                    WHEN ntile(10) OVER (
                        ORDER BY quality_score DESC, doc_id ASC) <= 7
                    THEN 'mid' ELSE 'low' END AS phase
        FROM scored""",
    "quality_decile_cutoffs": f"""
        WITH scored AS (
            SELECT doc_id, {QUALITY_SQL} AS quality_score
            FROM documents),
        cuts AS (SELECT {_CUT_SELECT} FROM scored)
        SELECT doc_id, quality_score,
               CAST({_CUT_CASE} AS BIGINT) AS decile,
               CASE WHEN {_CUT_CASE} <= {PHASE_HIGH} THEN 'high'
                    WHEN {_CUT_CASE} <= {PHASE_MID} THEN 'mid'
                    ELSE 'low' END AS phase
        FROM scored CROSS JOIN cuts""",
    # bound-check oracle: the exact engine agrees the 9 decile edges
    # exist and asserts TRUE per edge (sketch_checks.py discipline)
    "quality_decile_cutoffs_approx_check": f"""
        SELECT CAST((10 - d) * 10 AS BIGINT) AS cutoff_pct,
               TRUE AS within_bound
        FROM range(1, {N_DECILES}) t(d)
        ORDER BY cutoff_pct""",
}
