"""Dataset split / packing / redaction operators (training-data mandate).

The reference has no train/test machinery (it is a BI warehouse); these
are the remaining operators a large-scale training-data pipeline needs
around the cleaning stages in ``pipeline.py``:

- **Deterministic split** — hash each doc_id into train/validation/test
  with an md5-derived bucket. Pure stateless projection: any executor
  can place any row with no coordination, re-runs are reproducible, and
  the split survives repartitioning — the only split design that works
  at 100 TB (random() would differ per task retry).
- **Per-source capped sampling** — top-k docs per source (the A1
  top-1-per-group pattern, k>1): bounds any one source's contribution
  to a training mix. Window partitions are per-source, never global.
- **Sequence packing** — concat-and-chunk assignment of docs into
  fixed-size budget bins via a per-source prefix sum. The window is
  partitioned by source so state never exceeds one source's docs; a
  global ORDER BY window would serialize the cluster.
- **Document chunking** — explode long docs into fixed-width pieces
  (context-window preparation). Row-local ``sequence``+``substring``,
  embarrassingly parallel.
- **PII redaction** — count and mask email-shaped and long-digit-run
  substrings with JVM-side ``regexp_count``/``regexp_replace``.

All five are whole-stage-codegen SQL (no Python UDFs) and each has a
DuckDB oracle twin. Hash-bucket equivalence across engines comes from
md5 hex (identical bytes in, identical hex out) parsed to an integer in
each dialect; Spark ``conv(hex,16,10)`` and DuckDB ``('0x'||hex)::BIGINT``
agree exactly for the 8-hex-char (32-bit) prefix used here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

#: Split thresholds over the 0-99 bucket: <90 train, <95 validation.
TRAIN_PCT = 90
VALID_PCT = 95

#: Sequence-packing character budget per bin and chunk width.
PACK_BUDGET = 1024
CHUNK_WIDTH = 200

#: Redaction patterns — RE2-safe subset so Java regex and DuckDB agree.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{6,}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("documents",))["documents"]


def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shuffle_key, bucket, split): deterministic hash split.

    ``shuffle_key`` doubles as a reproducible pseudo-random sort key for
    example interleaving (ORDER BY shuffle_key at write time shuffles
    the corpus identically on every run and every cluster size).
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("shuffle_key")
    )
    bucket = (
        F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("bigint") % 100
    )
    return d.select(
        "doc_id",
        "shuffle_key",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VALID_PCT, "validation")
        .otherwise("test")
        .alias("split"),
    )


def sample_per_source(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """Top-k docs per source by (n_chars DESC, doc_id): caps any one
    source's share of the training mix, deterministically."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def pack_sequences(
    spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET
) -> DataFrame:
    """Assign each doc a (source, pack_id, pack_offset) under a fixed
    character budget: per-source prefix sum over doc_id order, bin =
    floor(prefix / budget) — the concat-then-chunk packing used to fill
    training context windows. floor() before the cast in BOTH dialects:
    DuckDB CAST(double) rounds half-away while Spark truncates."""
    d = _docs(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("prefix_chars")
    return d.select("doc_id", "source", "n_chars", prefix).select(
        "doc_id",
        "source",
        "n_chars",
        "prefix_chars",
        F.floor(F.col("prefix_chars") / F.lit(float(budget))).alias("pack_id"),
        (F.col("prefix_chars") % budget).alias("pack_offset"),
    )


#: Separator between packed documents (the EOS-token stand-in).
PACK_SEP = "<|eos|>"


def pack_concat_text(
    spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET
) -> DataFrame:
    """Emit the PACKED SEQUENCES themselves: per (source, pack_id),
    member docs concatenated in doc_id order with an EOS separator —
    the artifact a training job actually reads, completing
    :func:`pack_sequences` (which only assigns bins). md5 of the packed
    text rides alongside so the oracle hash proves byte-identical
    concatenation order, not just membership counts.

    Scale: per-group state is bounded by the PACK BUDGET (one context
    window of characters, plus at most one overshooting doc), never by
    corpus size — collect_list here aggregates a capped bin, which is
    exactly what a packed-sequence writer must hold in memory anyway."""
    packed = pack_sequences(spark, sf_dir, budget)
    d = _docs(spark, sf_dir).select("doc_id", "text")
    joined = packed.join(d, "doc_id")
    agg = (
        joined.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("content_chars"),
            F.concat_ws(
                PACK_SEP, F.array_sort(F.collect_list(F.struct("doc_id", "text")))
                .getField("text")
            ).alias("packed_text"),
        )
    )
    return agg.select(
        "source",
        "pack_id",
        "n_docs",
        "content_chars",
        F.length("packed_text").cast("long").alias("packed_chars"),
        F.md5("packed_text").alias("packed_md5"),
    ).orderBy("source", "pack_id")

def chunk_documents(
    spark: SparkSession, sf_dir: str, width: int = CHUNK_WIDTH
) -> DataFrame:
    """Explode each doc into fixed-width character chunks. Empty texts
    are filtered first — sequence(0, -1) would generate a DESCENDING
    range (phantom chunks), the same hazard fixed in multimodal
    frame-sampling."""
    d = _docs(spark, sf_dir).filter(F.length("text") > 0)
    chunks = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.length("text") - 1) / F.lit(float(width))),
            )
        ).alias("chunk_idx"),
    )
    piece = F.expr(f"substring(text, chunk_idx * {width} + 1, {width})")
    return chunks.select(
        "doc_id",
        "chunk_idx",
        piece.alias("chunk_text"),
        F.length(piece).cast("bigint").alias("chunk_len"),
    )


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture sampling: up-/down-sample each source by
    a per-source rate, emitting one row per kept copy — the data-mixing
    step that turns cleaned corpora into a training mixture (e.g. books
    ×2.0, crawl ×0.5).

    Rates are expressed in integer QUARTERS (1..8 → 0.25x..2.0x, here
    hash-derived per source so the registry entry is parameter-free):
    every doc gets ``rate_quarters // 4`` whole copies plus one more
    when its 0-99 bucket falls under ``(rate_quarters % 4) * 25`` — all
    integer arithmetic, so Spark and the oracle agree exactly, and the
    decision is a pure per-row hash: no coordination, reproducible
    under retries and repartitioning, the only mixture design that
    works at 100 TB (same argument as ``split_train_test``).
    """
    d = _docs(spark, sf_dir).select("doc_id", "source")
    quarters = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast("bigint")
        % 8
        + 1
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    base = d.select(
        "doc_id",
        "source",
        quarters.alias("rate_quarters"),
        bucket.alias("bucket"),
    ).select(
        "doc_id",
        "source",
        "rate_quarters",
        (
            F.expr("rate_quarters div 4")
            + F.when(F.col("bucket") < (F.col("rate_quarters") % 4) * 25, 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_copies"),
    )
    return base.filter(F.col("n_copies") >= 1).select(
        "doc_id",
        "source",
        "rate_quarters",
        "n_copies",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
            "copy_id"
        ),
    )


#: Power-of-two length-bucket caps for padding-efficiency batching;
#: generated once and interpolated into BOTH dialects as a CASE ladder
#: (float log2 is not guaranteed identically rounded across engines —
#: exact integer thresholds are).
LEN_BUCKETS = [2**i for i in range(4, 14)]  # 16 .. 8192 tokens


def _len_bucket_case(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} <= {cap} THEN {cap}" for cap in LEN_BUCKETS[:-1]
    )
    return f"CASE {cases} ELSE {LEN_BUCKETS[-1]} END"


def split_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report — the padding-efficiency planner
    every training data loader runs: docs grouped into power-of-two
    token-length buckets (a batch pads every sequence to its bucket
    cap), with exact padded-token counts and the padding-waste ratio
    per bucket. One token-size projection + one groupBy(bucket) —
    embarrassingly parallel, bucket cardinality fixed at
    ``len(LEN_BUCKETS)``. Waste ratios are single double divisions of
    exact integers (reproducible across engines)."""
    from .text import TOKENS_EXPR

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = d.select(
        "doc_id", F.size(F.expr(TOKENS_EXPR)).cast("long").alias("n_tokens")
    )
    bucketed = toks.selectExpr(
        "n_tokens", f"CAST({_len_bucket_case('n_tokens')} AS BIGINT) AS bucket_cap"
    )
    return (
        bucketed.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn("padded_tokens", F.col("n_docs") * F.col("bucket_cap"))
        .select(
            "bucket_cap",
            "n_docs",
            "total_tokens",
            "padded_tokens",
            F.round(
                F.lit(1.0)
                - F.col("total_tokens") / F.col("padded_tokens").cast("double"),
                9,
            ).alias("waste_ratio"),
        )
        .orderBy("bucket_cap")
    )


#: Temperature-mixture knobs: α = 1/2 flattening (weights ∝ √count —
#: the classic multinomial temperature used to boost low-resource
#: sources), and a target mixture of half the corpus. Rates carry in
#: integer basis points so the keep rule is exact in both engines.
TEMP_TARGET_DIV = 2
RATE_BP = 10_000


def split_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (α = 0.5): per-source keep
    rates ∝ √count/count, scaled to a half-corpus budget, applied as a
    deterministic per-doc hash decision.

    Small sources keep a (much) larger fraction than big ones — the
    low-resource up-weighting every multilingual / multi-domain
    training mix applies. All arithmetic on the decision path is exact:
    integer counts, ``floor(sqrt(double))`` weights (IEEE sqrt is
    correctly rounded, so Spark and DuckDB agree bit-for-bit), and the
    basis-point rate computed in DECIMAL(38,0) integer division —
    products up to ~10²¹ stay exact where BIGINT would overflow at
    100 TB counts.

    Plan: one keyed shuffle (source counts, map-side combined), a
    bounded sources×1 cross of the totals frame (broadcast, allowlisted
    like ``split_mixture_sample``'s rate map), then a broadcast
    equi-join of the per-source rates back to the corpus and a
    stateless per-row hash — no global ordering anywhere."""
    d = _docs(spark, sf_dir).select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("c_source"))
    w = F.floor(F.sqrt(F.col("c_source").cast("double"))).cast("bigint")
    weighted = counts.select("source", "c_source", w.alias("w_source"))
    totals = weighted.agg(
        F.sum("w_source").alias("w_total"),
        F.sum("c_source").alias("c_total"),
    )
    rates = weighted.crossJoin(F.broadcast(totals)).selectExpr(
        "source",
        "c_source",
        "w_source",
        # exact integral floor-divide on DECIMAL(38,0): numerator up to
        # ~10²¹ at 100 TB counts, past BIGINT but exact in decimal
        f"""least(CAST({RATE_BP} AS BIGINT),
              (CAST({RATE_BP} AS DECIMAL(38,0))
               * CAST(c_total AS DECIMAL(38,0))
               * CAST(w_source AS DECIMAL(38,0)))
              div
              (CAST({TEMP_TARGET_DIV} AS DECIMAL(38,0))
               * CAST(w_total AS DECIMAL(38,0))
               * CAST(c_source AS DECIMAL(38,0)))) AS rate_bp""",
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":temp"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % RATE_BP
    )
    return (
        d.join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            "source",
            "c_source",
            "w_source",
            "rate_bp",
            (bucket < F.col("rate_bp")).alias("kept"),
        )
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and mask email-shaped and 6+-digit-run substrings. Emails
    are replaced first in both dialects so a digit run inside a masked
    email is never double-counted into the cleaned text."""
    d = _docs(spark, sf_dir)
    clean = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), LONGNUM_RE, "<NUM>"
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("text", F.lit(LONGNUM_RE)).cast("bigint").alias("n_longnums"),
        clean.alias("clean_text"),
    )


def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: the hash bucket is keyed by the NEAR-DUP
    COMPONENT, not the document, so two near-duplicate documents can
    never land in different splits (doc-keyed assignment leaks
    train content into eval whenever the corpus has near-dups — the
    standard contamination-through-duplication failure). Components
    come from the distributed min-label propagation
    (:func:`..dedup.dedup_components_distributed` — the registered
    100 TB path: per round one edge join + one min-agg, lineage
    truncated by localCheckpoint), then the split rule is the same
    stateless md5 bucketing as :func:`split_train_test`, applied to
    ``component_id``. Every doc in a component shares the bucket by
    construction; the pytest twin exhibits a counterfactual where the
    doc-keyed rule WOULD straddle a component. Scale: component ids
    are one extra column on the doc list — assignment stays a pure
    per-row projection, no coordination, reproducible under retries
    and cluster resizes."""
    from .dedup import dedup_components_distributed

    comp = dedup_components_distributed(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("component_id").cast("string"), F.lit(":leak")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return comp.select(
        "doc_id",
        "component_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VALID_PCT, "validation")
        .otherwise("test")
        .alias("split"),
    )


#: Stratified sampling rate as an exact integer rule: quota per
#: stratum = ceil(n / STRAT_DENOM) — float fractions round differently
#: across engines; integer division never does.
STRAT_DENOM = 5


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample — the eval-set builder's allocation rule: from
    every (lang, source) stratum take exactly ``ceil(n/5)`` documents
    (20%, rounded up so no stratum is empty), chosen by a reproducible
    hash order. This is what keeps a held-out set representative when
    sources/languages are imbalanced — a global 20% hash split would
    under-sample small strata with binomial noise; the stratified form
    is exact per stratum by construction.

    Determinism across engines and partitionings: the per-stratum order
    is md5(doc_id || ':strat') — both engines produce identical
    lowercase hex — with doc_id as the tiebreaker; the quota is integer
    arithmetic. One shuffle (window by stratum); at 100 TB strata are
    orders of magnitude wider than executors, so the per-stratum sort
    is the bounded per-group kind, not a global one."""
    d = _docs(spark, sf_dir)
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat")))
    w = Window.partitionBy("lang", "source").orderBy("sample_key", "doc_id")
    wn = Window.partitionBy("lang", "source")
    return (
        d.select("doc_id", "lang", "source", key.alias("sample_key"))
        .withColumn("strat_n", F.count(F.lit(1)).over(wn).cast("long"))
        .withColumn(
            "quota",
            F.expr(f"(strat_n + {STRAT_DENOM - 1}) div {STRAT_DENOM}"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", "source", "strat_n", "quota", "rn")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "split_train_test": split_train_test,
    "split_stratified_sample": stratified_sample,
    "split_leakage_safe": split_leakage_safe,
    "split_sample_per_source": sample_per_source,
    "split_pack_sequences": pack_sequences,
    "split_pack_concat": pack_concat_text,
    "split_chunk_documents": chunk_documents,
    "split_mixture_sample": mixture_sample,
    "split_temperature_mixture": split_temperature_mixture,
    "split_length_buckets": split_length_buckets,
    "split_pii_redact": pii_redact,
}

from .text import TOKENS_SQL as _TOKENS_SQL  # noqa: E402 (oracle text)

from .dedup import _COMPONENTS_SQL as _COMP_SQL  # noqa: E402 (oracle text)

ORACLES: dict[str, str] = {
    # identical md5 order, integer ceil-quota, per-stratum row_number
    "split_stratified_sample": f"""
        WITH keyed AS (
            SELECT doc_id, lang, source,
                   md5(CAST(doc_id AS VARCHAR) || ':strat') AS sample_key,
                   CAST(count(*) OVER (PARTITION BY lang, source) AS BIGINT)
                       AS strat_n,
                   CAST(row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'),
                                doc_id) AS BIGINT) AS rn
            FROM documents)
        SELECT doc_id, lang, source, strat_n,
               (strat_n + {STRAT_DENOM - 1}) // {STRAT_DENOM} AS quota, rn
        FROM keyed
        WHERE rn <= (strat_n + {STRAT_DENOM - 1}) // {STRAT_DENOM}""",
    # components via the recursive-CTE twin, then the identical
    # md5(component_id || ':leak') bucket rule
    "split_leakage_safe": f"""
        WITH comps AS ({_COMP_SQL}),
        b AS (
            SELECT doc_id, component_id,
                   ('0x' || substring(
                        md5(CAST(component_id AS VARCHAR) || ':leak'),
                        1, 8))::BIGINT % 100 AS bucket
            FROM comps)
        SELECT doc_id, component_id, bucket,
               CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                    WHEN bucket < {VALID_PCT} THEN 'validation'
                    ELSE 'test' END AS split
        FROM b""",
    # same CASE ladder over the whitespace token count; waste ratio is
    # one double division of exact integers
    "split_length_buckets": f"""
        WITH t AS (
            SELECT CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
            FROM documents),
        b AS (
            SELECT n_tokens,
                   CAST({_len_bucket_case('n_tokens')} AS BIGINT)
                       AS bucket_cap
            FROM t),
        g AS (
            SELECT bucket_cap, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM b GROUP BY bucket_cap)
        SELECT bucket_cap, n_docs, total_tokens,
               n_docs * bucket_cap AS padded_tokens,
               round(1.0 - total_tokens
                     / CAST(n_docs * bucket_cap AS DOUBLE), 9) AS waste_ratio
        FROM g ORDER BY bucket_cap""",
    # exact mirror of the DECIMAL floor-divide rate and the :temp-salted
    # md5 bucket; DuckDB's HUGEINT plays DECIMAL(38,0)'s role
    "split_temperature_mixture": f"""
        WITH counts AS (
            SELECT source, count(*) AS c_source
            FROM documents GROUP BY source),
        weighted AS (
            SELECT source, c_source,
                   CAST(floor(sqrt(CAST(c_source AS DOUBLE))) AS BIGINT)
                       AS w_source
            FROM counts),
        totals AS (
            SELECT CAST(sum(w_source) AS BIGINT) AS w_total,
                   CAST(sum(c_source) AS BIGINT) AS c_total
            FROM weighted),
        rates AS (
            SELECT source, c_source, w_source,
                   least(CAST({RATE_BP} AS BIGINT),
                         CAST((CAST({RATE_BP} AS HUGEINT) * c_total * w_source)
                              // (CAST({TEMP_TARGET_DIV} AS HUGEINT)
                                  * w_total * c_source) AS BIGINT)) AS rate_bp
            FROM weighted CROSS JOIN totals)
        SELECT d.doc_id, d.source, r.c_source, r.w_source, r.rate_bp,
               ('0x' || substring(
                    md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8))::BIGINT
                   % {RATE_BP} < r.rate_bp AS kept
        FROM documents d JOIN rates r USING (source)""",
    "split_train_test": f"""
        WITH h AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents)
        SELECT doc_id, shuffle_key,
               ('0x' || substring(shuffle_key, 1, 8))::BIGINT % 100 AS bucket,
               CASE WHEN ('0x' || substring(shuffle_key, 1, 8))::BIGINT % 100
                         < {TRAIN_PCT} THEN 'train'
                    WHEN ('0x' || substring(shuffle_key, 1, 8))::BIGINT % 100
                         < {VALID_PCT} THEN 'validation'
                    ELSE 'test' END AS split
        FROM h""",
    "split_sample_per_source": """
        WITH ranked AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rank
            FROM documents)
        SELECT source, doc_id, n_chars, rank FROM ranked WHERE rank <= 10""",
    "split_pack_sequences": f"""
        WITH p AS (
            SELECT doc_id, source, n_chars,
                   CAST(COALESCE(sum(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS prefix_chars
            FROM documents)
        SELECT doc_id, source, n_chars, prefix_chars,
               CAST(floor(prefix_chars / CAST({PACK_BUDGET} AS DOUBLE))
                    AS BIGINT) AS pack_id,
               prefix_chars % {PACK_BUDGET} AS pack_offset
        FROM p""",
    "split_pack_concat": f"""
        WITH p AS (
            SELECT doc_id, source, n_chars,
                   CAST(COALESCE(sum(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS prefix_chars
            FROM documents),
        binned AS (
            SELECT p.doc_id, p.source, p.n_chars,
                   CAST(floor(prefix_chars / CAST({PACK_BUDGET} AS DOUBLE))
                        AS BIGINT) AS pack_id,
                   d.text
            FROM p JOIN documents d ON p.doc_id = d.doc_id),
        packs AS (
            SELECT source, pack_id, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS content_chars,
                   string_agg(text, '{PACK_SEP}' ORDER BY doc_id)
                       AS packed_text
            FROM binned GROUP BY source, pack_id)
        SELECT source, pack_id, n_docs, content_chars,
               CAST(length(packed_text) AS BIGINT) AS packed_chars,
               md5(packed_text) AS packed_md5
        FROM packs ORDER BY source, pack_id""",
    "split_mixture_sample": """
        WITH b AS (
            SELECT doc_id, source,
                   ('0x' || substring(md5(source), 1, 8))::BIGINT % 8 + 1
                       AS rate_quarters,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix'),
                       1, 8))::BIGINT % 100 AS bucket
            FROM documents),
        c AS (
            SELECT doc_id, source, CAST(rate_quarters AS BIGINT) AS rate_quarters,
                   CAST(rate_quarters // 4
                        + CASE WHEN bucket < (rate_quarters % 4) * 25
                               THEN 1 ELSE 0 END AS BIGINT) AS n_copies
            FROM b)
        SELECT doc_id, source, rate_quarters, n_copies,
               unnest(range(1, n_copies + 1)) AS copy_id
        FROM c WHERE n_copies >= 1""",
    "split_chunk_documents": f"""
        WITH e AS (
            SELECT doc_id, text,
                   unnest(range(0,
                       ((length(text) - 1) // {CHUNK_WIDTH}) + 1)) AS chunk_idx
            FROM documents WHERE length(text) > 0)
        SELECT doc_id, chunk_idx,
               substring(text, CAST(chunk_idx * {CHUNK_WIDTH} + 1 AS INT),
                         {CHUNK_WIDTH}) AS chunk_text,
               CAST(length(substring(text,
                   CAST(chunk_idx * {CHUNK_WIDTH} + 1 AS INT),
                   {CHUNK_WIDTH})) AS BIGINT) AS chunk_len
        FROM e""",
    "split_pii_redact": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{LONGNUM_RE}')) AS BIGINT)
                   AS n_longnums,
               regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{LONGNUM_RE}', '<NUM>', 'g') AS clean_text
        FROM documents""",
}
