"""Benchmark decontamination + repetition filters — the two
training-data gates `pipeline.py`'s quality/dedup stages don't cover
(driver mandate, SURVEY §7.5; the reference has no analogue — its
corpus is the fixed Sakila catalog, `sql/sakila-data.sql`).

Decontamination is the standard n-gram containment check run before
LLM training: any training document sharing too many k-grams with an
evaluation/benchmark document leaks test data and must be flagged.
Here the "benchmark" is a deterministic stand-in subset of the corpus
(``doc_id % EVAL_MOD == 0`` — the container ships no external eval
sets); the operator shape — eval k-gram set built once and broadcast,
per-train-doc containment via an inverted k-gram join — is the
production shape at any scale (eval sets are tiny; the train side
streams).

Repetition stats are the Gopher/C4-style quality signals built from
within-document token statistics (duplicate-token fraction, most-common
token/bigram mass, token entropy) — they catch boilerplate and
degenerate generations that the stopword/length score in
``text.text_quality_score`` does not.

Both are exact relational computations → hash-checked DuckDB oracles.
Scale posture: decontamination shuffles only (doc_id, k-gram) pairs of
the train side and broadcasts the eval k-gram set; repetition is one
explode + per-doc aggregate with no cross-document state.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from .text import TOKENS_EXPR, TOKENS_SQL

#: Stand-in eval-set selector: ~1% of docs play the benchmark.
EVAL_MOD = 97
#: k-gram width for contamination (the common community choice is 8-13;
#: testdata docs are ~56 tokens so 8 keeps ~49 grams per doc).
DECON_K = 8
#: Containment threshold above which a train doc is flagged.
DECON_T = 0.10


def _kgrams(k: int) -> str:
    """Spark SQL: distinct k-gram strings of the materialized ``toks``
    column (string identity, not an engine hash — the oracle joins on
    the same strings)."""
    parts = ", ".join(f"toks[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN size(toks) < {k} THEN array(array_join(toks, ' ')) "
        f"ELSE array_distinct(transform(sequence(0, size(toks) - {k}), "
        f"i -> concat_ws(' ', {parts}))) END"
    )


def _kgrams_sql(k: int) -> str:
    """DuckDB twin of :func:`_kgrams` (1-based list indexing)."""
    parts = " || ' ' || ".join(f"{TOKENS_SQL}[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len({TOKENS_SQL}) < {k} "
        f"THEN [array_to_string({TOKENS_SQL}, ' ')] "
        f"ELSE list_distinct(list_transform("
        f"range(1, len({TOKENS_SQL}) - {k - 2}), i -> {parts})) END"
    )


def decontaminate_ngram_overlap(
    spark: SparkSession, sf_dir: str, k: int = DECON_K
) -> DataFrame:
    """Per-train-doc containment against the eval k-gram set.

    containment = |doc's k-grams ∩ eval k-grams| / |doc's k-grams|;
    ``flagged`` = containment > DECON_T. Eval docs themselves are
    excluded from the output (they are the benchmark, not candidates).
    The eval k-gram set is distinct-collapsed and broadcast — at 100 TB
    the eval side stays a few MB while the train side streams through
    one inverted join + one per-doc aggregate.
    """
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    grams = doc_kgrams(d, k)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("gram").distinct()
    return containment_vs_eval(grams.filter(~is_eval), eval_grams)


def doc_kgrams(docs: DataFrame, k: int = DECON_K) -> DataFrame:
    """Distinct (doc_id, k-gram) rows of any ``(doc_id, text)`` frame."""
    toks = docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    return toks.selectExpr("doc_id", f"explode({_kgrams(k)}) AS gram")


def containment_vs_eval(
    train_grams: DataFrame, eval_grams: DataFrame
) -> DataFrame:
    """Per-doc containment of ``train_grams`` against a static eval
    k-gram set — the unit the streaming ingest gate reuses per
    micro-batch (the eval set is seeded once and broadcast; only the
    batch's grams are recomputed)."""
    hits = (
        train_grams.join(
            F.broadcast(eval_grams.withColumn("_hit", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
    return hits.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated") / F.col("n_grams").cast("double")).alias(
            "containment"
        ),
        (
            F.col("n_contaminated")
            > F.lit(DECON_T) * F.col("n_grams").cast("double")
        ).alias("flagged"),
    )


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals: duplicate-token
    fraction, most-common-token mass, most-common-bigram mass, and
    token entropy (nats, rounded for cross-engine float parity). One
    explode + per-doc aggregate — no cross-document state."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = d.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    tok = toks.select(
        "doc_id", F.size("toks").alias("n"), F.explode("toks").alias("t")
    )
    tf = tok.groupBy("doc_id", "n", "t").agg(F.count(F.lit(1)).alias("c"))
    per_doc = tf.groupBy("doc_id", "n").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_tf"),
        # -Σ (c/n) ln(c/n); exact ints into one rounded double expr
        F.round(
            -F.sum(
                (F.col("c") / F.col("n").cast("double"))
                * F.log(F.col("c") / F.col("n").cast("double"))
            ),
            9,
        ).alias("token_entropy"),
    )
    # guard single-token docs: sequence(0, -1) is the DESCENDING [0,-1],
    # not empty (same Spark footgun multimodal_frame_sample documents)
    big = toks.filter(F.size("toks") >= 2).selectExpr(
        "doc_id",
        "explode(transform(sequence(0, size(toks) - 2),"
        " i -> concat_ws(' ', toks[i], toks[i+1]))) AS bg",
    )
    bf = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    top_bigram = bf.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_c"), F.sum("c").alias("n_bigrams")
    )
    return (
        per_doc.join(top_bigram, "doc_id")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct_tokens"),
            (
                F.lit(1.0)
                - F.col("n_distinct") / F.col("n").cast("double")
            ).alias("dup_token_frac"),
            (F.col("top_tf") / F.col("n").cast("double")).alias(
                "top_token_frac"
            ),
            (
                F.col("top_bigram_c") / F.col("n_bigrams").cast("double")
            ).alias("top_bigram_frac"),
            "token_entropy",
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "decontaminate_ngram_overlap": decontaminate_ngram_overlap,
    "text_repetition_stats": text_repetition_stats,
}

#: token-entropy sum term, shared shape with the Spark expression
_ENT = "-sum((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)))"

ORACLES: dict[str, str] = {
    "decontaminate_ngram_overlap": f"""
        WITH grams AS (
            SELECT doc_id, unnest({_kgrams_sql(DECON_K)}) AS gram
            FROM documents),
        eval_grams AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0),
        train AS (SELECT * FROM grams WHERE doc_id % {EVAL_MOD} != 0),
        hits AS (
            SELECT t.doc_id, count(*) AS n_grams,
                   CAST(sum(CASE WHEN e.gram IS NULL THEN 0 ELSE 1 END)
                       AS BIGINT) AS n_contaminated
            FROM train t LEFT JOIN eval_grams e ON t.gram = e.gram
            GROUP BY 1)
        SELECT doc_id, n_grams, n_contaminated,
               n_contaminated / CAST(n_grams AS DOUBLE) AS containment,
               n_contaminated > CAST({DECON_T} AS DOUBLE)
                   * CAST(n_grams AS DOUBLE) AS flagged
        FROM hits""",
    "text_repetition_stats": f"""
        WITH tok AS (
            SELECT doc_id, len({TOKENS_SQL}) AS n,
                   unnest({TOKENS_SQL}) AS t
            FROM documents),
        tf AS (
            SELECT doc_id, n, t, count(*) AS c FROM tok GROUP BY 1, 2, 3),
        per_doc AS (
            SELECT doc_id, n, count(*) AS n_distinct, max(c) AS top_tf,
                   round({_ENT}, 9) AS token_entropy
            FROM tf GROUP BY 1, 2),
        big AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len({TOKENS_SQL}) - 0),
                       i -> {TOKENS_SQL}[i] || ' ' || {TOKENS_SQL}[i+1]))
                       AS bg
            FROM documents WHERE len({TOKENS_SQL}) >= 2),
        bf AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
        top_bigram AS (
            SELECT doc_id, max(c) AS top_bigram_c, sum(c) AS n_bigrams
            FROM bf GROUP BY 1)
        SELECT p.doc_id,
               CAST(p.n AS BIGINT) AS n_tokens,
               CAST(p.n_distinct AS BIGINT) AS n_distinct_tokens,
               CAST(1.0 AS DOUBLE) - p.n_distinct / CAST(p.n AS DOUBLE)
                   AS dup_token_frac,
               p.top_tf / CAST(p.n AS DOUBLE) AS top_token_frac,
               b.top_bigram_c / CAST(b.n_bigrams AS DOUBLE)
                   AS top_bigram_frac,
               p.token_entropy
        FROM per_doc p JOIN top_bigram b ON p.doc_id = b.doc_id""",
}
