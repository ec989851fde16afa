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
  (``ntile(10)`` over the composite score, deterministic tie-break) and
  a coarse phase tag. A single global window at test scale; at 100 TB
  the same assignment runs as a two-pass quantile-cutoff join (the
  documented ``features.value_quartile_bins`` recipe) — ntile's single
  ordered partition is the small-corpus form, and the docstring is the
  contract for swapping in the cutoff join.

Both exact relational computations → hash-checked DuckDB oracles.
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


def quality_decile_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each doc's corpus-wide quality decile (1 = best) and curriculum
    phase. ntile runs on one ordered partition — fine for the proof
    corpus; the 100 TB form joins against 9 approx-percentile cutoffs
    instead (same assignment up to sketch error at the decile edges)."""
    scored = quality_scored(
        load_tables(spark, sf_dir, names=("documents",))["documents"]
    ).select("doc_id", "quality_score")
    w = Window.orderBy(F.desc("quality_score"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "quality_score",
        F.ntile(10).over(w).cast("long").alias("decile"),
    ).withColumn(
        "phase",
        F.when(F.col("decile") <= PHASE_HIGH, "high")
        .when(F.col("decile") <= PHASE_MID, "mid")
        .otherwise("low"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_stats_report": corpus_stats_report,
    "quality_decile_curriculum": quality_decile_curriculum,
}

ORACLES: dict[str, str] = {
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
}
