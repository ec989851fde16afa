"""End-to-end training-data cleaning pipeline (the engine's purpose at
100 TB, SURVEY §7.5 composed).

One declarative flow over ``documents``:

1. **Quality gate** — composite score (stopword/length/punct ratios,
   `text.text_quality_score`) ≥ threshold.
2. **Exact dedup** — one survivor (min doc_id) per normalized text hash.
3. **Near-dup dedup** — one survivor per connected component of
   verified Jaccard≥0.8 pairs (`dedup.dedup_components_distributed`,
   executor-side min-label propagation; the driver-side union-find
   twin is the test-only cross-check).

Output: every doc_id with ``kept`` and the first ``reason`` it was
dropped (quality < exact-dup < near-dup precedence, mirroring stage
order). Each stage is itself an oracle-checked operator; this module
composes them, and pytest pins the composition invariants (survivor
uniqueness, precedence, determinism). Rows-only in the registry: the
near-dup stage's component ids come from the LSH/union-find path.

Scale posture: stages communicate by doc_id frames (narrow), the
quality gate prunes before any pairwise work, and every join is on
doc_id. No stage collects documents to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from .dedup import dedup_components_distributed
from .text import text_quality_score

#: Minimum composite quality score to keep a document.
QUALITY_T = 0.35


def training_data_pipeline(
    spark: SparkSession, sf_dir: str, quality_t: float = QUALITY_T
) -> DataFrame:
    """(doc_id, kept, reason) for every document; reason is NULL when
    kept, else the first failing stage."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]

    quality_ok = (
        text_quality_score(spark, sf_dir)
        .filter(F.col("quality_score") >= quality_t)
        .select("doc_id")
    )

    # exact dedup among quality survivors: min doc_id per text hash
    texts = d.join(quality_ok, "doc_id").select(
        "doc_id", F.md5(F.trim(F.lower("text"))).alias("text_hash")
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    exact_kept = (
        texts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )

    # near-dup components over the full corpus; survivor = component min.
    # Distributed min-label propagation — the driver-side union-find twin
    # (dedup_components) stays as the test-only cross-check; at 100 TB pair
    # cardinality collecting the edge set would OOM the driver.
    comp = dedup_components_distributed(spark, sf_dir)
    near_kept = (
        comp.filter(F.col("doc_id") == F.col("component_id")).select("doc_id")
    )

    return (
        d.select("doc_id")
        .join(quality_ok.withColumn("_q", F.lit(True)), "doc_id", "left")
        .join(exact_kept.withColumn("_e", F.lit(True)), "doc_id", "left")
        .join(near_kept.withColumn("_n", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("_q").isNotNull()
                & F.col("_e").isNotNull()
                & F.col("_n").isNotNull()
            ).alias("kept"),
            F.when(F.col("_q").isNull(), "low_quality")
            .when(F.col("_e").isNull(), "exact_duplicate")
            .when(F.col("_n").isNull(), "near_duplicate")
            .alias("reason"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "training_data_pipeline": training_data_pipeline,  # rows-only
}

ORACLES: dict[str, str] = {}
