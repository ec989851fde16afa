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
4. **Benchmark decontamination** — drop training docs whose 8-gram
   containment against the eval-set k-gram index exceeds the threshold
   (`decontamination.decontaminate_ngram_overlap`).

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
from .decontamination import decontaminate_ngram_overlap
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
    # (components_unionfind_driver) stays as the test-only cross-check; at
    # 100 TB pair cardinality collecting the edge set would OOM the driver.
    comp = dedup_components_distributed(spark, sf_dir)
    near_kept = (
        comp.filter(F.col("doc_id") == F.col("component_id")).select("doc_id")
    )

    # benchmark-leak gate: the containment stats are computed corpus-wide
    # (decontaminate_ngram_overlap is an independent oracle-checked
    # operator), and the dedup-before-decontamination stage ORDER is
    # applied via the reason-precedence column, not by shrinking this
    # join's input; the stand-in eval subset itself passes un-flagged.
    contaminated = (
        decontaminate_ngram_overlap(spark, sf_dir)
        .filter(F.col("flagged"))
        .select("doc_id")
    )

    return (
        d.select("doc_id")
        .join(quality_ok.withColumn("_q", F.lit(True)), "doc_id", "left")
        .join(exact_kept.withColumn("_e", F.lit(True)), "doc_id", "left")
        .join(near_kept.withColumn("_n", F.lit(True)), "doc_id", "left")
        .join(contaminated.withColumn("_c", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("_q").isNotNull()
                & F.col("_e").isNotNull()
                & F.col("_n").isNotNull()
                & F.col("_c").isNull()
            ).alias("kept"),
            F.when(F.col("_q").isNull(), "low_quality")
            .when(F.col("_e").isNull(), "exact_duplicate")
            .when(F.col("_n").isNull(), "near_duplicate")
            .when(F.col("_c").isNotNull(), "contaminated")
            .alias("reason"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "training_data_pipeline": training_data_pipeline,
}


def _pipeline_oracle() -> str:
    """DuckDB twin of the whole composed pipeline: the quality-score
    expression is the same tree the ``text_quality_score`` oracle uses
    (hash-verified), the near-dup components are the recursive-CTE
    closure from ``dedup._COMPONENTS_SQL`` (hash-verified against both
    Spark component implementations), and the contamination gate is the
    ``decontamination`` oracle's containment flag."""
    from .decontamination import DECON_K, DECON_T, EVAL_MOD, _kgrams_sql
    from .dedup import _JACCARD_CTES
    from .text import QUALITY_SQL as quality
    return f"""
        WITH RECURSIVE {_JACCARD_CTES},
        edges AS (
            SELECT d1 AS a, d2 AS b FROM jpairs
            UNION ALL SELECT d2, d1 FROM jpairs),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        near_kept AS (
            SELECT a AS doc_id FROM reach GROUP BY a HAVING a = min(b)),
        quality_ok AS (
            SELECT doc_id FROM documents
            WHERE {quality} >= CAST({QUALITY_T} AS DOUBLE)),
        exact_kept AS (
            SELECT min(d.doc_id) AS doc_id
            FROM documents d JOIN quality_ok USING (doc_id)
            GROUP BY md5(trim(lower(d.text)))),
        grams AS (
            SELECT doc_id, unnest({_kgrams_sql(DECON_K)}) AS gram
            FROM documents),
        eval_grams AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0),
        contaminated AS (
            SELECT t.doc_id
            FROM (SELECT * FROM grams WHERE doc_id % {EVAL_MOD} != 0) t
            LEFT JOIN eval_grams e ON t.gram = e.gram
            GROUP BY t.doc_id
            HAVING sum(CASE WHEN e.gram IS NULL THEN 0 ELSE 1 END)
                   > CAST({DECON_T} AS DOUBLE) * CAST(count(*) AS DOUBLE))
        SELECT d.doc_id,
               (qok.doc_id IS NOT NULL AND ek.doc_id IS NOT NULL
                AND nk.doc_id IS NOT NULL AND ct.doc_id IS NULL) AS kept,
               CASE WHEN qok.doc_id IS NULL THEN 'low_quality'
                    WHEN ek.doc_id IS NULL THEN 'exact_duplicate'
                    WHEN nk.doc_id IS NULL THEN 'near_duplicate'
                    WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
               END AS reason
        FROM documents d
        LEFT JOIN quality_ok qok ON d.doc_id = qok.doc_id
        LEFT JOIN exact_kept ek ON d.doc_id = ek.doc_id
        LEFT JOIN near_kept nk ON d.doc_id = nk.doc_id
        LEFT JOIN contaminated ct ON d.doc_id = ct.doc_id"""


ORACLES: dict[str, str] = {
    "training_data_pipeline": _pipeline_oracle(),
}
