"""Composition invariants of the training-data cleaning pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.dedup import dedup_components
from customer_revenue_analysis_sql_tableau_spark.operators.pipeline import training_data_pipeline
from customer_revenue_analysis_sql_tableau_spark.operators.text import text_quality_score


def test_pipeline_covers_every_doc_once(spark, sf_dir):
    out = training_data_pipeline(spark, sf_dir)
    n_docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # kept ⟺ reason IS NULL
    assert out.filter(F.col("kept") & F.col("reason").isNotNull()).count() == 0
    assert out.filter(~F.col("kept") & F.col("reason").isNull()).count() == 0


def test_pipeline_stage_precedence_and_survivors(spark, sf_dir):
    out = training_data_pipeline(spark, sf_dir).cache()
    try:
        # every low-quality doc carries that reason even if also a dup
        low_q = {
            r.doc_id
            for r in text_quality_score(spark, sf_dir)
            .filter(F.col("quality_score") < 0.35)
            .collect()
        }
        tagged = {r.doc_id: r.reason for r in out.collect()}
        for doc in low_q:
            assert tagged[doc] == "low_quality"
        # near-dup components keep exactly their min member (unless an
        # earlier stage dropped it)
        comps = dedup_components(spark, sf_dir).collect()
        by_comp: dict[int, list[int]] = {}
        for r in comps:
            by_comp.setdefault(r.component_id, []).append(r.doc_id)
        for cid, members in by_comp.items():
            if len(members) < 2:
                continue
            near_dropped = [d for d in members if tagged[d] == "near_duplicate"]
            assert min(members) not in near_dropped
    finally:
        out.unpersist()


def test_pipeline_deterministic(spark, sf_dir):
    a = sorted(map(tuple, training_data_pipeline(spark, sf_dir).collect()))
    b = sorted(map(tuple, training_data_pipeline(spark, sf_dir).collect()))
    assert a == b
