"""Corpus report + curriculum invariants (operators/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.corpus import (
    corpus_stats_report,
    quality_decile_curriculum,
)


def test_corpus_report_conserves_totals(spark, sf_dir):
    """Slice totals must sum to the corpus totals (no doc lost or
    double-counted across (source, lang) groups)."""
    rep = corpus_stats_report(spark, sf_dir)
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ]
    tot = rep.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_chars").alias("chars")
    ).first()
    assert tot.docs == docs.count()
    assert tot.chars == docs.agg(F.sum(F.length("text"))).first()[0]
    # dup counts: every flagged doc belongs to a hash group of size >= 2,
    # so the corpus-wide dup count is even-or-greater per group — weak
    # bound: n_exact_dup_docs <= n_docs per slice and total dups != 1
    rows = rep.collect()
    assert all(r.n_exact_dup_docs <= r.n_docs for r in rows)
    assert sum(r.n_exact_dup_docs for r in rows) != 1


def test_quality_deciles_are_balanced_and_ordered(spark, sf_dir):
    """ntile contract: decile sizes differ by at most 1, every doc is
    assigned exactly once, and score ordering respects decile ordering
    (a doc in a better decile never scores below one in a worse)."""
    cur = quality_decile_curriculum(spark, sf_dir).collect()
    n = len(cur)
    sizes = {}
    for r in cur:
        sizes[r.decile] = sizes.get(r.decile, 0) + 1
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n
    worst_per_decile = {
        d: min(r.quality_score for r in cur if r.decile == d)
        for d in sizes
    }
    best_per_decile = {
        d: max(r.quality_score for r in cur if r.decile == d)
        for d in sizes
    }
    for d in range(1, 10):
        assert worst_per_decile[d] >= best_per_decile[d + 1]
    phases = {r.decile: r.phase for r in cur}
    assert all(
        p == ("high" if d <= 3 else "mid" if d <= 7 else "low")
        for d, p in phases.items()
    )
