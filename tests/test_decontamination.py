"""Decontamination + repetition-stat invariants (the SQL-parity hash
check is in the registry; these pin the semantics)."""

from __future__ import annotations

import math

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.decontamination import (
    DECON_T,
    EVAL_MOD,
    decontaminate_ngram_overlap,
    text_repetition_stats,
)


def test_decontamination_excludes_eval_and_bounds_containment(spark, sf_dir):
    d = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ]
    n_docs = d.count()
    n_eval = d.filter(f"doc_id % {EVAL_MOD} = 0").count()
    rows = decontaminate_ngram_overlap(spark, sf_dir).collect()
    assert len(rows) == n_docs - n_eval
    assert n_eval > 0  # the stand-in benchmark is non-empty
    for r in rows:
        assert r.doc_id % EVAL_MOD != 0
        assert 0 <= r.n_contaminated <= r.n_grams
        assert abs(r.containment - r.n_contaminated / r.n_grams) < 1e-12
        assert r.flagged == (r.n_contaminated > DECON_T * r.n_grams)


def test_repetition_stats_are_well_formed(spark, sf_dir):
    rows = text_repetition_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct_tokens <= r.n_tokens
        assert 0.0 <= r.dup_token_frac < 1.0
        # the most common token/bigram carries at least its uniform share
        assert r.top_token_frac >= 1.0 / r.n_tokens
        assert r.top_bigram_frac >= 1.0 / max(1, r.n_tokens - 1)
        # entropy of n tokens is within [0, ln(n_distinct)]
        assert -1e-9 <= r.token_entropy <= math.log(r.n_distinct_tokens) + 1e-9
