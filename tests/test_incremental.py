"""Incremental view maintenance: merge algebra + equivalence to the
one-shot build (the DuckDB gate already checks incremental vs full
recompute; these pin the state algebra itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.incremental import (
    BATCHES,
    order_batches,
    state_rollup,
    view_incremental,
)
from customer_revenue_analysis_sql_tableau_spark.operators.warehouse import (
    customer_value_summary,
    merge_partials,
    partial_aggregate,
)


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_merge_of_batch_partials_equals_oneshot_partial(spark, sf_dir):
    """merge(partial(batch_1..N)) ≡ partial(all): the state algebra is
    exact under batching."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem", "part"))
    o, l, p = t["orders"], t["lineitem"], t["part"]
    oneshot = partial_aggregate(o, l, p)
    merged = merge_partials(
        *[partial_aggregate(bo, bl, p) for bo, bl in order_batches(o, l)]
    )
    assert _frames_equal(oneshot, merged)


def test_merge_with_empty_delta_is_identity(spark, sf_dir):
    t = load_tables(spark, sf_dir, names=("orders", "lineitem", "part"))
    o, l, p = t["orders"], t["lineitem"], t["part"]
    state = partial_aggregate(o, l, p)
    empty = partial_aggregate(o.filter(F.lit(False)), l, p)
    assert _frames_equal(state, merge_partials(state, empty))


def test_incremental_view_equals_oneshot_view(spark, sf_dir):
    """End-to-end: folding BATCHES deterministic order batches and
    finalizing must reproduce the one-shot view bit-for-bit."""
    assert BATCHES > 1
    inc = view_incremental(spark, sf_dir)
    full = customer_value_summary(spark, sf_dir)
    assert _frames_equal(inc, full)


def test_state_is_compressed_relative_to_facts(spark, sf_dir):
    """The maintained state must be strictly smaller than the fact rows
    it folds — otherwise incremental maintenance buys nothing."""
    r = state_rollup(spark, sf_dir)
    assert r.filter(F.col("state_rows") > F.col("fact_rows_folded")).count() == 0
    tot = r.agg(
        F.sum("state_rows").alias("s"), F.sum("fact_rows_folded").alias("f")
    ).collect()[0]
    assert tot["s"] < tot["f"]
