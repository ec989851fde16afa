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


def test_revenue_retractions_fold_deletes_exactly(spark, sf_dir):
    """Signed-merge maintenance must equal the recompute over surviving
    orders, and the delete batch must have genuinely changed state
    (cancelled orders exist and carried revenue)."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.incremental import (
        RETRACT_MOD,
        revenue_with_retractions,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from customer_revenue_analysis_sql_tableau_spark.functions.money import cents

    per_order = (
        l.groupBy(F.col("l_orderkey").alias("okey"))
        .agg(
            F.sum(
                cents(F.col("l_extendedprice"))
                * (F.lit(10000) - cents(F.col("l_discount"), 4))
            ).alias("units")
        )
        .join(
            o.select(
                F.col("o_orderkey").alias("okey"),
                F.col("o_custkey").alias("custkey"),
            ),
            "okey",
        )
    )
    surviving = per_order.filter(F.col("okey") % RETRACT_MOD != 0)
    expected = {
        r.custkey: (r.revenue_units, r.n_orders)
        for r in surviving.groupBy("custkey")
        .agg(
            F.sum("units").alias("revenue_units"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    }
    got = {
        r.custkey: (r.revenue_units, r.n_orders)
        for r in revenue_with_retractions(spark, sf_dir).collect()
    }
    assert got == expected
    # the retraction batch was non-vacuous
    cancelled = per_order.filter(F.col("okey") % RETRACT_MOD == 0)
    assert cancelled.count() > 0
    touched = {r.custkey for r in cancelled.select("custkey").distinct().collect()}
    full = {
        r.custkey: (r.revenue_units, r.n_orders)
        for r in per_order.groupBy("custkey")
        .agg(
            F.sum("units").alias("revenue_units"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    }
    assert any(got.get(c) != full.get(c) for c in touched)


def test_minmax_retractions_replace_deleted_extrema(spark, sf_dir):
    """Deletable MIN/MAX: the buffered-candidate + drain-recompute
    maintenance must equal the from-scratch extremes over surviving
    orders; at buf_n=1 EVERY deleted per-key max drains its buffer, so
    the recompute path is exercised hard; and the delete batch must
    have genuinely changed at least one customer's max."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.incremental import (
        RETRACT_MOD,
        _per_order_units,
        minmax_with_retractions,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per_order = _per_order_units(o, l)

    def extremes(df):
        return {
            r.custkey: (r.mx, r.mn, r.n)
            for r in df.groupBy("custkey")
            .agg(
                F.max("units").alias("mx"),
                F.min("units").alias("mn"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }

    expected = extremes(per_order.filter(F.col("okey") % RETRACT_MOD != 0))
    for buf_n in (1, 2):
        got = {
            r.custkey: (r.max_order_units, r.min_order_units, r.n_orders)
            for r in minmax_with_retractions(spark, sf_dir, buf_n).collect()
        }
        assert got == expected, f"buf_n={buf_n} diverged from recompute"
    # a delete changed at least one customer's max (not just counts)
    full = extremes(per_order)
    assert any(
        expected[c][0] != full[c][0] for c in expected if c in full
    ), "fixture never deletes a per-key max — test is vacuous"
