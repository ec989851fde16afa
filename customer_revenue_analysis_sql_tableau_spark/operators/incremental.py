"""Incremental maintenance of the analytical view.

The reference's ``customer_revenue_summary`` is a virtual view — MySQL
re-executes the 8-table join on every query (``queries_shan.sql:7-42``),
which at 100 TB means re-scanning the full fact history per refresh.
This module maintains the view from its **mergeable partial state**
instead: the level-1 (customer, part-type) aggregate of
``warehouse.partial_aggregate`` is the materialization; a new batch of
orders folds in as

    state' = merge_partials(state, partial_aggregate(delta))
    view   = finalize_summary(state', dims)

touching only the delta's facts plus the (orders-of-magnitude smaller)
state. Every view measure is derivable from mergeable partials — sums
(exact decimal/long, never float), min/max dates, and the A1
top-1-per-group argmax which reads per-(customer, part-type) counts —
which is precisely why the view builder was shaped as a two-level
aggregation in the first place.

Correctness gate: the registry entry's DuckDB oracle is the FULL
RECOMPUTE (``warehouse.VIEW_ORACLE_SQL``) — the driver hash-compares
the incremental path's output against a from-scratch build on every
run. Batch boundaries are deterministic (``o_orderkey % N``), standing
in for the arrival order of a CDC feed; the ingest unit is a complete
order with its lineitems (the same granule the reference loads,
``sql/sakila-data.sql`` inserts whole rentals).

Scale posture: state is keyed by (Customer_ID, p_type) — bounded by
|customers| × |part types|, not by fact rows; the merge shuffles only
state + delta partials. At 100 TB the state lives as a bucketed parquet
table on Customer_ID so the merge and finalize reuse its layout
shuffle-free; here it round-trips through the same in-memory frames the
one-shot view uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .warehouse import (
    VIEW_ORACLE_SQL,
    finalize_summary,
    merge_partials,
    partial_aggregate,
)

#: Deterministic batch split: orders with ``o_orderkey % BATCHES == b``
#: arrive in batch b.
BATCHES = 5


def order_batches(o: DataFrame, l: DataFrame, n_batches: int = BATCHES):
    """Split the order stream into deterministic ingest batches; each
    batch carries complete orders (lineitems follow their order via the
    join inside ``partial_aggregate``)."""
    for b in range(n_batches):
        yield o.filter(F.col("o_orderkey") % n_batches == b), l


def view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytical view built by incremental maintenance: fold each
    order batch's partial aggregate into the running state, then
    finalize once. Must equal the one-shot build bit-for-bit — the
    oracle below IS the full recompute."""
    t = load_tables(
        spark,
        sf_dir,
        names=("customer", "nation", "region", "orders", "lineitem", "part"),
    )
    o, l, p = t["orders"], t["lineitem"], t["part"]
    states = [
        partial_aggregate(batch_o, batch_l, p)
        for batch_o, batch_l in order_batches(o, l)
    ]
    state = merge_partials(*states)
    return finalize_summary(state, t["customer"], t["nation"], t["region"])


def state_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-of-state report: per customer, how many (part-type) state
    rows the materialization carries vs fact rows folded — the
    state-compression ratio that justifies incremental maintenance."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem", "part"))
    state = partial_aggregate(t["orders"], t["lineitem"], t["part"])
    return state.groupBy("Customer_ID").agg(
        F.count(F.lit(1)).alias("state_rows"),
        F.sum("_orders").alias("fact_rows_folded"),
    )


#: Orders with ``o_orderkey % RETRACT_MOD == 0`` are cancelled by the
#: final CDC batch (a DELETE feed).
RETRACT_MOD = 17


def revenue_with_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance under DELETES — the retraction side of
    IVM the insert-only entries don't exercise: after the insert
    batches land, a final CDC batch CANCELS every order with
    ``o_orderkey % RETRACT_MOD == 0``, and the running per-customer
    state must absorb it by folding SIGNED partials (units and order
    counts negated) rather than recomputing. Only the retractable
    measure class rides this entry — SUM and COUNT invert exactly
    under signed merge; MIN/MAX and the view's argmax top-1 do NOT
    (removing the current extremum needs auxiliary per-key structure,
    the textbook deletable-aggregate distinction — those measures stay
    on the insert-only path, ``inc_view_maintenance``).

    Exactness: revenue folds as BIGINT micro-dollar units
    (``cents(price) * (10000 - discount basis points)`` per lineitem —
    the repo's integer-money discipline), so insert+retract is
    bit-exact and order-independent; customers whose every order is
    cancelled leave state at n_orders == 0 and are dropped, matching
    the oracle's recompute over surviving orders. Scale: state stays
    per-customer; each batch folds state ∪ delta with one groupBy,
    lineage truncated per fold; a real deployment reads the same
    signed-delta shape straight from a CDC feed's +I/-D rows."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    o, l = t["orders"], t["lineitem"]
    from ..functions.money import cents

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
        .localCheckpoint()  # feeds every batch filter + the retraction
    )

    def fold(state: DataFrame, delta: DataFrame) -> DataFrame:
        return (
            state.unionByName(delta)
            .groupBy("custkey")
            .agg(
                F.sum("units").alias("units"),
                F.sum("n_orders").alias("n_orders"),
            )
            .localCheckpoint()
        )

    state = None
    for b in range(BATCHES):
        delta = per_order.filter(F.col("okey") % BATCHES == b).select(
            "custkey", "units", F.lit(1).cast("long").alias("n_orders")
        )
        state = delta.groupBy("custkey").agg(
            F.sum("units").alias("units"), F.sum("n_orders").alias("n_orders")
        ).localCheckpoint() if state is None else fold(state, delta)
    retraction = per_order.filter(
        F.col("okey") % RETRACT_MOD == 0
    ).select(
        "custkey",
        (-F.col("units")).alias("units"),
        F.lit(-1).cast("long").alias("n_orders"),
    )
    state = fold(state, retraction)
    return state.filter(F.col("n_orders") > 0).select(
        "custkey",
        F.col("units").alias("revenue_units"),
        "n_orders",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "inc_view_maintenance": view_incremental,
    "inc_state_rollup": state_rollup,
    "inc_revenue_with_retractions": revenue_with_retractions,
}

ORACLES: dict[str, str] = {
    # The strongest possible oracle: incremental output must hash-match
    # a from-scratch recompute of the whole view.
    "inc_view_maintenance": VIEW_ORACLE_SQL,
    # retractions: recompute over SURVIVING orders only — the signed
    # insert+delete folds must land exactly there
    "inc_revenue_with_retractions": f"""
        WITH per_l AS (
            SELECT o.o_custkey AS custkey, o.o_orderkey,
                   CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (10000 -
                      CAST(floor(l.l_discount * 10000 + 0.5) AS BIGINT))
                       AS u
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey % {RETRACT_MOD} != 0)
        SELECT custkey,
               CAST(SUM(u) AS BIGINT) AS revenue_units,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        FROM per_l GROUP BY custkey""",
    "inc_state_rollup": """
        WITH fact AS (
            SELECT o.o_custkey AS Customer_ID, p.p_type, o.o_orderkey
            FROM orders o
            LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            LEFT JOIN part p ON l.l_partkey = p.p_partkey),
        state AS (
            SELECT Customer_ID, p_type, count(o_orderkey) AS _orders
            FROM fact GROUP BY Customer_ID, p_type)
        SELECT Customer_ID, count(*) AS state_rows,
               CAST(sum(_orders) AS BIGINT) AS fact_rows_folded
        FROM state GROUP BY Customer_ID""",
}
