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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "inc_view_maintenance": view_incremental,
    "inc_state_rollup": state_rollup,
}

ORACLES: dict[str, str] = {
    # The strongest possible oracle: incremental output must hash-match
    # a from-scratch recompute of the whole view.
    "inc_view_maintenance": VIEW_ORACLE_SQL,
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
