"""Stored-routine twins (SURVEY.md §2.11).

The reference ships 3 stored procedures + 3 stored functions
(``sql/sakila-schema.sql:479-678``) — imperative SQL wrapping relational
ops. None is per-row logic, so each maps to a parameterized Python
function composing DataFrames (no UDFs):

- ``rewards_report(min_purchases, min_amount)``
  (``sql/sakila-schema.sql:479-540``): last-calendar-month activity,
  HAVING thresholds, join back to customer.
- ``get_customer_balance(cust, date)`` (``:546-585``): scalar from
  filtered aggregates — returned as a 1-row DataFrame so the oracle can
  hash it.
- ``film_in_stock`` / ``film_not_in_stock`` / ``inventory_in_stock``
  (``:591-678``): per-row EXISTS probes, rewritten set-based as
  semi/anti joins against open rentals (here: open orders,
  ``o_orderstatus = 'O'``).

Registered entries pin the parameters so results are deterministic; the
functions themselves stay parameterized (the engine API).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.money import money
from .warehouse import LATE_AFTER_DAYS, late_fee_expr, revenue_expr

#: Pinned params for the registered (hash-checked) variants.
REWARDS_ANCHOR = "2001-08-01"  # report month = July 2001
REWARDS_MIN_ORDERS = 2
REWARDS_MIN_AMOUNT = 50000
BALANCE_CUSTKEY = 1
BALANCE_DATE = "1999-01-01"
#: Open orders placed on/after this date count as "checked out" for the
#: in-stock family (keeps both sides of the semi/anti split non-empty).
STOCK_SINCE = "2001-01-01"


def rewards_report(
    spark: SparkSession,
    sf_dir: str,
    min_orders: int = REWARDS_MIN_ORDERS,
    min_amount: float = REWARDS_MIN_AMOUNT,
    anchor: str = REWARDS_ANCHOR,
) -> DataFrame:
    """Twin of ``rewards_report`` (``sql/sakila-schema.sql:479-540``).

    Customers whose last-calendar-month (the month before ``anchor``)
    order volume clears both thresholds, joined back to the customer
    dimension — F3 BETWEEN + A0 agg + F7 HAVING + J10 join-back.
    """
    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    c, o = t["customer"], t["orders"]
    month_end = F.lit(anchor).cast("date")  # exclusive
    month_start = F.add_months(month_end, -1)
    active = (
        o.filter(
            (F.to_date(o.o_orderdate) >= month_start)
            & (F.to_date(o.o_orderdate) < month_end)
        )
        .groupBy(o.o_custkey)
        .agg(
            F.count(F.lit(1)).alias("month_orders"),
            F.sum(money(o.o_totalprice)).alias("_amt"),
        )
        .filter(
            (F.col("month_orders") >= min_orders)
            & (F.col("_amt") > F.lit(min_amount).cast("decimal(18,2)"))
        )
    )
    return (
        c.join(active, c.c_custkey == active.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "month_orders",
            F.round(F.col("_amt"), 2).cast("double").alias("month_amount"),
        )
    )


def get_customer_balance(
    spark: SparkSession,
    sf_dir: str,
    custkey: int = BALANCE_CUSTKEY,
    as_of: str = BALANCE_DATE,
) -> DataFrame:
    """Twin of ``get_customer_balance`` (``sql/sakila-schema.sql:546-585``):
    line revenue shipped before ``as_of`` plus late fees, minus order
    prepayments before ``as_of`` — three filtered aggregates combined
    into one scalar, returned as a 1-row DataFrame (V5)."""
    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    o, l = t["orders"], t["lineitem"]
    cutoff = F.lit(as_of).cast("date")
    # inner join: the shipdate filter below discards NULL-extended rows
    # anyway, and the empty-aggregate case is handled by COALESCE
    ol = o.filter(o.o_custkey == custkey).join(l, o.o_orderkey == l.l_orderkey)
    shipped = ol.filter(F.to_date(l.l_shipdate) < cutoff)
    fees = shipped.agg(
        F.coalesce(F.sum(revenue_expr(l)), F.lit(0).cast("decimal(18,2)")).alias(
            "_rev"
        ),
        F.coalesce(
            F.sum(late_fee_expr(l, o)), F.lit(0).cast("decimal(18,2)")
        ).alias("_late"),
    )
    paid = (
        o.filter((o.o_custkey == custkey) & (F.to_date(o.o_orderdate) < cutoff))
        .agg(
            F.coalesce(F.sum(money(o.o_totalprice) * F.lit(0.10).cast("decimal(3,2)")),
                       F.lit(0).cast("decimal(18,2)")).alias("_paid")
        )
    )
    return (
        fees.crossJoin(paid)
        .select(
            F.lit(custkey).cast("long").alias("custkey"),
            F.round(F.col("_rev") + F.col("_late") - F.col("_paid"), 2)
            .cast("double")
            .alias("balance"),
        )
    )


def parts_in_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twin of ``film_in_stock``/``inventory_in_stock``
    (``sql/sakila-schema.sql:591-606,651-678``): parts NOT tied up in any
    open order — set-based **left anti** join replacing the reference's
    per-row function probe."""
    t = load_tables(spark, sf_dir, names=("part", "orders", "lineitem"))
    p, o, l = t["part"], t["orders"], t["lineitem"]
    open_orders = o.filter(
        (o.o_orderstatus == "O")
        & (F.to_date(o.o_orderdate) >= F.lit(STOCK_SINCE).cast("date"))
    )
    open_lines = l.join(open_orders, l.l_orderkey == o.o_orderkey, "left_semi")
    return p.join(
        open_lines, p.p_partkey == open_lines.l_partkey, "left_anti"
    ).select("p_partkey", "p_name", "p_type")


def parts_not_in_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complement (``film_not_in_stock``, ``sql/sakila-schema.sql:612-627``):
    parts with at least one open-order line — left semi."""
    t = load_tables(spark, sf_dir, names=("part", "orders", "lineitem"))
    p, o, l = t["part"], t["orders"], t["lineitem"]
    open_orders = o.filter(
        (o.o_orderstatus == "O")
        & (F.to_date(o.o_orderdate) >= F.lit(STOCK_SINCE).cast("date"))
    )
    open_lines = l.join(open_orders, l.l_orderkey == o.o_orderkey, "left_semi")
    return p.join(
        open_lines, p.p_partkey == open_lines.l_partkey, "left_semi"
    ).select("p_partkey", "p_name", "p_type")


def part_held_by_customers(
    spark: SparkSession, sf_dir: str, partkey: int = 1
) -> DataFrame:
    """Twin of ``inventory_held_by_customer`` (``sql/sakila-schema.sql:633-645``):
    who currently holds part ``partkey`` via an open order."""
    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    return (
        l.filter(l.l_partkey == partkey)
        .join(o.filter(o.o_orderstatus == "O"), l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "l_partkey")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "proc_rewards_report": rewards_report,
    "proc_customer_balance": get_customer_balance,
    "proc_parts_in_stock": parts_in_stock,
    "proc_parts_not_in_stock": parts_not_in_stock,
    "proc_part_held_by_customers": part_held_by_customers,
}

_LATE_SQL = f"""CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
        CAST(l.l_shipdate AS DATE)) > {LATE_AFTER_DAYS}
    THEN (date_diff('day', CAST(o.o_orderdate AS DATE),
        CAST(l.l_shipdate AS DATE)) - {LATE_AFTER_DAYS}) * CAST(0.50 AS DECIMAL(3,2))
    ELSE CAST(0 AS DECIMAL(3,2)) END"""

_REV_SQL = (
    "CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))"
)

ORACLES: dict[str, str] = {
    "proc_rewards_report": f"""
        WITH active AS (
            SELECT o_custkey, count(*) AS month_orders,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS amt
            FROM orders
            WHERE CAST(o_orderdate AS DATE) >= (DATE '{REWARDS_ANCHOR}' - INTERVAL 1 MONTH)
              AND CAST(o_orderdate AS DATE) < DATE '{REWARDS_ANCHOR}'
            GROUP BY o_custkey
            HAVING count(*) >= {REWARDS_MIN_ORDERS}
               AND sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   > CAST({REWARDS_MIN_AMOUNT} AS DECIMAL(18,2)))
        SELECT c.c_custkey, c.c_name, a.month_orders,
               CAST(round(a.amt, 2) AS DOUBLE) AS month_amount
        FROM customer c JOIN active a ON c.c_custkey = a.o_custkey""",
    "proc_customer_balance": f"""
        WITH fees AS (
            SELECT coalesce(sum({_REV_SQL}), CAST(0 AS DECIMAL(18,2))) AS rev,
                   coalesce(sum({_LATE_SQL}), CAST(0 AS DECIMAL(18,2))) AS late
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_custkey = {BALANCE_CUSTKEY}
              AND CAST(l.l_shipdate AS DATE) < DATE '{BALANCE_DATE}'),
        paid AS (
            SELECT coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))
                       * CAST(0.10 AS DECIMAL(3,2))), CAST(0 AS DECIMAL(18,2))) AS p
            FROM orders WHERE o_custkey = {BALANCE_CUSTKEY}
              AND CAST(o_orderdate AS DATE) < DATE '{BALANCE_DATE}')
        SELECT CAST({BALANCE_CUSTKEY} AS BIGINT) AS custkey,
               CAST(round(fees.rev + fees.late - paid.p, 2) AS DOUBLE) AS balance
        FROM fees, paid""",
    "proc_parts_in_stock": """
        SELECT p_partkey, p_name, p_type FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'O'
              AND CAST(o.o_orderdate AS DATE) >= DATE '2001-01-01'
              AND l.l_partkey = p.p_partkey)""",
    "proc_parts_not_in_stock": """
        SELECT p_partkey, p_name, p_type FROM part p
        WHERE EXISTS (
            SELECT 1 FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'O'
              AND CAST(o.o_orderdate AS DATE) >= DATE '2001-01-01'
              AND l.l_partkey = p.p_partkey)""",
    "proc_part_held_by_customers": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, l.l_partkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'O' AND l.l_partkey = 1""",
}
