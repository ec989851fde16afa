"""Sakila stored routines, set-based (§2.11) on the reference's own data.

The reference ships 3 procedures + 3 functions of imperative SQL
(``sql/sakila-schema.sql:479-678``). None is per-row logic in essence —
each is a parameterized query — so each maps to a Python function
composing DataFrames over the parsed-dump tables (no UDFs). The per-row
BOOLEAN/INT functions (``inventory_in_stock``,
``inventory_held_by_customer``) become set-valued frames: computing the
answer for ALL ids in one pass is the Spark-native shape, and the
scalar form is a filter over it.

Faithful-semantics notes:

- ``rewards_report`` (``:479-540``): the last-calendar-month window
  derives from CURDATE(); injected as ``anchor_date`` for determinism
  (SURVEY.md §7.4.3). HAVING uses strict ``>`` on both sum and count.
- ``get_customer_balance`` (``:546-585``): the code charges $1/day
  overdue and never the replacement cost — its own comment claims
  otherwise; we replicate the CODE. Open rentals (NULL return_date)
  accrue nothing: ``TO_DAYS(NULL)`` is NULL and MySQL's IF(NULL>x)
  takes the ELSE branch — ``F.when`` has identical NULL semantics.
- ``inventory_in_stock`` (``:651-678``): an item is in stock iff it has
  no open rental row; the per-row COUNT probe becomes one left join +
  aggregation over all items (the anti-join formulation the reference
  approximates row-by-row).
"""

from __future__ import annotations

from datetime import date, timedelta
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _last_month_window(anchor: str) -> tuple[str, str]:
    """First/last day of the calendar month before ``anchor``
    (``sql/sakila-schema.sql:505-507``)."""
    a = date.fromisoformat(anchor)
    year, month = (a.year, a.month - 1) if a.month > 1 else (a.year - 1, 12)
    start = date(year, month, 1)
    nxt = date(year, month + 1, 1) if month < 12 else date(year + 1, 1, 1)
    return start.isoformat(), (nxt - timedelta(days=1)).isoformat()


def rewards_report(
    t: dict[str, DataFrame],
    min_monthly_purchases: int,
    min_dollar_amount_purchased: Decimal | float,
    anchor_date: str,
) -> DataFrame:
    """``rewards_report`` (``sql/sakila-schema.sql:479-540``): customers
    whose last-calendar-month payments exceed both thresholds; returns
    ``customer.*`` rows (the OUT count is ``df.count()``)."""
    if min_monthly_purchases == 0:
        raise ValueError("Minimum monthly purchases parameter must be > 0")
    if float(min_dollar_amount_purchased) == 0.0:
        raise ValueError(
            "Minimum monthly dollar amount purchased parameter must be > $0.00"
        )
    start, end = _last_month_window(anchor_date)
    p, c = t["payment"], t["customer"]
    qualifying = (
        p.filter(F.to_date(p.payment_date).between(F.lit(start), F.lit(end)))
        .groupBy("customer_id")
        .agg(
            F.sum("amount").alias("_amt"),
            F.count("customer_id").alias("_cnt"),
        )
        .filter(
            (F.col("_amt") > F.lit(str(min_dollar_amount_purchased)).cast("decimal(10,2)"))
            & (F.col("_cnt") > min_monthly_purchases)
        )
        .select("customer_id")
    )
    return c.join(F.broadcast(qualifying), "customer_id")


def customer_balances(
    t: dict[str, DataFrame], effective_date: str
) -> DataFrame:
    """Set-based ``get_customer_balance`` (``sql/sakila-schema.sql:546-585``)
    for EVERY customer at once: rent fees + $1/day overdue − payments,
    all as-of ``effective_date``. Columns: customer_id, rent_fees,
    over_fees, payments, balance."""
    r, i, f, p = t["rental"], t["inventory"], t["film"], t["payment"]
    eff = F.lit(effective_date).cast("timestamp")

    rented = (
        r.filter(r.rental_date <= eff)
        .join(F.broadcast(i), r.inventory_id == i.inventory_id)
        .join(F.broadcast(f), i.film_id == f.film_id)
    )
    overdue_days = F.datediff(r.return_date, r.rental_date) - f.rental_duration
    fees = rented.groupBy(r.customer_id.alias("customer_id")).agg(
        F.coalesce(F.sum(f.rental_rate), F.lit(0).cast("decimal(5,2)")).alias(
            "rent_fees"
        ),
        F.coalesce(
            F.sum(F.when(overdue_days > 0, overdue_days).otherwise(0)), F.lit(0)
        ).alias("over_fees"),
    )
    paid = (
        p.filter(p.payment_date <= eff)
        .groupBy(p.customer_id.alias("customer_id"))
        .agg(F.coalesce(F.sum(p.amount), F.lit(0).cast("decimal(5,2)")).alias("payments"))
    )
    joined = fees.join(paid, "customer_id", "full")
    z2 = F.lit(0).cast("decimal(5,2)")
    return joined.select(
        "customer_id",
        F.coalesce("rent_fees", z2).alias("rent_fees"),
        F.coalesce("over_fees", F.lit(0)).alias("over_fees"),
        F.coalesce("payments", z2).alias("payments"),
        (
            F.coalesce("rent_fees", z2)
            + F.coalesce("over_fees", F.lit(0))
            - F.coalesce("payments", z2)
        ).alias("balance"),
    )


def get_customer_balance(
    t: dict[str, DataFrame], customer_id: int, effective_date: str
) -> Decimal:
    """Scalar form (V5 driver-side scalar extraction)."""
    row = (
        customer_balances(t, effective_date)
        .filter(F.col("customer_id") == customer_id)
        .collect()
    )
    return Decimal("0.00") if not row else Decimal(str(row[0]["balance"]))


def inventory_in_stock(t: dict[str, DataFrame]) -> DataFrame:
    """Set-based ``inventory_in_stock`` (``sql/sakila-schema.sql:651-678``):
    (inventory_id, in_stock) for every item — in stock iff no open
    rental (zero rentals ever ⇒ TRUE, same as the routine's first
    branch)."""
    i, r = t["inventory"], t["rental"]
    open_rentals = (
        r.filter(r.return_date.isNull())
        .groupBy("inventory_id")
        .agg(F.count(F.lit(1)).alias("_open"))
    )
    return i.join(open_rentals, "inventory_id", "left").select(
        "inventory_id",
        "film_id",
        "store_id",
        F.col("_open").isNull().alias("in_stock"),
    )


def film_in_stock(
    t: dict[str, DataFrame], film_id: int, store_id: int
) -> DataFrame:
    """``film_in_stock`` (``sql/sakila-schema.sql:591-606``): in-stock
    inventory_ids of a film at a store (count = ``df.count()``)."""
    stock = inventory_in_stock(t)
    return stock.filter(
        (stock.film_id == film_id) & (stock.store_id == store_id) & stock.in_stock
    ).select("inventory_id")


def film_not_in_stock(
    t: dict[str, DataFrame], film_id: int, store_id: int
) -> DataFrame:
    """``film_not_in_stock`` (``sql/sakila-schema.sql:612-627``)."""
    stock = inventory_in_stock(t)
    return stock.filter(
        (stock.film_id == film_id) & (stock.store_id == store_id) & ~stock.in_stock
    ).select("inventory_id")


def inventory_held_by_customer(t: dict[str, DataFrame]) -> DataFrame:
    """Set-based ``inventory_held_by_customer``
    (``sql/sakila-schema.sql:633-645``): the customer holding each
    currently-open rental."""
    r = t["rental"]
    return r.filter(r.return_date.isNull()).select("inventory_id", "customer_id")
