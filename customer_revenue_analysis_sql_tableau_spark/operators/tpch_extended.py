"""Extended TPC-H-shaped workload (q6/q7/q8/q13/q14/q15/q17/q18/q22).

The reference's 11 queries all regroup one view (``queries_shan.sql:44-144``);
this module widens the SQL workload a warehouse user actually runs to the
classic TPC-H shapes the driver testdata supports. Columns the testdata
lacks (partsupp, l_commitdate/l_receiptdate/l_shipmode, p_container,
c_phone) force adaptations, noted per query. Every query keeps the repo's
exactness discipline: money sums in decimal/integer-cents, every division
rewritten as exact integer math shared verbatim with the DuckDB oracle
(see functions/money.py), every LIMIT under a total order.

Scale posture: single fact pass per query; dims broadcast; ratios and
averages computed from mergeable sums (no AVG over a shuffle boundary);
the q17 per-part average decorrelates into one partial aggregate joined
back — the same two-level shape as the warehouse view (warehouse.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.money import cents, money, round2_div, round2_div_sql
from .warehouse import sum_revenue

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _pct_ratio(num, den, scale: int = 4) -> F.Column:
    """``ROUND(100·num/den, 2)`` with HALF_UP via exact integer math.

    ``num``/``den`` are positive decimals with ``scale`` fractional
    digits (money sums). Scaled to longs ``Ni``/``Di``, the percent in
    cents is ``(2·10⁴·Ni + Di) div (2·Di)`` — bit-identical in Spark and
    DuckDB. Long-safe while 2·10⁴·Ni < 2⁶³, i.e. group revenue below
    ~4.6·10¹⁰ dollars at scale 4; per-(year|month) promo/market groups
    sit far under that, and the partial sums stay decimal until this
    final scalar step.
    """
    n_i = (num * F.lit(10**scale)).cast("long")
    d_i = (den * F.lit(10**scale)).cast("long")
    x = F.lit(2 * 10**4) * n_i + d_i
    y = F.lit(2) * d_i
    cents = (x - F.pmod(x, y)) / y
    return cents / F.lit(100.0)


def _pct_ratio_sql(num_sql: str, den_sql: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`_pct_ratio` (same integer math)."""
    n_i = f"CAST(({num_sql}) * {10**scale} AS BIGINT)"
    d_i = f"CAST(({den_sql}) * {10**scale} AS BIGINT)"
    return f"(((2*10000*{n_i} + {d_i}) // (2*{d_i})) / 100.0)"


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table selective scan + global agg (A9).

    ``SUM(extendedprice · discount)`` over a year/discount/quantity
    slice. All three predicates push down to the parquet scan; the sum
    runs in integer units of 10⁻⁴ dollars (price and discount are both
    2-dp) with one decimal division at the end.
    """
    l = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    f = l.filter(
        (F.to_date(l.l_shipdate) >= F.lit("1996-01-01").cast("date"))
        & (F.to_date(l.l_shipdate) < F.lit("1997-01-01").cast("date"))
        & (money(l.l_discount).between(F.lit("0.03"), F.lit("0.07")))
        & (l.l_quantity < 24)
    )
    price_c = cents(f.l_extendedprice)
    disc_c = cents(f.l_discount)
    raw = F.sum(price_c * disc_c)  # 10^-4 dollars
    rev = (raw.cast("decimal(38,0)") / F.lit(10**4)).cast("decimal(38,4)")
    return f.agg(F.round(rev, 2).cast("double").alias("revenue"))


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    ship year. Both nation dims broadcast; the disjunctive pair filter
    applies after the two small joins, before the group-by."""
    t = load_tables(
        spark, sf_dir, names=("customer", "orders", "lineitem", "supplier", "nation")
    )
    c, o, l, s = t["customer"], t["orders"], t["lineitem"], t["supplier"]
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .filter(
            (F.to_date(l.l_shipdate) >= F.lit("1996-01-01").cast("date"))
            & (F.to_date(l.l_shipdate) < F.lit("1998-01-01").cast("date"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year(F.to_date(l.l_shipdate)).alias("l_year")
        )
        .agg(F.round(sum_revenue(l), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of ASIA's PROMO-part revenue per
    order year. The share is a ratio of two money sums — computed with
    :func:`_pct_ratio` exact integer math, identical in the oracle.
    (Adapted: testdata has no partsupp, so the supplier nation comes from
    ``l_suppkey`` directly, and p_type is a single word.)"""
    t = load_tables(
        spark,
        sf_dir,
        names=("customer", "orders", "lineitem", "supplier", "part", "nation", "region"),
    )
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    s, p, n, r = t["supplier"], t["part"], t["nation"], t["region"]
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        l.join(F.broadcast(p.filter(p.p_type == "PROMO")), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(r.r_name == "ASIA")), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nkey"))
        .filter(
            (F.to_date(o.o_orderdate) >= F.lit("1996-01-01").cast("date"))
            & (F.to_date(o.o_orderdate) < F.lit("1998-01-01").cast("date"))
        )
    )
    rev = sum_revenue(l)
    nation_rev = F.sum(
        F.when(
            F.col("supp_nation") == "NATION_5",
            cents(l.l_extendedprice) * (F.lit(100) - cents(l.l_discount)),
        ).otherwise(F.lit(0))
    )
    nation_rev_dec = (nation_rev.cast("decimal(38,0)") / F.lit(10**4)).cast(
        "decimal(38,4)"
    )
    return (
        joined.groupBy(F.year(F.to_date(o.o_orderdate)).alias("o_year"))
        .agg(_pct_ratio(nation_rev_dec, rev).alias("mkt_share_pct"))
        .orderBy("o_year")
    )


def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a filtered LEFT join —
    orders-per-customer, then customers-per-order-count. The left join
    keeps order-less customers (c_count = 0 via NULL-skipping COUNT(col),
    the A3 distinction). (Adapted: no o_comment column; the classic
    'special requests' exclusion becomes a date cutoff.)"""
    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    c, o = t["customer"], t["orders"]
    recent = o.filter(F.to_date(o.o_orderdate) >= F.lit("2000-01-01").cast("date"))
    per_cust = (
        c.join(recent, c.c_custkey == recent.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(recent.o_orderkey).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percent for one ship month — a
    conditional sum over a broadcast part join, divided exactly."""
    t = load_tables(spark, sf_dir, names=("lineitem", "part"))
    l, p = t["lineitem"], t["part"]
    f = l.filter(
        (F.to_date(l.l_shipdate) >= F.lit("1996-03-01").cast("date"))
        & (F.to_date(l.l_shipdate) < F.lit("1996-04-01").cast("date"))
    ).join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cents4 = cents(l.l_extendedprice) * (F.lit(100) - cents(l.l_discount))
    promo = F.sum(F.when(p.p_type == "PROMO", cents4).otherwise(F.lit(0)))
    total = F.sum(cents4)
    to_dec = lambda x: (x.cast("decimal(38,0)") / F.lit(10**4)).cast("decimal(38,4)")  # noqa: E731
    return f.agg(_pct_ratio(to_dec(promo), to_dec(total)).alias("promo_revenue_pct"))


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue.
    The max is a 1-row broadcast joined back on exact decimal equality
    (the classic view + scalar-subquery form, decorrelated)."""
    t = load_tables(spark, sf_dir, names=("lineitem", "supplier"))
    l, s = t["lineitem"], t["supplier"]
    rev = (
        l.filter(
            (F.to_date(l.l_shipdate) >= F.lit("1996-01-01").cast("date"))
            & (F.to_date(l.l_shipdate) < F.lit("1996-04-01").cast("date"))
        )
        .groupBy(l.l_suppkey.alias("supplier_no"))
        .agg(sum_revenue(l).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.max_rev)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            s.s_suppkey,
            s.s_name,
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's mean quantity) went unfilled.

    The correlated AVG subquery decorrelates into one per-part partial
    aggregate (sum_qty, cnt) joined back; the 20%-of-average predicate
    is the cross-multiplied integer form ``qty·5·cnt < sum_qty`` — no
    division, exact in both engines. (Adapted: p_brand filter instead of
    the classic brand+container pair; testdata has no p_container.)"""
    t = load_tables(spark, sf_dir, names=("lineitem", "part"))
    l, p = t["lineitem"], t["part"]
    brand = p.filter(p.p_brand == "Brand#1")
    qty_c = cents("l_quantity")
    per_part = l.groupBy(l.l_partkey.alias("agg_partkey")).agg(
        F.sum(qty_c).alias("sum_qty_c"), F.count(F.lit(1)).alias("cnt")
    )
    joined = (
        l.join(F.broadcast(brand), l.l_partkey == p.p_partkey)
        .join(per_part, l.l_partkey == F.col("agg_partkey"))
        .filter(qty_c * F.lit(5) * F.col("cnt") < F.col("sum_qty_c"))
    )
    total = F.sum(money(l.l_extendedprice)).alias("_t")
    return joined.agg(
        round2_div(F.coalesce(total, F.lit(0).cast("decimal(18,2)")), F.lit(7), scale=2)
        .alias("avg_yearly")
    )


def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed 300 units —
    a HAVING-filtered per-order aggregate joined to orders/customer,
    top-100 under a total order.

    The classic form re-joins the fact and re-aggregates per
    (customer, order) — but o_orderkey is IN the output group, so each
    group is exactly one order and the re-aggregate reproduces the
    HAVING aggregate's own sum (decimal-exact, same rows). Computing it
    once removes the second lineitem scan, the fact-sized semi-join
    probe and the re-aggregation exchange (guide §2.2 — r15; 1.63 →
    0.83 s min-of-4 interleaved, rows ORDER-identical at all SFs)."""
    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    qty_c = cents("l_quantity")
    big = (
        l.groupBy(l.l_orderkey.alias("big_okey"))
        .agg(F.sum(qty_c).alias("okey_qty_c"))
        .filter(F.col("okey_qty_c") > 300 * 100)
    )
    sum_qty = (F.col("okey_qty_c").cast("decimal(38,0)") / F.lit(100)).cast(
        "decimal(38,2)"
    )
    return (
        big.join(o, F.col("big_okey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
            F.col("o_totalprice").alias("totalprice"),
            F.round(sum_qty, 2).cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc(money(F.col("totalprice"))), F.asc("o_orderkey"))
        .limit(100)
    )


def tpch_q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers gone dormant, per nation.

    Above-average-balance test in cross-multiplied exact form
    (``bal·cnt > sum`` over the positive-balance population, no
    division); dormancy as a LEFT ANTI join against recent orders.
    (Adapted: no c_phone country codes in testdata — grouped by nation,
    dormant = no order since 2000-01-01 instead of no order ever, since
    every testdata customer has orders.)"""
    t = load_tables(spark, sf_dir, names=("customer", "orders", "nation"))
    c, o, n = t["customer"], t["orders"], t["nation"]
    pos = c.filter(money(c.c_acctbal) > 0)
    stats = pos.agg(
        F.sum(money(c.c_acctbal)).alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    recent = o.filter(
        F.to_date(o.o_orderdate) >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        pos.crossJoin(F.broadcast(stats))
        .filter(money(c.c_acctbal) * F.col("cnt") > F.col("s"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(money(c.c_acctbal)), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q13_order_count_distribution": tpch_q13_order_count_distribution,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_quantity_revenue": tpch_q17_small_quantity_revenue,
    "tpch_q18_large_volume_customers": tpch_q18_large_volume_customers,
    "tpch_q22_dormant_high_balance": tpch_q22_dormant_high_balance,
}

_Q8_NATION_REV = (
    "sum(CASE WHEN sn.n_name = 'NATION_5' THEN "
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END)"
)
_Q8_TOTAL_REV = (
    "sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
)
_DEC4 = "CAST(CAST({x} AS DECIMAL(38,0)) / 10000 AS DECIMAL(38,4))"

ORACLES: dict[str, str] = {
    "tpch_q6_forecast_revenue": """
        SELECT CAST(round(CAST(sum(
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_discount * 100) AS BIGINT))
               AS DECIMAL(38,0)) / 10000, 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          AND CAST(l_discount AS DECIMAL(18,2))
              BETWEEN CAST('0.03' AS DECIMAL(18,2)) AND CAST('0.07' AS DECIMAL(18,2))
          AND l_quantity < 24""",
    "tpch_q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(CAST(l.l_shipdate AS DATE)) AS l_year,
               CAST(round(sum({_REV_SQL}),2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""",
    "tpch_q8_market_share": f"""
        SELECT year(CAST(o.o_orderdate AS DATE)) AS o_year,
               {_pct_ratio_sql(_DEC4.format(x=_Q8_NATION_REV), _DEC4.format(x=_Q8_TOTAL_REV))}
                   AS mkt_share_pct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
        GROUP BY o_year ORDER BY o_year""",
    "tpch_q13_order_count_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN (SELECT * FROM orders
                       WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01') o
                   ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "tpch_q14_promo_revenue": f"""
        SELECT {_pct_ratio_sql(
            _DEC4.format(
                x="sum(CASE WHEN p.p_type = 'PROMO' THEN "
                  "CAST(round(l_extendedprice * 100) AS BIGINT)"
                  " * (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END)"
            ),
            _DEC4.format(x=_Q8_TOTAL_REV),
        )} AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
          AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'""",
    "tpch_q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total_rev
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
              AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name,
               CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier s ON rev.supplier_no = s.s_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s.s_suppkey""",
    "tpch_q17_small_quantity_revenue": f"""
        SELECT {round2_div_sql(
            "coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))),"
            " CAST(0 AS DECIMAL(18,2)))", "7", scale=2)} AS avg_yearly
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
        JOIN (SELECT l_partkey AS agg_partkey,
                     sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
                     count(*) AS cnt
              FROM lineitem GROUP BY l_partkey) a
          ON l.l_partkey = a.agg_partkey
        WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * a.cnt < a.sum_qty_c""",
    "tpch_q18_large_volume_customers": """
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice AS totalprice,
               CAST(round(CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT))
                    AS DECIMAL(38,0)) / 100, 2) AS DOUBLE) AS sum_qty
        FROM lineitem l
        JOIN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000) big
          ON l.l_orderkey = big.l_orderkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY CAST(o.o_totalprice AS DECIMAL(18,2)) DESC, o.o_orderkey ASC
        LIMIT 100""",
    "tpch_q22_dormant_high_balance": """
        SELECT n.n_name AS nation, count(*) AS numcust,
               CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))),2) AS DOUBLE)
                   AS totacctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) > 0
          AND CAST(c.c_acctbal AS DECIMAL(18,2))
              * (SELECT count(*) FROM customer
                 WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
              > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
                 WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
        GROUP BY n.n_name ORDER BY nation""",
}
