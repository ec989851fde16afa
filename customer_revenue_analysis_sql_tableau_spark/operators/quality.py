"""Data-quality constraint validation as a queryable operator.

The reference declares PK/FK/UNIQUE/NOT NULL constraints in DDL
(``sql/sakila-schema.sql`` — PKs at :44-345, ``idx_fk_*`` FKs, UNIQUE
at :299) and relies on InnoDB to enforce them. Spark enforces nothing
(SURVEY §1.4): the engine's stand-in is this ingest-time validation
pass — one row per declared constraint with its violation count, the
report a pipeline gates a load on. ``tests/test_data_quality.py`` runs
the same checks against the parsed Sakila dump; this module makes the
check itself part of the query surface over the driver testdata.

Shape: each constraint is a tiny aggregate (count of NULL keys,
count-minus-distinct for uniqueness, anti-join count for FK orphans)
unioned into one frame. All counts are exact longs. Scale posture:
uniqueness checks are two-level-aggregable counts, FK checks are
broadcast or shuffle anti-joins on the key — every check is one
bounded pass, no row-level materialization of violations (a violations
SAMPLE would be the debugging companion, capped with limit()).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def _row(table: str, constraint: str, n: F.Column) -> F.Column:
    return F.struct(
        F.lit(table).alias("table_name"),
        F.lit(constraint).alias("constraint_name"),
        n.cast("long").alias("n_violations"),
    )


def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, constraint_name, n_violations) for every declared
    constraint of the testdata star; all zeros on healthy data, and a
    load gate fails on any positive row."""
    t = load_tables(
        spark,
        sf_dir,
        names=("customer", "orders", "lineitem", "events", "documents"),
    )
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    e, d = t["events"], t["documents"]

    checks = [
        # PK/UNIQUE: duplicates = rows minus distinct keys
        o.agg(
            _row(
                "orders",
                "pk_unique_o_orderkey",
                F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
            ).alias("r")
        ),
        l.agg(
            _row(
                "lineitem",
                "pk_unique_orderkey_linenumber",
                F.count(F.lit(1))
                - F.countDistinct("l_orderkey", "l_linenumber"),
            ).alias("r")
        ),
        # NOT NULL key columns
        o.agg(
            _row(
                "orders",
                "not_null_o_custkey",
                F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
            ).alias("r")
        ),
        e.agg(
            _row(
                "events",
                "not_null_ts",
                F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)),
            ).alias("r")
        ),
        # FK orphans: anti-join counts
        o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
            _row("orders", "fk_o_custkey_customer", F.count(F.lit(1))).alias(
                "r"
            )
        ),
        l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").agg(
            _row("lineitem", "fk_l_orderkey_orders", F.count(F.lit(1))).alias(
                "r"
            )
        ),
        # CHECK-style: declared n_chars must equal the text's length
        d.agg(
            _row(
                "documents",
                "check_n_chars_eq_length",
                F.sum(
                    F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0)
                ),
            ).alias("r")
        ),
    ]
    return reduce(DataFrame.unionByName, checks).select("r.*")


#: (column, null-check expr, distinct col, min/max formatter) for the
#: events profile. Formatting is C-printf/strftime on BOTH engines so
#: the stringified min/max hash-match (a bare CAST(double AS STRING)
#: differs between engines' float reprs).
_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def _cents_str(c: F.Column) -> F.Column:
    """Two-decimal money string via exact integer math. ``%.2f`` would
    be formatter-rounding-mode dependent (java.util.Formatter HALF_UP
    vs DuckDB printf round-half-even flips the string for doubles whose
    exact binary value ties at the third decimal); quantizing to BIGINT
    cents first (the zscore/money idiom — both engines round ties away
    from zero) makes the string a pure function of the cents."""
    cents = F.round(c * 100, 0).cast("bigint")
    a = F.abs(cents)
    return F.concat(
        F.when(cents < 0, F.lit("-")).otherwise(F.lit("")),
        F.floor(a / 100).cast("bigint").cast("string"),
        F.lit("."),
        F.lpad((a % 100).cast("string"), 2, "0"),
    )


def _cents_str_sql(agg: str) -> str:
    """DuckDB twin of :func:`_cents_str` over an aggregate expression."""
    cents = f"CAST(round({agg} * 100) AS BIGINT)"
    return (
        f"CASE WHEN {cents} < 0 THEN '-' ELSE '' END"
        f" || CAST(abs({cents}) // 100 AS VARCHAR)"
        f" || '.' || lpad(CAST(abs({cents}) % 100 AS VARCHAR), 2, '0')"
    )


def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column profile of the ``events`` fact: one row per
    column with exact row/null/distinct counts and formatted min/max.
    The pre-training profiling report every pipeline runs on a new
    delivery; all metrics fold in one pass over the table (6 columns x
    4 aggregates in a single agg, exploded to rows JVM-side)."""
    e = load_tables(spark, sf_dir, names=("events",))["events"]

    def fmt(col: str) -> tuple[F.Column, F.Column]:
        if col == "ts":
            f = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        elif col == "value":
            f = _cents_str
        elif col in ("event_id", "user_id"):
            f = lambda c: F.format_string("%d", c)
        else:
            f = lambda c: c
        return f(F.min(col)), f(F.max(col))

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        mn, mx = fmt(c)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    one = e.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("column_name")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_constraint_violations": dq_constraint_violations,
    "dq_column_profile": dq_column_profile,
}

ORACLES: dict[str, str] = {
    "dq_column_profile": f"""
        SELECT 'event_id' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
               printf('%d', min(event_id)) AS min_value, printf('%d', max(event_id)) AS max_value
        FROM events
        UNION ALL
        SELECT 'ts' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT ts) AS BIGINT) AS n_distinct,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_value, strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_value
        FROM events
        UNION ALL
        SELECT 'user_id' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
               printf('%d', min(user_id)) AS min_value, printf('%d', max(user_id)) AS max_value
        FROM events
        UNION ALL
        SELECT 'event_type' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct,
               min(event_type) AS min_value, max(event_type) AS max_value
        FROM events
        UNION ALL
        SELECT 'value' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
               {_cents_str_sql("min(value)")} AS min_value,
               {_cents_str_sql("max(value)")} AS max_value
        FROM events
        UNION ALL
        SELECT 'props' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT props) AS BIGINT) AS n_distinct,
               min(props) AS min_value, max(props) AS max_value
        FROM events
        ORDER BY column_name""",
    "dq_constraint_violations": """
        SELECT 'orders' AS table_name,
               'pk_unique_o_orderkey' AS constraint_name,
               count(*) - count(DISTINCT o_orderkey) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'lineitem', 'pk_unique_orderkey_linenumber',
               count(*) - (SELECT count(*) FROM
                   (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
        FROM lineitem
        UNION ALL
        SELECT 'orders', 'not_null_o_custkey',
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'events', 'not_null_ts',
               CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'orders', 'fk_o_custkey_customer', count(*)
        FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem', 'fk_l_orderkey_orders', count(*)
        FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'documents', 'check_n_chars_eq_length',
               CAST(sum(CASE WHEN length(text) != n_chars THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents""",
}
