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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_constraint_violations": dq_constraint_violations,
}

ORACLES: dict[str, str] = {
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
