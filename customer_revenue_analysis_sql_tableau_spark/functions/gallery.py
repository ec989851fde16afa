"""Scalar-function gallery (§2.8): every scalar function the reference
calls, exercised in one oracle-checked projection.

Reference call sites: CONCAT (`queries_shan.sql:10`), UCASE/LCASE/SUBSTR/
LENGTH (`sql/sakila-schema.sql:379-381`), DATEDIFF (`queries_shan.sql:25`),
DATE_SUB INTERVAL (`:86`), DATE_FORMAT (`:110`), DATE()/STR_TO_DATE/
LAST_DAY/YEAR/MONTH (`sql/sakila-schema.sql:505-522`), ROUND
(`queries_shan.sql:12`), COALESCE (`:24`), IFNULL/IF
(`sql/sakila-schema.sql:562,569`), CASE ladder (`queries_shan.sql:70-74`),
decimal literal arithmetic (`:26`).

Date-valued derivations are rendered to strings in BOTH dialects so the
comparison never trips on date-vs-timestamp frame dtypes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]
    d = F.to_date("o_orderdate")
    price2 = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey",
        # CONCAT / CONCAT_WS
        F.concat_ws("-", F.lit("ord"), F.col("o_orderkey").cast("string")).alias("tag"),
        # UCASE / LCASE / SUBSTR / LENGTH
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio_up"),
        F.lower("o_orderstatus").alias("status_lo"),
        F.length("o_orderpriority").alias("prio_len"),
        # DATEDIFF (end, start): days since epoch-ish fixed anchor
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        # DATE_SUB(d, INTERVAL 6 MONTH) — rendered as string
        F.date_format(F.add_months(d, -6), "yyyy-MM-dd").alias("six_months_ago"),
        # DATE_FORMAT '%Y-%m'
        F.date_format(d, "yyyy-MM").alias("month_key"),
        # DATE()/STR_TO_DATE round-trip
        F.date_format(F.to_date(F.date_format(d, "yyyy-MM-dd")), "yyyy-MM-dd").alias(
            "date_roundtrip"
        ),
        # LAST_DAY / YEAR / MONTH
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        # ROUND on decimal + decimal literal arithmetic (* 0.50)
        F.round(price2 * F.lit("0.50").cast("decimal(3,2)"), 2)
        .cast("double")
        .alias("half_price"),
        # COALESCE / IFNULL over a genuinely nullable expression
        F.coalesce(
            F.when(F.col("o_orderstatus") == "F", price2), F.lit(0).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("finished_price"),
        # IF(cond, a, b)
        F.when(F.col("o_totalprice") > 100000, F.lit("big"))
        .otherwise(F.lit("small"))
        .alias("size_tag"),
        # CASE/BETWEEN ladder (the q4 segmentation shape)
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice").between(100000, 199999.999999), "mid")
        .otherwise("low")
        .alias("band"),
    )


QUERIES = {"scalar_function_gallery": scalar_function_gallery}

ORACLES = {
    "scalar_function_gallery": """
        SELECT o_orderkey,
               concat_ws('-', 'ord', CAST(o_orderkey AS VARCHAR)) AS tag,
               upper(substr(o_orderpriority, 1, 3)) AS prio_up,
               lower(o_orderstatus) AS status_lo,
               length(o_orderpriority) AS prio_len,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS days_since,
               strftime(CAST(CAST(o_orderdate AS DATE) - INTERVAL 6 MONTH AS DATE),
                        '%Y-%m-%d') AS six_months_ago,
               strftime(o_orderdate, '%Y-%m') AS month_key,
               strftime(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE),
                        '%Y-%m-%d') AS date_roundtrip,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
                   AS month_end,
               year(CAST(o_orderdate AS DATE)) AS yr,
               month(CAST(o_orderdate AS DATE)) AS mo,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                          * CAST(0.50 AS DECIMAL(3,2)), 2) AS DOUBLE)
                   AS half_price,
               CAST(coalesce(
                   CASE WHEN o_orderstatus = 'F'
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) END,
                   CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS finished_price,
               CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END
                   AS size_tag,
               CASE WHEN o_totalprice >= 200000 THEN 'high'
                    WHEN o_totalprice BETWEEN 100000 AND 199999.999999 THEN 'mid'
                    ELSE 'low' END AS band
        FROM orders""",
}
