"""Salted-join equivalence + AQE skew posture (§7.4.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.operators.skew import salted_join, skew_confs


def _skewed_pair(spark):
    # one hot key (90% of rows) + a uniform tail — the q9 India shape
    skewed = spark.range(5000).select(
        F.when(F.col("id") < 4500, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )
    return skewed, dim


def test_salted_inner_join_equals_plain(spark):
    skewed, dim = _skewed_pair(spark)
    plain = skewed.join(dim, skewed.k == dim.k).select("payload", "name")
    salted = salted_join(skewed, dim, skewed.k == dim.k).select("payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    skewed, dim = _skewed_pair(spark)
    dim_partial = dim.filter(F.col("k") < 10)  # some keys unmatched
    plain = skewed.join(dim_partial, skewed.k == dim_partial.k, "left").select(
        "payload", "name"
    )
    salted = salted_join(skewed, dim_partial, skewed.k == dim_partial.k, "left").select(
        "payload", "name"
    )
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salt_actually_spreads_hot_key(spark):
    """The hot key's rows must land in multiple (key, salt) groups."""
    skewed, dim = _skewed_pair(spark)
    salted = skewed.withColumn(
        "_salt",
        F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(8)),
    )
    groups = (
        salted.filter(F.col("k") == 7)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(groups) > 4  # hot key spread over most salt buckets


def test_aqe_skew_join_enabled(spark):
    confs = skew_confs(spark)
    assert confs["spark.sql.adaptive.enabled"] == "true"
    assert confs["spark.sql.adaptive.skewJoin.enabled"] == "true"
