"""Embedding-column profiling operators (similarity-search support,
SURVEY §7.5): per-vector norm/quantization stats and per-label corpus
profile.

These are the passes an embedding pipeline runs before building an ANN
index: L2 norms (normalization check), max-abs (int8 quantization
scale), and per-label distribution summaries (IVF cell sizing). All
JVM-side higher-order functions over the ``array<float>`` column —
per-row work only, plus one bounded groupBy(label); nothing pairwise.

Float policy (proven by ``sim_bruteforce_topk``): cast the vector to
``array<double>`` FIRST, then left-to-right double accumulation matches
DuckDB's ``list_dot_product`` bit-for-bit. Cross-row averages use the
integer-cents pattern (round each norm to micro-units, sum longs, one
division per group) so the result is order-independent — a double sum
over shuffled rows would be nondeterministic at any scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables

#: int8 quantization target range.
QUANT_MAX = 127.0


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    return e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def _dot_self() -> F.Column:
    return F.aggregate(
        F.zip_with(F.col("v"), F.col("v"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, dim, l2_norm, max_abs, quant_scale): per-vector
    profile; quant_scale is the multiplier that maps the vector onto
    int8 range."""
    d = _vecs(spark, sf_dir)
    return d.select(
        "vec_id",
        "label",
        F.size("v").cast("long").alias("dim"),
        F.sqrt(_dot_self()).alias("l2_norm"),
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("max_abs"),
        (
            F.lit(QUANT_MAX)
            / F.array_max(F.transform("v", lambda x: F.abs(x)))
        ).alias("quant_scale"),
    )


def emb_label_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_vecs, min_norm, max_norm, avg_norm_micros): per-label
    corpus profile. min/max are order-independent on doubles; the mean
    goes through micro-unit longs (floor of Σmicros/n — exact integer
    division, emitted identically in both dialects) so shuffle order
    can never move a bit."""
    d = _vecs(spark, sf_dir).select(
        "label", F.sqrt(_dot_self()).alias("l2_norm")
    )
    micros = F.round(F.col("l2_norm") * 1_000_000).cast("long")
    total, n = F.sum(micros), F.count(F.lit(1))
    return d.groupBy("label").agg(
        n.alias("n_vecs"),
        F.min("l2_norm").alias("min_norm"),
        F.max("l2_norm").alias("max_norm"),
        ((total - F.pmod(total, n)) / n).cast("long").alias("avg_norm_micros"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "emb_norm_stats": emb_norm_stats,
    "emb_label_profile": emb_label_profile,
}

_NORM_SQL = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"

ORACLES: dict[str, str] = {
    "emb_norm_stats": f"""
        SELECT vec_id, label,
               CAST(len(embedding) AS BIGINT) AS dim,
               {_NORM_SQL} AS l2_norm,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
                   AS max_abs,
               {QUANT_MAX} / list_max(list_transform(embedding::DOUBLE[],
                   x -> abs(x))) AS quant_scale
        FROM embeddings""",
    "emb_label_profile": f"""
        WITH n AS (SELECT label, {_NORM_SQL} AS l2_norm FROM embeddings)
        SELECT label, count(*) AS n_vecs,
               min(l2_norm) AS min_norm, max(l2_norm) AS max_norm,
               CAST(sum(CAST(round(l2_norm * 1000000) AS BIGINT)) // count(*)
                    AS BIGINT) AS avg_norm_micros
        FROM n GROUP BY label""",
}
