"""ORC source/sink — the second columnar interchange format Spark
ships a native vectorized reader for.

Parquet is this engine's primary storage (``catalog.py``); ORC matters
when the warehouse downstream is Hive/Trino-flavored, where ORC's
stripe statistics play the role parquet row-group stats do. Same
posture as the other sinks: never coalesce to one file, predicate
pushdown and partition pruning reach the scan (Spark's native ORC
reader honors both — asserted by the roundtrip test's pushed-filter
check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    shards: int | None = None,
) -> None:
    """Write ``df`` as sharded ORC, optionally hive-partitioned."""
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (self-describing schema — no inference pass needed)."""
    return spark.read.orc(path)
