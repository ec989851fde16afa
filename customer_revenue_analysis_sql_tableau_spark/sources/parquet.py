"""Parquet fact layout for scale (SURVEY.md §7.4.7 posture).

The reference's physical design is InnoDB B-trees + secondary indexes;
the Spark-native equivalent at 100 TB is month-partitioned columnar
facts: partition pruning replaces index range scans, parquet min/max +
dictionary stats replace point-lookup indexes. This module is that
layout policy, plus the golden-output materialization step (S8 — the
reference commits `data/dw.csv` + `data/qN.csv`; our pipeline writes
the same artifacts from the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .csv import write_csv_single

#: Partition column derived from the fact's event date.
MONTH_COL = "part_month"


def write_month_partitioned(
    df: DataFrame, date_col: str, path: str, max_records_per_file: int = 5_000_000
) -> None:
    """Write a fact table partitioned by calendar month of ``date_col``.

    Partition count stays bounded (months, not days) so the file
    listing never explodes; ``maxRecordsPerFile`` bounds file size
    inside hot months instead of letting one month become one giant
    file. Readers filtering on ``part_month`` (or on ``date_col``
    ranges the caller also expresses on ``part_month``) scan only the
    matching directories — asserted in the plan test.
    """
    (
        df.withColumn(MONTH_COL, F.date_format(F.col(date_col), "yyyy-MM"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(MONTH_COL)
        .parquet(path)
    )


def read_months(spark: SparkSession, path: str, months: list[str]) -> DataFrame:
    """Read only the requested month partitions (pruned scan)."""
    df = spark.read.parquet(path)
    return df.filter(F.col(MONTH_COL).isin(months))


def save_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8
) -> None:
    """Bucketed layout for co-located fact-fact joins (§4 posture).

    Both sides of a recurring join written with the same bucket count
    on their join keys let Spark plan a SortMergeJoin with NO exchange
    and NO per-query sort (buckets are pre-sorted) — the shuffle is
    paid once at write time instead of per query. At 100 TB this is
    the difference between re-shuffling the fact table on every run
    and never shuffling it; asserted shuffle-free in the plan test.

    The write repartitions by the bucket key into exactly ``buckets``
    partitions first: ``repartition(n, key)`` and Spark-native
    bucketing share the same placement function (pmod of the Murmur3
    hash), so every bucket's rows land in ONE task and each bucket is
    exactly ONE file — the invariant that makes
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
    (session.py, r15) sound: Spark honors the recorded bucket sort
    order only for single-file buckets, and a multi-file bucket served
    as "sorted" would silently corrupt merge joins. Structural since
    r16 (was an accident of single-split local inputs); pinned by
    tests/test_sources.py::test_bucketed_layout_one_file_per_bucket.
    """
    (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def materialize_golden_outputs(view: DataFrame, query_results: dict[str, DataFrame], out_dir: str) -> None:
    """S8: the reference's committed artifacts — the view and each
    query as single-file CSVs (`data/dw.csv`, `data/qN.csv`)."""
    write_csv_single(view, f"{out_dir}/dw")
    for name, df in query_results.items():
        write_csv_single(df, f"{out_dir}/{name}")
