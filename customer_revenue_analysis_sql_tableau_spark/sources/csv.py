"""CSV source/sink (SURVEY.md §2.1 S5/S6/S8).

The reference's app layer reads query exports with pandas
(``data-mgmt-streamlit.py:52-54``) and offers CSV downloads
(``:236-242``); its golden outputs are CSV materializations. Spark
twins: schema-inferring reader for the app layer (never the warehouse —
warehouse tables are parquet with declared schemas), single-file writer
for golden-style exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, infer: bool = True) -> DataFrame:
    """App-layer CSV source (pandas ``read_csv`` twin)."""
    return spark.read.csv(path, header=True, inferSchema=infer)


def write_csv_single(df: DataFrame, path: str) -> None:
    """Golden-style CSV export: one file, with header.

    ``coalesce(1)`` is correct here because exports are final small
    results (≤ thousands of rows); never use it on fact-scale data.
    """
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
