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

#: Standard-CSV dialect shared by every writer AND reader in the
#: engine. Spark's defaults are asymmetric and non-standard: the writer
#: backslash-escapes quotes (pandas/RFC 4180 double them) and TRIMS
#: leading/trailing whitespace on write — both silently corrupt a
#: roundtrip of hostile text (tests/test_sources.py proves the dialect
#: below survives embedded newlines/quotes/commas/padding byte-exact).
CSV_WRITE_OPTS: dict[str, str] = {
    "header": "true",
    "escape": '"',  # RFC 4180 doubled quotes, what pandas writes/reads
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}
#: SPLITTABILITY TRADEOFF: ``multiLine=true`` is required for quoted
#: embedded newlines to stay one record, but it makes every CSV file
#: unsplittable — one task per file, so a single huge CSV serializes
#: onto one core. Dialect-correct default for arbitrary app-layer
#: inputs; for known newline-free inputs at scale pass
#: ``read_csv(..., multiline=False)`` (splittable line reader), or
#: better, shard the export (``write_csv(shards=N)``) so per-file
#: parallelism is enough either way.
CSV_READ_OPTS: dict[str, str] = {
    "header": "true",
    "escape": '"',
    "multiLine": "true",  # quoted embedded newlines stay one record
}


def read_csv(
    spark: SparkSession,
    path: str,
    infer: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """App-layer CSV source (pandas ``read_csv`` twin).

    ``multiline=False`` is the splittable fast path for inputs known to
    carry no quoted newlines (see ``CSV_READ_OPTS`` tradeoff note).
    """
    opts = dict(CSV_READ_OPTS)
    if not multiline:
        opts["multiLine"] = "false"
    return spark.read.options(**opts).csv(path, inferSchema=infer)


def write_csv_single(df: DataFrame, path: str) -> None:
    """Golden-style CSV export: one file, with header.

    ``coalesce(1)`` is correct here because exports are final small
    results (≤ thousands of rows); never use it on fact-scale data.
    """
    df.coalesce(1).write.mode("overwrite").options(**CSV_WRITE_OPTS).csv(path)


def write_csv(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Sharded CSV sink (the fan-out form a large export uses)."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").options(**CSV_WRITE_OPTS).csv(path)
