"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM training pipelines consume.

The reference's only export surface is a single-file CSV download
(``data-mgmt-streamlit.py:118-125``, re-expressed in ``sources/csv.py``);
this module is its training-data counterpart: sharded JSONL with
split-directory partitioning, so a downstream loader can read
``split=train/`` with partition pruning and shard-parallel readers.

Scale posture: the writer never coalesces to one file (a 100 TB export
must fan out); shard count is either caller-pinned (reproducible file
layout) or left to the upstream partitioning. Reads carry an explicit
schema — schema inference over TBs of JSON is a full extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.pipeline import training_data_pipeline
from ..operators.splits import split_train_test


#: Microsecond-precision timestamp format for JSONL. Spark's JSON
#: default carries milliseconds only, so an events roundtrip through
#: default options silently truncates ``ts`` — writer and reader must
#: BOTH pin this format (tests/test_sources.py proves the fidelity).
JSONL_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    shards: int | None = None,
) -> None:
    """Write ``df`` as sharded JSONL (one JSON object per line, one file
    per shard), optionally hive-partitioned by ``partition_by``."""
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite").option("timestampFormat", JSONL_TS_FORMAT)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str | list[str], schema: str | None = None
) -> DataFrame:
    """Read JSONL; pass an explicit DDL ``schema`` in production — at
    scale, inference costs a full pass over the data."""
    reader = spark.read.option("timestampFormat", JSONL_TS_FORMAT)
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def export_training_jsonl(
    spark: SparkSession, sf_dir: str, out_dir: str, shards: int = 4
) -> DataFrame:
    """End-to-end training-data export: documents that survive the
    cleaning pipeline, tagged with their train/valid/test split, written
    as split-partitioned sharded JSONL. Returns the read-back frame so
    callers (and tests) can verify the roundtrip."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    kept = training_data_pipeline(spark, sf_dir).filter(F.col("kept")).select("doc_id")
    split = split_train_test(spark, sf_dir).select("doc_id", "split")
    out = (
        docs.join(kept, "doc_id")
        .join(split, "doc_id")
        .select("doc_id", "text", "lang", "source", "split")
    )
    write_jsonl(out, out_dir, partition_by="split", shards=shards)
    return read_jsonl(
        spark,
        out_dir,
        schema="doc_id bigint, text string, lang string, source string, split string",
    )
