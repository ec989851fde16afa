"""Sharded XML source + sink (Spark 4 native ``xml`` format).

The fourth interchange format next to CSV/JSONL/ORC: XML remains the
wire format of large public corpora (Wikipedia dumps, PubMed, patents
— the classic LLM pre-training sources), so an ingest engine needs a
schema-pinned, shard-parallel XML path. Spark 4 ships the former
spark-xml package natively (`format("xml")`), so no external jar.

Dialect pins (the hazards a naive roundtrip corrupts):

- ``ignoreSurroundingSpaces=false`` on read — the default TRIMS
  element text, silently corrupting whitespace-significant content
  (probed: leading/trailing pads survive only with the option off).
- Entity escaping (``& < > " '``) is the writer's job and round-trips
  byte-exact, embedded newlines and tabs included (hostile-string
  pytest).
- Writers shard (``repartition``, never coalesce-to-one); readers
  take an explicit schema — inference over TBs is an extra full pass.

Reference parity note: the reference has no XML surface; this belongs
to the driver's source/sink mandate (SURVEY §2.1 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Element names for the row/root tags — one <row> per record, the
#: layout every dump-style corpus uses.
ROW_TAG = "row"

#: Read options that make the roundtrip lossless; see module docstring.
XML_READ_OPTS = {
    "rowTag": ROW_TAG,
    "ignoreSurroundingSpaces": "false",
}


def write_xml(df: DataFrame, path: str, shards: int = 4) -> None:
    """Sharded XML write: one file per shard, one ``<row>`` element per
    record, entities escaped by the writer."""
    df.repartition(shards).write.mode("overwrite").format("xml").option(
        "rowTag", ROW_TAG
    ).save(path)


def read_xml(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-pinned, whitespace-preserving XML read (shard-parallel:
    one task per file; splittable within files for uncompressed XML)."""
    return (
        spark.read.format("xml").options(**XML_READ_OPTS).schema(schema).load(path)
    )
