"""Format-roundtrip registry entries: CSV, JSONL, and ORC under the
driver value-hash.

The reference's only interchange surface is the CSV export/read pair of
its app layer (``data-mgmt-streamlit.py:52-54,236-242``); this engine
additionally ships JSONL (the LLM-training interchange format) and ORC
(``sources/jsonl.py``, ``sources/orc.py``), proven so far by pytest
roundtrips. These entries make each format's encode→decode fidelity a
HASH row: stage a testdata table through the real writer+reader in a
temp directory and return a digest projection whose oracle is computed
straight from the raw table — any quoting, escaping, type-coercion, or
precision defect breaks the hash.

Format-specific hazards each entry pins:

- **CSV** — dialect symmetry: the entry uses the engine-wide
  standard-CSV options (``sources/csv.py``) — Spark's asymmetric
  defaults (backslash-escape on write, whitespace trim) corrupt a
  roundtrip of hostile text; the hostile-string pytest proves the
  shared dialect survives embedded newlines/quotes/commas/padding
  (driver testdata is benign).
- **JSONL** — JSON string escaping; longs stay longs (no double
  round-trip through JavaScript-style numbers). Timestamps are NOT in
  this projection: Spark's default JSON timestamp format carries
  millisecond precision, so an events roundtrip belongs to ORC below
  (or an explicit ``timestampFormat`` with microseconds).
- **ORC** — microsecond timestamp and IEEE double fidelity through a
  second columnar format (events table: ``ts`` + ``value``).

Scale posture: writers shard (``repartition``/upstream partitioning,
never coalesce-to-one); readers carry explicit schemas. The temp-dir
staging is harness plumbing, same as ``streaming/drains.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .csv import CSV_READ_OPTS, write_csv
from .jsonl import read_jsonl, write_jsonl
from .orc import read_orc, write_orc
from .xml import read_xml, write_xml

#: Explicit read schemas (inference over TBs is a full extra pass —
#: and for CSV it would also coerce types the hash is sensitive to).
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _staged(build: Callable[[str], DataFrame]) -> DataFrame:
    """Run ``build(tmp)`` against a fresh temp dir, localCheckpoint the
    result so the staged files can be deleted (drains recipe)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="roundtrip_")
    try:
        return build(tmp).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _docs_digest(df: DataFrame) -> DataFrame:
    """Digest projection compared against the raw table: md5 instead of
    raw text keeps the driver payload small while still failing on any
    single corrupted byte."""
    return df.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("text_md5"),
    )


def csv_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → sharded CSV (engine-wide standard dialect) → schema-
    explicit multiLine read → digest; must hash-match the raw table."""
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].select("doc_id", "text", "lang", "source", "n_chars")

    def build(tmp: str) -> DataFrame:
        write_csv(docs, f"{tmp}/csv", shards=4)
        back = (
            spark.read.schema(DOCS_SCHEMA)
            .options(**CSV_READ_OPTS)
            .csv(f"{tmp}/csv")
        )
        return _docs_digest(back)

    return _staged(build)


def jsonl_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → sharded JSONL → schema-explicit read → digest; must
    hash-match the raw table (JSON string escaping under the hash)."""
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].select("doc_id", "text", "lang", "source", "n_chars")

    def build(tmp: str) -> DataFrame:
        write_jsonl(docs, f"{tmp}/jsonl", shards=4)
        return _docs_digest(
            read_jsonl(spark, f"{tmp}/jsonl", schema=DOCS_SCHEMA)
        )

    return _staged(build)


def xml_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → sharded XML (Spark 4 native format, one <row> per
    record) → schema-explicit whitespace-preserving read → digest; must
    hash-match the raw table (entity escaping + surrounding-space
    preservation under the hash — see sources/xml.py's dialect pins)."""
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].select("doc_id", "text", "lang", "source", "n_chars")

    def build(tmp: str) -> DataFrame:
        write_xml(docs, f"{tmp}/xml", shards=4)
        return _docs_digest(read_xml(spark, f"{tmp}/xml", DOCS_SCHEMA))

    return _staged(build)


def orc_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → sharded ORC → read → identity projection; must
    hash-match the raw table, pinning microsecond timestamps and IEEE
    doubles through the second columnar format."""
    events = load_tables(spark, sf_dir, names=("events",), register=False)[
        "events"
    ]

    def build(tmp: str) -> DataFrame:
        write_orc(events, f"{tmp}/orc", shards=4)
        back = read_orc(spark, f"{tmp}/orc")
        if dict(back.dtypes).get("ts") == "timestamp_ntz":
            back = back.withColumn("ts", F.col("ts").cast("timestamp"))
        return back.select(
            "event_id", "ts", "user_id", "event_type", "value"
        )

    return _staged(build)


#: Corrupt lines injected into the JSONL tolerance drill, all
#: malformed differently (truncated object, bare text, unclosed
#: string). Counted exactly by the oracle.
CORRUPT_LINES = (
    '{"doc_id": 999000001, "text": "truncated',
    "this is not json at all",
    '{"doc_id": 999000003, "text": "unclosed string}',
)


def jsonl_corrupt_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input policy under the hash: a real ingest never gets
    clean files, and the difference between PERMISSIVE quarantine and a
    crashed job is the difference between a pipeline and an incident.
    Stage documents as JSONL, append a shard carrying three differently
    malformed lines, read with an explicit schema + a
    ``_corrupt_record`` column, and return one summary row: good-row
    count, corrupt-row count, and the value digest of the good rows
    (folded order-independently via BIGINT xor of per-row md5
    prefixes). The oracle recomputes the digest from the raw table and
    pins the corrupt count — proving the reader quarantined EXACTLY the
    bad lines and recovered every good row byte-intact."""
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].select("doc_id", "text", "lang", "source", "n_chars")

    def build(tmp: str) -> DataFrame:
        write_jsonl(docs, f"{tmp}/jsonl", shards=4)
        with open(f"{tmp}/jsonl/part-corrupt.json", "w") as f:
            f.write("\n".join(CORRUPT_LINES) + "\n")
        back = (
            spark.read.schema(DOCS_SCHEMA + ", _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(f"{tmp}/jsonl")
        )
        # NULLs encoded explicitly (coalesce to a \x00 sentinel):
        # concat_ws silently SKIPS NULL fields, so rows differing only
        # in WHICH field is NULL (a field-shift corruption) would
        # otherwise collide to the same digest.
        nz = lambda c: F.coalesce(c, F.lit("\x00"))  # noqa: E731
        row_h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        nz(F.col("doc_id").cast("string")),
                        nz(F.col("text")),
                        nz(F.col("lang")),
                        nz(F.col("source")),
                        nz(F.col("n_chars").cast("string")),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        # ONE aggregation over the mixed frame: Spark disallows plans
        # whose JSON scan prunes to only the internal corrupt-record
        # column, so good/corrupt are separated by CASE inside the agg
        # (aggregates skip the NULL branch) rather than by filters.
        ok = F.col("_corrupt_record").isNull()
        return back.select(
            F.when(ok, row_h).alias("h"), ok.cast("long").alias("is_good")
        ).agg(
            F.sum("is_good").alias("n_good"),
            (F.count(F.lit(1)) - F.sum("is_good")).alias("n_corrupt"),
            # bit_xor fold: exact, constant memory, order independent
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("good_digest"),
        )

    return _staged(build)


def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema EVOLUTION on the parquet source, under the hash: a
    long-lived ingest directory accumulates deliveries written under
    different schema versions, and the reader must surface the union
    schema without rewriting history. Delivery v1 (even doc_ids)
    writes the narrow schema (doc_id, text); delivery v2 (odd ids)
    adds (lang, source). Reading the directory with
    ``mergeSchema=true`` must widen v1 rows with NULLs — encoded
    through the same \\x00-sentinel digest discipline as the corrupt-
    tolerance entry, so a reader that misaligned columns or dropped
    v1's rows breaks the fold. One summary row: per-generation counts
    + the order-independent union digest the oracle recomputes from
    the raw table (v1 columns masked by the same doc_id rule).

    Scale note: ``mergeSchema`` reads every file footer at planning
    time — fine per-directory; at 100 TB you pin the union schema in a
    catalog and pass it explicitly (``spark.read.schema(...)``), which
    this same entry exercises on the read side structurally."""
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ]

    def build(tmp: str) -> DataFrame:
        even = F.pmod(F.col("doc_id"), 2) == 0
        docs.filter(even).select("doc_id", "text").write.parquet(
            f"{tmp}/evo"
        )
        docs.filter(~even).select(
            "doc_id", "text", "lang", "source"
        ).write.mode("append").parquet(f"{tmp}/evo")
        back = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/evo")
        nz = lambda c: F.coalesce(c, F.lit("\x00"))  # noqa: E731
        row_h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        nz(F.col("doc_id").cast("string")),
                        nz(F.col("text")),
                        nz(F.col("lang")),
                        nz(F.col("source")),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        v1 = (F.pmod(F.col("doc_id"), 2) == 0).cast("long")
        return back.select(row_h.alias("h"), v1.alias("is_v1")).agg(
            F.sum("is_v1").alias("n_v1"),
            (F.count(F.lit(1)) - F.sum("is_v1")).alias("n_v2"),
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("union_digest"),
        )

    return _staged(build)


def jsonl_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the JSONL source — the EXPLICIT-SCHEMA
    null-fill path (r11 VERDICT Next #6), complementing
    :func:`parquet_schema_evolution`'s footer-merge path: the same two
    deliveries (v1 narrow on even doc_ids, v2 adds lang/source on odd)
    land as JSON lines, and the reader carries the pinned UNION schema
    — the JSON parse unit null-fills every absent field, no footer
    merge, no planning-time scan of old files. Same digest discipline
    and the same oracle as the parquet twin, so the two evolution
    policies are pinned to the identical answer.

    Divergence hazards the pytest pins (tests/test_sources.py):
    parquet ``mergeSchema`` fails LOUDLY on any type change — even
    int→long widening (migrate via an explicit catalog schema, which
    the parquet reader upcasts correctly); the JSON parse unit under an
    explicit schema silently COERCES a type-changed scalar to string —
    a reason production readers pair it with a ``_corrupt_record``
    column and checksum columns downstream."""
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ]

    def build(tmp: str) -> DataFrame:
        even = F.pmod(F.col("doc_id"), 2) == 0
        write_jsonl(docs.filter(even).select("doc_id", "text"), f"{tmp}/v1")
        write_jsonl(
            docs.filter(~even).select("doc_id", "text", "lang", "source"),
            f"{tmp}/v2",
        )
        back = read_jsonl(
            spark,
            [f"{tmp}/v1", f"{tmp}/v2"],
            schema="doc_id bigint, text string, lang string, source string",
        )
        nz = lambda c: F.coalesce(c, F.lit("\x00"))  # noqa: E731
        row_h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        nz(F.col("doc_id").cast("string")),
                        nz(F.col("text")),
                        nz(F.col("lang")),
                        nz(F.col("source")),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        v1 = (F.pmod(F.col("doc_id"), 2) == 0).cast("long")
        return back.select(row_h.alias("h"), v1.alias("is_v1")).agg(
            F.sum("is_v1").alias("n_v1"),
            (F.count(F.lit(1)) - F.sum("is_v1")).alias("n_v2"),
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("union_digest"),
        )

    return _staged(build)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "csv_roundtrip_digest": csv_roundtrip_digest,
    "parquet_schema_evolution": parquet_schema_evolution,
    "jsonl_schema_evolution": jsonl_schema_evolution,
    "jsonl_roundtrip_digest": jsonl_roundtrip_digest,
    "xml_roundtrip_digest": xml_roundtrip_digest,
    "orc_roundtrip_digest": orc_roundtrip_digest,
    "jsonl_corrupt_tolerance": jsonl_corrupt_tolerance,
}

_DOCS_DIGEST_SQL = """
        SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        FROM documents"""

ORACLES: dict[str, str] = {
    # the oracle never sees the staged files: it recomputes the digest
    # from the raw table, so the hash covers the whole encode→decode
    "csv_roundtrip_digest": _DOCS_DIGEST_SQL,
    # union digest recomputed from the raw table with v1's columns
    # masked by the same doc_id parity rule the staging used
    "parquet_schema_evolution": """
        WITH u AS (
            SELECT doc_id, text,
                   CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
                   CASE WHEN doc_id % 2 = 1 THEN source END AS source
            FROM documents),
        h AS (
            SELECT doc_id,
                   ('0x' || substring(md5(concat_ws(chr(31),
                        coalesce(CAST(doc_id AS VARCHAR), chr(0)),
                        coalesce(text, chr(0)),
                        coalesce(lang, chr(0)),
                        coalesce(source, chr(0)))),
                    1, 15))::BIGINT AS h
            FROM u)
        SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_v1,
               CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_v2,
               CAST(bit_xor(h) AS BIGINT) AS union_digest
        FROM h""",
    # the JSONL null-fill path must land on the IDENTICAL digest the
    # parquet footer-merge path does — one oracle, two policies
    "jsonl_schema_evolution": """
        WITH u AS (
            SELECT doc_id, text,
                   CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
                   CASE WHEN doc_id % 2 = 1 THEN source END AS source
            FROM documents),
        h AS (
            SELECT doc_id,
                   ('0x' || substring(md5(concat_ws(chr(31),
                        coalesce(CAST(doc_id AS VARCHAR), chr(0)),
                        coalesce(text, chr(0)),
                        coalesce(lang, chr(0)),
                        coalesce(source, chr(0)))),
                    1, 15))::BIGINT AS h
            FROM u)
        SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_v1,
               CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_v2,
               CAST(bit_xor(h) AS BIGINT) AS union_digest
        FROM h""",
    "jsonl_roundtrip_digest": _DOCS_DIGEST_SQL,
    "xml_roundtrip_digest": _DOCS_DIGEST_SQL,
    "orc_roundtrip_digest": """
        SELECT event_id, ts, user_id, event_type, value FROM events""",
    # digest recomputed from the raw table; corrupt count pinned to the
    # exact number of injected malformed lines
    "jsonl_corrupt_tolerance": f"""
        WITH h AS (
            SELECT ('0x' || substring(md5(concat_ws(chr(31),
                        coalesce(CAST(doc_id AS VARCHAR), chr(0)),
                        coalesce(text, chr(0)),
                        coalesce(lang, chr(0)),
                        coalesce(source, chr(0)),
                        coalesce(CAST(n_chars AS VARCHAR), chr(0)))),
                    1, 15))::BIGINT AS h
            FROM documents)
        SELECT count(*) AS n_good,
               CAST({len(CORRUPT_LINES)} AS BIGINT) AS n_corrupt,
               CAST(bit_xor(h) AS BIGINT) AS good_digest
        FROM h""",
}
