"""The manifested table as a STREAMING SOURCE (Spark 4 Python
DataSource API) — the missing half of the streaming story: r13/r14
built exactly-once sinks INTO the table; this module lets Structured
Streaming read FROM it, the Delta ``readStream``-on-a-table contract.

``format("manifest_table_stream")`` tails the commit chain: the offset
is ``{"version": N}`` (last commit consumed), ``latestOffset`` resolves
the head from directory names (O(1), no JSON parse per commit), and
``partitions(start, end)`` emits ONE input partition PER FILE each
commit in the range ADDED — so the read itself is executor-parallel
(``read`` runs on executors over Arrow), never a driver funnel, and a
micro-batch's I/O is ∝ the commits it consumes, never a table scan.
Append commits stream their rows exactly once; content-neutral
rewrites (OPTIMIZE) contribute their added files too — like Delta,
the APPEND-ONLY source contract belongs to append tables (the
registered drain's universe is one). For tables that UPDATE,
``format("manifest_table_cdf_stream")`` streams classified CHANGE
rows instead (Delta's streaming ``readChangeFeed``), one partition
per consumed commit.

Exactly-once: the offset lives in the STREAM's checkpoint (Spark's
contract), so a restart resumes at the committed version and a commit
landed between drains is picked up incrementally — pinned in
tests/test_manifest_stream_source.py by draining, appending v5, and
re-draining against the same checkpoint.

Reference parity note: the reference (customer-revenue-analysis-sql-
tableau, a MySQL dump + Tableau workbook) has no streaming surface;
this module belongs to the driver's large-scale-pipeline mandate.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from .parquet import MONTH_COL

#: The source's fixed schema: the append-table delivery columns + the
#: hive partition value (injected from the file path, since data files
#: store only the data columns).
STREAM_SOURCE_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
    f" o_orderdate timestamp, {MONTH_COL} string"
)
_DATA_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]


class _AddedFilePartition(InputPartition):
    """One ADDED file of one commit — the unit of executor-parallel
    streaming read."""

    def __init__(self, path: str, month: str) -> None:
        self.path = path
        self.month = month


class ManifestTableStreamReader(DataSourceStreamReader):
    """Commit-chain tail: offsets are manifest versions; batches are
    the files those commits added."""

    def __init__(self, options: dict) -> None:
        self.root = options["root"]
        self.base = self.root.removeprefix("file:")
        self.start_version = int(options.get("start_version", "1"))

    # offset bookkeeping ------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from .manifest_table import manifest_versions

        versions = manifest_versions(self.root)
        if not versions:
            raise ValueError(f"no manifest chain at {self.root}")
        return {"version": versions[-1]}

    # planning ----------------------------------------------------------
    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from .manifest_table import incremental_files

        out: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            added, _removed = incremental_files(self.root, v - 1, v)
            for rel in added:
                month = rel.split("/", 1)[0].split("=", 1)[1]
                out.append(
                    _AddedFilePartition(
                        os.path.join(self.base, rel), month
                    )
                )
        # Spark requires >=1 partition per batch; an empty range (only
        # head-carry commits) streams zero rows through one no-op split
        return out or [_AddedFilePartition("", "")]

    # executor-side read ------------------------------------------------
    def read(self, partition: _AddedFilePartition) -> Iterator[tuple]:
        if not partition.path:
            return iter(())
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path, columns=_DATA_COLS)
        rows = tbl.to_pylist()
        return iter(
            [
                tuple(r[c] for c in _DATA_COLS) + (partition.month,)
                for r in rows
            ]
        )

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; the checkpoint owns progress


#: The CDF stream's schema: the merge universe's data columns + month
#: + change metadata.
CDF_STREAM_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
    f" o_orderdate timestamp, {MONTH_COL} string,"
    " _change_type string, _commit_version int"
)


class _CommitPartition(InputPartition):
    """One COMMIT's change computation — pre/post sets must meet to
    classify, so the commit (not the file) is the unit; a production
    variant with huge commits would shuffle per-file pre/post through
    the batch ``read_change_feed`` instead (stated, not hidden)."""

    def __init__(
        self, version: int, added: list[str], removed: list[str]
    ) -> None:
        self.version = version
        self.added = added
        self.removed = removed


class ManifestTableCDFStreamReader(DataSourceStreamReader):
    """STREAMING CHANGE DATA FEED: where the row-stream source handles
    append-only tables, this one tails ANY commit chain and emits
    classified change rows (insert / delete / update_pre/postimage) —
    Delta's ``readChangeFeed`` streaming contract. Offsets are manifest
    versions; each micro-batch's partitions are the commits it
    consumes; classification runs executor-side in Arrow over the
    commit's removed (pre-image) and added (post-image) files, keyed
    on ``key`` (default ``o_orderkey``), identical semantics to the
    batch ``manifest_table.changes_for_commit`` (carried CoW neighbors
    drop out, so OPTIMIZE commits stream nothing)."""

    def __init__(self, options: dict) -> None:
        self.root = options["root"]
        self.base = self.root.removeprefix("file:")
        self.start_version = int(options.get("start_version", "1"))
        self.key = options.get("key", "o_orderkey")

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from .manifest_table import manifest_versions

        versions = manifest_versions(self.root)
        if not versions:
            raise ValueError(f"no manifest chain at {self.root}")
        return {"version": versions[-1]}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from .manifest_table import incremental_files

        out: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            added, removed = incremental_files(self.root, v - 1, v)
            if added or removed:
                out.append(_CommitPartition(v, added, removed))
        return out or [_CommitPartition(0, [], [])]

    def _rows_of(self, rels: list[str]) -> dict:
        """``{key: (row tuple incl. month, full-row hash key)}`` for
        the listed files — pyarrow reads, month from the path."""
        import pyarrow.parquet as pq

        out: dict = {}
        for rel in rels:
            month = rel.split("/", 1)[0].split("=", 1)[1]
            tbl = pq.read_table(
                os.path.join(self.base, rel), columns=_DATA_COLS
            )
            for r in tbl.to_pylist():
                row = tuple(r[c] for c in _DATA_COLS) + (month,)
                out[r[self.key]] = row
        return out

    def read(self, partition: _CommitPartition) -> Iterator[tuple]:
        if not partition.added and not partition.removed:
            return iter(())
        pre = self._rows_of(partition.removed)
        post = self._rows_of(partition.added)
        v = partition.version
        changes: list[tuple] = []
        for k, row in post.items():
            if k not in pre:
                changes.append(row + ("insert", v))
            elif pre[k] != row:
                changes.append(pre[k] + ("update_preimage", v))
                changes.append(row + ("update_postimage", v))
        for k, row in pre.items():
            if k not in post:
                changes.append(row + ("delete", v))
        return iter(changes)

    def commit(self, end: dict) -> None:
        pass


class ManifestTableCDFStreamDataSource(DataSource):
    """``format("manifest_table_cdf_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_table_cdf_stream"

    def schema(self) -> str:
        return CDF_STREAM_SCHEMA

    def streamReader(self, schema) -> ManifestTableCDFStreamReader:
        return ManifestTableCDFStreamReader(dict(self.options))


class ManifestTableStreamDataSource(DataSource):
    """``format("manifest_table_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_table_stream"

    def schema(self) -> str:
        return STREAM_SOURCE_SCHEMA

    def streamReader(self, schema) -> ManifestTableStreamReader:
        return ManifestTableStreamReader(dict(self.options))


def register_manifest_stream_source(spark: SparkSession) -> None:
    """Idempotent ``spark.dataSource.register`` of both formats."""
    spark.dataSource.register(ManifestTableStreamDataSource)
    spark.dataSource.register(ManifestTableCDFStreamDataSource)


def stream_manifest_source_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """READ THE TABLE AS A STREAM, end to end: the append universe's
    commit chain (empty v1 + three exactly-once appended batches) is
    drained through ``format("manifest_table_stream")`` into a parquet
    sink (drains recipe: temp sink + checkpoint, result
    localCheckpointed so the temp state can be deleted). The sink must
    hold the WHOLE delivery exactly once — a row-level oracle over all
    five columns, so a duplicated commit replay, a skipped commit, or
    a wrong month injection hash-fails. I/O posture: each micro-batch
    reads only its commits' added files, one executor partition per
    file."""
    import shutil
    import tempfile

    from ..catalog import ensure_utc_session
    from .manifest_table import (
        _stream_append_root,
        stream_manifest_append_drain,
    )

    # the Python-source rows carry naive datetimes (parquet UTC wall
    # time); the session MUST be UTC when Spark converts them — pinned
    # here explicitly because a replay skips the load_tables path that
    # normally pins it (the hostile-driver-timezone contract)
    ensure_utc_session(spark)
    stream_manifest_append_drain(spark, sf_dir)  # ensure the universe
    root = _stream_append_root(spark, sf_dir)
    register_manifest_stream_source(spark)
    tmp = tempfile.mkdtemp(prefix="manifest_srcstream_")
    try:
        (
            spark.readStream.format("manifest_table_stream")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", f"{tmp}/sink")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = spark.read.schema(STREAM_SOURCE_SCHEMA).parquet(
            f"{tmp}/sink"
        )
        return out.withColumnRenamed(MONTH_COL, "pm").localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def stream_manifest_cdf_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM THE CHANGE FEED of the streaming-merge universe's whole
    commit chain — updates and all: three upsert commits stream out as
    classified change rows (batch-0 inserts; two rounds of mod-0
    update pre/post pairs; mod-1/mod-2 inserts), carried CoW neighbors
    absent. Row-level oracle: DuckDB recomputes every change row of
    every commit from the upsert schedule's semantics — a
    misclassified, duplicated, lost, or mispriced change anywhere in
    the chain hash-fails. This is the r14 row-stream source's
    documented gap closed: the table streams out under UPDATES, not
    just appends."""
    import shutil
    import tempfile

    from ..catalog import ensure_utc_session
    from .manifest_table import (
        _stream_merge_root,
        stream_manifest_merge_drain,
    )

    ensure_utc_session(spark)
    stream_manifest_merge_drain(spark, sf_dir)  # ensure the universe
    root = _stream_merge_root(spark, sf_dir)
    register_manifest_stream_source(spark)
    tmp = tempfile.mkdtemp(prefix="manifest_cdfstream_")
    try:
        (
            spark.readStream.format("manifest_table_cdf_stream")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", f"{tmp}/sink")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = spark.read.schema(CDF_STREAM_SCHEMA).parquet(f"{tmp}/sink")
        return out.withColumnRenamed(MONTH_COL, "pm").localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


QUERIES = {
    "stream_manifest_source_drain": stream_manifest_source_drain,
    "stream_manifest_cdf_drain": stream_manifest_cdf_drain,
}

ORACLES = {
    # the streamed-out table must be the whole delivery exactly once,
    # months injected from the partition paths — row-level over all
    # five columns
    "stream_manifest_source_drain": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
               strftime(o_orderdate, '%Y-%m') AS pm
        FROM orders""",
    # the streamed CDF of the 3-commit upsert chain, row-level: batch 0
    # inserts mod-0 at base price (commit 2); batch 1 updates mod-0 to
    # base+250 and inserts mod-1 at base+250 (commit 3); batch 2
    # updates mod-0 to base+500 and inserts mod-2 at base+500
    # (commit 4) — mod-1 rows carried unchanged through commit 4's CoW
    # rewrite must NOT appear
    "stream_manifest_cdf_drain": """
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                   strftime(o_orderdate, '%Y-%m') AS pm,
                   o_orderkey % 3 AS m
            FROM orders
        )
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, pm,
               'insert' AS _change_type, 2 AS _commit_version
        FROM base WHERE m = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, pm,
               'update_preimage', 3 FROM base WHERE m = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice + 250.0, o_orderdate,
               pm, 'update_postimage', 3 FROM base WHERE m = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice + 250.0, o_orderdate,
               pm, 'insert', 3 FROM base WHERE m = 1
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice + 250.0, o_orderdate,
               pm, 'update_preimage', 4 FROM base WHERE m = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice + 500.0, o_orderdate,
               pm, 'update_postimage', 4 FROM base WHERE m = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice + 500.0, o_orderdate,
               pm, 'insert', 4 FROM base WHERE m = 2""",
}
