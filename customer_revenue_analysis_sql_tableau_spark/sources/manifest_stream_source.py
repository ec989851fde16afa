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
registered drain's universe is one); CDF streaming over updates is
the batch ``read_change_feed``'s job.

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
    """Idempotent ``spark.dataSource.register``."""
    spark.dataSource.register(ManifestTableStreamDataSource)


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


QUERIES = {"stream_manifest_source_drain": stream_manifest_source_drain}

ORACLES = {
    # the streamed-out table must be the whole delivery exactly once,
    # months injected from the partition paths — row-level over all
    # five columns
    "stream_manifest_source_drain": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
               strftime(o_orderdate, '%Y-%m') AS pm
        FROM orders""",
}
