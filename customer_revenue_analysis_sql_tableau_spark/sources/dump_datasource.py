"""The MySQL-dump parser as a Spark 4 CUSTOM PYTHON DATA SOURCE.

``sources/mysql_dump.py`` parses the reference's own Sakila dump
(``sql/sakila-data.sql``) on the driver and ``createDataFrame``s the
result — correct, but the whole file funnels through one process. This
module re-expresses the same parser as a registrable
``pyspark.sql.datasource.DataSource`` (Spark 4's Python data-source
API), which is the Spark-native shape for a custom text format:

- ``spark.dataSource.register(SakilaDumpDataSource)`` once, then
  ``spark.read.format("sakila_dump").option("path", dump)
  .option("table", "rental").load()`` anywhere;
- the PLANNER pass (driver) only locates the byte offsets of the
  table's ``INSERT INTO ... VALUES`` statements — one
  ``InputPartition`` per statement, so a multi-statement table
  (``rental``/``payment`` ship as two INSERTs each) reads in
  parallel and a 100 TB dump with thousands of statements would
  scale out the same way;
- the EXECUTOR pass parses only its own statement's VALUES list
  (``_parse_values`` from the proven parser) and coerces through the
  same declared-schema path (``_coerce``), so types — timestamps,
  decimals, the staff-picture BLOB — match the driver-side loader
  row for row (asserted in tests/test_dump_datasource.py).

Cited reference surface: the dump itself (``sql/sakila-data.sql``)
and its declared DDL (``sql/sakila-schema.sql``) — SURVEY.md §1.2/§2.1
(S1/S2)."""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .mysql_dump import SAKILA_SCHEMAS, _coerce, _parse_values


class _InsertStatementPartition(InputPartition):
    """One INSERT statement: (byte offset of its VALUES list)."""

    def __init__(self, index: int, offset: int) -> None:
        self.index = index
        self.offset = offset


class SakilaDumpDataSource(DataSource):
    """``format("sakila_dump")`` — options: ``path`` (dump file),
    ``table`` (one of the declared Sakila tables)."""

    @classmethod
    def name(cls) -> str:
        return "sakila_dump"

    def schema(self) -> str:
        table = self.options.get("table", "")
        if table not in SAKILA_SCHEMAS:
            raise ValueError(
                f"unknown table {table!r}; declared: "
                f"{sorted(SAKILA_SCHEMAS)}"
            )
        return SAKILA_SCHEMAS[table]

    def reader(self, schema) -> "SakilaDumpReader":
        return SakilaDumpReader(dict(self.options))


class SakilaDumpReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.table = options["table"]

    def partitions(self) -> Sequence[InputPartition]:
        """Driver-side planning: one partition per INSERT statement of
        the requested table (a regex scan for statement offsets — the
        format's analogue of reading parquet footers; the VALUES
        payloads are never parsed here)."""
        with open(self.path, encoding="utf-8") as fh:
            text = fh.read()
        pat = re.compile(rf"INSERT INTO `?{re.escape(self.table)}`? VALUES")
        offsets = [m.end() for m in pat.finditer(text)]
        if not offsets:
            return [_InsertStatementPartition(0, -1)]  # empty table
        return [
            _InsertStatementPartition(i, off)
            for i, off in enumerate(offsets)
        ]

    def read(self, partition: _InsertStatementPartition) -> Iterator[tuple]:
        if partition.offset < 0:
            return
        with open(self.path, encoding="utf-8") as fh:
            text = fh.read()
        rows, _ = _parse_values(text, partition.offset)
        yield from _coerce(rows, SAKILA_SCHEMAS[self.table])


class SakilaDumpStreamReader(SimpleDataSourceStreamReader):
    """STREAMING replay of the dump: each micro-batch serves the next
    INSERT statement of the requested table — the ingest shape of a
    CDC-style backfill, with exactly-once offset bookkeeping owned by
    this reader. The offset is ``{"stmt": i}`` (statements consumed so
    far); ``read(start)`` parses statement ``i`` and advances to
    ``i+1``; ``readBetweenOffsets`` makes batch REPLAY after a crash
    deterministic (the engine re-asks for a committed range instead of
    trusting the sink), which is what the restart pytest exercises."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.table = options["table"]
        self._offsets: list[int] | None = None

    def _stmt_offsets(self) -> list[int]:
        if self._offsets is None:
            with open(self.path, encoding="utf-8") as fh:
                text = fh.read()
            pat = re.compile(
                rf"INSERT INTO `?{re.escape(self.table)}`? VALUES"
            )
            self._offsets = [m.end() for m in pat.finditer(text)]
        return self._offsets

    def initialOffset(self) -> dict:
        return {"stmt": 0}

    def _rows_of(self, stmt: int) -> Iterator[tuple]:
        with open(self.path, encoding="utf-8") as fh:
            text = fh.read()
        rows, _ = _parse_values(text, self._stmt_offsets()[stmt])
        yield from _coerce(rows, SAKILA_SCHEMAS[self.table])

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        i = start["stmt"]
        if i >= len(self._stmt_offsets()):
            return iter(()), start  # exhausted: empty batch, same offset
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterator for replay, and generators
        # are not copyable. One INSERT statement is the batch unit, so
        # materializing it is the point, not a compromise.
        return iter(list(self._rows_of(i))), {"stmt": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for i in range(start["stmt"], end["stmt"]):
            yield from self._rows_of(i)

    def commit(self, end: dict) -> None:
        pass  # the dump is immutable; nothing to prune


class SakilaDumpStreamDataSource(DataSource):
    """``format("sakila_dump_stream")`` — the streaming twin."""

    @classmethod
    def name(cls) -> str:
        return "sakila_dump_stream"

    def schema(self) -> str:
        table = self.options.get("table", "")
        if table not in SAKILA_SCHEMAS:
            raise ValueError(f"unknown table {table!r}")
        return SAKILA_SCHEMAS[table]

    def simpleStreamReader(self, schema) -> SakilaDumpStreamReader:
        return SakilaDumpStreamReader(dict(self.options))


def register_dump_datasource(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of both formats."""
    spark.dataSource.register(SakilaDumpDataSource)
    spark.dataSource.register(SakilaDumpStreamDataSource)
