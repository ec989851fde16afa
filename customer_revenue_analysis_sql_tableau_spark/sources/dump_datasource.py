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
- the PLANNER pass (driver) locates the (start, end) BYTE RANGE of
  each of the table's ``INSERT INTO ... VALUES`` statements with a
  chunked scan (O(chunk) driver memory) — one ``InputPartition`` per
  statement, so a multi-statement table (``rental``/``payment`` ship
  as two INSERTs each) reads in parallel and a 100 TB dump with
  thousands of statements would scale out the same way;
- the EXECUTOR pass seeks to its partition's byte range and parses
  ONLY that slice (``_parse_values`` from the proven parser) — total
  I/O is O(file), per-task memory O(statement) — then coerces through
  the same declared-schema path (``_coerce``), so types — timestamps,
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

from .mysql_dump import SAKILA_SCHEMAS, _coerce, _parse_values_impl


class _InsertStatementPartition(InputPartition):
    """One INSERT statement: the byte range of its VALUES payload —
    ``start`` is the byte just past the ``VALUES`` keyword, ``end`` is
    the byte offset of the next ``INSERT INTO`` statement (any table)
    or EOF. Executors seek+read ONLY this slice."""

    def __init__(self, index: int, start: int, end: int) -> None:
        self.index = index
        self.start = start
        self.end = end


#: Longest plausible ``INSERT INTO `name` VALUES`` header; the chunked
#: scan carries this many bytes between chunks so a header split across
#: a chunk boundary is still matched exactly once.
_HEADER_CARRY = 128
_ANY_INSERT = re.compile(rb"INSERT INTO `?\w+`? VALUES")


def _scan_statement_ranges(path: str, table: str) -> list[tuple[int, int]]:
    """Driver-side planning scan: byte ranges of every INSERT statement
    of ``table``, found with a CHUNKED binary scan (8 MiB windows with a
    small carry tail) so driver memory is O(chunk), never O(file) — the
    r9 ADVICE fix for the slurp-everything planner. Statement end =
    start of the next INSERT of ANY table (the payload parser stops at
    the terminating ``;`` anyway, so the any-insert bound only caps the
    slice; after the final insert the bound is EOF). Byte offsets are
    safe to slice on: the bounds land on ASCII statement headers, so a
    UTF-8 decode of the slice can never split a multi-byte char."""
    tgt = re.compile(
        rb"INSERT INTO `?" + re.escape(table.encode()) + rb"`? VALUES"
    )
    marks: list[tuple[int, int, bool]] = []  # (stmt_start, values_start, is_target)
    chunk_size = 8 << 20
    buf = b""
    base = 0
    size = 0
    with open(path, "rb") as fh:
        while True:
            chunk = fh.read(chunk_size)
            data = buf + chunk
            final = not chunk
            # matches that start in the carry-safe prefix are accepted
            # now; later ones re-appear (whole) in the next window
            cut = len(data) if final else max(0, len(data) - _HEADER_CARRY)
            for m in _ANY_INSERT.finditer(data):
                if m.start() >= cut:
                    break
                marks.append(
                    (
                        base + m.start(),
                        base + m.end(),
                        bool(tgt.match(data, m.start())),
                    )
                )
            if final:
                size = base + len(data)
                break
            buf = data[cut:]
            base += cut
    ranges: list[tuple[int, int]] = []
    for i, (_stmt_start, values_start, is_target) in enumerate(marks):
        if not is_target:
            continue
        end = marks[i + 1][0] if i + 1 < len(marks) else size
        ranges.append((values_start, end))
    return ranges


def _parse_statement_slice(path: str, start: int, end: int, table: str):
    """Executor-side read: seek to the statement's byte range, read and
    decode ONLY that slice, parse + type-coerce. Per-task I/O and
    memory are O(statement), independent of dump-file size."""
    with open(path, "rb") as fh:
        fh.seek(start)
        text = fh.read(end - start).decode("utf-8")
    rows, _, terminated = _parse_values_impl(text, 0)
    if not terminated:
        # The planner's boundary scan is a regex over raw bytes; a
        # quoted value that itself contains "INSERT INTO ... VALUES"
        # would truncate this statement's slice mid-payload. The old
        # full-text path parsed quote-aware to the real ';'; rather
        # than silently returning partial rows, fail loudly.
        raise ValueError(
            f"INSERT payload for table {table!r} at bytes"
            f" [{start}, {end}) did not terminate with ';' — the"
            " statement-boundary scan likely split a quoted value"
            " containing INSERT-statement text; this dump needs the"
            " quote-aware full-text loader (parse_dump)"
        )
    return _coerce(rows, SAKILA_SCHEMAS[table])


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
        the requested table — a CHUNKED regex scan records each
        statement's (start, end) byte range (the format's analogue of
        reading parquet footers); the VALUES payloads are never parsed
        or held in memory here."""
        ranges = _scan_statement_ranges(self.path, self.table)
        if not ranges:
            return [_InsertStatementPartition(0, -1, -1)]  # empty table
        return [
            _InsertStatementPartition(i, s, e)
            for i, (s, e) in enumerate(ranges)
        ]

    def read(self, partition: _InsertStatementPartition) -> Iterator[tuple]:
        if partition.start < 0:
            return
        yield from _parse_statement_slice(
            self.path, partition.start, partition.end, self.table
        )


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
        self._ranges: list[tuple[int, int]] | None = None

    def _stmt_ranges(self) -> list[tuple[int, int]]:
        if self._ranges is None:
            self._ranges = _scan_statement_ranges(self.path, self.table)
        return self._ranges

    def initialOffset(self) -> dict:
        return {"stmt": 0}

    def _rows_of(self, stmt: int) -> Iterator[tuple]:
        start, end = self._stmt_ranges()[stmt]
        yield from _parse_statement_slice(self.path, start, end, self.table)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        i = start["stmt"]
        if i >= len(self._stmt_ranges()):
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
