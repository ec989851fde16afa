"""Z-order (Morton-curve) clustered parquet layout — multi-column data
skipping for the fact tables.

The month-partitioned layout (``parquet.py``) prunes on ONE dimension;
queries that ALSO filter on a second key (user, customer) still scan
every file inside the surviving partitions. Interleaving the bits of
two scaled keys and range-partition-sorting on the result clusters
files into tiles of the (ts, user) plane, so parquet footer min/max
stats let a reader skip files on EITHER predicate — the technique
behind lakehouse ``OPTIMIZE ZORDER BY`` (public Delta/Iceberg/ClickHouse
literature), built here from plain Spark expressions.

Scale posture: the per-column scaling bounds come from one 1-row agg
(bounded collect); the z-value is a stateless JVM bit-interleave
projection; the clustering itself is ``repartitionByRange`` on z —
sample-based range partitioning, the same machinery as any global sort,
paid ONCE at write time. Readers need nothing special: Spark's parquet
scan consults footer stats per file/row-group automatically.

``tests/test_sources.py::test_zorder_layout_skips_on_both_dimensions``
measures the effect directly from the parquet footers: under a small
(ts-range AND user-range) query box, the z-ordered layout leaves a
fraction of the files eligible where the single-key sort layout keeps
every file eligible on the secondary key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the interleave (2*ZBITS total): 16 gives 65536
#: tiles per axis — far below any precision the footer stats can use,
#: far above any realistic file count.
ZBITS = 16


def _scaled(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map ``col`` onto the 0 .. 2^bits-1 integer grid between the
    column's min/max (degenerate range -> 0)."""
    span = cmax - cmin
    grid = F.lit((1 << bits) - 1)
    return F.when(span <= 0, F.lit(0)).otherwise(
        ((col - cmin).cast("double") / span.cast("double") * grid).cast(
            "bigint"
        )
    )


def _interleave(x: Column, y: Column, bits: int) -> Column:
    """Morton interleave: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_value(df: DataFrame, xcol: str, ycol: str, bits: int = ZBITS) -> DataFrame:
    """Append a ``zval`` column interleaving the scaled ``xcol``/``ycol``
    (numeric or timestamp — timestamps ride as epoch micros)."""

    def as_long(name: str) -> Column:
        c = F.col(name)
        if dict(df.dtypes)[name].startswith("timestamp"):
            return F.unix_micros(c)
        return c.cast("bigint")

    x, y = as_long(xcol), as_long(ycol)
    bounds = df.agg(
        F.min(x).alias("xmin"),
        F.max(x).alias("xmax"),
        F.min(y).alias("ymin"),
        F.max(y).alias("ymax"),
    ).first()
    xs = _scaled(x, F.lit(bounds.xmin), F.lit(bounds.xmax), bits)
    ys = _scaled(y, F.lit(bounds.ymin), F.lit(bounds.ymax), bits)
    return df.withColumn("zval", _interleave(xs, ys, bits))


def write_zorder(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as ``files`` parquet files clustered along the
    Morton curve of (xcol, ycol); the ``zval`` helper column is dropped
    from the stored schema."""
    (
        zorder_value(df, xcol, ycol, bits)
        .repartitionByRange(files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
