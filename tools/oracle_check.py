"""Local replica of the driver's t2 correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, **result dtypes** (Arrow-level,
see ``compare_schemas``), and order-insensitive values (sorted by all
columns). Exact equality for ints/strings/timestamps; doubles must
match bit-for-bit — the engine is designed so they do (decimal-exact
money, integer-exact division rounding).

The dtype check exists because the driver's value hash is
type-sensitive while pandas-level comparison is not: DuckDB promotes
``sum()`` over integers to HUGEINT (Arrow decimal128), which pandas
silently coerces back to something comparable — six round-2 oracles
passed here and failed under the driver for exactly that reason
(VERDICT.md round 2, "What's wrong" #3). Fetching both sides as Arrow
keeps the engines' true types visible.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _type_class(t: pa.DataType) -> str:
    """Collapse an Arrow type to the class the driver's value hash is
    sensitive to. Integer widths serialize identically (58 is 58 as
    int32 or int64) so they share one class, but *kind* changes do
    not: DuckDB promotes integer ``sum()`` to HUGEINT (Arrow
    decimal128) and nullable ints to float — both print differently
    (``Decimal('58')`` / ``58.0`` vs ``58``) and flip the hash.
    Decimal scale is part of the class because '5.70' != '5.700'.
    """
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # one class: DATE vs TIMESTAMP-at-midnight hash-matched under
        # the driver in r2 (rollup_daily_from_hours), and _normalize
        # coerces both to datetime64 before value comparison
        return "datetime"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"list<{_type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(f"{f.name}:{_type_class(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def compare_schemas(spark_schema: pa.Schema, oracle_schema: pa.Schema) -> list[str]:
    """Dtype-strict comparison of the two engines' Arrow result
    schemas (column-name matching is case-insensitive and handled by
    ``compare_frames``; here only the types of shared names)."""
    problems: list[str] = []
    s = {f.name.lower(): f.type for f in spark_schema}
    o = {f.name.lower(): f.type for f in oracle_schema}
    for name in sorted(s.keys() & o.keys()):
        sc, oc = _type_class(s[name]), _type_class(o[name])
        if sc != oc:
            hint = ""
            if sc == "int" and oc.startswith("decimal"):
                hint = " — DuckDB HUGEINT promotion: CAST the oracle sum() AS BIGINT"
            elif sc == "int" and oc == "float":
                hint = " — DuckDB float promotion: CAST the oracle expr AS BIGINT"
            problems.append(f"dtype {name}: spark={sc} oracle={oc}{hint}")
    return problems


def compare_frames(spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pd) != len(oracle_pd):
        problems.append(f"row count: spark={len(spark_pd)} oracle={len(oracle_pd)}")
    sc, oc = sorted(spark_pd.columns), sorted(oracle_pd.columns)
    if [c.lower() for c in sc] != [c.lower() for c in oc]:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    oracle_pd = oracle_pd.rename(columns=dict(zip(oc, sc)))
    if problems:
        return problems
    a, b = _normalize(spark_pd), _normalize(oracle_pd)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        else:
            neq = ~(
                (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).to_numpy()
                | (pd.isna(av) & pd.isna(bv))
            )
        if neq.any():
            i = int(np.argmax(neq))
            problems.append(
                f"column {c}: {int(neq.sum())} mismatched values, "
                f"first at sorted-row {i}: spark={av[i]!r} oracle={bv[i]!r}"
            )
    return problems


def compare_tables(spark_tbl: pa.Table, oracle_tbl: pa.Table) -> list[str]:
    """Full strict comparison: Arrow dtypes first, then values."""
    return compare_schemas(spark_tbl.schema, oracle_tbl.schema) + compare_frames(
        spark_tbl.to_pandas(), oracle_tbl.to_pandas()
    )


def main() -> int:
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entrymod
    from customer_revenue_analysis_sql_tableau_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb_connection(sf_dir)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spark_tbl = fn(spark, sf_dir).toArrow()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name}: rows-only ({spark_tbl.num_rows} rows)")
            continue
        try:
            oracle_tbl = con.execute(sql).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare_tables(spark_tbl, oracle_tbl)
        if problems:
            failures += 1
            print(f"FAIL  {name}:")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name} ({spark_tbl.num_rows} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
