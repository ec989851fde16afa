"""Local replica of the driver's t2 correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values (sorted
by all columns). Exact equality for ints/strings/timestamps; doubles
must match bit-for-bit — the engine is designed so they do (decimal-
exact money, integer-exact division rounding).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

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


def main() -> int:
    sys.path.insert(0, "/root/repo")
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
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name}: rows-only ({len(spark_pd)} rows)")
            continue
        try:
            oracle_pd = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare_frames(spark_pd, oracle_pd)
        if problems:
            failures += 1
            print(f"FAIL  {name}:")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name} ({len(spark_pd)} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
