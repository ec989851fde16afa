"""Engine-side dataflow for the interactive browsing app (§2.12).

The reference ships a Streamlit/pandas layer (`data-mgmt-streamlit.py`)
over its exported CSVs; every dataflow operation it performs is
re-expressed here as a Spark transformation so the same UI can browse
engine outputs at any scale. The UI itself lives in
``app/streamlit_app.py``; this module is UI-free and fully tested.

Operator map (reference citation → function here):

- S7  ``parse_sql_blocks`` regex catalog (`data-mgmt-streamlit.py:24-43`)
  → :func:`parse_sql_blocks` (plain Python — not a Spark op).
- X1  catalog build (`:85-102`) → :func:`build_catalog`.
- F5  any-column substring search (`:56-62`) → :func:`any_column_contains`
  (OR-chain of JVM ``contains``; no Python row loop).
- X2/X3  numeric introspection + bounds (`:64-65,130,135`)
  → :func:`numeric_columns` / :func:`column_bounds`.
- F6/X4  numeric range filter with to_numeric coercion (`:129-146`)
  → :func:`range_filter` (``try_cast('double')`` maps invalid → NULL,
  the same semantics as ``errors='coerce'``).
- O6  head-100 preview (`:152`) → :func:`preview`.
- O7  top-50 cardinality cap (`:194-198`) → :func:`top_n_filter`
  (groupBy-count top-k + LEFT SEMI join — the reference's only
  semi-join-shaped operation).
- X5  duplicate-column dedup (`:187`) → :func:`dedupe_columns`.
- X6  row/column metrics (`:118-120`) → :func:`summary_metrics`.
- S6  CSV download bytes (`:236-242`) → :func:`csv_bytes`.

Scale posture: search/filter/top-k run JVM-side and push down; only
``preview`` and ``csv_bytes`` cross to the driver, both explicitly
row-limited.
"""

from __future__ import annotations

import re
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

#: Reference header convention: ``-- Query 1: Title`` blocks.
SQL_BLOCK_RE = re.compile(
    r"--\s*Query\s*(?P<num>\d+)\s*:\s*(?P<title>.+?)\n"
    r"(?P<body>.*?)(?=(\n--\s*Query\s*\d+\s*:)|\Z)",
    re.IGNORECASE | re.DOTALL,
)


def parse_sql_blocks(sql_text: str) -> list[dict]:
    """S7: ordered ``{num, title, body}`` blocks from an annotated .sql
    file (header convention of ``queries_shan.sql:46`` etc.)."""
    blocks = [
        {
            "num": int(m.group("num")),
            "title": m.group("title").strip(),
            "body": m.group("body").strip(),
        }
        for m in SQL_BLOCK_RE.finditer(sql_text)
    ]
    blocks.sort(key=lambda b: b["num"])
    return blocks


def build_catalog(sql_text: str, available_queries: dict) -> list[dict]:
    """X1: SQL blocks joined with the runnable query registry — the
    app only offers queries that have both SQL text and an engine
    implementation (the reference intersects blocks with existing
    ``data/qN.csv`` files)."""
    blocks = parse_sql_blocks(sql_text)
    return [
        {**b, "query": available_queries[f"q{b['num']}"]}
        for b in blocks
        if f"q{b['num']}" in available_queries
    ]


def any_column_contains(df: DataFrame, needle: str) -> DataFrame:
    """F5: keep rows where ANY column's string form contains ``needle``
    (case-insensitive). JVM OR-chain — the pandas original loops rows in
    Python; this stays inside whole-stage codegen."""
    s = needle.strip().lower()
    if not s:
        return df
    preds = [
        F.lower(F.col(c).cast("string")).contains(F.lit(s)) for c in df.columns
    ]
    return df.filter(F.coalesce(reduce(or_, preds), F.lit(False)))


def numeric_columns(df: DataFrame) -> list[str]:
    """X2: names of numeric-typed columns (schema-driven, no sampling)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def column_bounds(df: DataFrame, cols: list[str] | None = None) -> dict[str, tuple]:
    """X3: one-pass global (min, max) per numeric column (slider bounds)."""
    cols = cols if cols is not None else numeric_columns(df)
    if not cols:
        return {}
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols}


def range_filter(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """F6+X4: keep rows with ``lo <= to_numeric(col) <= hi``; values
    that fail numeric coercion become NULL and drop out, matching
    ``pd.to_numeric(errors='coerce')`` (``try_cast``, not ``cast`` —
    the engine runs ANSI mode where a plain cast would error)."""
    v = F.col(col).try_cast("double")
    return df.filter((v >= lo) & (v <= hi))


def preview(df: DataFrame, n: int = 100) -> DataFrame:
    """O6: row-limited preview (no ordering — it's a peek, like
    ``head(100)``)."""
    return df.limit(n)


def top_n_filter(df: DataFrame, col: str, n: int = 50) -> DataFrame:
    """O7: cap categorical cardinality — keep rows whose ``col`` value
    is among the top-``n`` by frequency. groupBy-count top-k then LEFT
    SEMI join back (never a collected ``isin`` list at scale)."""
    top = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.desc("__cnt"), F.asc_nulls_last(col))
        .limit(n)
        .select(col)
    )
    return df.join(F.broadcast(top), on=col, how="left_semi")


def dedupe_columns(df: DataFrame) -> DataFrame:
    """X5: drop later duplicate-named columns (keep first occurrence)."""
    seen: set[str] = set()
    keep_idx = []
    for i, c in enumerate(df.columns):
        if c not in seen:
            seen.add(c)
            keep_idx.append(i)
    if len(keep_idx) == len(df.columns):
        return df
    # duplicate names are unselectable by name — rename positionally
    # first, then keep the first occurrence of each original name.
    names = df.columns
    tmp = df.toDF(*[f"__c{i}" for i in range(len(names))])
    return tmp.select(*[F.col(f"__c{i}").alias(names[i]) for i in keep_idx])


def summary_metrics(df: DataFrame) -> dict:
    """X6: the app's header metrics."""
    return {"rows": df.count(), "columns": len(df.columns)}


def csv_bytes(df: DataFrame, limit: int = 100_000) -> bytes:
    """S6: UTF-8 CSV bytes of (a bounded slice of) the frame for the
    download button. Bounded — full exports go through
    ``sources.csv.write_csv`` instead of the driver."""
    return df.limit(limit).toPandas().to_csv(index=False).encode("utf-8")


# --------------------------------------------------------------------------
# Oracle-gated registry entries (driver contract): the app-layer Spark
# operators with fixed parameters so the DuckDB twin can replay them.
# --------------------------------------------------------------------------


def app_any_column_search(spark, sf_dir: str) -> DataFrame:
    """F5 with needle 'ar' over part (hits name/brand/type and the
    stringified numeric columns alike)."""
    from .catalog import load_tables

    part = load_tables(spark, sf_dir, names=("part",))["part"]
    return any_column_contains(part, "ar")


def app_range_filter(spark, sf_dir: str) -> DataFrame:
    """F6/X4 over part.p_retailprice."""
    from .catalog import load_tables

    part = load_tables(spark, sf_dir, names=("part",))["part"]
    return range_filter(part, "p_retailprice", 920.0, 950.0)


def app_top50_cap(spark, sf_dir: str) -> DataFrame:
    """O7 over lineitem.l_suppkey: rows of the 50 most frequent
    suppliers (deterministic tie-break on the key)."""
    from .catalog import load_tables

    l = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    return top_n_filter(l.select("l_orderkey", "l_linenumber", "l_suppkey"), "l_suppkey", 50)


QUERIES = {
    "app_any_column_search": app_any_column_search,
    "app_range_filter": app_range_filter,
    "app_top50_cap": app_top50_cap,
}

ORACLES = {
    "app_any_column_search": """
        SELECT * FROM part
        WHERE coalesce(
            contains(lower(CAST(p_partkey AS VARCHAR)), 'ar')
            OR contains(lower(p_name), 'ar')
            OR contains(lower(p_brand), 'ar')
            OR contains(lower(p_type), 'ar')
            OR contains(lower(CAST(p_size AS VARCHAR)), 'ar')
            OR contains(lower(CAST(p_retailprice AS VARCHAR)), 'ar'),
            FALSE)""",
    "app_range_filter": """
        SELECT * FROM part
        WHERE CAST(p_retailprice AS DOUBLE) >= 920.0
          AND CAST(p_retailprice AS DOUBLE) <= 950.0""",
    "app_top50_cap": """
        SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem
        WHERE l_suppkey IN (
            SELECT l_suppkey FROM lineitem
            GROUP BY l_suppkey
            ORDER BY count(*) DESC, l_suppkey ASC LIMIT 50)""",
}
