"""Schema contract: the exact Spark dtypes every operator assumes.

The round-1 driver data drifted to ``timestamp[us]`` (no tz) parquet,
which Spark reads as TIMESTAMP_NTZ — silently breaking ``unix_micros``
and stream watermarks. This test pins the post-``load_tables`` dtypes
so any future testdata drift (or a regression in the catalog's
normalization) fails loudly and immediately.
"""

from __future__ import annotations

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables

#: dtype contract after catalog.load_tables normalization. TIMESTAMP
#: (with local-tz semantics, session tz pinned UTC) — never
#: TIMESTAMP_NTZ, never bigint nanos.
EXPECTED: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_every_table_matches_dtype_contract(spark, sf_dir):
    dfs = load_tables(spark, sf_dir, register=False)
    assert set(dfs) == set(EXPECTED)
    for name, df in dfs.items():
        assert df.dtypes == EXPECTED[name], (
            f"{name}: dtypes drifted — operators assume {EXPECTED[name]}, "
            f"got {df.dtypes}"
        )


def test_no_ntz_or_raw_nanos_survive_load(spark, sf_dir):
    dfs = load_tables(spark, sf_dir, register=False)
    for name, df in dfs.items():
        for col, dtype in df.dtypes:
            assert dtype != "timestamp_ntz", (name, col)
            assert not (col == "ts" and dtype == "bigint"), (name, col)
