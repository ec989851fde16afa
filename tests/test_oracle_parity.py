"""t2-shaped parity: every registered query hash-matches its DuckDB
oracle at sf0.001 (the driver runs the same check at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import __spark_entry__ as entrymod  # noqa: E402
from oracle_check import compare_tables, duckdb_connection  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    spark_tbl = QUERIES[name](spark, sf_dir).toArrow()
    sql = ORACLES.get(name)
    if sql is None:
        assert spark_tbl.num_rows >= 0  # rows-only contract
        return
    oracle_tbl = con.execute(sql).arrow()
    # compare_tables is dtype-strict (Arrow-level): it sees DuckDB's
    # HUGEINT/float promotions that pandas-level comparison hides.
    problems = compare_tables(spark_tbl, oracle_tbl)
    assert not problems, f"{name}: {problems}"

def test_results_independent_of_shuffle_partitioning(spark, sf_dir):
    """The engine's float discipline (integer-cent money, fixed-order
    logprob folds, exact percentiles) makes every result identical at
    ANY shuffle partition count. Run the float-heaviest entries at 8
    and 7 partitions and require bit-identical rows — the probe that
    would catch a partial-aggregation-order-dependent float sum."""
    import __spark_entry__ as entrymod
    from customer_revenue_analysis_sql_tableau_spark.operators.queries import (
        evict_view,
    )

    entries = (
        "view_customer_value_summary",
        "tpch_q1_pricing_summary",
        "text_unigram_logprob",
        "temporal_value_percentiles",
        "text_tfidf_top_terms",
        "rollup_minute",
    )
    q = entrymod.queries()

    def snap(name):
        df = q[name](spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    base = {}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        evict_view(spark, sf_dir)
        for n in entries:
            base[n] = snap(n)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        evict_view(spark, sf_dir)
        for n in entries:
            assert snap(n) == base[n], f"{n} varies with partition count"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        evict_view(spark, sf_dir)
