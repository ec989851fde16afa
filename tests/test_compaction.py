"""Small-file compaction (r11): shuffle-free bin-pack, row/content
preservation, layout invariants."""

from __future__ import annotations

import pytest

from customer_revenue_analysis_sql_tableau_spark.sources import compaction as cp


@pytest.fixture(scope="module")
def summary(spark, sf_dir):
    return cp.parquet_compact_small_files(spark, sf_dir).collect()[0]


def test_summary_invariants(summary, spark, sf_dir):
    from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    assert summary["n_rows"] == docs.count()
    assert summary["rows_preserved"] is True
    assert summary["content_preserved"] is True
    assert summary["files_reduced"] is True
    assert summary["target_respected"] is True


def test_compaction_plan_is_shuffle_free(summary, spark, sf_dir):
    """The bin-pack must be a narrow coalesce: no Exchange anywhere in
    the write plan (clustering rewrites are zorder.py's job and pay
    their shuffle deliberately — plain compaction must not)."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    staged = f"{warehouse}/compact_stage_{cp._stage_fingerprint(sf_dir)}"
    df = spark.read.parquet(staged).coalesce(3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Coalesce" in plan


def test_compact_dataset_respects_floor_and_cap(spark, sf_dir, tmp_path):
    """Tiny input packs to exactly 1 file; a target smaller than every
    file still cannot SPLIT (coalesce caps at input partitions)."""
    from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    src = str(tmp_path / "frag")
    docs.limit(20).repartition(8).write.parquet(src)
    dst = str(tmp_path / "packed")
    n = cp.compact_dataset(spark, src, dst, target_bytes=1 << 30)
    assert n == 1
    assert cp._parquet_file_count(dst) == 1
    # pathological 1-byte target: ceil(bytes/1) >> 8 partitions, but
    # the rewrite must stay 1:1 with the 8 inputs, never wider
    dst2 = str(tmp_path / "packed2")
    cp.compact_dataset(spark, src, dst2, target_bytes=1)
    assert cp._parquet_file_count(dst2) <= 8


def test_idempotent_recompaction(summary, spark, sf_dir):
    row = cp.parquet_compact_small_files(spark, sf_dir).collect()[0]
    assert tuple(row) == tuple(summary)
