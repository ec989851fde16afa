"""The manifested table as a streaming SOURCE (r14): commit-chain
offsets, per-file executor partitions, checkpointed exactly-once
resume across drains."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.sources import manifest_table as mt
from customer_revenue_analysis_sql_tableau_spark.sources.manifest_stream_source import (
    register_manifest_stream_source,
    stream_manifest_source_drain,
)


def _drain(spark, root, sink, ckpt):
    register_manifest_stream_source(spark)
    (
        spark.readStream.format("manifest_table_stream")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(sink)


def test_source_drain_whole_delivery_exactly_once(spark, sf_dir):
    from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables

    df = stream_manifest_source_drain(spark, sf_dir)
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    assert df.count() == orders.count()
    assert df.groupBy("o_orderkey").count().filter("count > 1").count() == 0


def test_source_checkpoint_resumes_incrementally(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Drain, append a NEW commit, drain again against the SAME
    checkpoint: the second drain must deliver exactly the new commit's
    rows — then a head-carry (empty) commit streams nothing."""
    import shutil

    stream_manifest_source_drain(spark, sf_dir)  # ensure + warm universe
    shared = mt._stream_append_root(spark, sf_dir).removeprefix("file:")
    clone = str(tmp_path / "src_clone")
    shutil.copytree(shared, clone)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    first = _drain(spark, clone, sink, ckpt)
    n1 = first.count()
    assert n1 > 0

    # a new writer appends v5: shifted copies of a deterministic slice
    head = mt.read_manifested(spark, clone)
    batch = head.filter(F.col("o_orderkey") % 17 == 4).withColumn(
        "o_orderkey", F.col("o_orderkey") + 9_000_000
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    n_new = batch.count()
    assert n_new > 0
    mt.publish_stream_append_batch(clone, batch, 3)  # -> version 5

    second = _drain(spark, clone, sink, ckpt)
    assert second.count() == n1 + n_new  # exactly the delta, once
    assert second.filter(F.col("o_orderkey") >= 9_000_000).count() == n_new
    assert (
        second.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    )

    # a head-carry commit (empty batch) streams zero rows
    empty = batch.limit(0)
    mt.publish_stream_append_batch(clone, empty, 4)  # -> version 6
    third = _drain(spark, clone, sink, ckpt)
    assert third.count() == n1 + n_new


def test_source_start_version_option(spark, sf_dir, tmp_path):
    """start_version skips history: starting at v2 streams only the
    commits AFTER it (batches 2 and 3 of the delivery)."""
    stream_manifest_source_drain(spark, sf_dir)
    root = mt._stream_append_root(spark, sf_dir)
    register_manifest_stream_source(spark)
    sink, ckpt = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    (
        spark.readStream.format("manifest_table_stream")
        .option("root", root)
        .option("start_version", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(sink)
    want = mt.read_manifested(spark, root).filter(
        F.col("o_orderkey") % mt.STREAM_APPEND_BATCHES != 0
    )
    assert got.count() == want.count()
    assert got.select("o_orderkey").exceptAll(
        want.select("o_orderkey")
    ).count() == 0


def _drain_cdf(spark, root, sink, ckpt):
    register_manifest_stream_source(spark)
    (
        spark.readStream.format("manifest_table_cdf_stream")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(sink)


def test_cdf_stream_checkpoint_resumes_and_optimize_is_silent(
    spark, sf_dir, tmp_path
):
    """Drain the merge chain's CDF, then land (a) an OPTIMIZE commit —
    which must stream NOTHING — and (b) a fresh upsert commit, whose
    classified changes alone arrive on the re-drain."""
    from customer_revenue_analysis_sql_tableau_spark.sources.manifest_stream_source import (
        stream_manifest_cdf_drain,
    )
    import shutil

    stream_manifest_cdf_drain(spark, sf_dir)  # ensure + warm universe
    shared = mt._stream_merge_root(spark, sf_dir).removeprefix("file:")
    clone = str(tmp_path / "cdf_clone")
    shutil.copytree(shared, clone)
    sink, ckpt = str(tmp_path / "cdfsink"), str(tmp_path / "cdfckpt")

    first = _drain_cdf(spark, clone, sink, ckpt)
    n1 = first.count()
    assert n1 > 0
    assert set(
        r["_commit_version"]
        for r in first.select("_commit_version").distinct().collect()
    ) == {2, 3, 4}

    # (a) OPTIMIZE: content-neutral rewrite of one month — silent
    head_v = mt.manifest_versions(clone)[-1]
    head = mt.resolve_manifest(clone)
    m = sorted(head["files"])[0]
    packed = mt.pack_partition_files(
        spark, clone, m, head["files"][m], head_v + 1
    )
    mt.commit_transaction(clone, head_v, {m: head["files"][m]}, {m: packed})
    second = _drain_cdf(spark, clone, sink, ckpt)
    assert second.count() == n1  # nothing streamed for the rewrite

    # (b) a fresh upsert batch: its changes alone arrive
    batch = (
        mt.read_manifested(spark, clone)
        .filter(F.col("o_orderkey") % 23 == 7)
        .withColumn("o_totalprice", F.col("o_totalprice") + 13.0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )
    n_upd = batch.count()
    assert n_upd > 0
    # version = batch_id + 2, so batch_id = head_v lands v{head_v + 2}
    # right after the optimize's v{head_v + 1} — no chain hole
    mt.publish_stream_merge_batch(spark, clone, batch, head_v)
    third = _drain_cdf(spark, clone, sink, ckpt)
    new_rows = third.filter(F.col("_commit_version") == head_v + 2)
    assert third.count() == n1 + 2 * n_upd  # pre+post pair per update
    assert new_rows.filter(
        F.col("_change_type") == "update_postimage"
    ).count() == n_upd
    assert new_rows.filter(
        F.col("_change_type") == "update_preimage"
    ).count() == n_upd
    assert new_rows.filter(
        F.col("_change_type").isin("insert", "delete")
    ).count() == 0
