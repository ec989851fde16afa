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


@pytest.fixture()
def disjoint_table(spark, tmp_path):
    """A 3-month table whose months own DISJOINT key ranges (month m
    holds keys in [m*100000, m*100000+600)) — so CoW file pairs from
    an upsert touching two months form two key-range overlap
    components."""
    from customer_revenue_analysis_sql_tableau_spark.sources.table_api import ManifestTable

    df = spark.range(600).select(
        ((F.col("id") % 3 + 1) * 100000 + F.col("id")).alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.to_timestamp(
            F.concat(
                F.lit("2001-0"),
                (F.col("id") % 3 + 1).cast("string"),
                F.lit("-15"),
            )
        ).alias("ts"),
    )
    return ManifestTable.create(
        spark, df, str(tmp_path / "disjoint"), date_col="ts",
        files_per_month=1,
    )


def test_row_source_rejects_non_append_commit(spark, disjoint_table):
    """The append-only contract is enforced (r14 ADVICE): a commit
    that removed files makes partitions() raise, pointing at the CDF
    source; ignore_changes=true opts back into the old behavior."""
    from customer_revenue_analysis_sql_tableau_spark.sources.manifest_stream_source import (
        ManifestTableStreamReader,
    )

    t = disjoint_table
    src = t.read().filter(F.col("k") % 5 == 0).withColumn(
        "v", F.col("v") + 1.0
    )
    t.upsert(src, key="k")  # v2: CoW — removes files
    rdr = ManifestTableStreamReader({"root": t.root})
    with pytest.raises(ValueError, match="cdf_stream"):
        rdr.partitions({"version": 1}, {"version": 2})
    rdr2 = ManifestTableStreamReader(
        {"root": t.root, "ignore_changes": "true"}
    )
    assert len(rdr2.partitions({"version": 1}, {"version": 2})) > 0


def test_cdf_partitions_split_commit_by_key_range(spark, disjoint_table):
    """A commit whose CoW file pairs live in disjoint key ranges
    classifies in PARALLEL: one partition per overlap component, each
    component holding a month's pre/post pair — and every file of the
    commit is in exactly one partition (nothing dropped, nothing
    duplicated)."""
    from customer_revenue_analysis_sql_tableau_spark.sources.manifest_stream_source import (
        ManifestTableCDFStreamReader,
    )

    t = disjoint_table
    # touch months 01 and 02 only: their key ranges are disjoint
    src = t.read().filter(
        (F.col("k") % 10 == 0)
        & F.col(mt.MONTH_COL).isin("2001-01", "2001-02")
    ).withColumn("v", F.col("v") + 100.0)
    n_src = src.count()
    assert n_src > 0
    t.upsert(src, key="k")  # v2
    added, removed = mt.incremental_files(t.root, 1, 2)
    rdr = ManifestTableCDFStreamReader({"root": t.root, "key": "k"})
    parts = [
        p for p in rdr.partitions({"version": 1}, {"version": 2})
        if p.added or p.removed
    ]
    assert len(parts) == 2, [
        (p.added, p.removed) for p in parts
    ]
    # partition ∝ file-pair locality: each component is single-month
    for p in parts:
        months = {
            rel.split("/", 1)[0] for rel in (p.added + p.removed)
        }
        assert len(months) == 1
    # exact cover of the commit's delta
    got_added = sorted(rel for p in parts for rel in p.added)
    got_removed = sorted(rel for p in parts for rel in p.removed)
    assert got_added == sorted(added)
    assert got_removed == sorted(removed)
