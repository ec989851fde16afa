"""Segment-store lifecycle tail: time-travel reads + GC/VACUUM.

Pins the chain algebra of as-of-version reads over the multi-writer
manifest chain, and the three `expire_snapshots` contract clauses of the
retention pass — including deterministic replay of a torn run (the
completion-marker discipline every persisted dir in this repo uses).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.operators import (
    segment_store as ss,
)


@pytest.fixture(scope="module")
def chain(spark, sf_dir):
    return ss._manifest_chain(spark, sf_dir)


def test_asof_versions_strictly_nest(spark, sf_dir, chain):
    prev = None
    for v in (1, 2, 3):
        cur = {
            r["vec_id"]
            for r in ss.read_index_asof(spark, sf_dir, v)
            .select("vec_id")
            .collect()
        }
        if prev is not None:
            assert prev < cur  # strict: each version adds rows
        prev = cur


def test_asof_counts_match_delivery_split(spark, sf_dir, chain):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m = ss.DELIVERY_MOD
    n_base = e.filter(F.col("vec_id") % m != m - 1).count()
    n_w1 = e.filter(F.col("vec_id") % (2 * m) == m - 1).count()
    assert ss.read_index_asof(spark, sf_dir, 1).count() == n_base
    assert ss.read_index_asof(spark, sf_dir, 2).count() == n_base + n_w1
    assert ss.read_index_asof(spark, sf_dir, 3).count() == e.count()


def test_asof_unknown_version_raises(spark, sf_dir, chain):
    with pytest.raises(ValueError, match="not in chain"):
        ss.read_index_asof(spark, sf_dir, 99)


def test_asof_read_launches_no_driver_jobs_for_listing_or_schema(
    spark, sf_dir, chain
):
    """r15's persisted-read win must stay structural: building the
    as-of reader frame (declared writer-contract schema + driver-side
    file listing via the raised parallelPartitionDiscovery threshold)
    must launch ZERO Spark jobs — no schema-inference footer reads, no
    distributed listing jobs. Planning work only; the first job is the
    query itself."""
    sc = spark.sparkContext
    group = "asof-listing-probe"
    sc.setLocalProperty("spark.jobGroup.id", group)
    try:
        df = ss.read_index_asof(spark, sf_dir, 3)
        _ = df.schema  # forces analysis
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert list(jobs) == [], f"frame build launched jobs: {jobs}"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert df.count() > 0  # the frame is still a real reader


def test_vacuum_contract_and_idempotence(spark, sf_dir):
    a = ss.sim_persisted_vacuum(spark, sf_dir).collect()[0]
    assert a["reader_digest_unchanged"]
    assert a["only_unreferenced_deleted"]
    assert a["manifests_retained"]
    assert a["pinned_reader_fails"]
    # the destructive pass already ran; a second call must only
    # recompute the summary from on-disk state, identically
    b = ss.sim_persisted_vacuum(spark, sf_dir).collect()[0]
    assert a == b


def test_vacuum_expired_artifacts_gone(spark, sf_dir):
    ss.sim_persisted_vacuum(spark, sf_dir)
    root = ss._vacuum_dir(spark, sf_dir).removeprefix("file:")
    assert not os.path.exists(f"{root}/seg_w1")
    assert not os.path.exists(f"{root}/seg_w2")
    for v in (1, 2, 3):
        assert not os.path.exists(f"{root}/manifest_v{v}")
    with open(f"{root}/manifest_v4") as fh:
        assert json.load(fh)["segments"] == ["seg_base", "seg_merged"]


def test_vacuum_torn_run_replays_deterministically(spark, sf_dir):
    first = ss.sim_persisted_vacuum(spark, sf_dir).collect()[0]
    root = ss._vacuum_dir(spark, sf_dir).removeprefix("file:")
    os.remove(f"{root}/vacuum_done")  # rip the completion marker off
    replay = ss.sim_persisted_vacuum(spark, sf_dir).collect()[0]
    assert replay == first
    assert replay["reader_digest_unchanged"]


def test_vacuum_never_touches_shared_chain(spark, sf_dir):
    """The copy-on-write universe must leave the concurrent-ingest /
    merge entries' shared artifacts fully intact."""
    ss.sim_persisted_vacuum(spark, sf_dir)
    d, chain = ss._manifest_chain(spark, sf_dir)
    assert sorted(chain) == [1, 2, 3]
    for seg in ("postings", "insert_delta_w1", "insert_delta_w2"):
        assert (
            spark.read.parquet(ss._segment_postings_path(d, seg)).count() > 0
        )


def test_vacuum_wider_retention_keeps_history(spark, sf_dir, monkeypatch, tmp_path):
    """With a 2-version retention window, v3 still references both
    delta waves, so GC must delete NOTHING and keep manifests v3+v4 —
    the policy generalizes beyond the head-only default."""
    monkeypatch.setattr(ss, "VACUUM_RETAIN_LAST", 2)
    monkeypatch.setattr(
        ss, "_vacuum_dir", lambda spark_, sf: str(tmp_path / "vac2")
    )
    r = ss.sim_persisted_vacuum(spark, sf_dir).collect()[0]
    assert r["reader_digest_unchanged"]
    assert r["only_unreferenced_deleted"]
    assert r["manifests_retained"]
    # nothing was unreferenced, so nothing may fail or vanish
    assert r["pinned_reader_fails"] is False
    root = str(tmp_path / "vac2")
    assert os.path.exists(f"{root}/seg_w1") and os.path.exists(
        f"{root}/seg_w2"
    )
    assert sorted(
        int(f.removeprefix("manifest_v"))
        for f in os.listdir(root)
        if f.startswith("manifest_v")
    ) == [3, 4]


def test_windowed_vacuum_contract_and_idempotence(spark, sf_dir):
    """Retention 2 over the compaction-rewritten chain: intermediate
    version readable with its exact digest, only seg_w1 expired, both
    casualty modes fired."""
    a = ss.sim_persisted_vacuum_window(spark, sf_dir).collect()[0]
    assert a["head_digest_unchanged"]
    assert a["intermediate_asof_readable"]
    assert a["only_unreferenced_deleted"]
    assert a["manifests_retained"]
    assert a["expired_asof_fails"]
    b = ss.sim_persisted_vacuum_window(spark, sf_dir).collect()[0]
    assert a == b


def test_windowed_vacuum_walks_all_retained_versions(spark, sf_dir):
    """Every RETAINED version must stay resolvable post-GC and nest:
    v3 ⊂ v4 (r12 VERDICT Next #3 'pytest walking all retained
    versions')."""
    ss.sim_persisted_vacuum_window(spark, sf_dir)
    prev = None
    for v in (3, 4):
        cur = {
            r["vec_id"]
            for r in ss.read_vacuum2_asof(spark, sf_dir, v)
            .select("vec_id")
            .collect()
        }
        if prev is not None:
            assert prev < cur
        prev = cur
    root = ss._vacuum2_dir(spark, sf_dir).removeprefix("file:")
    assert not os.path.exists(f"{root}/seg_w1")
    for seg in ("seg_base", "seg_m1", "seg_w2"):
        assert os.path.exists(f"{root}/{seg}")
    assert sorted(
        int(f.removeprefix("manifest_v"))
        for f in os.listdir(root)
        if f.startswith("manifest_v") and not f.endswith(".tmp")
    ) == [3, 4]
    for v in (1, 2):
        with pytest.raises(ValueError, match="not in chain"):
            ss.read_vacuum2_asof(spark, sf_dir, v)


def test_windowed_vacuum_torn_run_replays(spark, sf_dir):
    first = ss.sim_persisted_vacuum_window(spark, sf_dir).collect()[0]
    root = ss._vacuum2_dir(spark, sf_dir).removeprefix("file:")
    os.remove(f"{root}/vacuum_done")
    replay = ss.sim_persisted_vacuum_window(spark, sf_dir).collect()[0]
    assert replay == first
    assert replay["head_digest_unchanged"]


def test_read_asof_torn_chain_raises_value_error(spark, sf_dir, monkeypatch):
    """A torn/partial chain must surface the descriptive ValueError
    contract, never a bare KeyError (r12 ADVICE)."""
    d, chain = ss._manifest_chain(spark, sf_dir)

    def torn(spark_, sf):
        return d, {1: chain[1], 3: chain[3]}  # v2 missing

    monkeypatch.setattr(ss, "_manifest_chain", torn)
    with pytest.raises(ValueError, match="not in chain"):
        ss.sim_persisted_read_asof(spark, sf_dir)

    def leaky(spark_, sf):
        return d, {1: chain[1] + ["ghost_seg"], 2: chain[2], 3: chain[3]}

    monkeypatch.setattr(ss, "_manifest_chain", leaky)
    with pytest.raises(ValueError, match="torn manifest chain"):
        ss.sim_persisted_read_asof(spark, sf_dir)
