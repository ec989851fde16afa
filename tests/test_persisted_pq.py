"""Persisted PQ / IVF-PQ lifecycle (r10 VERDICT Next #4): build-once
codebooks + packed codes, training-free ADC read paths, bit-equality
with the in-process compressed tiers."""

from __future__ import annotations

import pytest

from customer_revenue_analysis_sql_tableau_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def built_pq(spark, sf_dir):
    return sim.sim_pq_index_build(spark, sf_dir).collect()[0]


@pytest.fixture(scope="module")
def built_ivfpq(spark, sf_dir):
    return sim.sim_ivfpq_index_build(spark, sf_dir).collect()[0]


def test_pq_build_summary_invariants(built_pq, spark, sf_dir):
    e = sim.load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    assert built_pq["n_vectors"] == e.count()
    assert built_pq["one_code_per_vector"] is True
    assert built_pq["codes_width_ok"] is True
    assert built_pq["codebook_complete"] is True


def test_ivfpq_build_summary_invariants(built_ivfpq, spark, sf_dir):
    e = sim.load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    assert built_ivfpq["n_vectors"] == e.count()
    assert built_ivfpq["one_code_per_vector"] is True
    assert built_ivfpq["codes_width_ok"] is True
    assert built_ivfpq["codebook_complete"] is True
    assert built_ivfpq["cells_within_geometry"] is True


def test_pq_artifacts_on_disk(built_pq, spark, sf_dir):
    d = sim._pq_index_dir(spark, sf_dir)
    meta = spark.read.parquet(f"{d}/meta").collect()[0]
    books = spark.read.parquet(f"{d}/codebooks")
    codes = spark.read.parquet(f"{d}/codes")
    assert books.count() == meta["m"] * meta["k"] == sim.PQ_M * sim.PQ_K
    assert codes.count() == meta["n_vectors"]
    # the persisted layout is the ~50x story: 10 bytes per vector
    row = codes.limit(1).collect()[0]
    assert len(row["codes"]) == sim.PQ_BYTES


def test_ivfpq_artifacts_cell_partitioned(built_ivfpq, spark, sf_dir):
    d = sim._ivfpq_index_dir(spark, sf_dir)
    meta = spark.read.parquet(f"{d}/meta").collect()[0]
    codes = spark.read.parquet(f"{d}/codes")
    # cell is a real directory-partition column, the pruning unit
    assert "cell" in codes.columns
    cents = spark.read.parquet(f"{d}/centroids")
    assert cents.count() == meta["nlist"]
    assert codes.count() == meta["n_vectors"]


def test_read_paths_never_train(built_pq, built_ivfpq, spark, sf_dir, monkeypatch):
    """The query entries must be pure read paths: with artifacts
    persisted, they must run even when every trainer is unreachable,
    and their plans must carry no Python/Arrow eval stage (encoding
    happened at build time; LUTs are bounded driver-side scalars from
    the PERSISTED quantizers)."""

    def boom(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("read path invoked quantizer training")

    monkeypatch.setattr(sim, "_train_pq_codebooks", boom)
    monkeypatch.setattr(sim, "_train_centroids", boom)
    for fn, marker in (
        (sim.sim_persisted_pq_topk, "pq_index_"),
        (sim.sim_persisted_ivfpq_topk, "ivfpq_index_"),
    ):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert marker in plan
        assert df.count() > 0


def test_persisted_pq_equals_in_process(built_pq, spark, sf_dir):
    """Identical codebooks (float64 parquet round-trip) + the shared
    ADC tail ⇒ the persisted read path must return exactly the
    in-process PQ tier's top-k."""
    a = sorted(map(tuple, sim.sim_persisted_pq_topk(spark, sf_dir).collect()))
    b = sorted(map(tuple, sim.sim_pq_topk(spark, sf_dir).collect()))
    assert a == b


def test_persisted_ivfpq_equals_in_process(built_ivfpq, spark, sf_dir):
    a = sorted(
        map(tuple, sim.sim_persisted_ivfpq_topk(spark, sf_dir).collect())
    )
    b = sorted(map(tuple, sim.sim_ivfpq_topk(spark, sf_dir).collect()))
    assert a == b


def test_persisted_recall_checks_green(built_pq, built_ivfpq, spark, sf_dir):
    from customer_revenue_analysis_sql_tableau_spark.operators import (
        sketch_checks as sc,
    )

    for fn in (
        sc.sim_persisted_pq_recall_check,
        sc.sim_persisted_ivfpq_recall_check,
    ):
        row = fn(spark, sf_dir).collect()[0]
        assert row["recall_ok"] is True
        assert row["n_queries"] == sim.N_QUERIES


def test_torn_pq_build_rebuilds_identically(spark, sf_dir, built_pq):
    """Same crash-consistency rule as the vocab artifacts: a PQ index
    dir without meta is an incomplete build; the read path must
    rebuild (idempotent trainer, same seeds) and answer identically."""
    import shutil

    before = sorted(
        map(tuple, sim.sim_persisted_pq_topk(spark, sf_dir).collect())
    )
    d = sim._pq_index_dir(spark, sf_dir)
    shutil.rmtree(f"{d}/meta".removeprefix("file:"))
    after = sorted(
        map(tuple, sim.sim_persisted_pq_topk(spark, sf_dir).collect())
    )
    assert after == before
    assert spark.read.parquet(f"{d}/meta").count() == 1
