"""STREAMING maintenance of the persisted IVF index — the families'
junction point: a Structured Streaming job continuously ingests
embedding deliveries into the persisted index as insert-delta
segments, and the BACKGROUND-COMPACTION SCHEDULING POLICY
(``MERGE_TRIGGER_SEGMENTS``, the piece SCALE.md names as the last
lifecycle gap) is evaluated per micro-batch against the ON-DISK
manifest state — exactly how a production index-maintenance service
runs (a foreachBatch ingest loop + a fold triggered by segment-count
pressure, the public Delta/Iceberg "optimize when small-file count
exceeds N" recipe).

Shape of the run (deterministic, so the drain is driver-hashable):
the delivery (``vec_id % DELIVERY_MOD == DELIVERY_MOD-1``, the same
split every incremental tier uses) is staged as three mtime-ordered
files and drained one file per micro-batch (``maxFilesPerTrigger=1``,
availableNow). Each batch is assigned to the PERSISTED base centroids
(the one Arrow stage — ingest-side, like the build) and committed as
a cell-partitioned ``delta_b{n}`` segment with its meta row written
LAST; the policy then counts PENDING (un-folded) segments on disk and
folds once the count reaches ``MERGE_TRIGGER_SEGMENTS`` — so with
three batches and a trigger of two, the fold fires exactly once,
inside batch 1, folding b0+b1 into ``merged_v2`` and leaving b2
pending at end-of-stream. Only delta-TOUCHED cells are rewritten
(merge I/O ∝ touched-cell rows, never index size); the versioned
manifest is written last and certifies the fold.

The maintained index is the 100 TB story told end-to-end: base
segments immutable, stream deltas bounded by delivery size, folds
bounded by touched cells, and the READ PATH (
:func:`stream_maintained_index_topk`) entirely JVM-side — broadcast
centroids, HOF ℓ² probe ranking, equi-join on cell with the untouched
base taken from v1 and touched cells from v2, pending deltas unioned
in. pytest asserts the read plan is Python-eval-free and its answers
are bit-identical to a flat reader over base ∪ all deltas.

Reference parity note: the reference (customer-revenue-analysis-sql-
tableau) is batch MySQL/Tableau with no streaming or ANN surface;
this module belongs to the driver's LLM-data-pipeline mandate, not
the reference port.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_tables
from ..lake_core import atomic_write_json, content_digest, read_json
from ..operators.similarity import (
    DELIVERY_MOD,
    MERGE_TRIGGER_SEGMENTS,
    N_QUERIES,
    TOP_K,
    _ivf_index_dir,
    _probe_and_rank,
    sim_persisted_ingest_delta,
)

#: The delivery is staged as this many mtime-ordered files, drained
#: one per micro-batch. With MERGE_TRIGGER_SEGMENTS = 2 the fold
#: fires exactly once (inside batch 1) and batch 2 stays pending.
N_STREAM_BATCHES = 3


def _seg_order(name: str):
    """Order segment names by their NUMERIC batch id — lexicographic
    order misfiles ``delta_b10`` before ``delta_b2`` once a stream
    passes ten micro-batches (same for ``tomb_b*``)."""
    prefix, _, bid = name.rpartition("_b")
    return (prefix, int(bid))


def _streamed_dir(spark: SparkSession, sf_dir: str) -> str:
    """The maintained index instance's directory (content-fingerprinted
    like every persisted-index dir, so regenerated fixtures rebuild)."""
    return f"{_ivf_index_dir(spark, sf_dir)}_streamed"


def _base_dir(spark: SparkSession, sf_dir: str) -> str:
    return f"{_ivf_index_dir(spark, sf_dir)}_base"


def _apply_fold(
    spark: SparkSession, view: DataFrame, store_dir: str, version: int
) -> DataFrame:
    """ONE fold application — the reader algebra every maintained view
    in this module is built from (r12 VERDICT Next #4: one definition,
    not five inline copies): drop the fold's touched cells from the
    view (its manifest lists them), union the fold's rewritten
    postings. Applied in version order, later folds win their cells."""
    man = spark.read.parquet(f"{store_dir}/merged_v{version}/manifest")
    return view.join(
        F.broadcast(man.select("cell")), "cell", "left_anti"
    ).unionByName(
        spark.read.parquet(f"{store_dir}/merged_v{version}/postings").select(
            "cell", "vec_id", "v"
        )
    )


def _ensure_streamed_index(
    spark: SparkSession,
    sf_dir: str,
    sdir: str | None = None,
    retention: bool = False,
) -> tuple[str, str]:
    """Idempotently run the maintenance stream; return (streamed_dir,
    base_dir). The ``final_manifest`` is written LAST (the completion
    marker — same crash-consistency discipline as every segment: a
    torn run has no manifest and re-enters the whole stream, whose
    per-segment ``overwrite`` writes make replay idempotent).

    With ``retention=True`` (r12 VERDICT Next #5) the GC policy runs as
    a SCHEDULED per-batch step inside the maintenance loop, not a
    manual pass: after every micro-batch's commit+fold evaluation, the
    policy re-reads the ON-DISK manifest state, deletes any delta
    segment a manifest-committed merge has folded, and commits the
    batch's tally as an atomic ``gc_b{n}`` JSON (written even when
    empty — the policy provably evaluated every batch). Deterministic
    trigger: folded ⇒ collectable, so with 3 batches and fold trigger 2
    the tallies are exactly (0, 2, 0). Retention instances run in their
    own ``sdir`` so the default instance keeps its full as-of history."""
    import shutil
    import tempfile

    from pyspark.errors import AnalysisException

    d = _base_dir(spark, sf_dir)
    if sdir is None:
        sdir = _streamed_dir(spark, sf_dir)
    try:
        spark.read.parquet(f"{sdir}/final_manifest").collect()
        return sdir, d
    except AnalysisException:
        pass

    # ensure the shared immutable base index (centroids + postings +
    # geometry meta) exists; its artifacts are never rewritten here
    sim_persisted_ingest_delta(spark, sf_dir).collect()
    pc = spark.read.parquet(f"{d}/centroids").orderBy("cell").collect()
    pmat = np.array([r["cv"] for r in pc])
    pnorm = (pmat**2).sum(axis=1)
    nlist = int(
        spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]["nlist"]
    )

    @pandas_udf("int")
    def cell_of_persisted(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())
        d2 = (
            (m**2).sum(axis=1)[:, None] - 2.0 * (m @ pmat.T) + pnorm[None, :]
        )
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    base_postings = spark.read.parquet(f"{d}/postings").select(
        "vec_id", "v", "cell"
    )

    def pending_segments() -> list[str]:
        """The scheduling policy's input, read from DISK state: delta
        segments with a committed meta row, minus those folded per the
        existing merge manifests — what a production scheduler (a
        separate process) would see."""
        import glob
        import os

        root = sdir.removeprefix("file:")
        committed = sorted(
            (
                os.path.basename(os.path.dirname(p))
                for p in glob.glob(f"{root}/delta_b*/meta")
            ),
            key=_seg_order,
        )
        # a fold's commit point is its MANIFEST (written last): a
        # folded-list left by a torn fold must not hide its segments
        # from the policy (tests/test_streamed_index.py rips the
        # manifest off and asserts the replay re-folds)
        folded: set[str] = set()
        for v in merged_versions():
            for r in spark.read.parquet(
                f"{sdir}/merged_v{v}/folded"
            ).collect():
                folded.add(r["segment"])
        return [s for s in committed if s not in folded]

    def merged_versions() -> list[int]:
        import glob
        import os

        root = sdir.removeprefix("file:")
        return sorted(
            int(os.path.basename(os.path.dirname(p)).removeprefix("merged_v"))
            for p in glob.glob(f"{root}/merged_v*/manifest")
        )

    def current_view() -> DataFrame:
        """Reader view of the maintained index WITHOUT pending deltas:
        base cells untouched by any fold, plus each fold's postings —
        folds touch disjoint cell sets only if deltas do, so apply
        manifests in version order (later versions win their cells)."""
        view = base_postings
        for v in merged_versions():
            view = _apply_fold(spark, view, sdir, v)
        return view

    def gc_folded_segments(batch_id: int) -> None:
        """The scheduled retention step: evaluated EVERY batch against
        the on-disk manifest state (what a separate GC service would
        see) — delete delta segments a manifest-committed merge has
        folded, tally committed atomically per batch."""
        import os

        root = sdir.removeprefix("file:")
        folded: set[str] = set()
        for v in merged_versions():
            for r in spark.read.parquet(
                f"{sdir}/merged_v{v}/folded"
            ).collect():
                folded.add(r["segment"])
        deleted = sorted(
            (s for s in folded if os.path.exists(f"{root}/{s}")),
            key=_seg_order,
        )
        for s in deleted:
            shutil.rmtree(f"{root}/{s}", ignore_errors=True)
        atomic_write_json(f"{root}/gc_b{batch_id}", {"deleted": deleted})

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():  # availableNow can add a trailing no-op
            return
        seg = f"delta_b{batch_id}"
        batch_df.withColumn(
            "cell", cell_of_persisted(F.col("v"))
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{sdir}/{seg}/postings"
        )
        # meta LAST: commits the segment
        spark.createDataFrame(
            [(seg,)], "segment string"
        ).write.mode("overwrite").parquet(f"{sdir}/{seg}/meta")

        pending = pending_segments()
        if len(pending) < MERGE_TRIGGER_SEGMENTS:
            if retention:
                gc_folded_segments(batch_id)
            return
        # compaction: fold the pending stack into the next version,
        # rewriting only delta-touched cells of the current view
        ver = (merged_versions() or [1])[-1] + 1
        deltas = [
            spark.read.parquet(f"{sdir}/{s}/postings").select(
                "cell", "vec_id", "v"
            )
            for s in pending
        ]
        delta_all = deltas[0]
        for extra in deltas[1:]:
            delta_all = delta_all.unionByName(extra)
        touched = [
            int(r["cell"])
            for r in delta_all.select("cell").distinct().collect()
        ]  # bounded by nlist — a driver-side literal, like centroids
        current_view().filter(F.col("cell").isin(touched)).unionByName(
            delta_all
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{sdir}/merged_v{ver}/postings"
        )
        spark.createDataFrame(
            [(s,) for s in pending], "segment string"
        ).write.mode("overwrite").parquet(f"{sdir}/merged_v{ver}/folded")
        # manifest LAST: commits the fold
        spark.createDataFrame(
            [(int(c), int(ver)) for c in touched], "cell int, version int"
        ).write.mode("overwrite").parquet(f"{sdir}/merged_v{ver}/manifest")
        if retention:  # the fold this batch committed is collectable NOW
            gc_folded_segments(batch_id)

    tmp = tempfile.mkdtemp(prefix="stream_index_maint_")
    try:
        import glob
        import os
        import time

        e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
        delivery = e.filter(
            F.col("vec_id") % DELIVERY_MOD == DELIVERY_MOD - 1
        ).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        src = f"{tmp}/src"
        base_ts = time.time() - 1000
        seen: set[str] = set()
        for k in range(N_STREAM_BATCHES):
            delivery.filter(
                F.col("vec_id") % N_STREAM_BATCHES == k
            ).coalesce(1).write.mode("append").parquet(src)
            for f in glob.glob(f"{src}/part-*.parquet"):
                if f not in seen:
                    seen.add(f)
                    os.utime(f, (base_ts + k * 10, base_ts + k * 10))
        (
            spark.readStream.schema("vec_id bigint, v array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # final manifest LAST: names every segment's end-of-stream status
    rows = [(s, "pending") for s in pending_segments()]
    for v in merged_versions():
        for r in spark.read.parquet(f"{sdir}/merged_v{v}/folded").collect():
            rows.append((r["segment"], f"merged_v{v}"))
    spark.createDataFrame(
        sorted(rows, key=lambda r: _seg_order(r[0])),
        "segment string, status string",
    ).write.mode("overwrite").parquet(f"{sdir}/final_manifest")
    return sdir, d


def _maintained_reader_postings(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, str, str]:
    """The maintained index's full reader view (folds applied in
    version order + pending deltas unioned in) — pure reads, no
    training, no Python eval. Returns (view, streamed_dir, base_dir)."""
    sdir, d = _ensure_streamed_index(spark, sf_dir)
    final = spark.read.parquet(f"{sdir}/final_manifest").collect()
    view = spark.read.parquet(f"{d}/postings").select("cell", "vec_id", "v")
    versions = sorted(
        {
            int(r["status"].removeprefix("merged_v"))
            for r in final
            if r["status"].startswith("merged_v")
        }
    )
    for v in versions:
        view = _apply_fold(spark, view, sdir, v)
    for r in final:
        if r["status"] == "pending":
            view = view.unionByName(
                spark.read.parquet(f"{sdir}/{r['segment']}/postings").select(
                    "cell", "vec_id", "v"
                )
            )
    return view, sdir, d


def stream_index_maintenance_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drain the delivery through the streaming ingest + scheduled-
    compaction loop (module docstring); return an oracle-backed
    summary recomputed from the PERSISTED artifacts: the exact
    delivery row count, batch/fold/pending tallies, and three
    invariants — the maintained reader view's live vector set equals
    base ∪ delivery exactly, fold I/O stayed bounded to touched
    cells, and no streamed row's cell escaped the trained geometry."""
    sdir, d = _ensure_streamed_index(spark, sf_dir)
    final = spark.read.parquet(f"{sdir}/final_manifest").collect()
    segs = sorted(r["segment"] for r in final)
    pending = [r["segment"] for r in final if r["status"] == "pending"]
    versions = sorted(
        {
            int(r["status"].removeprefix("merged_v"))
            for r in final
            if r["status"].startswith("merged_v")
        }
    )
    delta_all = None
    for s in segs:
        p = spark.read.parquet(f"{sdir}/{s}/postings").select(
            "cell", "vec_id", "v"
        )
        delta_all = p if delta_all is None else delta_all.unionByName(p)
    nlist = int(
        spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]["nlist"]
    )
    n_delivery = delta_all.count()
    cells_ok = delta_all.agg(
        ((F.min("cell") >= 0) & (F.max("cell") < F.lit(nlist)))
    ).collect()[0][0]

    base = spark.read.parquet(f"{d}/postings").select("cell", "vec_id", "v")
    view, _sdir, _d = _maintained_reader_postings(spark, sf_dir)
    expected = base.select("vec_id").unionByName(delta_all.select("vec_id"))
    lost = expected.join(view.select("vec_id"), "vec_id", "left_anti").count()
    invented = (
        view.select("vec_id").join(expected, "vec_id", "left_anti").count()
    )

    # I/O-bound invariant, walked along the version chain: fold v's
    # input is the READER VIEW AT v-1 (v1 base for the first fold,
    # earlier merges applied for later ones — a chained fold's touched
    # cells may overlap a previous fold's), so each merged segment
    # must hold exactly that view's touched-cell rows + its folded
    # delta rows (the multi-fold pytest caught the naive base-only
    # check rejecting correct chained folds)
    io_bounded = True
    prev_view = base
    for v in versions:
        man = spark.read.parquet(f"{sdir}/merged_v{v}/manifest")
        folded = {
            r["segment"]
            for r in spark.read.parquet(
                f"{sdir}/merged_v{v}/folded"
            ).collect()
        }
        folded_rows = None  # recompute the fold's exact inputs
        for s in sorted(folded):
            p = spark.read.parquet(f"{sdir}/{s}/postings").select(
                "cell", "vec_id", "v"
            )
            folded_rows = (
                p if folded_rows is None else folded_rows.unionByName(p)
            )
        n_prev_touched = prev_view.join(
            F.broadcast(man.select("cell")), "cell", "left_semi"
        ).count()
        merged_p = spark.read.parquet(f"{sdir}/merged_v{v}/postings")
        if merged_p.count() != n_prev_touched + folded_rows.count():
            io_bounded = False
        prev_view = _apply_fold(spark, prev_view, sdir, v)

    return spark.createDataFrame(
        [
            (
                int(n_delivery),
                int(len(segs)),
                int(len(versions)),
                int(len(pending)),
                bool(lost == 0 and invented == 0),
                bool(io_bounded),
                bool(cells_ok),
            )
        ],
        "n_delivery bigint, n_batches bigint, compactions_triggered bigint,"
        " pending_after bigint, live_set_preserved boolean,"
        " merge_io_bounded boolean, cells_within_geometry boolean",
    )


def stream_maintained_index_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-k over the STREAM-MAINTAINED index — the read path a query
    service runs while the ingest loop keeps committing segments:
    untouched cells from the v1 base, folded cells from the latest
    merge, pending deltas unioned in, then the shared pure-JVM probe
    tail (broadcast centroids, HOF ℓ², equi-join on cell, exact-cosine
    re-rank). No training, no Python eval (pytest asserts the plan);
    rows-only under the driver with ``stream_maintained_recall_check``
    as its hash-green bound twin."""
    view, sdir, d = _maintained_reader_postings(spark, sf_dir)
    cent_df = spark.read.parquet(f"{d}/centroids")
    nprobe = int(
        spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]["nprobe"]
    )
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return _probe_and_rank(cent_df, nprobe, queries, view, self_exclude=True)


def stream_flat_stack_index_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference tier for ``stream_maintained_equiv_check``: the SAME
    probe tail over the FLAT segment stack — base ∪ every delta
    segment, fold manifests ignored. Compaction must never change an
    answer, so this must return :func:`stream_maintained_index_topk`'s
    rows bit-for-bit (the pytest twin in tests/test_streamed_index.py;
    the registered equivalence entry makes it driver-visible). Not a
    production path — a reader would never skip the folds it paid for —
    so it is not itself registered."""
    sdir, d = _ensure_streamed_index(spark, sf_dir)
    flat = spark.read.parquet(f"{d}/postings").select("cell", "vec_id", "v")
    for k in range(N_STREAM_BATCHES):
        flat = flat.unionByName(
            spark.read.parquet(f"{sdir}/delta_b{k}/postings").select(
                "cell", "vec_id", "v"
            )
        )
    cent_df = spark.read.parquet(f"{d}/centroids")
    nprobe = int(
        spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]["nprobe"]
    )
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return _probe_and_rank(cent_df, nprobe, queries, flat, self_exclude=True)


def _fold_applied_view(
    spark: SparkSession, store_dir: str, base_dir: str, delta_names: list[str]
) -> DataFrame:
    """The fold-application reader algebra, parameterized by store dir
    and visible delta set: manifest-committed folds whose folded set
    the deltas cover, applied in version order over the base, then the
    unfolded deltas still present on disk unioned in. Each fold's
    ``folded`` manifest is read ONCE. Serves the as-of reader and the
    vacuumed-clone head reader; ``_maintained_reader_postings`` stays
    on the ``final_manifest`` deliberately — it is the end-of-stream
    source of truth, these two resolve from raw store state."""
    import glob
    import os

    root = store_dir.removeprefix("file:")
    folds: dict[int, set[str]] = {}
    for p in glob.glob(f"{root}/merged_v*/manifest"):
        v = int(os.path.basename(os.path.dirname(p)).removeprefix("merged_v"))
        folded = {
            r["segment"]
            for r in spark.read.parquet(
                f"{store_dir}/merged_v{v}/folded"
            ).collect()
        }
        if folded <= set(delta_names):
            folds[v] = folded
    view = spark.read.parquet(f"{base_dir}/postings").select(
        "cell", "vec_id", "v"
    )
    folded_all: set[str] = set()
    for v in sorted(folds):
        view = _apply_fold(spark, view, store_dir, v)
        folded_all |= folds[v]
    for s in delta_names:
        if s not in folded_all and os.path.exists(f"{root}/{s}/postings"):
            view = view.unionByName(
                spark.read.parquet(f"{store_dir}/{s}/postings").select(
                    "cell", "vec_id", "v"
                )
            )
    return view


def read_streamed_index_asof(
    spark: SparkSession, sf_dir: str, batch_id: int
) -> DataFrame:
    """AS-OF-BATCH read over the STREAM-maintained index — the
    streaming twin of ``segment_store.read_index_asof``: the state a
    reader saw after micro-batch ``batch_id`` committed, reconstructed
    from immutable on-disk artifacts alone. Resolution: delta segments
    ``delta_b0..b{batch_id}`` (meta-committed), folds whose folded set
    is contained in those deltas (a fold commits INSIDE the batch that
    trips the trigger), remaining deltas pending. Every historical
    batch state stays reconstructible for free until VACUUM-style
    retention removes folded segments."""
    import glob
    import os

    sdir, d = _ensure_streamed_index(spark, sf_dir)
    root = sdir.removeprefix("file:")
    have = {
        os.path.basename(os.path.dirname(p))
        for p in glob.glob(f"{root}/delta_b*/meta")
    }
    upto = [f"delta_b{k}" for k in range(batch_id + 1)]
    if not set(upto) <= have:
        raise ValueError(
            f"batch {batch_id} not in the committed stream"
            f" (have: {sorted(have, key=_seg_order)})"
        )
    return _fold_applied_view(spark, sdir, d, upto)


def stream_index_asof_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TRAVEL entry for the stream-maintained index: pin the
    batch-state algebra from the persisted artifacts. One tagged pass
    over base + every delta segment yields per-segment counts and the
    disjointness/uniqueness facts; the as-of-batch live counts follow
    (DuckDB recomputes each from the delivery's deterministic
    ``vec_id % N_STREAM_BATCHES`` batch split), and the fold-applied
    as-of reader at the fold batch is digest-compared against the flat
    base + delta stack — compaction must be invisible to every
    historical read, not just the head."""
    from ..operators.segment_store import segment_union_stats

    sdir, d = _ensure_streamed_index(spark, sf_dir)
    segs = [f"delta_b{k}" for k in range(N_STREAM_BATCHES)]
    n, disjoint = segment_union_stats(
        spark,
        [("base", spark.read.parquet(f"{d}/postings"))]
        + [(s, spark.read.parquet(f"{sdir}/{s}/postings")) for s in segs],
    )
    n_asof = [
        n["base"] + sum(n[f"delta_b{j}"] for j in range(b + 1))
        for b in range(N_STREAM_BATCHES)
    ]

    # fold-applied as-of reader vs the flat stack, at the first batch
    # whose state has a committed fold (batch 1 in this configuration).
    # The digest covers the vector column v, not just (vec_id, cell) —
    # a fold that corrupted vector VALUES must flip it (r12 ADVICE,
    # matching sim_persisted_vacuum's value-level guarantee).
    fold_b = MERGE_TRIGGER_SEGMENTS - 1
    folded_view = read_streamed_index_asof(spark, sf_dir, fold_b)
    flat = spark.read.parquet(f"{d}/postings").select("cell", "vec_id", "v")
    for k in range(fold_b + 1):
        flat = flat.unionByName(
            spark.read.parquet(f"{sdir}/delta_b{k}/postings").select(
                "cell", "vec_id", "v"
            )
        )
    a = content_digest(folded_view, ("vec_id", "cell", "v"))
    b_ = content_digest(flat, ("vec_id", "cell", "v"))
    return spark.createDataFrame(
        [
            (
                *[int(x) for x in n_asof],
                bool(disjoint),
                bool(a == b_),
            )
        ],
        "n_asof_b0 bigint, n_asof_b1 bigint, n_asof_b2 bigint,"
        " batches_disjoint boolean, folded_reader_equals_flat boolean",
    )


def stream_index_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GC for the STREAM-maintained segment store — the streaming twin
    of ``segment_store.sim_persisted_vacuum``: a long-running ingest
    loop accumulates folded delta segments forever (kept so invariants
    and as-of-batch reads can replay); the retention pass deletes the
    segments already folded into a MANIFEST-COMMITTED merge, keeping
    the merged bases and every pending delta. Contract proven from the
    on-disk post-state: the head reader's answers are bit-unchanged
    (untouched base cells + merge + pending never referenced the
    folded originals), only manifest-folded segments were removed,
    pending segments are intact — and the documented casualty is
    pinned: an as-of-batch read PREDATING the fold now fails loudly
    (its pre-fold delta is gone — the ``expire_snapshots`` trade).

    Runs in a copy-on-write clone of the streamed dir (the shared
    instance keeps its full history for the other entries); the clone
    is an os-level file copy — segments are immutable, so a byte copy
    is a valid store. Completion marker written LAST; torn runs replay
    deterministically. Scale posture: the pass reads manifests and
    deletes directories — O(#segments) metadata, no data scan; the
    digests in the summary are proof cost."""
    import os
    import shutil

    sdir, d = _ensure_streamed_index(spark, sf_dir)
    root = sdir.removeprefix("file:")
    vroot = f"{root}_vacuumed"
    vdir = f"{sdir}_vacuumed"
    marker = f"{vroot}/vacuum_done"

    def merged_versions(r: str) -> list[int]:
        import glob

        return sorted(
            int(os.path.basename(os.path.dirname(p)).removeprefix("merged_v"))
            for p in glob.glob(f"{r}/merged_v*/manifest")
        )

    def head_reader(at: str) -> DataFrame:
        """Untouched base cells + folds in version order + pending —
        the shared fold-application algebra, parameterized by store
        dir (the `_fold_applied_view` existence check is what lets the
        vacuumed clone, whose folded deltas are gone, still resolve)."""
        return _fold_applied_view(
            spark, at, d, [f"delta_b{k}" for k in range(N_STREAM_BATCHES)]
        )

    dig_cols = ("vec_id", "cell", "v")

    def dig(df: DataFrame):
        # covers the vector column v (r12 ADVICE): a copy or fold that
        # corrupted vector values must flip the digest
        return content_digest(df, dig_cols)

    # a clone whose pre-digest predates the column set (or lacks the
    # tag) is stale — re-stage rather than compare incompatible digests
    if os.path.exists(marker) and read_json(f"{vroot}/digest_pre").get(
        "cols"
    ) != list(dig_cols):
        shutil.rmtree(vroot)
    if not os.path.exists(marker):
        if os.path.exists(vroot):
            shutil.rmtree(vroot)  # torn clone: re-stage deterministically
        shutil.copytree(root, vroot)
        n_pre, d_pre = dig(head_reader(vdir))
        atomic_write_json(
            f"{vroot}/digest_pre",
            {"n": n_pre, "dig": d_pre, "cols": list(dig_cols)},
        )
        folded: set[str] = set()
        for v in merged_versions(vroot):
            folded |= {
                r["segment"]
                for r in spark.read.parquet(
                    f"{vdir}/merged_v{v}/folded"
                ).collect()
            }
        for s in sorted(folded, key=_seg_order):
            shutil.rmtree(f"{vroot}/{s}", ignore_errors=True)
        # completion marker LAST
        atomic_write_json(
            marker, {"deleted": sorted(folded, key=_seg_order)}
        )

    deleted = read_json(marker)["deleted"]
    pre = read_json(f"{vroot}/digest_pre")
    n_post, d_post = dig(head_reader(vdir))
    folded_now: set[str] = set()
    for v in merged_versions(vroot):
        folded_now |= {
            r["segment"]
            for r in spark.read.parquet(f"{vdir}/merged_v{v}/folded").collect()
        }
    all_deltas = {f"delta_b{k}" for k in range(N_STREAM_BATCHES)}
    remaining = {s for s in all_deltas if os.path.exists(f"{vroot}/{s}")}
    only_folded = (
        set(deleted) == folded_now and remaining == all_deltas - folded_now
    )
    pending_intact = all(
        os.path.exists(f"{vroot}/{s}/postings")
        and os.path.exists(f"{vroot}/{s}/meta")
        for s in remaining
    )
    # the documented casualty: a pre-fold as-of read needs a folded
    # delta that GC removed (ANY failure satisfies the contract —
    # shared broad probe, r12 ADVICE)
    from ..operators.segment_store import _pinned_read_fails

    prefold_fails = _pinned_read_fails(spark, f"{vdir}/delta_b0/postings")
    return spark.createDataFrame(
        [
            (
                int(n_post),
                bool(n_post == pre["n"] and d_post == pre["dig"]),
                bool(only_folded),
                bool(pending_intact),
                bool(prefold_fails),
            )
        ],
        "n_live bigint, reader_digest_unchanged boolean,"
        " only_folded_deleted boolean, pending_intact boolean,"
        " asof_prefold_fails boolean",
    )


def _gc_instance_dir(spark: SparkSession, sf_dir: str) -> str:
    """The scheduled-retention instance's own store (the default
    instance keeps its full history for the as-of entries)."""
    return f"{_streamed_dir(spark, sf_dir)}_gc"


def stream_index_retention_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCHEDULED retention (r12 VERDICT Next #5): the GC policy folded
    into the per-batch maintenance loop the way compaction already is —
    each micro-batch evaluates retention against the on-disk manifest
    state and commits an atomic per-batch tally, instead of a one-shot
    manual vacuum pass. With the deterministic schedule (3 batches,
    fold trigger 2) the tallies are pinned: batch 0 collects nothing,
    batch 1 collects exactly the two deltas its own fold just
    manifest-committed, batch 2 nothing (already collected).

    The summary recomputes the contract from the PERSISTED post-state:
    exact delivery count, the pinned per-batch tallies, the head
    reader's live vector set equal to base ∪ delivery exactly, every
    surviving vector's VALUE bit-equal to its source embedding (the
    value-level check — GC must never corrupt a payload), the pending
    delta intact with its meta, and the folded deltas gone from disk.

    Scale posture: the scheduled step is O(#segments) driver metadata
    per batch — folded-set resolution from KB manifests + directory
    deletes; no data scan rides the ingest loop."""
    sdir, d = _ensure_streamed_index(
        spark, sf_dir, sdir=_gc_instance_dir(spark, sf_dir), retention=True
    )
    root = sdir.removeprefix("file:")
    tallies = [
        len(read_json(f"{root}/gc_b{k}")["deleted"])
        for k in range(N_STREAM_BATCHES)
    ]
    all_deltas = [f"delta_b{k}" for k in range(N_STREAM_BATCHES)]
    view = _fold_applied_view(spark, sdir, d, all_deltas)

    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    src = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    n_delivery = e.filter(
        F.col("vec_id") % DELIVERY_MOD == DELIVERY_MOD - 1
    ).count()
    # live set = base ∪ delivery = the WHOLE corpus (by construction of
    # the delivery split); value-level: every surviving v bit-equals
    # its source embedding
    j = view.join(src, "vec_id", "full").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("v").isNull() | F.col("ev").isNull()).cast("int")
        ).alias("set_mismatch"),
        F.sum((F.col("v") != F.col("ev")).cast("int")).alias(
            "value_mismatch"
        ),
    ).collect()[0]
    import os

    pending_intact = os.path.exists(
        f"{root}/delta_b{N_STREAM_BATCHES - 1}/postings"
    ) and os.path.exists(f"{root}/delta_b{N_STREAM_BATCHES - 1}/meta")
    folded_deleted = not any(
        os.path.exists(f"{root}/delta_b{k}")
        for k in range(MERGE_TRIGGER_SEGMENTS)
    )
    return spark.createDataFrame(
        [
            (
                int(n_delivery),
                *[int(t) for t in tallies],
                bool(j["set_mismatch"] == 0),
                bool(j["value_mismatch"] == 0),
                bool(pending_intact),
                bool(folded_deleted),
            )
        ],
        "n_delivery bigint, n_gc_b0 bigint, n_gc_b1 bigint,"
        " n_gc_b2 bigint, live_set_preserved boolean,"
        " values_intact boolean, pending_intact boolean,"
        " folded_deleted boolean",
    )


def stream_asof_b1_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel as a QUERY surface for the STREAM-maintained store —
    the streaming twin of ``segment_store.sim_asof_v2_brute_topk``:
    exact cosine top-k against the as-of-batch-1 snapshot (base + the
    first two delivery micro-batches, the fold applied), through the
    shared brute tail (``segment_store.brute_topk_over_live``), so the
    historical answer is hash-green against DuckDB's brute force over
    the same membership predicate (``vec_id % DELIVERY_MOD ==
    DELIVERY_MOD-1`` deliveries batched by ``vec_id %
    N_STREAM_BATCHES``). Reproducible-training-snapshot story, streamed
    edition: any committed batch state's exact search regenerates
    bit-for-bit."""
    from ..operators.segment_store import brute_topk_over_live

    live = read_streamed_index_asof(spark, sf_dir, 1).select("vec_id", "v")
    return brute_topk_over_live(live)


#: Streaming-delete waves: base vectors (the delivery split stays the
#: insert stream's) whose ``vec_id % DELETE_WAVE_MOD`` hits one of the
#: three wave remainders, one wave per micro-batch. Distinct from the
#: batch delete tiers' DEL_COMPACTED=4 / DEL_PENDING=7 picks so the
#: two lifecycles never alias.
DELETE_WAVE_MOD = 9
DELETE_WAVE_REMS = (2, 5, 8)


def _delete_dir(spark: SparkSession, sf_dir: str) -> str:
    return f"{_ivf_index_dir(spark, sf_dir)}_streamed_del"


def _ensure_delete_stream(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Idempotently run the DELETE-maintenance stream (the GDPR-shape
    twin of the insert loop): each micro-batch commits a tombstone
    segment (an id list — bytes ∝ requests, the index untouched), and
    the same manifest-committed scheduling policy folds the pending
    tombstones once their count reaches ``MERGE_TRIGGER_SEGMENTS`` —
    rewriting ONLY the cells that actually hold a tombstoned vector
    (fold I/O ∝ touched-cell rows) into a versioned merged base with
    the deleted rows dropped. Completion marker written LAST."""
    import shutil
    import tempfile

    from pyspark.errors import AnalysisException

    d = _base_dir(spark, sf_dir)
    ddir = _delete_dir(spark, sf_dir)
    try:
        spark.read.parquet(f"{ddir}/final_manifest").collect()
        return ddir, d
    except AnalysisException:
        pass

    sim_persisted_ingest_delta(spark, sf_dir).collect()  # ensure base
    base_postings = spark.read.parquet(f"{d}/postings").select(
        "cell", "vec_id", "v"
    )

    def merged_versions() -> list[int]:
        import glob
        import os

        root = ddir.removeprefix("file:")
        return sorted(
            int(os.path.basename(os.path.dirname(p)).removeprefix("merged_v"))
            for p in glob.glob(f"{root}/merged_v*/manifest")
        )

    def pending_segments() -> list[str]:
        import glob
        import os

        root = ddir.removeprefix("file:")
        committed = sorted(
            (
                os.path.basename(os.path.dirname(p))
                for p in glob.glob(f"{root}/tomb_b*/meta")
            ),
            key=_seg_order,
        )
        folded: set[str] = set()
        for v in merged_versions():  # manifest-committed folds only
            for r in spark.read.parquet(f"{ddir}/merged_v{v}/folded").collect():
                folded.add(r["segment"])
        return [s for s in committed if s not in folded]

    def current_view() -> DataFrame:
        view = base_postings
        for v in merged_versions():
            view = _apply_fold(spark, view, ddir, v)
        return view

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg = f"tomb_b{batch_id}"
        batch_df.select("vec_id").write.mode("overwrite").parquet(
            f"{ddir}/{seg}/ids"
        )
        spark.createDataFrame([(seg,)], "segment string").write.mode(
            "overwrite"
        ).parquet(f"{ddir}/{seg}/meta")  # meta LAST commits the segment

        pending = pending_segments()
        if len(pending) < MERGE_TRIGGER_SEGMENTS:
            return
        ver = (merged_versions() or [1])[-1] + 1
        tomb_all = None
        for s in pending:
            ids = spark.read.parquet(f"{ddir}/{s}/ids")
            tomb_all = ids if tomb_all is None else tomb_all.unionByName(ids)
        view = current_view()
        touched = [
            int(r["cell"])
            for r in view.join(F.broadcast(tomb_all), "vec_id", "left_semi")
            .select("cell")
            .distinct()
            .collect()
        ]  # bounded by nlist — a driver-side literal
        view.filter(F.col("cell").isin(touched)).join(
            F.broadcast(tomb_all), "vec_id", "left_anti"
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{ddir}/merged_v{ver}/postings"
        )
        spark.createDataFrame(
            [(s,) for s in pending], "segment string"
        ).write.mode("overwrite").parquet(f"{ddir}/merged_v{ver}/folded")
        spark.createDataFrame(
            [(int(c), int(ver)) for c in touched], "cell int, version int"
        ).write.mode("overwrite").parquet(f"{ddir}/merged_v{ver}/manifest")

    tmp = tempfile.mkdtemp(prefix="stream_index_del_")
    try:
        import glob
        import os
        import time

        src = f"{tmp}/src"
        base_ts = time.time() - 1000
        seen: set[str] = set()
        for k, rem in enumerate(DELETE_WAVE_REMS):
            base_postings.filter(
                F.col("vec_id") % DELETE_WAVE_MOD == rem
            ).select("vec_id").coalesce(1).write.mode("append").parquet(src)
            for f in glob.glob(f"{src}/part-*.parquet"):
                if f not in seen:
                    seen.add(f)
                    os.utime(f, (base_ts + k * 10, base_ts + k * 10))
        (
            spark.readStream.schema("vec_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    rows = [(s, "pending") for s in pending_segments()]
    for v in merged_versions():
        for r in spark.read.parquet(f"{ddir}/merged_v{v}/folded").collect():
            rows.append((r["segment"], f"merged_v{v}"))
    spark.createDataFrame(
        sorted(rows, key=lambda r: _seg_order(r[0])),
        "segment string, status string",
    ).write.mode("overwrite").parquet(f"{ddir}/final_manifest")
    return ddir, d


def _delete_reader_postings(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, str, str]:
    """The delete-maintained reader: folds applied in version order,
    PENDING tombstones masked by a broadcast anti-join at query time —
    pure reads, no Python eval."""
    ddir, d = _ensure_delete_stream(spark, sf_dir)
    final = spark.read.parquet(f"{ddir}/final_manifest").collect()
    view = spark.read.parquet(f"{d}/postings").select("cell", "vec_id", "v")
    versions = sorted(
        {
            int(r["status"].removeprefix("merged_v"))
            for r in final
            if r["status"].startswith("merged_v")
        }
    )
    for v in versions:
        view = _apply_fold(spark, view, ddir, v)
    for r in final:
        if r["status"] == "pending":
            view = view.join(
                F.broadcast(
                    spark.read.parquet(f"{ddir}/{r['segment']}/ids")
                ),
                "vec_id",
                "left_anti",
            )
    return view, ddir, d


def stream_index_delete_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain three tombstone waves through the streaming-delete loop
    (one fold at the trigger, one wave pending) and return an
    oracle-backed summary recomputed from the artifacts: the exact
    delete-request count, batch/fold/pending tallies, and three
    invariants — the reader's live set is exactly base − all
    tombstones, each fold rewrote only touched-cell rows minus its
    deletions, and the folded postings stayed within the trained
    geometry."""
    ddir, d = _ensure_delete_stream(spark, sf_dir)
    final = spark.read.parquet(f"{ddir}/final_manifest").collect()
    segs = sorted(r["segment"] for r in final)
    pending = [r["segment"] for r in final if r["status"] == "pending"]
    versions = sorted(
        {
            int(r["status"].removeprefix("merged_v"))
            for r in final
            if r["status"].startswith("merged_v")
        }
    )
    tomb_all = None
    for s in segs:
        ids = spark.read.parquet(f"{ddir}/{s}/ids")
        tomb_all = ids if tomb_all is None else tomb_all.unionByName(ids)
    n_requests = tomb_all.count()

    base = spark.read.parquet(f"{d}/postings").select("cell", "vec_id", "v")
    nlist = int(
        spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]["nlist"]
    )
    reader, _dd, _d = _delete_reader_postings(spark, sf_dir)
    expected = base.join(F.broadcast(tomb_all), "vec_id", "left_anti")
    lost = expected.select("vec_id").join(
        reader.select("vec_id"), "vec_id", "left_anti"
    ).count()
    invented = (
        reader.select("vec_id")
        .join(expected.select("vec_id"), "vec_id", "left_anti")
        .count()
    )

    io_bounded = True
    cells_ok = True
    prev_view = base
    for v in versions:
        man = spark.read.parquet(f"{ddir}/merged_v{v}/manifest")
        folded = {
            r["segment"]
            for r in spark.read.parquet(f"{ddir}/merged_v{v}/folded").collect()
        }
        fold_ids = None
        for s in sorted(folded):
            ids = spark.read.parquet(f"{ddir}/{s}/ids")
            fold_ids = ids if fold_ids is None else fold_ids.unionByName(ids)
        touched_prev = prev_view.join(
            F.broadcast(man.select("cell")), "cell", "left_semi"
        )
        n_deleted_in_touched = touched_prev.join(
            F.broadcast(fold_ids), "vec_id", "left_semi"
        ).count()
        merged_p = spark.read.parquet(f"{ddir}/merged_v{v}/postings")
        if (
            merged_p.count()
            != touched_prev.count() - n_deleted_in_touched
        ):
            io_bounded = False
        agg = merged_p.agg(
            ((F.min("cell") >= 0) & (F.max("cell") < F.lit(nlist)))
        ).collect()[0][0]
        if not agg:
            cells_ok = False
        prev_view = _apply_fold(spark, prev_view, ddir, v)

    return spark.createDataFrame(
        [
            (
                int(n_requests),
                int(len(segs)),
                int(len(versions)),
                int(len(pending)),
                bool(lost == 0 and invented == 0),
                bool(io_bounded),
                bool(cells_ok),
            )
        ],
        "n_delete_requests bigint, n_batches bigint,"
        " compactions_triggered bigint, pending_after bigint,"
        " live_set_correct boolean, fold_io_bounded boolean,"
        " cells_within_geometry boolean",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_index_maintenance_drain": stream_index_maintenance_drain,
    "stream_maintained_index_topk": stream_maintained_index_topk,
    "stream_index_asof_batch": stream_index_asof_batch,
    "stream_index_vacuum": stream_index_vacuum,
    "stream_index_retention_drain": stream_index_retention_drain,
    "stream_asof_b1_brute_topk": stream_asof_b1_brute_topk,
    "stream_index_delete_drain": stream_index_delete_drain,
}

ORACLES: dict[str, str] = {
    # the drain's exact count is the delivery; the tallies are pinned
    # by the deterministic schedule (3 batches, trigger 2 -> 1 fold,
    # 1 pending); the invariants are recomputed from the artifacts
    "stream_index_maintenance_drain": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_delivery,
               CAST({N_STREAM_BATCHES} AS BIGINT) AS n_batches,
               CAST(1 AS BIGINT) AS compactions_triggered,
               CAST(1 AS BIGINT) AS pending_after,
               TRUE AS live_set_preserved,
               TRUE AS merge_io_bounded,
               TRUE AS cells_within_geometry
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}""",
    # the delete drain's exact count is the three waves over the BASE
    # corpus (the insert delivery is excluded from the base by
    # construction); the tallies are pinned by the schedule
    "stream_index_delete_drain": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_delete_requests,
               CAST({len(DELETE_WAVE_REMS)} AS BIGINT) AS n_batches,
               CAST(1 AS BIGINT) AS compactions_triggered,
               CAST(1 AS BIGINT) AS pending_after,
               TRUE AS live_set_correct,
               TRUE AS fold_io_bounded,
               TRUE AS cells_within_geometry
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} != {DELIVERY_MOD - 1}
          AND vec_id % {DELETE_WAVE_MOD} IN {DELETE_WAVE_REMS}""",
    # stream_maintained_index_topk: rows-only (approximate tier);
    # bounded by stream_maintained_recall_check in sketch_checks.py
    # as-of-batch counts recomputed from the delivery's deterministic
    # vec_id % N_STREAM_BATCHES batch split; the exact engine asserts
    # the disjointness and fold-invisibility booleans must hold
    "stream_index_asof_batch": f"""
        SELECT CAST(sum(CASE WHEN vec_id % {DELIVERY_MOD}
                                  != {DELIVERY_MOD - 1}
                              OR vec_id % {N_STREAM_BATCHES} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_asof_b0,
               CAST(sum(CASE WHEN vec_id % {DELIVERY_MOD}
                                  != {DELIVERY_MOD - 1}
                              OR vec_id % {N_STREAM_BATCHES} <= 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_asof_b1,
               CAST(count(*) AS BIGINT) AS n_asof_b2,
               TRUE AS batches_disjoint,
               TRUE AS folded_reader_equals_flat
        FROM embeddings""",
    # after GC the head must still serve base ∪ delivery (the whole
    # corpus) bit-unchanged, having removed only manifest-folded
    # segments; pre-fold as-of reads are the documented casualty
    "stream_index_vacuum": """
        SELECT CAST(count(*) AS BIGINT) AS n_live,
               TRUE AS reader_digest_unchanged,
               TRUE AS only_folded_deleted,
               TRUE AS pending_intact,
               TRUE AS asof_prefold_fails
        FROM embeddings""",
    # scheduled retention: the delivery count is exact; the per-batch
    # GC tallies are pinned by the deterministic schedule (fold at
    # batch 1 collects its two freshly-folded deltas; batches 0/2
    # collect nothing); the live-set/value/layout invariants are
    # recomputed from the artifacts and must hold
    "stream_index_retention_drain": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_delivery,
               CAST(0 AS BIGINT) AS n_gc_b0,
               CAST({MERGE_TRIGGER_SEGMENTS} AS BIGINT) AS n_gc_b1,
               CAST(0 AS BIGINT) AS n_gc_b2,
               TRUE AS live_set_preserved,
               TRUE AS values_intact,
               TRUE AS pending_intact,
               TRUE AS folded_deleted
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}""",
    # the streamed store's historical exact search: DuckDB reproduces
    # the as-of-batch-1 membership (base ∪ delivery batches 0,1 per the
    # vec_id % N_STREAM_BATCHES split) and runs the identical brute
    # force — hash-green, every float bit
    "stream_asof_b1_brute_topk": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE vec_id % {DELIVERY_MOD} != {DELIVERY_MOD - 1}
               OR vec_id % {N_STREAM_BATCHES} <= 1),
        scored AS (
            SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
                   list_dot_product(q.v, x.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(x.v, x.v))) AS cosine
            FROM e q JOIN e x ON q.vec_id != x.vec_id
            WHERE q.vec_id < {N_QUERIES}),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {TOP_K}""",
}
