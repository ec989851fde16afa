"""Segment-store lifecycle tail: time-travel reads and GC/VACUUM.

The persisted ANN index already writes the full lake discipline —
immutable cell-partitioned segments, meta-written-last commits, a
versioned segments manifest appended by compare-and-swap
(``similarity.sim_persisted_concurrent_ingest``) and versioned merge
manifests (``similarity.sim_persisted_merge_deltas``). Two lifecycle
surfaces were still missing (r11 VERDICT "What's missing" #3/#4):

- **Time travel** (:func:`read_index_asof`): immutable segments +
  versioned manifests make every historical index state reconstructible
  for free — resolving the segment set as of manifest version ``v`` is
  the Iceberg snapshot-read / Delta ``VERSION AS OF`` contract. The
  registered entry pins the chain algebra: as-of-v2 equals v1 plus
  exactly writer A's segment, and head minus v2 is exactly writer B's.
- **VACUUM** (:func:`sim_persisted_vacuum`): retired segments otherwise
  accumulate forever (SCALE.md noted the gap). The retention pass keeps
  the segments referenced by the last ``VACUUM_RETAIN_LAST`` manifest
  versions, deletes every unreferenced segment directory and expired
  manifest, and proves the three contract clauses of Iceberg's
  ``expire_snapshots``: (a) head-reader answers are bit-unchanged, (b)
  only unreferenced directories were removed, (c) a reader pinned to an
  expired version is the documented casualty.

Scale posture: both passes read only manifests (KB-sized JSON) plus, for
VACUUM, O(#segments) driver-side directory metadata — no data scan. The
corpus-sized digests and counts in the registered summaries are the cost
of the PROOF, not of the production pass. The VACUUM entry stages its
own copy-on-write universe (segment copies + its own manifest chain)
so the destructive delete can never invalidate the concurrent-ingest /
merge entries' shared artifacts.

Reference parity note: the reference (customer-revenue-analysis-sql-
tableau, a MySQL dump + Tableau workbook) has no storage-lifecycle
surface; this module belongs to the driver's large-scale-pipeline
mandate.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    DELIVERY_MOD,
    N_QUERIES,
    TOP_K,
    _ivf_index_dir,
    sim_persisted_concurrent_ingest,
)

#: VACUUM retention: keep segments referenced by this many newest
#: manifest versions. 1 = head-only (the most aggressive legal setting;
#: production defaults retain hours-to-days of versions — the pass is
#: identical, only the cutoff moves).
VACUUM_RETAIN_LAST = 1


def _segment_postings_path(d: str, seg: str) -> str:
    """The base segment lives at the index root; delta segments under
    their own dirs (the layout ``sim_persisted_concurrent_ingest``
    commits)."""
    return f"{d}/postings" if seg == "postings" else f"{d}/{seg}/postings"


def _manifest_chain(
    spark: SparkSession, sf_dir: str
) -> tuple[str, dict[int, list[str]]]:
    """Read the versioned segments-manifest chain (creating it via the
    concurrent-ingest protocol if absent); returns
    ``(index_dir, {version: segments})``. Manifests are KB-sized JSON —
    the same driver-side-scalar class as centroids/meta."""
    d = f"{_ivf_index_dir(spark, sf_dir)}_base"
    mdir = f"{d}/segments_manifest".removeprefix("file:")
    if not os.path.exists(f"{mdir}/manifest_v3"):
        sim_persisted_concurrent_ingest(spark, sf_dir)
    chain: dict[int, list[str]] = {}
    for f_ in os.listdir(mdir):
        if f_.startswith("manifest_v"):
            with open(f"{mdir}/{f_}") as fh:
                doc = json.load(fh)
            chain[int(doc["version"])] = doc["segments"]
    return d, chain


def read_index_asof(
    spark: SparkSession, sf_dir: str, version: int
) -> DataFrame:
    """AS-OF-VERSION read: resolve the segment set the manifest chain
    recorded at ``version`` and union those segments' postings — the
    historical index state, reconstructed from immutable artifacts with
    zero extra storage. Raises on a version the chain never committed
    (including one VACUUM has expired — the documented casualty)."""
    d, chain = _manifest_chain(spark, sf_dir)
    if version not in chain:
        raise ValueError(
            f"manifest version {version} not in chain"
            f" (available: {sorted(chain)})"
        )
    live: DataFrame | None = None
    for seg in chain[version]:
        p = spark.read.parquet(_segment_postings_path(d, seg)).select(
            "vec_id", "v", "cell"
        )
        live = p if live is None else live.unionByName(p)
    return live


def segment_union_stats(
    spark: SparkSession, segments: list[tuple[str, DataFrame]]
) -> tuple[dict[str, int], bool]:
    """ONE tagged-union pass over named (vec_id) segment frames:
    per-segment counts plus the disjointness facts every additive
    segment-store answer rides on — no vector in two segments, no
    duplicate within one. Shared by the batch time-travel entry and
    the streaming as-of-batch twin so the accounting rule can never
    drift between them. Returns ``({segment: count}, disjoint)``."""
    tagged: DataFrame | None = None
    names = [n for n, _df in segments]
    for name, df in segments:
        p = df.select("vec_id").withColumn("seg", F.lit(name))
        tagged = p if tagged is None else tagged.unionByName(p)
    flags = tagged.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        *[
            F.max((F.col("seg") == s).cast("int")).alias(f"in_{i}")
            for i, s in enumerate(names)
        ],
    )
    flag_sum = sum(F.col(f"in_{i}") for i in range(len(names)))
    agg = flags.agg(
        *[F.sum(f"in_{i}").alias(f"n_{i}") for i in range(len(names))],
        F.max((flag_sum > 1).cast("int")).alias("overlap"),
        F.max((F.col("cnt") != flag_sum).cast("int")).alias("dup"),
    ).collect()[0]
    counts = {s: int(agg[f"n_{i}"]) for i, s in enumerate(names)}
    return counts, bool(agg["overlap"] == 0 and agg["dup"] == 0)


def sim_persisted_read_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TRAVEL entry: pin the chain algebra of the v1 → v2 → v3
    manifest history the multi-writer protocol committed. Oracle-backed
    exactly — DuckDB recomputes every count from the delivery split
    (base = ``vec_id % {MOD} != {MOD}-1``; writer A's wave =
    ``% 2·{MOD} == {MOD}-1``; writer B's the rest): as-of-v2 must equal
    as-of-v1 plus EXACTLY writer A's segment, and head minus as-of-v2
    must be EXACTLY writer B's — no version leaks rows across the
    chain in either direction."""
    d, chain = _manifest_chain(spark, sf_dir)
    segs = {v: set(chain[v]) for v in (1, 2, 3)}
    # ONE pass over each distinct segment (the head covers them all).
    # The naive form — materializing three reader views and
    # anti-joining them pairwise — re-scans the cell-partitioned base
    # seven times; this shape reads each segment once.
    n_seg, disjoint = segment_union_stats(
        spark,
        [
            (seg, spark.read.parquet(_segment_postings_path(d, seg)))
            for seg in sorted(segs[3])
        ],
    )
    n_asof = {v: sum(n_seg[s] for s in chain[v]) for v in (1, 2, 3)}
    v2_ok = segs[2] == segs[1] | {"insert_delta_w1"} and disjoint
    v3_ok = segs[3] == segs[2] | {"insert_delta_w2"} and disjoint
    return spark.createDataFrame(
        [
            (
                int(n_asof[1]),
                int(n_asof[2]),
                int(n_asof[3]),
                bool(v2_ok),
                bool(v3_ok),
            )
        ],
        "n_asof_v1 bigint, n_asof_v2 bigint, n_asof_v3 bigint,"
        " v2_is_v1_plus_w1 boolean, head_minus_v2_is_w2 boolean",
    )


def sim_asof_v2_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel as a QUERY surface, not just an audit: exact cosine
    top-k against the AS-OF-v2 snapshot (base + writer A's wave — the
    corpus a reader saw before writer B's commit). The live set comes
    from :func:`read_index_asof`; the tail is the shared brute-force
    shape (broadcast queries, JVM fold dot product, per-query window
    top-k), so the whole historical answer is hash-green against
    DuckDB's brute force over the same membership predicate. The
    reproducible-training-snapshot story: any committed version's
    exact search results can be regenerated bit-for-bit."""
    from .dedup import _cos

    live = read_index_asof(spark, sf_dir, 2).select("vec_id", "v")
    q = live.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        live.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cos("qv", "v").alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# VACUUM: the destructive pass runs in its own copy-on-write universe.
# ---------------------------------------------------------------------------

#: The staged universe's segment names and the manifest history: three
#: additive commits, then a compaction commit that folds both deltas
#: into one merged segment and RETIRES them — leaving w1/w2 unreferenced
#: by the head, which is exactly what GC must (only) collect.
_VAC_CHAIN: dict[int, list[str]] = {
    1: ["seg_base"],
    2: ["seg_base", "seg_w1"],
    3: ["seg_base", "seg_w1", "seg_w2"],
    4: ["seg_base", "seg_merged"],
}
_VAC_SOURCES = {
    "seg_base": "postings",
    "seg_w1": "insert_delta_w1",
    "seg_w2": "insert_delta_w2",
}


def _vacuum_dir(spark: SparkSession, sf_dir: str) -> str:
    return f"{_ivf_index_dir(spark, sf_dir)}_vacuum"


def _vac_reader(spark: SparkSession, vd: str, segments: list[str]) -> DataFrame:
    live: DataFrame | None = None
    for seg in segments:
        p = spark.read.parquet(f"{vd}/{seg}/postings").select(
            "vec_id", "v", "cell"
        )
        live = p if live is None else live.unionByName(p)
    return live


def _vac_digest(df: DataFrame):
    """(count, order-insensitive content digest) of a reader view —
    xxhash64 hashes the vector array by value, so any row or element
    change flips it."""
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(vec_id, cell, v))").alias("dig"),
    ).collect()[0]
    return int(r["n"]), int(r["dig"])


def sim_persisted_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GC/VACUUM with a retention window (r11 VERDICT Next #3). Stages
    a copy-on-write segment universe (base + both delta waves copied
    from the concurrent-ingest artifacts), replays the 4-version
    manifest history ending in a compaction commit that retires the
    two delta segments, snapshots the head reader's content digest,
    then runs the retention pass: keep the segments referenced by the
    newest ``VACUUM_RETAIN_LAST`` manifests, delete every unreferenced
    segment directory and expired manifest file. ``vacuum_done`` is the
    completion marker (written LAST, records what was deleted); a torn
    run re-enters and replays deterministically.

    The summary recomputes the ``expire_snapshots`` contract from the
    ON-DISK post-state: exact head live count (DuckDB: the full
    corpus), head-reader digest unchanged across the delete, only
    unreferenced directories removed, only the retained manifest left,
    and a reader pinned to an expired version failing loudly."""
    from pyspark.errors import AnalysisException

    d, _chain = _manifest_chain(spark, sf_dir)  # ensures the source chain
    vd = _vacuum_dir(spark, sf_dir)
    root = vd.removeprefix("file:")
    marker = f"{root}/vacuum_done"
    head_v = max(_VAC_CHAIN)
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        # stage segment copies (idempotent overwrite; _SUCCESS-gated
        # sources are already complete because _manifest_chain ran)
        for seg, src in _VAC_SOURCES.items():
            spark.read.parquet(_segment_postings_path(d, src)).write.mode(
                "overwrite"
            ).parquet(f"{vd}/{seg}/postings")
        spark.read.parquet(f"{vd}/seg_w1/postings").unionByName(
            spark.read.parquet(f"{vd}/seg_w2/postings")
        ).write.mode("overwrite").parquet(f"{vd}/seg_merged/postings")
        for v, segs in _VAC_CHAIN.items():
            with open(f"{root}/manifest_v{v}", "w") as fh:
                json.dump({"version": v, "segments": segs}, fh)
        # snapshot the head answer BEFORE any delete — the digest the
        # post-delete reader must reproduce bit-for-bit
        n_pre, dig_pre = _vac_digest(
            _vac_reader(spark, vd, _VAC_CHAIN[head_v])
        )
        with open(f"{root}/digest_pre", "w") as fh:
            json.dump({"n": n_pre, "dig": dig_pre}, fh)

        # ---- the retention pass ----
        retained = sorted(_VAC_CHAIN)[-VACUUM_RETAIN_LAST:]
        referenced = {s for v in retained for s in _VAC_CHAIN[v]}
        staged = {*_VAC_SOURCES, "seg_merged"}
        deleted = sorted(staged - referenced)
        for seg in deleted:
            shutil.rmtree(f"{root}/{seg}", ignore_errors=True)
        expired = [v for v in _VAC_CHAIN if v not in retained]
        for v in expired:
            try:
                os.remove(f"{root}/manifest_v{v}")
            except FileNotFoundError:
                pass
        with open(marker, "w") as fh:  # completion marker LAST
            json.dump({"deleted": deleted, "expired": expired}, fh)

    # ---- recompute the contract from the on-disk post-state ----
    with open(marker) as fh:
        done = json.load(fh)
    with open(f"{root}/digest_pre") as fh:
        pre = json.load(fh)
    remaining_manifests = sorted(
        int(f_.removeprefix("manifest_v"))
        for f_ in os.listdir(root)
        if f_.startswith("manifest_v")
    )
    with open(f"{root}/manifest_v{head_v}") as fh:
        head_segs = json.load(fh)["segments"]
    n_post, dig_post = _vac_digest(_vac_reader(spark, vd, head_segs))
    remaining_segs = sorted(
        f_
        for f_ in os.listdir(root)
        if os.path.isdir(os.path.join(root, f_))
    )
    # referenced = union over the RETAINED manifests (reduces to the
    # head's segments at retention 1, and generalizes: a wider window
    # keeps everything its versions still reference)
    referenced: set[str] = set()
    for v in remaining_manifests:
        with open(f"{root}/manifest_v{v}") as fh:
            referenced |= set(json.load(fh)["segments"])
    only_unreferenced = remaining_segs == sorted(referenced) and not (
        set(done["deleted"]) & referenced
    )
    try:  # the documented casualty: a reader pinned to an expired version
        spark.read.parquet(f"{vd}/seg_w1/postings").limit(1).collect()
        pinned_fails = False
    except AnalysisException:
        pinned_fails = True
    return spark.createDataFrame(
        [
            (
                int(n_post),
                bool(n_post == pre["n"] and dig_post == pre["dig"]),
                bool(only_unreferenced),
                bool(
                    remaining_manifests
                    == sorted(_VAC_CHAIN)[-VACUUM_RETAIN_LAST:]
                ),
                bool(pinned_fails),
            )
        ],
        "n_live bigint, reader_digest_unchanged boolean,"
        " only_unreferenced_deleted boolean, manifests_retained boolean,"
        " pinned_reader_fails boolean",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sim_persisted_read_asof": sim_persisted_read_asof,
    "sim_asof_v2_brute_topk": sim_asof_v2_brute_topk,
    "sim_persisted_vacuum": sim_persisted_vacuum,
}

_W = DELIVERY_MOD  # 10: delivery = %10==9; wave A = %20==9, wave B = %20==19

ORACLES: dict[str, str] = {
    # the chain algebra is exact: DuckDB recomputes every as-of count
    # from the delivery split, and the exact engine asserts the
    # no-leak booleans must hold
    "sim_persisted_read_asof": f"""
        SELECT CAST(sum(CASE WHEN vec_id % {_W} != {_W - 1}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_asof_v1,
               CAST(sum(CASE WHEN vec_id % {_W} != {_W - 1}
                              OR vec_id % {2 * _W} = {_W - 1}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_asof_v2,
               CAST(count(*) AS BIGINT) AS n_asof_v3,
               TRUE AS v2_is_v1_plus_w1,
               TRUE AS head_minus_v2_is_w2
        FROM embeddings""",
    # the historical snapshot's exact search: DuckDB reproduces the
    # v2 membership (base ∪ wave A) from the delivery split and runs
    # the identical brute force — hash-green, every float bit
    "sim_asof_v2_brute_topk": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE vec_id % {_W} != {_W - 1}
               OR vec_id % {2 * _W} = {_W - 1}),
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
    # after GC the head must still serve the FULL corpus (base ∪ both
    # waves) with its pre-delete digest, having removed only the
    # retired segments
    "sim_persisted_vacuum": """
        SELECT CAST(count(*) AS BIGINT) AS n_live,
               TRUE AS reader_digest_unchanged,
               TRUE AS only_unreferenced_deleted,
               TRUE AS manifests_retained,
               TRUE AS pinned_reader_fails
        FROM embeddings""",
}
