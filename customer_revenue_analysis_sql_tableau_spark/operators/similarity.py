"""Similarity search over ``embeddings`` (driver mandate, SURVEY §7.5).

Four paths (exact baseline + the three industrial ANN families):

- **Brute-force cosine top-k** (the correctness baseline): broadcast the
  query vectors, fold-based JVM dot product (bit-identical to DuckDB's
  ``list_dot_product`` — SQL-checked), per-query window top-k.
  O(Q·N) — exact, and the right choice whenever Q is small.
- **Random-hyperplane LSH top-k** (the scale path): an Arrow-batched
  ``pandas_udf`` computes 24-bit hyperplane signatures (numpy matmul —
  this is the mandated vectorized-UDF surface), candidates are pairs
  agreeing on ≥1 of 8 3-bit bands, ranked by exact cosine within
  candidates. Band geometry is the recall/candidate-budget dial: this
  corpus's similarities are weak (max cosine ≈0.48), so recall needs
  the richer 8×3 banding (measured 0.80-0.85 vs 0.30-0.47 with 4×4
  at the same or lower wall time). Candidates stay bucket-bounded
  (never all-pairs — the plan test freezes this); recall is
  probabilistic → rows-only oracle + pytest recall floor against the
  brute-force baseline.
- **IVF** (inverted-file, see ``sim_ivf_topk``): sample-trained coarse
  quantizer, per-query cell probing — the candidate-pruning family.
- **PQ + ADC** (product quantization, see ``sim_pq_topk``): 5-bit
  subspace codes + lookup-table distances — the memory-compression
  family that makes a 100 TB index RAM-resident; ~50× smaller scans.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_tables
from .dedup import _cos

#: Registered-query parameters (pinned for determinism).
N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
#: LSH: 24 hyperplanes → 24-bit signature, 8 bands × 3 bits (see the
#: module docstring for the measured recall trade).
LSH_PLANES = 24
LSH_BANDS = 8
LSH_SEED = 42


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × full scan + window top-k."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = ed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .join(ed, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos("qv", "v").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes() -> np.ndarray:
    """Deterministic random hyperplanes (seeded; dim inferred at call)."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((64, LSH_PLANES))


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Signature bits come from a vectorized pandas_udf (Arrow batches,
    numpy matmul — the 10-100× path vs row-at-a-time Python); banding
    turns hamming-close signatures into bucket collisions. Candidates =
    query/vector pairs sharing ≥1 band; exact cosine ranks them.
    Recall < 1 by construction → rows-only; pytest checks recall ≥ 0.7
    against sim_bruteforce_topk at k=5 (measured 0.80-0.85).
    """
    planes = _hyperplanes()

    @pandas_udf("int")
    def signature(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())  # (batch, dim)
        bits = (m @ planes[: m.shape[1]]) > 0  # (batch, planes)
        out = np.zeros(len(vs), dtype=np.int32)
        for i in range(LSH_PLANES):
            out |= bits[:, i].astype(np.int32) << i
        return pd.Series(out)

    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("sig", signature(F.col("v")))
    bits_per_band = LSH_PLANES // LSH_BANDS
    mask = (1 << bits_per_band) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("sig"), bits_per_band * i)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(LSH_BANDS)
        ]
    )
    banded = ed.select("vec_id", "v", F.explode(bands).alias("bb")).select(
        "vec_id", "v", F.col("bb.band").alias("band"), F.col("bb.val").alias("val")
    )
    q = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "band",
        "val",
    )
    cand = (
        q.join(
            banded,
            (q.band == banded.band)
            & (q.val == banded.val)
            & (F.col("query_id") != banded.vec_id),
        )
        .select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", _cos("qv", "v").alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


#: IVF geometry caps; `_ivf_geometry` picks the effective cell/probe
#: counts from the training-sample size. Measured recall 0.88-0.95
#: across SFs at ~0.25× the brute-force candidate work (the old fixed
#: 16/8 geometry gave 0.78-0.85 at 0.5× work).
IVF_NLIST = 64
IVF_PROBE_FRAC = 0.25


#: Coarse-quantizer training sample cap (FAISS-style: the quantizer is
#: trained on a bounded sample, never the full corpus).
IVF_TRAIN_SAMPLE = 4096
IVF_TRAIN_ITERS = 5


def _ivf_geometry(n_sample: int) -> tuple[int, int]:
    """(nlist, nprobe) for a corpus whose training sample has
    ``n_sample`` vectors: as many cells as the cap allows while keeping
    ≥8 training vectors per cell, a quarter of the cells probed.
    Finer cells at a fixed probe fraction dominated the √n rule in
    measurement (recall 0.88 vs 0.55 at the same candidate budget) —
    with weak-similarity embeddings the win comes from probed cells
    hugging the query, not from larger cells."""
    nlist = max(4, min(IVF_NLIST, n_sample // 8))
    nprobe = max(2, round(nlist * IVF_PROBE_FRAC))
    return nlist, nprobe


def _train_centroids(vectors: np.ndarray, nlist: int) -> np.ndarray:
    """Seeded Lloyd iterations on a driver-side sample (numpy). This is
    how IVF quantizers are trained at any scale — FAISS trains on a
    bounded sample too; only the assignment pass must be distributed.
    Distances use the matmul identity ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²
    rather than the broadcast-subtract form: same argmin (bit-identical
    centroids on this corpus, probed), 29× faster and O(n·k) memory
    instead of the O(n·k·dim) intermediate (2.06 s → 0.07 s at the
    4096×64×64 training shape)."""
    rng = np.random.default_rng(LSH_SEED)
    init = rng.choice(len(vectors), size=nlist, replace=False)
    cents = vectors[np.sort(init)].copy()
    vn = (vectors**2).sum(axis=1)[:, None]
    for _ in range(IVF_TRAIN_ITERS):
        d2 = vn - 2.0 * (vectors @ cents.T) + (cents**2).sum(axis=1)[None, :]
        cells = d2.argmin(axis=1)
        for c in range(nlist):
            members = vectors[cells == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) search: a
    sample-trained k-means coarse quantizer assigns every vector to its
    nearest of ``IVF_NLIST`` centroids (the inverted lists); each query
    probes its ``nprobe`` nearest centroids and ranks exactly
    within those cells only.

    Scale shape: quantizer training touches a bounded driver-side
    sample (the FAISS recipe — an MLlib KMeans over the full corpus
    would schedule multiple full-scan jobs to train what a sample
    trains as well); assignment is one shuffle-free per-row argmin over
    broadcast centroids; per-query work drops from N to
    ~N·nprobe/nlist. Like LSH, recall < 1 by construction → rows-only
    oracle; pytest checks recall against the brute-force baseline.
    """
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    # deterministic bounded sample: hash-ordered first-N. orderBy+limit
    # compiles to TakeOrderedAndProject (per-partition heads + merge),
    # never a full sort — safe at any corpus size.
    sample_rows = (
        ed.select("vec_id", "v")
        .orderBy(F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED)))
        .limit(IVF_TRAIN_SAMPLE)
        .collect()
    )
    nlist, nprobe = _ivf_geometry(len(sample_rows))
    cents = _train_centroids(np.array([r["v"] for r in sample_rows]), nlist)

    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, cv array<double>",
    )

    # vectorized Arrow assignment: centroids ride the UDF closure
    # (nlist × dim floats — broadcast-sized at any corpus scale), cells
    # come from one numpy matmul per batch. No shuffle, no giant
    # centroid-literal tree for the analyzer to chew per plan copy.
    cmat = cents
    cnorm = (cmat**2).sum(axis=1)

    @pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())
        d2 = (m**2).sum(axis=1)[:, None] - 2.0 * (m @ cmat.T) + cnorm[None, :]
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    assigned = ed.withColumn("cell", cell_of(F.col("v")))

    l2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probed = (
        ed.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("d2", l2)
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cand = probed.join(
        assigned, (probed.cell == assigned.cell) & (F.col("query_id") != assigned.vec_id)
    ).select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", _cos("qv", "v").alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


#: Product-quantization geometry: 16 subspaces × 32 centroids = 5-bit
#: codes, PACKED into ``PQ_BYTES`` = 10 bytes per vector (BinaryType —
#: a real 80-bit bitstream, not an array<int> demo) vs 512 for the raw
#: float64 array — the ~50× compression that makes a 100 TB ANN index
#: RAM-resident. The ADC shortlist re-ranked exactly is
#: PQ_SHORTLIST_MULT×k deep. Geometry measured on this weak-similarity
#: corpus (max cos ≈ 0.48): recall 0.85-0.93 vs brute force across
#: SFs; the coarser 8×16 grid managed only 0.33-0.48 — quantization
#: noise swamps weak signals, so finer subspaces matter more than
#: codebook size here.
PQ_M = 16
PQ_K = 32
PQ_BITS = 5  # log2(PQ_K)
PQ_BYTES = PQ_M * PQ_BITS // 8  # 10
PQ_SHORTLIST_MULT = 8


def _pack_codes_np(codes: np.ndarray) -> np.ndarray:
    """(batch, M) integer codes → (batch, PQ_BYTES) uint8: each 5-bit
    code MSB-first, concatenated into one big-endian 80-bit bitstream
    (code m occupies bitstream bits [5m, 5m+5), bit 0 = MSB of byte 0).
    Big-endian so ``hex()`` of the stored bytes reads the bitstream in
    order — that is what lets the JVM side rebuild the codes with two
    ``conv`` calls and shifts (see ``_pq_adc``)."""
    bits = (
        (codes[:, :, None] >> np.arange(PQ_BITS - 1, -1, -1)[None, None, :]) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(len(codes), PQ_M * PQ_BITS), axis=1)


def _unpack_codes_np(buf: bytes) -> np.ndarray:
    """Inverse of ``_pack_codes_np`` for one vector (pytest twin)."""
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    weights = 1 << np.arange(PQ_BITS - 1, -1, -1)
    return bits[: PQ_M * PQ_BITS].reshape(PQ_M, PQ_BITS) @ weights


def _pq_unpack(codes_col: str) -> list:
    """Two columns rebuilding the packed bitstream as longs: ``hex``
    turns the big-endian 10-byte stream into 20 nibbles and two
    ``conv`` calls parse bits [0, 60) / [60, 80) (codes 0-11 / 12-15).
    Project these ONCE per corpus row, BELOW the query join — unpacking
    inside the ADC expression instead re-parses the stream per
    (query, vector) pair (measured +27% on sim_pq_topk)."""
    hx = F.hex(F.col(codes_col))
    return [
        F.conv(F.substring(hx, 1, 15), 16, 10).cast("long").alias("pq_hi"),
        F.conv(F.substring(hx, 16, 5), 16, 10).cast("long").alias("pq_lo"),
    ]


def _pq_adc(lut_col: str):
    """Pure-JVM ADC over the ``_pq_unpack`` longs: each 5-bit code is
    one shift+mask feeding ``element_at`` on the broadcast lookup
    table — a flat sum of 16 whole-stage-codegen'd terms, no
    higher-order functions (measured slower here: see the
    perf-pitfalls note on HOFs), no Python, and the scan stores
    10 bytes/vector instead of 512."""

    def code(m: int):
        if m < 12:
            return F.shiftrightunsigned(F.col("pq_hi"), 60 - PQ_BITS * (m + 1))
        return F.shiftrightunsigned(F.col("pq_lo"), 20 - PQ_BITS * (m - 11))

    total = None
    for m in range(PQ_M):
        idx = (code(m).bitwiseAND(F.lit(PQ_K - 1)) + F.lit(m * PQ_K + 1)).cast(
            "int"
        )
        term = F.element_at(F.col(lut_col), idx)
        total = term if total is None else total + term
    return total


def _train_pq_codebooks(vectors: np.ndarray) -> np.ndarray:
    """(M, K, sub_dim) codebooks: seeded Lloyd per subspace slice on the
    bounded driver-side sample (same FAISS-style discipline as the IVF
    coarse quantizer)."""
    sub = vectors.shape[1] // PQ_M
    return np.stack(
        [
            _train_centroids(vectors[:, m * sub : (m + 1) * sub], PQ_K)
            for m in range(PQ_M)
        ]
    )


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via PRODUCT QUANTIZATION + asymmetric
    distance computation — the industrial 100 TB ANN memory layout
    (public PQ/FAISS literature):

    1. codebooks: per-subspace k-means on a bounded sample (driver-side
       numpy, seeded — the quantizer-training discipline IVF uses);
    2. encode: every corpus vector becomes ``PQ_M`` 5-bit codes
       (``PQ_K``=32 centroids) via one vectorized Arrow ``pandas_udf``
       (numpy argmin per subspace), PACKED into a ``PQ_BYTES``=10-byte
       ``BinaryType`` bitstream (``_pack_codes_np``) — the real ~50×
       layout, 10 B/vector vs 512 B raw (measured on-disk ratio in
       SCALE.md) — after this pass the search never touches raw
       vectors;
    3. ADC scan: each query precomputes its (M·K)-entry lookup table of
       subspace distances (tiny — broadcast as a column); the scored
       scan is pure JVM — ``_pq_adc`` unpacks the bitstream with two
       ``conv`` calls + shifts and sums M codegen'd table lookups per
       row, no Python, no raw-vector reads;
    4. shortlist: ADC top ``PQ_SHORTLIST_MULT``·k per query as ONE
       window whose ``row_number ≤ n`` filter Spark ≥3.5 plans as a
       partial WindowGroupLimit below the exchange — each scan task
       ships only its local top shortlist_n per query, so no task ever
       sorts N rows (the bound VERDICT r6 "What's wrong" #1 demanded,
       previously hand-built as a two-stage
       (query_id, spark_partition_id) pre-rank — r15 folded it into
       the planner's form, one exchange instead of two);
    5. exact re-rank: only the shortlist touches raw vectors.

    The embeddings are unit-norm, so ADC's L2 ordering tracks cosine.
    Recall < 1 by construction → rows-only oracle;
    ``sim_pq_recall_check`` puts the measured recall floor under the
    driver hash like the LSH/IVF tiers."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    sample_rows = (
        ed.orderBy(F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED)))
        .limit(IVF_TRAIN_SAMPLE)
        .collect()
    )
    books = _train_pq_codebooks(np.array([r["v"] for r in sample_rows]))
    sub = books.shape[2]

    @pandas_udf("binary")
    def encode(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())  # (batch, dim)
        codes = np.empty((len(vs), PQ_M), dtype=np.int64)
        for mi in range(PQ_M):
            sl = m[:, mi * sub : (mi + 1) * sub]
            d2 = (
                (sl**2).sum(axis=1)[:, None]
                - 2.0 * (sl @ books[mi].T)
                + (books[mi] ** 2).sum(axis=1)[None, :]
            )
            codes[:, mi] = d2.argmin(axis=1)
        packed = _pack_codes_np(codes)
        return pd.Series([packed[i].tobytes() for i in range(len(vs))])

    coded = ed.select("vec_id", encode(F.col("v")).alias("codes"))
    luts = _pq_query_luts(spark, ed, books, sub)
    return _pq_adc_topk(ed, coded, luts)


def _pq_query_luts(
    spark: SparkSession, ed: DataFrame, books: np.ndarray, sub: int
) -> DataFrame:
    """Per-query ADC lookup tables, computed driver-side from the
    codebooks (Q·M·K doubles — broadcast-sized at any corpus scale).
    Shared by the in-process tier and the persisted read path (which
    feeds codebooks READ BACK from parquet — float64 round-trips
    exactly, so the LUTs, and therefore the results, are
    bit-identical)."""
    qrows = ed.filter(F.col("vec_id") < N_QUERIES).collect()
    lut_rows = []
    for r in qrows:
        qv = np.array(r["v"])
        lut = np.empty(PQ_M * PQ_K)
        for mi in range(PQ_M):
            qs = qv[mi * sub : (mi + 1) * sub]
            lut[mi * PQ_K : (mi + 1) * PQ_K] = ((books[mi] - qs) ** 2).sum(
                axis=1
            )
        lut_rows.append((r["vec_id"], [float(x) for x in lut]))
    return spark.createDataFrame(lut_rows, "query_id long, lut array<double>")


def _pq_adc_topk(
    ed: DataFrame, coded: DataFrame, luts: DataFrame
) -> DataFrame:
    """The shared flat-PQ query tail (in-process and persisted paths):
    JVM ADC — adc = sum over subspaces of lut[m*K + code_m]; the
    bitstream is unpacked to two longs once per CORPUS row (below the
    query join — Q× cheaper than unpacking per scored pair) — then the
    bounded shortlist window and the exact re-rank. The shortlist is
    one full window over (adc, neighbor_id), partitioning-independent
    by definition, so the persisted path returns identical rows even
    though its code scan has different partitioning than the
    in-process Arrow stage; the per-task bound comes from the
    planner's partial WindowGroupLimit (:func:`sim_pq_topk` step 4)."""
    unpacked = coded.select("vec_id", *_pq_unpack("codes"))
    adc = _pq_adc("lut")
    shortlist_n = PQ_SHORTLIST_MULT * TOP_K
    # Bounded selection is ONE window now (r15): Spark ≥3.5's
    # InferWindowGroupLimit plans the `row_number ≤ n` filter as a
    # partial WindowGroupLimit BELOW the exchange, so each scan task
    # ships only its local top shortlist_n per query — exactly the
    # bound the previous hand-built (query_id, spark_partition_id)
    # pre-stage enforced, minus that stage's second exchange + sort
    # (plan diff in plans/r15/sim_pq_topk_after.txt; rows identical at
    # every SF — a single full window is the defining semantics).
    ws = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        F.broadcast(luts)
        .join(unpacked, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), adc.alias("adc")
        )
        .withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= shortlist_n)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(ed, shortlist)


def _exact_rerank(ed: DataFrame, shortlist: DataFrame) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, neighbor_id) shortlist —
    only these rows ever touch raw vectors."""
    q = ed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        shortlist.join(F.broadcast(q), "query_id")
        .join(ed.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .select("query_id", "neighbor_id", _cos("qv", "v").alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via IVF-PQ — the standard industrial
    pairing (public FAISS ``IndexIVFPQ`` literature): the IVF coarse
    quantizer prunes WHICH vectors each query scans, and PQ compresses
    WHAT the scan reads, so neither family's cost term survives:

    1. coarse quantizer: sample-trained k-means cells (the exact IVF
       discipline — bounded driver-side sample, distributed assignment
       via one Arrow ``pandas_udf``);
    2. residual PQ: codebooks are trained on ``v - centroid[cell]``
       (residuals are what's left AFTER the coarse quantizer explains
       the vector — quantizing them wastes no codebook capacity on
       cell-level structure) and every vector stores only its cell id
       + ``PQ_M`` 5-bit residual codes packed into ``PQ_BYTES``=10
       bytes of ``BinaryType`` (same bitstream as ``sim_pq_topk``);
    3. probe: each query ranks the broadcast centroids and keeps its
       ``nprobe`` nearest cells — per-query work is cell-bounded before
       any corpus-sized table is touched;
    4. per-(query, cell) ADC tables: the query's lookup table is built
       against ITS residual in each probed cell (Q·nprobe·M·K doubles,
       still broadcast-sized); the scan joins probed cells to codes ON
       CELL — a key-bounded BroadcastHashJoin, so the per-query window
       below it ranks only probed-cell candidates (the per-key-window-
       over-BNLJ scale class cannot arise here by construction: there
       is no non-equi join);
    5. ADC shortlist (pure-JVM table lookups, same expression as
       ``sim_pq_topk``), exact cosine re-rank of the shortlist only.

    Recall < 1 by construction → rows-only oracle;
    ``sim_ivfpq_recall_check`` pins the measured floor under the
    driver hash like the other three ANN tiers."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    sample_rows = (
        ed.orderBy(F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED)))
        .limit(IVF_TRAIN_SAMPLE)
        .collect()
    )
    sample = np.array([r["v"] for r in sample_rows])
    nlist, nprobe = _ivf_geometry(len(sample_rows))
    cents = _train_centroids(sample, nlist)
    cnorm = (cents**2).sum(axis=1)

    # residual codebooks: train on sample residuals vs the coarse cells
    d2s = (sample**2).sum(axis=1)[:, None] - 2.0 * (sample @ cents.T) + cnorm
    resid_sample = sample - cents[d2s.argmin(axis=1)]
    books = _train_pq_codebooks(resid_sample)
    sub = books.shape[2]

    @pandas_udf("struct<cell:int, codes:binary>")
    def assign_encode(vs: pd.Series) -> pd.DataFrame:
        m = np.stack(vs.to_numpy())
        d2 = (m**2).sum(axis=1)[:, None] - 2.0 * (m @ cents.T) + cnorm[None, :]
        cell = d2.argmin(axis=1)
        resid = m - cents[cell]
        codes = np.empty((len(vs), PQ_M), dtype=np.int64)
        for mi in range(PQ_M):
            sl = resid[:, mi * sub : (mi + 1) * sub]
            dd = (
                (sl**2).sum(axis=1)[:, None]
                - 2.0 * (sl @ books[mi].T)
                + (books[mi] ** 2).sum(axis=1)[None, :]
            )
            codes[:, mi] = dd.argmin(axis=1)
        packed = _pack_codes_np(codes)
        return pd.DataFrame(
            {
                "cell": cell.astype(np.int32),
                "codes": [packed[i].tobytes() for i in range(len(vs))],
            }
        )

    coded = ed.select(
        "vec_id", assign_encode(F.col("v")).alias("ce")
    ).select("vec_id", F.col("ce.cell").alias("cell"), F.col("ce.codes").alias("codes"))

    luts = _ivfpq_query_luts(spark, ed, cents, cnorm, books, sub, nprobe)
    return _ivfpq_adc_topk(ed, coded, luts)


def _ivfpq_query_luts(
    spark: SparkSession,
    ed: DataFrame,
    cents: np.ndarray,
    cnorm: np.ndarray,
    books: np.ndarray,
    sub: int,
    nprobe: int,
) -> DataFrame:
    """Driver-side probe + per-(query, cell) residual LUTs: the query's
    residual differs per probed cell, so each (query, cell) pair gets
    its own M·K table — Q·nprobe·M·K doubles, broadcast-sized always.
    Shared by the in-process tier and the persisted read path (both
    centroids and codebooks round-trip parquet float64 exactly, so the
    probe set and LUTs are bit-identical)."""
    qrows = ed.filter(F.col("vec_id") < N_QUERIES).collect()
    lut_rows = []
    for r in qrows:
        qv = np.array(r["v"])
        qd2 = (qv**2).sum() - 2.0 * (cents @ qv) + cnorm
        for cell in np.argsort(qd2, kind="stable")[:nprobe]:
            qres = qv - cents[cell]
            lut = np.empty(PQ_M * PQ_K)
            for mi in range(PQ_M):
                qs = qres[mi * sub : (mi + 1) * sub]
                lut[mi * PQ_K : (mi + 1) * PQ_K] = (
                    (books[mi] - qs) ** 2
                ).sum(axis=1)
            lut_rows.append((r["vec_id"], int(cell), [float(x) for x in lut]))
    return spark.createDataFrame(
        lut_rows, "query_id long, cell int, lut array<double>"
    )


def _ivfpq_adc_topk(
    ed: DataFrame, coded: DataFrame, luts: DataFrame
) -> DataFrame:
    """The shared IVF-PQ query tail: probed cells join the codes ON
    CELL (a key-bounded BroadcastHashJoin — with cell-partitioned
    persisted codes, partition pruning skips unprobed cells' files),
    pure-JVM ADC, bounded shortlist, exact re-rank."""
    unpacked = coded.select("vec_id", "cell", *_pq_unpack("codes"))
    adc = _pq_adc("lut")
    shortlist_n = PQ_SHORTLIST_MULT * TOP_K
    ws = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        unpacked.join(F.broadcast(luts), "cell")  # key-bounded: probed cells only
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), adc.alias("adc")
        )
        .withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= shortlist_n)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(ed, shortlist)


#: Incremental-ingest split: vectors with ``vec_id % DELIVERY_MOD ==
#: DELIVERY_MOD - 1`` are the NEW DELIVERY; the rest are the persisted
#: base index.
DELIVERY_MOD = 10


def sim_delivery_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact delivery-vs-base cosine top-k — the baseline the
    incremental tier is measured against, and an oracle-backed entry
    itself (delivery is 10% of the corpus, so the pair space is
    0.1·N² — fine as a CHECK, the thing the IVF tier exists to avoid
    as a production path)."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    is_new = F.col("vec_id") % DELIVERY_MOD == DELIVERY_MOD - 1
    q = ed.filter(is_new).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    base = ed.filter(~is_new)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(base, F.lit(True))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos("qv", "v").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sim_incremental_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN INDEX MAINTENANCE — the production shape of
    vector search under continuous ingest (the ANN sibling of
    ``dedup_incremental_lsh``): a new DELIVERY of vectors arrives, the
    coarse quantizer is NOT retrained (FAISS discipline — the quantizer
    is a stable artifact; retraining would re-encode the whole base),
    and each delivery vector is (a) assigned to its cell — ready to be
    appended to the persisted inverted lists — and (b) searched against
    the BASE index through the normal nprobe path.

    Cost ∝ |delivery| × probed cells — never re-touches the full base
    corpus except through cell-bounded candidate reads (the probed join
    is a key-bounded equi-join on cell). Quantizer training reads a
    bounded sample of the BASE only (the delivery must not shift the
    cells it is being matched into). Recall < 1 by construction →
    rows-only oracle; ``sim_incremental_recall_check`` pins the floor
    vs ``sim_delivery_brute_topk`` under the driver hash."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    is_new = F.col("vec_id") % DELIVERY_MOD == DELIVERY_MOD - 1
    base = ed.filter(~is_new)
    delivery = ed.filter(is_new)
    sample_rows = (
        base.orderBy(F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED)))
        .limit(IVF_TRAIN_SAMPLE)
        .collect()
    )
    nlist, nprobe = _ivf_geometry(len(sample_rows))
    cents = _train_centroids(np.array([r["v"] for r in sample_rows]), nlist)
    cmat, cnorm = cents, (cents**2).sum(axis=1)

    @pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())
        d2 = (m**2).sum(axis=1)[:, None] - 2.0 * (m @ cmat.T) + cnorm[None, :]
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    # the persisted inverted lists (stand-in: checkpointed frame)
    assigned_base = base.withColumn("cell", cell_of(F.col("v"))).localCheckpoint()

    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, cv array<double>",
    )
    l2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probed = (
        delivery.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("d2", l2)
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cand = probed.join(assigned_base, "cell").select(
        "query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", _cos("qv", "v").alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


#: Deletion split (r8 Next #5): two tombstone waves over the corpus —
#: wave A (``% DEL_MOD == DEL_COMPACTED``) has already been folded in
#: by compaction (the affected inverted lists were rebuilt), wave B
#: (``% DEL_MOD == DEL_PENDING``) is pending and must be masked by a
#: query-time tombstone anti-join. Production vector stores run
#: exactly this split: recent deletes are tombstones, a periodic
#: compaction rewrites only the cells they touch.
DEL_MOD = 9
DEL_COMPACTED = 4
DEL_PENDING = 7

def _is_deleted():
    """Tombstone predicate (both waves). A function, not a module-level
    Column: building a Column needs an active SparkContext."""
    return (F.col("vec_id") % DEL_MOD == DEL_COMPACTED) | (
        F.col("vec_id") % DEL_MOD == DEL_PENDING
    )


def sim_delete_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over the SURVIVING corpus after both delete
    waves — the oracle-backed baseline the tombstoning IVF tier is
    measured against. A deleted vector must appear neither as a query
    nor as a neighbor; the driver hash proves the survivor set is
    exactly the complement of the two tombstone waves."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(~_is_deleted())
    q = ed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .join(ed, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos("qv", "v").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sim_delete_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search under DELETIONS — the index-maintenance shape
    production vector stores run (the delete sibling of
    ``sim_incremental_ivf``'s insert path):

    - the coarse quantizer is NOT retrained (FAISS discipline: it is a
      stable artifact; deletes shift cell centroids no more than
      inserts do);
    - wave-A deletes are COMPACTED: only the cells that contain a
      deleted vector are rebuilt (an anti-join bounded by a semi-join
      to exactly the affected cell ids — the IVM drain-recompute
      pattern from ``incremental.py``), untouched cells pass through
      verbatim;
    - wave-B deletes are PENDING tombstones, masked at query time by
      an anti-join on the shortlist — the index still holds them, the
      reader never sees them.

    Cost: compaction ∝ rows of affected cells (never the full index);
    the query path is the normal nprobe candidate read + a broadcast
    anti-join against the (small) pending-tombstone set. Recall < 1 by
    construction → rows-only oracle; ``sim_delete_recall_check`` pins
    the floor vs ``sim_delete_brute_topk`` under the driver hash."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    live = ed.filter(~_is_deleted())
    # quantizer trained on the pre-delete base (the persisted artifact)
    sample_rows = (
        ed.orderBy(F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED)))
        .limit(IVF_TRAIN_SAMPLE)
        .collect()
    )
    nlist, nprobe = _ivf_geometry(len(sample_rows))
    cents = _train_centroids(np.array([r["v"] for r in sample_rows]), nlist)
    cmat, cnorm = cents, (cents**2).sum(axis=1)

    @pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())
        d2 = (m**2).sum(axis=1)[:, None] - 2.0 * (m @ cmat.T) + cnorm[None, :]
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    # the persisted inverted lists (pre-delete index state)
    assigned = ed.withColumn("cell", cell_of(F.col("v"))).localCheckpoint()

    # ---- compaction of wave A: rebuild ONLY the affected cells ----
    wave_a = assigned.filter(F.col("vec_id") % DEL_MOD == DEL_COMPACTED)
    affected = wave_a.select("cell").distinct()
    untouched = assigned.join(F.broadcast(affected), "cell", "left_anti")
    rebuilt = assigned.join(F.broadcast(affected), "cell", "left_semi").join(
        F.broadcast(wave_a.select("vec_id")), "vec_id", "left_anti"
    )
    compacted = untouched.unionByName(rebuilt)

    # ---- query path: nprobe probe + pending-tombstone anti-join ----
    pending = ed.filter(F.col("vec_id") % DEL_MOD == DEL_PENDING).select(
        "vec_id"
    )
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, cv array<double>",
    )
    l2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probed = (
        live.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("d2", l2)
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cand = (
        probed.join(
            compacted,
            (probed.cell == compacted.cell)
            & (F.col("query_id") != compacted.vec_id),
        )
        .join(F.broadcast(pending), "vec_id", "left_anti")
        .select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", _cos("qv", "v").alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Persisted-index lifecycle (r9 VERDICT Next #3): build-once / query-many.
# Every other sim_* entry trains + assigns inside the query call — right for
# proofs, but the production shape persists the index artifacts and serves
# queries from a pure READ path. The artifacts mirror what FAISS/Milvus-style
# stores persist: the trained centroids (the coarse quantizer), the inverted
# lists (postings, PARTITIONED BY CELL so an nprobe probe prunes to the
# probed cells' files at any corpus size), and a 1-row meta frame (geometry +
# build fingerprint). The index directory name folds in a fingerprint of the
# source embeddings file, so regenerated fixtures trigger a rebuild instead
# of serving a stale index (same rule as warehouse.prepare_analyzed_catalog).
# ---------------------------------------------------------------------------


def _embeddings_fingerprint(sf_dir: str) -> str:
    """size+mtime fingerprint of the embeddings source (file or dir)."""
    import hashlib
    import os

    root = os.path.join(sf_dir, "embeddings.parquet")
    parts: list[str] = []
    if os.path.isfile(root):
        st = os.stat(root)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    else:
        for r, _dirs, files in os.walk(root):
            for f in files:
                p = os.path.join(r, f)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                # key by relative path, not bare filename — identically
                # named part files in different subdirectories of a
                # partitioned dataset must not alias (matches
                # warehouse._sf_data_fingerprint)
                rel = os.path.relpath(p, root)
                parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(
        (sf_dir.rstrip("/") + "\0" + "\n".join(sorted(parts))).encode()
    ).hexdigest()[:8]


def _ivf_index_dir(spark: SparkSession, sf_dir: str) -> str:
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    return f"{warehouse}/ivf_index_{_embeddings_fingerprint(sf_dir)}"


def sim_ivf_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD phase of the persisted-IVF lifecycle: train the coarse
    quantizer on the bounded sample (identical recipe and seeds to
    :func:`sim_ivf_topk`, so the persisted index answers queries
    identically), assign every vector to its cell with the Arrow
    ``pandas_udf``, and persist three artifacts under the warehouse:

    - ``centroids``  — (cell, cv): the trained quantizer;
    - ``postings``   — (vec_id, v) PARTITIONED BY cell: the inverted
      lists; partition pruning makes an nprobe probe read only the
      probed cells' files, which is the 100 TB read-path story;
    - ``meta``       — 1 row (nlist, nprobe, n_vectors), written LAST
      so its presence certifies a complete build.

    Idempotent per embeddings-content fingerprint. Returns an
    oracle-backed summary read BACK FROM THE PERSISTED POSTINGS (not
    the in-memory frame), so the driver hash certifies the on-disk
    artifact: exact corpus count plus three completeness invariants
    (every vector assigned, exactly one cell each, cell ids within the
    trained geometry)."""
    from pyspark.errors import AnalysisException

    d = _ivf_index_dir(spark, sf_dir)
    try:
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
        nlist = meta["nlist"]
    except AnalysisException:
        e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
        ed = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        sample_rows = (
            ed.orderBy(
                F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED))
            )
            .limit(IVF_TRAIN_SAMPLE)
            .collect()
        )
        nlist, nprobe = _ivf_geometry(len(sample_rows))
        cents = _train_centroids(
            np.array([r["v"] for r in sample_rows]), nlist
        )
        cmat, cnorm = cents, (cents**2).sum(axis=1)

        @pandas_udf("int")
        def cell_of(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.to_numpy())
            d2 = (
                (m**2).sum(axis=1)[:, None]
                - 2.0 * (m @ cmat.T)
                + cnorm[None, :]
            )
            return pd.Series(d2.argmin(axis=1).astype(np.int32))

        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, cv array<double>",
        ).write.mode("overwrite").parquet(f"{d}/centroids")
        ed.withColumn("cell", cell_of(F.col("v"))).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(f"{d}/postings")
        n_vectors = spark.read.parquet(f"{d}/postings").count()
        spark.createDataFrame(
            [(int(nlist), int(nprobe), int(n_vectors))],
            "nlist int, nprobe int, n_vectors bigint",
        ).write.mode("overwrite").parquet(f"{d}/meta")

    postings = spark.read.parquet(f"{d}/postings")
    return postings.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        (F.countDistinct("vec_id") == F.count(F.lit(1))).alias(
            "one_cell_per_vector"
        ),
        (
            (F.min("cell") >= F.lit(0))
            & (F.max("cell") < F.lit(int(nlist)))
        ).alias("cells_within_geometry"),
    )


def _probe_and_rank(
    cent_df: DataFrame,
    nprobe: int,
    queries: DataFrame,
    postings: DataFrame,
    pending: DataFrame | None = None,
    self_exclude: bool = True,
) -> DataFrame:
    """The shared persisted-read-path tail: rank the broadcast
    centroids per query (JVM HOF ℓ², bounded fan-out), take candidates
    from the probed cells of ``postings`` (equi-join on cell — with the
    small probed side broadcast, dynamic partition pruning skips
    unprobed cells' files), optionally mask ``pending`` tombstones with
    a broadcast anti-join, exact-cosine re-rank to top-k. Entirely
    JVM-side: no training, no Python eval."""
    l2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probed = (
        queries.crossJoin(F.broadcast(cent_df))
        .withColumn("d2", l2)
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cond = probed.cell == postings.cell
    if self_exclude:
        cond = cond & (F.col("query_id") != postings.vec_id)
    cand = probed.join(postings, cond)
    if pending is not None:
        cand = cand.join(F.broadcast(pending), "vec_id", "left_anti")
    cand = cand.select(
        "query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id", "neighbor_id", _cos("qv", "v").alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sim_persisted_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY phase of the persisted-IVF lifecycle: a pure READ path —
    no k-means, no training sample, no Python UDF; every stage is a
    JVM-side scan/join over the persisted artifacts (the pytest in
    ``tests/test_persisted_ivf.py`` monkeypatches the trainer to raise
    and asserts the plan carries no Arrow/Python eval node). The probe
    ranks the broadcast persisted centroids per query (HOF ℓ², bounded
    fan-out), then candidates come from an equi-join against the
    cell-partitioned postings — with the probed-cells side broadcast,
    dynamic partition pruning skips unprobed cells' files entirely.
    Results are bit-identical to :func:`sim_ivf_topk` (same quantizer
    seeds, same tie order); recall vs brute force is pinned by
    ``sim_persisted_recall_check``. Builds the index on first use per
    embeddings fingerprint (self-contained registry entry)."""
    from pyspark.errors import AnalysisException

    d = _ivf_index_dir(spark, sf_dir)
    try:
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    except AnalysisException:
        sim_ivf_index_build(spark, sf_dir)
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    nprobe = int(meta["nprobe"])
    cent_df = spark.read.parquet(f"{d}/centroids")
    postings = spark.read.parquet(f"{d}/postings")
    queries = postings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return _probe_and_rank(cent_df, nprobe, queries, postings)


def sim_persisted_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE COMPACTION on the PERSISTED index (the production step
    after :func:`sim_ivf_index_build`): wave-A tombstones are folded
    into the on-disk index the way segment-based vector stores do it —
    the base postings stay immutable, and a DELTA directory holds
    rebuilt copies of ONLY the affected cells (those containing a
    wave-A vector) plus a manifest of compacted cell ids. A reader
    takes untouched cells from the base (partition pruning via the
    broadcast manifest anti-join) and compacted cells from the delta;
    nothing else is rewritten — compaction I/O ∝ rows of affected
    cells, never the index. Idempotent per index fingerprint (the
    manifest is written LAST and certifies a complete compaction).

    Returns an oracle-backed summary read FROM THE PERSISTED
    ARTIFACTS: the exact wave-A delete count plus three completeness
    invariants (compaction removed exactly the wave-A rows; the delta
    holds none of them; no wave-A row hides in an un-compacted cell —
    i.e. the manifest is complete)."""
    from pyspark.errors import AnalysisException

    sim_ivf_index_build(spark, sf_dir)  # ensure the base index
    d = _ivf_index_dir(spark, sf_dir)
    delta = f"{d}/delete_delta"
    wave_a_pred = F.col("vec_id") % DEL_MOD == DEL_COMPACTED
    try:
        spark.read.parquet(f"{delta}/manifest")
    except AnalysisException:
        postings = spark.read.parquet(f"{d}/postings")
        affected = [
            r["cell"]
            for r in postings.filter(wave_a_pred)
            .select("cell")
            .distinct()
            .collect()
        ]  # bounded by nlist — a driver-side literal, like centroids
        postings.filter(F.col("cell").isin(affected)).filter(
            ~wave_a_pred
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{delta}/postings"
        )
        spark.createDataFrame(
            [(int(c),) for c in affected], "cell int"
        ).write.mode("overwrite").parquet(f"{delta}/manifest")

    base = spark.read.parquet(f"{d}/postings")
    delta_p = spark.read.parquet(f"{delta}/postings")
    manifest = spark.read.parquet(f"{delta}/manifest")
    untouched = base.join(F.broadcast(manifest), "cell", "left_anti")
    n_base = base.count()
    n_after = untouched.count() + delta_p.count()
    n_delta_wave_a = delta_p.filter(wave_a_pred).count()
    n_untouched_wave_a = untouched.filter(wave_a_pred).count()
    n_wave_a = base.filter(wave_a_pred).count()
    return spark.createDataFrame(
        [
            (
                int(n_wave_a),
                bool(n_base - n_after == n_wave_a),
                bool(n_delta_wave_a == 0),
                bool(n_untouched_wave_a == 0),
            )
        ],
        "n_wave_a_deleted bigint, removed_exactly_wave_a boolean,"
        " delta_clean boolean, manifest_complete boolean",
    )


def _persisted_survivor_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compacted index view a reader sees: untouched base cells ∪
    delta cells (wave-A already folded out). Pure reads + a broadcast
    manifest anti-join; no training, no Python eval."""
    d = _ivf_index_dir(spark, sf_dir)
    delta = f"{d}/delete_delta"
    base = spark.read.parquet(f"{d}/postings")
    manifest = spark.read.parquet(f"{delta}/manifest")
    return base.join(F.broadcast(manifest), "cell", "left_anti").unionByName(
        spark.read.parquet(f"{delta}/postings").select(*base.columns)
    )


def sim_persisted_delete_ivf_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The delete-aware QUERY path over the persisted compacted index:
    untouched-∪-delta postings (see
    :func:`sim_persisted_index_compact`), wave-B pending tombstones
    masked by a broadcast anti-join on the candidates, probe over the
    persisted centroids — a pure read path (no k-means, no Python
    eval; pytest asserts the plan). Because build + compaction use the
    identical quantizer recipe and wave split as the in-process
    :func:`sim_delete_ivf_topk`, results are bit-identical to it
    (pytest) and ``sim_persisted_delete_recall_check`` pins recall vs
    the exact surviving-corpus baseline under the driver hash."""
    from pyspark.errors import AnalysisException

    d = _ivf_index_dir(spark, sf_dir)
    try:
        spark.read.parquet(f"{d}/delete_delta/manifest")
    except AnalysisException:
        sim_persisted_index_compact(spark, sf_dir)
    meta = spark.read.parquet(f"{d}/meta").collect()[0]
    nprobe = int(meta["nprobe"])
    cent_df = spark.read.parquet(f"{d}/centroids")
    compacted = _persisted_survivor_postings(spark, sf_dir)
    pending = compacted.filter(
        F.col("vec_id") % DEL_MOD == DEL_PENDING
    ).select("vec_id")
    live = compacted.filter(~_is_deleted())
    queries = live.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return _probe_and_rank(cent_df, nprobe, queries, compacted, pending=pending)


def sim_persisted_ingest_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT-DELTA ingest on the persisted index — the third segment
    operation next to build and delete compaction, making
    ``sim_incremental_ivf``'s "persisted inverted lists (stand-in)"
    literal: a BASE index instance is built over the pre-delivery
    corpus (its own dir — the delivery must not shift the cells it is
    matched into), then the delivery is assigned to the PERSISTED
    centroids (read back from parquet; assignment is the one Arrow
    stage — ingest-side, like the build) and written as an
    ``insert_delta`` segment, cell-partitioned like the base. Nothing
    in the base is rewritten: ingest I/O ∝ |delivery|. Idempotent per
    index fingerprint (the delta's meta row is written LAST).

    Returns an oracle-backed summary read from the persisted delta:
    the exact delivery count plus disjointness/uniqueness/geometry
    invariants."""
    from pyspark.errors import AnalysisException

    d = f"{_ivf_index_dir(spark, sf_dir)}_base"
    is_new = F.col("vec_id") % DELIVERY_MOD == DELIVERY_MOD - 1
    try:
        meta = spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]
        nlist = int(meta["nlist"])
    except AnalysisException:
        e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
        ed = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        base = ed.filter(~is_new)
        sample_rows = (
            base.orderBy(
                F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED))
            )
            .limit(IVF_TRAIN_SAMPLE)
            .collect()
        )
        nlist, nprobe = _ivf_geometry(len(sample_rows))
        cents = _train_centroids(
            np.array([r["v"] for r in sample_rows]), nlist
        )
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, cv array<double>",
        ).write.mode("overwrite").parquet(f"{d}/centroids")

        cmat, cnorm = cents, (cents**2).sum(axis=1)

        @pandas_udf("int")
        def cell_of(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.to_numpy())
            d2 = (
                (m**2).sum(axis=1)[:, None]
                - 2.0 * (m @ cmat.T)
                + cnorm[None, :]
            )
            return pd.Series(d2.argmin(axis=1).astype(np.int32))

        base.withColumn("cell", cell_of(F.col("v"))).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(f"{d}/postings")
        # the INGEST step: assign the delivery to the PERSISTED
        # centroids (read back — the build's in-memory copy is gone in
        # a real ingest job) and write the delta segment
        pc = spark.read.parquet(f"{d}/centroids").orderBy("cell").collect()
        pmat = np.array([r["cv"] for r in pc])
        pnorm = (pmat**2).sum(axis=1)

        @pandas_udf("int")
        def cell_of_persisted(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.to_numpy())
            d2 = (
                (m**2).sum(axis=1)[:, None]
                - 2.0 * (m @ pmat.T)
                + pnorm[None, :]
            )
            return pd.Series(d2.argmin(axis=1).astype(np.int32))

        ed.filter(is_new).withColumn(
            "cell", cell_of_persisted(F.col("v"))
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{d}/insert_delta/postings"
        )
        spark.createDataFrame(
            [(int(nlist), int(nprobe))], "nlist int, nprobe int"
        ).write.mode("overwrite").parquet(f"{d}/insert_delta/meta")

    base_p = spark.read.parquet(f"{d}/postings")
    delta_p = spark.read.parquet(f"{d}/insert_delta/postings")
    n_delta = delta_p.count()
    n_overlap = delta_p.select("vec_id").join(
        base_p.select("vec_id"), "vec_id", "left_semi"
    ).count()
    n_distinct = delta_p.select("vec_id").distinct().count()
    cells_ok = delta_p.agg(
        ((F.min("cell") >= 0) & (F.max("cell") < F.lit(int(nlist))))
    ).collect()[0][0]
    return spark.createDataFrame(
        [
            (
                int(n_delta),
                bool(n_overlap == 0),
                bool(n_distinct == n_delta),
                bool(cells_ok),
            )
        ],
        "n_delivery bigint, delta_disjoint_from_base boolean,"
        " one_row_per_vector boolean, cells_within_geometry boolean",
    )


def sim_persisted_delivery_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental-ingest QUERY path over persisted segments: the
    delivery's vectors (read from the ``insert_delta`` segment) search
    the BASE postings through the nprobe probe — a pure read path (no
    training, no Python eval; pytest asserts the plan and bit-equality
    with the in-process :func:`sim_incremental_ivf`).
    ``sim_persisted_delivery_recall_check`` pins recall vs the exact
    delivery-vs-base baseline under the driver hash."""
    from pyspark.errors import AnalysisException

    d = f"{_ivf_index_dir(spark, sf_dir)}_base"
    try:
        meta = spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]
    except AnalysisException:
        sim_persisted_ingest_delta(spark, sf_dir)
        meta = spark.read.parquet(f"{d}/insert_delta/meta").collect()[0]
    cent_df = spark.read.parquet(f"{d}/centroids")
    base_p = spark.read.parquet(f"{d}/postings")
    queries = spark.read.parquet(f"{d}/insert_delta/postings").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return _probe_and_rank(
        cent_df, int(meta["nprobe"]), queries, base_p, self_exclude=False
    )


#: Background-compaction policy (r10 VERDICT Next #5): fold the delta
#: stack into a new base version once it holds this many segments. The
#: policy is deterministic so the merge entry is driver-hashable; a
#: production scheduler would evaluate the same predicate on a timer.
MERGE_TRIGGER_SEGMENTS = 2


def _ensure_multi_deltas(spark: SparkSession, sf_dir: str) -> str:
    """Stage a MULTI-SEGMENT delta stack on the ``_base`` index: two
    successive delivery waves (the delivery split deterministically by
    ``vec_id % (2·DELIVERY_MOD)``), each assigned against the
    PERSISTED centroids and written as its own cell-partitioned
    ``insert_delta_w{1,2}`` segment with meta LAST — what repeated
    :func:`sim_persisted_ingest_delta` runs produce over time, and the
    precondition for the background merge. Idempotent. Returns the
    index dir."""
    from pyspark.errors import AnalysisException

    sim_persisted_ingest_delta(spark, sf_dir)  # ensures the _base index
    d = f"{_ivf_index_dir(spark, sf_dir)}_base"
    mod2 = 2 * DELIVERY_MOD
    waves = {
        "insert_delta_w1": DELIVERY_MOD - 1,  # e.g. % 20 == 9
        "insert_delta_w2": mod2 - 1,  # e.g. % 20 == 19
    }
    try:
        for seg in waves:
            spark.read.parquet(f"{d}/{seg}/meta").collect()
        return d
    except AnalysisException:
        pass
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    pc = spark.read.parquet(f"{d}/centroids").orderBy("cell").collect()
    pmat = np.array([r["cv"] for r in pc])
    pnorm = (pmat**2).sum(axis=1)

    @pandas_udf("int")
    def cell_of_persisted(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())
        d2 = (
            (m**2).sum(axis=1)[:, None] - 2.0 * (m @ pmat.T) + pnorm[None, :]
        )
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    for seg, rem in waves.items():
        ed.filter(F.col("vec_id") % mod2 == rem).withColumn(
            "cell", cell_of_persisted(F.col("v"))
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{d}/{seg}/postings"
        )
        spark.createDataFrame(
            [(seg, int(rem))], "segment string, delivery_rem int"
        ).write.mode("overwrite").parquet(f"{d}/{seg}/meta")
    return d


def sim_persisted_merge_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKGROUND COMPACTION of the insert-delta stack (r10 VERDICT
    Next #5): once the stack reaches ``MERGE_TRIGGER_SEGMENTS``
    segments, fold base + all deltas into a VERSIONED merged base —
    segment-store style. Only cells TOUCHED BY A DELTA are rewritten
    (base rows of those cells ∪ all delta rows, cell-partitioned under
    ``merged_v2/postings``); untouched base cells are never read or
    written — merge I/O ∝ rows of touched cells, not index size. The
    versioned manifest (touched cell ids + version row) is written
    LAST and certifies a complete merge; a reader takes untouched
    cells from the v1 base and touched cells from v2 (pytest asserts
    this merged view answers queries bit-identically to reading the
    full base + delta stack).

    Returns an oracle-backed summary from the persisted artifacts:
    exact delta-stack row count, the folded segment count, and three
    invariants — the live vector set is preserved exactly, merge I/O
    stayed bounded to touched cells, and no delta row's cell escaped
    the manifest."""
    from pyspark.errors import AnalysisException

    d = _ensure_multi_deltas(spark, sf_dir)
    merged = f"{d}/merged_v2"
    segs = ["insert_delta_w1", "insert_delta_w2"]
    deltas = [
        spark.read.parquet(f"{d}/{s}/postings").select("vec_id", "v", "cell")
        for s in segs
    ]
    delta_all = deltas[0].unionByName(deltas[1])
    base = spark.read.parquet(f"{d}/postings").select("vec_id", "v", "cell")
    try:
        spark.read.parquet(f"{merged}/manifest")
    except AnalysisException:
        assert len(segs) >= MERGE_TRIGGER_SEGMENTS  # the scheduling policy
        touched = [
            int(r["cell"])
            for r in delta_all.select("cell").distinct().collect()
        ]  # bounded by nlist — driver-side literal, like centroids
        base.filter(F.col("cell").isin(touched)).unionByName(
            delta_all
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{merged}/postings"
        )
        spark.createDataFrame(
            [(int(c), 2) for c in touched], "cell int, version int"
        ).write.mode("overwrite").parquet(f"{merged}/manifest")

    manifest = spark.read.parquet(f"{merged}/manifest")
    merged_p = spark.read.parquet(f"{merged}/postings")
    untouched = base.join(F.broadcast(manifest), "cell", "left_anti")
    reader_view = untouched.select("vec_id").unionByName(
        merged_p.select("vec_id")
    )
    stack_view = base.select("vec_id").unionByName(delta_all.select("vec_id"))
    lost = stack_view.join(reader_view, "vec_id", "left_anti").count()
    invented = reader_view.join(stack_view, "vec_id", "left_anti").count()
    n_delta = delta_all.count()
    n_base_touched = base.join(F.broadcast(manifest), "cell", "left_semi").count()
    io_bounded = merged_p.count() == n_base_touched + n_delta
    escaped = delta_all.join(F.broadcast(manifest), "cell", "left_anti").count()
    return spark.createDataFrame(
        [
            (
                int(n_delta),
                int(len(segs)),
                bool(lost == 0 and invented == 0),
                bool(io_bounded),
                bool(escaped == 0),
            )
        ],
        "n_delta_rows bigint, segments_folded bigint,"
        " live_set_preserved boolean, merge_io_bounded boolean,"
        " manifest_complete boolean",
    )


def sim_persisted_concurrent_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-WRITER index updates (the last SCALE.md lifecycle gap):
    two writers ingest delta segments concurrently under an optimistic
    versioned-manifest commit protocol — the public Delta/Iceberg
    recipe. Each writer stages its segment dir independently (data +
    meta, meta LAST — staging needs no coordination); COMMIT appends
    the segment to a versioned segments manifest via an atomic
    create-exclusive of ``manifest_v{N+1}`` (the filesystem's
    compare-and-swap). The entry deterministically replays the
    conflict schedule that loses updates without the protocol: writer
    A commits v2; writer B, holding a STALE read of v1, attempts v2 —
    the exclusive create REJECTS it (that rejection is captured, not
    assumed) — then rebases on v2 and commits v3 carrying BOTH
    segments. Readers resolve the highest complete manifest version,
    so they see v1/v2/v3 atomically, never a half-commit.

    Returns an oracle-backed summary: total live vectors under the
    final manifest (DuckDB recomputes it as the full corpus: base ∪
    both deliveries), the version-chain length, the captured
    stale-commit rejection, chain monotonicity (every version's
    segment set contains its predecessor's — no lost update), and
    final completeness."""
    import json as _json
    import os

    d = _ensure_multi_deltas(spark, sf_dir)  # both writers' staged segments
    # Spark reads take the warehouse URI as-is; the manifest files are
    # written with plain os I/O, which needs the local PATH — passing
    # the "file:"-schemed URI to open()/makedirs() would silently
    # create a literal "./file:/..." tree (found by the torn-protocol
    # pytest; the registered results were consistent but the artifacts
    # landed outside the warehouse)
    mdir = f"{d}/segments_manifest".removeprefix("file:")
    flag = f"{mdir}/stale_commit_rejected"
    # v3 is the protocol's COMPLETION MARKER (the meta-written-last
    # discipline): a crash mid-protocol leaves it absent, and re-entry
    # replays the deterministic commits idempotently
    if not os.path.exists(f"{mdir}/manifest_v3"):
        os.makedirs(mdir, exist_ok=True)

        def commit(version: int, segments: list[str]) -> bool:
            # atomic create-exclusive IS the CAS: two writers racing
            # to the same version — exactly one create succeeds
            try:
                with open(f"{mdir}/manifest_v{version}", "x") as fh:
                    _json.dump(
                        {"version": version, "segments": segments}, fh
                    )
                return True
            except FileExistsError:
                return False

        commit(1, ["postings"])  # the build's base segment
        # writer A: read v1, commit v2 = v1 + its segment
        commit(2, ["postings", "insert_delta_w1"])
        # writer B: STALE read of v1 → attempts v2 and must be
        # rejected (A's v2 is already on disk — on first run and on
        # any crash replay alike)
        if not commit(2, ["postings", "insert_delta_w2"]):
            with open(flag, "w") as fh:
                fh.write("1")
        # writer B rebases: re-reads the head (v2), commits v3 with
        # A's segment preserved + its own
        commit(3, ["postings", "insert_delta_w1", "insert_delta_w2"])

    versions = sorted(
        int(f.rsplit("_v", 1)[1])
        for f in os.listdir(mdir)
        if f.startswith("manifest_v")
    )
    chains = []
    for v in versions:
        with open(f"{mdir}/manifest_v{v}") as fh:
            chains.append(_json.load(fh)["segments"])
    monotone = all(
        set(chains[i]) < set(chains[i + 1]) for i in range(len(chains) - 1)
    )
    final = chains[-1]
    live = None
    for seg in final:
        path = f"{d}/postings" if seg == "postings" else f"{d}/{seg}/postings"
        p = spark.read.parquet(path).select("vec_id")
        live = p if live is None else live.unionByName(p)
    n_live = live.distinct().count()
    return spark.createDataFrame(
        [
            (
                int(n_live),
                int(len(versions)),
                bool(os.path.exists(flag)),
                bool(monotone),
                bool(
                    set(final)
                    == {"postings", "insert_delta_w1", "insert_delta_w2"}
                ),
            )
        ],
        "n_live bigint, manifest_versions bigint,"
        " stale_commit_rejected boolean, chain_monotone boolean,"
        " final_manifest_complete boolean",
    )


def _merged_reader_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-merge reader view: untouched v1 base cells ∪ merged v2
    cells. Pure reads + a broadcast manifest anti-join (pytest twin:
    bit-identical answers to the base + delta-stack reader)."""
    d = f"{_ivf_index_dir(spark, sf_dir)}_base"
    base = spark.read.parquet(f"{d}/postings").select("vec_id", "v", "cell")
    manifest = spark.read.parquet(f"{d}/merged_v2/manifest")
    merged = spark.read.parquet(f"{d}/merged_v2/postings").select(
        "vec_id", "v", "cell"
    )
    return base.join(F.broadcast(manifest), "cell", "left_anti").unionByName(
        merged
    )


# ---------------------------------------------------------------------------
# Persisted PQ / IVF-PQ lifecycle (r10 VERDICT Next #4): the two compressed
# tiers get the same build-once / query-many split the flat IVF tier got in
# r10. Build persists the trained codebooks (+ coarse centroids for IVF-PQ)
# and the PACKED 10-byte code stream; the read path trains nothing — it
# loads the quantizers from parquet (float64 round-trips exactly, so LUTs
# and results are bit-identical to the in-process tiers, asserted in
# tests/test_persisted_pq.py) and runs the shared pure-JVM ADC tail. At
# 100 TB this is the layout that matters: the scan reads 10 B/vector codes
# (cell-partitioned for IVF-PQ, so the probe prunes files) and raw vectors
# surface only for the bounded shortlist re-rank.
# ---------------------------------------------------------------------------


def _pq_index_dir(spark: SparkSession, sf_dir: str) -> str:
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    return f"{warehouse}/pq_index_{_embeddings_fingerprint(sf_dir)}"


def _ivfpq_index_dir(spark: SparkSession, sf_dir: str) -> str:
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    return f"{warehouse}/ivfpq_index_{_embeddings_fingerprint(sf_dir)}"


def _write_codebooks(spark: SparkSession, books: np.ndarray, path: str) -> None:
    """Persist (M, K, sub) codebooks as (m, k, c array<double>) rows."""
    rows = [
        (int(m), int(k), [float(x) for x in books[m, k]])
        for m in range(books.shape[0])
        for k in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "m int, k int, c array<double>"
    ).write.mode("overwrite").parquet(path)


def _read_codebooks(spark: SparkSession, path: str) -> np.ndarray:
    """Load codebooks back to the (M, K, sub) ndarray — bounded
    (M·K = 512 rows), the same driver-side-scalar class as reading
    meta or centroids."""
    rows = spark.read.parquet(path).orderBy("m", "k").collect()
    m = max(r["m"] for r in rows) + 1
    k = max(r["k"] for r in rows) + 1
    return np.array([r["c"] for r in rows]).reshape(m, k, -1)


def _pq_build_summary(
    spark: SparkSession, codes: DataFrame, codebooks: DataFrame, extra=None
) -> DataFrame:
    """Oracle-backed build summary computed FROM THE PERSISTED
    ARTIFACTS: exact corpus count, one code row per vector, every
    packed stream exactly ``PQ_BYTES`` wide, and a complete M×K
    codebook grid."""
    n_books = codebooks.count()
    agg_cols = [
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        (F.countDistinct("vec_id") == F.count(F.lit(1))).alias(
            "one_code_per_vector"
        ),
        (
            (F.min(F.length("codes")) == PQ_BYTES)
            & (F.max(F.length("codes")) == PQ_BYTES)
        ).alias("codes_width_ok"),
        F.lit(n_books == PQ_M * PQ_K).alias("codebook_complete"),
    ]
    if extra is not None:
        agg_cols.append(extra)
    return codes.agg(*agg_cols)


def sim_pq_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD phase of the persisted flat-PQ lifecycle: train the
    16×32 codebooks on the bounded sample (identical recipe and seeds
    to :func:`sim_pq_topk`), encode every vector into the packed
    10-byte stream with the one Arrow stage (build-side only), and
    persist ``codebooks`` + ``codes`` + ``meta`` (written LAST —
    presence certifies a complete build) under a content-fingerprinted
    warehouse dir. Idempotent per embeddings fingerprint."""
    from pyspark.errors import AnalysisException

    d = _pq_index_dir(spark, sf_dir)
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    try:
        spark.read.parquet(f"{d}/meta").collect()
    except AnalysisException:
        sample_rows = (
            ed.orderBy(
                F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED))
            )
            .limit(IVF_TRAIN_SAMPLE)
            .collect()
        )
        books = _train_pq_codebooks(np.array([r["v"] for r in sample_rows]))
        sub = books.shape[2]

        @pandas_udf("binary")
        def encode(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.to_numpy())
            codes = np.empty((len(vs), PQ_M), dtype=np.int64)
            for mi in range(PQ_M):
                sl = m[:, mi * sub : (mi + 1) * sub]
                d2 = (
                    (sl**2).sum(axis=1)[:, None]
                    - 2.0 * (sl @ books[mi].T)
                    + (books[mi] ** 2).sum(axis=1)[None, :]
                )
                codes[:, mi] = d2.argmin(axis=1)
            packed = _pack_codes_np(codes)
            return pd.Series([packed[i].tobytes() for i in range(len(vs))])

        _write_codebooks(spark, books, f"{d}/codebooks")
        ed.select("vec_id", encode(F.col("v")).alias("codes")).write.mode(
            "overwrite"
        ).parquet(f"{d}/codes")
        n = spark.read.parquet(f"{d}/codes").count()
        spark.createDataFrame(
            [(PQ_M, PQ_K, PQ_BITS, int(sub), int(n))],
            "m int, k int, bits int, sub int, n_vectors bigint",
        ).write.mode("overwrite").parquet(f"{d}/meta")
    return _pq_build_summary(
        spark,
        spark.read.parquet(f"{d}/codes"),
        spark.read.parquet(f"{d}/codebooks"),
    )


def sim_persisted_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY phase of the persisted flat-PQ lifecycle: a pure READ
    path — no codebook training, no Arrow encode; the quantizer loads
    from parquet (bounded M·K rows, the centroid-read class), the
    driver computes the per-query LUTs from it exactly as the
    in-process tier does, and the scan is the shared pure-JVM ADC tail
    over the PERSISTED 10-byte codes. Bit-identical to
    :func:`sim_pq_topk` (pytest); recall pinned by
    ``sim_persisted_pq_recall_check``."""
    from pyspark.errors import AnalysisException

    d = _pq_index_dir(spark, sf_dir)
    try:
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    except AnalysisException:
        sim_pq_index_build(spark, sf_dir)
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    books = _read_codebooks(spark, f"{d}/codebooks")
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    coded = spark.read.parquet(f"{d}/codes")
    luts = _pq_query_luts(spark, ed, books, int(meta["sub"]))
    return _pq_adc_topk(ed, coded, luts)


def sim_ivfpq_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD phase of the persisted IVF-PQ lifecycle: coarse quantizer
    + residual codebooks trained on the bounded sample (identical
    recipe/seeds to :func:`sim_ivfpq_topk`), every vector stored as
    cell id + packed 10-byte residual codes, CELL-PARTITIONED so the
    probe's partition pruning reads only probed cells' files. Persists
    ``centroids`` + ``codebooks`` + ``codes`` + ``meta`` (LAST).
    Idempotent per embeddings fingerprint."""
    from pyspark.errors import AnalysisException

    d = _ivfpq_index_dir(spark, sf_dir)
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    try:
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    except AnalysisException:
        sample_rows = (
            ed.orderBy(
                F.xxhash64(F.col("vec_id").cast("string"), F.lit(LSH_SEED))
            )
            .limit(IVF_TRAIN_SAMPLE)
            .collect()
        )
        sample = np.array([r["v"] for r in sample_rows])
        nlist, nprobe = _ivf_geometry(len(sample_rows))
        cents = _train_centroids(sample, nlist)
        cnorm = (cents**2).sum(axis=1)
        d2s = (
            (sample**2).sum(axis=1)[:, None] - 2.0 * (sample @ cents.T) + cnorm
        )
        resid_sample = sample - cents[d2s.argmin(axis=1)]
        books = _train_pq_codebooks(resid_sample)
        sub = books.shape[2]

        @pandas_udf("struct<cell:int, codes:binary>")
        def assign_encode(vs: pd.Series) -> pd.DataFrame:
            m = np.stack(vs.to_numpy())
            d2 = (
                (m**2).sum(axis=1)[:, None]
                - 2.0 * (m @ cents.T)
                + cnorm[None, :]
            )
            cell = d2.argmin(axis=1)
            resid = m - cents[cell]
            codes = np.empty((len(vs), PQ_M), dtype=np.int64)
            for mi in range(PQ_M):
                sl = resid[:, mi * sub : (mi + 1) * sub]
                dd = (
                    (sl**2).sum(axis=1)[:, None]
                    - 2.0 * (sl @ books[mi].T)
                    + (books[mi] ** 2).sum(axis=1)[None, :]
                )
                codes[:, mi] = dd.argmin(axis=1)
            packed = _pack_codes_np(codes)
            return pd.DataFrame(
                {
                    "cell": cell.astype(np.int32),
                    "codes": [packed[i].tobytes() for i in range(len(vs))],
                }
            )

        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, cv array<double>",
        ).write.mode("overwrite").parquet(f"{d}/centroids")
        _write_codebooks(spark, books, f"{d}/codebooks")
        ed.select("vec_id", assign_encode(F.col("v")).alias("ce")).select(
            "vec_id",
            F.col("ce.cell").alias("cell"),
            F.col("ce.codes").alias("codes"),
        ).write.mode("overwrite").partitionBy("cell").parquet(f"{d}/codes")
        n = spark.read.parquet(f"{d}/codes").count()
        spark.createDataFrame(
            [(int(nlist), int(nprobe), int(sub), int(n))],
            "nlist int, nprobe int, sub int, n_vectors bigint",
        ).write.mode("overwrite").parquet(f"{d}/meta")
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    codes = spark.read.parquet(f"{d}/codes")
    return _pq_build_summary(
        spark,
        codes,
        spark.read.parquet(f"{d}/codebooks"),
        extra=(
            (F.min("cell") >= F.lit(0))
            & (F.max("cell") < F.lit(int(meta["nlist"])))
        ).alias("cells_within_geometry"),
    )


def sim_persisted_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY phase of the persisted IVF-PQ lifecycle: pure READ path —
    centroids and residual codebooks load from parquet, the driver
    builds the per-(query, probed-cell) LUTs exactly as the in-process
    tier, and the scan equi-joins probed cells against the
    CELL-PARTITIONED persisted codes (partition pruning) before the
    shared pure-JVM ADC tail. Bit-identical to :func:`sim_ivfpq_topk`
    (pytest); recall pinned by ``sim_persisted_ivfpq_recall_check``."""
    from pyspark.errors import AnalysisException

    d = _ivfpq_index_dir(spark, sf_dir)
    try:
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    except AnalysisException:
        sim_ivfpq_index_build(spark, sf_dir)
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
    crows = spark.read.parquet(f"{d}/centroids").orderBy("cell").collect()
    cents = np.array([r["cv"] for r in crows])
    cnorm = (cents**2).sum(axis=1)
    books = _read_codebooks(spark, f"{d}/codebooks")
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    coded = spark.read.parquet(f"{d}/codes")
    luts = _ivfpq_query_luts(
        spark, ed, cents, cnorm, books, int(meta["sub"]), int(meta["nprobe"])
    )
    return _ivfpq_adc_topk(ed, coded, luts)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_delivery_brute_topk": sim_delivery_brute_topk,
    "sim_delete_brute_topk": sim_delete_brute_topk,
    "sim_delete_ivf_topk": sim_delete_ivf_topk,  # rows-only (probabilistic)
    "sim_ivf_index_build": sim_ivf_index_build,  # oracle-backed build summary
    "sim_persisted_ivf_topk": sim_persisted_ivf_topk,  # rows-only (probabilistic)
    "sim_persisted_index_compact": sim_persisted_index_compact,  # oracle-backed
    "sim_persisted_delete_ivf_topk": sim_persisted_delete_ivf_topk,  # rows-only
    "sim_persisted_ingest_delta": sim_persisted_ingest_delta,  # oracle-backed
    "sim_persisted_merge_deltas": sim_persisted_merge_deltas,  # oracle-backed
    "sim_persisted_concurrent_ingest": sim_persisted_concurrent_ingest,  # oracle-backed
    "sim_persisted_delivery_topk": sim_persisted_delivery_topk,  # rows-only
    "sim_incremental_ivf": sim_incremental_ivf,  # rows-only (probabilistic)
    "sim_lsh_topk": sim_lsh_topk,  # rows-only (probabilistic recall)
    "sim_ivf_topk": sim_ivf_topk,  # rows-only (probabilistic recall)
    "sim_pq_topk": sim_pq_topk,  # rows-only (probabilistic recall)
    "sim_ivfpq_topk": sim_ivfpq_topk,  # rows-only (probabilistic recall)
    "sim_pq_index_build": sim_pq_index_build,  # oracle-backed build summary
    "sim_persisted_pq_topk": sim_persisted_pq_topk,  # rows-only
    "sim_ivfpq_index_build": sim_ivfpq_index_build,  # oracle-backed
    "sim_persisted_ivfpq_topk": sim_persisted_ivfpq_topk,  # rows-only
}

ORACLES: dict[str, str] = {
    # the build summary's invariants are exact: the persisted postings
    # must hold the whole corpus, once each, within the trained geometry
    "sim_ivf_index_build": """
        SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               TRUE AS one_cell_per_vector,
               TRUE AS cells_within_geometry
        FROM embeddings""",
    # the background merge folds the 2-segment delta stack (= the
    # delivery) into a versioned base, preserving the live set exactly
    "sim_persisted_merge_deltas": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_delta_rows,
               CAST(2 AS BIGINT) AS segments_folded,
               TRUE AS live_set_preserved,
               TRUE AS merge_io_bounded,
               TRUE AS manifest_complete
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}""",
    # multi-writer commit: the final manifest must cover the FULL
    # corpus (base ∪ both writers' deliveries), through a 3-version
    # monotone chain with the stale commit demonstrably rejected
    "sim_persisted_concurrent_ingest": """
        SELECT CAST(count(*) AS BIGINT) AS n_live,
               CAST(3 AS BIGINT) AS manifest_versions,
               TRUE AS stale_commit_rejected,
               TRUE AS chain_monotone,
               TRUE AS final_manifest_complete
        FROM embeddings""",
    # the PQ build summaries' invariants are exact: all corpus vectors
    # coded once each, every packed stream exactly PQ_BYTES wide, a
    # complete MxK codebook grid (and cell geometry for IVF-PQ)
    "sim_pq_index_build": """
        SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               TRUE AS one_code_per_vector,
               TRUE AS codes_width_ok,
               TRUE AS codebook_complete
        FROM embeddings""",
    "sim_ivfpq_index_build": """
        SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               TRUE AS one_code_per_vector,
               TRUE AS codes_width_ok,
               TRUE AS codebook_complete,
               TRUE AS cells_within_geometry
        FROM embeddings""",
    # compaction must remove exactly the wave-A rows, keep them out of
    # the delta, and leave none hiding in an un-compacted base cell
    "sim_persisted_index_compact": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_wave_a_deleted,
               TRUE AS removed_exactly_wave_a,
               TRUE AS delta_clean,
               TRUE AS manifest_complete
        FROM embeddings WHERE vec_id % {DEL_MOD} = {DEL_COMPACTED}""",
    # ingest must write exactly the delivery, disjoint from the base,
    # one row each, within the trained geometry
    "sim_persisted_ingest_delta": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_delivery,
               TRUE AS delta_disjoint_from_base,
               TRUE AS one_row_per_vector,
               TRUE AS cells_within_geometry
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}""",
    "sim_delivery_brute_topk": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
            SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
                   list_dot_product(q.v, x.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(x.v, x.v))) AS cosine
            FROM e q JOIN e x
              ON x.vec_id % {DELIVERY_MOD} != {DELIVERY_MOD - 1}
            WHERE q.vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored)
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {TOP_K}""",
    "sim_delete_brute_topk": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE vec_id % {DEL_MOD} != {DEL_COMPACTED}
              AND vec_id % {DEL_MOD} != {DEL_PENDING}),
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
    "sim_bruteforce_topk": f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
