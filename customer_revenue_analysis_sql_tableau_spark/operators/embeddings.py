"""Embedding-column profiling operators (similarity-search support,
SURVEY §7.5): per-vector norm/quantization stats and per-label corpus
profile.

These are the passes an embedding pipeline runs before building an ANN
index: L2 norms (normalization check), max-abs (int8 quantization
scale), and per-label distribution summaries (IVF cell sizing). All
JVM-side higher-order functions over the ``array<float>`` column —
per-row work only, plus one bounded groupBy(label); nothing pairwise.

Float policy (proven by ``sim_bruteforce_topk``): cast the vector to
``array<double>`` FIRST, then left-to-right double accumulation matches
DuckDB's ``list_dot_product`` bit-for-bit. Cross-row averages use the
integer-cents pattern (round each norm to micro-units, sum longs, one
division per group) so the result is order-independent — a double sum
over shuffled rows would be nondeterministic at any scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables

#: int8 quantization target range.
QUANT_MAX = 127.0


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    return e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def _dot_self() -> F.Column:
    return F.aggregate(
        F.zip_with(F.col("v"), F.col("v"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, dim, l2_norm, max_abs, quant_scale): per-vector
    profile; quant_scale is the multiplier that maps the vector onto
    int8 range."""
    d = _vecs(spark, sf_dir)
    return d.select(
        "vec_id",
        "label",
        F.size("v").cast("long").alias("dim"),
        F.sqrt(_dot_self()).alias("l2_norm"),
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("max_abs"),
        (
            F.lit(QUANT_MAX)
            / F.array_max(F.transform("v", lambda x: F.abs(x)))
        ).alias("quant_scale"),
    )


def emb_label_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_vecs, min_norm, max_norm, avg_norm_micros): per-label
    corpus profile. min/max are order-independent on doubles; the mean
    goes through micro-unit longs (floor of Σmicros/n — exact integer
    division, emitted identically in both dialects) so shuffle order
    can never move a bit."""
    d = _vecs(spark, sf_dir).select(
        "label", F.sqrt(_dot_self()).alias("l2_norm")
    )
    micros = F.round(F.col("l2_norm") * 1_000_000).cast("long")
    total, n = F.sum(micros), F.count(F.lit(1))
    return d.groupBy("label").agg(
        n.alias("n_vecs"),
        F.min("l2_norm").alias("min_norm"),
        F.max("l2_norm").alias("max_norm"),
        ((total - F.pmod(total, n)) / n).cast("long").alias("avg_norm_micros"),
    )


#: k-means geometry: K seed clusters, fixed Lloyd iterations, and the
#: fixed-point quantization scale (1e6 units per 1.0 of embedding).
KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_Q = 1_000_000
#: Embedding dimensionality of the testdata corpus (the oracle unrolls
#: component indices; the Spark side reads the array width directly).
EMB_DIM = 64


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized vectors: component -> floor(x * KMEANS_Q) as BIGINT.
    floor() and BIGINT arithmetic are bit-identical across engines
    (float k-means is partition-order dependent in the centroid fold;
    integer sums are exact wherever rows land)."""
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    # NULL vectors are excluded SYMMETRICALLY with the oracle: a NULL
    # embedding would propagate NULL distances and make the argmin
    # engine-defined (Spark WHEN vs DuckDB row_number order NULLs
    # differently) — the same population rule on both sides keeps the
    # recurrence total. (The testdata corpus has none; the guard is
    # for the contract, not the fixture.)
    return e.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * KMEANS_Q).cast("long"),
        ).alias("q"),
    )


def emb_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means, EXACT under the driver hash: the
    classic iterative-ML workload (public MLlib formulation) run as
    pure DataFrame ops with integer fixed-point arithmetic so the
    DuckDB oracle reproduces every assignment bit-for-bit.

    Recurrence (identical in the unrolled SQL twin):
    - seeds: centroid j = quantized vector of ``vec_id == j`` for
      j < ``KMEANS_K`` (deterministic, no RNG);
    - assign: argmin_j Σ_i (q_i - c_j_i)² — BIGINT squared distances,
      ties broken toward the LOWEST j (strict-less ascending scan here,
      ``ORDER BY dist, j`` in the oracle);
    - update: component-wise truncating integer mean
      ``sum div count`` (Spark ``div`` == DuckDB ``//``, both truncate
      toward zero — probed on negatives);
    - ``KMEANS_ITERS`` assignment rounds with one update between.

    Scale posture: each iteration is one scan + a per-row K×dim
    projection (distances against centroid LITERALS — k-means state is
    tiny and belongs in the plan, the same broadcast-scalars discipline
    as the text family) + one posexplode groupBy over K×dim cells for
    the update; the only driver traffic is the K×dim centroid matrix
    (bounded collect, same class as the IVF/PQ codebook training). At
    100 TB you cache the quantized frame once and the per-iteration
    cost is a single pass; empty clusters drop out of the centroid set
    in both engines identically.

    Returns (vec_id, cluster_id, dist_sq) after the final assignment.
    """
    d = _qvecs(spark, sf_dir)
    cents = [
        (int(r.vec_id), [int(x) for x in r.q])
        for r in sorted(
            d.filter(F.col("vec_id") < KMEANS_K).collect(),
            key=lambda r: r.vec_id,
        )
    ]

    def dist_to(c: list[int]) -> F.Column:
        arr = F.array(*[F.lit(x).cast("long") for x in c])
        return F.aggregate(
            F.zip_with("q", arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def assign(frame: DataFrame, cents_now: list) -> DataFrame:
        scored = frame.select(
            "vec_id",
            "q",
            *[dist_to(c).alias(f"_d{j}") for j, c in cents_now],
        )
        js = [j for j, _ in cents_now]
        best_j = F.lit(js[0]).cast("long")
        best_d = F.col(f"_d{js[0]}")
        for j in js[1:]:
            closer = F.col(f"_d{j}") < best_d
            best_j = F.when(closer, F.lit(j).cast("long")).otherwise(best_j)
            best_d = F.when(closer, F.col(f"_d{j}")).otherwise(best_d)
        return scored.select(
            "vec_id",
            "q",
            best_j.alias("cluster_id"),
            best_d.alias("dist_sq"),
        )

    for it in range(KMEANS_ITERS):
        assigned = assign(d, cents)
        if it == KMEANS_ITERS - 1:
            break
        comp = assigned.select(
            "cluster_id", F.posexplode("q").alias("i", "x")
        )
        sums = comp.groupBy("cluster_id", "i").agg(
            F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
        )
        rows = (
            sums.selectExpr("cluster_id", "i", "s div n AS c")
            .groupBy("cluster_id")
            .agg(
                F.sort_array(F.collect_list(F.struct("i", "c"))).alias("p")
            )
            .select("cluster_id", F.col("p.c").alias("c"))
            .collect()
        )
        cents = sorted(
            (int(r.cluster_id), [int(x) for x in r.c]) for r in rows
        )
    return assigned.select("vec_id", "cluster_id", "dist_sq")


def _kmeans_oracle() -> str:
    """Unrolled twin: one (dist, argmin) CTE pair per assignment round
    and one component-mean CTE per update."""
    qx = (
        "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {KMEANS_Q}) AS BIGINT))"
    )
    dist = (
        f"CAST(list_sum(list_transform(range({EMB_DIM}),"
        " i -> (v.q[i+1] - c.c[i+1]) * (v.q[i+1] - c.c[i+1])))"
        " AS BIGINT)"
    )
    sql = f"""
        WITH q AS (
            SELECT vec_id, {qx} AS q FROM embeddings
            WHERE embedding IS NOT NULL),
        c0 AS (SELECT vec_id AS j, q AS c FROM q WHERE vec_id < {KMEANS_K})"""
    prev = "c0"
    for it in range(1, KMEANS_ITERS + 1):
        sql += f""",
        d{it} AS (
            SELECT v.vec_id, c.j, {dist} AS dist
            FROM q v CROSS JOIN {prev} c),
        a{it} AS (
            SELECT vec_id, j AS cl, dist FROM (
                SELECT vec_id, j, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, j) AS rn
                FROM d{it})
            WHERE rn = 1)"""
        if it < KMEANS_ITERS:
            sql += f""",
        s{it} AS (
            SELECT a.cl, r.range AS i,
                   CAST(SUM(v.q[r.range + 1]) AS BIGINT) AS s,
                   COUNT(*) AS n
            FROM q v JOIN a{it} a USING (vec_id)
            CROSS JOIN range({EMB_DIM}) r
            GROUP BY a.cl, r.range),
        c{it} AS (
            SELECT cl AS j, list(s // n ORDER BY i) AS c
            FROM s{it} GROUP BY cl)"""
            prev = f"c{it}"
    sql += f"""
        SELECT vec_id, CAST(cl AS BIGINT) AS cluster_id, dist AS dist_sq
        FROM a{KMEANS_ITERS}"""
    return sql


# ---------------------------------------------------------------------------
# PCA over the embedding corpus (r11): the dimensionality-reduction pass
# an embedding pipeline runs for whitening / PQ subspace rotation /
# cheap visualization. Spark-first split of the algorithm:
#
# - the GRAMIAN (second-moment matrix) is the distributed part — one
#   scan, per-row upper-triangle outer products in integer micro-units
#   (exact, partition-order independent), one dim²-keyed groupBy whose
#   cardinality is dim(dim+1)/2 = 2,080 cells, NEVER corpus-sized; at
#   100 TB this is a map-side-combined aggregation, the same shape
#   MLlib's computeGramianMatrix uses;
# - the EIGENDECOMPOSITION is a driver-side numpy `eigh` on the exact
#   64×64 matrix (a bounded scalar, the codebook-training class);
# - the PROJECTION is again distributed: top-K eigenvectors enter the
#   plan as literals, each component one zip_with/aggregate fold.
#
# Oracle split mirrors the math: the Gramian is hash-proven cell by
# cell (DuckDB replays the exact integer aggregation); the projection
# is rows-only (eigenvectors are sign/rotation ambiguous), bounded by
# `emb_pca_variance_check` — trace recomputed exactly by DuckDB plus
# three invariants (Σλ == trace(C), top-K mass ≥ K/dim of total — a
# theorem for sorted eigenvalues, not an empirical floor — and PSD).
# ---------------------------------------------------------------------------

PCA_K = 8


def emb_gramian_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle second-moment matrix Σ_v q_i·q_j in exact integer
    micro²-units: (i, j, gram_sum) for 1 ≤ i ≤ j ≤ dim, hash-proven.
    One scan + one groupBy over dim(dim+1)/2 keys."""
    d = _qvecs(spark, sf_dir)
    pairs = d.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(q)), i ->"
                " transform(sequence(i, size(q)), j ->"
                " struct(i AS i, j AS j,"
                " element_at(q, i) * element_at(q, j) AS p))))"
            )
        ).alias("e")
    )
    return (
        pairs.groupBy(
            F.col("e.i").cast("long").alias("i"),
            F.col("e.j").cast("long").alias("j"),
        )
        .agg(F.sum("e.p").cast("long").alias("gram_sum"))
        .orderBy("i", "j")
    )


def _pca_eigh(spark: SparkSession, sf_dir: str):
    """Driver-side tail of the PCA split: assemble the exact Gramian
    and micro-unit means, form the centered covariance (in micro²
    float — exact ints until the final division), and eigendecompose.
    Returns (eigenvalues desc, eigenvectors as rows, n)."""
    import numpy as np

    d = _qvecs(spark, sf_dir)
    rows = emb_gramian_exact(spark, sf_dir).collect()
    sums = d.select(
        F.posexplode("q").alias("pos", "val")
    ).groupBy("pos").agg(F.sum("val").alias("s")).collect()
    n = d.count()
    dim = max(r["pos"] for r in sums) + 1
    mu = np.zeros(dim)
    for r in sums:
        mu[r["pos"]] = r["s"] / n
    g = np.zeros((dim, dim))
    for r in rows:
        g[r["i"] - 1, r["j"] - 1] = r["gram_sum"]
        g[r["j"] - 1, r["i"] - 1] = r["gram_sum"]
    cov = g / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    return w[order], v[:, order], n


def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every vector onto the top-``PCA_K`` principal
    components of the centered covariance (eigenbasis from the exact
    Gramian). Rows-only at the driver — eigenvectors are sign- and
    rotation-ambiguous across LAPACK builds — with the hash-green
    bound twin :func:`emb_pca_variance_check`; pytest pins
    orthonormality and the component-variance ordering. The projection
    itself is JVM-side: each component is one zip_with/aggregate fold
    against literal (mean-centered) eigenvector arrays."""
    import numpy as np

    w, v, _n = _pca_eigh(spark, sf_dir)
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    d = e.filter(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # centering folds into the fold's initial value: (x−μ)·w = x·w − μ·w
    mu = None
    qd = _qvecs(spark, sf_dir)
    sums = qd.select(F.posexplode("q").alias("pos", "val")).groupBy(
        "pos"
    ).agg(F.sum("val").alias("s")).collect()
    n = qd.count()
    dim = max(r["pos"] for r in sums) + 1
    mu = np.zeros(dim)
    for r in sums:
        mu[r["pos"]] = r["s"] / n / KMEANS_Q  # back to raw units
    cols = []
    for k in range(PCA_K):
        wk = v[:, k]
        arr = F.array(*[F.lit(float(x)) for x in wk])
        shift = float(mu @ wk) * KMEANS_Q  # micro-unit shift
        cols.append(
            (
                F.aggregate(
                    F.zip_with("v", arr, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * KMEANS_Q
                - F.lit(shift)
            ).alias(f"pc{k + 1}_micro")
        )
    return d.select("vec_id", *cols).orderBy("vec_id")


def emb_pca_variance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-green bound twin for the PCA tier: the exact Gramian trace
    (DuckDB recomputes it independently in the same integer
    micro²-units) plus three invariants of the eigendecomposition —
    Σλ matches trace(C) to relative 1e-9 (the decomposition conserved
    variance), the top-``PCA_K`` eigenvalue mass is ≥ K/dim of the
    total (a THEOREM for sorted eigenvalues — the mean of the largest
    K is ≥ the overall mean — so the boolean can only flip on a broken
    decomposition, never on data), and PSD up to −1e-9·trace numerical
    tolerance."""
    import numpy as np

    w, _v, n = _pca_eigh(spark, sf_dir)
    d = _qvecs(spark, sf_dir)
    trace_g = (
        d.select(
            F.aggregate(
                F.zip_with("q", "q", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("t")
        )
        .agg(F.sum("t").cast("long").alias("s"))
        .collect()[0]["s"]
    )
    trace_c = float(np.sum(w))
    # trace(C) from the exact pieces: trace(G)/n − |μ|²
    sums = d.select(F.posexplode("q").alias("pos", "val")).groupBy(
        "pos"
    ).agg(F.sum("val").alias("s")).collect()
    mu2 = sum((r["s"] / n) ** 2 for r in sums)
    expect = trace_g / n - mu2
    dim = len(w)
    return spark.createDataFrame(
        [
            (
                int(trace_g),
                bool(abs(trace_c - expect) <= 1e-9 * max(abs(expect), 1.0)),
                bool(
                    float(np.sum(w[:PCA_K])) >= PCA_K / dim * trace_c - 1e-9
                ),
                bool(float(np.min(w)) >= -1e-9 * max(trace_c, 1.0)),
            )
        ],
        "gram_trace bigint, eig_mass_matches_trace boolean,"
        " topk_mass_ge_uniform boolean, psd_ok boolean",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "emb_norm_stats": emb_norm_stats,
    "emb_label_profile": emb_label_profile,
    "emb_kmeans_assign": emb_kmeans_assign,
    "emb_gramian_exact": emb_gramian_exact,
    "emb_pca_project": emb_pca_project,
    "emb_pca_variance_check": emb_pca_variance_check,
}

_NORM_SQL = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"

_QX_SQL = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
    f" * {KMEANS_Q}) AS BIGINT))"
)

ORACLES: dict[str, str] = {
    "emb_kmeans_assign": _kmeans_oracle(),
    # the exact integer Gramian, replayed cell by cell
    "emb_gramian_exact": f"""
        WITH q AS (
            SELECT {_QX_SQL} AS q FROM embeddings
            WHERE embedding IS NOT NULL),
        pairs AS (
            SELECT unnest(flatten(list_transform(
                       generate_series(1, len(q)), i ->
                       list_transform(generate_series(i, len(q)), j ->
                           struct_pack(i := i, j := j,
                                       p := q[i] * q[j]))))) AS e
            FROM q)
        SELECT CAST(e['i'] AS BIGINT) AS i, CAST(e['j'] AS BIGINT) AS j,
               CAST(sum(e['p']) AS BIGINT) AS gram_sum
        FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""",
    # trace recomputed independently; decomposition invariants pinned
    "emb_pca_variance_check": f"""
        SELECT CAST(sum(list_sum(list_transform(q, x -> x * x)))
                    AS BIGINT) AS gram_trace,
               TRUE AS eig_mass_matches_trace,
               TRUE AS topk_mass_ge_uniform,
               TRUE AS psd_ok
        FROM (SELECT {_QX_SQL} AS q FROM embeddings
              WHERE embedding IS NOT NULL)""",
    "emb_norm_stats": f"""
        SELECT vec_id, label,
               CAST(len(embedding) AS BIGINT) AS dim,
               {_NORM_SQL} AS l2_norm,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
                   AS max_abs,
               {QUANT_MAX} / list_max(list_transform(embedding::DOUBLE[],
                   x -> abs(x))) AS quant_scale
        FROM embeddings""",
    "emb_label_profile": f"""
        WITH n AS (SELECT label, {_NORM_SQL} AS l2_norm FROM embeddings)
        SELECT label, count(*) AS n_vecs,
               min(l2_norm) AS min_norm, max(l2_norm) AS max_norm,
               CAST(sum(CAST(round(l2_norm * 1000000) AS BIGINT)) // count(*)
                    AS BIGINT) AS avg_norm_micros
        FROM n GROUP BY label""",
}
