"""Driver-checkable bound twins for the sketch/ANN tier.

The five probabilistic entries (``approx_count_distinct`` HLL++,
``approx_percentile`` GK, ``approx_top_k``, LSH top-k, IVF top-k) can
never have a value-hash oracle: their outputs are implementation-
defined. Their error bounds, however, are deterministic FACTS about a
fixed dataset — so each family gets a registered check query that
computes the approximate AND exact answers in one Spark job and emits
``within_bound`` booleans; the DuckDB oracle is the corresponding
all-``TRUE`` frame. That converts "trust our pytest" into a driver hash
row, without pretending sketches are deterministic (VERDICT.md round 3,
Next #3).

Scale posture: every check reuses the production operators' plans
(banded/bucketed candidates, broadcast 1-row bound frames); the exact
twin riding alongside is the cost of the PROOF, not of the production
path — at 100 TB you run the sketch alone and carry the bound from the
sketch's published guarantee.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .features import _docs
from .similarity import (
    DEL_COMPACTED,
    DEL_MOD,
    DEL_PENDING,
    DELIVERY_MOD,
    N_QUERIES,
    TOP_K,
    sim_bruteforce_topk,
    sim_delete_brute_topk,
    sim_delete_ivf_topk,
    sim_delivery_brute_topk,
    sim_incremental_ivf,
    sim_ivf_topk,
    sim_ivfpq_topk,
    sim_lsh_topk,
    sim_persisted_delete_ivf_topk,
    sim_persisted_delivery_topk,
    sim_persisted_ivf_topk,
    sim_persisted_ivfpq_topk,
    sim_persisted_pq_topk,
    sim_pq_topk,
)
from .temporal import APPROX_ACCURACY, _events

#: Default tracked-item budget for the approx_top_k containment check —
#: interpolated into both the Spark call and the oracle so the two
#: can't desync.
VOCAB_CHECK_K = 20

#: Recall floors: well under the measured recalls (LSH 0.80-0.85,
#: IVF 0.88-0.95 across SFs) but far above chance — the same floors
#: tests/test_extensions.py asserts.
LSH_RECALL_FLOOR = 0.7
IVF_RECALL_FLOOR = 0.8
PQ_RECALL_FLOOR = 0.7
IVFPQ_RECALL_FLOOR = 0.7
#: Delivery queries are OUT-of-corpus (searched against a base that
#: excludes them), so their recall runs lower than the in-corpus IVF
#: tier: measured 0.706-0.776 across SFs.
INCREMENTAL_RECALL_FLOOR = 0.6
#: The stream-maintained index serves in-corpus queries, but its
#: centroids were trained on the BASE sample only (the delivery is
#: assigned post-hoc, streaming-ingest style), so it runs below the
#: full-corpus-trained IVF tier: measured 0.725-0.85 across SFs.
MAINTAINED_RECALL_FLOOR = 0.65
#: The delete tier searches in-corpus queries against a compacted +
#: tombstone-masked index — measured 0.80-0.93 across SFs (sf0.1 sits
#: at 0.80 exactly, so the floor leaves a margin below the measured
#: minimum rather than riding the knife edge).
DELETE_RECALL_FLOOR = 0.75

#: HLL++ is run at rsd=0.02; 5 sigma = 10% relative slack, plus an
#: absolute slack of 2 so single-digit groups can't trip the ratio.
HLL_REL_BOUND = 0.10

#: GK rank-error slack: the sketch guarantees eps = 1/accuracy; check
#: at 10x that (plus 1 row) so merge-order wiggle never flakes the row.
GK_EPS = 10.0 / APPROX_ACCURACY


def approx_distinct_error_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation |HLL++ - exact| <= max(10% of exact, 2).

    Same join/group shape as ``approx_distinct_customers_by_nation``
    with the exact COUNT(DISTINCT) riding the same shuffle, so one job
    proves the sketch's error bound group-by-group."""
    t = load_tables(spark, sf_dir, names=("orders", "customer", "nation"))
    agg = (
        t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
    )
    bound = F.greatest(
        F.ceil(F.col("exact") * F.lit(HLL_REL_BOUND)), F.lit(2)
    )
    return agg.select(
        "nation",
        (F.abs(F.col("approx") - F.col("exact")) <= bound).alias(
            "within_bound"
        ),
    ).orderBy("nation")


def approx_percentile_error_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type rank-space check of the GK percentile sketch.

    A value-space tolerance would need distribution knowledge; the
    sketch's actual contract is rank error <= eps*n, which IS checkable
    exactly: count(value < p_hat) must not exceed q*n + eps*n and
    count(value <= p_hat) must reach q*n - eps*n."""
    e = _events(spark, sf_dir)
    pair = F.expr(
        f"approx_percentile(value, array(0.5, 0.9), {APPROX_ACCURACY})"
    )
    appr = (
        e.groupBy("event_type")
        .agg(pair.alias("ap"))
        .select(
            "event_type",
            F.col("ap")[0].alias("p50"),
            F.col("ap")[1].alias("p90"),
        )
    )
    j = e.select("event_type", "value").join(F.broadcast(appr), "event_type")
    cnt = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("value") <= F.col("p50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("p50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("p90")).cast("long")).alias("le90"),
        F.sum((F.col("value") < F.col("p90")).cast("long")).alias("lt90"),
    )

    def rank_ok(le, lt, q):
        slack = F.lit(GK_EPS) * F.col("n") + F.lit(1.0)
        target = F.lit(q) * F.col("n")
        return (F.col(le) >= target - slack) & (F.col(lt) <= target + slack)

    return cnt.select(
        "event_type",
        rank_ok("le50", "lt50", 0.5).alias("p50_ok"),
        rank_ok("le90", "lt90", 0.9).alias("p90_ok"),
    ).orderBy("event_type")


def _recall_check(
    spark: SparkSession,
    sf_dir: str,
    approx_fn: Callable[[SparkSession, str], DataFrame],
    floor: float,
    baseline_fn: Callable[[SparkSession, str], DataFrame] = sim_bruteforce_topk,
) -> DataFrame:
    """Overall top-k recall of ``approx_fn`` vs the exact baseline,
    emitted as one (n_queries, k, recall_ok) row. Both operators are
    deterministic on fixed data (seeded planes/centroids, total tie
    orders), so the boolean is stable run-over-run."""
    bf = baseline_fn(spark, sf_dir).select("query_id", "neighbor_id")
    ap = (
        approx_fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    agg = (
        bf.join(ap, ["query_id", "neighbor_id"], "left")
        .agg(
            F.countDistinct("query_id").alias("n_queries"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                / F.count(F.lit(1))
            ).alias("recall"),
        )
    )
    return agg.select(
        F.col("n_queries").cast("long").alias("n_queries"),
        F.lit(TOP_K).cast("long").alias("k"),
        (F.col("recall") >= F.lit(floor)).alias("recall_ok"),
    )


def sim_lsh_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k recall >= 0.7 vs brute force (measured 0.80-0.85)."""
    return _recall_check(spark, sf_dir, sim_lsh_topk, LSH_RECALL_FLOOR)


def sim_ivf_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k recall >= 0.8 vs brute force (measured 0.88-0.95)."""
    return _recall_check(spark, sf_dir, sim_ivf_topk, IVF_RECALL_FLOOR)


def sim_pq_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k recall >= 0.7 vs brute force (measured 0.85-0.93
    with the 16x32 codebook geometry across SFs)."""
    return _recall_check(spark, sf_dir, sim_pq_topk, PQ_RECALL_FLOOR)


def sim_ivfpq_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k recall >= 0.7 vs brute force (measured 0.825-0.925
    across SFs with residual codebooks at the 16x32 geometry and a
    quarter of the cells probed)."""
    return _recall_check(spark, sf_dir, sim_ivfpq_topk, IVFPQ_RECALL_FLOOR)


def sim_delete_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstoning-IVF recall >= 0.75 vs the exact surviving-corpus
    baseline — and, because ``_recall_check`` left-joins the baseline,
    the hash also proves the approx tier returned NO deleted vector
    the baseline excludes."""
    return _recall_check(
        spark,
        sf_dir,
        sim_delete_ivf_topk,
        DELETE_RECALL_FLOOR,
        baseline_fn=sim_delete_brute_topk,
    )


def sim_persisted_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index READ-PATH recall >= 0.8 vs brute force — same
    floor as the in-process IVF tier, because the persisted index is
    built with the identical quantizer recipe and the read path ranks
    the same candidates (bit-identical results to ``sim_ivf_topk``,
    additionally asserted by tests/test_persisted_ivf.py)."""
    return _recall_check(
        spark, sf_dir, sim_persisted_ivf_topk, IVF_RECALL_FLOOR
    )


def sim_persisted_pq_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted flat-PQ READ-PATH recall >= 0.7 vs brute force — same
    floor as the in-process PQ tier, because the persisted path loads
    the identical codebooks and runs the identical ADC tail
    (bit-identical results, asserted by tests/test_persisted_pq.py)."""
    return _recall_check(spark, sf_dir, sim_persisted_pq_topk, PQ_RECALL_FLOOR)


def sim_persisted_ivfpq_recall_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted IVF-PQ READ-PATH recall >= 0.7 vs brute force — same
    floor as the in-process IVF-PQ tier (identical coarse quantizer +
    residual codebooks loaded from parquet; bit-identical results,
    asserted by tests/test_persisted_pq.py)."""
    return _recall_check(
        spark, sf_dir, sim_persisted_ivfpq_topk, IVFPQ_RECALL_FLOOR
    )


def sim_persisted_delete_recall_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-compacted-index read-path recall >= 0.75 vs the exact
    surviving-corpus baseline — same floor as the in-process delete
    tier, because compaction folds the identical wave split into the
    identically-trained index (bit-identical results, additionally
    asserted by tests/test_persisted_ivf.py)."""
    return _recall_check(
        spark,
        sf_dir,
        sim_persisted_delete_ivf_topk,
        DELETE_RECALL_FLOOR,
        baseline_fn=sim_delete_brute_topk,
    )


def sim_persisted_delivery_recall_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted insert-delta read-path recall >= 0.6 vs the exact
    delivery-vs-base baseline — same floor as the in-process
    incremental tier (bit-identical results, additionally asserted by
    tests/test_persisted_ivf.py)."""
    return _recall_check(
        spark,
        sf_dir,
        sim_persisted_delivery_topk,
        INCREMENTAL_RECALL_FLOOR,
        baseline_fn=sim_delivery_brute_topk,
    )


def sim_incremental_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-IVF delivery recall >= 0.6 vs the exact
    delivery-vs-base baseline (measured 0.706-0.776 — out-of-corpus
    queries run below the in-corpus IVF tier by nature)."""
    return _recall_check(
        spark,
        sf_dir,
        sim_incremental_ivf,
        INCREMENTAL_RECALL_FLOOR,
        baseline_fn=sim_delivery_brute_topk,
    )


def stream_maintained_recall_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-maintained-index READ-PATH recall >= 0.65 vs brute force
    over the full corpus (measured 0.725-0.85 across SFs) — the
    maintained view holds base ∪ delivery (the whole table), but its
    centroids were trained on the base sample only, so it runs below
    the full-corpus-trained IVF tier (bit-identity with a flat reader
    over base ∪ all delta segments is separately asserted by
    tests/test_streamed_index.py)."""
    from ..streaming.index_maintenance import stream_maintained_index_topk

    return _recall_check(
        spark, sf_dir, stream_maintained_index_topk, MAINTAINED_RECALL_FLOOR
    )


# ---------------------------------------------------------------------------
# Bit-equivalence checks (r11 VERDICT Next #2): the rows-only read paths'
# STRONGEST evidence — bit-identity to their in-process / flat-reader
# reference tier — lived only in pytest (test_persisted_pq.py,
# test_persisted_ivf.py, test_streamed_index.py). Each check below computes
# BOTH tiers inside one registered entry and returns the comparison as a
# driver-hashable row: row counts plus an order-insensitive ``bit_xor`` of
# per-row ``xxhash64`` digests (floats hash by their exact bits, so any
# value divergence — not just row churn — flips ``bit_identical``). The
# oracle is the all-TRUE frame: the exact engine agrees the queries exist
# and asserts the equivalence must hold. Scale posture: the reference tier
# riding alongside is the cost of the PROOF — production runs the read
# path alone.
# ---------------------------------------------------------------------------

#: Order-insensitive digest over the shared top-k schema; bit_xor is
#: collision-safe here because (query_id, neighbor_id) pairs are unique
#: within one result (duplicate rows could cancel; these cannot exist).
_TOPK_DIGEST = "bit_xor(xxhash64(query_id, neighbor_id, cosine, rank))"


def _bit_equiv_summary(
    spark: SparkSession,
    read_df: DataFrame,
    ref_df: DataFrame,
    key_col: str,
    digest_expr: str,
    key_alias: str,
) -> DataFrame:
    """One (n_<keys>, rows_equal, bit_identical) row comparing a read
    path against its reference tier. Each side collapses to one bounded
    summary row before comparison — the full results never co-reside."""

    def summarize(df: DataFrame):
        return df.agg(
            F.countDistinct(key_col).alias("nk"),
            F.count(F.lit(1)).alias("n"),
            F.expr(digest_expr).alias("dig"),
        ).collect()[0]

    a, b = summarize(read_df), summarize(ref_df)
    return spark.createDataFrame(
        [
            (
                int(a["nk"]),
                bool(a["n"] == b["n"]),
                bool(a["n"] == b["n"] and a["dig"] == b["dig"]),
            )
        ],
        f"{key_alias} bigint, rows_equal boolean, bit_identical boolean",
    )


def sim_persisted_ivf_equiv_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-IVF read path ≡ in-process ``sim_ivf_topk``, as a
    driver hash row (the tests/test_persisted_ivf.py twin, made
    driver-visible)."""
    return _bit_equiv_summary(
        spark,
        sim_persisted_ivf_topk(spark, sf_dir),
        sim_ivf_topk(spark, sf_dir),
        "query_id",
        _TOPK_DIGEST,
        "n_queries",
    )


def sim_persisted_pq_equiv_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted flat-PQ read path ≡ in-process ``sim_pq_topk`` —
    parquet-round-tripped codebooks (float64 exact) must reproduce the
    training path's ADC scores bit-for-bit."""
    return _bit_equiv_summary(
        spark,
        sim_persisted_pq_topk(spark, sf_dir),
        sim_pq_topk(spark, sf_dir),
        "query_id",
        _TOPK_DIGEST,
        "n_queries",
    )


def sim_persisted_ivfpq_equiv_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted IVF-PQ read path ≡ in-process ``sim_ivfpq_topk`` —
    coarse centroids + residual codebooks from parquet, cell-pruned
    scan and all."""
    return _bit_equiv_summary(
        spark,
        sim_persisted_ivfpq_topk(spark, sf_dir),
        sim_ivfpq_topk(spark, sf_dir),
        "query_id",
        _TOPK_DIGEST,
        "n_queries",
    )


def sim_persisted_delete_equiv_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted compacted-index read path ≡ the in-process delete
    tier — compaction folds the identical wave split into the
    identically-trained index, so answers must match bit-for-bit."""
    return _bit_equiv_summary(
        spark,
        sim_persisted_delete_ivf_topk(spark, sf_dir),
        sim_delete_ivf_topk(spark, sf_dir),
        "query_id",
        _TOPK_DIGEST,
        "n_queries",
    )


def sim_persisted_delivery_equiv_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted insert-delta read path ≡ the in-process incremental
    tier (out-of-corpus delivery queries against base + delta)."""
    return _bit_equiv_summary(
        spark,
        sim_persisted_delivery_topk(spark, sf_dir),
        sim_incremental_ivf(spark, sf_dir),
        "query_id",
        _TOPK_DIGEST,
        "n_queries",
    )


def stream_maintained_equiv_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-maintained index (folds applied + pending deltas) ≡ the
    flat segment-stack reader — compaction must never change an
    answer; the strongest streaming-index invariant, now a hash row."""
    from ..streaming.index_maintenance import (
        stream_flat_stack_index_topk,
        stream_maintained_index_topk,
    )

    return _bit_equiv_summary(
        spark,
        stream_maintained_index_topk(spark, sf_dir),
        stream_flat_stack_index_topk(spark, sf_dir),
        "query_id",
        _TOPK_DIGEST,
        "n_queries",
    )


def text_bpe_deep_apply_equiv_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deep-tier tokenizer read path ≡ a DIRECT application of the same
    persisted vocabulary that MATERIALIZES every token (explode the
    fitted ``tokstr`` per word occurrence and re-aggregate) instead of
    joining pre-counted per-type totals. A physically different plan
    over the same artifact: equality pins both the vocab join and the
    per-type token/char counts the read path trusts."""
    from .text import BPE_S1, BPE_S2, _ensure_bpe_vocab, text_bpe_tokenize_deep

    d = _ensure_bpe_vocab(spark, sf_dir, "deep")
    tok_re = f"{BPE_S1}([^{BPE_S1}{BPE_S2}]*){BPE_S2}"
    vocab = spark.read.parquet(f"{d}/vocab").select(
        "word",
        F.expr(f"regexp_extract_all(tokstr, '{tok_re}', 1)").alias("toks"),
    )
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    doc_words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+", -1)).alias("word"),
    ).filter(F.col("word") != "")
    words_per_doc = doc_words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    toks_per_doc = (
        doc_words.hint("shuffle_hash")
        .join(vocab, "word")
        .select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bpe_tokens"),
            F.sum(F.length("tok")).alias("n_word_chars"),
        )
    )
    direct = (
        docs.select("doc_id")
        .join(words_per_doc, "doc_id", "left")
        .join(toks_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
            F.coalesce(
                F.expr("(n_word_chars * 100) div n_bpe_tokens"), F.lit(0)
            )
            .cast("long")
            .alias("chars_per_token_x100"),
        )
    )
    return _bit_equiv_summary(
        spark,
        text_bpe_tokenize_deep(spark, sf_dir),
        direct,
        "doc_id",
        "bit_xor(xxhash64(doc_id, n_words, n_bpe_tokens,"
        " chars_per_token_x100))",
        "n_docs",
    )


def vocab_topk_containment_check(
    spark: SparkSession, sf_dir: str, k: int = VOCAB_CHECK_K
) -> DataFrame:
    """``approx_top_k`` vs exact token counts, as two booleans: every
    reported count is the true count (the tracked-item budget exceeds
    the corpus's distinct-token cardinality, so the sketch cannot have
    evicted), and every reported item's count reaches the exact k-th
    count (set containment up to boundary ties)."""
    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ", -1)).alias("token"))
        .filter(F.col("token") != "")
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    kth = (
        exact.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
        .agg(F.min("cnt").alias("kth_cnt"))
    )
    approx = (
        toks.agg(F.expr(f"approx_top_k(token, {k}, 100000)").alias("top"))
        .select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").alias("approx_cnt"),
        )
    )
    agg = (
        approx.join(exact, "token", "left")
        .crossJoin(F.broadcast(kth))
        .agg(
            F.min((F.col("approx_cnt") == F.col("cnt")).cast("int")).alias(
                "c_ok"
            ),
            F.min(
                (F.col("approx_cnt") >= F.col("kth_cnt")).cast("int")
            ).alias("b_ok"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return agg.select(
        (F.col("c_ok") == 1).alias("counts_exact_ok"),
        (F.col("b_ok") == 1).alias("boundary_ok"),
        F.col("n_items").cast("long").alias("n_items"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "approx_distinct_error_check": approx_distinct_error_check,
    "approx_percentile_error_check": approx_percentile_error_check,
    "sim_lsh_recall_check": sim_lsh_recall_check,
    "sim_ivf_recall_check": sim_ivf_recall_check,
    "sim_pq_recall_check": sim_pq_recall_check,
    "sim_ivfpq_recall_check": sim_ivfpq_recall_check,
    "sim_incremental_recall_check": sim_incremental_recall_check,
    "sim_delete_recall_check": sim_delete_recall_check,
    "sim_persisted_recall_check": sim_persisted_recall_check,
    "sim_persisted_pq_recall_check": sim_persisted_pq_recall_check,
    "sim_persisted_ivfpq_recall_check": sim_persisted_ivfpq_recall_check,
    "sim_persisted_delete_recall_check": sim_persisted_delete_recall_check,
    "sim_persisted_delivery_recall_check": sim_persisted_delivery_recall_check,
    "stream_maintained_recall_check": stream_maintained_recall_check,
    "sim_persisted_ivf_equiv_check": sim_persisted_ivf_equiv_check,
    "sim_persisted_pq_equiv_check": sim_persisted_pq_equiv_check,
    "sim_persisted_ivfpq_equiv_check": sim_persisted_ivfpq_equiv_check,
    "sim_persisted_delete_equiv_check": sim_persisted_delete_equiv_check,
    "sim_persisted_delivery_equiv_check": sim_persisted_delivery_equiv_check,
    "stream_maintained_equiv_check": stream_maintained_equiv_check,
    "text_bpe_deep_apply_equiv_check": text_bpe_deep_apply_equiv_check,
    "vocab_topk_containment_check": vocab_topk_containment_check,
}

ORACLES: dict[str, str] = {
    # The oracle side of a bound check is the bound itself: the exact
    # engine agrees the groups exist and asserts TRUE per group.
    "approx_distinct_error_check": """
        SELECT DISTINCT n.n_name AS nation, TRUE AS within_bound
        FROM nation n
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        ORDER BY nation""",
    "approx_percentile_error_check": """
        SELECT DISTINCT event_type, TRUE AS p50_ok, TRUE AS p90_ok
        FROM events ORDER BY event_type""",
    "sim_lsh_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_incremental_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}""",
    "sim_delete_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}
          AND vec_id % {DEL_MOD} != {DEL_COMPACTED}
          AND vec_id % {DEL_MOD} != {DEL_PENDING}""",
    "sim_ivf_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_persisted_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "stream_maintained_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_persisted_delete_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}
          AND vec_id % {DEL_MOD} != {DEL_COMPACTED}
          AND vec_id % {DEL_MOD} != {DEL_PENDING}""",
    "sim_persisted_delivery_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}""",
    "sim_pq_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_persisted_pq_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_persisted_ivfpq_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_ivfpq_recall_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST({TOP_K} AS BIGINT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "vocab_topk_containment_check": f"""
        SELECT TRUE AS counts_exact_ok, TRUE AS boundary_ok,
               CAST({VOCAB_CHECK_K} AS BIGINT) AS n_items""",
    # bit-equivalence checks: the exact engine agrees the query set /
    # corpus exists and asserts the equivalence booleans must hold
    "sim_persisted_ivf_equiv_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS rows_equal, TRUE AS bit_identical
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_persisted_pq_equiv_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS rows_equal, TRUE AS bit_identical
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_persisted_ivfpq_equiv_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS rows_equal, TRUE AS bit_identical
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "stream_maintained_equiv_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS rows_equal, TRUE AS bit_identical
        FROM embeddings WHERE vec_id < {N_QUERIES}""",
    "sim_persisted_delete_equiv_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS rows_equal, TRUE AS bit_identical
        FROM embeddings WHERE vec_id < {N_QUERIES}
          AND vec_id % {DEL_MOD} != {DEL_COMPACTED}
          AND vec_id % {DEL_MOD} != {DEL_PENDING}""",
    "sim_persisted_delivery_equiv_check": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS rows_equal, TRUE AS bit_identical
        FROM embeddings
        WHERE vec_id % {DELIVERY_MOD} = {DELIVERY_MOD - 1}""",
    "text_bpe_deep_apply_equiv_check": """
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               TRUE AS rows_equal, TRUE AS bit_identical
        FROM documents""",
}
