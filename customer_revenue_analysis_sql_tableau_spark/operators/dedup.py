"""Deduplication operators over ``documents``/``embeddings``
(driver mandate, SURVEY §7.5).

Five families, each a ``queries()`` entry:

1. **Exact** — hash-groupBy on normalized text (md5). SQL-checked.
2. **N-gram Jaccard** — word-3-shingle inverted-index pair join with
   exact Jaccard ≥ τ. SQL-checked. This is also the *verify* stage the
   LSH path reuses.
3. **MinHash + LSH** — 64-permutation signature (xxhash64 over salted
   shingles), 16 bands × 4 rows, band-bucket self-join for candidates,
   exact-Jaccard verification. Rows-only for the driver (engine hash
   functions differ); pytest asserts its output equals the exact
   pair set from (2) — LSH recall at J≥0.8 with these parameters is
   1-(1-J⁴)¹⁶ ≈ 0.9998.
4. **SimHash** — 60-bit signature from md5-prefix token-hash votes
   (portable, so the oracle rebuilds it exactly), 4×15-bit block LSH
   (hamming ≤ 3 ⇒ one block exact by pigeonhole), bit_count(xor)
   verification. SQL-checked.
5. **Embedding cosine** — near-dup pairs with cosine ≥ τ, blocked by
   ``label`` (the blocking a 100 TB run needs anyway). SQL-checked:
   the fold-based dot product is bit-identical to DuckDB's
   ``list_dot_product``.

Scale posture: nothing here is quadratic in the corpus — candidate
generation is bounded by shared shingles / LSH buckets / label blocks;
at 100 TB, (2) runs only as the verifier behind (3)'s candidates (the
docstring of each function says which side it plays). All hashing is
JVM ``xxhash64``; no Python in any hot path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from .text import TOKENS_EXPR, TOKENS_SQL

#: Word-shingle width for near-dup detection.
SHINGLE_K = 3
#: Jaccard threshold for a "near duplicate".
JACCARD_T = 0.8
#: MinHash permutations and LSH banding (16 bands × 4 rows).
NUM_PERM = 64
LSH_BANDS = 16
#: SimHash hamming radius.
SIMHASH_RADIUS = 3
#: Cosine threshold for embedding near-dups (testdata max ≈ 0.48).
COSINE_T = 0.4

#: DuckDB twin of the Spark shingle expression built inside
#: ``_doc_shingles`` (1-based lists). The Spark side intentionally has
#: no exported string form: it must reference a materialized ``toks``
#: column, never re-inline the tokenizer (see ``_doc_shingles``).
SHINGLES_SQL = (
    f"CASE WHEN len({TOKENS_SQL}) < {SHINGLE_K} THEN [array_to_string({TOKENS_SQL}, ' ')] "
    f"ELSE list_distinct(list_transform(range(1, len({TOKENS_SQL}) - {SHINGLE_K - 2}), "
    f"i -> {TOKENS_SQL}[i] || ' ' || {TOKENS_SQL}[i+1] || ' ' || {TOKENS_SQL}[i+2])) END"
)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 over normalized text, keep min doc_id per group."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return (
        d.selectExpr("doc_id", "md5(lower(trim(text))) AS text_hash")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _doc_shingles(d: DataFrame) -> DataFrame:
    # Tokenize ONCE into a column, then shingle from the column:
    # inlining TOKENS_EXPR into the transform() lambda re-runs the
    # split per element access (O(tokens²) regex work per doc — was
    # the whole minhash pipeline's bottleneck).
    #
    # NOT repartitioned (unlike the edit-distance gram build): an
    # interleaved A/B at sf0.1 measured only 0.84 → 0.80 s for the
    # shingle+signature pass — the one-file scan is not the bottleneck
    # here — and this helper also runs on streaming micro-batches
    # (dedup_ingest), where a forced 32-way shuffle of raw text per
    # batch is pure overhead.
    toks = d.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    shingles = (
        f"CASE WHEN size(toks) < {SHINGLE_K} THEN array(array_join(toks, ' ')) "
        f"ELSE array_distinct(transform(sequence(0, size(toks) - {SHINGLE_K}), "
        f"i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) END"
    )
    # shingle identity is all downstream ops need (set intersection,
    # min-hashing, bucket joins) — carry a 64-bit hash, not the string:
    # joins and shuffles move 8 bytes per shingle and compare longs.
    return toks.selectExpr(
        "doc_id", f"explode(transform({shingles}, s -> xxhash64(s))) AS shingle"
    )


def _jaccard_pairs_from_candidates(
    shingles: DataFrame, candidates: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (d1, d2) pairs."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = shingles.alias("s1")
    s2 = shingles.alias("s2")
    inter = (
        candidates.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(
            s2,
            (F.col("d2") == F.col("s2.doc_id"))
            & (F.col("s1.shingle") == F.col("s2.shingle")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    z1 = sizes.alias("z1")
    z2 = sizes.alias("z2")
    return (
        inter.join(z1, F.col("d1") == F.col("z1.doc_id"))
        .join(z2, F.col("d2") == F.col("z2.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("inter")
                / (F.col("z1.n") + F.col("z2.n") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard via inverted shingle index.

    Candidate pairs = pairs sharing ≥1 shingle (classic inverted-index
    similarity join); exact at any scale where the index join fits —
    at 100 TB this runs as the verifier behind the MinHash-LSH
    candidates instead of the full index join.
    """
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    sh = _doc_shingles(d)
    # shuffle_hash on the build side: the posting-list self-join needs
    # no sort order downstream (it feeds a hash re-aggregation), so the
    # SMJ/broadcast strategies' sort or duplicate-build work is pure
    # waste — measured -35% on dedup_containment's identical shape at
    # sf0.1 (the q21 recipe; SHJ spills rather than OOMs under skew,
    # and the prefix-filtered twin remains the adversarial-skew path).
    a, b = sh.alias("a"), sh.hint("shuffle_hash").alias("b")
    # shingles are distinct per doc, so grouping the index join by pair
    # counts |intersection| DIRECTLY — no separate candidate list and
    # no re-join of the shingle frame for verification.
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    z1, z2 = sizes.alias("z1"), sizes.alias("z2")
    return (
        inter.join(z1, F.col("d1") == F.col("z1.doc_id"))
        .join(z2, F.col("d2") == F.col("z2.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("inter")
                / (F.col("z1.n") + F.col("z2.n") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
    )


#: One-sided containment threshold: |A∩B| / min(|A|,|B|) ≥ τ flags a
#: pair where the smaller shingle set is mostly inside the larger one.
#: The exact rational (3/5) backs the prefix-filter bound — integer
#: arithmetic there, never ceil(0.6·n) (see dedup_containment_prefix).
CONTAIN_T = 0.6
CONTAIN_NUM, CONTAIN_DEN = 3, 5


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by one-sided n-gram containment.

    Jaccard misses asymmetric duplication — a short document quoted
    wholesale inside a much longer one has tiny |A∩B|/|A∪B| but
    containment |A∩B|/|A| ≈ 1. Training-data pipelines use exactly this
    signal to drop quoted/excerpted copies that survive Jaccard dedup
    (the suffix-array containment pass of large-corpus dedup, here
    approximated at shingle granularity).

    Same inverted-index shape as ``dedup_ngram_jaccard`` — candidate
    pairs share ≥1 shingle, |intersection| counted directly by the
    index join, so cost is bounded by shingle-posting-list sizes, never
    all-pairs. At 100 TB this runs behind MinHash-LSH candidates like
    the Jaccard verifier does. SQL-checked.
    """
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return _containment_simple_from(_doc_shingles(d).localCheckpoint())


def _containment_candidates_simple(sh: DataFrame) -> DataFrame:
    """Candidate (d1, d2, inter) triples of the plain inverted-index
    join: every ordered pair sharing ≥1 shingle, intersection counted
    directly by the index join. A shingle shared by k docs contributes
    k·(k−1)/2 rows here — the quadratic hot-posting-list cost the
    prefix filter exists to avoid."""
    # shuffle_hash: no downstream sort-order need (hash re-agg follows);
    # same rationale + measurement as dedup_ngram_jaccard's join
    a, b = sh.alias("a"), sh.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def _containment_simple_from(sh: DataFrame) -> DataFrame:
    """Containment pairs from a (doc_id, shingle) frame — the testable
    unit behind :func:`dedup_containment` (the Zipfian-skew A/B test
    feeds a synthetic skewed corpus through both forms)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = _containment_candidates_simple(sh)
    z1, z2 = sizes.alias("z1"), sizes.alias("z2")
    c_small = F.col("inter") / F.least(F.col("z1.n"), F.col("z2.n")).cast(
        "double"
    )
    return (
        inter.join(z1, F.col("d1") == F.col("z1.doc_id"))
        .join(z2, F.col("d2") == F.col("z2.doc_id"))
        .select(
            "d1",
            "d2",
            (F.col("inter") / F.col("z1.n").cast("double")).alias("contain_d1"),
            (F.col("inter") / F.col("z2.n").cast("double")).alias("contain_d2"),
            c_small.alias("containment"),
        )
        .filter(F.col("containment") >= CONTAIN_T)
    )


def dedup_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs via PPJoin-style prefix filtering — the 100 TB
    form of :func:`dedup_containment`, same output set (SQL-checked
    against the same oracle; pytest asserts pair-set equality).

    The plain inverted-index join explodes on ubiquitous shingles: a
    shingle shared by k docs contributes k² candidate rows, so posting
    lists of common shingles dominate at corpus scale. Prefix filtering
    bounds that: a pair with containment ≥ τ must share at least one of
    the smaller doc's (|S| − ⌈τ·|S|⌉ + 1) *globally rarest* shingles
    (pigeonhole), so candidate generation joins only that prefix —
    ~40 % of the smaller side here, and crucially the prefix is built
    from the LOW-document-frequency end, so the quadratic hot posting
    lists never enter the candidate join. Verification then counts the
    full intersection for candidates only.

    A/B at sf0.1 (5 k docs, short postings): simple join 1.97 s, this
    3.40 s — the DF + rank passes don't pay off until posting-list
    skew does; the registered bench entry stays the simple form, this
    is the shape to deploy once shingle DF is Zipfian at corpus scale.
    """
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return _containment_prefix_from(_doc_shingles(d).localCheckpoint())


def _containment_candidates_prefix(sh: DataFrame) -> DataFrame:
    """Distinct candidate pairs certified by the PPJoin prefix filter:
    only the smaller doc's (n − ⌈τn⌉ + 1) globally-rarest shingles
    enter the join, so hot posting lists never generate candidates."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .join(sizes, "doc_id")
    )
    # prefix length = n − ⌈τ·n⌉ + 1 in EXACT integer arithmetic:
    # ⌈3n/5⌉ = (3n + 4) div 5. The double form ceil(0.6 * n) rounds UP
    # when τ·n is integral (0.6*5 → 3.0000000000000004 → ceil 4),
    # silently undersizing the prefix by one and breaking the
    # pigeonhole guarantee for pairs sitting exactly at τ.
    ceil_tn = F.floor(
        (F.lit(CONTAIN_NUM) * F.col("n") + F.lit(CONTAIN_DEN - 1))
        / F.lit(CONTAIN_DEN)
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - ceil_tn + 1
    ).select("doc_id", "shingle", "n")
    full = sh.join(sizes, "doc_id")
    a, b = prefix.alias("a"), full.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            # only the SMALLER side's prefix certifies a pair
            & (F.col("a.n") <= F.col("b.n")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("d1"),
            F.greatest("a.doc_id", "b.doc_id").alias("d2"),
        )
        .distinct()
    )


def _containment_prefix_from(sh: DataFrame) -> DataFrame:
    """Prefix-filtered containment pairs from a (doc_id, shingle)
    frame — the testable unit behind :func:`dedup_containment_prefix`."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cand = _containment_candidates_prefix(sh)
    s1, s2 = sh.alias("s1"), sh.alias("s2")
    inter = (
        cand.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(
            s2,
            (F.col("d2") == F.col("s2.doc_id"))
            & (F.col("s1.shingle") == F.col("s2.shingle")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    z1, z2 = sizes.alias("z1"), sizes.alias("z2")
    return (
        inter.join(z1, F.col("d1") == F.col("z1.doc_id"))
        .join(z2, F.col("d2") == F.col("z2.doc_id"))
        .select(
            "d1",
            "d2",
            (F.col("inter") / F.col("z1.n").cast("double")).alias("contain_d1"),
            (F.col("inter") / F.col("z2.n").cast("double")).alias("contain_d2"),
            (
                F.col("inter")
                / F.least(F.col("z1.n"), F.col("z2.n")).cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= CONTAIN_T)
    )


def _minhash_signatures_from(sh: DataFrame) -> DataFrame:
    """64-permutation MinHash signature per doc: sig[i] = min over
    shingles of xxhash64(i-salted shingle). One shuffle (groupBy doc)."""
    # each permutation re-hashes the fixed-width long (cheap) instead
    # of re-hashing shingle strings NUM_PERM times per row.
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(NUM_PERM)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return _minhash_signatures_from(_doc_shingles(d))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs, exact-Jaccard verified.

    Banding: 16 bands of 4 rows; a pair lands in the same bucket for
    band b iff their 4 signature rows agree → candidate. Candidates are
    then exact-verified, so precision is 1.0 and recall at J≥0.8 is
    ≈0.9998. The band join shuffles on (band, band_hash) — bounded by
    bucket sizes, never all-pairs. Rows-only oracle (hash functions are
    engine-specific); pytest proves equality with dedup_ngram_jaccard.

    The tokenized shingle frame is materialized ONCE (localCheckpoint)
    and feeds both the signature pass and the exact-Jaccard verifier:
    without it the plan re-tokenizes the corpus four times (signature +
    both verify aliases + sizes) — tokenization dominates the pipeline.
    At 100 TB the same role is played by persist(DISK_ONLY) or a
    checkpoint to cluster storage.

    The band self-join is pinned ``shuffle_hash`` (r16, guide §3.1 +
    §2.1): left to the optimizer it BROADCAST one side of the banded
    frame — a corpus-sized relation at scale (the r15 view-fill hazard
    class), and the broadcast subtree rebuilt the final 64-min
    signature aggregate + band explode a second time. With both sides
    shuffling on (band, bucket) the two subtrees canonicalize equal and
    AQE stage reuse shares ONE banded build (executed plan: signature
    final-aggs 2 → 1, corpus broadcast gone, +1 ReusedExchange;
    interleaved A/B a wash at sf0.1 — 1.703 vs 1.712 min-of-4 — the
    win is structural, plans/r16/spike_minhash_shj.py).
    """
    sh, banded = _banded_signatures(spark, sf_dir)
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return _jaccard_pairs_from_candidates(sh, candidates, JACCARD_T)


def _banded_signatures(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(shingles, banded) frames shared by both candidate strategies."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    sh = _doc_shingles(d).localCheckpoint()
    sig = _minhash_signatures_from(sh)
    rows_per_band = NUM_PERM // LSH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    return sh, banded


def dedup_minhash_lsh_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`dedup_minhash_lsh` with grouped candidate generation: one
    ``groupBy(band, bucket) → collect_list(doc_id)`` and in-partition
    JVM pairing (``transform``/``slice``) instead of the band
    self-join. Same verified output (same oracle).

    Trade vs the self-join: ONE shuffle of the banded rows instead of
    two join sides, and no join-key sort — but each bucket's ids ride
    as one array, so per-bucket memory is O(bucket²) at pair-explode
    time. For MinHash banding buckets are near-dup clusters (small by
    construction), so the grouped form wins; under adversarial bucket
    skew the self-join degrades more gracefully. A/B measured at sf0.1
    in BENCH (see SCALE.md)."""
    sh, banded = _banded_signatures(spark, sf_dir)
    pairs_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> "
        "struct(least(x, y) AS d1, greatest(x, y) AS d2))))"
    )
    candidates = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.d1", "p.d2")
        .distinct()
    )
    return _jaccard_pairs_from_candidates(sh, candidates, JACCARD_T)


#: Incremental-ingest split: docs with doc_id % MOD == 0 play the
#: "incoming delivery", the rest the already-indexed base corpus.
INC_DELIVERY_MOD = 10


def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the production shape of near-dup
    detection: an INCOMING delivery is matched against the EXISTING
    corpus's LSH index, never corpus × corpus. Candidates come from an
    asymmetric band join (incoming banded rows ⋈ base banded rows on
    (band, bucket)), then exact-Jaccard verification, emitting
    (new_doc_id, base_doc_id, jaccard) at the same threshold as the
    self-join entries.

    Scale posture: at 100 TB the base side's banded signatures are a
    PERSISTED index (written once at ingest, appended per delivery), so
    per-delivery cost is |delivery| × bucket occupancy — independent of
    corpus self-pair counts; the incoming side is small, so the band
    join broadcasts or shuffles only delivery-sized data. This demo
    recomputes both sides from the one ``documents`` table (docs with
    ``doc_id % INC_DELIVERY_MOD == 0`` are the delivery), which is the
    index-build cost, not the steady-state match cost. Oracle: the
    exact-Jaccard pair SQL restricted to cross-side pairs, oriented
    new→base — banding recall at J ≥ T is 1.0 on this corpus (proven
    by the self-join entries), so the hash matches exactly."""
    sh, banded = _banded_signatures(spark, sf_dir)
    is_new = F.pmod(F.col("doc_id"), INC_DELIVERY_MOD) == 0
    newb = banded.filter(is_new).alias("nb")
    baseb = banded.filter(~is_new).alias("bb")
    candidates = (
        newb.join(
            baseb,
            (F.col("nb.band") == F.col("bb.band"))
            & (F.col("nb.bucket") == F.col("bb.bucket")),
        )
        .select(
            F.col("nb.doc_id").alias("d1"), F.col("bb.doc_id").alias("d2")
        )
        .distinct()
    )
    return _jaccard_pairs_from_candidates(sh, candidates, JACCARD_T).select(
        F.col("d1").alias("new_doc_id"),
        F.col("d2").alias("base_doc_id"),
        "jaccard",
    )


def dedup_survivors_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup survivor selection by QUALITY, not by id: per connected
    component, keep the highest-quality member (composite score from
    ``text.quality_scored``, doc_id tie-break). This is the retention
    policy production dedup actually ships — min-id survivors throw
    away the best copy whenever a cleaner duplicate has a larger id.
    Components come from the distributed min-label propagation; the
    policy is one per-component window over |corpus| rows."""
    from .text import quality_scored

    comp = dedup_components_distributed(spark, sf_dir)
    scored = quality_scored(
        load_tables(spark, sf_dir, names=("documents",))["documents"]
    ).select("doc_id", "quality_score")
    j = comp.join(scored, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return j.select(
        "doc_id",
        "component_id",
        "quality_score",
        (F.row_number().over(w) == 1).alias("kept"),
    )


#: SimHash geometry: 60-bit signatures (an md5-prefix token hash both
#: engines compute identically — 15 hex chars), 4 blocks × 15 bits.
SIMHASH_BITS = 60
SIMHASH_BLOCKS = 4
#: Portable 60-bit token hash (Spark side; `_TOKEN_H60_SQL` is the twin).
_TOKEN_H60 = "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
_TOKEN_H60_SQL = "CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)"


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc: bit b is the sign of the vote sum of
    token-hash bit b over all token occurrences (tf-weighted).

    Entirely per-row (token array → hash array → 60 array-aggregate
    votes → packed long): no explode, no shuffle — the signature step
    is embarrassingly parallel at any scale. (The earlier explode +
    per-bit hash aggregate shuffled every token occurrence and was
    ~3× slower; votes are identical since ``aggregate`` over the token
    array sees the same tf-weighted occurrences.) The token hash is an
    md5 prefix rather than xxhash64 so the DuckDB oracle reproduces the
    signatures — and therefore the pair set — exactly."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    # hash each token ONCE into an array column; each bit's vote then
    # folds over fixed-width longs, never re-hashing strings.
    hs = d.selectExpr(
        "doc_id", f"transform({TOKENS_EXPR}, t -> {_TOKEN_H60}) AS hs"
    )
    votes = hs.selectExpr(
        "doc_id",
        *[
            f"aggregate(hs, 0L, (acc, h) -> acc +"
            f" IF(((h >> {b}) & 1L) = 1L, 1L, -1L)) AS v{b}"
            for b in range(SIMHASH_BITS)
        ],
    )
    sig = votes.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.col(f"v{b}") > 0,
                    F.shiftleft(F.lit(1).cast("long"), b),
                ).otherwise(F.lit(0).cast("long"))
                for b in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming radius 3.

    4×15-bit block LSH: any pair at hamming ≤3 shares ≥1 exact block
    (pigeonhole), so candidates = same (block_idx, block_value);
    verification is ``bit_count(xor) <= 3``. Hash-verified: the DuckDB
    oracle rebuilds the same md5-prefix signatures, blocks, and filter.
    """
    # materialize signatures (16 bytes/doc) before the self-join: the
    # two join sides would otherwise each re-run the whole signature
    # computation (Spark does not reuse the exchange across aliases here)
    sig = simhash_signatures(spark, sf_dir).localCheckpoint()
    bits_per_block = SIMHASH_BITS // SIMHASH_BLOCKS
    mask = (1 << bits_per_block) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), bits_per_block * i)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(SIMHASH_BLOCKS)
        ]
    )
    blocked = sig.select("doc_id", "simhash", F.explode(blocks).alias("bb")).select(
        "doc_id",
        "simhash",
        F.col("bb.blk").alias("blk"),
        F.col("bb.val").alias("val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_RADIUS)
    )


#: Shared cosine expression: fold-based dot product over double arrays —
#: bit-identical to DuckDB's list_dot_product (verified empirically).
def _cos(a: str, b: str) -> F.Column:
    def dot(x, y):
        return F.aggregate(
            F.zip_with(F.col(x), F.col(y), lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ τ within a ``label`` block.

    Blocking keeps the pair space linear-ish (B blocks of n/B rows);
    at 100 TB the block key would come from coarse LSH/IVF assignment
    (see similarity.py) instead of a given label.
    """
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = ed.alias("a"), ed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            F.col("a.label").alias("label"),
            _cos("a.v", "b.v").alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_T)
    )


#: Sign-bit (axis-aligned hyperplane) LSH geometry for embedding
#: near-dup blocking: 2 bands × 8 sign bits (dims 0-7 and 8-15).
SIGN_LSH_BANDS = 2
SIGN_LSH_BITS = 8


def _sign_bucket(vcol: str, start: int, nbits: int) -> F.Column:
    """Pack the signs of dims [start, start+nbits) into a long bucket."""
    terms = [
        F.when(
            F.col(vcol).getItem(start + j) >= 0,
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(nbits)
    ]
    return sum(terms, F.lit(0).cast("long"))


def dedup_embedding_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via sign-bit LSH blocking + exact cosine.

    ``dedup_embedding_cosine`` blocks on a *given* label; this is the
    label-free scale path: each vector is bucketed by the sign pattern
    of 8 coordinates per band (axis-aligned special case of
    signed-random-projection LSH — deterministic, so the DuckDB oracle
    rebuilds the exact same buckets), candidates are same-(band,bucket)
    pairs, and every candidate is exact-cosine verified. Two bands give
    a pair at cosine ≥ τ two independent chances to collide; precision
    is 1.0 by construction. The band join shuffles on (band, bucket) —
    2 rows per vector, never all-pairs. SQL-checked.
    """
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    ed = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                _sign_bucket("v", bi * SIGN_LSH_BITS, SIGN_LSH_BITS).alias(
                    "bucket"
                ),
            )
            for bi in range(SIGN_LSH_BANDS)
        ]
    )
    banded = ed.select("vec_id", F.explode(bands).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"))
        .distinct()
    )
    x, y = ed.alias("x"), ed.alias("y")
    return (
        cand.join(x, F.col("v1") == F.col("x.vec_id"))
        .join(y, F.col("v2") == F.col("y.vec_id"))
        .select("v1", "v2", _cos("x.v", "y.v").alias("cosine"))
        .filter(F.col("cosine") >= COSINE_T)
    )


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over verified near-dup pairs → keep-list.

    Registered entry. Since r16 this delegates to the distributed
    min-label propagation (:func:`dedup_components_distributed`) so no
    registered query path collects a corpus-shaped frame to the driver
    (guide §5 — the verified pair set grows with corpus size). The
    former driver-side union-find lives on as
    :func:`components_unionfind_driver`, the unregistered small-data
    cross-check pytest proves row-identical to every distributed twin.
    Returns (doc_id, component_id = min doc_id in component); same
    DuckDB oracle as both distributed twins.
    """
    return dedup_components_distributed(spark, sf_dir)


def components_unionfind_driver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-side union-find over the (small) verified pair set — the
    small-data twin kept as a TEST-ONLY cross-check (not registered:
    ``collect()`` of the pair set is the driver anti-pattern at corpus
    scale). Returns (doc_id, component_id = min doc_id in component).
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("d1", "d2").collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.d1), find(r.d2)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    mapping = [(k, find(k)) for k in parent]
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    if mapping:
        m = spark.createDataFrame(mapping, "doc_id long, component_id long")
        return (
            d.select("doc_id")
            .join(m, "doc_id", "left")
            .selectExpr("doc_id", "coalesce(component_id, doc_id) AS component_id")
        )
    return d.selectExpr("doc_id", "doc_id AS component_id")


def dedup_components_distributed(
    spark: SparkSession, sf_dir: str, max_iter: int = 10
) -> DataFrame:
    """Distributed connected components: iterative min-label
    propagation over the verified near-dup edge set — the 100 TB path
    the driver-side union-find (`dedup_components`) documents.

    Each round every node takes the min label among itself and its
    neighbors; labels converge to the component's min doc_id in at
    most diameter rounds (near-dup components are near-cliques, so
    2-3 rounds in practice; ``max_iter`` bounds adversarial chains).
    Per round: one join + one groupBy — all executor-side;
    ``localCheckpoint`` truncates the loop's lineage so plans stay
    flat. The driver sees only the per-round changed-row count.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("d1", "d2")
    edges = pairs.union(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).localCheckpoint()  # materialize ONCE — every propagation round
    # joins against edges, and without the checkpoint each round would
    # re-execute the full shingle self-join behind dedup_ngram_jaccard
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    labels = d.select("doc_id", F.col("doc_id").alias("component_id")).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.d2 == labels.doc_id)
            .groupBy(edges.d1.alias("doc_id"))
            .agg(F.min("component_id").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("_nbr_min"), F.col("component_id")),
                ).alias("component_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component_id") != F.col("o.component_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"component labels did not converge within {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter — "
            "returning partial labels would silently under-merge"
        )
    return labels


def dedup_components_bigstar(
    spark: SparkSession, sf_dir: str, max_iter: int = 12
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    rounds (public Kiveris et al. map-reduce formulation) — the
    O(log n)-round algorithm the union-find docstring names for
    100 TB-scale pair counts, now implemented rather than only cited.
    Min-label propagation (:func:`dedup_components_distributed`) needs
    O(diameter) rounds over the full label frame; the star rounds
    instead REWRITE THE EDGE SET, shrinking it toward 2-level stars
    rooted at each component's min node, so long chains collapse
    exponentially and per-round data is the (shrinking) edge list:

    - large-star(u): every neighbor v > u re-attaches to
      m = min(Γ(u) ∪ {u}) — computed here as a window min over the
      symmetric edge frame partitioned by u (no collect_list: hub
      neighborhoods stay distributed; per-partition width = node
      degree, the algorithm's documented hot spot);
    - small-star(u): orient edges (u = max, v = min); every smaller
      neighbor AND u itself re-attach to m = min(Γ⁻(u) ∪ {u});
    - converged when the edge set reaches a fixpoint (exact
      set-difference probe, not a hash signature — a false stop would
      silently under-merge); the fixpoint edges are exactly
      (node → component root).

    Same output contract and DuckDB oracle as the other two component
    entries: (doc_id, component_id = min doc_id), singletons mapping
    to themselves; pytest proves row-identity with the min-label path.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("d1", "d2")
    labels = _star_rounds(pairs, max_iter)
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .selectExpr(
            "doc_id", "coalesce(component_id, doc_id) AS component_id"
        )
    )


def _star_rounds(pairs: DataFrame, max_iter: int = 12) -> DataFrame:
    """Alternate large-star/small-star over a (d1, d2) pair frame to a
    fixpoint; return (doc_id, component_id) for every node that has at
    least one edge (docstring above)."""
    edges = (
        pairs.filter(F.col("d1") != F.col("d2")).distinct().localCheckpoint()
    )
    for _ in range(max_iter):
        sym = edges.select(
            F.col("d1").alias("u"), F.col("d2").alias("v")
        ).union(edges.select(F.col("d2").alias("u"), F.col("d1").alias("v")))
        w = Window.partitionBy("u")
        ls = (
            sym.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("d1"), F.col("m").alias("d2"))
            .filter(F.col("d1") != F.col("d2"))
            .distinct()
        )
        o = ls.select(
            F.greatest("d1", "d2").alias("u"), F.least("d1", "d2").alias("v")
        )
        ss_base = o.withColumn("m", F.min("v").over(Window.partitionBy("u")))
        ss = (
            ss_base.select(F.col("v").alias("d1"), F.col("m").alias("d2"))
            .union(
                ss_base.select(F.col("u").alias("d1"), F.col("m").alias("d2"))
            )
            .filter(F.col("d1") != F.col("d2"))
            .distinct()
            .localCheckpoint()
        )
        changed = ss.subtract(edges).count() + edges.subtract(ss).count()
        edges = ss
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"star rounds did not reach a fixpoint within {max_iter} "
            "iterations; raise max_iter — partial stars would silently "
            "under-merge components"
        )
    # fixpoint edges are (node → root); roots appear only on the right
    roots = edges.select(F.col("d2").alias("doc_id")).distinct().withColumn(
        "component_id", F.col("doc_id")
    )
    return (
        edges.groupBy(F.col("d1").alias("doc_id"))
        .agg(F.min("d2").alias("component_id"))
        .unionByName(roots)
        .groupBy("doc_id")
        .agg(F.min("component_id").alias("component_id"))
    )


#: Edit-distance join: report pairs within ``ED_K`` edits. The
#: candidate stage is the Ed-Join q-gram prefix filter over POSITIONAL
#: grams (public Xiao/Wang/Lin VLDB'08 + the Gravano et al. count
#: filter): one edit destroys at most ``ED_Q`` gram occurrences and
#: shifts survivors by at most ``ED_K`` positions, so two strings
#: within ``ED_K`` edits must share — among the first
#: ``ED_K·ED_Q + 1`` occurrences under ANY shared total order on gram
#: values — at least one gram pair whose positions differ by ≤
#: ``ED_K`` (Ed-Join's location-based mismatch filter). Ordering grams
#: rarest-first keeps the prefix self-join near-linear. The count
#: bound needs at least ``ED_K·ED_Q + 1`` gram occurrences, i.e.
#: ``len ≥ ED_SHORT_MAX + 1``; shorter docs route through an exact
#: length-bucketed fallback (see ``dedup_edit_distance``).
ED_K = 8
ED_Q = 3
ED_PREFIX = ED_K * ED_Q + 1
#: Longest doc whose gram-occurrence count can be ≤ ED_K·ED_Q — the
#: prefix-filter bound is vacuous there ('aaaaaaaa' vs 'bbbbbbbb' is
#: within 8 edits yet shares zero grams), so these docs take the
#: fallback path (ADVICE r8: the filter is lossless only above this).
ED_SHORT_MAX = ED_K * ED_Q + ED_Q - 1  # 26: len-ED_Q+1 <= ED_K*ED_Q


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate pairs within ``ED_K`` edits (unit-cost
    Levenshtein), exact result via a LOSSLESS two-path plan:

    Main path (both docs longer than ``ED_SHORT_MAX`` chars — where
    the q-gram count bound has slack):

    1. positional character ``ED_Q``-grams per doc (occurrences, not
       distinct types: one edit destroys ≤ ``ED_Q`` occurrences and
       shifts the survivors by ≤ ``ED_K`` positions — the Ed-Join
       form, which is what licenses the position filter in step 3);
    2. global gram frequencies (one agg) define the total order
       (count asc, gram asc, pos asc within a doc) — rarest first;
       per-doc prefix = first ``ED_PREFIX`` occurrences in that order;
    3. the candidate set is the prefix self-join on gram (equi-join,
       plan-scan-clean) with BOTH pair-level prunes INSIDE the join
       condition, before the distinct: the length band (|Δlen| ≤ k
       always holds at distance k; prunes ~30× on weak-gram-signal
       text — measured 11.0M → 0.41M pairs at sf0.1) and Ed-Join's
       location-based mismatch filter (|Δpos| ≤ k for the matched
       occurrence pair — a surviving occurrence cannot shift further;
       measured 0.41M → 0.10M pairs at sf0.1, r9);
    4. BANDED verification: ``levenshtein(text_a, text_b, ED_K)`` —
       the threshold form runs the banded DP, O(k·len) per pair
       instead of O(len²), returning the exact distance when ≤ k and
       -1 otherwise (measured 18.3 s → well under 1 s).

    Fallback path (docs with ≤ ``ED_SHORT_MAX`` chars, where the
    count bound is vacuous — e.g. 'aaaaaaaa' vs 'bbbbbbbb' is within
    ``ED_K`` edits yet shares zero grams, ADVICE r8): every such doc
    is paired against ALL docs within the length band (partner len ≤
    ``ED_SHORT_MAX + ED_K``) via a length-BUCKET equi-join (bucket
    width k+1, explode one side to its 3 adjacent buckets — no
    cartesian), then banded-verified. Exactness needs no gram
    reasoning there, and the cohort is length-bounded by construction;
    its cost is quadratic only in the short-doc density per length
    bucket (a production corpus would salt within bucket).

    The two paths partition the pair space (main: both long; fallback:
    at least one short), so their union is the FULL domain — the
    oracle is the brute-force all-pairs DuckDB ``levenshtein`` and the
    driver hash proves the plan dropped nothing. Scale: the all-pairs
    form is O(n²·len²); the prefix form moves docs × ``ED_PREFIX``
    rows into a posting-list join whose fan-out is bounded by
    rare-gram frequencies × the length band × the position band, and
    only candidates pay the banded verify. Docs shorter than ``ED_Q``
    chars are out of the operator's domain (both engines filter
    them)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    docs = d.select("doc_id", "text").filter(F.length("text") >= ED_Q)

    # ---- main path: docs long enough for the prefix-count bound ----
    # repartition before the gram explode: the sf parquet is a single
    # file, so without it the whole substring-hash scan runs on ONE
    # core (measured 4.1 s → 0.4 s for the prefix build; same lesson
    # as the r7 codec scans, multimodal.py). doc_id keying keeps each
    # doc's grams co-located for the prefix window's exchange.
    # the explicit isnotnull(doc_id) is vacuous (doc_id is the key) but
    # load-bearing: the prefix branch infers it from its join/window
    # keys while the counts branch (which never touches doc_id) does
    # not, so without it the two consumers' repartition exchanges don't
    # canonicalize equal and AQE runs TWO corpus scans + shuffles.
    # Aligned, stage reuse shares one (executed plan: 3 scans -> 2,
    # measured ~10% on the entry at sf0.1). This leans on Catalyst
    # inferring exactly {isnotnull(doc_id)} on the prefix branch — an
    # optimizer-version-sensitive invariant; the executed-plan test
    # test_edit_distance_corpus_repartition_is_shared is the tripwire
    # (if a Spark upgrade breaks canonicalization, make the sharing
    # structural via persist/localCheckpoint of long_docs instead).
    long_docs = (
        docs.filter(F.length("text") > ED_SHORT_MAX)
        .filter(F.col("doc_id").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    # positional grams ride as (xxhash64 long, pos int) — 8-byte
    # shuffle keys; a hash collision can only ADD candidates (it
    # merges gram values), so the superset stays lossless. The hash is
    # a POST-explode projection, not a `transform` lambda: HOFs run
    # interpreted while explode + projection stay inside whole-stage
    # codegen (measured 2.4 s interpreted vs 0.25 s codegen'd warm for
    # this scan at sf0.1), and `text` never crosses the shuffle. NOT
    # checkpointed: the warm codegen'd scan is cheaper than a 1.5M-row
    # checkpoint write, and the candidate self-join's two reads of the
    # prefix share one physical exchange (ReusedExchange).
    grams = long_docs.select(
        "doc_id",
        F.length("text").alias("len"),
        "text",
        F.explode(
            F.sequence(F.lit(0), F.length("text") - ED_Q)
        ).alias("pos"),
    ).select(
        "doc_id",
        "len",
        "pos",
        F.expr(f"xxhash64(substring(text, pos + 1, {ED_Q}))").alias(
            "gram"
        ),
    )
    # gram-type space is charset-bounded (|Σ|^q types ≪ corpus), so
    # the frequency table broadcasts at any corpus scale
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gf"))
    wdoc = Window.partitionBy("doc_id").orderBy(
        F.asc("gf"), F.asc("gram"), F.asc("pos")
    )
    prefix = (
        grams.join(F.broadcast(counts), "gram")
        .withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") <= ED_PREFIX)
        .select("doc_id", "len", "gram", "pos")
    )
    cand = (
        prefix.alias("a")
        .hint("shuffle_hash")
        .join(
            prefix.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= ED_K)
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= ED_K),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    main = cand.join(ta, "doc_a").join(tb, "doc_b")

    # ---- fallback path: at least one side short ----
    bucket = (F.length("text") / (ED_K + 1)).cast("int")
    shorts = docs.filter(F.length("text") <= ED_SHORT_MAX).select(
        F.col("doc_id").alias("s_id"),
        F.col("text").alias("s_text"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bk"),
    )
    near = docs.filter(F.length("text") <= ED_SHORT_MAX + ED_K).select(
        F.col("doc_id").alias("n_id"),
        F.col("text").alias("n_text"),
        bucket.alias("bk"),
    )
    fallback = (
        shorts.hint("shuffle_hash")
        .join(
            near,
            (shorts.bk == near.bk)
            & (F.col("s_id") != F.col("n_id"))
            & (
                F.abs(F.length("s_text") - F.length("n_text")) <= ED_K
            ),
        )
        .select(
            F.least("s_id", "n_id").alias("doc_a"),
            F.greatest("s_id", "n_id").alias("doc_b"),
            F.when(F.col("s_id") < F.col("n_id"), F.col("s_text"))
            .otherwise(F.col("n_text"))
            .alias("text_a"),
            F.when(F.col("s_id") < F.col("n_id"), F.col("n_text"))
            .otherwise(F.col("s_text"))
            .alias("text_b"),
        )
        .distinct()
    )

    return (
        main.unionByName(fallback)
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b", ED_K).cast("long").alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= ED_K))
    )


#: Exact-substring window width: a duplicated span of >= SUB_W chars
#: is flagged wherever it occurs (stride 1 — strided grids silently
#: miss duplicates whose offsets differ mod the stride).
SUB_W = 40


def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING duplication coverage — the per-document metric
    behind suffix-array training-data dedup (public Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, how many of its ``SUB_W``-char windows also occur
    verbatim in ANOTHER document. High coverage = boilerplate /
    near-copy; the downstream policy (drop, trim, down-weight) hangs
    off exactly this number.

    Spark-first shape: one projection builds each doc's window-hash
    array (``transform(sequence(...))`` + ``md5`` — md5 because the
    oracle must hash identically; within-doc occurrences collapse via
    ``array_distinct`` so "duplicated" means CROSS-DOC by
    construction), one explode, one groupBy h for distinct-doc counts,
    one join back, one per-doc aggregate. Everything is keyed by the
    window hash — no pairwise document join ever forms, which is what
    lets the window table stream at corpus scale (the suffix-array
    original is a single-machine construction; this is its
    shuffle-friendly fixed-width projection)."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    wins = (
        d.filter(F.length("text") >= SUB_W)
        .selectExpr(
            "doc_id",
            f"explode(array_distinct(transform("
            f"sequence(0, length(text) - {SUB_W}), "
            f"i -> md5(substring(text, i + 1, {SUB_W}))))) AS h",
        )
    )
    occ = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("nd")  # post-distinct: docs per window
    )
    return (
        wins.join(occ.hint("shuffle_hash"), "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum((F.col("nd") > 1).cast("long")).alias("n_dup_windows"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact": dedup_exact,
    "dedup_edit_distance": dedup_edit_distance,
    "dedup_exact_substring": dedup_exact_substring,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_containment": dedup_containment,
    "dedup_containment_prefix": dedup_containment_prefix,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_incremental_lsh": dedup_incremental_lsh,
    "dedup_minhash_lsh_grouped": dedup_minhash_lsh_grouped,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_embedding_signlsh": dedup_embedding_signlsh,
    "dedup_components": dedup_components,
    "dedup_components_distributed": dedup_components_distributed,
    "dedup_components_bigstar": dedup_components_bigstar,
    "dedup_survivors_best_quality": dedup_survivors_best_quality,
}

_DOT = "list_dot_product(a.v, b.v)"

#: Exact-Jaccard pair CTE body, shared by the jaccard oracle itself, the
#: minhash oracle (candidates are exact-verified → precision 1.0; recall
#: at J≥0.8 with 16×4 banding is ≈0.9998 and empirically 1.0 on this
#: corpus — pytest asserts set equality, so the exact pair set IS the
#: oracle), and the connected-components / pipeline oracles below.
_JACCARD_CTES = f"""
        sh AS (
            SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM documents),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
        jpairs AS (
            SELECT d1, d2, i / CAST(z1.n + z2.n - i AS DOUBLE) AS jaccard
            FROM inter
            JOIN sizes z1 ON d1 = z1.doc_id
            JOIN sizes z2 ON d2 = z2.doc_id
            WHERE i / CAST(z1.n + z2.n - i AS DOUBLE) >= {JACCARD_T})"""

_JACCARD_PAIRS_SQL = f"""
        WITH {_JACCARD_CTES}
        SELECT d1, d2, jaccard FROM jpairs"""

#: Connected components over the verified pair set as a recursive CTE:
#: transitive closure (components are tiny near-cliques, so the closure
#: is small) then min reachable id per node. Verifies BOTH the
#: driver-side union-find and the distributed min-label propagation.


def _survivors_oracle() -> str:
    """Components closure + the hash-proven quality expression + one
    per-component argmax window."""
    from .text import QUALITY_SQL

    return f"""
        WITH RECURSIVE {_JACCARD_CTES},
        edges AS (
            SELECT d1 AS a, d2 AS b FROM jpairs
            UNION ALL SELECT d2, d1 FROM jpairs),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        comp AS (
            SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS component_id
            FROM reach GROUP BY a),
        scored AS (
            SELECT doc_id, {QUALITY_SQL} AS quality_score FROM documents)
        SELECT c.doc_id, c.component_id, s.quality_score,
               row_number() OVER (
                   PARTITION BY c.component_id
                   ORDER BY s.quality_score DESC, c.doc_id ASC) = 1 AS kept
        FROM comp c JOIN scored s USING (doc_id)"""


_COMPONENTS_SQL = f"""
        WITH RECURSIVE {_JACCARD_CTES},
        edges AS (
            SELECT d1 AS a, d2 AS b FROM jpairs
            UNION ALL SELECT d2, d1 FROM jpairs),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS component_id
        FROM reach GROUP BY a"""

def _simhash_oracle() -> str:
    """DuckDB twin of ``dedup_simhash``: identical md5-prefix token
    hashes, per-bit ±1 vote sums, 60-bit packed signatures, 4×15-bit
    block candidates, bit_count(xor) verification."""
    bits_per_block = SIMHASH_BITS // SIMHASH_BLOCKS
    mask = (1 << bits_per_block) - 1
    vote = (
        "list_sum(list_transform(hs, h -> CASE WHEN ((h >> {b}) & 1) = 1"
        " THEN 1 ELSE -1 END))"
    )
    sig_terms = " + ".join(
        f"CASE WHEN {vote.format(b=b)} > 0"
        f" THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
        WITH th AS (
            SELECT doc_id,
                   list_transform({TOKENS_SQL}, t -> {_TOKEN_H60_SQL}) AS hs
            FROM documents),
        sig AS (SELECT doc_id, {sig_terms} AS simhash FROM th),
        blocked AS (
            SELECT doc_id, simhash, u.blk,
                   CASE u.blk {" ".join(
                       f"WHEN {i} THEN ((simhash >> {bits_per_block * i}) & {mask})"
                       for i in range(SIMHASH_BLOCKS))} END AS val
            FROM sig CROSS JOIN
                 (SELECT unnest(range({SIMHASH_BLOCKS})) AS blk) u),
        cand AS (
            SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                   a.simhash AS s1, b.simhash AS s2
            FROM blocked a JOIN blocked b
              ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id)
        SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
        FROM cand WHERE bit_count(xor(s1, s2)) <= {SIMHASH_RADIUS}"""


_CONTAINMENT_SQL = f"""
        WITH sh AS (
            SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM documents),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT d1, d2,
               i / CAST(z1.n AS DOUBLE) AS contain_d1,
               i / CAST(z2.n AS DOUBLE) AS contain_d2,
               i / CAST(least(z1.n, z2.n) AS DOUBLE) AS containment
        FROM inter
        JOIN sizes z1 ON d1 = z1.doc_id
        JOIN sizes z2 ON d2 = z2.doc_id
        WHERE i / CAST(least(z1.n, z2.n) AS DOUBLE) >= {CONTAIN_T}"""


def _signlsh_oracle() -> str:
    """DuckDB twin of ``dedup_embedding_signlsh``: identical sign-bit
    buckets (1-based list indexing) and the shared fold/list_dot_product
    cosine identity from ``dedup_embedding_cosine``."""
    cases = []
    for bi in range(SIGN_LSH_BANDS):
        terms = " + ".join(
            f"CASE WHEN v[{bi * SIGN_LSH_BITS + j + 1}] >= 0"
            f" THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            for j in range(SIGN_LSH_BITS)
        )
        cases.append(f"WHEN {bi} THEN ({terms})")
    cos = (
        "list_dot_product(x.v, y.v) / (sqrt(list_dot_product(x.v, x.v))"
        " * sqrt(list_dot_product(y.v, y.v)))"
    )
    return f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        bnd AS (
            SELECT vec_id, u.band,
                   CASE u.band {" ".join(cases)} END AS bucket
            FROM e CROSS JOIN
                 (SELECT unnest(range({SIGN_LSH_BANDS})) AS band) u),
        cand AS (
            SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
            FROM bnd a JOIN bnd b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id)
        SELECT c.v1, c.v2, {cos} AS cosine
        FROM cand c
        JOIN e x ON c.v1 = x.vec_id
        JOIN e y ON c.v2 = y.vec_id
        WHERE {cos} >= {COSINE_T}"""


ORACLES: dict[str, str] = {
    "dedup_containment": _CONTAINMENT_SQL,
    # the prefix-filtered form is output-identical by construction
    # (pigeonhole-exact candidate generation), so it shares the oracle
    "dedup_containment_prefix": _CONTAINMENT_SQL,
    "dedup_embedding_signlsh": _signlsh_oracle(),
    "dedup_exact": """
        SELECT md5(lower(trim(text))) AS text_hash,
               min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents GROUP BY 1""",
    # identical window grid (1-based vs 0-based start adjusted), same
    # md5 window hashes, same distinct-per-doc collapse
    "dedup_exact_substring": f"""
        WITH d AS (
            SELECT doc_id, text FROM documents
            WHERE length(text) >= {SUB_W}),
        wins AS (
            SELECT DISTINCT doc_id,
                   md5(substring(text, i, {SUB_W})) AS h
            FROM d, unnest(generate_series(1, length(text) - {SUB_W - 1}))
                 AS t(i)),
        occ AS (SELECT h, count(*) AS nd FROM wins GROUP BY h)
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN o.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows
        FROM wins w JOIN occ o USING (h)
        GROUP BY w.doc_id""",
    # brute-force all-pairs Levenshtein: the driver hash proves the
    # Spark prefix filter was lossless (the |Δlen| prune is implied by
    # dist <= k; it only speeds the oracle up)
    "dedup_edit_distance": f"""
        WITH d AS (
            SELECT doc_id, text FROM documents
            WHERE length(text) >= {ED_Q})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM d a JOIN d b
          ON a.doc_id < b.doc_id
         AND abs(length(a.text) - length(b.text)) <= {ED_K}
        WHERE levenshtein(a.text, b.text) <= {ED_K}""",
    "dedup_ngram_jaccard": _JACCARD_PAIRS_SQL,
    "dedup_minhash_lsh": _JACCARD_PAIRS_SQL,
    # cross-side restriction of the exact pair set, oriented new→base
    "dedup_incremental_lsh": f"""
        WITH {_JACCARD_CTES}
        SELECT CASE WHEN d1 % {INC_DELIVERY_MOD} = 0 THEN d1 ELSE d2 END
                   AS new_doc_id,
               CASE WHEN d1 % {INC_DELIVERY_MOD} = 0 THEN d2 ELSE d1 END
                   AS base_doc_id,
               jaccard
        FROM jpairs
        WHERE (d1 % {INC_DELIVERY_MOD} = 0) <> (d2 % {INC_DELIVERY_MOD} = 0)""",
    "dedup_minhash_lsh_grouped": _JACCARD_PAIRS_SQL,
    "dedup_simhash": _simhash_oracle(),
    "dedup_embedding_cosine": f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label,
               {_DOT} / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(b.v, b.v))) AS cosine
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_DOT} / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))) >= {COSINE_T}""",
    "dedup_components": _COMPONENTS_SQL,
    "dedup_components_distributed": _COMPONENTS_SQL,
    "dedup_components_bigstar": _COMPONENTS_SQL,
    "dedup_survivors_best_quality": _survivors_oracle(),
}
