"""Semantic invariants + plan posture for the feature-engineering
family (features.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.features import (
    LANG_PCTS,
    VOCAB_TOP,
    minmax_normalize,
    stratified_sample,
    value_quartile_bins,
    vocab_coverage,
    word_bigram_counts,
    zscore_outliers,
)


def plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_stratified_sample_hits_configured_fractions(spark, sf_dir):
    """Kept share per language lands near its configured percentage
    (md5 buckets are uniform) and runs are identical."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    pop = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    a = stratified_sample(spark, sf_dir)
    kept = {r["lang"]: r["count"] for r in a.groupBy("lang").count().collect()}
    for lang, n in pop.items():
        pct = LANG_PCTS.get(lang, 50)
        # binomial sd at n≈100 is ~5pp; allow 3 sd.
        assert abs(kept.get(lang, 0) / n - pct / 100) < 0.15, lang
    b = stratified_sample(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quartile_bins_are_ordered_and_balanced(spark, sf_dir):
    """Bins are a monotone partition of the value axis and each holds
    roughly a quarter of the rows."""
    bins = value_quartile_bins(spark, sf_dir).cache()
    try:
        stats = (
            bins.groupBy("quartile")
            .agg(F.count("*").alias("n"), F.min("value").alias("lo"),
                 F.max("value").alias("hi"))
            .orderBy("quartile")
            .collect()
        )
        assert [r["quartile"] for r in stats] == [1, 2, 3, 4]
        for prev, nxt in zip(stats, stats[1:]):
            assert prev["hi"] <= nxt["lo"]
        total = sum(r["n"] for r in stats)
        for r in stats:
            assert abs(r["n"] / total - 0.25) < 0.05
    finally:
        bins.unpersist()


def test_zscore_moments_center_and_outliers_are_rare(spark, sf_dir):
    """Per-type z-scores sum to ~0 (they are centered on the group
    mean) and the |z|>2 tail is a small minority."""
    z = zscore_outliers(spark, sf_dir).cache()
    try:
        centered = z.groupBy("event_type").agg(
            F.avg("z").alias("mz"), F.count("*").alias("n")
        )
        assert centered.filter(F.abs("mz") > 1e-6).count() == 0
        frac = z.filter("is_outlier").count() / z.count()
        assert frac < 0.15
    finally:
        z.unpersist()


def test_minmax_scaled_spans_unit_interval_per_type(spark, sf_dir):
    s = minmax_normalize(spark, sf_dir).cache()
    try:
        assert s.filter((F.col("scaled") < 0) | (F.col("scaled") > 1)).count() == 0
        ends = s.groupBy("event_type").agg(
            F.min("scaled").alias("lo"), F.max("scaled").alias("hi")
        )
        assert ends.filter((F.col("lo") != 0) | (F.col("hi") != 1)).count() == 0
    finally:
        s.unpersist()


def test_vocab_coverage_is_cumulative_and_ranked(spark, sf_dir):
    rows = vocab_coverage(spark, sf_dir).orderBy("rank").collect()
    assert 0 < len(rows) <= VOCAB_TOP
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    cum = 0.0
    for r in rows:
        assert r["cum_share"] >= cum - 1e-9  # non-decreasing
        cum = r["cum_share"]
        assert r["share"] > 0
    assert cum <= 1.0 + 1e-9
    # counts are rank-ordered (ties broken by token, so non-increasing)
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_bigram_counts_conserve_token_pairs(spark, sf_dir):
    """Total bigrams across the corpus = Σ (len(toks) − 1); the ranked
    head must not exceed that mass."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    expected = (
        docs.select(F.size(F.split("text", " ", -1)).alias("k"))
        .filter(F.col("k") >= 2)
        .agg(F.sum(F.col("k") - 1))
        .collect()[0][0]
    )
    head = word_bigram_counts(spark, sf_dir).agg(F.sum("cnt")).collect()[0][0]
    assert 0 < head <= expected


def test_feature_joins_broadcast_the_stats_side(spark, sf_dir):
    """Per-type stats (5 rows) must broadcast back onto the facts —
    a shuffle join here would re-shuffle the whole fact table at scale;
    the quartile cutoff row must not trigger a cartesian product."""
    for df in (zscore_outliers(spark, sf_dir), minmax_normalize(spark, sf_dir)):
        p = plan(df)
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    p = plan(value_quartile_bins(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "Broadcast" in p


def test_vocab_sketch_matches_exact_counts(spark, sf_dir):
    """With the tracked-item budget far above true token cardinality,
    approx_top_k degrades to exact counts — the sketch head must equal
    the exact vocabulary head item-for-item."""
    from customer_revenue_analysis_sql_tableau_spark.operators.features import (
        vocab_topk_sketch,
    )

    sketch = {
        r["token"]: r["approx_cnt"]
        for r in vocab_topk_sketch(spark, sf_dir).collect()
    }
    exact = {
        r["token"]: r["cnt"]
        for r in vocab_coverage(spark, sf_dir).collect()
        if r["rank"] <= len(sketch)
    }
    assert sketch == exact


def test_gopher_gate_is_consistent_with_measurements(spark, sf_dir):
    """The keep flag must be exactly the conjunction of its own emitted
    measurements (auditable gate), and the rules must each actually
    discriminate on this corpus (no constant column silently passing)."""
    from customer_revenue_analysis_sql_tableau_spark.operators.text import (
        GOPHER_MIN_ALPHA_RATIO,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
        GOPHER_MAX_TOKENS,
        GOPHER_WORD_LEN_HI,
        GOPHER_WORD_LEN_LO,
        text_gopher_filters,
    )

    rows = text_gopher_filters(spark, sf_dir).collect()
    assert len(rows) > 0
    kept = 0
    for r in rows:
        expect = (
            GOPHER_MIN_TOKENS <= r.n_tokens <= GOPHER_MAX_TOKENS
            and GOPHER_WORD_LEN_LO <= r.mean_word_len <= GOPHER_WORD_LEN_HI
            and r.alpha_word_ratio >= GOPHER_MIN_ALPHA_RATIO
            and r.n_distinct_stopwords >= GOPHER_MIN_STOPWORDS
        )
        assert r.keep == expect, (r.doc_id, r)
        kept += bool(r.keep)
    assert 0 < kept < len(rows)  # the gate discriminates


def test_ewma_matches_python_fold_and_partitioning(spark, sf_dir):
    """The decayed score must equal a plain-Python fold over each
    user's time-ordered events exactly (bit-for-bit — the fold order
    is pinned), regardless of shuffle partitioning."""
    from customer_revenue_analysis_sql_tableau_spark.operators.features import (
        ewma_user_value,
    )

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    expected = {}
    for uid, evs in by_user.items():
        s = 0.0
        for _, _, v in sorted(evs):
            s = s / 2.0 + v
        expected[uid] = (len(evs), s)
    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in ewma_user_value(spark, sf_dir).collect()
    }
    assert got == expected
