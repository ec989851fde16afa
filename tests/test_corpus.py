"""Corpus report + curriculum invariants (operators/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators import corpus as corpus_mod
from customer_revenue_analysis_sql_tableau_spark.operators.corpus import (
    _n_rank_buckets,
    _ntile_upper_bounds,
    corpus_stats_report,
    quality_decile_curriculum,
    quality_decile_cutoffs,
    quality_decile_cutoffs_approx_check,
)


def test_corpus_report_conserves_totals(spark, sf_dir):
    """Slice totals must sum to the corpus totals (no doc lost or
    double-counted across (source, lang) groups)."""
    rep = corpus_stats_report(spark, sf_dir)
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ]
    tot = rep.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_chars").alias("chars")
    ).first()
    assert tot.docs == docs.count()
    assert tot.chars == docs.agg(F.sum(F.length("text"))).first()[0]
    # dup counts: every flagged doc belongs to a hash group of size >= 2,
    # so the corpus-wide dup count is even-or-greater per group — weak
    # bound: n_exact_dup_docs <= n_docs per slice and total dups != 1
    rows = rep.collect()
    assert all(r.n_exact_dup_docs <= r.n_docs for r in rows)
    assert sum(r.n_exact_dup_docs for r in rows) != 1


def test_quality_deciles_are_balanced_and_ordered(spark, sf_dir):
    """ntile contract: decile sizes differ by at most 1, every doc is
    assigned exactly once, and score ordering respects decile ordering
    (a doc in a better decile never scores below one in a worse)."""
    cur = quality_decile_curriculum(spark, sf_dir).collect()
    n = len(cur)
    sizes = {}
    for r in cur:
        sizes[r.decile] = sizes.get(r.decile, 0) + 1
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n
    worst_per_decile = {
        d: min(r.quality_score for r in cur if r.decile == d)
        for d in sizes
    }
    best_per_decile = {
        d: max(r.quality_score for r in cur if r.decile == d)
        for d in sizes
    }
    for d in range(1, 10):
        assert worst_per_decile[d] >= best_per_decile[d + 1]
    phases = {r.decile: r.phase for r in cur}
    assert all(
        p == ("high" if d <= 3 else "mid" if d <= 7 else "low")
        for d, p in phases.items()
    )


def test_ntile_upper_bounds_match_sql_ntile():
    """The rank→decile ladder must reproduce SQL ntile for row counts
    that do NOT divide evenly (the first n % 10 buckets take the extra
    row) — the remainder rule the driver corpora (multiples of 10)
    never exercise."""
    import duckdb

    for n in (7, 47, 503, 1000):
        got = duckdb.sql(
            f"SELECT ntile(10) OVER (ORDER BY r) AS d"
            f" FROM range({n}) t(r) ORDER BY r"
        ).fetchall()
        ubs = _ntile_upper_bounds(n, 10)
        expected = []
        for rank in range(1, n + 1):
            expected.append(next(d for d, ub in enumerate(ubs, 1) if rank <= ub))
        assert [g[0] for g in got] == expected


def test_rank_bucket_count_scales_with_corpus():
    """The exact-rank pass derives its bucket count from the corpus row
    count: floored for small corpora, growing ~linearly at one bucket
    per TARGET_ROWS_PER_BUCKET rows, capped so the offsets collect stays
    a bounded scalar (VERDICT r5, Next #3)."""
    t = corpus_mod.TARGET_ROWS_PER_BUCKET
    assert _n_rank_buckets(0) == corpus_mod.MIN_RANK_BUCKETS
    assert _n_rank_buckets(500) == corpus_mod.MIN_RANK_BUCKETS
    assert _n_rank_buckets(100 * t) == 100
    assert _n_rank_buckets(1000 * t) == 1000
    assert _n_rank_buckets(10**15) == corpus_mod.MAX_RANK_BUCKETS
    # monotone: more rows never means fewer buckets
    counts = [_n_rank_buckets(n) for n in (0, t, 10 * t, 10**4 * t, 10**9 * t)]
    assert counts == sorted(counts)


def test_dynamic_bucket_count_is_output_invariant(spark, sf_dir, monkeypatch):
    """The decile assignment must not depend on HOW the corpus is
    sharded for ranking: forcing a much larger bucket count (as a huge
    corpus would derive) yields byte-identical output to the floored
    default."""
    base = {
        (r.doc_id, r.quality_score, r.decile, r.phase)
        for r in quality_decile_curriculum(spark, sf_dir).collect()
    }
    monkeypatch.setattr(corpus_mod, "TARGET_ROWS_PER_BUCKET", 2)
    monkeypatch.setattr(corpus_mod, "MAX_RANK_BUCKETS", 197)
    alt = {
        (r.doc_id, r.quality_score, r.decile, r.phase)
        for r in quality_decile_curriculum(spark, sf_dir).collect()
    }
    assert base == alt


def test_null_scores_rank_last_like_ntile_nulls_last(spark, tmp_path):
    """NULL quality scores (zero-length / NULL text) must keep the
    oracle ntile's NULLS LAST semantics: worst deciles, ordered among
    themselves by doc_id (ADVICE r5 — Spark's null-skipping least()
    would otherwise route them into the TOP bucket)."""
    rows = [
        (1, "the cat sat. on the mat the the", "en", "web"),
        (2, "", "en", "web"),  # zero-length -> NULL score
        (3, "a of and to is the a of and to is the!", "en", "web"),
        (4, None, "en", "web"),  # NULL text -> NULL score
        (5, "plain words without stopwords here", "en", "web"),
        (6, "", "en", "web"),
        (7, "the the the of of of and and and to to", "en", "web"),
        (8, "one more ordinary document body text", "en", "web"),
        (9, "short", "en", "web"),
        (10, "the quick brown fox jumps, over the dog.", "en", "web"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t) if t else 0) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: (r.quality_score, r.decile)
        for r in quality_decile_curriculum(spark, str(tmp_path)).collect()
    }
    assert len(got) == 10
    null_ids = [i for i, (s, _) in got.items() if s is None]
    assert sorted(null_ids) == [2, 4, 6]
    # n=10 -> one row per decile; NULLS LAST by doc_id: 2 -> 8, 4 -> 9, 6 -> 10
    assert got[2][1] == 8 and got[4][1] == 9 and got[6][1] == 10
    # non-null docs occupy deciles 1..7 in exact score-desc, doc-asc order
    scored = sorted(
        ((s, i) for i, (s, _) in got.items() if s is not None),
        key=lambda p: (-p[0], p[1]),
    )
    assert [got[i][1] for _, i in scored] == list(range(1, 8))


def test_cutoffs_approx_check_is_all_true(spark, sf_dir):
    """The sketch-tier bound twin must emit one TRUE per decile edge."""
    rows = quality_decile_cutoffs_approx_check(spark, sf_dir).collect()
    assert [r.cutoff_pct for r in rows] == [10 * i for i in range(1, 10)]
    assert all(r.within_bound for r in rows)


def test_cutoff_deciles_match_ntile_away_from_edges(spark, sf_dir):
    """The percentile-threshold assignment must agree with the exact
    ntile rank form except for rows tied into a decile-edge
    neighborhood, and any disagreement is at most one decile."""
    exact = {
        r.doc_id: (r.quality_score, r.decile)
        for r in quality_decile_curriculum(spark, sf_dir).collect()
    }
    approx = {
        r.doc_id: r.decile
        for r in quality_decile_cutoffs(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    ranked = sorted(exact.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n = len(ranked)
    ubs = _ntile_upper_bounds(n, 10)[:-1]
    # edge neighborhood: ranks within 2 of a decile boundary, expanded
    # to every row sharing a score with one of those rows
    edge_scores = {
        ranked[r - 1][1][0]
        for ub in ubs
        for r in range(max(1, ub - 1), min(n, ub + 2) + 1)
    }
    mismatches = {d for d in exact if exact[d][1] != approx[d]}
    assert all(abs(exact[d][1] - approx[d]) == 1 for d in mismatches)
    away = [d for d in exact if exact[d][0] not in edge_scores]
    assert len(away) >= 0.9 * n  # the edge set must stay a sliver
    assert all(exact[d][1] == approx[d] for d in away)


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing must conserve every token exactly once, fill every
    sequence but the last to exactly PACK_SEQ_LEN, and number the
    sequences contiguously from 0."""
    from customer_revenue_analysis_sql_tableau_spark.operators.corpus import (
        PACK_SEQ_LEN,
        corpus_pack_sequences,
    )
    from customer_revenue_analysis_sql_tableau_spark.operators.text import TOKENS_EXPR

    rows = corpus_pack_sequences(spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    total = docs.select(
        F.sum(F.expr(f"size({TOKENS_EXPR})").cast("long")).alias("t")
    ).collect()[0]["t"]
    assert sum(r["n_tokens"] for r in rows) == total
    ids = [r["chunk_id"] for r in rows]
    assert sorted(ids) == list(range(len(rows)))
    by_id = sorted(rows, key=lambda r: r["chunk_id"])
    for r in by_id[:-1]:
        assert r["n_tokens"] == PACK_SEQ_LEN
    assert 0 < by_id[-1]["n_tokens"] <= PACK_SEQ_LEN
    assert all(r["n_docs"] >= 1 for r in rows)
    assert all(r["min_doc"] <= r["max_doc"] for r in rows)


def test_pack_sequences_plan_has_no_global_window(spark, sf_dir):
    """The heavy cumsum window must be PARTITIONED by shard; the only
    global object is the O(shards)-row literal base-offset frame."""
    from customer_revenue_analysis_sql_tableau_spark.operators.corpus import (
        corpus_pack_sequences,
    )

    plan = (
        corpus_pack_sequences(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln:
            # partition column present: first windowspec arg is a bare
            # column reference, not the frame / an ordered column
            _, _, rest = ln.partition("windowspecdefinition(")
            first = rest.split(",", 1)[0]
            # the first arg must be a BARE partition column: an
            # unpartitioned ORDER BY window would put the ordered
            # column ("doc_id#8L ASC NULLS FIRST") or the frame here
            assert "specifiedwindowframe" not in first
            assert " ASC" not in first and " DESC" not in first
