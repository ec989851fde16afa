"""Property tests for the split/packing/temporal families (SURVEY §5.3.5
pattern: invariants beyond the DuckDB hash check, which pins values but
not the semantic contracts a pipeline relies on)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.splits import (
    PACK_BUDGET,
    TRAIN_PCT,
    chunk_documents,
    pack_sequences,
    split_train_test,
)
from customer_revenue_analysis_sql_tableau_spark.operators.temporal import (
    asof_join_purchase_click,
    events_value_percentiles,
    events_value_percentiles_approx,
    latest_event_per_user,
)


def test_chunks_reassemble_to_original(spark, sf_dir):
    """Concatenating a doc's chunks in index order must reproduce the
    document exactly — no gaps, overlaps, or phantom chunks."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    rebuilt = (
        chunk_documents(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ).chunk_text,
                "",
            ).alias("rebuilt")
        )
    )
    joined = docs.filter(F.length("text") > 0).join(rebuilt, "doc_id", "left")
    assert joined.filter(
        F.col("rebuilt").isNull() | (F.col("rebuilt") != F.col("text"))
    ).count() == 0


def test_split_is_deterministic_and_total(spark, sf_dir):
    """Same input → identical assignment on every run; every doc gets
    exactly one split; the train share lands near the configured 90%."""
    a = split_train_test(spark, sf_dir)
    b = split_train_test(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    n = a.count()
    counts = dict(
        a.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert sum(counts.values()) == n
    # md5 buckets are uniform; 500 docs at 90% → binomial sd ~0.67pp.
    assert abs(counts.get("train", 0) / n - TRAIN_PCT / 100) < 0.06


def test_pack_offsets_stay_under_budget(spark, sf_dir):
    """pack_offset is a position INSIDE a budget-sized bin; prefix sums
    must be consistent with (pack_id, pack_offset)."""
    p = pack_sequences(spark, sf_dir)
    assert p.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= PACK_BUDGET)
    ).count() == 0
    assert p.filter(
        F.col("prefix_chars")
        != F.col("pack_id") * PACK_BUDGET + F.col("pack_offset")
    ).count() == 0


def test_asof_match_is_past_and_same_user(spark, sf_dir):
    """Every matched click happened at-or-before its purchase (gap >= 0)
    and unmatched purchases carry NULLs consistently."""
    a = asof_join_purchase_click(spark, sf_dir)
    assert a.filter(F.col("gap_us") < 0).count() == 0
    assert a.filter(
        F.col("click_id").isNull() != F.col("click_ts").isNull()
    ).count() == 0


def test_latest_per_user_is_the_max_timestamp(spark, sf_dir):
    events = load_tables(spark, sf_dir, names=("events",))["events"]
    latest = latest_event_per_user(spark, sf_dir)
    maxes = events.groupBy("user_id").agg(F.max("ts").alias("max_ts"))
    assert latest.join(maxes, "user_id").filter(
        F.col("ts") != F.col("max_ts")
    ).count() == 0
    assert latest.count() == maxes.count()


def test_latest_state_stream_equals_batch(spark, sf_dir):
    """The streaming CDC compaction (applyInPandasWithState) must end
    in exactly the batch operator's snapshot, row for row."""
    from customer_revenue_analysis_sql_tableau_spark.streaming.windows import (
        run_latest_state_stream,
    )

    events = load_tables(spark, sf_dir, names=("events",), register=False)[
        "events"
    ]
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events_src")
        events.write.parquet(src)
        streamed = run_latest_state_stream(
            spark, src, os.path.join(tmp, "ckpt")
        ).collect()
    batch = latest_event_per_user(spark, sf_dir).collect()
    as_map = lambda rows: {  # noqa: E731
        r.user_id: (r.ts, r.event_id, r.event_type, r.value) for r in rows
    }
    assert as_map(streamed) == as_map(batch)


def test_interval_join_stream_equals_batch_pairs(spark, sf_dir):
    """The stream-stream interval join must produce exactly the pairs
    of the batch inequality join (same-user clicks in the 10 minutes
    before each error)."""
    from customer_revenue_analysis_sql_tableau_spark.streaming.windows import (
        run_interval_join_stream,
    )

    events = load_tables(spark, sf_dir, names=("events",), register=False)[
        "events"
    ]
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events_src")
        events.write.parquet(src)
        streamed = run_interval_join_stream(
            spark, src, os.path.join(tmp, "ckpt")
        ).collect()
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("error_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    batch = errors.join(
        clicks,
        (F.col("e_user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (
            F.col("click_ts")
            >= F.col("error_ts") - F.expr("INTERVAL 10 MINUTES")
        ),
    ).collect()
    pairs = lambda rows: {(r.error_id, r.click_id) for r in rows}  # noqa: E731
    assert pairs(streamed) == pairs(batch)


def test_approx_percentiles_bound_error_vs_exact(spark, sf_dir):
    """The sketch tier must land within the GK rank-error bound of the
    exact tier: with accuracy A, the returned value's rank is within
    n/A of the target, so for a tolerance we accept a value between the
    neighboring exact percentiles padded by that rank slack (here:
    within 2% of the group's value range — generous but regression-
    catching: a broken sketch or wrong column is far outside it)."""
    exact = {
        r["event_type"]: r
        for r in events_value_percentiles(spark, sf_dir).collect()
    }
    rng = {
        k: max(r["max_value"] - r["min_value"], 1e-9) for k, r in exact.items()
    }
    for r in events_value_percentiles_approx(spark, sf_dir).collect():
        k = r["event_type"]
        assert abs(r["p50_approx"] - exact[k]["p50_value"]) <= 0.02 * rng[k]
        assert abs(r["p90_approx"] - exact[k]["p90_value"]) <= 0.02 * rng[k]


def test_split_export_partitions_by_split(spark, sf_dir):
    """Write-side contract: exporting the split corpus partitioned by
    the split column yields one directory per split (the layout a
    training job consumes — split pruning without reading a byte of
    the other splits)."""
    out = split_train_test(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "corpus")
        out.write.partitionBy("split").parquet(path)
        parts = {d for d in os.listdir(path) if d.startswith("split=")}
        assert parts == {"split=train", "split=validation", "split=test"}
        back = spark.read.parquet(path)
        pruned = back.filter(F.col("split") == "train")
        # partition pruning must reach the scan
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(split" in plan
        assert pruned.count() == out.filter(F.col("split") == "train").count()


def test_mixture_sample_matches_python_reference(spark, sf_dir):
    """rate_quarters and the copy decision must reproduce an independent
    Python md5 implementation exactly (the oracle shares SQL md5 with
    the operator, so this guards against a shared-wrong-hash bug), and
    copy_ids must be contiguous 1..n_copies."""
    import hashlib

    from customer_revenue_analysis_sql_tableau_spark.operators.splits import (
        mixture_sample,
    )

    rows = mixture_sample(spark, sf_dir).collect()
    assert rows

    def md5_32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    by_doc: dict = {}
    for r in rows:
        q = md5_32(r.source) % 8 + 1
        assert r.rate_quarters == q, r
        bucket = md5_32(f"{r.doc_id}:mix") % 100
        expected = q // 4 + (1 if bucket < (q % 4) * 25 else 0)
        assert r.n_copies == expected, r
        by_doc.setdefault((r.doc_id, r.source), []).append(r.copy_id)
    for (doc_id, _), copies in by_doc.items():
        assert sorted(copies) == list(range(1, len(copies) + 1)), doc_id

    # docs whose n_copies is 0 are absent entirely
    from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables

    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].select("doc_id", "source").collect()
    for d in docs:
        q = md5_32(d.source) % 8 + 1
        bucket = md5_32(f"{d.doc_id}:mix") % 100
        n = q // 4 + (1 if bucket < (q % 4) * 25 else 0)
        if n == 0:
            assert (d.doc_id, d.source) not in by_doc
        else:
            assert len(by_doc[(d.doc_id, d.source)]) == n


def test_unigram_logprob_matches_python_reference(spark, sf_dir):
    """Every doc's score must match an independent Python unigram model
    (Counter + math.log, summed in the same token-position order) to
    1e-9 — Python's round is half-even vs Spark's half-up, so compare
    with tolerance rather than digit-exactly."""
    import math
    from collections import Counter

    from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
    from customer_revenue_analysis_sql_tableau_spark.operators.text import (
        text_unigram_logprob,
    )

    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.strip().lower().split() for r in docs}
    counts = Counter(t for ts in toks.values() for t in ts)
    T, V = sum(counts.values()), len(counts)

    got = {r.doc_id: r for r in text_unigram_logprob(spark, sf_dir).collect()}
    assert set(got) == {d for d, ts in toks.items() if ts}
    for doc_id, ts in toks.items():
        if not ts:
            continue
        s = 0.0
        for t in ts:  # same left-to-right position order as the fold
            s += math.log((counts[t] + 1) / float(T + V))
        expected = -s / len(ts)
        assert got[doc_id].n_tokens == len(ts)
        assert abs(got[doc_id].avg_neg_logprob - expected) < 1e-9, doc_id


def test_temperature_mixture_flattens_and_hits_budget(spark, sf_dir):
    """α=0.5 temperature mixture: every source's keep rate is exact
    integer basis points of the √count re-weighting, SMALL sources keep
    a strictly larger fraction than the largest source, and the kept
    total lands near the half-corpus budget (hash-uniformity tolerance)."""
    import math

    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.splits import (
        RATE_BP,
        TEMP_TARGET_DIV,
        split_temperature_mixture,
    )

    out = split_temperature_mixture(spark, sf_dir)
    rows = out.collect()
    n = len(rows)
    per_source = {}
    for r in rows:
        per_source[r.source] = (r.c_source, r.w_source, r.rate_bp)
    c_total = sum(c for c, _, _ in per_source.values())
    w_total = sum(w for _, w, _ in per_source.values())
    assert c_total == n
    for src, (c, w, bp) in per_source.items():
        assert w == math.isqrt(c) or w == int(math.sqrt(c))  # IEEE floor(sqrt)
        want = min(RATE_BP, RATE_BP * c_total * w // (TEMP_TARGET_DIV * w_total * c))
        assert bp == want, src
    # budget: kept fraction within ±10% of the target half
    kept = sum(1 for r in rows if r.kept)
    assert abs(kept / n - 1 / TEMP_TARGET_DIV) < 0.10


def test_temperature_mixture_upweights_small_sources(spark, tmp_path):
    """Flattening property on a SKEWED corpus (the driver corpus is
    source-balanced, so this needs a synthetic one): a 20-doc source
    must keep a strictly larger fraction than a 2000-doc source, and
    rates never exceed 100%."""
    from customer_revenue_analysis_sql_tableau_spark.operators.splits import (
        RATE_BP,
        split_temperature_mixture,
    )

    rows = [(i, f"text {i}", "en", "big", 10) for i in range(2000)]
    rows += [(10_000 + i, f"text {i}", "en", "small", 10) for i in range(20)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = split_temperature_mixture(spark, str(tmp_path))
    bp = {
        r["source"]: r["rate_bp"]
        for r in out.select("source", "rate_bp").distinct().collect()
    }
    assert bp["small"] > bp["big"]
    assert all(0 < v <= RATE_BP for v in bp.values())


def test_length_buckets_conserve_docs_and_bound_waste(spark, sf_dir):
    """Padding-efficiency report invariants: buckets partition the
    corpus (doc and token totals conserved), every cap is a power of
    two >= its bucket's max token count, and waste is in [0, 1)."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.splits import (
        split_length_buckets,
    )
    from customer_revenue_analysis_sql_tableau_spark.operators.text import (
        TOKENS_EXPR,
    )

    rows = split_length_buckets(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.size(F.expr(TOKENS_EXPR)).alias("n"))
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.total_tokens for r in rows) == toks.agg(F.sum("n")).first()[0]
    for r in rows:
        assert r.bucket_cap & (r.bucket_cap - 1) == 0  # power of two
        assert 0 <= r.waste_ratio < 1
        assert r.padded_tokens == r.n_docs * r.bucket_cap
        assert r.total_tokens <= r.padded_tokens


def test_asof_tolerance_nulls_stale_matches_only(spark, sf_dir):
    """The tolerance variant must keep every left row, NULL exactly the
    matches older than the bound, and agree with the unbounded as-of on
    everything younger."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.temporal import (
        ASOF_TOL_MINUTES,
        asof_join_purchase_click,
        asof_join_with_tolerance,
    )

    tol_us = ASOF_TOL_MINUTES * 60 * 1_000_000
    base = {r.event_id: r for r in asof_join_purchase_click(spark, sf_dir).collect()}
    tol = {r.event_id: r for r in asof_join_with_tolerance(spark, sf_dir).collect()}
    assert set(base) == set(tol)  # left rows all survive
    stale = fresh = 0
    for eid, b in base.items():
        t = tol[eid]
        if b.gap_us is not None and b.gap_us > tol_us:
            stale += 1
            assert (t.click_id, t.click_ts, t.gap_us) == (None, None, None)
        else:
            fresh += 1
            assert (t.click_id, t.click_ts, t.gap_us) == (
                b.click_id,
                b.click_ts,
                b.gap_us,
            )
    assert stale > 0 and fresh > 0  # the bound is exercised both ways


def test_gap_fill_densifies_and_carries_forward(spark, sf_dir):
    """The filled series must be dense per user (every hour between the
    user's first and last event), carry the last observed hourly sum
    across gap hours, and never flag an hour that had events."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.temporal import (
        gap_fill_hourly_value,
    )

    rows = gap_fill_hourly_value(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    saw_gap = False
    for series in by_user.values():
        series.sort(key=lambda r: r.hour_bucket)
        hours = [r.hour_bucket for r in series]
        assert hours == list(range(hours[0], hours[-1] + 1))  # dense
        assert not series[0].is_gap  # first bucket is an actual
        last_val = None
        for r in series:
            if r.is_gap:
                saw_gap = True
                assert r.n_events == 0
                assert r.value_filled == last_val  # carried forward
            else:
                assert r.n_events > 0
                last_val = r.value_filled
    assert saw_gap, "fixture has no gap hours - test is vacuous"


def test_stratified_sample_hits_exact_quota_per_stratum(spark, sf_dir):
    """Every (lang, source) stratum contributes exactly ceil(n/5) docs,
    the selection is reproducible, and no stratum is empty."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.splits import (
        STRAT_DENOM,
        stratified_sample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = {
        (r.lang, r.source): r.n
        for r in d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = stratified_sample(spark, sf_dir).collect()
    taken: dict[tuple, int] = {}
    for r in rows:
        key = (r.lang, r.source)
        taken[key] = taken.get(key, 0) + 1
        assert r.strat_n == sizes[key]
        assert r.quota == -(-sizes[key] // STRAT_DENOM)
    assert set(taken) == set(sizes)  # no stratum dropped
    for key, n in sizes.items():
        assert taken[key] == -(-n // STRAT_DENOM)
    # reproducible: same doc set on a second run
    again = {r.doc_id for r in stratified_sample(spark, sf_dir).collect()}
    assert again == {r.doc_id for r in rows}


def test_scd2_intervals_tile_each_users_history(spark, sf_dir):
    """Per user: version 1..k contiguous, each interval closes exactly
    where the next opens, the last is open-ended, consecutive intervals
    never share a state (runs are maximal), and replaying the raw
    events against the intervals maps every event into the interval
    carrying its type."""
    from customer_revenue_analysis_sql_tableau_spark.operators.temporal import (
        scd2_user_state,
    )

    rows = scd2_user_state(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for series in by_user.values():
        series.sort(key=lambda r: r.version)
        assert [r.version for r in series] == list(range(1, len(series) + 1))
        for a, b in zip(series, series[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type  # maximal runs
        assert series[-1].valid_to is None
    # replay: each raw event falls in an interval with its own type
    e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    for ev in e[:500]:
        series = by_user[ev.user_id]
        hits = [
            r
            for r in series
            if r.valid_from <= ev.ts and (r.valid_to is None or ev.ts < r.valid_to)
        ]
        assert len(hits) == 1 and hits[0].event_type == ev.event_type
