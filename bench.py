"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each timing covers full execution to a driver-side count/collect
(``df.count()`` after a no-op cache-free plan), warm JVM, cold per-query
plans. The headline set covers the warehouse view + its heaviest
regroupings + the flagship join-agg. Contention robustness: min of
three samples taken as three interleaved passes over the whole list,
plus a flagship load sentinel timed BEFORE the first pass and after
every pass (r8's uniform +13% host drift was invisible to a single
end-of-run sentinel). A pass whose bracketing sentinels average >15%
above the best sentinel flags ``load_sentinel.clean: false`` (stderr
warning); the artifact also reports ``normalized_total`` — min-of-3
over samples deflated by their pass's sentinel ratio — next to the
raw total so host drift and code drift separate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from customer_revenue_analysis_sql_tableau_spark.operators.queries import evict_view
from customer_revenue_analysis_sql_tableau_spark.session import get_spark

#: Headline subset (keys of __spark_entry__.queries()). The full registry
#: runs in t2; bench tracks the expensive representative ones.
HEADLINE = [
    "flagship_revenue_by_region",
    # View family, bucketed layout FIRST: the write-once bucketed fact
    # layout (no o⋈l exchange/sort) is the DEFAULT measured fill — the
    # layout a recurring 100 TB view fill deploys on (SCALE.md "Layout
    # decision"). The layout build is untimed — it's the ingest-time
    # cost; timing covers the full plan via a noop-format write
    # (count() would let Catalyst drop the geo joins).
    "view_customer_value_summary_bucketed",
    # A/B twin: the same fill from the plain scan layout (cold cache,
    # evicted per run — the honest one-shot cost); its warm memoized
    # re-read is recorded separately as view_customer_value_summary__warm
    "view_customer_value_summary",
    # added r10: the CBO-planned fill — same 13 columns, NO hints,
    # strategy chosen from ANALYZE stats over the persisted catalog
    # (catalog build + ANALYZE is untimed ingest cost, prepped below);
    # should land within noise of the hinted plan — that's the point
    "view_customer_value_summary_analyzed",
    "q4_frequency_segmentation",
    "q8_customer_cohorts",
    "q9_revenue_by_nation",
    "q11_avg_revenue_per_customer",
    # one representative per extension family
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_volume_customers",
    "tpch_q21_sole_late_supplier",
    "text_token_stats",
    "dedup_exact",
    "sim_bruteforce_topk",
    "stream_tumbling_counts",
    # heaviest per-family representatives (added r2): LSH banding
    # self-join, union+window as-of carry-forward, minute-tier rollup
    "dedup_minhash_lsh",
    # A/B twin (r4): grouped candidate generation (collect_list per
    # band-bucket + in-partition pairing) vs the band self-join.
    # Measured a wash at sf0.1 (1.65 vs 1.60 s isolated min-of-3); the
    # join form stays the production default — it degrades more
    # gracefully under adversarial bucket skew.
    "dedup_minhash_lsh_grouped",
    "temporal_asof_join",
    "rollup_minute",
    "text_ranked_search",
    "decontaminate_ngram_overlap",
    # added r3: mixture sampling (stateless-hash explode), the
    # unigram-LM quality gate (two corpus passes + ordered fold), the
    # containment near-dup pass (inverted-index join), and gap
    # sessionization (two windows + agg on one user_id partitioning)
    "split_mixture_sample",
    "text_unigram_logprob",
    "dedup_containment",
    "analytics_sessionize_events",
    # added r6: the Arrow mapInPandas codec path (multimodal family) —
    # synth + real RIFF parse per doc, the engine's Python-batch tier
    "multimodal_decode_wav",
    # added r6: the PQ/ADC ANN tier — codebook training + Arrow encode
    # + JVM lookup-table scan + exact shortlist re-rank
    "sim_pq_topk",
    # added r7 (extends the common subset; doesn't displace it): the
    # heaviest codec — full baseline JPEG entropy decode + IDCT per doc
    "multimodal_decode_jpeg",
    # added r7: the iterative-workload representative — co-purchase
    # edge build (self-join + distinct, checkpointed once) + 3 exact
    # fixed-point power iterations (join + agg each)
    "graph_pagerank_copurchase",
    # added r8 (extend the common subset; don't displace): the directed
    # twin — left-join teleport re-rank + dangling-mass share frames
    "graph_pagerank_directed",
    # added r8: the fuzzy-join family — q-gram prefix candidates with
    # the length band inside the join, banded-threshold levenshtein
    # verify (the heaviest single entry; the all-pairs form it replaces
    # is the 5-minute DuckDB oracle)
    "dedup_edit_distance",
    # added r8: per-key grid generation + forward-fill window
    "temporal_gap_fill",
    # added r9 (extend the common subset; don't displace): the
    # iterative text-training representative — six rounds of
    # pair-count agg + argmax + JVM replace over the checkpointed
    # word-type table
    "text_bpe_train",
    # added r10 (extend the common subset; don't displace): batched BPE
    # — 70 merges in 6 rounds (greedy non-conflicting top-B selection);
    # the r9 Next #4 target was >=64 merges at <= the sequential
    # 6-merge entry's time
    "text_bpe_train_batched",
    # added r11 (extend; don't displace): the two persisted READ paths
    # — what a production query actually pays once artifacts exist.
    # Vocab/index builds are untimed ingest cost (prepped below, like
    # the bucketed layout); the tokenizer is the corpus-wide vocabulary
    # join, the PQ path the pure-JVM ADC scan over persisted codes.
    "text_bpe_tokenize_persisted",
    "sim_persisted_pq_topk",
    # added r11: the trainer-artifact emission representative
    # (order-preserving id-sequence assembly + digest)
    "text_bpe_encode_ids",
    # added r11 (extend; don't displace): sequence packing — the
    # partitioned two-level prefix sum + overlap explode + chunk agg
    "corpus_pack_sequences",
    # added r11: lake maintenance — the shuffle-free bin-pack rewrite
    # plus both trees' bit_xor content digests (staging is untimed
    # ingest prep, like the bucketed layout)
    "parquet_compact_small_files",
    # added r12 (extend; don't displace): the time-travel read —
    # manifest-chain resolution + three as-of reader views verified by
    # exact set algebra (pure reads over immutable segments; chain
    # staging is untimed ingest prep). The r12 one-shot passes
    # (partitioned in-place compaction, VACUUM) are deliberately NOT
    # timed: their marker-gated destructive step runs once, and their
    # recurring bin-pack cost is what parquet_compact_small_files
    # already times every pass.
    "sim_persisted_read_asof",
    # r13 adds NO entries (common-43 subset stays stable): the round's
    # new surface is all marker-gated one-shot lifecycle passes
    # (manifest-atomic compaction, windowed VACUUM, scheduled stream
    # GC) or exact CHECK baselines (stream_asof_b1_brute_topk) — the
    # same exclusion class as the r12 passes above; their recurring
    # costs (bin-pack, manifest-chain read) are already timed by
    # parquet_compact_small_files and sim_persisted_read_asof.
    # r14 likewise adds NO entries: conflict detection, change feeds,
    # the streaming merge, zorder optimize, history, and the stats
    # commit are all version-gated one-shot lifecycle passes; the
    # stats-PRUNED read's recurring cost is a sub-second box query
    # whose plan cost is already represented by the scan family, and
    # its I/O claim is pinned by inputFiles() in tests rather than
    # wall time.
]


def _cpu_calibration() -> float:
    """Absolute single-core speed gauge: SHA-256 over a fixed 192 MB
    buffer (pure CPU, no BLAS threading, no JVM). Per-pass sentinels
    catch INTRA-run drift; this constant is the cross-run yardstick —
    a uniformly contended host slows every query AND this loop by the
    same factor, so round-over-round totals can be compared at equal
    calibration (r8's 1.13× "regression" was exactly this ambiguity:
    host load 4-5 from other tenants with zero engine processes)."""
    import hashlib

    buf = bytes(range(256)) * (192 * 1024 * 1024 // 256)
    t0 = time.perf_counter()
    hashlib.sha256(buf).hexdigest()
    return round(time.perf_counter() - t0, 3)


def _cpu_calibration_mt(n_threads: int) -> float:
    """Multi-core twin of :func:`_cpu_calibration` (r10): bursty
    co-tenant load saturates SOME cores while leaving one free, so the
    single-core gauge can read clean (0.150) during a load-7 burst that
    inflates every parallel Spark stage ~15% (measured this round).
    ``hashlib`` releases the GIL on large buffers, so N threads hashing
    N buffers measure aggregate multi-core throughput — the capacity
    the queries actually ride. Reported as wall seconds for the fixed
    N-way workload; compare rounds at equal (st, mt) calibration."""
    import hashlib
    import threading

    buf = bytes(range(256)) * (24 * 1024 * 1024 // 256)
    threads = [
        threading.Thread(target=lambda: hashlib.sha256(buf).hexdigest())
        for _ in range(n_threads)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return round(time.perf_counter() - t0, 3)


def _bandwidth_calibration(spark) -> float:
    """Shuffle/memory-BANDWIDTH gauge (r13 VERDICT "wrong" #1): a fixed
    24M-row hash-repartition + aggregation whose cost rides shuffle
    write/read and memory bandwidth, not single-core CPU speed — the
    axis the sha256 gauges cannot see (r13's driver artifact read 1.24×
    with BOTH CPU gauges near-clean because the co-tenant pressure was
    on the memory/IO side, which is what the shuffle-heavy entries
    actually ride). One untimed pass compiles the codegen; the gauge is
    min-of-3. A round whose total moved while (st, mt) read clean but
    this gauge moved alike is host drift, self-diagnosing from the
    artifact alone; bench_compare prints the deflated ratio."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        n = (
            spark.range(24_000_000)
            .select(
                (F.col("id") * 2654435761 % 1048576).alias("k"),
                F.col("id").alias("v"),
            )
            .repartition(64, "k")
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
            .count()
        )
        assert n > 0
        return time.perf_counter() - t0

    once()  # codegen + shuffle-path warmup, untimed
    return round(min(once() for _ in range(3)), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    calibration = min(_cpu_calibration() for _ in range(3))
    calibration_mt = min(_cpu_calibration_mt(cpus) for _ in range(3))
    spark = get_spark("bench")
    calibration_bw = _bandwidth_calibration(spark)
    queries = entrymod.queries()

    # untimed layout build for the bucketed-view A/B: the write-once
    # shuffle is ingest cost, not query cost
    if "view_customer_value_summary_bucketed" in queries:
        from customer_revenue_analysis_sql_tableau_spark.operators.warehouse import (
            prepare_bucketed_facts,
        )

        prepare_bucketed_facts(spark, "/root/testdata/sf0.001")
        prepare_bucketed_facts(spark, sf_dir)

    # untimed catalog build + ANALYZE for the CBO-planned view variant:
    # statistics collection is ingest cost, not query cost
    if "view_customer_value_summary_analyzed" in queries:
        from customer_revenue_analysis_sql_tableau_spark.operators.warehouse import (
            prepare_analyzed_catalog,
        )

        prepare_analyzed_catalog(spark, "/root/testdata/sf0.001")
        prepare_analyzed_catalog(spark, sf_dir)

    # untimed artifact builds for the persisted read-path entries:
    # vocabulary training / quantizer training + encoding are ingest
    # cost, not query cost (same rule as the bucketed layout)
    if "text_bpe_tokenize_persisted" in queries:
        from customer_revenue_analysis_sql_tableau_spark.operators.text import (
            _ensure_bpe_vocab,
        )

        _ensure_bpe_vocab(spark, "/root/testdata/sf0.001", "b6")
        _ensure_bpe_vocab(spark, sf_dir, "b6")
    if "sim_persisted_pq_topk" in queries:
        from customer_revenue_analysis_sql_tableau_spark.operators.similarity import (
            sim_pq_index_build,
        )

        sim_pq_index_build(spark, "/root/testdata/sf0.001").collect()
        sim_pq_index_build(spark, sf_dir).collect()
    # untimed fragmented-copy staging for the compaction entry: the
    # 64-file table is the INPUT a streaming sink left behind; the
    # timed work is the bin-pack rewrite + content-digest verification
    if "parquet_compact_small_files" in queries:
        from customer_revenue_analysis_sql_tableau_spark.sources.compaction import (
            parquet_compact_small_files,
        )

        parquet_compact_small_files(spark, "/root/testdata/sf0.001").collect()
        parquet_compact_small_files(spark, sf_dir).collect()
    # untimed manifest-chain staging for the time-travel entry: the
    # multi-writer ingest protocol is ingest cost, not query cost
    if "sim_persisted_read_asof" in queries:
        from customer_revenue_analysis_sql_tableau_spark.operators.segment_store import (
            _manifest_chain,
        )

        _manifest_chain(spark, "/root/testdata/sf0.001")
        _manifest_chain(spark, sf_dir)

    # JVM warmup: run EVERY headline query once at the tiniest SF so
    # whole-stage codegen compiles each plan's generated classes before
    # anything is timed — compilation cost is a JVM artifact, not part
    # of the measured scale factor. (Engine side, the codegen class
    # cache is sized to hold the full workload — session.py — so the
    # warm classes survive all three measured passes.)
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        df = fn(spark, warm_dir)
        if name == "view_customer_value_summary_bucketed":
            df.write.mode("overwrite").format("noop").save()
        else:
            df.count()

    def run_once(name: str, fn) -> float:
        """One timed execution to full materialization."""
        if name == "view_customer_value_summary":
            evict_view(spark, sf_dir)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if name == "view_customer_value_summary_bucketed":
            # full-plan noop write: count() lets Catalyst eliminate
            # the geo left joins (no cache fill to force them here)
            df.write.mode("overwrite").format("noop").save()
        else:
            # the count IS the timed materialization — keep it outside
            # the assert so `python -O` can't strip the action
            n = df.count()
            assert n >= 0
        return time.perf_counter() - t0

    # Contention-robust harness (VERDICT r5, Next #1): min of THREE
    # samples per query, taken as three INTERLEAVED passes over the
    # whole headline list — a host load spike spanning minutes degrades
    # one pass, never all three samples of any single query (min-of-2
    # back-to-back samples shipped a +26% phantom regression in r5).
    # The memoized view's cache is evicted before each sample, so every
    # sample covers the honest fill.
    #
    # Per-pass sentinels (VERDICT r8, Next #1): the flagship query is
    # re-timed BEFORE the first pass and after EVERY pass, so a
    # contended host is detectable even when the drift is uniform
    # across queries (r8's +13% artifact drift hit every entry equally
    # and the single end-of-run sentinel read clean). A pass whose
    # bracketing sentinels average >15% above the best sentinel is
    # flagged; the artifact carries both the raw min-of-3 total and a
    # sentinel-normalized one (each sample deflated by its pass's
    # bracketing-sentinel ratio) so the judge can separate host drift
    # from code drift.
    flagship = queries["flagship_revenue_by_region"]
    samples: dict[str, list[float]] = {}
    active = [(n, queries[n]) for n in HEADLINE if n in queries]
    # one untimed flagship run at the MEASURED sf before sentinel 0:
    # the codegen warmup above runs at sf0.001, so the first sf-dir
    # execution pays first-touch parquet reads — a systematic bias
    # that made sentinel 0 read as phantom contention (measured 1.10 s
    # cold vs 0.79-0.84 s for every later sentinel)
    run_once("flagship_revenue_by_region", flagship)
    sentinels = [run_once("flagship_revenue_by_region", flagship)]
    for _ in range(3):
        for name, fn in active:
            samples.setdefault(name, []).append(run_once(name, fn))
        sentinels.append(run_once("flagship_revenue_by_region", flagship))
    # reference = MEDIAN sentinel (min would turn one lucky fast run
    # into phantom contention on every other pass — observed at
    # sf0.001 where the flagship sentinel jitters ±25%); factors are
    # floored at 1.0 so normalization can only deflate samples from a
    # provably-contended pass, never inflate a fast one.
    s_ref = sorted(sentinels)[len(sentinels) // 2]
    pass_factor = [
        max(1.0, (sentinels[i] + sentinels[i + 1]) / 2.0 / s_ref)
        for i in range(3)
    ]
    pass_clean = [f <= 1.15 for f in pass_factor]
    timings = {name: round(min(ts), 3) for name, ts in samples.items()}
    normalized = {
        name: round(min(t / f for t, f in zip(ts, pass_factor)), 3)
        for name, ts in samples.items()
    }

    # Auxiliary tiers, recorded OUTSIDE the summed headline total so
    # round-over-round totals stay comparable (ADVICE r5): the warm
    # memoized view read (cache still filled from the final pass — the
    # cost q1-q11 actually pay per read), and the load sentinel — a
    # final re-time of the flagship; if it drifted >15% from its first
    # sample, the host was contended while the bench ran and the
    # artifact should be re-earned, not recorded.
    aux: dict[str, float] = {}
    t0 = time.perf_counter()
    n = queries["view_customer_value_summary"](spark, sf_dir).count()
    assert n >= 0
    aux["view_customer_value_summary__warm"] = round(time.perf_counter() - t0, 3)
    # post-run multi-core + bandwidth gauges: a burst that began or
    # ended mid-run shows up as pre/post divergence (detail line, not
    # the summary)
    aux["cpu_calibration_mt_final_s"] = min(
        _cpu_calibration_mt(cpus) for _ in range(3)
    )
    aux["shuffle_calibration_final_s"] = _bandwidth_calibration(spark)

    first, final = sentinels[0], sentinels[-1]
    drift_pct = round((final - first) / first * 100, 1)
    sentinel_clean = all(pass_clean)
    if not sentinel_clean:
        flagged = [i for i, ok in enumerate(pass_clean) if not ok]
        print(
            f"WARNING: load sentinel flagged pass(es) {flagged} "
            f"(sentinels {[round(s, 3) for s in sentinels]}): host "
            f"contention likely, re-run before trusting this artifact",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # r9 post-mortem (VERDICT r9, "wrong" #1): the driver captures only
    # the LAST ~2000 stdout chars, and r9's single metric line (with
    # queries_normalized inline) outgrew that window -> BENCH_r09.json
    # recorded ``parsed: null``. The contract line printed LAST is now
    # the compact one (metric/value/queries/sf + small scalars, ~1.6 KB
    # at 36 queries); the full detail (normalized per-query dict, aux
    # tiers, sentinel brackets) goes to an EARLIER stdout line and a
    # sidecar file so nothing is lost and nothing truncates.
    detail = {
        "metric": "headline_queries_detail",
        "aux": aux,
        "queries_normalized": normalized,
        "load_sentinel": {
            "first_s": round(first, 3),
            "final_s": round(final, 3),
            "drift_pct": drift_pct,
            "per_pass_s": [round(s, 3) for s in sentinels],
            "pass_factor": [round(f, 4) for f in pass_factor],
            "pass_clean": pass_clean,
            "clean": sentinel_clean,
        },
    }
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "normalized_total": round(sum(normalized.values()), 3),
        "cpu_calibration_s": calibration,
        "cpu_calibration_mt_s": calibration_mt,
        "shuffle_calibration_s": calibration_bw,
        "sentinel_clean": sentinel_clean,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    try:
        sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
        with open(sidecar, "w") as fh:
            json.dump({**summary, **detail, "metric": summary["metric"]}, fh, indent=1)
    except OSError:
        pass  # sidecar is best-effort; the stdout lines are the record
    print(json.dumps(detail))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
