"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each timing covers full execution to a driver-side count/collect
(``df.count()`` after a no-op cache-free plan), warm JVM, cold per-query
plans. The headline set covers the warehouse view + its heaviest
regroupings + the flagship join-agg.
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    queries = entrymod.queries()
    # JVM warmup on the tiniest SF so first-query JIT/codegen cost isn't
    # billed to the measured scale factor (the view's generated code is
    # the largest compile unit; sf0.001 keeps the warmup itself cheap).
    queries["flagship_revenue_by_region"](spark, "/root/testdata/sf0.001").count()
    queries["view_customer_value_summary"](spark, "/root/testdata/sf0.001").count()

    # untimed layout build for the bucketed-view A/B: the write-once
    # shuffle is ingest cost, not query cost
    if "view_customer_value_summary_bucketed" in queries:
        from customer_revenue_analysis_sql_tableau_spark.operators.warehouse import (
            prepare_bucketed_facts,
        )

        prepare_bucketed_facts(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        # min of two runs: single-shot numbers swing ±30% with host
        # contention; the min is the noise-robust estimate. The view
        # memoizes its materialization, so its cache is evicted before
        # each run — both timings cover the honest fill.
        best = None
        for _ in range(2):
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
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if name == "view_customer_value_summary":
            # warm tier: the memoized materialization is still cached
            # from the run above — the cost q1-q11 actually pay per read
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            assert n >= 0
            timings["view_customer_value_summary__warm"] = round(
                time.perf_counter() - t0, 3
            )
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
