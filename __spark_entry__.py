"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` register every implemented operator (SURVEY.md §2) with
its DuckDB oracle twin. Registries live next to the operator code in
``customer_revenue_analysis_sql_tableau_spark.operators.*`` and are merged here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from customer_revenue_analysis_sql_tableau_spark.operators import analytics as _analytics
from customer_revenue_analysis_sql_tableau_spark.operators import corpus as _corpus
from customer_revenue_analysis_sql_tableau_spark.operators import queries as _queries
from customer_revenue_analysis_sql_tableau_spark.operators import procedures as _procedures
from customer_revenue_analysis_sql_tableau_spark.operators import relational as _relational
from customer_revenue_analysis_sql_tableau_spark.operators import rollups as _rollups
from customer_revenue_analysis_sql_tableau_spark.operators import decontamination as _decontamination
from customer_revenue_analysis_sql_tableau_spark.operators import dedup as _dedup
from customer_revenue_analysis_sql_tableau_spark.operators import embeddings as _embeddings
from customer_revenue_analysis_sql_tableau_spark.operators import features as _features
from customer_revenue_analysis_sql_tableau_spark.operators import graph as _graph
from customer_revenue_analysis_sql_tableau_spark.operators import incremental as _incremental
from customer_revenue_analysis_sql_tableau_spark.operators import multimodal as _multimodal
from customer_revenue_analysis_sql_tableau_spark.operators import pipeline as _pipeline
from customer_revenue_analysis_sql_tableau_spark.operators import quality as _quality
from customer_revenue_analysis_sql_tableau_spark.operators import similarity as _similarity
from customer_revenue_analysis_sql_tableau_spark.operators import sketch_checks as _sketch_checks
from customer_revenue_analysis_sql_tableau_spark.operators import splits as _splits
from customer_revenue_analysis_sql_tableau_spark.operators import temporal as _temporal
from customer_revenue_analysis_sql_tableau_spark.operators import tpch_complete as _tpch_complete
from customer_revenue_analysis_sql_tableau_spark.operators import tpch_extended as _tpch_extended
from customer_revenue_analysis_sql_tableau_spark.operators import text as _text
from customer_revenue_analysis_sql_tableau_spark import app_layer as _app_layer
from customer_revenue_analysis_sql_tableau_spark import streaming as _streaming
from customer_revenue_analysis_sql_tableau_spark.functions import gallery as _gallery
from customer_revenue_analysis_sql_tableau_spark.sources import roundtrips as _roundtrips

_REGISTRY_MODULES = [
    _pipeline,
    _corpus,
    _quality,
    _gallery,
    _decontamination,
    _embeddings,
    _incremental,
    _rollups,
    _similarity,
    _sketch_checks,
    _app_layer,
    _multimodal,
    _procedures,
    _splits,
    _streaming,
    _dedup,
    _features,
    _graph,
    _temporal,
    _tpch_complete,
    _text,
    _queries,
    _analytics,
    _relational,
    _tpch_extended,
    _roundtrips,
]

# The driver's correctness run is budgeted (~50 entries per round) and
# walks the merged dict in insertion order, so the registry is ordered
# at ENTRY level. Round-7 ordering (VERDICT.md r6, Next #1/#2/#3):
# (1) the FOUR r6-late entries that have never been in a driver window
# (front-loaded per the r6 verdict's top directive); (2) the TEN new
# r7 entries — JPEG header tier (r6 Next #5), FULL baseline JPEG pixel
# decode (last stub retired), real-LZW GIF, the composed IVF-PQ tier +
# its recall bound, integer fixed-point PageRank (new iterative-graph
# family), the leakage-safe component-keyed split, exact fixed-point
# Lloyd's k-means, incremental ingest dedup, and the sliding-window
# late-drop drain; (3) entries
# whose registered plan/digest changed this round — sim_pq_topk's
# two-stage bounded ADC shortlist (r6 "What's wrong" #1) + its recall
# bound, the approx-cutoffs non-null-population fix,
# jsonl_corrupt_tolerance's NULL-sentinel digest (driver ADVICE), and
# the WAV/BMP codec entries (codec scans now repartitioned — plan
# change); (4) the ENTIRE 23-entry r3-freshness cohort — with these
# the r3 backlog empties completely (every registry entry's freshest
# proof becomes r4+); (5) r4-proven reference-core entries (flagship,
# the 8-table view, q1-q11) as the freshness frontier advances.
# Guarded against rot by
# tests/test_registry_hygiene.py::test_priority_names_exist.
_PRIORITY = [
    # -- r6-late, first driver proof (VERDICT r6, Next #1) --
    "jsonl_corrupt_tolerance",  # PERMISSIVE quarantine + NULL-sentinel digest
    "multimodal_decode_png",  # real stdlib PNG codec (zlib + 5 filters)
    "split_length_buckets",  # padding-efficiency planner
    "stream_late_session_drain",  # session-window event-time drop rule
    # -- new this round (r7) --
    "multimodal_decode_jpeg_header",  # stdlib SOF marker walk (r6 Next #5)
    "multimodal_decode_jpeg",  # FULL baseline JPEG decode (last stub retired)
    "multimodal_decode_gif",  # real LZW decoder + interlace under the hash
    "sim_ivfpq_topk",  # IVF-PQ composed tier (rows-only)
    "sim_ivfpq_recall_check",  # its driver-hash recall bound
    "graph_pagerank_copurchase",  # integer fixed-point PageRank (new family)
    "split_leakage_safe",  # component-keyed split — near-dups never straddle
    "emb_kmeans_assign",  # exact fixed-point Lloyd's k-means (iterative ML)
    "dedup_incremental_lsh",  # delivery-vs-base asymmetric band join
    "stream_late_sliding_drain",  # per-window-copy late-drop rule
    "temporal_asof_tolerance",  # merge_asof tolerance-bound semantics
    "parquet_schema_evolution",  # mergeSchema union-widening digest
    "dedup_components_bigstar",  # large-star/small-star O(log n) components
    "graph_triangle_stats",  # degree-ordered exact triangle count
    "stream_interval_join_multibatch_drain",  # join state across batches
    "inc_revenue_with_retractions",  # IVM under DELETES (signed merge)
    # -- plans/digests changed this round: re-prove on current code --
    "sim_pq_topk",  # two-stage bounded ADC shortlist (rows-only)
    "sim_pq_recall_check",  # recall bound over the new plan
    "quality_decile_cutoffs_approx_check",  # non-null population fix
    "multimodal_decode_wav",  # codec scans now repartitioned (plan change)
    "multimodal_decode_bmp",  # codec scans now repartitioned (plan change)
    # -- proof refresh: the whole remaining r3 cohort (empties it) --
    "text_doc_fingerprint",
    "text_fulltext_search",
    "text_gopher_filters",
    "text_lang_histogram",
    "text_lang_id_ngram",
    "text_phrase_search",
    "text_ranked_search",
    "text_rolling_fingerprint",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_token_stats_bpe",
    "text_top_terms_per_source",
    "text_unigram_logprob",
    "analytics_event_type_bigrams",
    "analytics_funnel_conversion_lag",
    "analytics_sessionize_events",
    "dq_constraint_violations",
    "events_json_extract",
    "inc_state_rollup",
    "multimodal_size_stats",
    "split_mixture_sample",
    "split_pack_sequences",
    "tableau_g2_first_order_day",
    # -- proof refresh: r4-proven reference-core surface --
    "flagship_revenue_by_region",
    "view_customer_value_summary",
    # ---- ~50-entry budget cut falls here ----
    "view_customer_value_summary_bucketed",
    "q1_top_revenue_customers",
    "q1_full",
    "q2_most_frequent_customers",
    "q3_top_late_fees",
    "q4_frequency_segmentation",
    # (eleven r4-refresh slots ceded to the new GIF + IVF-PQ +
    # full-JPEG + PageRank + leakage-safe-split + k-means +
    # incremental-dedup + sliding-late-drain entries and the two
    # plan-changed codec re-proofs; the entries below stay r4-proven,
    # code paths unchanged)
    "q5_churn_risk",
    "q6_revenue_by_category",
    "q7_customer_lifetime_value",
    "q8_customer_cohorts",
    "q9_revenue_by_nation",
    "q10_revenue_by_nation_region",
    "q11_avg_revenue_per_customer",
    "mfc_window_top1",
    "tableau_g1_country_map",
    "tableau_g3_revenue_by_category",
    "tableau_g4_late_fees_by_category",
]


def _prioritized(merged: dict) -> dict:
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _queries.flagship_revenue_by_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _REGISTRY_MODULES:
        out.update(mod.QUERIES)
    return _prioritized(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each (SQL-expressible) query."""
    out: dict[str, str] = {}
    for mod in _REGISTRY_MODULES:
        out.update(mod.ORACLES)
    return _prioritized(out)
