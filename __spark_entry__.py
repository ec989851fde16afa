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
# at ENTRY level. Round-10 ordering (VERDICT.md r9, Next #2-#7):
# (1) the THIRTEEN new r10 entries that have never been in a driver
# window — the right-outer interval-join drain (completes the
# stream-stream join-type matrix, r9 Next #6), the persisted-IVF
# SEGMENT LIFECYCLE (build summary + read path + recall bound, delete
# compaction + its read path + bound, insert-delta ingest + its read
# path + bound; r9 Next #3 made literal end-to-end), batched BPE
# training + its corpus-wide tokenizer (greedy non-conflicting top-B
# merges per round, full-trajectory oracles; r9 Next #4), and the
# CBO-planned unhinted view fill over the ANALYZEd catalog (r9 Next
# #7); (2) the FOUR entries whose staging, oracle, or code path
# changed this round and must re-prove on current code — the
# timeout-sessions drain (bounded order-statistic tercile staging
# replacing the global ntile, r9 ADVICE), the CBO revenue entry
# (catalog names now fingerprint the source data, r9 ADVICE), and the
# two BPE entries (pair counting refactored into the shared helper);
# (3) the full TWENTY-SEVEN-entry r5 proof-staleness cohort promoted
# per r9 Next #2 (set-ops, grouping-sets/cube/rollup, feat_* x5,
# proc_* x4, split_* x4, windows x2, IVM, resumable-restart drain,
# repetition stats, top-50 cap, LIKE filter) — the freshest-proof
# floor becomes r6+; (4) slack slots go to the next-stalest r6-proven
# entries (roundtrip digests, rollup tiers, quality deciles). Guarded
# against rot by tests/test_registry_hygiene.py::
# test_priority_names_exist.
_PRIORITY = [
    # -- new this round (r10), first driver proof --
    "stream_interval_right_join_drain",  # null-gated side flips to clicks
    "sim_ivf_index_build",  # persisted-index build summary (oracle-backed)
    "sim_persisted_ivf_topk",  # pure read path over persisted artifacts (rows-only)
    "sim_persisted_recall_check",  # its driver-hash recall bound
    "text_bpe_train_batched",  # greedy non-conflicting top-B merges per round
    "text_bpe_tokenize_batched",  # 70-merge vocabulary applied corpus-wide
    "view_customer_value_summary_analyzed",  # CBO-planned unhinted view fill
    "sim_persisted_index_compact",  # delete compaction on the persisted index
    "sim_persisted_delete_ivf_topk",  # read path over base ∪ delta segments (rows-only)
    "sim_persisted_delete_recall_check",  # its driver-hash recall bound
    "sim_persisted_ingest_delta",  # insert-delta segment on the persisted index
    "sim_persisted_delivery_topk",  # delivery read path over base segments (rows-only)
    "sim_persisted_delivery_recall_check",  # its driver-hash recall bound
    # -- staging/oracle/code-path changed this round: re-prove --
    "stream_timeout_sessions_drain",  # bounded order-statistic terciles (ADVICE)
    "cbo_stats_revenue_by_customer",  # data-fingerprinted catalog names (ADVICE)
    "text_bpe_train",  # pair counting refactored into shared helper
    "text_bpe_tokenize",  # same refactor (shared _bpe_fit path)
    # -- r9 Next #2: the full r5 proof-staleness cohort (floor -> r6+) --
    "party_names_union",
    "repeat_customers_intersect",
    "active_high_value_except_recent",
    "distinct_segments",
    "lineitem_flag_status_cube",
    "revenue_rollup_region_nation",
    "grouping_sets_flag_status",
    "customer_order_windows",
    "customer_value_distribution_windows",
    "feat_minmax_normalize",
    "feat_value_quartile_bins",
    "feat_vocab_coverage",
    "feat_word_bigram_counts",
    "feat_zscore_outliers",
    "proc_part_held_by_customers",
    "proc_parts_in_stock",
    "proc_parts_not_in_stock",
    "proc_rewards_report",
    "split_chunk_documents",
    "split_pii_redact",
    "split_sample_per_source",
    "split_train_test",
    "inc_view_maintenance",
    "stream_resumable_restart_drain",
    "text_repetition_stats",
    "app_top50_cap",
    "promo_parts_like",
    # -- slack: next-stalest r6-proven refreshes --
    "csv_roundtrip_digest",
    "jsonl_roundtrip_digest",
    "orc_roundtrip_digest",
    "rollup_daily_from_hours",
    "rollup_hourly_from_minutes",
    "quality_decile_cutoffs",
    "quality_decile_curriculum",
    # ---- ~50-entry budget cut falls here ----
    "dedup_containment_prefix",
    "dedup_embedding_signlsh",
    "dedup_survivors_best_quality",
    "emb_label_profile",
    "emb_norm_stats",
    "feat_stratified_sample",
    "multimodal_decode_features",
    "split_temperature_mixture",
    "stream_dedup_first",
    "stream_ingest_verdicts_drain",
    "stream_late_data_drain",
    "temporal_latest_per_user",
    "temporal_pivot_user_values",
    "temporal_range_join",
    "temporal_rolling_value_10min",
    "temporal_unpivot_user_values",
    "temporal_value_percentiles",
    "text_quality_score",
    "training_data_pipeline",
    # (r7-r9-proven entries keep their fresh proofs; code unchanged)
    "flagship_revenue_by_region",
    "view_customer_value_summary",
    "view_customer_value_summary_bucketed",
    "q1_top_revenue_customers",
    "q5_churn_risk",
    "mfc_window_top1",
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
