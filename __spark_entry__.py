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
# at ENTRY level. Round-9 ordering (VERDICT.md r8, Next #2-#7):
# (1) the TEN new r9 entries that have never been in a driver window —
# the ANN-deletion triple (exact surviving-corpus baseline, rows-only
# tombstoning IVF tier, its recall bound; r8 Next #5), the
# left-outer/full-outer/left-semi stream-stream interval-join drains
# (r8 Next #4 + the completed join-type matrix), the EventTimeTimeout
# sessionization drain (probed timer rules + the wm+1ms clamp), BPE
# merge-table training + corpus application (r8 Next #7), and the
# CBO-planned catalog join (r8 Next #6); (2) the THREE entries whose
# registered plan or oracle changed this round and must re-prove on
# current code — the edit-distance join (positional Ed-Join filter +
# short-doc fallback, r8 Next #3 + ADVICE), the variant extract
# (null-safe n_tag_match on both sides, ADVICE), and the reworked
# genuinely-multi-batch interval-join drain; (3) the full
# TWENTY-THREE-entry r4 proof-staleness cohort promoted per r8 Next #2
# (seven streaming drains, five TPC-H shapes, funnel/retention,
# tableau G5, semi/anti joins, two multimodal ops, grouped LSH, corpus
# report, DQ profile, pack-concat) — the freshest-proof floor becomes
# r5+ for every entry; (4) slack slots go to the next-stalest
# r5-proven cohort (dedup family, rollup, TPC-H q7/q8/q13/q14/q15,
# procedures, features, splits, IVM). Guarded against rot by
# tests/test_registry_hygiene.py::test_priority_names_exist.
_PRIORITY = [
    # -- new this round (r9), first driver proof --
    "sim_delete_brute_topk",  # exact top-k over survivors (oracle-backed)
    "sim_delete_ivf_topk",  # tombstone anti-join + cell compaction (rows-only)
    "sim_delete_recall_check",  # its driver-hash recall bound
    "stream_interval_left_join_drain",  # probed outer-null emission rules
    "stream_interval_full_join_drain",  # + click-side nulls (strict bound)
    "stream_interval_semi_join_drain",  # once-only matched-flag emission
    "stream_timeout_sessions_drain",  # EventTimeTimeout rules + wm+1 clamp
    "text_bpe_train",  # full-trajectory BPE merge training
    "text_bpe_tokenize",  # merge-table application over the corpus
    "cbo_stats_revenue_by_customer",  # CBO-planned unhinted join (ANALYZE stats)
    # -- plan/oracle changed this round: re-prove on current code --
    "dedup_edit_distance",  # positional Ed-Join filter + short-doc fallback
    "events_variant_extract",  # null-safe n_tag_match on both sides
    "stream_interval_join_multibatch_drain",  # REAL multi-batch staging (r9 rework)
    # -- r8 Next #2: the full r4 proof-staleness cohort (floor -> r5+) --
    "stream_minute_rollup_drain",
    "stream_user_upsert_drain",
    "stream_cdc_latest_drain",
    "stream_tumbling_window_drain",
    "stream_interval_join_drain",
    "stream_sliding_window_drain",
    "stream_session_window_drain",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "analytics_funnel_stage_counts",
    "analytics_retention_day_cohorts",
    "tableau_g5_spend_by_type_year",
    "top_nations_customers_semi",
    "parts_never_ordered_anti",
    "multimodal_resize",
    "multimodal_frame_sample",
    "dedup_minhash_lsh_grouped",
    "corpus_stats_report",
    "dq_column_profile",
    "split_pack_concat",
    # -- slack: next-stalest r5-proven refreshes --
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_components",
    "dedup_components_distributed",
    "rollup_minute",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "proc_customer_balance",
    # ---- ~50-entry budget cut falls here ----
    "proc_rewards_report",
    "feat_minmax_normalize",
    "feat_vocab_coverage",
    "feat_word_bigram_counts",
    "split_train_test",
    "inc_view_maintenance",
    "stream_resumable_restart_drain",
    "split_pii_redact",
    "proc_parts_in_stock",
    "split_chunk_documents",
    "feat_value_quartile_bins",
    "feat_zscore_outliers",
    # (r6-r8-proven entries keep their fresh proofs; code unchanged)
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
