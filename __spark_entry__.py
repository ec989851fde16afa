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
    _temporal,
    _tpch_complete,
    _text,
    _queries,
    _analytics,
    _relational,
    _tpch_extended,
]

# The driver's correctness run is budgeted (~50 entries per round) and
# walks the merged dict in insertion order, so the registry is ordered
# at ENTRY level. Round-4 ordering (VERDICT.md r3, Next #2): first the
# round-3 red row + its latent twin (binary outputs now digest-
# projected), then the new sketch/ANN bound-check twins (first driver
# proof), then every entry whose plan changed after its only driver
# green — the r1-proven cohort predates the memoized catalog (b9e28d0)
# and the view's hash-join geo rewrite (df04d5b) — longest-unproven
# first within the cohort. Nothing in this window is already proven on
# current code. Guarded against rot by
# tests/test_registry_hygiene.py::test_priority_names_exist.
_PRIORITY = [
    # -- round-3 red + latent twin: binary payloads now ride as md5 --
    "multimodal_resize",
    "multimodal_frame_sample",
    # -- new bound-check twins: sketch/ANN error bounds as hash rows --
    "approx_distinct_error_check",
    "approx_percentile_error_check",
    "sim_lsh_recall_check",
    "sim_ivf_recall_check",
    "vocab_topk_containment_check",
    # -- new A/B twins (r4): first driver proof --
    "view_customer_value_summary_bucketed",
    "dedup_minhash_lsh_grouped",
    # -- new corpus-level operators (r4): first driver proof --
    "corpus_stats_report",
    "quality_decile_curriculum",
    "dedup_survivors_best_quality",
    "dq_column_profile",
    "stream_minute_rollup_drain",
    "stream_user_upsert_drain",
    "stream_ingest_verdicts_drain",
    "stream_cdc_latest_drain",
    "stream_tumbling_window_drain",
    "stream_interval_join_drain",
    "stream_sliding_window_drain",
    "stream_session_window_drain",
    "split_pack_concat",
    # -- r1-green on r1 code; plans changed in r3 (catalog + geo join) --
    "view_customer_value_summary",
    "flagship_revenue_by_region",
    "q1_top_revenue_customers",
    "q1_full",
    "q2_most_frequent_customers",
    "q3_top_late_fees",
    "q4_frequency_segmentation",
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
    "tableau_g5_spend_by_type_year",
    # -- rest of the r1 cohort: proven once, on pre-r3 shared paths --
    "analytics_funnel_stage_counts",
    "analytics_retention_day_cohorts",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    # q6 is a bench headline — keep it inside the ~50-entry driver
    # window ahead of the cheaper set-op/window re-proofs
    "tpch_q6_forecast_revenue",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "top_nations_customers_semi",
    "parts_never_ordered_anti",
    "active_high_value_except_recent",
    "party_names_union",
    "customers_above_avg_balance",
    "customer_order_windows",
    "customer_value_distribution_windows",
    "repeat_customers_intersect",
    "nation_customer_list",
    "nations_having_many_customers",
    "promo_parts_like",
    "revenue_rollup_region_nation",
    "lineitem_flag_status_cube",
    "distinct_segments",
    "grouping_sets_flag_status",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
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
