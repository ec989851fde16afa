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
    _quality,
    _gallery,
    _decontamination,
    _embeddings,
    _incremental,
    _rollups,
    _similarity,
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

# The driver's correctness run is budgeted (~50 entries in rounds 1-2)
# and walks the merged dict in insertion order, so the registry is
# ordered at ENTRY level: first the rows whose latest driver word is
# red (all fixed in code — round-3 must re-prove them), then every
# entry no driver round has ever reached (CORRECTNESS_r01+r02 union),
# then everything already driver-green. Guarded against rot by
# tests/test_registry_hygiene.py::test_priority_names_exist.
_PRIORITY = [
    # -- fixed red rows: 6× r2 HUGEINT-oracle fixes + 3× r1 fixes --
    "dq_constraint_violations",
    "decontaminate_ngram_overlap",
    "inc_state_rollup",
    "split_pack_sequences",
    "multimodal_size_stats",
    "events_json_extract",
    "tableau_g2_first_order_day",
    "analytics_funnel_conversion_lag",
    "analytics_event_type_bigrams",
    # -- never driver-verified: missed both 50-entry windows --
    "feat_word_bigram_counts",
    "temporal_asof_join",
    "temporal_range_join",
    "temporal_pivot_user_values",
    "temporal_unpivot_user_values",
    "temporal_rolling_value_10min",
    "temporal_latest_per_user",
    "temporal_value_percentiles",
    "temporal_value_percentiles_approx",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_parts",
    "tpch_q12_late_lines_by_flag",
    "tpch_q16_supplier_counts",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_dominant_promo_suppliers",
    "tpch_q21_sole_late_supplier",
    "text_token_stats",
    "text_token_stats_bpe",
    "text_quality_score",
    "text_lang_histogram",
    "text_lang_id_ngram",
    "text_top_terms_per_source",
    "text_tfidf_top_terms",
    "text_doc_fingerprint",
    "text_rolling_fingerprint",
    "text_fulltext_search",
    "text_phrase_search",
    "text_ranked_search",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q22_dormant_high_balance",
    # -- new in round 3: first driver proof --
    "split_mixture_sample",
    "text_unigram_logprob",
    "dedup_containment",
    "dedup_containment_prefix",
    "dedup_embedding_signlsh",
    "analytics_sessionize_events",
    "text_gopher_filters",
    # rows-only → hash-checked upgrades (round 3): need a driver hash row
    "multimodal_resize",
    "multimodal_frame_sample",
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
