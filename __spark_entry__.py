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
# at ENTRY level. Round-5 ordering (VERDICT.md r4, Next #1-#3): first
# the entries that are NEW or whose plan changed this round (they need
# a first/fresh proof), then the stale-proof backlog — every entry
# last driver-proven on r1/r2 code, which predates the r3 shared-path
# changes (memoized catalog b9e28d0, geo join df04d5b) — r1 cohort
# first, then r2. Eleven r2-cohort entries whose semantics are covered
# by an r4-hash-green twin are deferred past the 50-entry budget cut
# (see the trailing section); everything proven r3/r4 on current code
# stays out of the window. Guarded against rot by
# tests/test_registry_hygiene.py::test_priority_names_exist.
_PRIORITY = [
    # -- new this round (r5): first driver proof --
    "quality_decile_cutoffs",  # percentile-threshold curriculum tier
    "stream_resumable_restart_drain",  # crash recovery under the hash
    # -- plans changed this round: re-prove on current code --
    "quality_decile_curriculum",  # global ntile → distributed rank
    "feat_word_bigram_counts",  # ranking window now top-K-capped
    # -- stale backlog, r1 cohort (proven once, on pre-r3 paths) --
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
    # -- stale backlog, r2 cohort --
    "scalar_function_gallery",
    "app_any_column_search",
    "app_range_filter",
    "app_top50_cap",
    "proc_rewards_report",
    "proc_customer_balance",
    "proc_parts_in_stock",
    "proc_parts_not_in_stock",
    "proc_part_held_by_customers",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "dedup_components_distributed",
    "feat_vocab_coverage",  # also plan-changed: top-K-capped window
    "feat_value_quartile_bins",
    "feat_zscore_outliers",
    "feat_minmax_normalize",
    "split_train_test",
    "split_sample_per_source",
    "split_chunk_documents",
    "split_pii_redact",
    "rollup_minute",
    "inc_view_maintenance",
    "text_repetition_stats",
    "training_data_pipeline",
    # ---- ~50-entry budget cut falls here ----
    # Deferred stale r2 entries (for r6): each is covered by an
    # r4-hash-green twin exercising the same code path — the window
    # batch twins by the r4 stream_*_drain entries, the dedup batch
    # twin by the ingest-verdicts drain, brute-force top-k runs inside
    # the r4 recall bound checks, decode_features shares the r4-green
    # multimodal plumbing, hourly/daily rollups are the minute tier's
    # merge algebra, and the sample/embedding stats are single-pass
    # aggregates on unchanged paths.
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_first",
    "sim_bruteforce_topk",
    "multimodal_decode_features",
    "rollup_hourly_from_minutes",
    "rollup_daily_from_hours",
    "feat_stratified_sample",
    "emb_norm_stats",
    "emb_label_profile",
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
