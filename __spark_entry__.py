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
from customer_revenue_analysis_sql_tableau_spark.operators import segment_store as _segment_store
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
from customer_revenue_analysis_sql_tableau_spark.sources import compaction as _compaction
from customer_revenue_analysis_sql_tableau_spark.sources import manifest_stream_source as _manifest_stream_source
from customer_revenue_analysis_sql_tableau_spark.sources import manifest_table as _manifest_table
from customer_revenue_analysis_sql_tableau_spark.sources import roundtrips as _roundtrips
from customer_revenue_analysis_sql_tableau_spark.sources import table_api as _table_api

_REGISTRY_MODULES = [
    _pipeline,
    _corpus,
    _quality,
    _gallery,
    _decontamination,
    _embeddings,
    _incremental,
    _rollups,
    _segment_store,
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
    _compaction,
    _manifest_table,
    _manifest_stream_source,
    _table_api,
]

# The driver's correctness run is budgeted (~50 entries per round) and
# walks the merged dict in insertion order, so the registry is ordered
# at ENTRY level. Round-14 ordering (VERDICT.md r13, Next #1-#6):
# (1) the TWO r7-stale budget-spill entries FIRST (r13 Next #3 — both
# code-unchanged and pytest-pinned, swept before anything else so the
# registry-wide proof floor finally clears r7);
# (2) the ELEVEN new r14 entries, first driver proof — transaction
# conflict detection (deterministic merge-vs-stale-compaction abort
# CAPTURED plus a commuting append rebase, row-level oracle over the
# final table; r13 Next #1), the MERGE and DELETE commits' row-level
# change feeds plus the signed-delta IVM consumer (r13 Next #2), the
# exactly-once streaming MERGE drain (r13 Next #4), and the
# manifest-committed OPTIMIZE ZORDER with footer-measured skipping
# (r13 Next #6), the multi-commit CDF fold, the five-verb
# ManifestTable API's DESCRIBE HISTORY, and the manifest-stats pruned
# read, and the Spark-4 Python-DataSource streaming SOURCE over the
# table's commit chain;
# (3) the changed r13 manifest entries yield their driver slots to
# the ten never-proven ones: every change is pytest-pinned (incl.
# dedicated clone-and-rip-v2 torn-bootstrap resume tests and the
# threaded CAS stress), re-proven locally at sf0.001/0.01/0.1 AND
# under shuffle=7 this round, and exercised INSIDE the new entries
# (the change feeds stage through delete/merge, the stream fold
# drains the merge sink, the source drain tails the append chain);
# they head the r15 window;
# (4) the FULL 40-entry r8 proof-staleness cohort. 2+11+40 = 53
# slightly overfills the ~50-entry budget; the r8 tail is
# code-unchanged and pytest-covered, so a <=3-entry spill costs
# nothing (documented rule; spills sweep first in r15). Guarded
# against rot by tests/test_registry_hygiene.py::
# test_priority_names_exist.
_PRIORITY = [
    # -- the last two r7-stale entries: sweep first (r13 Next #3) --
    "text_top_terms_per_source",
    "text_unigram_logprob",
    # -- new this round (r14), first driver proof --
    "parquet_manifest_conflict_detect",  # abort captured + commuting rebase
    "parquet_manifest_change_feed",  # MERGE commit's row-level CDF
    "parquet_manifest_change_feed_delete",  # both delete tiers as CDF
    "manifest_cdf_ivm_revenue",  # signed-delta IVM fold == recompute
    "stream_manifest_merge_drain",  # exactly-once streaming CoW upsert
    "parquet_manifest_zorder_optimize",  # clustered OPTIMIZE, footer-measured
    "manifest_cdf_stream_fold",  # CDF composed across the upsert chain
    "parquet_manifest_history",  # DESCRIBE HISTORY over the 5-verb API
    "parquet_manifest_stats_pruned_read",  # manifest-stats file pruning
    "stream_manifest_source_drain",  # the table AS a streaming source
    "stream_manifest_cdf_drain",  # the change feed AS a stream
    # -- r13 Next #3: the FULL 40-entry r8 proof-staleness cohort --
    "app_any_column_search",
    "app_range_filter",
    "approx_distinct_error_check",
    "approx_percentile_error_check",
    "customers_above_avg_balance",
    "dedup_exact_substring",
    "feat_ewma_user_value",
    "graph_pagerank_directed",
    "inc_minmax_with_retractions",
    "mfc_window_top1",
    "nation_customer_list",
    "nations_having_many_customers",
    "q10_revenue_by_nation_region",
    "q11_avg_revenue_per_customer",
    "q1_full",
    "q1_top_revenue_customers",
    "q2_most_frequent_customers",
    "q3_top_late_fees",
    "q4_frequency_segmentation",
    "q5_churn_risk",
    "q6_revenue_by_category",
    "q7_customer_lifetime_value",
    "q8_customer_cohorts",
    "q9_revenue_by_nation",
    "scalar_function_gallery",
    "sim_delivery_brute_topk",
    "sim_incremental_recall_check",
    "sim_ivf_recall_check",
    "sim_ivfpq_recall_check",
    "sim_lsh_recall_check",
    "sim_pq_recall_check",
    "split_stratified_sample",
    "stream_crossbatch_dedup_drain",
    "tableau_g1_country_map",
    "tableau_g3_revenue_by_category",
    "tableau_g4_late_fees_by_category",
    "temporal_gap_fill",
    # documented <=3-entry spill tail (code-unchanged, pytest-pinned):
    "temporal_scd2_user_state",
    "view_customer_value_summary_bucketed",
    "vocab_topk_containment_check",
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
