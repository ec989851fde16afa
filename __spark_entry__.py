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
# at ENTRY level. Round-8 ordering (VERDICT.md r7, Next #2/#3/#4/#5/#6):
# (1) the NINE new r8 entries that have never been in a driver
# window — deletable min/max IVM (r7 Next #5), the directed PageRank
# twin with dangling-mass handling (r7 Next #6), time-series gap fill,
# the edit-distance fuzzy join, stratified sampling, SCD Type 2
# intervals, and the incremental-ANN triple (delivery brute baseline,
# rows-only IVF ingest tier, its recall bound); (2) the FOUR PQ
# entries whose registered plans changed this round — codes are now a
# packed 10-byte BinaryType bitstream with a conv/shift JVM unpack
# (r7 Next #4) — re-proved on current code; (3) the SEVENTEEN
# r4-proven reference-core parity entries (q1–q11, q1_full, the MFC
# window, three Tableau charts, the bucketed view fill) promoted per
# r7 Next #2 — the parity surface is the project's name and must
# never be the stalest thing in the registry (floor becomes r5+);
# (4) the FIVE stale rows-only entries (last windowed r1–r3) re-listed
# adjacent to their hash-green bound twins per r7 Next #3; (5) slack
# slots go to the next-stalest r5-proven cohort. Guarded against rot
# by tests/test_registry_hygiene.py::test_priority_names_exist.
_PRIORITY = [
    # -- new this round (r8), first driver proof --
    "inc_minmax_with_retractions",  # deletable MIN/MAX IVM (buffers + drain recompute)
    "graph_pagerank_directed",  # teleport-only re-rank + dangling-mass share
    "temporal_gap_fill",  # dense hourly grid + forward fill per user
    "dedup_edit_distance",  # lossless q-gram prefix filter + banded verify
    "split_stratified_sample",  # exact ceil(n/5) per (lang, source) stratum
    "temporal_scd2_user_state",  # SCD Type 2 validity intervals
    "sim_delivery_brute_topk",  # exact delivery-vs-base baseline (oracle-backed)
    "sim_incremental_ivf",  # ANN ingest vs persisted quantizer (rows-only)
    "sim_incremental_recall_check",  # its driver-hash recall bound
    "events_variant_extract",  # Spark 4 VARIANT parse/navigate round-trip
    "dedup_exact_substring",  # Lee-et-al. window duplication coverage
    "feat_ewma_user_value",  # fixed-order exponential-decay feature
    "stream_crossbatch_dedup_drain",  # dedup late/expiry/no-extension rules
    # -- plans changed this round (packed 10-byte PQ storage): re-prove --
    "sim_pq_topk",  # rows-only; BinaryType codes + conv/shift ADC
    "sim_pq_recall_check",  # recall bound over the packed plan
    "sim_ivfpq_topk",  # rows-only; packed residual codes
    "sim_ivfpq_recall_check",  # recall bound over the packed plan
    # -- r7 Next #2: reference-core proof refresh (r4 → r8) --
    "view_customer_value_summary_bucketed",
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
    # -- r7 Next #3: stale rows-only re-windows, each beside its twin --
    "sim_lsh_topk",  # rows-only, last windowed r2
    "sim_lsh_recall_check",
    "sim_ivf_topk",  # rows-only, last windowed r2
    "sim_ivf_recall_check",
    "approx_distinct_customers_by_nation",  # rows-only, last windowed r1
    "approx_distinct_error_check",
    "feat_vocab_topk_sketch",  # rows-only, last windowed r2
    "vocab_topk_containment_check",
    "temporal_value_percentiles_approx",  # rows-only, last windowed r3
    "approx_percentile_error_check",
    # -- slack: next-stalest r5-proven refreshes --
    "scalar_function_gallery",
    "nations_having_many_customers",
    # ---- ~50-entry budget cut falls here ----
    "customers_above_avg_balance",
    "nation_customer_list",
    "app_any_column_search",
    "app_range_filter",
    # (r6/r7-proven entries keep their fresh proofs; code unchanged)
    "flagship_revenue_by_region",
    "view_customer_value_summary",
    "jsonl_corrupt_tolerance",
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "graph_pagerank_copurchase",
    "inc_revenue_with_retractions",
    "split_leakage_safe",
    "emb_kmeans_assign",
    "dedup_incremental_lsh",
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
