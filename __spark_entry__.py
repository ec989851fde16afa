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
# at ENTRY level. Round-6 ordering (VERDICT.md r5, Next #2): (1) the
# ten NEW entries; (2) every entry whose registered plan changed this
# round — quality_decile_curriculum's self-scaling buckets + NULL
# guard, and the five entries riding the quality score's new nullif
# divisor (operators/text.py quality_scored); (3) the ELEVEN deferred
# r2-cohort entries — with these the pre-r3 backlog is fully retired;
# (4) twenty-three of the 47 entries whose last proof is r3 (oldest
# first by family) — proof freshness, not a correctness requirement:
# r3 proofs are on current code paths. The 24 r3 entries past the cut
# (the text family, tableau_g2, analytics, two splits, events_json,
# multimodal_size_stats, dq_constraint_violations, inc_state_rollup)
# roll to r7. Guarded against rot by
# tests/test_registry_hygiene.py::test_priority_names_exist.
_PRIORITY = [
    # -- new this round (r6): first driver proof --
    "quality_decile_cutoffs_approx_check",  # sketch-tier bound twin
    "multimodal_decode_wav",  # real stdlib RIFF codec under the hash
    "multimodal_decode_bmp",  # real stdlib BMP codec under the hash
    "stream_late_data_drain",  # multi-batch watermark late-drop policy
    "csv_roundtrip_digest",  # CSV encode->decode fidelity under the hash
    "jsonl_roundtrip_digest",  # JSONL escaping fidelity under the hash
    "orc_roundtrip_digest",  # ORC timestamp/double fidelity under the hash
    "split_temperature_mixture",  # temperature-flattened source mixture
    "sim_pq_topk",  # product-quantization ANN tier (rows-only)
    "sim_pq_recall_check",  # its driver-hash recall bound
    # -- plans changed this round: re-prove on current code --
    "quality_decile_curriculum",  # dynamic RANK buckets + NULL bucket
    "quality_decile_cutoffs",  # quality score nullif divisor
    "text_quality_score",  # quality score nullif divisor
    "dedup_survivors_best_quality",  # retention policy reads the score
    "training_data_pipeline",  # composed pipeline gates on the score
    "stream_ingest_verdicts_drain",  # streamed quality gate
    # -- last pre-r3 proofs: the 11 entries deferred in r5 --
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
    # -- proof refresh: r3-proven cohort, 23 of 47 --
    "temporal_asof_join",
    "temporal_range_join",
    "temporal_pivot_user_values",
    "temporal_unpivot_user_values",
    "temporal_rolling_value_10min",
    "temporal_latest_per_user",
    "temporal_value_percentiles",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_parts",
    "tpch_q12_late_lines_by_flag",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_dominant_promo_suppliers",
    "tpch_q21_sole_late_supplier",
    "tpch_q22_dormant_high_balance",
    "dedup_containment",
    "dedup_containment_prefix",
    "dedup_embedding_signlsh",
    "decontaminate_ngram_overlap",
    # ---- ~50-entry budget cut falls here ----
    # r6-late additions (locally hash-green at sf0.001/0.01; first
    # driver proof lands in the r7 window): PERMISSIVE corrupt-line
    # quarantine summary; the real stdlib PNG codec (zlib inflate +
    # all five scanline filters, proven on the reference's own chart
    # files in pytest); the padding-efficiency length-bucket report;
    # the session-window late-drop drain (event-time drop rule pinned).
    "jsonl_corrupt_tolerance",
    "multimodal_decode_png",
    "split_length_buckets",
    "stream_late_session_drain",
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
