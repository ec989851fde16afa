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
]

# The driver's correctness run is budgeted (~50 entries per round) and
# walks the merged dict in insertion order, so the registry is ordered
# at ENTRY level. Round-11 ordering (VERDICT.md r10, Next #1-#6):
# (1) the TWENTY-NINE new r11 entries that have never been in a driver
# window — including the second-session ten: the streaming
# index-maintenance lifecycle (insert drain + maintained read path +
# recall bound + the streaming-delete drain), the shuffle-free
# small-file compaction pass, concat-and-chunk sequence packing, the
# runtime-bloom-pruned join, the in-plan stream-static enrich drain,
# and the native-XML roundtrip — the persisted-BPE lifecycle (6-round vocab build whose
# oracle replays the full trajectory against the ON-DISK merge table,
# the pure-read-path tokenizer, the deep ≥512-target tier with its
# structural-invariant summary + strict compression bound; r10 Next
# #1/#7), the persisted PQ and IVF-PQ lifecycles (build summaries +
# training-free ADC read paths + recall bounds; r10 Next #4), the
# multi-delta background merge (r10 Next #5) plus the multi-writer
# versioned-manifest commit, the per-doc token-id emission, the
# exact-Gramian/PCA tier, the recursive-CTE reachability (the
# oracle is the identical standard-SQL text), and the RocksDB-provider cross-batch-dedup
# drain (r10 Next #6); (2) the FOUR entries whose
# results or code changed this round and must re-prove — the two
# batched-BPE entries (the in-round conflict set now includes the
# merged output symbol on both engines, r10 ADVICE — the merge table
# itself changed), and the two persisted-index summaries whose
# cells_within_geometry invariant tightened to bound max(cell) (r10
# ADVICE); (3) the full THIRTY-NINE-entry r6 proof-staleness cohort
# (r10 Next #3: the TPC-H tail, temporal_* ×8, the three window
# drains, four dedup entries, emb_* ×2, and the rest named in r10
# VERDICT "What's missing" #4) — the ~50-entry budget cuts inside this
# cohort, so its tail (code unchanged, pytest-covered) spills to r12.
# Guarded against rot by tests/test_registry_hygiene.py::
# test_priority_names_exist.
_PRIORITY = [
    # -- new this round (r11), first driver proof --
    "text_bpe_vocab_build",  # persisted merge table, full-trajectory oracle
    "text_bpe_tokenize_persisted",  # pure read path, hash = batched tokenizer
    "text_bpe_vocab_build_deep",  # ≥512-target tier, structural invariants
    "text_bpe_tokenize_deep",  # deep read path (rows-only)
    "text_bpe_deep_compression_bound",  # strict compression improvement
    "sim_pq_index_build",  # persisted codebooks + packed codes summary
    "sim_persisted_pq_topk",  # training-free ADC read path (rows-only)
    "sim_persisted_pq_recall_check",  # its driver-hash recall bound
    "sim_ivfpq_index_build",  # cell-partitioned residual-code summary
    "sim_persisted_ivfpq_topk",  # pruned ADC read path (rows-only)
    "sim_persisted_ivfpq_recall_check",  # its driver-hash recall bound
    "sim_persisted_merge_deltas",  # background multi-delta compaction
    "sim_persisted_concurrent_ingest",  # multi-writer versioned-manifest commit
    "text_bpe_encode_ids",  # per-doc token-id sequences, order-sensitive digest
    "graph_reachability_recursive",  # standard WITH RECURSIVE BFS, shared SQL
    "emb_gramian_exact",  # distributed exact second-moment matrix
    "emb_pca_project",  # top-K eigenbasis projection (rows-only)
    "emb_pca_variance_check",  # trace + decomposition invariants
    "stream_crossbatch_dedup_rocksdb_drain",  # at-scale state-store posture
    "stream_index_maintenance_drain",  # streaming ingest + scheduled compaction
    "stream_maintained_index_topk",  # maintained-index read path (rows-only)
    "stream_maintained_recall_check",  # its driver-hash recall bound
    "parquet_compact_small_files",  # shuffle-free bin-pack OPTIMIZE pass
    "corpus_pack_sequences",  # concat-and-chunk sequence packing
    "bloom_runtime_filter_join",  # runtime bloom-pruned fact-fact join
    "stream_static_enrich_drain",  # in-plan stream-static broadcast enrich
    "xml_roundtrip_digest",  # Spark 4 native XML source/sink fidelity
    "stream_index_delete_drain",  # streaming tombstones + scheduled delete-fold
    # -- results/code changed this round: re-prove --
    "text_bpe_train_batched",  # conflict set now includes merged symbol
    "text_bpe_tokenize_batched",  # same rule via the shared fit
    "sim_ivf_index_build",  # max(cell) < nlist invariant (ADVICE)
    "sim_persisted_ingest_delta",  # same invariant tightening (ADVICE)
    # -- r10 Next #3: the full r6 proof-staleness cohort (floor -> r7+),
    # -- names recomputed from CORRECTNESS_r01..r10 (exactly 39) --
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
    "temporal_asof_join",
    "temporal_latest_per_user",
    "temporal_pivot_user_values",
    "temporal_range_join",
    "temporal_rolling_value_10min",
    "temporal_unpivot_user_values",
    "temporal_value_percentiles",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "dedup_containment",
    "dedup_containment_prefix",
    "dedup_embedding_signlsh",
    "dedup_survivors_best_quality",
    "emb_label_profile",
    "emb_norm_stats",
    "decontaminate_ngram_overlap",
    "multimodal_decode_features",
    "quality_decile_curriculum",
    "sim_bruteforce_topk",
    "stream_dedup_first",
    # ---- ~50-entry budget cut falls around here; the tail below is
    # ---- code-unchanged + pytest-covered and spills to r12 if cut
    "split_temperature_mixture",
    "stream_ingest_verdicts_drain",
    "stream_late_data_drain",
    "feat_stratified_sample",
    "text_quality_score",
    "training_data_pipeline",
    # (r7-r10-proven entries keep their fresh proofs; code unchanged)
    "flagship_revenue_by_region",
    "view_customer_value_summary",
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
