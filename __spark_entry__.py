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
from customer_revenue_analysis_sql_tableau_spark.sources import manifest_table as _manifest_table
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
    _manifest_table,
]

# The driver's correctness run is budgeted (~50 entries per round) and
# walks the merged dict in insertion order, so the registry is ordered
# at ENTRY level. Round-13 ordering (VERDICT.md r12, Next #1-#6):
# (1) the FOUR new r13 entries that have never been in a driver window
# — the reader-ATOMIC manifest-committed partitioned compaction
# (closes SCALE.md's honest caveat: readers resolve a versioned
# manifest, never glob the directory; pre-swap or post-swap, never the
# window; r12 Next #2), the multi-version VACUUM retention window
# (retain 2 over a compaction-rewritten chain: intermediate version
# readable as-of, only the truly-unreferenced segment expires; r12
# Next #3), the SCHEDULED per-batch retention drain for the streamed
# store (GC as a policy inside the maintenance loop, tallies pinned
# per batch; r12 Next #5), and the streamed as-of-batch exact search
# (time travel as a QUERY surface for the stream-maintained store,
# hash-green vs DuckDB over the membership predicate; r12 Next #6);
# (2) EIGHT entries whose code changed this round and must re-prove —
# the segment-store/streamed lifecycle entries (shared lake_core
# algebra, digests now cover the vector column v, chain validation,
# broad casualty probes; r12 ADVICE ×4) and the partitioned compaction
# (rename-committed _incoming manifest); (3) the FULL 35-entry r7
# proof-staleness cohort (r12 Next #1 — fits entirely this round,
# raising the freshest-proof floor to r8 registry-wide). Guarded
# against rot by tests/test_registry_hygiene.py::
# test_priority_names_exist. 9+8+35 = 52 slightly overfills the
# ~50-entry budget; the r7 cohort tail is code-unchanged and
# pytest-covered, so a 1-2 entry cut there costs nothing (spills to
# r14 per the documented rule).
_PRIORITY = [
    # -- new this round (r13), first driver proof --
    "parquet_compact_manifest_atomic",  # reader-atomic OPTIMIZE WHERE
    "parquet_manifest_incremental_read",  # snapshot-diff read, row-level oracle
    "stream_manifest_append_drain",  # exactly-once sink via manifest CAS
    "parquet_manifest_schema_evolution",  # union schema pinned in metadata
    "parquet_manifest_delete_where",  # metadata partition drop + CoW row delete
    "parquet_manifest_merge_upsert",  # matched-file CoW update + inserts
    "sim_persisted_vacuum_window",  # retention window 2, real expiry
    "stream_index_retention_drain",  # scheduled per-batch GC, pinned tallies
    "stream_asof_b1_brute_topk",  # streamed-store historical exact search
    # -- code changed this round: re-prove --
    "sim_persisted_read_asof",  # lake_core chain walk + validation
    "sim_asof_v2_brute_topk",  # shared brute tail refactor
    "sim_persisted_vacuum",  # shared retention pass + broad probe
    "stream_index_asof_batch",  # digest now covers v (r12 ADVICE)
    "stream_index_vacuum",  # digest covers v + staleness guard
    "stream_index_maintenance_drain",  # _ensure_streamed_index params
    "stream_index_delete_drain",
    "parquet_compact_partitioned",  # rename-committed _incoming manifest
    # -- r12 Next #1: the FULL r7 proof-staleness cohort (exactly 35) --
    "analytics_event_type_bigrams",
    "dq_constraint_violations",
    "emb_kmeans_assign",
    "events_json_extract",
    "graph_triangle_stats",
    "jsonl_corrupt_tolerance",
    "multimodal_decode_bmp",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg_header",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "multimodal_size_stats",
    "parquet_schema_evolution",
    "quality_decile_cutoffs_approx_check",
    "split_leakage_safe",
    "split_length_buckets",
    "split_mixture_sample",
    "split_pack_sequences",
    "stream_late_session_drain",
    "stream_late_sliding_drain",
    "tableau_g2_first_order_day",
    "temporal_asof_tolerance",
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
