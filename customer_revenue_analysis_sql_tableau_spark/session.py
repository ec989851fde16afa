"""SparkSession factory.

The reference delegates execution to a single mysqld (InnoDB row store,
``sql/sakila-schema.sql:51``); we delegate to Spark's Catalyst + Tungsten.
Session defaults encode the 100 TB posture from SURVEY.md §7.4: AQE on
(runtime re-plan, skew-join splitting), UTC session timezone (the Sakila
DATETIMEs and driver testdata timestamps are timezone-naive), generous
broadcast threshold (every dimension table is far below it at any SF —
at 100 TB the dims are still ~MBs while facts are TBs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs, safe to (re)apply to an externally-provided
#: session (the driver owns the session for `__spark_entry__` calls).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # pin ANSI semantics (the Spark 4 default) against host sessions
    # configured with ansi=false, where casts/overflows silently change
    # from errors to NULLs and corrupt results instead of failing
    "spark.sql.ansi.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dims (region/nation/customer/supplier/part) stay broadcastable well
    # past sf0.1; at true 100 TB only region/nation/part metadata remain
    # under this, which is exactly what we want broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # list directories on the driver up to 4096 paths before falling
    # back to a distributed listing JOB (default threshold: 32 paths).
    # The cell-partitioned segment stores put 100+ partition dirs under
    # one index, so every fresh read was paying ~3 listing jobs of pure
    # scheduling overhead (~0.5 s/read at sf0.1) to list a few hundred
    # local files the driver lists in microseconds. 4096 is still far
    # below where driver-side listing hurts (object-store tables with
    # tens of thousands of partitions — re-lower per deployment there;
    # manifest-backed tables never directory-list at all, SCALE.md).
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "4096",
    # trust the sort order recorded by bucketed-sorted writes
    # (save_bucketed's bucketBy+sortBy): off (the Spark 3+ default),
    # every join/agg over the bucketed facts re-sorts both sides per
    # query — paying at query time the exact sort the layout already
    # paid at ingest. On, the scan reports its output ordering (Spark
    # honors it only when each bucket is a single file, which
    # save_bucketed's single-writer layout guarantees) and the bucket
    # SMJ plans with zero Exchange AND zero Sort (r15; plan diff in
    # plans/r15/view_customer_value_summary_bucketed_after.txt).
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
    # write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
    # INT96 columns carry NO parquet min/max statistics, so every
    # time-predicate loses footer-level data skipping — at 100 TB that
    # is the difference between pruning files and scanning them (found
    # by the z-order skipping test reading footers directly).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host session; keep going
    return spark


def get_spark(
    app_name: str = "customer-revenue-analysis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract)
    or ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Size the generated-class cache for a multi-query workload: the
        # 100-entry default thrashes once ~25+ distinct plans cycle in
        # one JVM, forcing whole-stage recompilation (~0.2-0.5 s per
        # complex query, every run) — measured 22.3 s -> 17.5 s across
        # the 28-query bench at sf0.1. Generated classes are small;
        # 5000 entries is a few hundred MB of metaspace at worst and the
        # setting a long-lived production driver would use.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
