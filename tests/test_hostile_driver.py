"""Hostile-driver probes, promoted from the verify recipe
(.claude/skills/verify/SKILL.md) into the suite.

The external driver owns the SparkSession and may configure it with a
non-UTC timezone (or any other conf) before calling the registry. The
engine contract is: results are identical anyway, because
``load_tables`` re-pins the runtime confs (UTC, AQE) on every call —
and fails LOUDLY if the zone cannot be pinned, instead of silently
shifting every TIMESTAMP_NTZ cast by the zone offset.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

import __spark_entry__ as entrymod  # noqa: E402
from oracle_check import compare_tables, duckdb_connection  # noqa: E402

import customer_revenue_analysis_sql_tableau_spark.catalog as cat  # noqa: E402

#: Timezone-sensitive registry entries: JSON/timestamp extraction, an
#: as-of join on event time, a date-part regrouping, and gap
#: sessionization (epoch-microsecond window arithmetic).
PROBES = (
    "events_json_extract",
    "temporal_asof_join",
    "tableau_g2_first_order_day",
    "analytics_sessionize_events",
    # r4: stringifies min/max(ts) via date_format — zone-sensitive
    "dq_column_profile",
    # r4: full streaming path (write → readStream → GroupState → µs
    # round-trip) emitting timestamps
    "stream_cdc_latest_drain",
    # r13: manifest-table entries RETURNING raw timestamp columns from
    # warm persisted artifacts (no load_tables on the warm path — the
    # values must still hash-match because the staged parquet carries
    # zone-insensitive NTZ timestamps)
    "parquet_manifest_incremental_read",
    "parquet_manifest_schema_evolution",
)

HOSTILE_TZ = "America/New_York"


@pytest.fixture()
def hostile_tz(spark):
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    yield
    spark.conf.set("spark.sql.session.timeZone", "UTC")


@pytest.mark.parametrize("name", PROBES)
def test_registry_entry_under_hostile_timezone(name, spark, sf_dir, hostile_tz):
    """Entry must still hash-match its oracle when the host session
    starts in a non-UTC zone (load_tables re-pins UTC internally)."""
    # re-set per entry: the first load_tables call pins the zone back
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    spark_tbl = entrymod.queries()[name](spark, sf_dir).toArrow()
    con = duckdb_connection(sf_dir)
    try:
        oracle_tbl = con.execute(entrymod.oracle_sql()[name]).arrow()
    finally:
        con.close()
    problems = compare_tables(spark_tbl, oracle_tbl)
    assert not problems, f"{name} under {HOSTILE_TZ}: {problems}"


def test_cached_view_hit_under_hostile_timezone(spark, sf_dir, hostile_tz):
    """Regression: a materialized-view cache HIT used to skip the UTC
    re-pin (only load_tables pinned), so a hostile-TZ session reaching
    the cached plan shifted tableau_g2's day groups (spark=31 vs
    oracle=30 rows). Warm the cache under UTC, then query under the
    hostile zone — results must still hash-match."""
    from customer_revenue_analysis_sql_tableau_spark.operators.queries import (
        materialized_view,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    materialized_view(spark, sf_dir).count()  # warm the cache under UTC
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    name = "tableau_g2_first_order_day"
    spark_tbl = entrymod.queries()[name](spark, sf_dir).toArrow()
    con = duckdb_connection(sf_dir)
    try:
        oracle_tbl = con.execute(entrymod.oracle_sql()[name]).arrow()
    finally:
        con.close()
    assert not compare_tables(spark_tbl, oracle_tbl)


def test_entry_under_hostile_timezone(spark, hostile_tz):
    """The driver's t1 smoke: entry() runs and returns rows even when
    the host session was created with a non-UTC zone."""
    assert entrymod.entry(spark).count() > 0


def test_load_tables_refuses_unpinnable_timezone(spark, sf_dir, monkeypatch):
    """If the zone genuinely cannot be pinned (conf locked by the host),
    load_tables must raise instead of silently shifting timestamps."""
    monkeypatch.setattr(cat, "apply_runtime_confs", lambda s: s)
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    try:
        with pytest.raises(RuntimeError, match="not UTC"):
            cat.load_tables(spark, sf_dir, names=("events",))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_entries_pin_ansi_semantics(spark, sf_dir):
    """A host session configured with ansi=false must be re-pinned by
    load_tables: non-ANSI mode turns bad casts into silent NULLs. Probe
    an entry and assert the conf after the call."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert entrymod.queries()["tpch_q1_pricing_summary"](
            spark, sf_dir
        ).count() > 0
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
