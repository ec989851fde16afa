"""Catalog memoization hygiene (VERDICT.md round 3, Next #7).

``catalog.load_tables`` memoizes per (applicationId, sf_dir, table);
the failure class is a cached DataFrame bound to a dead SparkContext
being handed to a NEW session in the same process — the same class the
view cache already guards (``operators/queries.py``). Two proofs:

- in-process: entries keyed to a foreign appId are evicted on the next
  call, live entries survive;
- subprocess: an actual stop-then-recreate of the SparkSession, with a
  collect() on the second session's frames — the hard end-to-end word.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from customer_revenue_analysis_sql_tableau_spark import catalog as cat

_REPO = Path(__file__).resolve().parents[1]


def test_stale_app_entries_evicted(spark, sf_dir):
    dfs = cat.load_tables(spark, sf_dir, names=("region",), register=False)
    live_key = (spark.sparkContext.applicationId, sf_dir, "region")
    assert live_key in cat._TABLE_CACHE
    dead_key = ("application_dead_0000", sf_dir, "region")
    cat._TABLE_CACHE[dead_key] = dfs["region"]
    cat.load_tables(spark, sf_dir, names=("nation",), register=False)
    assert dead_key not in cat._TABLE_CACHE, "stale-app entry not evicted"
    assert live_key in cat._TABLE_CACHE, "live entry wrongly evicted"


def test_second_sparksession_gets_fresh_frames(sf_dir):
    """Stop the first session, build a second in the same process, and
    prove load_tables hands out frames usable by the NEW context (a
    stale cached plan would raise on collect)."""
    script = f"""
import sys
sys.path.insert(0, {str(_REPO)!r})
from customer_revenue_analysis_sql_tableau_spark import catalog as cat
from customer_revenue_analysis_sql_tableau_spark.session import get_spark

s1 = get_spark("cache-hygiene-1", shuffle_partitions=4)
n1 = cat.load_tables(s1, {sf_dir!r}, names=("region",), register=False)[
    "region"
].count()
app1 = s1.sparkContext.applicationId
s1.stop()

s2 = get_spark("cache-hygiene-2", shuffle_partitions=4)
app2 = s2.sparkContext.applicationId
assert app2 != app1, "restarted context must get a fresh appId"
n2 = cat.load_tables(s2, {sf_dir!r}, names=("region",), register=False)[
    "region"
].count()
assert n2 == n1 == 5, (n1, n2)
assert all(k[0] == app2 for k in cat._TABLE_CACHE), "stale keys survive"
print("FRESH-OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "FRESH-OK" in out.stdout
