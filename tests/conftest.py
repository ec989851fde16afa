from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from customer_revenue_analysis_sql_tableau_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

#: r16 suite split (VERDICT item 1): nodeids listed in slow_tests.txt
#: (the measured ≥3 s session-heavy proofs, ~1000 s of the ~32 min
#: suite) get the `slow` marker; pytest.ini deselects them by default
#: so the driver's verify completes. `pytest -m slow` runs the proofs,
#: `pytest -m ""` runs everything. The list is explicit ids, not
#: patterns — and collection fails on a stale id so a renamed test can
#: never silently fall out of both tiers.
_SLOW_FILE = Path(__file__).with_name("slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    slow_ids = {
        ln.strip()
        for ln in _SLOW_FILE.read_text().splitlines()
        if ln.strip() and not ln.startswith("#")
    }
    collected: dict[str, set[str]] = {}
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        full = f"tests/{nodeid}" if not nodeid.startswith("tests/") else nodeid
        collected.setdefault(full.split("::")[0], set()).add(full)
        if full in slow_ids:
            item.add_marker(pytest.mark.slow)
    if any("::" in str(a) for a in config.invocation_params.args):
        return  # id-scoped invocation: files are partially collected
    stale = [
        sid
        for sid in slow_ids
        if sid.split("::")[0] in collected
        and sid not in collected[sid.split("::")[0]]
    ]
    assert not stale, f"slow_tests.txt lists renamed/removed tests: {stale}"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
