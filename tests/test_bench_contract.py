"""Bench artifact contract guards (r9 post-mortem).

BENCH_r09.json recorded ``parsed: null`` because the single stdout
metric line outgrew the driver's ~2000-char tail capture. The fix
split output into an early detail line + a compact FINAL summary line;
these tests freeze that contract so a future headline addition can't
silently re-break the artifact."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench

#: The driver's tail-capture window, minus margin for the trailing
#: newline and minor driver-side framing.
TAIL_CAPTURE_BUDGET = 1900


def _worst_case_summary() -> dict:
    """The summary dict shape bench.main() prints LAST, filled with
    worst-width values (three-digit seconds everywhere)."""
    return {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": {name: 999.999 for name in bench.HEADLINE},
        "normalized_total": 9999.999,
        "cpu_calibration_s": 99.999,
        "cpu_calibration_mt_s": 99.999,
        "shuffle_calibration_s": 99.999,
        "sentinel_clean": False,
        "sf": 0.001,
    }


def test_summary_line_fits_tail_capture():
    line = json.dumps(_worst_case_summary())
    assert len(line) <= TAIL_CAPTURE_BUDGET, (
        f"bench summary line would be {len(line)} chars at worst-case "
        f"widths — the driver tail-captures ~2000; move fields to the "
        f"detail line or trim the headline set"
    )


def test_summary_keys_match_bench_source():
    """The worst-case shape above must track bench.main()'s actual
    summary dict — compare against the literal keys in the source so
    a field added to one without the other fails loudly."""
    src = Path(bench.__file__).read_text()
    _, _, after = src.partition("summary = {")
    block = after.split("}", 1)[0]
    src_keys = {
        line.split('":')[0].strip().lstrip('"')
        for line in block.splitlines()
        if '":' in line
    }
    assert src_keys == set(_worst_case_summary().keys())


def test_headline_names_are_registered():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert not missing, f"bench.HEADLINE names not in the registry: {missing}"


def test_bench_compare_tolerates_zero_timings(tmp_path, capsys):
    """A sub-millisecond query whose old timing rounded to 0.0 must not
    ZeroDivisionError the round-over-round diff (r10 ADVICE)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import bench_compare

    old = {"value": 1.0, "queries": {"a": 0.0, "b": 0.5}}
    new = {"value": 1.2, "queries": {"a": 0.001, "b": 0.6}}
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    argv = sys.argv
    sys.argv = ["bench_compare.py", str(po), str(pn)]
    try:
        bench_compare.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "worst movers" in out and "median per-query ratio" in out
