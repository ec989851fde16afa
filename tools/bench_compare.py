"""Compare two bench artifacts at equal calibration.

Round-over-round totals are only meaningful at equal host speed
(SCALE.md, rounds 8-10: co-tenant bursts moved clean-sentinel totals
15-20% while the code was identical). This tool diffs two
``BENCH_r{N}.json`` (or ``BENCH_DETAIL.json``) files per-query over
their COMMON subset and prints:

- raw totals and the common-subset ratio;
- both hosts' calibration gauges (single-core ``cpu_calibration_s``;
  multi-core ``cpu_calibration_mt_s`` when present, r10+) and the
  calibration-deflated ratio;
- the per-query worst movers, so a uniform host shift (every ratio
  alike) separates from a real regression (one entry moved).

Usage: python tools/bench_compare.py OLD.json NEW.json
Accepts either a driver artifact ({"parsed": {...}}) or a raw summary.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and isinstance(d["parsed"], dict):
        return d["parsed"]
    return d


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    common = sorted(set(qo) & set(qn))
    if not common:
        print("no common queries between the two artifacts")
        raise SystemExit(1)
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(f"raw totals:        old={old.get('value')}  new={new.get('value')}")
    so = max(so, 0.001)  # same clamp for a degenerate all-zero old tail
    print(
        f"common-{len(common)} subset:  old={so:.2f}s  new={sn:.2f}s  "
        f"ratio={sn / so:.3f}x"
    )
    co, cn = old.get("cpu_calibration_s"), new.get("cpu_calibration_s")
    if co and cn:
        print(
            f"single-core gauge: old={co}  new={cn}  "
            f"deflated ratio={(sn / cn) / (so / co):.3f}x"
        )
    mo, mn = old.get("cpu_calibration_mt_s"), new.get("cpu_calibration_mt_s")
    if mo and mn:
        print(
            f"multi-core gauge:  old={mo}  new={mn}  "
            f"deflated ratio={(sn / mn) / (so / mo):.3f}x"
        )
    bo, bn = old.get("shuffle_calibration_s"), new.get("shuffle_calibration_s")
    if bo and bn:
        print(
            f"bandwidth gauge:   old={bo}  new={bn}  "
            f"deflated ratio={(sn / bn) / (so / bo):.3f}x  "
            f"(shuffle/memory axis — the one the CPU gauges miss)"
        )
    # clamp old timings that round(…,3) collapsed to 0.0 — a
    # sub-millisecond query must not ZeroDivisionError the whole diff
    ratio = lambda k: qn[k] / max(qo[k], 0.001)  # noqa: E731
    movers = sorted(common, key=ratio, reverse=True)
    print("worst movers (new/old):")
    for k in movers[:8]:
        print(f"  {ratio(k):6.2f}x  {k}: {qo[k]} -> {qn[k]}")
    spread = [ratio(k) for k in common]
    med = sorted(spread)[len(spread) // 2]
    print(
        f"median per-query ratio {med:.3f}x — a uniform shift near the "
        f"total ratio indicates host drift, an outlier above it a real "
        f"regression"
    )


if __name__ == "__main__":
    main()
