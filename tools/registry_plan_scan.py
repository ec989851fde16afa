"""Registry-wide physical-plan hygiene scan.

`tests/test_plan_quality.py` freezes the plan shape of individual
operators; this tool sweeps EVERY `__spark_entry__.queries()` entry and
reports scale red flags:

- ``CartesianProduct`` — quadratic, never acceptable;
- ``BroadcastNestedLoopJoin`` — acceptable only for documented 1-row /
  bounded-side scalar joins (the allowlist below, asserted by
  ``tests/test_registry_hygiene.py::test_registry_plans_have_no_scale_red_flags``);
- plans that fail to build at all.

SortMergeJoin is NOT flagged: it is the correct fact⋈fact strategy at
scale, and AQE may convert it at runtime anyway.

Usage: python tools/registry_plan_scan.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

#: Entries whose BroadcastNestedLoopJoin is a documented bounded-side
#: join: scalar thresholds / 1-row stats frames / the top-k query set
#: crossed against a corpus partition (see each operator's docstring).
BNLJ_ALLOWLIST: frozenset[str] = frozenset(
    {
        "customers_above_avg_balance",  # scalar avg threshold (1 row)
        "proc_customer_balance",  # scalar anchor frame (1 row)
        "feat_value_quartile_bins",  # broadcast quartile cutoffs (1 row)
        "feat_vocab_coverage",  # broadcast corpus totals (1 row)
        "sim_bruteforce_topk",  # query set × corpus, queries bounded
        "sim_ivf_topk",  # query set × centroids, both bounded
        "text_unigram_logprob",  # broadcast (T, V) scalar frame (1 row)
        "tpch_q11_important_parts",  # scalar value threshold (1 row)
        "tpch_q22_dormant_high_balance",  # scalar avg balance (1 row)
        "sim_lsh_topk",  # query set × banded buckets, queries bounded
        "split_mixture_sample",  # broadcast per-source rate map (rows = sources)
        "embed_profile_by_label",  # broadcast per-label stats (rows = labels)
        "sim_lsh_recall_check",  # inherits sim_lsh_topk's bounded query set
        "sim_ivf_recall_check",  # inherits sim_ivf_topk's bounded query set
        "vocab_topk_containment_check",  # broadcast k-th-count scalar (1 row)
    }
)


def scan(sf_dir: str) -> dict[str, str]:
    """Return {entry: flag} for every red-flagged registry entry."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entrymod
    from customer_revenue_analysis_sql_tableau_spark.session import get_spark

    spark = get_spark("plan-scan")
    flags: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            flags[name] = f"plan build failed: {exc}"
            continue
        if "CartesianProduct" in plan:
            flags[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWLIST:
            flags[name] = "BroadcastNestedLoopJoin (not allowlisted)"
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    flags = scan(sf_dir)
    for name, why in sorted(flags.items()):
        print(f"FLAG  {name}: {why}")
    print(f"\n{len(flags)} flagged")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
