"""Registry-wide physical-plan hygiene scan.

`tests/test_plan_quality.py` freezes the plan shape of individual
operators; this tool sweeps EVERY `__spark_entry__.queries()` entry and
reports scale red flags:

- ``CartesianProduct`` — quadratic, never acceptable;
- ``BroadcastNestedLoopJoin`` — acceptable only for documented 1-row /
  bounded-side scalar joins (the allowlist below, asserted by
  ``tests/test_registry_hygiene.py::test_registry_plans_have_no_scale_red_flags``);
- **unpartitioned Window over unbounded input** — a global ordered
  window (no PARTITION BY) routes its entire input through ONE task;
  fine when the input is provably bounded (a ``TakeOrderedAndProject``
  / ``GlobalLimit`` top-K or a literal/1-row frame below it in the
  plan), a 100 TB scale-killer otherwise (the round-4 curriculum-ntile
  class — VERDICT.md r4, "What's wrong" #1). The CAP SIZE is itself
  checked (r8 Next #8): a limit-bounded single-partition window must
  cap at ≤ ``GLOBAL_WINDOW_CAP_MAX`` rows, so every ``WindowExec: No
  Partition Defined`` runtime warning provably traces to a
  constant-row pass, never a data volume;
- **per-broadcast-key Window over an unbounded BNLJ probe side** — a
  Window whose partition keys ALL come from the broadcast side of a
  BroadcastNestedLoopJoin below it, with the streamed side unbounded:
  each broadcast key's partition then holds the ENTIRE streamed scan,
  so one task sorts the whole corpus per key (the round-6 PQ-ADC
  class — VERDICT.md r6, "What's wrong" #1). Equi-joins
  (BroadcastHashJoin) are exempt: their matches are key-bounded.
  Bounded-selection fixes break the pattern: a nested per-(key,
  spark_partition_id) window (its keys are not broadcast-side-only),
  or — r15 — a constant-capped PARTIAL ``WindowGroupLimit`` below the
  exchange (Spark ≥3.5 plans a ``row_number ≤ n`` filter this way:
  each map task ships at most n rows per key, the exact per-task
  bound the hand-built pre-rank enforced);
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
        "quality_decile_cutoffs",  # broadcast decile cutoffs (1 row)
        "feat_vocab_coverage",  # broadcast corpus totals (1 row)
        "sim_bruteforce_topk",  # query set × corpus, queries bounded
        "sim_asof_v2_brute_topk",  # exact CHECK baseline over the v2 snapshot (bounded query set)
        "stream_asof_b1_brute_topk",  # exact CHECK baseline over the streamed as-of-b1 snapshot
        "sim_ivf_topk",  # query set × centroids, both bounded
        "text_unigram_logprob",  # broadcast (T, V) scalar frame (1 row)
        "tpch_q11_important_parts",  # scalar value threshold (1 row)
        "tpch_q22_dormant_high_balance",  # scalar avg balance (1 row)
        "sim_lsh_topk",  # query set × banded buckets, queries bounded
        "split_mixture_sample",  # broadcast per-source rate map (rows = sources)
        "split_temperature_mixture",  # sources x 1-row totals cross (bounded)
        "embed_profile_by_label",  # broadcast per-label stats (rows = labels)
        "sim_lsh_recall_check",  # inherits sim_lsh_topk's bounded query set
        "sim_ivf_recall_check",  # inherits sim_ivf_topk's bounded query set
        "graph_pagerank_directed",  # 1-row dangling-share scalar frame per iteration
        "sim_delivery_brute_topk",  # exact CHECK baseline (cost of the proof, not the production path)
        "sim_delete_brute_topk",  # exact surviving-corpus CHECK baseline (bounded query set)
        "sim_delete_ivf_topk",  # queries x <=64 broadcast centroids: constant fan-out probe
        "sim_delete_recall_check",  # composes the two delete entries
        "sim_persisted_ivf_topk",  # queries x <=64 PERSISTED broadcast centroids
        "sim_persisted_recall_check",  # embeds sim_persisted_ivf_topk + brute baseline
        "sim_persisted_delete_ivf_topk",  # same bounded probe over the compacted index
        "sim_persisted_delete_recall_check",  # composes the two persisted-delete entries
        "sim_persisted_delivery_topk",  # delivery x <=64 PERSISTED broadcast centroids
        "sim_persisted_delivery_recall_check",  # composes the two persisted-delivery entries
        "sim_incremental_ivf",  # delivery x <=64 broadcast centroids: constant fan-out probe
        "sim_incremental_recall_check",  # composes the two entries above
        "sim_pq_topk",  # broadcast query LUTs x code scan, queries bounded
        "sim_pq_recall_check",  # inherits sim_pq_topk's bounded query set
        "sim_persisted_pq_topk",  # broadcast PERSISTED-codebook LUTs x code scan
        "sim_persisted_pq_recall_check",  # composes persisted PQ + brute baseline
        "sim_persisted_ivfpq_recall_check",  # embeds sim_bruteforce_topk (exact side)
        "sim_ivfpq_recall_check",  # embeds sim_bruteforce_topk (exact side)
        "vocab_topk_containment_check",  # broadcast k-th-count scalar (1 row)
        "quality_decile_cutoffs_approx_check",  # broadcast sketch cutoffs (1 row)
        "graph_triangle_stats",  # cross of three 1-row count frames
        "stream_maintained_index_topk",  # queries x <=64 PERSISTED broadcast centroids
        "stream_maintained_recall_check",  # composes the maintained topk + brute baseline
    }
)


#: Entries allowed a per-broadcast-key Window over an unbounded BNLJ
#: streamed side: the EXACT brute-force baseline does this by design
#: (Q bounded, and exactness requires ranking the full corpus per
#: query — documented as the non-scale path; the ANN tiers are the
#: scale paths). The recall checks embed the brute-force subplan.
PERKEY_WINDOW_ALLOWLIST: frozenset[str] = frozenset(
    {
        "sim_bruteforce_topk",  # exact baseline: full-corpus rank is the point
        "sim_asof_v2_brute_topk",  # exact baseline over the historical snapshot
        "stream_asof_b1_brute_topk",  # exact baseline over the streamed historical snapshot
        "sim_lsh_recall_check",  # embeds sim_bruteforce_topk
        "sim_ivf_recall_check",  # embeds sim_bruteforce_topk
        "sim_pq_recall_check",  # embeds sim_bruteforce_topk
        "sim_ivfpq_recall_check",  # embeds sim_bruteforce_topk
        "sim_delivery_brute_topk",  # exact delivery-vs-base CHECK baseline
        "sim_incremental_recall_check",  # embeds sim_delivery_brute_topk
        "sim_delete_brute_topk",  # exact surviving-corpus CHECK baseline
        "sim_delete_recall_check",  # embeds sim_delete_brute_topk
        "sim_persisted_recall_check",  # embeds sim_bruteforce_topk
        "sim_persisted_delete_recall_check",  # embeds sim_delete_brute_topk
        "sim_persisted_delivery_recall_check",  # embeds sim_delivery_brute_topk
        "sim_persisted_pq_recall_check",  # embeds sim_bruteforce_topk
        "sim_persisted_ivfpq_recall_check",  # embeds sim_bruteforce_topk
        "stream_maintained_recall_check",  # embeds sim_bruteforce_topk
    }
)


#: Plan markers that prove the rows a node emits are bounded: a
#: driver-enforced top-K / limit, a literal frame, or a global (no
#: grouping keys) aggregate — exactly one output row. ``keys=[]``
#: also matches partial global aggregates (one row per task), still a
#: partition-count bound, never data-volume.
_BOUNDED_MARKERS = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "LocalTableScan",
    "HashAggregate(keys=[]",
    "SortAggregate(keys=[]",
    "ObjectHashAggregate(keys=[]",
)


def _node_depth(line: str) -> int:
    """Character index of the node's own ``+- ``/``:- `` tree marker
    (-1 for the root line) — children print at strictly larger index."""
    return max(line.rfind("+- "), line.rfind(":- "))


def _spec_is_unpartitioned(line: str) -> bool:
    """True when the Window node's windowspecdefinition has no
    partition columns: its first argument is either the frame itself or
    an ORDER column (which, unlike partition columns, carries an
    ASC/DESC direction)."""
    _, _, rest = line.partition("windowspecdefinition(")
    if not rest:
        return False
    depth, arg = 0, []
    for ch in rest:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            break
        arg.append(ch)
    first = "".join(arg).strip()
    return first.startswith("specifiedwindowframe(") or (
        " ASC" in first or " DESC" in first
    )


#: Node-name fragments that BRANCH the plan tree (multiple relational
#: inputs): a bounded marker below one of these only bounds ONE branch,
#: so boundedness must hold for EVERY branch (ADVICE r5: the
#: anywhere-in-subtree scan wrongly blessed windows over a join with a
#: single limited side — joins/unions can multiply/concatenate rows, so
#: one unbounded input makes the output unbounded).
_BRANCHING = ("Join", "Union", "CartesianProduct")


def _node_name(ln: str) -> str:
    name = ln[_node_depth(ln) + 3 :].lstrip()
    if name.startswith("*("):
        name = name.split(") ", 1)[-1]
    return name


def _children(lines: list[str], j: int) -> list[int]:
    """Indices of the direct children of the node at ``lines[j]``: the
    minimal-marker-depth lines inside its subtree."""
    d = _node_depth(lines[j])
    child_depth = None
    kids: list[int] = []
    for k in range(j + 1, len(lines)):
        dk = _node_depth(lines[k])
        if dk <= d:
            break
        if child_depth is None or dk < child_depth:
            child_depth = dk
            kids = [k]
        elif dk == child_depth:
            kids.append(k)
    return kids


def _node_bounded(lines: list[str], j: int) -> bool:
    """Whether the subtree rooted at ``lines[j]`` provably emits a
    bounded row count: the node is itself a bound (limit / top-K /
    literal / global agg), or it is a branching node whose EVERY child
    is bounded, or a unary node over a bounded child."""
    ln = lines[j]
    if any(m in ln for m in _BOUNDED_MARKERS):
        return True
    kids = _children(lines, j)
    if not kids:
        return False  # unrecognized leaf (scan, reused exchange, ...)
    if any(b in _node_name(ln) for b in _BRANCHING):
        return all(_node_bounded(lines, k) for k in kids)
    return any(_node_bounded(lines, k) for k in kids)


def _unbounded_global_windows(plan: str) -> bool:
    """True when any Window node runs unpartitioned over input that is
    not provably bounded (see ``_node_bounded``). A limit above a join
    bounds the join output; a limit inside one join branch does not."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not _node_name(ln).startswith("Window "):
            continue
        if not _spec_is_unpartitioned(ln):
            continue
        kids = _children(lines, i)
        if not kids or not all(_node_bounded(lines, k) for k in kids):
            return True
    return False


#: Largest top-K cap under which a single-partition Window pass is
#: accepted: K rows through one task is a constant, not a data volume.
#: The blessed ranked families cap at 40-50 (features.py VOCAB_TOP /
#: BIGRAM_TOP, corpus.py); the ceiling leaves headroom for bigger
#: report caps while still rejecting a limit(10_000_000) that would
#: technically "bound" the window yet sort 10M rows on one core.
GLOBAL_WINDOW_CAP_MAX = 100_000

_LIMIT_RE = None


def _limit_values(subtree: str) -> list[int]:
    """Every explicit row cap in a plan subtree: TakeOrderedAndProject
    (limit=K), GlobalLimit K, CollectLimit K."""
    global _LIMIT_RE
    import re

    if _LIMIT_RE is None:
        _LIMIT_RE = re.compile(
            r"TakeOrderedAndProject\(limit=(\d+)|"
            r"GlobalLimit (\d+)|CollectLimit (\d+)"
        )
    return [
        int(next(g for g in m.groups() if g))
        for m in _LIMIT_RE.finditer(subtree)
    ]


def _oversized_global_window_caps(plan: str) -> bool:
    """True when an unpartitioned Window is bounded ONLY by limit-style
    caps and some cap exceeds ``GLOBAL_WINDOW_CAP_MAX``: the r8 plan
    audit blessed the ranked families' single-partition passes because
    their inputs are K-row-capped — this makes the CAP SIZE itself a
    checked invariant (the `WindowExec: No Partition Defined` runtime
    warnings stay a clean signal: every one must trace to a window
    whose input cap is small enough to be a constant, not a volume).
    One-row bounds (global aggregates, literal frames) pass without a
    limit."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not _node_name(ln).startswith("Window "):
            continue
        if not _spec_is_unpartitioned(ln):
            continue
        kids = _children(lines, i)
        if not kids or not all(_node_bounded(lines, k) for k in kids):
            continue  # the unbounded rule flags it; not this check's job
        caps = [
            c
            for k in kids
            for c in _limit_values(_subtree_text(lines, k))
        ]
        if any(c > GLOBAL_WINDOW_CAP_MAX for c in caps):
            return True
    return False


def _subtree_text(lines: list[str], j: int) -> str:
    """Concatenated text of the subtree rooted at ``lines[j]``,
    including the root node's own name/attribute list (but not its
    parents' — so a join condition above never leaks in)."""
    d = _node_depth(lines[j])
    out = [lines[j][_node_depth(lines[j]) + 3 :]]
    for k in range(j + 1, len(lines)):
        if _node_depth(lines[k]) <= d:
            break
        out.append(lines[k])
    return "\n".join(out)


def _top_level_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan node line (bracket-aware)."""
    groups: list[str] = []
    depth = 0
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


def _partition_key_ids(window_line: str) -> list[str]:
    """Expr ids (``#123``) of the Window node's PARTITION BY columns —
    the second top-level bracket group of ``Window [exprs], [part],
    [order]``. Empty for an unpartitioned window."""
    import re

    name = _node_name(window_line)
    groups = _top_level_groups(name)
    if len(groups) < 3:
        return []
    return re.findall(r"#\d+", groups[1])


def _perkey_windows_over_bnlj(plan: str) -> bool:
    """True when a partitioned Window's keys are ALL produced by the
    broadcast side of a BroadcastNestedLoopJoin below it and the
    streamed side is not provably bounded: every broadcast key's
    window partition then contains the entire streamed input, so one
    task sorts the full corpus per key. The walk descends through
    unary nodes only and stops at the first Window (a nested bounded
    selection) or non-BNLJ branching node — conservative on anything
    it cannot prove."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not _node_name(ln).startswith("Window "):
            continue
        keys = _partition_key_ids(ln)
        if not keys:
            continue  # global windows are the other rule's job
        j = i
        while True:
            kids = _children(lines, j)
            if len(kids) != 1:
                break  # leaf or unexpected shape — stop, no flag
            j = kids[0]
            name = _node_name(lines[j])
            if name.startswith("Window "):
                break  # nested bounded selection below — not this class
            if name.startswith("WindowGroupLimit"):
                # a PARTIAL group limit bounds each map task to a
                # constant number of rows per key BEFORE the exchange —
                # the same per-task bound as the nested (key, pid)
                # pre-rank; require the cap itself to be constant-sized
                # (a row_number <= 10M "bound" is still a volume).
                import re as _re

                m = _re.search(r", (\d+), Partial\s*$", name)
                if m and int(m.group(1)) <= GLOBAL_WINDOW_CAP_MAX:
                    break
                # Final-mode (or oversized) limits give no map-side
                # bound — keep walking toward the join.
            if "BroadcastNestedLoopJoin" in name:
                sides = _children(lines, j)
                if len(sides) != 2:
                    break
                build = sides[1] if "BuildRight" in name else sides[0]
                stream = sides[0] if build == sides[1] else sides[1]
                build_txt = _subtree_text(lines, build)
                stream_txt = _subtree_text(lines, stream)
                if (
                    all(k in build_txt for k in keys)
                    and not any(k in stream_txt for k in keys)
                    and not _node_bounded(lines, stream)
                ):
                    return True
                break
            if any(b in name for b in _BRANCHING):
                break  # equi-join/union: matches are key-bounded
    return False


#: Entries whose EXECUTED plan deliberately scans the same file more
#: than once (two different consumers whose two-pass partial-agg form
#: is the skew-robust choice — see each operator's docstring / the r15
#: runtime duplicate-scan audit).
DUP_SCAN_ALLOWLIST: frozenset[str] = frozenset(
    {
        # per-doc window explode + text-only frequency aggregate: two
        # consumers; a shared-exchange rewrite would pin hot windows
        "dedup_exact_substring",
    }
)


def executed_duplicate_scans(df) -> dict[str, int]:
    """Execute ``df`` and return {scan identity: count} for every file
    scan that appears MORE THAN ONCE in the FINAL adaptive plan — the
    same-file-scanned-twice pattern the r15 session audit hunted by
    hand (AQE stage reuse collapses most static duplicates at runtime;
    whatever survives execution is a real extra pass over the data).
    Only the final plan section is inspected (AdaptiveSparkPlan's
    toString appends the initial plan, which legitimately shows
    duplicates that stage reuse later collapses)."""
    import re
    from collections import Counter

    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    scans: Counter[str] = Counter()
    for ln in plan.splitlines():
        if "FileScan" not in ln:
            continue
        m = re.search(r"Location: \S+\[([^\]]*)\]", ln)
        key = m.group(1) if m else ln.strip()
        scans[key] += 1
    return {k: c for k, c in scans.items() if c > 1}


def dup_scan(sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    """Run the executed duplicate-scan sweep over ``names`` (default:
    the bench headline set — the expensive representative paths) and
    return {entry: {scan: count}} for non-allowlisted offenders."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench
    import __spark_entry__ as entrymod
    from customer_revenue_analysis_sql_tableau_spark.session import get_spark

    spark = get_spark("dup-scan")
    qs = entrymod.queries()
    flags: dict[str, dict] = {}
    for name in names or bench.HEADLINE:
        if name in DUP_SCAN_ALLOWLIST or name not in qs:
            continue
        try:
            dups = executed_duplicate_scans(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            flags[name] = {"execution failed": str(exc)}
            continue
        if dups:
            flags[name] = dups
    return flags


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
        elif _unbounded_global_windows(plan):
            flags[name] = "unpartitioned Window over unbounded input"
        elif _oversized_global_window_caps(plan):
            flags[name] = (
                "unpartitioned Window capped above "
                f"{GLOBAL_WINDOW_CAP_MAX} rows"
            )
        elif (
            _perkey_windows_over_bnlj(plan)
            and name not in PERKEY_WINDOW_ALLOWLIST
        ):
            flags[name] = (
                "per-broadcast-key Window over unbounded BNLJ probe side"
            )
    return flags


def main() -> int:
    args = [a for a in sys.argv[1:]]
    executed = "--executed" in args
    if executed:
        args.remove("--executed")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    if executed:
        flags = dup_scan(sf_dir, args[1:] or None)
        for name, dups in sorted(flags.items()):
            print(f"DUP   {name}: {dups}")
        print(f"\n{len(flags)} flagged (executed duplicate-scan sweep)")
        return 1 if flags else 0
    flags = scan(sf_dir)
    for name, why in sorted(flags.items()):
        print(f"FLAG  {name}: {why}")
    print(f"\n{len(flags)} flagged")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
