"""Iterative graph analytics: integer fixed-point PageRank + the
leakage-safe split that rides the same component machinery."""

from __future__ import annotations

import hashlib

from customer_revenue_analysis_sql_tableau_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    N_ITERS,
    SCALE,
    TELEPORT,
    TOP_N,
    _copurchase_edges,
    graph_pagerank_copurchase,
)


def _reference_pagerank(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-Python twin of the exact integer recurrence (independent of
    both Spark and DuckDB): same truncating divisions, same damping."""
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: SCALE for n in deg}
    for _ in range(N_ITERS):
        inc: dict[int, int] = {}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + rank[s] // deg[s]
        rank = {n: TELEPORT + (DAMP_NUM * inc[n]) // DAMP_DEN for n in deg}
    return rank


def test_pagerank_matches_pure_python_reference_exactly(spark, sf_dir):
    edge_rows = _copurchase_edges(spark, sf_dir).collect()
    edges = [(r.src, r.dst) for r in edge_rows]
    # symmetric by construction: every (a,b) has (b,a)
    eset = set(edges)
    assert all((b, a) in eset for a, b in eset)
    ref = _reference_pagerank(edges)
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    got = [
        (r.part_id, r.rank_fp)
        for r in graph_pagerank_copurchase(spark, sf_dir).collect()
    ]
    assert got == expected


def test_pagerank_rank_invariants(spark, sf_dir):
    rows = graph_pagerank_copurchase(spark, sf_dir).collect()
    assert 0 < len(rows) <= TOP_N
    # teleport mass is the floor of every rank; descending total order
    assert all(r.rank_fp >= TELEPORT for r in rows)
    ranks = [(r.rank_fp, r.part_id) for r in rows]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))


def test_pagerank_iterations_never_sort_merge_join(spark, sf_dir):
    """Every per-iteration join feeds a hash aggregate or projection —
    sort order is never needed, so the frozen strategy is
    ShuffledHashJoin (six SMJ sorts cost ~0.6 s at sf0.1)."""
    df = graph_pagerank_copurchase(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan


def _reference_pagerank_directed(
    edges: list[tuple[int, int]],
) -> dict[int, int]:
    """Pure-Python twin of the DIRECTED recurrence: left-join teleport
    re-rank for in-degree-0 nodes plus uniform integer redistribution
    of dangling (out-degree-0) mass."""
    deg: dict[int, int] = {}
    nodes = set()
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        nodes.update((s, d))
    rank = {n: SCALE for n in nodes}
    for _ in range(N_ITERS):
        inc: dict[int, int] = {}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + rank[s] // deg[s]
        dangling = sum(r for n, r in rank.items() if deg.get(n, 0) == 0)
        share = dangling // len(nodes)
        rank = {
            n: TELEPORT + (DAMP_NUM * (inc.get(n, 0) + share)) // DAMP_DEN
            for n in nodes
        }
    return rank


def test_pagerank_directed_handles_teleport_only_and_dangling(spark, sf_dir):
    from customer_revenue_analysis_sql_tableau_spark.operators.graph import (
        _supply_return_edges,
        graph_pagerank_directed,
    )

    edges = [
        (r.src, r.dst) for r in _supply_return_edges(spark, sf_dir).collect()
    ]
    srcs = {s for s, _ in edges}
    dsts = {d for _, d in edges}
    # the fixture must genuinely exercise both mechanisms
    assert srcs - dsts, "no teleport-only (in-degree-0) node in fixture"
    assert dsts - srcs, "no dangling (out-degree-0) node in fixture"
    ref = _reference_pagerank_directed(edges)
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    got = [
        (r.node_id, r.rank_fp)
        for r in graph_pagerank_directed(spark, sf_dir).collect()
    ]
    assert got == expected
    # teleport-only nodes stayed in the state (an inner join would have
    # dropped them after iteration 1): every node is still ranked
    assert len(ref) == len(srcs | dsts)


def test_pagerank_directed_never_sort_merge_joins_iterations(spark, sf_dir):
    from customer_revenue_analysis_sql_tableau_spark.operators.graph import (
        graph_pagerank_directed,
    )

    df = graph_pagerank_directed(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_leakage_safe_split_never_straddles_components(spark, sf_dir):
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.splits import (
        split_leakage_safe,
    )

    out = split_leakage_safe(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert {r.split for r in rows} <= {"train", "validation", "test"}
    # the whole point: one split per component, no exceptions
    straddle = (
        out.groupBy("component_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    # bucket rule is the documented md5 hash, recomputed independently
    for r in rows[:25]:
        h = hashlib.md5(f"{r.component_id}:leak".encode()).hexdigest()
        assert r.bucket == int(h[:8], 16) % 100


def test_triangle_stats_match_brute_force_reference(spark, sf_dir):
    """Exact triangle count cross-checked against a brute-force
    pure-Python count over the collected edge set (independent of the
    degree-ordered wedge algorithm under test)."""
    from itertools import combinations

    from customer_revenue_analysis_sql_tableau_spark.operators.graph import (
        graph_triangle_stats,
    )

    edge_rows = _copurchase_edges(spark, sf_dir).collect()
    und = {(min(r.src, r.dst), max(r.src, r.dst)) for r in edge_rows}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = sum(
        1
        for node, nbrs in adj.items()
        for x, y in combinations(sorted(nbrs), 2)
        if node < x and node < y and (min(x, y), max(x, y)) in und
    )
    got = graph_triangle_stats(spark, sf_dir).first()
    assert got.n_nodes == len(adj)
    assert got.n_edges == len(und)
    assert got.n_triangles == n_tri
    assert got.n_wedges == sum(
        len(v) * (len(v) - 1) // 2 for v in adj.values()
    )
    assert n_tri > 0  # baskets of ≥3 parts guarantee triangles exist
    # clustering coefficient is well-defined: 3*tri <= wedges
    assert 3 * got.n_triangles <= got.n_wedges


def test_kmeans_matches_pure_python_reference_exactly(spark, sf_dir):
    """The exact integer recurrence, recomputed in plain Python from
    the raw parquet floats — independent of both Spark and DuckDB."""
    import math

    import pyarrow.parquet as pq

    from customer_revenue_analysis_sql_tableau_spark.operators.embeddings import (
        KMEANS_ITERS,
        KMEANS_K,
        KMEANS_Q,
        emb_kmeans_assign,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    qv = {
        vid: [math.floor(float(x) * KMEANS_Q) for x in emb]
        for vid, emb in zip(tbl["vec_id"], tbl["embedding"])
    }
    cents = {j: qv[j] for j in range(KMEANS_K)}

    def assign_all(c):
        out = {}
        for vid, q in qv.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(q, cv)), j)
                for j, cv in c.items()
            )
            out[vid] = best  # (dist, j) — min() breaks ties toward low j
        return out

    a = assign_all(cents)
    for _ in range(KMEANS_ITERS - 1):
        groups: dict[int, list[int]] = {}
        for vid, (_, j) in a.items():
            groups.setdefault(j, []).append(vid)
        def tdiv(x: int, n: int) -> int:
            # trunc-toward-zero division, same as Spark div / DuckDB //
            q = abs(x) // n
            return q if x >= 0 else -q

        cents = {
            j: [
                tdiv(sum(qv[v][i] for v in vs), len(vs))
                for i in range(len(next(iter(qv.values()))))
            ]
            for j, vs in groups.items()
        }
        a = assign_all(cents)

    got = {
        r.vec_id: (r.dist_sq, r.cluster_id)
        for r in emb_kmeans_assign(spark, sf_dir).collect()
    }
    assert got == a
    assert len(got) == len(qv)


def test_leakage_safe_split_fixes_a_doc_keyed_straddle():
    """Counterfactual on a synthetic 2-doc near-dup component whose
    doc-keyed buckets land in different splits: doc-keyed assignment
    WOULD leak; component-keyed assignment cannot."""

    def doc_bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    # find two ids whose doc-keyed buckets fall on opposite sides of
    # the train boundary — they exist in any prefix of the integers
    lo = next(i for i in range(1000) if doc_bucket(i) < 90)
    hi = next(i for i in range(1000) if doc_bucket(i) >= 95)
    # the doc-keyed rule puts these near-dups in train AND test: a leak
    assert doc_bucket(lo) < 90 and doc_bucket(hi) >= 95
    # the component-keyed rule hashes min(lo, hi) ONCE for both docs —
    # a single bucket, hence a single split, whatever its value is
    comp_bucket = (
        int(hashlib.md5(f"{min(lo, hi)}:leak".encode()).hexdigest()[:8], 16)
        % 100
    )
    assert 0 <= comp_bucket < 100


def test_recursive_reachability_structure(spark, sf_dir):
    """WITH RECURSIVE BFS (r11): the parity node space forces
    min_depth parity == node parity (seeds are even customer nodes;
    every hop flips kind), seeds sit at depth 0 with exactly one path,
    and depths stay within the recursion bound."""
    from customer_revenue_analysis_sql_tableau_spark.operators.graph import (
        REACH_MAX_DEPTH,
        graph_reachability_recursive,
    )

    rows = graph_reachability_recursive(spark, sf_dir).collect()
    assert rows
    seeds = [r for r in rows if r["min_depth"] == 0]
    assert seeds and all(r["node"] % 2 == 0 for r in seeds)
    assert all(r["n_paths"] >= 1 for r in rows)
    for r in rows:
        assert 0 <= r["min_depth"] <= REACH_MAX_DEPTH
        assert r["min_depth"] % 2 == r["node"] % 2
