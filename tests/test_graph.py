"""Graph operators: triangle counting vs a brute-force Python twin,
PageRank fixed-point laws (teleport floor, bounded total mass, Python
re-derivation)."""

from __future__ import annotations

from itertools import combinations

from otel_arrow_collector_spark.operators.graph import (
    PR_ITERS, PR_SCALE, copurchase_edges, pagerank_fixed_point,
    transition_edges, triangle_participation)
from otel_arrow_collector_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_triangles_match_bruteforce(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    edges = copurchase_edges(li)
    got = {r["node"]: r["tri_cnt"]
           for r in triangle_participation(edges).collect()}

    eset = {(r["u"], r["v"]) for r in edges.collect()}
    assert all(u < v for u, v in eset)
    nodes = sorted({n for e in eset for n in e})
    adj = {n: set() for n in nodes}
    for u, v in eset:
        adj[u].add(v)
        adj[v].add(u)
    want: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


def test_pagerank_fixed_point_python_twin(spark):
    events = load_table(spark, SF_SMALL, "events")
    edges = transition_edges(events)
    got = {r["node"]: r["rank"]
           for r in pagerank_fixed_point(edges).collect()}

    erows = [(r["src"], r["dst"], r["w"]) for r in edges.collect()]
    nodes = sorted({n for s, d, _ in erows for n in (s, d)})
    n = len(nodes)
    base = PR_SCALE // n
    tele = (15 * base) // 100
    wout = {}
    for s, _, w in erows:
        wout[s] = wout.get(s, 0) + w
    rank = {v: base for v in nodes}
    for _ in range(PR_ITERS):
        acc = {v: 0 for v in nodes}
        for s, d, w in erows:
            acc[d] += (rank[s] * w) // wout[s]
        rank = {v: tele + (85 * acc[v]) // 100 for v in nodes}
    assert got == rank

    # laws: every node keeps at least the teleport floor; flooring only
    # ever loses mass, so the total stays at or under the scale.
    assert all(r >= tele for r in got.values())
    assert sum(got.values()) <= PR_SCALE


def test_pagerank_local_matches_distributed(spark):
    """The driver-integer fixed-point must bit-match the distributed
    decimal(38,0) operator on the same edges."""
    from otel_arrow_collector_spark.operators.graph import (
        pagerank_fixed_point, pagerank_fixed_point_local)
    edges = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2),
             ("a", "c", 5), ("c", "b", 4), ("d", "a", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    dist = {r.node: r.rank for r in pagerank_fixed_point(df).collect()}
    assert pagerank_fixed_point_local(edges) == dist
