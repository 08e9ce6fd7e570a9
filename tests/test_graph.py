"""pagerank: differential vs a pure-Python reference implementation."""

import pytest

from littletable_spark import Table
from littletable_spark.operators.graph import pagerank


def _ref_pagerank(edges, iterations, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in outdeg)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += r[u] / outdeg[u]
        r = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    return r


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("c", "d"),            # d is dangling (no out-edges)
    ("a", "b"),            # duplicate edge: counts twice
    ("e", "c"),            # e appears only as a source
]


def test_pagerank_matches_reference(spark):
    t = Table("edges", spark=spark)
    t.insert_many([{"src": u, "dst": v} for u, v in EDGES])
    for iters in (1, 3, 10):
        got = {r.node: r.rank for r in pagerank(t, iterations=iters)}
        want = _ref_pagerank(EDGES, iters)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_authority_ordering(spark):
    """c receives the most in-links -> highest rank; validates the
    frontier-prioritization use (rank feeds schedule_fetches)."""
    t = Table("edges", spark=spark)
    t.insert_many([{"src": u, "dst": v} for u, v in EDGES])
    got = {r.node: r.rank for r in pagerank(t, iterations=10)}
    assert got["c"] == max(got.values())
    assert pagerank(t, iterations=10).fields == ["node", "rank"]


def test_pagerank_empty_and_validation(spark):
    t = Table("edges", spark=spark)
    t.insert_many([{"src": None, "dst": "x"}, {"src": "u", "dst": None}])
    assert len(pagerank(t)) == 0
    with pytest.raises(ValueError, match="iterations"):
        pagerank(t, iterations=0)
