"""PageRank: numpy power-iteration parity, mass conservation, guards."""

import numpy as np
import pytest

from isen_projet_bigdata_a3s6_spark.operators.graph import pagerank


def _numpy_pagerank(edges, nodes, damping, iterations):
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[idx[d]] += r[idx[s]] / out_deg[s]
        dangling = sum(r[idx[v]] for v in nodes if v not in out_deg)
        base = (1 - damping) / n + damping * dangling / n
        r = base + damping * inflow
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    # e is dangling-only reachable: c -> e
    edges.append(("c", "e"))
    nodes = sorted({x for e in edges for x in e})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=8).collect()}
    want = _numpy_pagerank(edges, nodes, 0.85, 8)
    assert set(got) == set(want)
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_guards(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(empty)
