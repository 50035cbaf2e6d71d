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
    # empty graph: empty-in/empty-out (round-4 convention), not a raise
    empty = spark.createDataFrame([], "src string, dst string")
    out = pagerank(empty)
    assert out.count() == 0 and set(out.columns) == {"node", "rank"}


def test_pagerank_convergence_matches_numpy(spark):
    from isen_projet_bigdata_a3s6_spark.operators.graph import pagerank_convergence

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("c", "e")]
    nodes = sorted({x for e in edges for x in e})
    df = spark.createDataFrame(edges, "src string, dst string")
    diag = {
        r["iteration"]: (r["l1_delta"], r["linf_delta"], r["rank_mass"])
        for r in pagerank_convergence(df, iterations=6).collect()
    }
    # numpy twin tracking the same deltas
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for it in range(1, 7):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[idx[d]] += r[idx[s]] / out_deg[s]
        dangling = sum(r[idx[v]] for v in nodes if v not in out_deg)
        base = (1 - 0.85) / n + 0.85 * dangling / n
        new_r = base + 0.85 * inflow
        l1, linf = np.abs(new_r - r).sum(), np.abs(new_r - r).max()
        got = diag[it]
        assert abs(got[0] - round(l1, 9)) < 1e-9, it
        assert abs(got[1] - round(linf, 9)) < 1e-9, it
        assert abs(got[2] - 1.0) < 1e-9, it
        r = new_r
    # power iteration contracts: later deltas strictly smaller
    assert diag[6][0] < diag[1][0]


def test_triangle_count_matches_naive(spark):
    import itertools

    from isen_projet_bigdata_a3s6_spark.operators.graph import triangle_count

    rng = np.random.default_rng(7)
    nodes = list(range(30))
    edges = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, 30, size=(120, 2))
            if a != b
        }
    )
    eset = set(edges)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    )
    df = spark.createDataFrame(edges, "a long, b long")
    row = triangle_count(df).first()
    assert row["n_triangles"] == want
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len({x for e in edges for x in e})


def test_triangle_count_counts_once_regardless_of_input_form(spark):
    from isen_projet_bigdata_a3s6_spark.operators.graph import triangle_count

    # duplicate edges, both orientations, self-loops — all normalized away
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    row = triangle_count(spark.createDataFrame(edges, "a long, b long")).first()
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (3, 3, 1)
