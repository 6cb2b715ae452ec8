"""Connected components vs a driver-side union-find oracle."""

from __future__ import annotations

import numpy as np

from kml2geojson_spark.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_simple(spark):
    edges = [(1, 2), (2, 3), (5, 6), (9, 1)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_components_random_oracle(spark):
    rng = np.random.default_rng(21)
    n = 400
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, n, (600, 2)) if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    expect = _union_find(edges)
    assert got == expect


def test_components_chain_diameter(spark):
    """A long path graph needs many propagation rounds — exercises the
    iteration/convergence logic, not just shallow clusters."""
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_components_raises_when_not_converged(spark):
    import pytest
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=3)
