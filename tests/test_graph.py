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


def test_star_components_equal_label_propagation(spark):
    """large-star/small-star must produce exactly the same labeling as
    min-label propagation on random graphs."""
    import numpy as np
    from kml2geojson_spark.graph import (connected_components,
                                         connected_components_star)
    rng = np.random.default_rng(77)
    rows = [(int(a), int(b)) for a, b in
            rng.integers(0, 120, size=(180, 2)) if a != b]
    edges = spark.createDataFrame(rows, "doc_a long, doc_b long")
    a = sorted(map(tuple, connected_components(edges).collect()))
    b = sorted(map(tuple, connected_components_star(edges).collect()))
    assert a == b and a


def test_star_components_long_chain_beats_propagation(spark):
    """A path graph of length 300: label propagation needs ~300 rounds
    (fails at max_iters=20); the star algorithm converges in a handful
    and labels the whole chain with its minimum."""
    import pytest as _pytest
    from kml2geojson_spark.graph import (connected_components,
                                         connected_components_star)
    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=20)
    out = {r["node"]: r["component"]
           for r in connected_components_star(edges).collect()}
    assert len(out) == n + 1
    assert set(out.values()) == {0}


def test_star_components_keep_self_loop_nodes(spark):
    """A node appearing only in a self-loop must still get its
    singleton component row — identical to label propagation."""
    from kml2geojson_spark.graph import (connected_components,
                                         connected_components_star)
    edges = spark.createDataFrame([(5, 5), (1, 2)], "doc_a long, doc_b long")
    a = sorted(map(tuple, connected_components(edges).collect()))
    b = sorted(map(tuple, connected_components_star(edges).collect()))
    assert a == b == [(1, 1), (2, 1), (5, 5)]


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def test_pagerank_hand_example(spark):
    from kml2geojson_spark.graph import pagerank
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (1, 4)],
                                  "src long, dst long")
    got = {r.node: r.score_micro
           for r in pagerank(edges, n_iters=3).collect()}

    def step(s):
        deg = {1: 2, 2: 1, 3: 1}
        c = {}
        for a, b in [(1, 2), (2, 3), (3, 1), (1, 4)]:
            c[b] = c.get(b, 0) + (s[a] * 850_000) // (1_000_000 * deg[a])
        return {n: 150_000 + c.get(n, 0) for n in s}

    exp = {n: 1_000_000 for n in (1, 2, 3, 4)}
    for _ in range(3):
        exp = step(exp)
    assert got == exp


def test_pagerank_zero_iters_is_init(spark):
    from kml2geojson_spark.graph import pagerank
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.score_micro
           for r in pagerank(edges, n_iters=0).collect()}
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_pagerank_duplicate_edges_collapse(spark):
    """The edge list is a SET: repeated (src, dst) rows must not
    multiply the contribution."""
    from kml2geojson_spark.graph import pagerank
    once = spark.createDataFrame([(1, 2)], "src long, dst long")
    thrice = spark.createDataFrame([(1, 2)] * 3, "src long, dst long")
    assert (sorted(map(tuple, pagerank(once, n_iters=2).collect()))
            == sorted(map(tuple, pagerank(thrice, n_iters=2).collect())))


def test_pagerank_validation(spark):
    import pytest
    from kml2geojson_spark.graph import pagerank
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(edges, n_iters=-1)
    with pytest.raises(ValueError):
        pagerank(edges, damping_micro=2_000_000)


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

def _brute_triangles(edges):
    import itertools
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_hand_example(spark):
    from kml2geojson_spark.graph import triangle_count
    # K4 on {1..4} plus a pendant 5: every K4 node is in C(3,2)=3
    # triangles, the pendant in none.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_random_vs_bruteforce(spark):
    import random
    from kml2geojson_spark.graph import triangle_count
    rng = random.Random(13)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(160)}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangles_ignore_direction_dups_selfloops(spark):
    from kml2geojson_spark.graph import triangle_count
    # (1,2) twice, reversed (2,1), and a self-loop: still ONE triangle.
    edges = [(1, 2), (1, 2), (2, 1), (2, 3), (3, 1), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# common_neighbor_similarity
# ---------------------------------------------------------------------------

def test_common_neighbor_similarity_hand_example(spark):
    from kml2geojson_spark.graph import common_neighbor_similarity
    # a -> {1,2,3}; b -> {2,3,4}; c -> {9}
    edges = [(10, 1), (10, 2), (10, 3), (20, 2), (20, 3), (20, 4), (30, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [(r["node_a"], r["node_b"], r["n_common"], r["jaccard_milli"])
           for r in common_neighbor_similarity(df).collect()]
    assert got == [(10, 20, 2, (1000 * 2) // (3 + 3 - 2))]


def test_common_neighbor_similarity_vs_bruteforce(spark):
    import random
    from kml2geojson_spark.graph import common_neighbor_similarity
    rng = random.Random(17)
    edges = {(rng.randrange(40), rng.randrange(12)) for _ in range(200)}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    nbrs = {}
    for l, r in edges:
        nbrs.setdefault(l, set()).add(r)
    want = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            common = len(nbrs[a] & nbrs[b])
            if common >= 1:
                want[(a, b)] = (common, 1000 * common
                                // (len(nbrs[a]) + len(nbrs[b]) - common))
    got = {(r["node_a"], r["node_b"]): (r["n_common"], r["jaccard_milli"])
           for r in common_neighbor_similarity(df).collect()}
    assert got == want


def test_common_neighbor_min_common_prunes(spark):
    from kml2geojson_spark.graph import common_neighbor_similarity
    edges = [(1, 5), (2, 5), (1, 6), (2, 6), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["node_a"], r["node_b"])
           for r in common_neighbor_similarity(df, min_common=2).collect()}
    assert got == {(1, 2)}


def test_common_neighbor_max_degree_prunes_planted_hub(spark):
    from kml2geojson_spark.graph import common_neighbor_similarity
    # hub right-node 99 connects to EVERY left node; signal edges
    # connect only (1,2) via right-node 5
    edges = [(l, 99) for l in range(1, 21)] + [(1, 5), (2, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # uncapped: the hub makes all 20*19/2 pairs candidates
    full = common_neighbor_similarity(df).collect()
    assert len(full) == 20 * 19 // 2
    # capped: only the signal pair survives; left degrees stay FULL
    # (node 1 and 2 each have degree 2 incl. the pruned hub edge)
    capped = common_neighbor_similarity(df, max_degree=5).collect()
    assert [(r["node_a"], r["node_b"], r["n_common"], r["jaccard_milli"])
            for r in capped] == [(1, 2, 1, 1000 // (2 + 2 - 1))]
    # the wedge input is bounded: hub rows never reach the self-join
    with_cap = common_neighbor_similarity(df, max_degree=5)
    import pytest
    with pytest.raises(ValueError, match="max_degree"):
        common_neighbor_similarity(df, max_degree=0)
    assert with_cap.count() == 1
