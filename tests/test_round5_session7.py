"""Round-5 session-7 operators (registered q226+ AFTER the driver
pinned the round's query list — the in-repo oracle sweep in BENCH/ is
their cross-engine evidence; these tests pin the math against tiny
hand-checkable references and the plan shapes)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kml2geojson_spark.graph import lpa_communities
from kml2geojson_spark.simsearch import simplified_silhouette


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------- simplified_silhouette


def _silhouette_reference(rows):
    """Float replay of the operator contract (micro-quantize, exact
    centroid rationals, nano-floor) in plain Python."""
    from collections import defaultdict
    by_label = defaultdict(list)
    for _vid, label, vec in rows:
        by_label[label].append([round(x * 1e6) for x in vec])
    cent = {k: ([sum(col) for col in zip(*vs)], len(vs))
            for k, vs in by_label.items()}
    out = defaultdict(lambda: [0, 0, 0])  # n, n_pos, nano_sum
    for _vid, label, vec in rows:
        xm = [round(x * 1e6) for x in vec]
        d2 = {}
        for k, (s, n) in cent.items():
            dd = sum((n * x - sk) ** 2 for x, sk in zip(xm, s))
            d2[k] = dd / (float(n) * float(n) * 1e12)
        a = math.sqrt(d2[label])
        b = math.sqrt(min(v for k, v in d2.items() if k != label))
        mx = max(a, b)
        sq = math.floor((b - a) / mx * 1e9) if mx > 0 else 0
        sq = int(sq)
        acc = out[label]
        acc[0] += 1
        acc[1] += 1 if sq > 0 else 0
        acc[2] += sq
    return out


def test_silhouette_matches_python_reference(spark):
    import random
    random.seed(7)
    rows = []
    # three well-separated 4-d clusters + one straggler
    for i in range(30):
        label = i % 3
        base = [label * 5.0, -label * 2.0, label * 1.5, 0.25]
        vec = [b + random.uniform(-0.3, 0.3) for b in base]
        rows.append((i, label, vec))
    rows.append((99, 0, [5.0, -2.0, 1.5, 0.25]))  # sits inside cluster 1
    df = spark.createDataFrame(rows,
                               "vec_id long, label long, "
                               "embedding array<double>")
    got = {r["label"]: r for r in simplified_silhouette(df).collect()}
    ref = _silhouette_reference(rows)
    assert set(got) == set(ref)
    for label, (n, npos, nsum) in ref.items():
        r = got[label]
        assert r["n_vecs"] == n
        assert r["n_positive"] == npos
        assert r["silh_nano_sum"] == nsum
        assert r["mean_silhouette"] == nsum / (n * 1e9)
    # separated clusters: every native member scores positive
    assert got[1]["n_positive"] == got[1]["n_vecs"]
    # the straggler (label 0 placed at cluster 1's centre) is negative
    assert got[0]["n_positive"] < got[0]["n_vecs"]


def test_silhouette_single_label_yields_empty(spark):
    df = spark.createDataFrame(
        [(1, 0, [1.0, 2.0]), (2, 0, [1.5, 2.5])],
        "vec_id long, label long, embedding array<double>")
    assert simplified_silhouette(df).count() == 0


def test_silhouette_plan_shape(spark):
    df = spark.createDataFrame(
        [(1, 0, [1.0, 2.0]), (2, 1, [9.0, 9.0]), (3, 0, [1.1, 2.1])],
        "vec_id long, label long, embedding array<double>")
    plan = _plan(simplified_silhouette(df))
    assert "BroadcastHashJoin" in plan       # centroid fan-out join
    # a/b fold is a conditional-min hash-agg, NOT an own⋈other
    # self-join — the broadcast centroid join is the ONLY join
    assert plan.count("Join") == plan.count("BroadcastHashJoin")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


# ------------------------------------------------------- lpa_communities


def _lpa_reference(edges, n_rounds):
    """Plain-Python synchronous LPA with the operator's exact
    tie-break (max count, then min label)."""
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in edges:
        if a is not None and b is not None and a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(n_rounds):
        nxt = {}
        for n in adj:
            counts = defaultdict(int)
            for m in adj[n]:
                counts[labels[m]] += 1
            nxt[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def test_lpa_two_cliques_bridge(spark):
    # two triangles joined by one bridge edge: the sync-LPA fixpoint
    # keeps each triangle a coherent community
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (1, 2, 4):
        got = {r["node"]: r["community"]
               for r in lpa_communities(df, n_rounds=rounds).collect()}
        assert got == _lpa_reference(edges, rounds)
    # every node labelled, exactly the endpoints
    assert set(got) == {1, 2, 3, 4, 5, 6}


def test_lpa_matches_reference_on_random_graph(spark):
    import random
    random.seed(13)
    edges = [(random.randrange(20), random.randrange(20))
             for _ in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["community"]
           for r in lpa_communities(df, n_rounds=3).collect()}
    assert got == _lpa_reference(edges, 3)


def test_lpa_round_zero_is_identity(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["community"]
           for r in lpa_communities(df, n_rounds=0).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_lpa_one_round_min_neighbor_majority(spark):
    # star: center 10 with leaves 1,2,3. One round: center adopts the
    # minimum leaf label (all counts tie at 1); each leaf adopts 10.
    df = spark.createDataFrame([(10, 1), (10, 2), (10, 3)],
                               "src long, dst long")
    got = {r["node"]: r["community"]
           for r in lpa_communities(df, n_rounds=1).collect()}
    assert got[10] == 1
    assert got[1] == got[2] == got[3] == 10


def test_lpa_self_loops_and_nulls_dropped(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (None, 3)],
                               "src long, dst long")
    got = {r["node"]: r["community"]
           for r in lpa_communities(df, n_rounds=1).collect()}
    # self-loop (1,1) and the NULL-src edge contribute nothing
    assert set(got) == {1, 2}


def test_lpa_symmetrization_direction_invariant(spark):
    fwd = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                "src long, dst long")
    rev = spark.createDataFrame([(2, 1), (3, 2), (4, 3)],
                                "src long, dst long")
    a = sorted((r["node"], r["community"])
               for r in lpa_communities(fwd, n_rounds=3).collect())
    b = sorted((r["node"], r["community"])
               for r in lpa_communities(rev, n_rounds=3).collect())
    assert a == b


def test_lpa_rejects_negative_rounds(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        lpa_communities(df, n_rounds=-1)
