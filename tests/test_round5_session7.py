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


# ----------------------------------------------------------- hll_overlap


def test_hll_overlap_disjoint_and_identical(spark):
    from kml2geojson_spark.sketch import hll_overlap
    rows = ([("A", f"x{i}") for i in range(3000)]
            + [("B", f"x{i}") for i in range(3000)]      # B == A
            + [("C", f"y{i}") for i in range(3000)])     # C disjoint
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {(r["group_a"], r["group_b"]): r
           for r in hll_overlap(df, "v", "grp", p=10).collect()}
    ab = got[("A", "B")]
    # identical sets: union == each side, overlap == the estimate
    assert ab["est_union"] == ab["est_a"] == ab["est_b"]
    assert ab["overlap_est"] == ab["est_a"]
    assert ab["jaccard_est"] == 1.0
    # p=10 → ~3.3% standard error; assert within 15%
    assert abs(ab["est_a"] - 3000) / 3000 < 0.15
    ac = got[("A", "C")]
    # disjoint: overlap small relative to set size
    assert ac["overlap_est"] < 0.15 * 3000
    assert ac["est_union"] > ac["est_a"]


def test_hll_overlap_partial(spark):
    from kml2geojson_spark.sketch import hll_overlap
    rows = ([("A", f"k{i}") for i in range(4000)]
            + [("B", f"k{i}") for i in range(2000, 6000)])  # 50% shared
    df = spark.createDataFrame(rows, "grp string, v string")
    (r,) = hll_overlap(df, "v", "grp", p=10).collect()
    assert abs(r["overlap_est"] - 2000) / 2000 < 0.3
    assert abs(r["est_union"] - 6000) / 6000 < 0.15


def test_hll_overlap_max_groups_guard(spark):
    from kml2geojson_spark.sketch import hll_overlap
    rows = [(f"g{i}", f"v{j}") for i in range(5) for j in range(3)]
    df = spark.createDataFrame(rows, "grp string, v string")
    with pytest.raises(ValueError, match="max_groups"):
        hll_overlap(df, "v", "grp", p=8, max_groups=4)
    # 5 groups → 10 unordered pairs when allowed
    assert hll_overlap(df, "v", "grp", p=8, max_groups=5).count() == 10


# ------------------------------------------------------ record linkage


def test_block_candidate_pairs_basic(spark):
    from kml2geojson_spark.linkage import block_candidate_pairs
    rows = [(1, "k1"), (2, "k1"), (3, "k1"),
            (4, "k2"), (5, "k2"),
            (6, None), (None, "k3"), (7, "k4")]
    df = spark.createDataFrame(rows, "rid long, bk string")
    got = sorted((r["id_a"], r["id_b"]) for r in
                 block_candidate_pairs(df, id_col="rid",
                                       block_cols=["bk"]).collect())
    assert got == [(1, 2), (1, 3), (2, 3), (4, 5)]


def test_block_candidate_pairs_oversized_block_dropped(spark):
    from kml2geojson_spark.linkage import block_candidate_pairs
    rows = [(i, "big") for i in range(10)] + [(100, "ok"), (101, "ok")]
    df = spark.createDataFrame(rows, "rid long, bk string")
    got = sorted((r["id_a"], r["id_b"]) for r in
                 block_candidate_pairs(df, id_col="rid",
                                       block_cols=["bk"],
                                       max_block=5).collect())
    assert got == [(100, 101)]
    with pytest.raises(ValueError):
        block_candidate_pairs(df, id_col="rid", block_cols=["bk"],
                              max_block=1)


def test_linkage_scores_null_and_weights(spark):
    from kml2geojson_spark.linkage import linkage_scores
    recs = spark.createDataFrame(
        [(1, "x", 5), (2, "x", 5), (3, "y", 5), (4, None, 7)],
        "rid long, f1 string, f2 long")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["score_milli"] for r in
           linkage_scores(pairs, recs, id_col="rid",
                          fields=[("f1", 1000, -400),
                                  ("f2", 700, -100)]).collect()}
    assert got[(1, 2)] == 1700        # both agree
    assert got[(1, 3)] == -400 + 700  # f1 differs, f2 agrees
    assert got[(1, 4)] == 0 - 100     # f1 NULL → 0, f2 differs
    with pytest.raises(ValueError):
        linkage_scores(pairs, recs, id_col="rid", fields=[])


def test_resolve_entities_transitive_chain(spark):
    from kml2geojson_spark.linkage import resolve_entities
    # A(1,2): same f1 → match. B(2,3): same f1 → match. (1,3) differ
    # on f1 BUT land in one entity via the 2-chain. 4 is a singleton;
    # 5 has a NULL block key and stays its own entity.
    rows = [(1, "blk", "p", 10), (2, "blk", "p", 99),
            (3, "blk", "q", 99), (4, "blk", "z", 1),
            (5, None, "p", 10)]
    df = spark.createDataFrame(rows, "rid long, bk string, "
                                     "f1 string, f2 long")
    got = {r["record_id"]: r["entity_id"] for r in
           resolve_entities(df, id_col="rid", block_cols=["bk"],
                            fields=[("f1", 1000, -400),
                                    ("f2", 1000, -400)],
                            threshold_milli=600).collect()}
    # (1,2): f1 agree, f2 differ → 600 ✓; (2,3): f2 agree, f1 differ
    # → 600 ✓; (1,3): both differ → -800 ✗ — transitivity merges all
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4
    assert got[5] == 5
    assert set(got) == {1, 2, 3, 4, 5}


# ------------------------------------------------------------ cume_gains


def test_cume_gains_perfect_ranking(spark):
    from kml2geojson_spark.relational import cume_gains
    # scores 1..100, positives are exactly the top-20 scores; sample
    # rate 1/1 → exact decile boundaries at 10,20,...,90
    rows = [(s, 1 if s > 80 else 0) for s in range(1, 101)]
    df = spark.createDataFrame(rows, "score long, y long")
    got = {r["rank"]: r for r in
           cume_gains(df, score_col="score", label_col="y",
                      n_buckets=10, rate_num=1, rate_den=1).collect()}
    top = got[1]
    assert top["bucket"] == 9
    assert top["n"] == 11 and top["n_pos"] == 11   # scores 90..100
    assert top["capture"] == 11 / 20
    assert top["lift"] == (11 * 100) / (11 * 20)   # = 5.0
    second = got[2]
    assert second["cum_n"] == 21 and second["cum_pos"] == 20
    assert second["capture"] == 1.0
    last = got[10]
    assert last["cum_n"] == 100 and last["cum_pos"] == 20
    assert last["capture"] == 1.0 and last["lift"] == 1.0


def test_cume_gains_no_positives_null_metrics(spark):
    from kml2geojson_spark.relational import cume_gains
    df = spark.createDataFrame([(s, 0) for s in range(40)],
                               "score long, y long")
    rows = cume_gains(df, score_col="score", label_col="y",
                      n_buckets=4, rate_num=1, rate_den=1).collect()
    assert all(r["capture"] is None and r["lift"] is None
               for r in rows)
    assert sum(r["n"] for r in rows) == 40


def test_cume_gains_guards(spark):
    from kml2geojson_spark.relational import cume_gains
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException
    fdf = spark.createDataFrame([(1.5, 1)], "score double, y long")
    with pytest.raises(ValueError, match="floating-point"):
        cume_gains(fdf, score_col="score", label_col="y")
    bad = spark.createDataFrame([(1, 2)], "score long, y long")
    with pytest.raises(Exception, match="label not in"):
        cume_gains(bad, score_col="score", label_col="y",
                   rate_num=1, rate_den=1).collect()


# ------------------------------------------------- heavy hitters (MG)


def _mg_python(values, capacity):
    counters, dec = {}, 0
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            dec += 1
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters, dec


def test_heavy_hitters_mg_guarantees(spark):
    from kml2geojson_spark.streaming import heavy_hitters_mg
    import random
    random.seed(5)
    # zipf-ish: value v{i} appears ~3000/i times
    values = []
    for i in range(1, 40):
        values += [f"v{i}"] * (3000 // i)
    random.shuffle(values)
    df = spark.createDataFrame([(v,) for v in values], "val string")
    rows = heavy_hitters_mg(df, value_col="val", capacity=16,
                            n_shards=4).collect()
    got = {r["value"]: (r["count_lb"], r["err_ub"]) for r in rows}
    from collections import Counter
    truth = Counter(values)
    # per-value sandwich: count_lb <= true <= count_lb + err_ub
    for v, (lb, err) in got.items():
        assert lb <= truth[v] <= lb + err
    # the heaviest values must all survive (true count far above any
    # shard's n/(capacity+1))
    for i in range(1, 6):
        assert f"v{i}" in got
    # bounded summary: at most capacity counters per shard
    from collections import defaultdict
    per_shard = defaultdict(int)
    for r in rows:
        per_shard[r["shard"]] += 1
    assert all(c <= 16 for c in per_shard.values())


def test_heavy_hitters_mg_exact_when_under_capacity(spark):
    from kml2geojson_spark.streaming import heavy_hitters_mg
    values = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
    df = spark.createDataFrame([(v,) for v in values], "val string")
    got = {r["value"]: (r["count_lb"], r["err_ub"])
           for r in heavy_hitters_mg(df, value_col="val",
                                     capacity=8).collect()}
    # never decremented → exact counts, zero error
    assert got == {"a": (5, 0), "b": (3, 0), "c": (1, 0)}


def test_stream_heavy_hitters_matches_batch(spark, tmp_path):
    import pandas as pd
    from kml2geojson_spark.streaming import (heavy_hitters_mg,
                                             stream_heavy_hitters)
    import random
    random.seed(9)
    values = []
    for i in range(1, 20):
        values += [f"v{i}"] * (400 // i)
    random.shuffle(values)
    src = tmp_path / "hh"
    src.mkdir()
    # two time-split files → two micro-batches carrying MG state
    half = len(values) // 2
    for j, chunk in enumerate((values[:half], values[half:])):
        pd.DataFrame({"val": chunk}).to_parquet(
            str(src / f"part-{j:03d}.parquet"))
    stream = spark.readStream.schema("val string") \
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    out = stream_heavy_hitters(stream, value_col="val", capacity=8,
                               n_shards=2)
    q = (out.writeStream.format("memory").queryName("hh_mem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "hhck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hh_mem").toPandas()
    # take the LAST emitted snapshot per shard: highest total err/cnt
    # emission per shard is the final one; reconstruct from python
    # reference instead — shard values with md5 like the operator,
    # fold each shard's full sequence, compare the final snapshot.
    import hashlib
    def shard_of(v):
        return int(hashlib.md5(v.encode()).hexdigest()[:15], 16) % 2
    finals = {}
    for s in (0, 1):
        seq = [v for v in values if shard_of(v) == s]
        finals[s] = _mg_python(seq, 8)
    # the last snapshot rows per shard are the rows from the final
    # micro-batch; dedupe by keeping the max-err emission per shard
    for s in (0, 1):
        sub = got[got["shard"] == s]
        last_err = sub["err_ub"].max()
        snap = {r["value"]: int(r["count_lb"])
                for _, r in sub[sub["err_ub"] == last_err].iterrows()}
        ref_counters, ref_dec = finals[s]
        # stream arrival order within a shard may differ from the
        # python replay order across partitions; assert the
        # order-free MG guarantees instead of exact residuals
        assert last_err <= len([v for v in values
                                if shard_of(v) == s]) // (8 + 1) + 1
        from collections import Counter
        truth = Counter(v for v in values if shard_of(v) == s)
        for v, lb in snap.items():
            assert lb <= truth[v] <= lb + last_err
        # heavy values survive in both
        top = [v for v, c in truth.most_common(3)]
        for v in top:
            if truth[v] > len(list(truth.elements())) // 9:
                assert v in snap and v in ref_counters
