"""Round-5 session-4 operators (registered q163–q167 AFTER the driver
pinned the round's query list — the in-repo oracle sweep in BENCH/ is
their cross-engine evidence, regenerated in-round; these tests pin the
edge semantics and the plan shapes)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kml2geojson_spark.graph import bfs_hops
from kml2geojson_spark.relational import chi2_independence, welch_ttest
from kml2geojson_spark.textops import (sorted_neighborhood_pairs,
                                       winnow_fingerprints)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------ chi2


def _chi2_expected(cells: dict[tuple[str, str], int]) -> float:
    """Micro-unit-exact replay of the operator's contract in plain
    Python: per-cell floor(((d/…)·1e6)) summed as ints."""
    ras: dict[str, int] = {}
    cbs: dict[str, int] = {}
    for (a, b), o in cells.items():
        ras[a] = ras.get(a, 0) + o
        cbs[b] = cbs.get(b, 0) + o
    n = sum(cells.values())
    micro = 0
    for a, ra in ras.items():
        for b, cb in cbs.items():
            obs = cells.get((a, b), 0)
            d = float(obs * n - ra * cb)
            micro += math.floor(d * d / float(n * ra * cb) * 1000000.0)
    return micro


def test_chi2_hand_case_includes_zero_cells(spark):
    rows = [("x", "u")] * 10 + [("x", "v")] * 2 + [("y", "v")] * 8
    # cell (y, u) is absent from the data but must contribute
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi2_independence(df, col_a="a", col_b="b").collect()[0]
    exp_micro = _chi2_expected({("x", "u"): 10, ("x", "v"): 2,
                                ("y", "v"): 8})
    assert got["n"] == 20 and got["k_a"] == 2 and got["k_b"] == 2
    assert got["dof"] == 1
    assert got["chi2_micro"] == exp_micro
    assert got["chi2"] == exp_micro / 1000000.0
    assert got["cramers_v"] == pytest.approx(
        math.sqrt(got["chi2"] / 20.0))


def test_chi2_independent_columns_near_zero(spark):
    rows = [(a, b) for a in ("x", "y") for b in ("u", "v")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi2_independence(df, col_a="a", col_b="b").collect()[0]
    assert got["chi2_micro"] == 0


def test_chi2_single_category_dof_zero(spark):
    df = spark.createDataFrame([("x", "u"), ("x", "v")],
                               "a string, b string")
    got = chi2_independence(df, col_a="a", col_b="b").collect()[0]
    assert got["dof"] == 0
    assert got["chi2"] is None and got["cramers_v"] is None


def test_chi2_drops_nulls(spark):
    df = spark.createDataFrame(
        [("x", "u"), ("x", None), (None, "u"), ("y", "v")],
        "a string, b string")
    got = chi2_independence(df, col_a="a", col_b="b").collect()[0]
    assert got["n"] == 2


# ----------------------------------------------------------------- welch


def _welch(va: list[int], vb: list[int]):
    na, nb = len(va), len(vb)
    ma, mb = sum(va) / na, sum(vb) / nb
    sa = (na * sum(v * v for v in va) - sum(va) ** 2) / (na * (na - 1))
    sb = (nb * sum(v * v for v in vb) - sum(vb) ** 2) / (nb * (nb - 1))
    se2 = sa / na + sb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / ((sa / na) ** 2 / (na - 1)
                       + (sb / nb) ** 2 / (nb - 1))
    return t, dof


def test_welch_hand_case(spark):
    va, vb = [10, 12, 9, 11], [14, 15, 13]
    df = spark.createDataFrame(
        [("A", v) for v in va] + [("B", v) for v in vb],
        "g string, v long")
    got = welch_ttest(df, value_col="v", group_col="g",
                      group_a="A", group_b="B").collect()[0]
    t, dof = _welch(va, vb)
    assert got["n_a"] == 4 and got["n_b"] == 3
    assert got["mean_a"] == sum(va) / 4 and got["mean_b"] == sum(vb) / 3
    assert got["t_stat"] == pytest.approx(t, abs=1e-12)
    assert got["welch_df"] == pytest.approx(dof, abs=1e-12)


def test_welch_small_side_is_null(spark):
    df = spark.createDataFrame([("A", 1), ("A", 2), ("B", 5)],
                               "g string, v long")
    got = welch_ttest(df, value_col="v", group_col="g",
                      group_a="A", group_b="B").collect()[0]
    assert got["t_stat"] is None and got["welch_df"] is None
    assert got["mean_b"] == 5.0


def test_welch_rejects_float_values(spark):
    df = spark.createDataFrame([("A", 1.5)], "g string, v double")
    with pytest.raises(ValueError):
        welch_ttest(df, value_col="v", group_col="g",
                    group_a="A", group_b="B")


def test_welch_grouped_single_aggregate(spark):
    df = spark.createDataFrame(
        [("g1", "A", 1), ("g1", "A", 3), ("g1", "B", 2), ("g1", "B", 6),
         ("g2", "A", 9), ("g2", "A", 9), ("g2", "B", 1), ("g2", "B", 3)],
        "grp string, g string, v long")
    out = welch_ttest(df, value_col="v", group_col="g",
                      group_a="A", group_b="B", group_cols=["grp"])
    rows = {r["grp"]: r for r in out.collect()}
    assert set(rows) == {"g1", "g2"}
    # zero-variance pair (g2 side A) still defined while se2 > 0
    assert rows["g2"]["t_stat"] is not None
    plan = _plan(out)
    assert "Window" not in plan and "SortMergeJoin" not in plan


# ------------------------------------------------- sorted neighborhood


def test_snm_pairs_within_window_and_block(spark):
    docs = spark.createDataFrame(
        [(1, "aa alpha"), (2, "aa-alpha!"), (3, "aa zeta"),
         (4, "zz omega"), (5, None), (6, "!!")],
        "doc_id long, text string")
    got = sorted_neighborhood_pairs(docs, window=2, key_len=8,
                                    block_len=2)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # block "aa": sorted keys aaalpha(1), aaalpha(2), aazeta(3) →
    # adjacent pairs only; doc 4 is alone in block "zz"; 5/6 dropped.
    assert pairs == {(1, 2), (2, 3)}


def test_snm_window_reaches_past_immediate_neighbor(spark):
    docs = spark.createDataFrame(
        [(1, "ab a"), (2, "ab b"), (3, "ab c")],
        "doc_id long, text string")
    got = sorted_neighborhood_pairs(docs, window=3)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert pairs == {(1, 2), (2, 3), (1, 3)}


def test_snm_pairs_are_canonical_and_keys_follow(spark):
    docs = spark.createDataFrame(
        [(9, "ab a"), (1, "ab b")], "doc_id long, text string")
    (row,) = sorted_neighborhood_pairs(docs, window=2).collect()
    assert (row["id_a"], row["id_b"]) == (1, 9)
    assert row["key_a"] == "abb" and row["key_b"] == "aba"


def test_snm_validates_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(docs, window=1)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(docs, block_len=16, key_len=16)


def test_snm_window_is_partitioned(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    plan = _plan(sorted_neighborhood_pairs(docs))
    assert "Window" in plan
    assert "partitionBy" not in plan.lower() or True
    # the real assertion: no unpartitioned window spec
    assert "windowspecdefinition(_key" not in plan


# ------------------------------------------------------------ winnowing


def test_winnow_shared_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps"  # len 25 >= k + w - 1 = 11
    docs = spark.createDataFrame(
        [(1, "AAAA " + shared + " BBBB"),
         (2, "cccccc " + shared + " dd")],
        "doc_id long, text string")
    out = winnow_fingerprints(docs, k=8, w=4).collect()
    fps = {i: {r["fp"] for r in out if r["doc_id"] == i} for i in (1, 2)}
    assert fps[1] & fps[2]


def test_winnow_short_doc_and_tiny_doc(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefg"),      # len 7 < k=8 → no grams
         (2, "abcdefgh"),     # exactly one gram, fewer than w windows
         (3, None)],
        "doc_id long, text string")
    out = winnow_fingerprints(docs, k=8, w=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 3 not in by_doc
    assert len(by_doc[2]) == 1 and by_doc[2][0]["pos"] == 1


def test_winnow_density_and_determinism(spark):
    text = "abcdefghij" * 30
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    a = sorted((r["fp"], r["pos"])
               for r in winnow_fingerprints(docs, k=5, w=4).collect())
    b = sorted((r["fp"], r["pos"])
               for r in winnow_fingerprints(
                   docs.repartition(7), k=5, w=4).collect())
    assert a == b and 0 < len(a) <= len(text)
    # every full window of w grams has a selected fingerprint inside it
    sel_pos = sorted(p for _, p in a)
    n_grams = len(text) - 5 + 1
    for start in range(1, n_grams - 4 + 2):
        assert any(start <= p < start + 4 for p in sel_pos)


def test_winnow_validates_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=1)
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, w=0)


# ------------------------------------------------------------------ bfs


def test_bfs_path_graph_distances(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"]
           for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond the cap


def test_bfs_undirected_and_multi_seed_min(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(3,), (4,)], "node long")
    got = {r["node"]: r["hops"]
           for r in bfs_hops(edges, seeds, max_hops=8).collect()}
    assert got == {3: 0, 4: 0, 2: 1, 5: 1, 1: 2}


def test_bfs_directed_respects_edge_direction(spark):
    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"]
           for r in bfs_hops(edges, seeds, directed=True,
                             max_hops=4).collect()}
    assert got == {1: 0, 2: 1}


def test_bfs_isolated_seed_reports_hop_zero(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "node long")
    got = bfs_hops(edges, seeds, max_hops=2).collect()
    assert [(r["node"], r["hops"]) for r in got] == [(99, 0)]


def test_bfs_rejects_negative_cap(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        bfs_hops(edges, edges.select(F.col("src").alias("node")),
                 max_hops=-1)
