"""Round-5 session-6 operators (registered q203+ AFTER the driver
pinned the round's query list — the in-repo oracle sweep in BENCH/ is
their cross-engine evidence, regenerated in-round; these tests pin the
edge semantics and the plan shapes)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kml2geojson_spark.relational import (js_divergence, map_at_k,
                                          poisson_rate_ztest, runs_test)
from kml2geojson_spark.textops import char_entropy


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------- js_divergence


def _jsd_reference(ca: dict[str, int], cb: dict[str, int]) -> float:
    """Micro-nat replay of the operator's integerization contract."""
    n1 = sum(ca.values())
    n2 = sum(cb.values())

    def lnmu(x: int) -> int:
        return round(math.log(float(x)) * 1e6)

    sa = sb = 0
    for cat in set(ca) | set(cb):
        c1, c2 = ca.get(cat, 0), cb.get(cat, 0)
        mix = c1 * n2 + c2 * n1
        if c1 > 0:
            sa += c1 * (lnmu(2 * c1 * n2) - lnmu(mix))
        if c2 > 0:
            sb += c2 * (lnmu(2 * c2 * n1) - lnmu(mix))
    return (sa / n1 + sb / n2) / 2e6


def test_js_divergence_matches_reference(spark):
    import random
    random.seed(11)
    cats = list("abcdef")
    rows = ([("A", random.choice(cats)) for _ in range(300)]
            + [("B", random.choice(cats[:4])) for _ in range(200)])
    df = spark.createDataFrame(rows, "grp string, cat string")
    (r,) = js_divergence(df, cat_col="cat", group_col="grp",
                         group_a="A", group_b="B").collect()
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for g, c in rows:
        (ca if g == "A" else cb)[c] = (ca if g == "A" else cb).get(c, 0) + 1
    assert r["n_a"] == 300 and r["n_b"] == 200
    assert r["k_cats"] == len(set(ca) | set(cb))
    assert r["jsd"] == pytest.approx(_jsd_reference(ca, cb), abs=1e-12)
    # bounded by ln 2 (+ integerization slack)
    assert -1e-5 <= r["jsd"] <= math.log(2.0) + 1e-5


def test_js_divergence_identical_distributions_zero(spark):
    rows = [(g, c) for g in ("A", "B") for c in ("x", "x", "y")]
    df = spark.createDataFrame(rows, "grp string, cat string")
    (r,) = js_divergence(df, cat_col="cat", group_col="grp",
                         group_a="A", group_b="B").collect()
    assert r["jsd_num_a_micro"] == 0 and r["jsd_num_b_micro"] == 0
    assert r["jsd"] == 0.0


def test_js_divergence_disjoint_supports_ln2(spark):
    rows = [("A", "x")] * 5 + [("B", "y")] * 7
    df = spark.createDataFrame(rows, "grp string, cat string")
    (r,) = js_divergence(df, cat_col="cat", group_col="grp",
                         group_a="A", group_b="B").collect()
    assert r["jsd"] == pytest.approx(math.log(2.0), abs=1e-5)


def test_js_divergence_empty_side_null_and_other_groups_drop(spark):
    rows = [("A", "x"), ("A", "y"), ("C", "z"), (None, "x"),
            ("A", None)]
    df = spark.createDataFrame(rows, "grp string, cat string")
    (r,) = js_divergence(df, cat_col="cat", group_col="grp",
                         group_a="A", group_b="B").collect()
    assert r["n_a"] == 2 and r["n_b"] == 0
    assert r["jsd"] is None


def test_js_divergence_grouped_and_plan(spark):
    rows = [("g1", "A", "x"), ("g1", "A", "y"), ("g1", "B", "x"),
            ("g2", "A", "x"), ("g2", "B", "y"), (None, "A", "x")]
    df = spark.createDataFrame(rows, "seg string, grp string, cat string")
    out = js_divergence(df, cat_col="cat", group_col="grp",
                        group_a="A", group_b="B",
                        group_cols=["seg"])
    got = {r["seg"]: r for r in out.collect()}
    assert set(got) == {"g1", "g2"}
    assert got["g1"]["n_a"] == 2 and got["g1"]["n_b"] == 1
    assert got["g2"]["jsd"] == pytest.approx(math.log(2.0), abs=1e-5)
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan  # window + aggregates only


# --------------------------------------------------------- map_at_k


def _ap_reference(ranked_rel: list[int], k: int) -> tuple[int, float]:
    """Milli-floored per-hit precision replay."""
    n_rel = sum(ranked_rel)
    s = 0
    cum = 0
    for i, r in enumerate(ranked_rel, start=1):
        cum += r
        if r == 1 and i <= k:
            s += math.floor(cum * 1000.0 / i)
    return s, s / (min(n_rel, k) * 1000.0) if n_rel else float("nan")


def test_map_at_k_matches_reference(spark):
    import random
    random.seed(5)
    rows = []
    expect = {}
    for q in range(20):
        items = [(q, i, random.random(), random.randint(0, 1))
                 for i in range(15)]
        rows += items
        ranked = sorted(items, key=lambda t: (-t[2], t[1]))
        rel = [t[3] for t in ranked]
        n_rel = sum(rel)
        s, ap = _ap_reference(rel, 5)
        expect[q] = (n_rel, s, ap if n_rel else None)
    df = spark.createDataFrame(
        rows, "qid long, iid long, score double, rel long")
    out = {r["qid"]: r for r in
           map_at_k(df, group_cols=["qid"], id_col="iid",
                    score_col="score", rel_col="rel", k=5).collect()}
    assert set(out) == set(expect)
    for q, (n_rel, s, ap) in expect.items():
        assert out[q]["n_rel"] == n_rel
        assert out[q]["ap_milli_sum"] == s
        if ap is None:
            assert out[q]["map_at_k"] is None
        else:
            assert out[q]["map_at_k"] == pytest.approx(ap, abs=1e-12)


def test_map_at_k_perfect_and_worst_ranking(spark):
    rows = ([("p", i, 100.0 - i, 1 if i < 3 else 0) for i in range(10)]
            + [("w", i, 100.0 - i, 1 if i >= 7 else 0)
               for i in range(10)])
    df = spark.createDataFrame(
        rows, "qid string, iid long, score double, rel long")
    out = {r["qid"]: r for r in
           map_at_k(df, group_cols=["qid"], id_col="iid",
                    score_col="score", rel_col="rel", k=3).collect()}
    assert out["p"]["map_at_k"] == pytest.approx(1.0)
    assert out["w"]["n_hits_at_k"] == 0
    assert out["w"]["map_at_k"] == 0.0


def test_map_at_k_rejects_float_rel_and_bad_args(spark):
    df = spark.createDataFrame([("q", 1, 1.0, 1.0)],
                               "qid string, iid long, s double, r double")
    with pytest.raises(ValueError, match="floating-point"):
        map_at_k(df, group_cols=["qid"], id_col="iid", score_col="s",
                 rel_col="r", k=3)
    df2 = spark.createDataFrame([("q", 1, 1.0, 1)],
                                "qid string, iid long, s double, r long")
    with pytest.raises(ValueError, match="group_cols"):
        map_at_k(df2, group_cols=[], id_col="iid", score_col="s",
                 rel_col="r", k=3)
    with pytest.raises(ValueError, match="k must"):
        map_at_k(df2, group_cols=["qid"], id_col="iid", score_col="s",
                 rel_col="r", k=0)


def test_map_at_k_drops_non_binary_and_null_rows(spark):
    rows = [("q", 1, 9.0, 1), ("q", 2, 8.0, 2), ("q", 3, 7.0, None),
            ("q", None, 6.0, 1), ("q", 4, None, 1), ("q", 5, 5.0, 0)]
    df = spark.createDataFrame(
        rows, "qid string, iid long, score double, rel long")
    (r,) = map_at_k(df, group_cols=["qid"], id_col="iid",
                    score_col="score", rel_col="rel", k=3).collect()
    # only iid 1 (rel=1) and iid 5 (rel=0) survive
    assert r["n_rel"] == 1 and r["n_hits_at_k"] == 1
    assert r["map_at_k"] == pytest.approx(1.0)


def test_map_at_k_plan_single_window_no_join(spark):
    df = spark.createDataFrame([("q", 1, 1.0, 1)],
                               "qid string, iid long, s double, r long")
    plan = _plan(map_at_k(df, group_cols=["qid"], id_col="iid",
                          score_col="s", rel_col="r", k=3))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


# --------------------------------------------------------- runs_test


def _runs_reference(seq: list[int]) -> tuple[int, float | None]:
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    n = len(seq)
    n1 = sum(seq)
    n0 = n - n1
    if n1 == 0 or n0 == 0 or n < 2:
        return runs, None
    p2 = 2.0 * n1 * n0
    var = p2 * (p2 - n) / (n * n * (n - 1.0))
    if var <= 0:
        return runs, None
    return runs, (runs - 1.0 - p2 / n) / math.sqrt(var)


def test_runs_test_matches_reference(spark):
    import random
    random.seed(3)
    rows = []
    expect = {}
    for g in range(8):
        seq = [random.randint(0, 1) for _ in range(50)]
        rows += [(g, i, i * 10, x) for i, x in enumerate(seq)]
        expect[g] = _runs_reference(seq)
    df = spark.createDataFrame(rows, "grp long, eid long, o long, x long")
    out = {r["grp"]: r for r in
           runs_test(df, flag_col="x", order_col="o", id_col="eid",
                     group_cols=["grp"]).collect()}
    for g, (runs, z) in expect.items():
        assert out[g]["runs"] == runs
        if z is None:
            assert out[g]["z"] is None
        else:
            assert out[g]["z"] == pytest.approx(z, abs=1e-12)


def test_runs_test_order_ties_broken_by_id(spark):
    # same order value for all rows: sequence is id order
    rows = [("g", 1, 0, 0), ("g", 2, 0, 1), ("g", 3, 0, 0),
            ("g", 4, 0, 1)]
    df = spark.createDataFrame(rows, "grp string, eid long, o long, x long")
    (r,) = runs_test(df, flag_col="x", order_col="o", id_col="eid",
                     group_cols=["grp"]).collect()
    assert r["runs"] == 4  # perfectly alternating


def test_runs_test_constant_sequence_null_z(spark):
    rows = [("g", i, i, 1) for i in range(6)]
    df = spark.createDataFrame(rows, "grp string, eid long, o long, x long")
    (r,) = runs_test(df, flag_col="x", order_col="o", id_col="eid",
                     group_cols=["grp"]).collect()
    assert r["runs"] == 1 and r["n0"] == 0
    assert r["z"] is None


def test_runs_test_rejects_float_flag(spark):
    df = spark.createDataFrame([("g", 1, 1, 0.5)],
                               "grp string, eid long, o long, x double")
    with pytest.raises(ValueError, match="floating-point"):
        runs_test(df, flag_col="x", order_col="o", id_col="eid",
                  group_cols=["grp"])


def test_runs_test_plan_no_join_no_python(spark):
    df = spark.createDataFrame([("g", 1, 1, 1)],
                               "grp string, eid long, o long, x long")
    plan = _plan(runs_test(df, flag_col="x", order_col="o",
                           id_col="eid", group_cols=["grp"]))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


# --------------------------------------------------------- poisson rate


def test_poisson_rate_ztest_matches_reference(spark):
    rows = [("A", 3, 10), ("A", 7, 20), ("B", 1, 15), ("B", 2, 25),
            ("C", 99, 1), (None, 5, 5), ("A", None, 5), ("A", 5, None),
            ("A", -1, 5), ("A", 5, 0)]
    df = spark.createDataFrame(rows, "grp string, k long, t long")
    (r,) = poisson_rate_ztest(df, count_col="k", exposure_col="t",
                              group_col="grp", group_a="A",
                              group_b="B").collect()
    ka, ta, kb, tb = 10, 30, 3, 40
    assert (r["k_a"], r["t_a"], r["k_b"], r["t_b"]) == (ka, ta, kb, tb)
    ra, rb = ka / ta, kb / tb
    z = (ra - rb) / math.sqrt(ka / ta**2 + kb / tb**2)
    assert r["rate_a"] == pytest.approx(ra)
    assert r["z"] == pytest.approx(z, abs=1e-12)


def test_poisson_rate_ztest_zero_counts_null_z(spark):
    rows = [("A", 0, 10), ("B", 0, 10)]
    df = spark.createDataFrame(rows, "grp string, k long, t long")
    (r,) = poisson_rate_ztest(df, count_col="k", exposure_col="t",
                              group_col="grp", group_a="A",
                              group_b="B").collect()
    assert r["z"] is None
    assert r["rate_a"] == 0.0


def test_poisson_rate_ztest_grouped_and_guards(spark):
    rows = [("s1", "A", 4, 10), ("s1", "B", 2, 10),
            ("s2", "A", 1, 10), (None, "A", 9, 9)]
    df = spark.createDataFrame(rows, "seg string, grp string, k long, t long")
    out = {r["seg"]: r for r in
           poisson_rate_ztest(df, count_col="k", exposure_col="t",
                              group_col="grp", group_a="A",
                              group_b="B",
                              group_cols=["seg"]).collect()}
    assert set(out) == {"s1", "s2"}
    assert out["s2"]["t_b"] == 0 and out["s2"]["z"] is None
    fdf = spark.createDataFrame([("A", 1.5, 1)],
                                "grp string, k double, t long")
    with pytest.raises(ValueError, match="floating-point"):
        poisson_rate_ztest(fdf, count_col="k", exposure_col="t",
                           group_col="grp", group_a="A", group_b="B")


def test_poisson_rate_ztest_plan_single_agg(spark):
    df = spark.createDataFrame([("A", 1, 1)], "grp string, k long, t long")
    plan = _plan(poisson_rate_ztest(df, count_col="k", exposure_col="t",
                                    group_col="grp", group_a="A",
                                    group_b="B"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan and "Window" not in plan


# --------------------------------------------------------- char_entropy


def _entropy_reference(text: str) -> tuple[int, int, int, float]:
    cnt: dict[str, int] = {}
    for ch in text:
        cnt[ch] = cnt.get(ch, 0) + 1
    n = len(text)

    def lnmu(x: int) -> int:
        return round(math.log(float(x)) * 1e6)

    num = n * lnmu(n) - sum(c * lnmu(c) for c in cnt.values())
    return n, len(cnt), num, num / (n * 1e6)


def test_char_entropy_matches_reference(spark):
    texts = ["hello world", "aaaaaaa", "abcdefgh", "the the the cat",
             "ünïcodé tèxt"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    for i, t in enumerate(texts):
        n, k, num, ent = _entropy_reference(t)
        assert out[i]["n_chars_counted"] == n
        assert out[i]["k_chars"] == k
        assert out[i]["ent_num_micro"] == num
        assert out[i]["char_entropy"] == pytest.approx(ent, abs=1e-12)


def test_char_entropy_bands_separate_text_classes(spark):
    import random
    random.seed(2)
    blob = "".join(random.choice(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/")
        for _ in range(400))
    spam = "z" * 400
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "sits down to rest by the river bank for a while ") * 4
    df = spark.createDataFrame(
        [(0, blob), (1, spam), (2, prose)], "doc_id long, text string")
    out = {r["doc_id"]: r["char_entropy"]
           for r in char_entropy(df).collect()}
    assert out[1] == 0.0  # single repeated char
    assert out[1] < out[2] < out[0]  # spam < prose < base64 blob


def test_char_entropy_empty_and_null_drop(spark):
    df = spark.createDataFrame([(0, ""), (1, None), (2, "ab")],
                               "doc_id long, text string")
    out = char_entropy(df).collect()
    assert {r["doc_id"] for r in out} == {2}
    assert out[0]["char_entropy"] == pytest.approx(math.log(2.0),
                                                   abs=1e-5)


def test_char_entropy_plan_no_python_no_join(spark):
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    plan = _plan(char_entropy(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan and "Window" not in plan
