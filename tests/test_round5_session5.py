"""Round-5 session-5 operators (registered q187+ AFTER the driver
pinned the round's query list — the in-repo oracle sweep in BENCH/ is
their cross-engine evidence, regenerated in-round; these tests pin the
edge semantics and the plan shapes)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kml2geojson_spark.relational import (group_moments, group_quantiles,
                                          kruskal_wallis)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------- kruskal-wallis


def _kw_reference(samples: dict[str, list[int]]) -> float:
    """Milli-exact replay of the operator's contract in plain Python:
    doubled midranks, per-level floor(S'^2/n) summed as ints, tie
    correction from exact cubes."""
    allv = sorted(v for vs in samples.values() for v in vs)
    n = len(allv)
    # doubled midrank per value
    first = {}
    cnt = {}
    for i, v in enumerate(allv):
        first.setdefault(v, i + 1)
        cnt[v] = cnt.get(v, 0) + 1
    dr = {v: 2 * first[v] + cnt[v] - 1 for v in cnt}
    t_sum = 0
    for vs in samples.values():
        s = sum(dr[v] for v in vs)
        t_sum += math.floor(float(s) * float(s) / float(len(vs)))
    tie = sum(t ** 3 - t for t in cnt.values())
    c = 1.0 - float(tie) / float(n ** 3 - n)
    return (3.0 * float(t_sum) / (float(n) * (float(n) + 1.0))
            - 3.0 * (float(n) + 1.0)) / c


def test_kruskal_wallis_matches_reference_and_scipy_form(spark):
    import random
    random.seed(7)
    samples = {
        "a": [random.randint(0, 30) for _ in range(80)],
        "b": [random.randint(5, 40) for _ in range(60)],
        "c": [random.randint(0, 20) for _ in range(40)],
    }
    rows = [("g", lvl, v) for lvl, vs in samples.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, lvl string, v long")
    (r,) = kruskal_wallis(df, value_col="v", factor_col="lvl",
                          group_cols=["grp"]).collect()
    assert r["k"] == 3 and r["n"] == 180
    want = _kw_reference(samples)
    assert abs(r["h_stat"] - want) < 1e-9
    # the milli-floored H is within 1e-3 of the textbook float H
    ranks = {}
    allv = sorted(v for vs in samples.values() for v in vs)
    i = 0
    while i < len(allv):
        j = i
        while j + 1 < len(allv) and allv[j + 1] == allv[i]:
            j += 1
        for k in range(i, j + 1):
            ranks.setdefault(allv[i], (i + 1 + j + 1) / 2)
        i = j + 1
    n = len(allv)
    hsum = sum(len(vs) * (sum(ranks[v] for v in vs) / len(vs)) ** 2
               for vs in samples.values())
    h = 12.0 / (n * (n + 1)) * hsum - 3 * (n + 1)
    tie = sum((t ** 3 - t) for t in
              {v: allv.count(v) for v in set(allv)}.values())
    h /= 1.0 - tie / float(n ** 3 - n)
    assert abs(r["h_stat"] - h) < 1e-3


def test_kruskal_wallis_edges(spark):
    rows = ([("one", "x", i) for i in range(5)]          # k=1 -> NULL
            + [("tied", "x", 7), ("tied", "y", 7)]       # C=0 -> NULL
            + [("ok", "x", 1), ("ok", "x", 2),
               ("ok", "y", 9), ("ok", "y", 10)])         # clean split
    df = spark.createDataFrame(rows, "grp string, lvl string, v long")
    out = {r["grp"]: r for r in
           kruskal_wallis(df, value_col="v", factor_col="lvl",
                          group_cols=["grp"]).collect()}
    assert out["one"]["h_stat"] is None
    assert out["tied"]["h_stat"] is None
    assert out["ok"]["h_stat"] is not None and out["ok"]["h_stat"] > 0
    dff = spark.createDataFrame([("g", "x", 1.0)],
                                "grp string, lvl string, v double")
    with pytest.raises(ValueError):
        kruskal_wallis(dff, value_col="v", factor_col="lvl",
                       group_cols=["grp"])


def test_kruskal_wallis_plan_no_python(spark):
    df = spark.createDataFrame(
        [("g", "ab"[i % 2], i % 9) for i in range(60)],
        "grp string, lvl string, v long")
    plan = _plan(kruskal_wallis(df, value_col="v", factor_col="lvl",
                                group_cols=["grp"]))
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------------- moments


def test_group_moments_brute_force(spark):
    import random
    random.seed(3)
    vals = [random.randint(-20, 60) for _ in range(200)]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, v long")
    (r,) = group_moments(df, value_col="v",
                         group_cols=["grp"]).collect()
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((v - mu) ** 2 for v in vals) / n
    m3 = sum((v - mu) ** 3 for v in vals) / n
    m4 = sum((v - mu) ** 4 for v in vals) / n
    assert r["n"] == n
    assert abs(r["mean"] - mu) < 1e-9
    assert abs(r["m2"] - m2) < 1e-7
    assert abs(r["skewness"] - m3 / m2 ** 1.5) < 1e-9
    assert abs(r["kurtosis_excess"] - (m4 / m2 ** 2 - 3)) < 1e-9


def test_group_moments_edges(spark):
    rows = ([("const", 5)] * 4 + [("single", 9)]
            + [("sym", v) for v in (-2, -1, 1, 2)])
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r["grp"]: r for r in
           group_moments(df, value_col="v",
                         group_cols=["grp"]).collect()}
    assert out["const"]["skewness"] is None
    assert out["const"]["kurtosis_excess"] is None
    assert out["single"]["skewness"] is None
    assert out["sym"]["skewness"] == 0.0          # exact: m3n is exactly 0
    dff = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    with pytest.raises(ValueError):
        group_moments(dff, value_col="v", group_cols=["grp"])
    with pytest.raises(ValueError):
        group_moments(df, value_col="v", group_cols=[])


def test_group_moments_plan_single_agg(spark):
    df = spark.createDataFrame([("g", i % 13) for i in range(50)],
                               "grp string, v long")
    plan = _plan(group_moments(df, value_col="v", group_cols=["grp"]))
    assert "PythonUDF" not in plan
    assert plan.count("Exchange") <= 1            # one hash-agg exchange


# ----------------------------------------------------------- quantiles


def test_group_quantiles_brute_force(spark):
    import random
    random.seed(5)
    vals = [random.randint(0, 99) for _ in range(173)]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, v long")
    out = {r["permille"]: r["value"] for r in
           group_quantiles(df, value_col="v", group_cols=["grp"],
                           permilles=[1, 250, 500, 900, 990, 1000])
           .collect()}
    sv = sorted(vals)
    n = len(sv)
    for pm in (1, 250, 500, 900, 990, 1000):
        want = sv[max(0, math.ceil(n * pm / 1000) - 1)]
        assert out[pm] == want, (pm, out[pm], want)
    assert out[1000] == max(vals) and out[1] == min(vals)


def test_group_quantiles_exactly_one_row_per_pm_and_validation(spark):
    rows = [("a", v) for v in (3, 3, 3, 7)] + [("b", v) for v in (1, 2)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = group_quantiles(df, value_col="v", group_cols=["grp"],
                          permilles=[500, 750]).collect()
    assert len(got) == 4                          # 2 groups x 2 pms
    vals = {(r["grp"], r["permille"]): r["value"] for r in got}
    assert vals[("a", 500)] == 3 and vals[("a", 750)] == 3
    assert vals[("b", 500)] == 1 and vals[("b", 750)] == 2
    for bad in ([], [0], [1001], [500, 500], [0.5]):
        with pytest.raises(ValueError):
            group_quantiles(df, value_col="v", group_cols=["grp"],
                            permilles=bad)
    dff = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    with pytest.raises(ValueError):
        group_quantiles(dff, value_col="v", group_cols=["grp"],
                        permilles=[500])


def test_group_quantiles_plan_no_join_no_python(spark):
    df = spark.createDataFrame([("g", i % 11) for i in range(70)],
                               "grp string, v long")
    plan = _plan(group_quantiles(df, value_col="v", group_cols=["grp"],
                                 permilles=[500, 990]))
    assert "PythonUDF" not in plan
    assert "Join" not in plan                     # explode, not a join


# ------------------------------------------------- clustering coefficient


def test_clustering_coefficient_known_graph(spark):
    from kml2geojson_spark.graph import clustering_coefficient
    # triangle 1-2-3 plus pendant 4 attached to 1, isolated edge 5-6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4), (5, 6), (2, 1)],  # dup reversed
        "src long, dst long")
    out = {r["node"]: r for r in
           clustering_coefficient(edges).collect()}
    assert out[1]["degree"] == 3 and out[1]["n_triangles"] == 1
    assert abs(out[1]["clustering_coeff"] - 2 / 6) < 1e-15
    assert out[2]["clustering_coeff"] == 1.0
    assert out[3]["clustering_coeff"] == 1.0
    assert out[4]["degree"] == 1 and out[4]["clustering_coeff"] is None
    assert out[5]["n_triangles"] == 0
    assert out[5]["clustering_coeff"] is None  # degree 1
    assert len(out) == 6


def test_clustering_coefficient_open_wedge_zero(spark):
    from kml2geojson_spark.graph import clustering_coefficient
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r["node"]: r for r in
           clustering_coefficient(edges).collect()}
    assert out[2]["degree"] == 2 and out[2]["clustering_coeff"] == 0.0


# ------------------------------------------------------------ kaplan-meier


def test_kaplan_meier_hand_case(spark):
    from kml2geojson_spark.eventops import kaplan_meier
    # classic example: events at t=1 (2 deaths of 6), t=3 (1 of 3);
    # censored at t=2 (1) and t=4 (2 never die)
    rows = [("g", 1, 1), ("g", 1, 1), ("g", 2, 0), ("g", 3, 1),
            ("g", 4, 0), ("g", 4, 0)]
    df = spark.createDataFrame(rows, "grp string, dur long, ev long")
    out = {r["t"]: r for r in
           kaplan_meier(df, duration_col="dur", event_col="ev",
                        group_cols=["grp"]).collect()}
    assert set(out) == {1, 3}                    # event times only
    assert out[1]["at_risk"] == 6 and out[1]["events"] == 2
    assert out[3]["at_risk"] == 3 and out[3]["events"] == 1
    import math
    want1 = round(math.log(4) * 1e6) - round(math.log(6) * 1e6)
    assert out[1]["log_surv_micro"] == want1
    want3 = want1 + round(math.log(2) * 1e6) - round(math.log(3) * 1e6)
    assert out[3]["log_surv_micro"] == want3
    assert abs(out[1]["survival"] - 4 / 6) < 1e-5
    assert abs(out[3]["survival"] - (4 / 6) * (2 / 3)) < 1e-5


def test_kaplan_meier_zero_survival_and_validation(spark):
    from kml2geojson_spark.eventops import kaplan_meier
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 2, 1)]  # all die by t=2
    df = spark.createDataFrame(rows, "grp string, dur long, ev long")
    out = {r["t"]: r for r in
           kaplan_meier(df, duration_col="dur", event_col="ev",
                        group_cols=["grp"]).collect()}
    assert out[2]["at_risk"] == 2 and out[2]["events"] == 2
    assert out[2]["log_surv_micro"] is None
    assert out[2]["survival"] == 0.0
    assert out[1]["survival"] > 0.0
    dff = spark.createDataFrame([("g", 1.0, 1)],
                                "grp string, dur double, ev long")
    import pytest as _pt
    with _pt.raises(ValueError):
        kaplan_meier(dff, duration_col="dur", event_col="ev",
                     group_cols=["grp"])
    with _pt.raises(ValueError):
        kaplan_meier(df, duration_col="dur", event_col="ev",
                     group_cols=[])
    # rows with event flag outside {0,1} or negative duration drop
    rows2 = [("g", 1, 1), ("g", 1, 7), ("g", -2, 1)]
    df2 = spark.createDataFrame(rows2, "grp string, dur long, ev long")
    (r,) = kaplan_meier(df2, duration_col="dur", event_col="ev",
                        group_cols=["grp"]).collect()
    assert r["at_risk"] == 1 and r["events"] == 1


# ------------------------------------------------------------------ theil


def test_theil_brute_force_and_edges(spark):
    from kml2geojson_spark.relational import theil_index
    import random
    random.seed(13)
    vals = [random.randint(1, 500) for _ in range(300)]
    df = spark.createDataFrame([("g", v) for v in vals]
                               + [("eq", 7)] * 10
                               + [("g", 0), ("g", -4)],  # dropped
                               "grp string, v long")
    out = {r["grp"]: r for r in
           theil_index(df, value_col="v", group_cols=["grp"]).collect()}
    n, s = len(vals), sum(vals)
    mu = s / n
    want = sum((v / mu) * math.log(v / mu) for v in vals) / n
    assert out["g"]["n"] == n and out["g"]["sum_v"] == s
    assert abs(out["g"]["theil"] - want) < 1e-4   # micro-nat resolution
    assert abs(out["eq"]["theil"]) < 2e-6         # equality -> ~0
    dff = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    with pytest.raises(ValueError):
        theil_index(dff, value_col="v", group_cols=["grp"])


def test_theil_plan_two_aggs_no_python(spark):
    from kml2geojson_spark.relational import theil_index
    df = spark.createDataFrame([("g", i % 9 + 1) for i in range(50)],
                               "grp string, v long")
    plan = _plan(theil_index(df, value_col="v", group_cols=["grp"]))
    assert "PythonUDF" not in plan and "Join" not in plan


# --------------------------------------------------------------- zipf fit


def test_zipf_fit_matches_plain_ols(spark):
    from kml2geojson_spark.textops import zipf_fit
    import random
    random.seed(17)
    # synthetic corpus with a Zipfy token distribution
    vocab = [f"w{i}" for i in range(60)]
    words = []
    for i, w in enumerate(vocab):
        words += [w] * max(1, int(200 / (i + 1)))
    random.shuffle(words)
    docs = []
    for i in range(20):
        docs.append((i, " ".join(words[i::20])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    (r,) = zipf_fit(df).collect()
    # replay: exact micro-nat OLS in plain python
    from collections import Counter
    cnt = Counter(words)
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [round(math.log(i + 1) * 1e6) for i in range(len(ordered))]
    ys = [round(math.log(f) * 1e6) for _, f in ordered]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    assert r["n_terms"] == n
    assert abs(r["slope"] - num / dx) < 1e-12
    assert abs(r["r2"] - num * num / (dx * dy)) < 1e-12
    assert -1.5 < r["slope"] < -0.5 and r["r2"] > 0.8


def test_zipf_fit_edges(spark):
    from kml2geojson_spark.textops import zipf_fit
    df = spark.createDataFrame([(1, "only only only")],
                               "doc_id long, text string")
    (r,) = zipf_fit(df).collect()
    assert r["n_terms"] == 1 and r["slope"] is None
    (r2,) = zipf_fit(df, min_freq=5).collect()
    assert r2["n_terms"] == 0
    with pytest.raises(ValueError):
        zipf_fit(df, min_freq=0)
