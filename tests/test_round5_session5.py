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
