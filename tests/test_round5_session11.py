"""Round-5 session-11: theil_sen, ripley_k, clark_evans, ring_audit."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# theil_sen
# ---------------------------------------------------------------------------

def _brute_theil_sen(pts):
    slopes = sorted((xj - xi) / (tj - ti)
                    for i, (ti, xi) in enumerate(pts)
                    for (tj, xj) in pts[i + 1:] if tj != ti
                    for _ in [0] if ti < tj)
    if not slopes:
        return 0, None
    return len(slopes), slopes[(len(slopes) + 1) // 2 - 1]


def test_theil_sen_matches_brute(spark):
    from kml2geojson_spark.relational import theil_sen

    rng = np.random.default_rng(7)
    rows, expect = [], {}
    for g in range(8):
        n = int(rng.integers(2, 12))
        ts = sorted(rng.choice(200, size=n, replace=False).tolist())
        xs = [int(2 * t + rng.integers(-30, 31)) for t in ts]
        pts = list(zip(ts, xs))
        expect[f"g{g}"] = _brute_theil_sen(pts)
        rows += [(f"g{g}", int(t), int(x)) for t, x in pts]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = {r.g: (r.n_pairs, r.slope)
           for r in theil_sen(df, value_col="v", t_col="t",
                              group_cols=["g"]).collect()}
    assert got == expect


def test_theil_sen_outlier_robust_and_ties(spark):
    from kml2geojson_spark.relational import theil_sen

    # slope-2 line with one wild outlier: median slope stays 2
    rows = [("a", t, 2 * t) for t in range(1, 10)] + [("a", 10, 100000)]
    # all timestamps tied -> zero usable pairs, NULL slope
    rows += [("b", 5, 1), ("b", 5, 2), ("b", 5, 3)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = {r.g: r for r in theil_sen(df, value_col="v", t_col="t",
                                     group_cols=["g"]).collect()}
    assert got["a"].slope == pytest.approx(2.0)
    assert got["b"].n_pairs == 0 and got["b"].slope is None


def test_theil_sen_rejects_float_columns(spark):
    from kml2geojson_spark.relational import theil_sen

    df = spark.createDataFrame([("a", 1, 1.5)], "g string, t long, v double")
    with pytest.raises(ValueError, match="integerize"):
        theil_sen(df, value_col="v", t_col="t", group_cols=["g"])
    df2 = spark.createDataFrame([("a", 1.0, 1)], "g string, t double, v long")
    with pytest.raises(ValueError, match="integerize"):
        theil_sen(df2, value_col="v", t_col="t", group_cols=["g"])


# ---------------------------------------------------------------------------
# ripley_k
# ---------------------------------------------------------------------------

def test_ripley_k_matches_brute(spark):
    from kml2geojson_spark.spatial.ops import ripley_k

    rng = np.random.default_rng(11)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-30, 30, 120), rng.uniform(-20, 20, 120)))]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    radii, area = [1.0, 4.0, 9.0], 60.0 * 40.0
    got = {r.r: r for r in
           ripley_k(df, radii, area, res=4).collect()}
    n = len(pts)
    for rad in radii:
        pairs = sum(1 for i, xi, yi in pts for j, xj, yj in pts
                    if i != j
                    and (xi - xj) ** 2 + (yi - yj) ** 2 <= rad * rad)
        row = got[rad]
        assert row.n == n and row.pairs == pairs
        k = area * pairs / (n * (n - 1))
        assert row.k_est == pytest.approx(k, rel=1e-12)
        assert row.l_est == pytest.approx(math.sqrt(k / math.pi), rel=1e-12)


def test_ripley_k_csr_l_near_r(spark):
    """Under uniform randomness L(r) ~ r (uncorrected, generous tol)."""
    from kml2geojson_spark.spatial.ops import ripley_k

    rng = np.random.default_rng(3)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(0, 100, 800), rng.uniform(0, 100, 800)))]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    row = ripley_k(df, [5.0], 100.0 * 100.0, res=4).collect()[0]
    assert row.l_est == pytest.approx(5.0, rel=0.15)


def test_ripley_k_validation(spark):
    from kml2geojson_spark.spatial.ops import ripley_k

    df = spark.createDataFrame([(1, 0.0, 0.0)],
                               "point_id long, x double, y double")
    with pytest.raises(ValueError, match="non-empty"):
        ripley_k(df, [], 1.0, res=3)
    with pytest.raises(ValueError, match="negative"):
        ripley_k(df, [-1.0], 1.0, res=3)
    with pytest.raises(ValueError, match="positive"):
        ripley_k(df, [1.0], 0.0, res=3)
    # single point: no pairs, NULL K
    row = ripley_k(df, [1.0], 10.0, res=3).collect()[0]
    assert row.n == 1 and row.pairs == 0 and row.k_est is None


# ---------------------------------------------------------------------------
# clark_evans
# ---------------------------------------------------------------------------

def test_clark_evans_matches_brute(spark):
    from kml2geojson_spark.spatial.ops import clark_evans

    rng = np.random.default_rng(23)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-40, 40, 150), rng.uniform(-25, 25, 150)))]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    area = 80.0 * 50.0
    row = clark_evans(df, area, res=6).collect()[0]
    n = len(pts)
    sum_micro = 0
    for i, xi, yi in pts:
        d2 = min((xi - xj) ** 2 + (yi - yj) ** 2
                 for j, xj, yj in pts if j != i)
        sum_micro += math.floor(math.sqrt(d2) * 1e6 + 0.5)
    assert row.n == n and row.sum_nn_micro == sum_micro
    mean_nn = sum_micro / 1e6 / n
    expected = 0.5 / math.sqrt(n / area)
    assert row.mean_nn == pytest.approx(mean_nn, rel=1e-12)
    assert row.r_index == pytest.approx(mean_nn / expected, rel=1e-12)


def test_clark_evans_regular_grid_dispersed(spark):
    """A perfect lattice is maximally dispersed: R  well above 1."""
    from kml2geojson_spark.spatial.ops import clark_evans

    pts = [(i * 20 + j, float(i * 5), float(j * 5))
           for i in range(20) for j in range(20)]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    row = clark_evans(df, 100.0 * 100.0, res=6).collect()[0]
    # lattice spacing 5, density 400/1e4 -> expected CSR NN = 0.25
    assert row.mean_nn == pytest.approx(5.0, abs=1e-9)
    assert row.r_index > 1.5


def test_clark_evans_coincident_twin(spark):
    """A duplicated location yields NN distance 0 for both twins."""
    from kml2geojson_spark.spatial.ops import clark_evans

    pts = [(1, 0.0, 0.0), (2, 0.0, 0.0), (3, 9.0, 0.0)]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    row = clark_evans(df, 100.0, res=5).collect()[0]
    assert row.n == 3
    assert row.sum_nn_micro == 9_000_000  # 0 + 0 + 9


# ---------------------------------------------------------------------------
# ring_audit
# ---------------------------------------------------------------------------

def _ring_df(spark, rows):
    return spark.createDataFrame(
        rows, "poly_id long, ring array<struct<x double, y double>>")


def test_ring_audit_shoelace_and_orientation(spark):
    from kml2geojson_spark.spatial.ops import ring_audit

    sq_ccw = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    sq_cw_open = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0)]
    tri = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (0.0, 0.0)]
    df = _ring_df(spark, [(1, sq_ccw), (2, sq_cw_open), (3, tri)])
    got = {r.poly_id: r for r in
           ring_audit(df, id_cols=["poly_id"]).collect()}
    s = 10 ** 12  # micro-degree scale squared
    assert (got[1].is_closed, got[1].orientation) == (True, "ccw")
    assert got[1].area2_scaled == 2 * 16 * s
    # open ring: closing edge implied, area still exact
    assert (got[2].is_closed, got[2].orientation) == (False, "cw")
    assert got[2].area2_scaled == -2 * 4 * s
    assert got[3].area2_scaled == 9 * s  # 2 * (3*3/2)
    assert not any(got[i].is_degenerate for i in (1, 2, 3))


def test_ring_audit_degenerates(spark):
    from kml2geojson_spark.spatial.ops import ring_audit

    repeated = [(1.0, 1.0), (1.0, 1.0), (1.0, 1.0)]
    two = [(0.0, 0.0), (1.0, 1.0)]
    collinear = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 0.0)]
    empty: list[tuple[float, float]] = []
    df = _ring_df(spark, [(1, repeated), (2, two), (3, collinear),
                          (4, empty)])
    got = {r.poly_id: r for r in
           ring_audit(df, id_cols=["poly_id"]).collect()}
    for i in (1, 2, 3, 4):
        assert got[i].is_degenerate
        assert got[i].orientation == "degenerate"
    assert got[3].area2_scaled == 0
    assert got[4].n_vertices == 0 and not got[4].is_closed


def test_ring_audit_quantization_closure(spark):
    """Vertices equal only at micro precision still count as closed."""
    from kml2geojson_spark.spatial.ops import ring_audit

    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
            (4e-8, -4e-8)]  # closes within half a micro-degree
    df = _ring_df(spark, [(1, ring)])
    r = ring_audit(df, id_cols=["poly_id"]).collect()[0]
    assert r.is_closed and r.orientation == "ccw"
    assert r.area2_scaled == 2 * 10 ** 12
