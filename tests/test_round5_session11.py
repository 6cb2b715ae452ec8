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


# ---------------------------------------------------------------------------
# image_ahash / image_ahash_pairs
# ---------------------------------------------------------------------------

def _ppm_bytes(px):
    h, w, _ = px.shape
    return bytearray(b"P6\n%d %d\n255\n" % (w, h)
                     + px.astype(np.uint8).tobytes())


def _brute_ahash_bits(px):
    g = px.astype(np.int64).sum(axis=2)
    h, w = g.shape
    bs = g.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    return (bs * 64 >= g.sum()).astype(int).ravel()


def _media_df(spark, imgs):
    from pyspark.sql import Row
    rows = [Row(doc_id=d, media_ref=f"m/{d}", ext="ppm", offset=0,
                content=_ppm_bytes(px)) for d, px in imgs]
    return spark.createDataFrame(
        rows, "doc_id string, media_ref string, ext string, offset int, "
              "content binary")


def test_image_ahash_matches_brute(spark):
    from kml2geojson_spark.multimodal import image_ahash

    rng = np.random.default_rng(41)
    imgs = [(f"d{i}", rng.integers(0, 256, (16, 16, 3)))
            for i in range(6)]
    # a 24x32 image exercises non-square non-16 dims
    imgs.append(("big", rng.integers(0, 256, (24, 32, 3))))
    got = {r.doc_id: r for r in
           image_ahash(_media_df(spark, imgs)).collect()}
    for d, px in imgs:
        bits = _brute_ahash_bits(px)
        for j in range(4):
            want = int((bits[16 * j:16 * j + 16]
                        * (1 << np.arange(16))).sum())
            assert got[d][f"b{j}"] == want, (d, j)


def test_image_ahash_rejects_bad_dims(spark):
    from kml2geojson_spark.multimodal import image_ahash
    import py4j.protocol
    from pyspark.errors import PythonException

    rng = np.random.default_rng(1)
    df = _media_df(spark, [("d0", rng.integers(0, 256, (10, 12, 3)))])
    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError),
                       match="8-divisible"):
        image_ahash(df).collect()


def test_image_ahash_pairs_brute_and_completeness(spark):
    from kml2geojson_spark.multimodal import image_ahash, image_ahash_pairs

    rng = np.random.default_rng(17)
    base = rng.integers(0, 256, (16, 16, 3))
    near = base.copy()
    near[3, 7] = (0, 0, 0)          # near-duplicate (few bits)
    twin = base.copy()              # exact duplicate (hamming 0)
    far = rng.integers(0, 256, (16, 16, 3))
    df = _media_df(spark, [("a", base), ("b", near), ("c", far),
                           ("t", twin)])
    h = image_ahash(df)
    got = {(r.id_a, r.id_b): r.hamming
           for r in image_ahash_pairs(h, max_hamming=3).collect()}
    bits = {d: _brute_ahash_bits(px)
            for d, px in [("a", base), ("b", near), ("c", far),
                          ("t", twin)]}
    ids = sorted(bits)
    want = {}
    for i, x in enumerate(ids):
        for y in ids[i + 1:]:
            ham = int((bits[x] != bits[y]).sum())
            if ham <= 3:
                want[(x, y)] = ham
    assert got == want
    assert ("a", "t") in got and got[("a", "t")] == 0


def test_image_ahash_pairs_threshold_guard(spark):
    from kml2geojson_spark.multimodal import image_ahash_pairs

    df = spark.createDataFrame([("a", 1, 2, 3, 4)],
                               "doc_id string, b0 int, b1 int, "
                               "b2 int, b3 int")
    with pytest.raises(ValueError, match="pigeonhole"):
        image_ahash_pairs(df, max_hamming=4)


# ---------------------------------------------------------------------------
# bootstrap_ci / permutation_test
# ---------------------------------------------------------------------------

def _u52(s):
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16) / 2.0 ** 52


def test_bootstrap_ci_matches_brute(spark):
    from kml2geojson_spark.relational import POISSON1_CDF, bootstrap_ci

    rng = np.random.default_rng(31)
    rows = [(i, int(v)) for i, v in enumerate(rng.integers(0, 1000, 80))]
    df = spark.createDataFrame(rows, "id long, v long")
    B = 50
    got = bootstrap_ci(df, value_col="v", id_col="id",
                       n_resamples=B, alpha_permille=100).collect()[0]

    def draw(u):
        for k, c in enumerate(POISSON1_CDF):
            if u < c:
                return k
        return 7

    means = []
    for b in range(1, B + 1):
        sw = sx = 0
        for i, v in rows:
            w = draw(_u52(f"boot:{i}:{b}"))
            sw += w
            sx += w * v
        if sw > 0:
            means.append(sx / sw)
    means.sort()
    half = math.ceil(len(means) * 100 / 2000.0)
    assert got.n == 80 and got.b_eff == len(means)
    assert got.observed_mean == pytest.approx(
        sum(v for _, v in rows) / 80, rel=1e-12)
    assert got.lo_mean == means[half - 1]
    assert got.hi_mean == means[len(means) - half]
    assert got.lo_mean <= got.observed_mean <= got.hi_mean


def test_bootstrap_ci_validation(spark):
    from kml2geojson_spark.relational import bootstrap_ci

    df = spark.createDataFrame([(1, 1.5)], "id long, v double")
    with pytest.raises(ValueError, match="integerize"):
        bootstrap_ci(df, value_col="v", id_col="id")
    df2 = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError, match="n_resamples"):
        bootstrap_ci(df2, value_col="v", id_col="id", n_resamples=1)
    with pytest.raises(ValueError, match="alpha_permille"):
        bootstrap_ci(df2, value_col="v", id_col="id", alpha_permille=0)


def test_permutation_test_detects_effect_and_null(spark):
    from kml2geojson_spark.relational import permutation_test

    rng = np.random.default_rng(37)
    effect = [(i, "a" if i % 2 else "b",
               int(v) + (60 if i % 2 else 0))
              for i, v in enumerate(rng.integers(0, 50, 300))]
    df = spark.createDataFrame(effect, "id long, g string, v long")
    r = permutation_test(df, value_col="v", group_col="g",
                         group_a="a", group_b="b", id_col="id",
                         n_rounds=99).collect()[0]
    assert r.n_a == 150 and r.n_b == 150
    assert r.p_value == pytest.approx(1 / 100)  # max significance
    assert r.observed_diff > 50

    null = [(i, "a" if i % 2 else "b", int(v))
            for i, v in enumerate(rng.integers(0, 50, 300))]
    df0 = spark.createDataFrame(null, "id long, g string, v long")
    r0 = permutation_test(df0, value_col="v", group_col="g",
                          group_a="a", group_b="b", id_col="id",
                          n_rounds=99).collect()[0]
    assert r0.p_value > 0.05


def test_permutation_test_matches_brute(spark):
    from kml2geojson_spark.relational import permutation_test

    rng = np.random.default_rng(43)
    rows = [(i, "a" if i < 20 else "b", int(v))
            for i, v in enumerate(rng.integers(0, 100, 50))]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    R = 40
    got = permutation_test(df, value_col="v", group_col="g",
                           group_a="a", group_b="b", id_col="id",
                           n_rounds=R).collect()[0]
    n_a = 20
    n = len(rows)
    pa = n_a / n
    sa = sum(v for i, g, v in rows if g == "a")
    sb = sum(v for i, g, v in rows if g == "b")
    d_obs = sa / n_a - sb / (n - n_a)
    extreme = r_eff = 0
    for r in range(1, R + 1):
        ga = [v for i, g, v in rows if _u52(f"perm:{i}:{r}") < pa]
        gb = [v for i, g, v in rows if not _u52(f"perm:{i}:{r}") < pa]
        if not ga or not gb:
            continue
        r_eff += 1
        d = sum(ga) / len(ga) - sum(gb) / len(gb)
        if abs(d) >= abs(d_obs):
            extreme += 1
    assert got.observed_diff == pytest.approx(d_obs, rel=1e-12)
    assert (got.r_eff, got.n_extreme) == (r_eff, extreme)
    assert got.p_value == pytest.approx((1 + extreme) / (r_eff + 1))


def test_permutation_test_validation(spark):
    from kml2geojson_spark.relational import permutation_test

    df = spark.createDataFrame([(1, "a", 1)], "id long, g string, v long")
    with pytest.raises(ValueError, match="differ"):
        permutation_test(df, value_col="v", group_col="g",
                         group_a="a", group_b="a", id_col="id")
    with pytest.raises(ValueError, match="n_rounds"):
        permutation_test(df, value_col="v", group_col="g",
                         group_a="a", group_b="b", id_col="id",
                         n_rounds=0)


# ---------------------------------------------------------------------------
# line_interpolate / discrete_hausdorff
# ---------------------------------------------------------------------------

def test_line_interpolate_known_points(spark):
    from kml2geojson_spark.spatial.ops import line_interpolate

    rows = [
        (1, [(0.0, 0.0), (10.0, 0.0)], 0.5),           # midpoint
        (2, [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)], 0.75),  # corner walk
        (3, [(0.0, 0.0), (0.0, 0.0), (2.0, 0.0)], 0.0),   # zero-len seg
        (4, [(1.0, 2.0)], 0.5),                        # single vertex
        (5, [(0.0, 0.0), (3.0, 4.0)], 1.0),            # exact endpoint
        (6, [], 0.3),                                  # empty
        (7, [(2.0, 2.0), (6.0, 2.0)], 1.7),            # clamped to 1
        (8, [(2.0, 2.0), (6.0, 2.0)], -0.4),           # clamped to 0
    ]
    df = spark.createDataFrame(
        rows, "line_id long, line array<struct<x double, y double>>, "
              "frac double")
    got = {r.line_id: r for r in
           line_interpolate(df, id_cols=["line_id"]).collect()}
    want = {1: (5.0, 0.0), 2: (4.0, 2.0), 3: (0.0, 0.0),
            4: (1.0, 2.0), 5: (3.0, 4.0), 7: (6.0, 2.0),
            8: (2.0, 2.0)}
    for lid, (x, y) in want.items():
        assert got[lid].px_micro == round(x * 1e6), lid
        assert got[lid].py_micro == round(y * 1e6), lid
    assert got[6].px_micro is None and got[6].py_micro is None
    assert got[1].total_len_micro == 10_000_000
    assert got[2].total_len_micro == 8_000_000


def test_line_interpolate_matches_brute_sweep(spark):
    """Random polylines x a fraction sweep against a numpy oracle."""
    from kml2geojson_spark.spatial.ops import line_interpolate

    rng = np.random.default_rng(51)
    rows, brute = [], {}
    lid = 0
    for _ in range(12):
        nv = int(rng.integers(2, 7))
        vs = [(float(x), float(y))
              for x, y in rng.uniform(-50, 50, (nv, 2))]
        for frac in (0.0, 0.33, 0.5, 0.9, 1.0):
            rows.append((lid, vs, frac))
            lms = [math.floor(math.hypot(x1 - x0, y1 - y0) * 1e6 + 0.5)
                   for (x0, y0), (x1, y1) in zip(vs, vs[1:])]
            total = sum(lms)
            target = math.floor(frac * float(total))
            cum, px, py = 0, vs[0][0], vs[0][1]
            for (x0, y0), (x1, y1), lm in zip(vs, vs[1:], lms):
                if lm > 0 and cum + lm >= target:
                    t = float(target - cum) / float(lm)
                    px, py = x0 + t * (x1 - x0), y0 + t * (y1 - y0)
                    break
                cum += lm
            brute[lid] = (total, math.floor(px * 1e6 + 0.5),
                          math.floor(py * 1e6 + 0.5))
            lid += 1
    df = spark.createDataFrame(
        rows, "line_id long, line array<struct<x double, y double>>, "
              "frac double")
    got = {r.line_id: (r.total_len_micro, r.px_micro, r.py_micro)
           for r in line_interpolate(df, id_cols=["line_id"]).collect()}
    assert got == brute


def test_discrete_hausdorff_brute(spark):
    from kml2geojson_spark.spatial.ops import discrete_hausdorff

    rng = np.random.default_rng(61)
    rows, brute = [], {}
    for p in range(15):
        na, nb = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        A = [(float(x), float(y)) for x, y in rng.uniform(-20, 20, (na, 2))]
        B = [(float(x), float(y)) for x, y in rng.uniform(-20, 20, (nb, 2))]
        rows.append((p, A, B))
        h_ab = max(min((ax - bx) ** 2 + (ay - by) ** 2
                       for bx, by in B) for ax, ay in A)
        h_ba = max(min((ax - bx) ** 2 + (ay - by) ** 2
                       for ax, ay in A) for bx, by in B)
        brute[p] = math.floor(math.sqrt(max(h_ab, h_ba)) * 1e6 + 0.5)
    df = spark.createDataFrame(
        rows, "pid long, line_a array<struct<x double, y double>>, "
              "line_b array<struct<x double, y double>>")
    got = {r.pid: r.hausdorff_micro
           for r in discrete_hausdorff(df, id_cols=["pid"]).collect()}
    assert got == brute


def test_discrete_hausdorff_properties(spark):
    from kml2geojson_spark.spatial.ops import discrete_hausdorff

    # identical lines -> 0; empty side -> NULL; asymmetric h matters
    a = [(0.0, 0.0), (5.0, 0.0)]
    spread = [(0.0, 0.0), (5.0, 0.0), (5.0, 12.0)]
    rows = [(1, a, list(a)), (2, a, []), (3, a, spread), (4, spread, a)]
    df = spark.createDataFrame(
        rows, "pid long, line_a array<struct<x double, y double>>, "
              "line_b array<struct<x double, y double>>")
    got = {r.pid: r.hausdorff_micro
           for r in discrete_hausdorff(df, id_cols=["pid"]).collect()}
    assert got[1] == 0
    assert got[2] is None
    # symmetric by definition: max of both directed distances
    assert got[3] == got[4] == 12_000_000


# ---------------------------------------------------------------------------
# plan-shape assertions for the session-11 operators (100-TB visibility)
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ripley_k_plan_no_cartesian(spark):
    """The pair stage must be the k-ring equi-join, never all-pairs."""
    from kml2geojson_spark.spatial.ops import ripley_k

    pts = spark.createDataFrame(
        [(i, float(i % 9), float(i % 7)) for i in range(50)],
        "point_id long, x double, y double")
    plan = _plan(ripley_k(pts, [1.0, 2.0], 400.0, res=4))
    assert "CartesianProduct" not in plan, plan
    # the candidate stage is a cell_id equi-join (k-ring DWithin);
    # the only nested-loop node is the deliberate 1-row x 1-row
    # scalar combine of (n) with the per-radius sums
    assert "cell_id" in plan and (
        "SortMergeJoin [cell_id" in plan
        or "ShuffledHashJoin [cell_id" in plan
        or "BroadcastHashJoin [cell_id" in plan), plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_image_ahash_pairs_plan_band_equi_join(spark):
    """Candidates come from a hash equi-join on (band_idx, band_val)."""
    from kml2geojson_spark.multimodal import image_ahash_pairs

    h = spark.createDataFrame(
        [(f"d{i}", i % 7, i % 5, i % 3, i % 2) for i in range(20)],
        "doc_id string, b0 int, b1 int, b2 int, b3 int")
    plan = _plan(image_ahash_pairs(h, max_hamming=3))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bootstrap_and_linear_ops_no_python_nodes(spark):
    """bootstrap_ci / theil_sen / line_interpolate stay JVM-side —
    no Python eval node anywhere in the plan."""
    from kml2geojson_spark.relational import bootstrap_ci, theil_sen
    from kml2geojson_spark.spatial.ops import line_interpolate

    ev = spark.createDataFrame([(i, i % 13) for i in range(40)],
                               "id long, v long")
    lines = spark.createDataFrame(
        [(1, [(0.0, 0.0), (3.0, 4.0)], 0.5)],
        "line_id long, line array<struct<x double, y double>>, "
        "frac double")
    ts = spark.createDataFrame([("a", 1, 2), ("a", 2, 4)],
                               "g string, t long, v long")
    for df in (bootstrap_ci(ev, value_col="v", id_col="id",
                            n_resamples=10),
               theil_sen(ts, value_col="v", t_col="t",
                         group_cols=["g"]),
               line_interpolate(lines, id_cols=["line_id"])):
        plan = _plan(df)
        for marker in ("ArrowEvalPython", "BatchEvalPython",
                       "MapInPandas", "PythonMapInArrow"):
            assert marker not in plan, f"{marker} in plan"


# ---------------------------------------------------------------------------
# hodges_lehmann / siegel_slope
# ---------------------------------------------------------------------------

def test_hodges_lehmann_matches_brute(spark):
    from kml2geojson_spark.relational import hodges_lehmann

    rng = np.random.default_rng(71)
    rows, expect = [], {}
    for g in range(6):
        n = int(rng.integers(1, 15))
        xs = [int(v) for v in rng.integers(-500, 500, n)]
        ws = sorted((a + b) / 2 for i, a in enumerate(xs)
                    for b in xs[i:])
        expect[f"g{g}"] = (len(ws), ws[(len(ws) + 1) // 2 - 1])
        rows += [(f"g{g}", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = {r.g: (r.n_pairs, r.hl_estimate)
           for r in hodges_lehmann(df, value_col="v", order_cols="o",
                                   group_cols=["g"]).collect()}
    assert got == expect


def test_hodges_lehmann_outlier_robust(spark):
    from kml2geojson_spark.relational import hodges_lehmann

    rows = [("a", i, 100) for i in range(9)] + [("a", 9, 10 ** 9)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    r = hodges_lehmann(df, value_col="v", order_cols="o",
                       group_cols=["g"]).collect()[0]
    assert r.hl_estimate == 100.0  # one wild point cannot move it


def test_siegel_slope_breakdown_beats_theil_sen(spark):
    """~45% corrupted points: Siegel still reads slope 3, while the
    Theil-Sen pairwise median is dragged away (its breakdown is
    ~29%)."""
    from kml2geojson_spark.relational import siegel_slope, theil_sen

    rows = [("s", t, 3 * t) for t in range(1, 12)] + \
           [("s", t, -7000 - 100 * t) for t in range(12, 21)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    sg = siegel_slope(df, value_col="v", t_col="t",
                      group_cols=["g"]).collect()[0]
    ts = theil_sen(df, value_col="v", t_col="t",
                   group_cols=["g"]).collect()[0]
    assert sg.slope == pytest.approx(3.0)
    assert abs(ts.slope - 3.0) > 10  # corrupted beyond breakdown


def test_siegel_slope_matches_brute(spark):
    from kml2geojson_spark.relational import siegel_slope

    rng = np.random.default_rng(83)
    rows, expect = [], {}
    for g in range(5):
        n = int(rng.integers(2, 10))
        ts_ = sorted(rng.choice(100, size=n, replace=False).tolist())
        xs = [int(v) for v in rng.integers(-100, 100, n)]
        mis = []
        for i in range(n):
            ss = sorted((xs[j] - xs[i]) / (ts_[j] - ts_[i])
                        for j in range(n) if ts_[j] != ts_[i])
            if ss:
                mis.append(ss[(len(ss) + 1) // 2 - 1])
        mis.sort()
        expect[f"g{g}"] = (len(mis), mis[(len(mis) + 1) // 2 - 1])
        rows += [(f"g{g}", t, x) for t, x in zip(ts_, xs)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = {r.g: (r.n_points, r.slope)
           for r in siegel_slope(df, value_col="v", t_col="t",
                                 group_cols=["g"]).collect()}
    assert got == expect


def test_robust_estimators_reject_float_columns(spark):
    from kml2geojson_spark.relational import hodges_lehmann, siegel_slope

    df = spark.createDataFrame([("a", 1, 1.5)], "g string, t long, v double")
    with pytest.raises(ValueError, match="integerize"):
        hodges_lehmann(df, value_col="v", order_cols="t",
                       group_cols=["g"])
    with pytest.raises(ValueError, match="integerize"):
        siegel_slope(df, value_col="v", t_col="t", group_cols=["g"])


# ---------------------------------------------------------------------------
# spherical_polygon_area
# ---------------------------------------------------------------------------

def test_spherical_area_matches_band_formula(spark):
    """1-degree quads vs the exact spherical band area
    R^2 * dlon * (sin lat2 - sin lat1)."""
    from kml2geojson_spark.spatial.ops import (EARTH_RADIUS_M,
                                               spherical_polygon_area)

    R = EARTH_RADIUS_M
    k = math.pi / 180.0
    quads = [(1, 0.0, 0.0), (2, 40.0, 59.5), (3, -120.0, -80.0)]
    rows = [(pid, [(lon, lat), (lon + 1, lat), (lon + 1, lat + 1),
                   (lon, lat + 1), (lon, lat)])
            for pid, lon, lat in quads]
    df = spark.createDataFrame(
        rows, "pid long, ring array<struct<x double, y double>>")
    got = {r.pid: r.area_m2 for r in
           spherical_polygon_area(df, id_cols=["pid"]).collect()}
    for pid, lon, lat in quads:
        exact = R * R * (1 * k) * (math.sin((lat + 1) * k)
                                   - math.sin(lat * k))
        assert got[pid] == pytest.approx(exact, rel=1e-6), pid
    # high latitude really is smaller: the planar shoelace cannot
    # see this (all three quads are 1 deg^2 planar)
    assert got[2] < got[1] * 0.55
    assert got[3] < got[1] * 0.2


def test_spherical_area_antimeridian_and_orientation(spark):
    from kml2geojson_spark.spatial.ops import spherical_polygon_area

    cross = [(179.5, 0.0), (-179.5, 0.0), (-179.5, 1.0), (179.5, 1.0)]
    same_cw = list(reversed(cross))
    df = spark.createDataFrame(
        [(1, cross), (2, same_cw),
         (3, [(5.0, 5.0), (5.0, 5.0), (5.0, 5.0)]), (4, [])],
        "pid long, ring array<struct<x double, y double>>")
    got = {r.pid: r.area_m2 for r in
           spherical_polygon_area(df, id_cols=["pid"]).collect()}
    assert got[1] > 1e10           # ~12,300 km^2 in m^2
    assert got[1] == got[2]        # |area| orientation-independent
    assert got[3] == 0 and got[4] == 0
