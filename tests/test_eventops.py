"""Event analytics (funnels, OD matrix, cohorts, outliers) and the
relational skyline vs driver-side brute-force oracles."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from kml2geojson_spark.eventops import (cohort_retention, funnel_counts,
                                        group_outlier_stats, od_matrix)
from kml2geojson_spark.relational import skyline2d


def _ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp_ntz, value double")


# ---------------------------------------------------------------------------
# funnel_counts
# ---------------------------------------------------------------------------

def test_funnel_hand_example(spark):
    rows = [
        # user 1 completes view -> click -> buy in order
        (1, 1, "view", _ts(1), 0.0), (2, 1, "click", _ts(2), 0.0),
        (3, 1, "buy", _ts(3), 0.0),
        # user 2: click BEFORE view, never re-clicks -> stops at view
        (4, 2, "click", _ts(1), 0.0), (5, 2, "view", _ts(2), 0.0),
        (6, 2, "buy", _ts(3), 0.0),
        # user 3: view only
        (7, 3, "view", _ts(1), 0.0),
        # user 4: click at the SAME timestamp as view -> strictly-after
        # rule: click does not count
        (8, 4, "view", _ts(5), 0.0), (9, 4, "click", _ts(5), 0.0),
    ]
    got = {r["stage"]: r["n_users"]
           for r in funnel_counts(_events(spark, rows),
                                  ["view", "click", "buy"]).collect()}
    assert got == {"view": 4, "click": 1, "buy": 1}


def test_funnel_greedy_earliest_completion(spark):
    # The greedy rule uses the EARLIEST qualifying event per stage:
    # view@1, click@2 (not click@9), buy@5 -> completes.
    rows = [(1, 1, "view", _ts(1), 0.0), (2, 1, "click", _ts(2), 0.0),
            (3, 1, "click", _ts(9), 0.0), (4, 1, "buy", _ts(5), 0.0)]
    got = {r["stage"]: r["n_users"]
           for r in funnel_counts(_events(spark, rows),
                                  ["view", "click", "buy"]).collect()}
    assert got == {"view": 1, "click": 1, "buy": 1}


def test_funnel_random_vs_bruteforce(spark):
    rng = random.Random(7)
    stages = ["a", "b", "c"]
    rows = []
    eid = 0
    for user in range(40):
        for _ in range(rng.randrange(0, 12)):
            rows.append((eid, user, rng.choice(stages + ["x"]),
                         _ts(1 + rng.randrange(20), rng.randrange(50)),
                         0.0))
            eid += 1

    def brute(user_rows):
        reached = None
        depth = 0
        for stage in stages:
            cand = [ts for (_, _, t, ts, _) in user_rows
                    if t == stage and (reached is None or ts > reached)]
            if not cand:
                break
            reached = min(cand)
            depth += 1
        return depth

    by_user = {}
    for r in rows:
        by_user.setdefault(r[1], []).append(r)
    want = {i: 0 for i in range(len(stages))}
    for ur in by_user.values():
        for i in range(brute(ur)):
            want[i] += 1
    got = {r["stage_idx"]: r["n_users"]
           for r in funnel_counts(_events(spark, rows), stages).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# od_matrix
# ---------------------------------------------------------------------------

def test_od_matrix_hand_example(spark):
    pts = spark.createDataFrame(
        [(1, 1, 0.5, 0.5), (2, 1, 1.5, 0.5), (3, 1, 1.7, 0.4),
         (4, 2, 0.1, 0.1)],
        "event_id long, user_id long, x double, y double")
    got = {(r["from_cx"], r["from_cy"], r["to_cx"], r["to_cy"]): r["n_trips"]
           for r in od_matrix(pts).collect()}
    # user 1: (0,0)->(1,0) then (1,0)->(1,0) self-loop; user 2: no trips
    assert got == {(0, 0, 1, 0): 1, (1, 0, 1, 0): 1}


def test_od_matrix_negative_coords_floor(spark):
    pts = spark.createDataFrame(
        [(1, 1, -0.5, -0.5), (2, 1, 0.5, 0.5)],
        "event_id long, user_id long, x double, y double")
    got = od_matrix(pts).collect()
    assert [(r["from_cx"], r["from_cy"], r["to_cx"], r["to_cy"])
            for r in got] == [(-1, -1, 0, 0)]


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------

def test_cohort_retention_hand_example(spark):
    rows = [
        (1, 1, "e", _ts(1), 0.0),   # day 0 -> cohort 0
        (2, 1, "e", _ts(9), 0.0),   # day 8 -> offset 1
        (3, 1, "e", _ts(10), 0.0),  # day 9 -> offset 1 (same, distinct user)
        (4, 2, "e", _ts(8), 0.0),   # day 7 -> cohort 1
        (5, 2, "e", _ts(29), 0.0),  # day 28 -> offset 3
    ]
    got = {(r["cohort_period"], r["period_offset"]): r["n_users"]
           for r in cohort_retention(_events(spark, rows)).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 3): 1}


def test_cohort_retention_random_vs_bruteforce(spark):
    rng = random.Random(11)
    rows = [(i, rng.randrange(25), "e",
             _ts(1 + rng.randrange(28), rng.randrange(60)), 0.0)
            for i in range(300)]
    first = {}
    for (_, u, _, ts, _) in rows:
        d = (ts.date() - dt.date(2024, 1, 1)).days
        first[u] = min(first.get(u, d), d)
    want = {}
    for (_, u, _, ts, _) in rows:
        d = (ts.date() - dt.date(2024, 1, 1)).days
        key = (first[u] // 7, d // 7 - first[u] // 7)
        want.setdefault(key, set()).add(u)
    want = {k: len(v) for k, v in want.items()}
    got = {(r["cohort_period"], r["period_offset"]): r["n_users"]
           for r in cohort_retention(_events(spark, rows)).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# group_outlier_stats
# ---------------------------------------------------------------------------

def test_group_outliers_vs_bruteforce(spark):
    rng = random.Random(3)
    rows = []
    for i in range(400):
        grp = rng.choice(["a", "b", "c"])
        v = round(rng.uniform(0, 100), 2)
        if rng.random() < 0.03:
            v = round(rng.uniform(500, 900), 2)  # planted outliers
        rows.append((i, 0, grp, _ts(1), v))
    df = _events(spark, rows)
    got = {r["group"]: (r["n"], r["mean_milli"], r["n_outliers"])
           for r in group_outlier_stats(df, group_col="event_type",
                                        value_col="value").collect()}
    by_grp = {}
    for (_, _, g, _, v) in rows:
        by_grp.setdefault(g, []).append(round(v * 1000))
    for g, vs in by_grp.items():
        n = len(vs)
        mean = sum(vs) // n
        var = sum(v * v for v in vs) // n - mean * mean
        n_out = sum(1 for v in vs
                    if (v - mean) * (v - mean) * 1_000_000 > 2000 * 2000 * var)
        assert got[g] == (n, mean, n_out), g
        assert n_out >= 1  # the planted outliers are detected


def test_group_outliers_constant_group_has_none(spark):
    rows = [(i, 0, "k", _ts(1), 5.0) for i in range(10)]
    got = group_outlier_stats(_events(spark, rows)).collect()
    assert got[0]["n_outliers"] == 0 and got[0]["mean_milli"] == 5000


# ---------------------------------------------------------------------------
# skyline2d
# ---------------------------------------------------------------------------

def _brute_skyline(pts):
    pts = set(pts)
    out = set()
    for p in pts:
        dominated = any(q[0] <= p[0] and q[1] <= p[1] and q != p
                        for q in pts)
        if not dominated:
            out.add(p)
    return out


def test_skyline_hand_example(spark):
    pts = [(1, 9), (2, 7), (3, 8), (4, 4), (5, 5), (4, 4), (9, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]) for r in skyline2d(df).collect()}
    assert got == {(1, 9), (2, 7), (4, 4), (9, 1)}


def test_skyline_random_vs_bruteforce_and_bucket_invariance(spark):
    rng = random.Random(5)
    pts = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(800)]
    df = spark.createDataFrame(pts, "x long, y long").repartition(7)
    want = _brute_skyline(pts)
    for nb in (1, 4, 64):
        got = {(r["x"], r["y"])
               for r in skyline2d(df, n_buckets=nb).collect()}
        assert got == want, nb


def test_skyline_duplicate_only_point_survives(spark):
    df = spark.createDataFrame([(3, 3), (3, 3)], "x long, y long")
    assert [(r["x"], r["y"]) for r in skyline2d(df).collect()] == [(3, 3)]


def test_skyline_ties_on_one_axis(spark):
    # (2,5) dominates (2,8) (tie x, strict y); (1,5) dominates (2,5).
    df = spark.createDataFrame([(2, 8), (2, 5), (1, 5)], "x long, y long")
    got = {(r["x"], r["y"]) for r in skyline2d(df).collect()}
    assert got == {(1, 5)}


def test_skyline_doubles(spark):
    pts = [(0.5, 2.5), (0.6, 2.4), (0.5, 2.4), (10.0, 0.1)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {(r["x"], r["y"]) for r in skyline2d(df, n_buckets=8).collect()}
    assert got == {(0.5, 2.4), (10.0, 0.1)}


def test_touch_attribution_hand_case(spark):
    from kml2geojson_spark.eventops import touch_attribution
    T = dt.datetime
    rows = [
        # user 1: view(1) click(2) purchase(3) click(4) purchase(5)
        (1, T(2024, 1, 1, 10), 1, "view"),
        (2, T(2024, 1, 1, 11), 1, "click"),
        (3, T(2024, 1, 1, 12), 1, "purchase"),
        (4, T(2024, 1, 1, 13), 1, "click"),
        (5, T(2024, 1, 1, 14), 1, "purchase"),
        # user 2: purchase with NO preceding touch (error ignored)
        (6, T(2024, 1, 1, 9), 2, "error"),
        (7, T(2024, 1, 1, 10), 2, "purchase"),
        # user 3: equal-ts touch BEFORE (id 8 < 9) and AFTER (id 10)
        (8, T(2024, 1, 2, 10), 3, "click"),
        (9, T(2024, 1, 2, 10), 3, "purchase"),
        (10, T(2024, 1, 2, 10), 3, "view"),
    ]
    df = spark.createDataFrame(rows,
                               "event_id long, ts timestamp, "
                               "user_id long, event_type string")
    out = {r["conversion_id"]: r for r in touch_attribution(
        df, conversion_type="purchase",
        touch_types=["view", "click"]).collect()}
    assert len(out) == 4
    assert (out[3]["first_type"], out[3]["first_id"]) == ("view", 1)
    assert (out[3]["last_type"], out[3]["last_id"]) == ("click", 2)
    assert (out[5]["first_id"], out[5]["last_id"]) == (1, 4)
    assert out[7]["first_type"] is None and out[7]["last_id"] is None
    # strict (ts, id) order: id 8 attributes, id 10 does not
    assert (out[9]["first_id"], out[9]["last_id"]) == (8, 8)


def test_touch_attribution_brute_force(spark):
    from kml2geojson_spark.eventops import touch_attribution
    rng = random.Random(7)
    types = ["view", "click", "purchase", "error"]
    rows = [(i, dt.datetime(2024, 1, 1) +
             dt.timedelta(hours=rng.randrange(24)),  # heavy ts ties
             rng.randrange(6), rng.choice(types)) for i in range(400)]
    df = spark.createDataFrame(rows,
                               "event_id long, ts timestamp, "
                               "user_id long, event_type string")
    got = {r["conversion_id"]:
           (r["first_type"], r["first_id"], r["last_type"], r["last_id"])
           for r in touch_attribution(
               df, conversion_type="purchase",
               touch_types=["view", "click"]).collect()}
    expect = {}
    for (cid, cts, cu, ctyp) in rows:
        if ctyp != "purchase":
            continue
        cand = sorted((ts, i, ty) for (i, ts, u, ty) in rows
                      if u == cu and ty in ("view", "click")
                      and (ts, i) < (cts, cid))
        if cand:
            expect[cid] = (cand[0][2], cand[0][1],
                           cand[-1][2], cand[-1][1])
        else:
            expect[cid] = (None, None, None, None)
    assert got == expect
