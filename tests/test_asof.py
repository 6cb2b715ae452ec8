"""As-of join: semantics (backward match, exact-match inclusion,
unmatched-left nulls, tie-break on equal timestamps), self-source
robustness, and a brute-force oracle over a random corpus."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from kml2geojson_spark.asof import asof_join


def _mk(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def test_asof_basic_backward(spark):
    left = _mk(spark, [(1, 10, pd.Timestamp("2024-01-02")),
                       (2, 10, pd.Timestamp("2024-01-05")),
                       (3, 20, pd.Timestamp("2024-01-03"))],
               ["lid", "k", "ts"])
    right = _mk(spark, [(10, pd.Timestamp("2024-01-01"), 100),
                        (10, pd.Timestamp("2024-01-04"), 101)],
                ["k", "ts", "rid"])
    out = {r["lid"]: r for r in
           asof_join(left, right, key="k", left_ts="ts", right_ts="ts")
           .collect()}
    assert out[1]["r_rid"] == 100
    assert out[2]["r_rid"] == 101
    assert out[3]["r_rid"] is None and out[3]["r_ts"] is None


def test_asof_exact_match_and_ties(spark):
    t = pd.Timestamp("2024-01-02")
    left = _mk(spark, [(1, 7, t)], ["lid", "k", "ts"])
    # two right rows at the exact left timestamp: the greater rid wins
    right = _mk(spark, [(7, t, 50), (7, t, 51),
                        (7, pd.Timestamp("2024-01-01"), 49)],
                ["k", "ts", "rid"])
    row = asof_join(left, right, key="k", left_ts="ts",
                    right_ts="ts").collect()[0]
    assert row["r_rid"] == 51


def test_asof_self_source(spark, tmp_path):
    """Both sides filtered from ONE scan (shared attribute ids) — the
    projection-dedup trap that bites naive cogroup implementations."""
    pdf = pd.DataFrame({
        "event_id": range(8),
        "k": [1, 1, 1, 1, 2, 2, 2, 2],
        "ts": pd.to_datetime(
            ["2024-01-0%d" % d for d in (1, 2, 3, 4, 1, 2, 3, 4)]),
        "typ": ["a", "b", "a", "b", "b", "a", "b", "a"],
    })
    path = str(tmp_path / "ev.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    e = spark.read.parquet(path)
    lhs = e.where(F.col("typ") == "b").select(
        F.col("event_id").alias("lid"), "k", "ts")
    rhs = e.where(F.col("typ") == "a").select(
        "k", "ts", F.col("event_id").alias("rid"))
    out = {r["lid"]: r["r_rid"] for r in
           asof_join(lhs, rhs, key="k", left_ts="ts", right_ts="ts")
           .collect()}
    assert out == {1: 0, 3: 2, 4: None, 6: 5}


def test_asof_oracle_random(spark):
    """Randomized corpus vs a pandas groupby brute force."""
    import numpy as np
    rng = np.random.default_rng(11)
    n_l, n_r = 300, 300
    lpdf = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, 12, n_l),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="m"),
    })
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 12, n_r),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="m"),
        "rid": np.arange(n_r),
    })
    out = asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
                    key="k", left_ts="ts", right_ts="ts").toPandas()

    def brute(row):
        cand = rpdf[(rpdf["k"] == row["k"]) & (rpdf["ts"] <= row["ts"])]
        if len(cand) == 0:
            return None
        best = cand.sort_values(["ts", "rid"]).iloc[-1]
        return int(best["rid"])

    expect = {int(r["lid"]): brute(r) for _, r in lpdf.iterrows()}
    got = {int(r["lid"]): (None if pd.isna(r["r_rid"]) else int(r["r_rid"]))
           for _, r in out.iterrows()}
    assert len(out) == n_l
    assert got == expect


def test_asof_null_timestamps_and_double_nulls(spark):
    """SQL null semantics: null left ts matches nothing but survives;
    null right ts never matches; unmatched double/int right columns are
    true NULLs, not NaN."""
    import math
    left = _mk(spark, [(1, 7, pd.Timestamp("2024-01-02")),
                       (2, 7, pd.NaT),
                       (3, 8, pd.Timestamp("2024-01-02"))],
               ["lid", "k", "ts"])
    right = _mk(spark, [(7, pd.Timestamp("2024-01-01"), 50, 1.5),
                        (7, pd.NaT, 99, 9.9),
                        (8, pd.Timestamp("2024-01-03"), 60, 2.5)],
                ["k", "ts", "rid", "score"])
    rows = {r["lid"]: r for r in
            asof_join(left, right, key="k", left_ts="ts",
                      right_ts="ts").collect()}
    assert len(rows) == 3
    assert rows[1]["r_rid"] == 50 and rows[1]["r_score"] == 1.5
    # null left ts: unmatched, all right cols NULL (not NaN)
    assert rows[2]["r_rid"] is None and rows[2]["r_score"] is None
    assert rows[2]["r_ts"] is None
    # right row exists but only at a LATER ts: unmatched
    assert rows[3]["r_rid"] is None and rows[3]["r_score"] is None
    for r in rows.values():
        assert r["r_score"] is None or not math.isnan(r["r_score"])


def test_asof_null_keys_and_matched_null_double(spark):
    """NULL keys never match (SQL semantics) even against NULL-key
    right rows; a MATCHED right row's genuine NULL double stays NULL
    (not NaN)."""
    import math
    left = _mk(spark, [(1, None, pd.Timestamp("2024-01-02")),
                       (2, 7, pd.Timestamp("2024-01-02"))],
               ["lid", "k", "ts"])
    right = _mk(spark, [(None, pd.Timestamp("2024-01-01"), 50, 1.5),
                        (7, pd.Timestamp("2024-01-01"), 60, None)],
                ["k", "ts", "rid", "score"])
    rows = {r["lid"]: r for r in
            asof_join(left, right, key="k", left_ts="ts",
                      right_ts="ts").collect()}
    assert len(rows) == 2
    # NULL key: unmatched even though a NULL-key right row exists
    assert rows[1]["r_rid"] is None and rows[1]["r_score"] is None
    # matched row with genuinely NULL double: NULL, not NaN
    assert rows[2]["r_rid"] == 60
    assert rows[2]["r_score"] is None


def test_asof_float_timestamp_misses_are_null(spark):
    """right_ts as a DOUBLE column: a miss reaches pandas as NaN (not
    NULL), so miss detection must come from the explicit matched flag —
    unmatched right doubles (including r_ts itself) must be true NULLs."""
    import math
    left = _mk(spark, [(1, 7, 5.0), (2, 7, 0.5), (3, 9, 3.0)],
               ["lid", "k", "ts"])
    right = _mk(spark, [(7, 1.0, 50, 1.5), (7, 4.0, 51, 2.5)],
                ["k", "ts", "rid", "score"])
    rows = {r["lid"]: r for r in
            asof_join(left, right, key="k", left_ts="ts",
                      right_ts="ts").collect()}
    assert len(rows) == 3
    assert rows[1]["r_rid"] == 51 and rows[1]["r_ts"] == 4.0
    # left ts BEFORE any right ts: unmatched — every right col NULL
    assert rows[2]["r_rid"] is None and rows[2]["r_ts"] is None
    assert rows[2]["r_score"] is None
    # key with no right rows at all: unmatched
    assert rows[3]["r_rid"] is None and rows[3]["r_ts"] is None
    for r in rows.values():
        for c in ("r_ts", "r_score"):
            assert r[c] is None or not math.isnan(r[c])


def test_asof_column_collision_raises(spark):
    """A left column named like a prefixed right column must be
    rejected up front, not crash with KeyError inside a task."""
    left = _mk(spark, [(1, 7, 1.0, 9)], ["lid", "k", "ts", "r_rid"])
    right = _mk(spark, [(7, 1.0, 50)], ["k", "ts", "rid"])
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, key="k", left_ts="ts", right_ts="ts")


def test_asof_isnull_flag_collision_raises(spark):
    """A left column colliding with an internal __isnull_* flag name
    must be rejected up front."""
    left = _mk(spark, [(1, 7, 1.0, True)],
               ["lid", "k", "ts", "__isnull_r_score"])
    right = _mk(spark, [(7, 1.0, 2.5)], ["k", "ts", "score"])
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, key="k", left_ts="ts", right_ts="ts")


def test_asof_nearest_hand_cases(spark):
    """Pinned nearest semantics: min |r.ts - l.ts|; exact distance tie
    -> the BACKWARD (earlier) row; equal right timestamps -> SMALLEST
    remaining right columns in BOTH directions."""
    base = pd.Timestamp("2024-01-10")
    day = pd.Timedelta(days=1)
    left = _mk(spark, [(1, 7, base),            # tie: -2d vs +2d
                       (2, 7, base + 5 * day),  # forward only closer
                       (3, 9, base)],           # no right rows for key
               ["lid", "k", "ts"])
    right = _mk(spark, [(7, base - 2 * day, 50),
                        (7, base + 2 * day, 60),
                        (7, base + 6 * day, 70),
                        (7, base + 6 * day, 71)],  # equal-ts pair
                ["k", "ts", "rid"])
    out = {r["lid"]: r for r in
           asof_join(left, right, key="k", left_ts="ts", right_ts="ts",
                     direction="nearest").collect()}
    assert out[1]["r_rid"] == 50          # distance tie -> backward
    assert out[2]["r_rid"] == 70          # forward win, smallest rid
    assert out[3]["r_rid"] is None and out[3]["r_ts"] is None

    # equal-ts tie on a BACKWARD win must also take the smallest rid
    left2 = _mk(spark, [(1, 7, base + 7 * day)], ["lid", "k", "ts"])
    row = asof_join(left2, right, key="k", left_ts="ts", right_ts="ts",
                    direction="nearest").collect()[0]
    assert row["r_rid"] == 70


def test_asof_nearest_oracle_random(spark):
    """Randomized corpus (coarse timestamps so distance/ts ties are
    common) vs the SQL-rule brute force: ORDER BY abs ASC, ts ASC,
    rid ASC."""
    import numpy as np
    rng = np.random.default_rng(23)
    n_l, n_r = 300, 300
    lpdf = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, 10, n_l),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 40, n_l), unit="h"),
    })
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 10, n_r),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 40, n_r), unit="h"),
        "rid": np.arange(n_r),
    })
    out = asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
                    key="k", left_ts="ts", right_ts="ts",
                    direction="nearest").toPandas()

    def brute(row):
        cand = rpdf[rpdf["k"] == row["k"]].copy()
        if len(cand) == 0:
            return None
        cand["d"] = (cand["ts"] - row["ts"]).abs()
        best = cand.sort_values(["d", "ts", "rid"]).iloc[0]
        return int(best["rid"])

    expect = {int(r["lid"]): brute(r) for _, r in lpdf.iterrows()}
    got = {int(r["lid"]): (None if pd.isna(r["r_rid"]) else int(r["r_rid"]))
           for _, r in out.iterrows()}
    assert len(out) == n_l
    assert got == expect
