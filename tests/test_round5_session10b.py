"""Round-5 session-10 batch 2: pcm_window_features, jl_project,
seasonality_strength."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pcm_window_features
# ---------------------------------------------------------------------------

def _md5_chain(ref: str, n: int) -> bytes:
    chunks = [hashlib.md5(f"{ref}:{i}".encode()).digest()
              for i in range((n + 15) // 16)]
    return b"".join(chunks)[:n]


def _brute_pcm(buf: bytes, window: int):
    n = (len(buf) // 2) * 2
    s = np.frombuffer(buf[:n], dtype="<i2").astype(np.int64)
    out = []
    for w0 in range(0, len(s) - window + 1, window):
        w = s[w0:w0 + window]
        sign = np.where(w >= 0, 1, -1)
        out.append((w0 // window, window, int(np.abs(w).sum()),
                    int(np.abs(w).max()),
                    int((sign[1:] != sign[:-1]).sum())))
    return out


def test_pcm_features_match_brute(spark):
    from kml2geojson_spark.multimodal import (fetch_media_stub,
                                              pcm_window_features)

    refs = spark.createDataFrame(
        [(str(i), f"media/{i}.pcm", "pcm", 0) for i in range(20)],
        "doc_id string, media_ref string, ext string, offset int")
    feats = pcm_window_features(
        fetch_media_stub(refs, payload="pcm", payload_bytes=512),
        window=32).collect()
    got = {}
    for r in feats:
        got.setdefault(r.media_ref, []).append(
            (r.window_idx, r.n_samples, r.abs_sum, r.peak,
             r.zero_crossings))
    assert len(got) == 20
    for i in range(20):
        ref = f"media/{i}.pcm"
        assert sorted(got[ref]) == _brute_pcm(_md5_chain(ref, 512), 32)


def test_pcm_features_partial_window_dropped(spark):
    from kml2geojson_spark.multimodal import pcm_window_features

    # 2*70 bytes = 70 samples; window 32 -> 2 windows, 6-sample tail
    # plus one odd trailing byte dropped.
    buf = _md5_chain("x", 141)
    df = spark.createDataFrame([("x", "r", "pcm", 0, bytearray(buf))],
                               "doc_id string, media_ref string, "
                               "ext string, offset int, content binary")
    rows = pcm_window_features(df, window=32).collect()
    assert sorted(r.window_idx for r in rows) == [0, 1]
    assert all(r.n_samples == 32 for r in rows)


def test_pcm_features_known_signal(spark):
    from kml2geojson_spark.multimodal import pcm_window_features

    # Alternating +100/-100: zero crossings = window-1; abs_sum = 100*w.
    s = np.tile([100, -100], 32).astype("<i2")
    df = spark.createDataFrame(
        [("d", "r", "pcm", 0, bytearray(s.tobytes()))],
        "doc_id string, media_ref string, ext string, offset int, "
        "content binary")
    r = pcm_window_features(df, window=64).collect()[0]
    assert (r.abs_sum, r.peak, r.zero_crossings) == (6400, 100, 63)


# ---------------------------------------------------------------------------
# jl_project
# ---------------------------------------------------------------------------

def test_jl_project_matches_numpy(spark):
    from kml2geojson_spark.simsearch import jl_project, \
        rademacher_hyperplanes

    rng = np.random.default_rng(3)
    dim, k = 16, 8
    vecs = [(i, [float(v) for v in rng.normal(size=dim)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    H = rademacher_hyperplanes(dim, k)
    scale = 1.0 / math.sqrt(float(k))
    got = {(r.id, r.proj_idx): r.y_micro
           for r in jl_project(df, dim=dim, out_dim=k).collect()}
    assert len(got) == 40 * k
    for i, v in vecs:
        for j in range(k):
            # replicate the left-associated chain exactly
            acc = v[0] * H[0, j]
            for d in range(1, dim):
                acc += v[d] * H[d, j]
            want = round(acc * scale * 1_000_000.0)
            assert got[(i, j)] == want


def test_jl_project_preserves_distances_approximately(spark):
    """The JL property itself: pairwise distances in the projected
    space track the originals within a loose tolerance."""
    from kml2geojson_spark.simsearch import jl_project

    rng = np.random.default_rng(9)
    dim, k = 64, 16
    V = rng.normal(size=(30, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(30)],
        "vec_id long, embedding array<double>")
    rows = jl_project(df, dim=dim, out_dim=k).collect()
    P = np.zeros((30, k))
    for r in rows:
        P[r.id, r.proj_idx] = r.y_micro / 1e6
    ratios = []
    for i in range(0, 30, 3):
        for j in range(i + 1, 30, 7):
            d0 = np.linalg.norm(V[i] - V[j])
            d1 = np.linalg.norm(P[i] - P[j])
            ratios.append(d1 / d0)
    m = float(np.mean(ratios))
    assert 0.75 < m < 1.25
    assert all(0.4 < r < 1.9 for r in ratios)


# ---------------------------------------------------------------------------
# seasonality_strength
# ---------------------------------------------------------------------------

def test_seasonality_strength_strong_vs_flat(spark):
    from kml2geojson_spark.eventops import seasonality_strength

    rows = []
    # "rhythm": value determined entirely by hour -> eta2 == 1.
    # "flat": same value everywhere -> eta2 NULL (SSB+SSW == 0).
    # "noise": hour-independent alternation -> eta2 near 0.
    for day in range(4):
        for hour in range(24):
            ts = f"2024-01-{day+1:02d} {hour:02d}:30:00"
            rows.append(("rhythm", ts, (hour % 6) * 10))
            rows.append(("flat", ts, 5))
            # two 0s and two 100s per hour -> every phase mean is 50
            rows.append(("noise", ts, 100 * ((day + hour) % 2)))
    df = spark.createDataFrame(rows, "g string, ts string, v long").withColumn("ts", F.to_timestamp("ts"))
    got = {r.g: r for r in seasonality_strength(
        df, value_col="v", group_cols=["g"]).collect()}
    assert got["rhythm"].eta2 == pytest.approx(1.0)
    assert got["flat"].eta2 is None
    assert got["noise"].eta2 == pytest.approx(0.0, abs=1e-9)
    assert got["rhythm"].k == 24 and got["rhythm"].n == 96


def test_seasonality_strength_matches_anova_by_hand(spark):
    from kml2geojson_spark.eventops import seasonality_strength

    rng = np.random.default_rng(17)
    rows = [("g", f"2024-02-0{1 + i % 5} {int(rng.integers(0, 24)):02d}:"
                  f"{int(rng.integers(0, 60)):02d}:00",
             int(rng.integers(0, 50))) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, ts string, v long").withColumn("ts", F.to_timestamp("ts"))
    r = seasonality_strength(df, value_col="v", group_cols=["g"]
                             ).collect()[0]
    # brute-force eta2 with the same milli-floor discipline
    from collections import defaultdict
    import datetime as dt
    per = defaultdict(list)
    for _, ts, v in rows:
        t = dt.datetime.fromisoformat(ts)
        sec = t.hour * 3600 + t.minute * 60 + t.second
        per[(sec * 24) // 86400].append(v)
    allv = [v for vs in per.values() for v in vs]
    cb = sum(math.floor(sum(vs) ** 2 / len(vs) * 1000.0)
             for vs in per.values())
    grand = math.floor(sum(allv) ** 2 / len(allv) * 1000.0)
    ssb = cb - grand
    ssw = 1000 * sum(v * v for v in allv) - cb
    assert (r.ssb_milli, r.ssw_milli) == (ssb, ssw)
    assert r.eta2 == pytest.approx(ssb / (ssb + ssw))
