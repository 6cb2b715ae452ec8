"""Embedding-space dedup composite — exact and LSH candidate modes."""

from __future__ import annotations

import pytest


def test_embedding_dedup_representatives(spark):
    from kml2geojson_spark.simsearch import embedding_dedup_representatives
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal: unique
        (4, [0.99, 0.02, 0.0]),    # near-dup of 1 and 2 (chain)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["rep_id"]
           for r in embedding_dedup_representatives(emb, 0.99).collect()}
    assert out == {1: 1, 2: 1, 4: 1, 3: 3}


def test_embedding_dedup_lsh_mode_requires_dim(spark):
    from kml2geojson_spark.simsearch import embedding_dedup_representatives
    emb = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        embedding_dedup_representatives(emb, 0.9, candidates="lsh")
    with pytest.raises(ValueError, match="candidates"):
        embedding_dedup_representatives(emb, 0.9, candidates="bogus")


def test_lsh_neardup_pairs_no_nested_loop_and_recall(spark):
    """The LSH pair source must plan WITHOUT any nested-loop join (the
    exact path's O(n²) comparison), and its candidate-then-exact-filter
    output must be a high-recall, perfect-precision subset of the exact
    pairs on the sf0.01 embeddings."""
    from kml2geojson_spark.simsearch import (cosine_neardup_pairs,
                                             cosine_neardup_pairs_lsh)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    lsh = cosine_neardup_pairs_lsh(emb, 0.4505, dim=64, bits=64, bands=16)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    exact = {(r["vec_a"], r["vec_b"])
             for r in cosine_neardup_pairs(emb, 0.4505).collect()}
    approx = {(r["vec_a"], r["vec_b"]) for r in lsh.collect()}
    assert approx <= exact, "LSH emitted a pair the exact filter rejects"
    assert len(exact) > 0
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7, f"LSH near-dup recall too low: {recall}"


def test_embedding_dedup_lsh_mode_matches_exact_on_easy_clusters(spark):
    """On well-separated clusters (signatures collide within, not
    across), the lsh mode reproduces the exact-mode representatives."""
    from kml2geojson_spark.simsearch import embedding_dedup_representatives
    rows = [
        (1, [1.0, 0.001, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.002]),
        (4, [0.0, 0.0, 0.99, 0.02]),
        (5, [0.5, 0.5, 0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {r["vec_id"]: r["rep_id"]
             for r in embedding_dedup_representatives(emb, 0.99).collect()}
    lsh = {r["vec_id"]: r["rep_id"]
           for r in embedding_dedup_representatives(
               emb, 0.99, candidates="lsh", dim=4, bits=64,
               bands=32).collect()}
    assert exact == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5}
    assert lsh == exact


def test_mutual_knn_edges_vs_bruteforce(spark):
    import numpy as np
    import pandas as pd
    from kml2geojson_spark.simsearch import mutual_knn_edges
    rng = np.random.default_rng(8)
    V = rng.standard_normal((60, 16)).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                        "embedding": [v.tolist() for v in V]})
    df = spark.createDataFrame(pdf)
    got = {(r["vec_a"], r["vec_b"]): (r["rank_ab"], r["rank_ba"])
           for r in mutual_knn_edges(df, 4).collect()}
    norms = np.linalg.norm(V, axis=1)
    cos = (V @ V.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    topk = {}
    for i in range(60):
        order = sorted(range(60), key=lambda j: (-cos[i, j], j))[:4]
        topk[i] = {j: r + 1 for r, j in enumerate(order)}
    want = {}
    for a in range(60):
        for b in topk[a]:
            if a < b and a in topk[b]:
                want[(a, b)] = (topk[a][b], topk[b][a])
    assert got == want
    assert len(want) > 0


def test_mutual_knn_edges_ivf_recall(spark):
    import numpy as np
    import pandas as pd
    from kml2geojson_spark.simsearch import mutual_knn_edges
    rng = np.random.default_rng(12)
    V = rng.standard_normal((200, 16)).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                        "embedding": [v.tolist() for v in V]})
    df = spark.createDataFrame(pdf)
    exact = {(r["vec_a"], r["vec_b"])
             for r in mutual_knn_edges(df, 5).collect()}
    approx = {(r["vec_a"], r["vec_b"])
              for r in mutual_knn_edges(df, 5, method="ivf",
                                        n_centroids=8, nprobe=4).collect()}
    recall = len(exact & approx) / max(1, len(exact))
    assert recall >= 0.5, f"mutual-kNN IVF recall too low: {recall}"


def test_mutual_knn_edges_validation(spark):
    import pytest
    from kml2geojson_spark.simsearch import mutual_knn_edges
    df = spark.createDataFrame([(0, [1.0, 0.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        mutual_knn_edges(df, 2, method="bogus")
