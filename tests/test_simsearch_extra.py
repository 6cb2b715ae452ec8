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
