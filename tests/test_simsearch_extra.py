"""Embedding-space dedup composite."""

from __future__ import annotations


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
