"""Checkpoint/lineage resume semantics + sink parity with the reference
CLI's file layout."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

import kml2geojson_spark as k2gs
from kml2geojson_spark.lineage import LineageLog, Pipeline
from kml2geojson_spark.sinks import export_layers_table, write_geojson_dir

from .conftest import REFERENCE_DATA, reference_available


def test_stage_resume_skips_recompute(spark, tmp_path):
    log = LineageLog(tmp_path / "ckpt")
    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    df1, m1 = log.run_stage(spark, "gen", builder, params={"n": 100})
    assert calls["n"] == 1
    assert m1["status"] == "committed"
    assert m1["total_rows"] == 100
    assert len(m1["partitions"]) >= 1
    assert all("rows" in p and "partition_id" in p for p in m1["partitions"])

    # resume: same stage+params → builder NOT invoked, data identical
    df2, m2 = log.run_stage(spark, "gen", builder, params={"n": 100})
    assert calls["n"] == 1
    assert m2["snapshot_id"] == m1["snapshot_id"]
    assert sorted(r["v"] for r in df2.collect()) == \
        sorted(r["v"] for r in df1.collect())
    # resume is schema-transparent: no internal lineage columns leak
    assert df2.columns == df1.columns == ["id", "v"]

    # changed params → new snapshot → recompute
    df3, m3 = log.run_stage(spark, "gen", builder, params={"n": 101})
    assert calls["n"] == 2
    assert m3["snapshot_id"] != m1["snapshot_id"]


def test_pipeline_chain_invalidates_downstream(spark, tmp_path):
    """A changed upstream param changes the downstream snapshot id even
    when the downstream's own params are unchanged (lineage encoded in
    the id chain)."""
    calls = {"a": 0, "b": 0}

    def run(pa):
        p = Pipeline(spark, tmp_path / "ckpt2")

        def build_a():
            calls["a"] += 1
            return spark.range(pa)

        def build_b():
            calls["b"] += 1
            return spark.range(10)

        p.stage("a", build_a, params={"n": pa})
        p.stage("b", build_b, params={"k": 1})
        return p

    run(50)
    assert calls == {"a": 1, "b": 1}
    run(50)  # full resume
    assert calls == {"a": 1, "b": 1}
    run(60)  # upstream changed → both rerun
    assert calls == {"a": 2, "b": 2}


def test_kill_resume_mid_pipeline(spark, tmp_path):
    """Simulated kill between stages: stage A committed, stage B not.
    The rerun reuses A's checkpoint and only computes B."""
    calls = {"a": 0, "b": 0}
    root = tmp_path / "ckpt3"

    def build_a():
        calls["a"] += 1
        return spark.range(20)

    def build_b():
        calls["b"] += 1
        return spark.range(5)

    p = Pipeline(spark, root)
    p.stage("a", build_a, params=None)
    # "killed" before stage b

    p2 = Pipeline(spark, root)
    p2.stage("a", build_a, params=None)
    df = p2.stage("b", build_b, params=None)
    assert calls == {"a": 1, "b": 1}
    assert df.count() == 5
    # partition lineage in b's manifest points at a's snapshot
    assert p2.manifests["b"]["parents"] == [p2.manifests["a"]["snapshot_id"]]
    for part in p2.manifests["b"]["partitions"]:
        assert part["input_snapshot"] == p2.manifests["a"]["snapshot_id"]


def test_cell_lineage_counts(spark, tmp_path):
    from kml2geojson_spark.spatial import encode_points
    log = LineageLog(tmp_path / "ckpt4")
    import pandas as pd
    import numpy as np
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({"point_id": np.arange(1000, dtype=np.int64),
                        "x": rng.uniform(-180, 180, 1000),
                        "y": rng.uniform(-85, 85, 1000)})

    def builder():
        return encode_points(spark.createDataFrame(pdf), 7)

    _, manifest = log.run_stage(spark, "enc", builder, cell_col="cell_id")
    assert manifest["total_rows"] == 1000
    assert all(p["cells"] is not None and p["cells"] <= p["rows"]
               for p in manifest["partitions"])


@pytest.mark.skipif(not reference_available(), reason="reference missing")
def test_write_geojson_dir_matches_reference_cli_layout(spark, tmp_path):
    """two_layers → style.json + Bingo.geojson + Bingo1.geojson with
    contents equal to the reference's checked-in CLI outputs
    (tests/data/two_layers/, exercised by reference test_cli.py)."""
    k_path = REFERENCE_DATA / "two_layers" / "two_layers.kml"
    kml = k_path.read_text(encoding="utf-8", errors="ignore")
    df = spark.createDataFrame([("two_layers", k2gs.pack_spans(kml))],
                               k2gs.spans_schema())
    row = k2gs.convert_documents(df, style_type="svg",
                                 separate_folders=True).collect()[0]
    written = write_geojson_dir(row, tmp_path / "out")
    names = [p.name for p in written]
    assert names == ["style.json", "Bingo.geojson", "Bingo1.geojson"]
    for p in written:
        expected = json.loads((k_path.parent / p.name).read_text())
        assert json.loads(p.read_text()) == expected


def test_export_layers_table(spark):
    docs = k2gs.synthesize_documents_kml(spark, 10, seed=2, max_placemarks=6)
    conv = k2gs.convert_documents(docs, style_type="svg", separate_folders=True)
    tbl = export_layers_table(conv)
    pdf = tbl.toPandas()
    assert {"doc_id", "style_json", "layer_idx", "layer_name", "geojson"} \
        <= set(pdf.columns)
    assert len(pdf) >= 10
    sample = json.loads(pdf.iloc[0]["geojson"])
    assert sample["type"] == "FeatureCollection"
