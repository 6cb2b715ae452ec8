"""File-source parity: a directory of raw reference-fixture .kml files
→ spans table → distributed convert must equal the reference library's
``convert`` on each file, and ``convert_kml_dir`` must write the same
files the reference CLI writes."""

from __future__ import annotations

import io
import json
import shutil

import pytest

from tests.conftest import REFERENCE_DATA, reference_available

from kml2geojson_spark.sources import convert_kml_dir, read_kml_files

FIXTURES = ["point", "two_points", "linestring", "polygon",
            "multigeometry", "cdata", "extended_data", "inline_style"]


@pytest.fixture(scope="module")
def kml_dir(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference repo not available")
    d = tmp_path_factory.mktemp("kmls")
    for stem in FIXTURES:
        src = REFERENCE_DATA / f"{stem}.kml"
        if src.is_file():
            shutil.copy(src, d / src.name)
    return d


def test_read_kml_files_roundtrip(spark, kml_dir, reference_module):
    docs = read_kml_files(spark, str(kml_dir))
    rows = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert set(rows) == {p.stem for p in kml_dir.glob("*.kml")}
    # span invariant: concatenating text in offset order reconstructs
    # the file bytes (utf-8, errors=ignore) exactly
    for stem, spans in rows.items():
        raw = (kml_dir / f"{stem}.kml").read_bytes().decode("utf-8", "ignore")
        joined = "".join(s["text"] for s in
                         sorted(spans, key=lambda s: s["offset"]))
        assert joined == raw


def test_convert_kml_dir_matches_reference(spark, kml_dir,
                                           reference_module, tmp_path):
    out = tmp_path / "out"
    convert_kml_dir(spark, str(kml_dir), str(out), style_type="svg",
                    separate_folders=False)
    for p in sorted(kml_dir.glob("*.kml")):
        ref_out = reference_module.convert(
            io.StringIO(p.read_bytes().decode("utf-8", "ignore")),
            style_type="svg", separate_folders=False)
        ref_style, ref_layers = ref_out[0], list(ref_out[1:])
        doc_dir = out / p.stem
        got_style = json.loads((doc_dir / "style.json").read_text())
        assert got_style == ref_style
        layer_files = sorted(doc_dir.glob("*.geojson"))
        assert len(layer_files) == len(ref_layers)
        got_layers = [json.loads(f.read_text()) for f in layer_files]
        for g, r in zip(got_layers, ref_layers):
            assert g == r


def test_convert_kml_dir_max_files_gate(spark, kml_dir, tmp_path):
    with pytest.raises(ValueError, match="max_files"):
        convert_kml_dir(spark, str(kml_dir), str(tmp_path / "gated"),
                        max_files=1)
    # at the gate boundary it still works
    n = len(list(kml_dir.glob("*.kml")))
    written = convert_kml_dir(spark, str(kml_dir), str(tmp_path / "ok"),
                              max_files=n)
    assert written


# ------------------------------------------------------- geojson source


def test_parse_geojson_features_shapes(spark):
    from kml2geojson_spark.sources import parse_geojson_features
    fc = json.dumps({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "properties": {"name": "pt", "q": 1},
             "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
            {"type": "Feature", "properties": None,
             "geometry": {"type": "GeometryCollection", "geometries": [
                 {"type": "Point", "coordinates": [0, 0]},
                 {"type": "LineString",
                  "coordinates": [[0, 0], [1, 1]]}]}},
            {"type": "Feature", "properties": {}, "geometry": None},
        ]})
    bare = json.dumps({"type": "Point", "coordinates": [9, 9]})
    docs = spark.createDataFrame(
        [("a", fc), ("b", bare), ("c", "{not json"), ("d", "{}")],
        "doc_id string, geojson string")
    rows = {(r["doc_id"], r["feature_idx"]): r
            for r in parse_geojson_features(docs).collect()}
    assert len(rows) == 6
    pt = rows[("a", 0)]
    assert pt["geom_type"] == "Point" and pt["name"] == "pt"
    assert json.loads(pt["coordinates_json"]) == [1.5, 2.5]
    assert json.loads(pt["properties_json"]) == {"name": "pt", "q": 1}
    gc = rows[("a", 1)]
    assert gc["geom_type"] == "GeometryCollection" and gc["n_geoms"] == 2
    assert rows[("a", 2)]["geom_type"] is None
    assert rows[("b", 0)]["geom_type"] == "Point"
    assert rows[("c", 0)]["geom_type"] is None
    assert rows[("d", 0)]["geom_type"] is None


def test_geojson_roundtrip_from_kml_convert(spark, kml_dir,
                                            reference_module, tmp_path):
    """KML → engine convert → .geojson files → read_geojson_files:
    geometry coordinates must survive the round trip exactly."""
    import kml2geojson_spark as k2gs
    from kml2geojson_spark.sources import (read_geojson_files,
                                           read_kml_files)

    docs = read_kml_files(spark, str(kml_dir))
    conv = {r["doc_id"]: r for r in
            k2gs.convert_documents(docs).collect()}
    out = tmp_path / "gj"
    out.mkdir()
    expected = {}
    for doc_id, row in conv.items():
        for lname, layer in zip(row["layer_names"], row["layers"]):
            stem = f"{doc_id}__{lname}"
            (out / f"{stem}.geojson").write_text(layer)
            feats = json.loads(layer)["features"]
            expected[stem] = [f.get("geometry") for f in feats]
    got = read_geojson_files(spark, str(out)).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(expected)
    for stem, feats in expected.items():
        rows = sorted(by_doc[stem], key=lambda r: r["feature_idx"])
        assert len(rows) == len(feats)
        for r, g in zip(rows, feats):
            if g is None:
                assert r["geom_type"] is None
            elif g["type"] == "GeometryCollection":
                assert r["geom_type"] == "GeometryCollection"
                assert json.loads(r["coordinates_json"]) == g["geometries"]
            else:
                assert r["geom_type"] == g["type"]
                assert json.loads(r["coordinates_json"]) == g["coordinates"]
