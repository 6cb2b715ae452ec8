"""Spark-surface parity tests: fixtures packed into the interleaved
spans table, converted via the distributed engine, compared against the
reference implementation (differential) — SURVEY.md §5.2 Tier 1."""

from __future__ import annotations

import json

import pytest

import kml2geojson_spark as k2gs
from kml2geojson_spark.engine import layer_feature_counts

from .conftest import REFERENCE_DATA, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not available"
)


def _fixture_docs():
    paths = sorted(REFERENCE_DATA.glob("*.kml")) + [
        REFERENCE_DATA / "two_layers" / "two_layers.kml"
    ]
    out = []
    for p in paths:
        kml = p.read_text(encoding="utf-8", errors="ignore")
        out.append((p.stem, kml))
    return out


def test_pack_spans_invariants():
    kml = (
        '<kml><Style id="s"><IconStyle><Icon><href>http://x/y.png</href>'
        "</Icon></IconStyle></Style>" + ("<Placemark>" + "x" * 600 + "</Placemark>") + "</kml>"
    )
    spans = k2gs.pack_spans(kml)
    # sorted by offset + contiguous
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs)
    pos = 0
    for s in spans:
        assert s["offset"] == pos
        pos += len(s["text"])
    assert pos == len(kml)
    assert "".join(s["text"] for s in spans) == kml
    media = [s for s in spans if s["kind"] == "media"]
    assert [m["media_ref"] for m in media] == ["http://x/y.png"]
    assert all(len(s["text"]) <= 256 for s in spans if s["kind"] == "text")


@requires_reference
def test_spark_convert_matches_reference_all_fixtures(spark, reference_module):
    import xml.dom.minidom as md

    docs = _fixture_docs()
    df = spark.createDataFrame(
        [(stem, k2gs.pack_spans(kml)) for stem, kml in docs],
        k2gs.spans_schema(),
    )
    got = {
        r["doc_id"]: r
        for r in k2gs.convert_documents(
            df, style_type="svg", separate_folders=True
        ).collect()
    }
    assert len(got) == len(docs)
    for stem, kml in docs:
        dom = md.parseString(kml)
        exp_layers = reference_module.build_layers(dom)
        exp_style = reference_module.build_svg_style(dom)
        row = got[stem]
        assert json.loads(row["style_json"]) == exp_style, stem
        assert [json.loads(s) for s in row["layers"]] == exp_layers, stem


@requires_reference
def test_spark_convert_merged_mode(spark, reference_module):
    import xml.dom.minidom as md

    docs = _fixture_docs()
    df = spark.createDataFrame(
        [(stem, k2gs.pack_spans(kml)) for stem, kml in docs],
        k2gs.spans_schema(),
    )
    got = {
        r["doc_id"]: r
        for r in k2gs.convert_documents(df, feature_collection_name="main").collect()
    }
    for stem, kml in docs:
        dom = md.parseString(kml)
        expected = reference_module.build_feature_collection(dom, name="main")
        assert json.loads(got[stem]["layers"][0]) == expected, stem
        assert got[stem]["style_json"] is None


@requires_reference
def test_extract_features_and_styles(spark):
    docs = _fixture_docs()
    df = spark.createDataFrame(
        [(stem, k2gs.pack_spans(kml)) for stem, kml in docs],
        k2gs.spans_schema(),
    )
    feats = k2gs.extract_features(df)
    pdf = feats.toPandas()
    # every atomic geometry row reconstitutes valid parts
    assert set(pdf["geom_type"]) <= {"Point", "LineString", "Polygon"}
    pts = pdf[pdf["geom_type"] == "Point"]
    assert len(pts) > 0
    for parts in pts["parts"]:
        assert len(parts) == 1 and len(parts[0]) <= 1  # [[pos]] or [[]]
    # per-feature count parity with the reference convert output
    polys = pdf[(pdf["doc_id"] == "polygon") & (pdf["geom_type"] == "Polygon")]
    assert len(polys) == 1 and len(polys.iloc[0]["parts"]) == 2  # outer+inner ring

    styles = k2gs.extract_styles(df, "svg").toPandas()
    two = styles[styles["doc_id"] == "two_layers"]
    assert set(two["style_id"]) == {"#bingoStyle", "#bongoStyle"} or len(two) >= 1

    # broadcast style resolution attaches the catalog entry
    resolved = k2gs.resolve_styles(feats, k2gs.extract_styles(df, "svg"))
    r = resolved.where(
        (resolved["doc_id"] == "style_url") & resolved["style_url"].isNotNull()
    ).toPandas()
    if len(r):
        assert r["resolved_style_json"].notna().any()


def test_layer_feature_counts_on_synthetic(spark):
    df = k2gs.synthesize_documents_kml(spark, 40, seed=7, max_placemarks=12)
    counts = layer_feature_counts(df).toPandas()
    assert counts["n_features"].sum() > 0
    assert (counts["n_features"] >= 1).all()
    # determinism: same seed → same corpus → same counts
    df2 = k2gs.synthesize_documents_kml(spark, 40, seed=7, max_placemarks=12)
    counts2 = layer_feature_counts(df2).toPandas()
    a = counts.sort_values(["doc_id", "layer_idx"]).reset_index(drop=True)
    b = counts2.sort_values(["doc_id", "layer_idx"]).reset_index(drop=True)
    assert a.equals(b)


@requires_reference
def test_synthetic_corpus_spark_vs_reference(spark, reference_module):
    """Differential fuzz: 25 synthetic docs through the Spark engine vs
    the reference library on the reassembled KML strings."""
    import xml.dom.minidom as md

    df = k2gs.synthesize_documents_kml(spark, 25, seed=3, max_placemarks=8)
    rows = df.collect()
    conv = {
        r["doc_id"]: r
        for r in k2gs.convert_documents(
            df, style_type="leaflet", separate_folders=True
        ).collect()
    }
    for row in rows:
        kml = k2gs.reassemble_spans_kml(row["spans"])
        dom = md.parseString(kml)
        exp = reference_module.build_layers(dom)
        got = [json.loads(s) for s in conv[row["doc_id"]]["layers"]]
        assert got == exp, row["doc_id"]
        assert json.loads(conv[row["doc_id"]]["style_json"]) == \
            reference_module.build_leaflet_style(dom), row["doc_id"]
