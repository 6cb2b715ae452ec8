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
