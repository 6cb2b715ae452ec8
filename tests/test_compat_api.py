"""Reference-name API parity: the exact call shapes of the reference's
own test suite (/root/reference/tests/test_main.py), driven through
``kml2geojson_spark.compat`` with minidom-parsed input — a porting
user's `from kml2geojson import X` maps 1:1 to
`from kml2geojson_spark.compat import X`."""

from __future__ import annotations

import json
import pathlib
import xml.dom.minidom as md

import pytest

from kml2geojson_spark.compat import (
    attr, build_feature_collection, build_layers, build_leaflet_style,
    build_rgb_and_opacity, build_svg_style, convert, coords, coords1,
    disambiguate, get, get1, gx_coords1, to_filename, val, valf,
)

DATA_DIR = pathlib.Path("/root/reference/tests/data")

needs_ref = pytest.mark.skipif(not DATA_DIR.exists(),
                               reason="reference fixtures not present")


def test_scalar_helpers_reference_shapes():
    assert coords1(" -112.2,36.0,2357 ") == [-112.2, 36.0, 2357]
    assert coords("\n     -112.0,36.1,0\n     -113.0,36.0,0 \n     ") == \
        [[-112.0, 36.1, 0], [-113.0, 36.0, 0]]
    assert gx_coords1("-113.0 36.0 0") == [-113.0, 36.0, 0.0]
    assert build_rgb_and_opacity("ee001122") == ("#221100", 0.93)
    assert disambiguate(
        ["bingo", "bingo1", "bongo", "bingo", "bro", "bongo"]) == \
        ["bingo", "bingo1", "bongo", "bingo11", "bro", "bongo1"]
    assert to_filename("%   A d\nbla'{-+)(ç?") == "A_dbla-ç"


@needs_ref
def test_get_get1_attr_val_on_minidom_nodes():
    kml = md.parseString((DATA_DIR / "google_sample.kml").read_text())
    pms = get(kml, "Placemark")
    assert len(pms) > 0
    first = get1(kml, "Placemark")
    assert first is not None and attr(first, "id") == attr(pms[0], "id")
    name = get1(first, "name")
    assert isinstance(val(name), str) and val(name)
    assert valf(name) is None  # not a number
    assert val(None) == ""


@needs_ref
def test_build_svg_style_minidom_input():
    kml = md.parseString((DATA_DIR / "google_sample.kml").read_text())
    style = build_svg_style(kml)
    assert style["#transPurpleLineGreenPoly"] == {
        "stroke": "#ff00ff", "stroke-opacity": 0.5, "stroke-width": 4.0,
        "fill": "#00ff00", "fill-opacity": 0.5,
    }


@needs_ref
def test_build_leaflet_style_minidom_input():
    kml = md.parseString((DATA_DIR / "google_sample.kml").read_text())
    style = build_leaflet_style(kml)
    assert style["#transPurpleLineGreenPoly"] == {
        "color": "#ff00ff", "fillColor": "#00ff00", "fillOpacity": 0.5,
        "opacity": 0.5, "weight": 4.0,
    }


@needs_ref
def test_build_feature_collection_all_goldens():
    stems = set(p.stem for p in DATA_DIR.glob("*.kml")) & \
        set(p.stem for p in DATA_DIR.glob("*.geojson"))
    assert stems
    for s in sorted(stems):
        kml = md.parseString((DATA_DIR / f"{s}.kml").read_text())
        expect = json.loads((DATA_DIR / f"{s}.geojson").read_text())
        assert build_feature_collection(kml) == expect, s


@needs_ref
def test_build_layers_two_layers():
    k_path = DATA_DIR / "two_layers" / "two_layers.kml"
    kml = md.parseString(k_path.read_text())
    layers = build_layers(kml)
    for i, name in enumerate(["Bingo", "Bingo1"]):
        expect = json.loads((k_path.parent / f"{name}.geojson").read_text())
        assert layers[i] == expect


@needs_ref
def test_convert_reference_return_shape():
    k_path = DATA_DIR / "two_layers" / "two_layers.kml"
    out = convert(k_path, style_type="svg", separate_folders=True)
    assert isinstance(out, tuple) and len(out) == 3  # (style, fc, fc)
    style = json.loads((k_path.parent / "style.json").read_text())
    assert out[0] == style
    for name, fc in zip(["Bingo", "Bingo1"], out[1:]):
        expect = json.loads((k_path.parent / f"{name}.geojson").read_text())
        assert fc == expect
    # no style_type -> plain list, like the reference
    out2 = convert(k_path, separate_folders=True)
    assert isinstance(out2, list) and len(out2) == 2
    # file-object input is read and closed
    fobj = open(k_path, encoding="utf-8")
    out3 = convert(fobj)
    assert fobj.closed and isinstance(out3, list) and len(out3) == 1


def test_convert_binary_file_honors_encoding_declaration(tmp_path):
    """A binary file object with a non-UTF8 XML encoding declaration
    must decode per the declaration (as minidom does in the reference),
    not be mangled as UTF-8."""
    kml = ("<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>"
           "<kml><Document><Placemark><name>café</name>"
           "<Point><coordinates>1,2</coordinates></Point>"
           "</Placemark></Document></kml>")
    p = tmp_path / "latin1.kml"
    p.write_bytes(kml.encode("iso-8859-1"))
    with open(p, "rb") as f:
        out = convert(f)
    feat = out[0]["features"][0]
    assert feat["properties"]["name"] == "café"


def test_compat_exports_reference_constants():
    from kml2geojson_spark.compat import GEOTYPES, SPACE, STYLE_TYPES
    assert "Point" in GEOTYPES and "svg" in STYLE_TYPES
    assert SPACE.sub("", " a b ") == "ab"
