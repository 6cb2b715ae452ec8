"""Golden-parity tests for the pure-Python conversion core.

Two layers of evidence:

1. Direct ports of the reference's scalar unit tests
   (/root/reference/tests/test_main.py:8-96) with the exact expected
   values inlined — these run with no reference checkout present.
2. Differential tests: when the reference repo is available, every KML
   fixture with a golden .geojson counterpart is converted by BOTH
   implementations and compared for dict equality (the reference's own
   comparison discipline, test_main.py:80-82), including the
   two-layers build_layers / convert / style-catalog scenarios
   (test_main.py:99-162).
"""

from __future__ import annotations

import json

import pytest

from kml2geojson_spark import (
    build_feature_collection_dict,
    build_layers_dicts,
    build_style_catalog,
    color_and_opacity,
    convert_kml_string,
    disambiguate_names,
    parse_coord_tuple,
    parse_coord_seq,
    parse_gx_coord,
    parse_kml,
    sanitize_filename,
)

from .conftest import REFERENCE_DATA, reference_available


# ---------------------------------------------------------------------------
# 1. Scalar goldens (self-contained)
# ---------------------------------------------------------------------------

def test_parse_coord_tuple():
    assert parse_coord_tuple(" -112.2,36.0,2357 ") == [-112.2, 36.0, 2357]


def test_parse_coord_seq():
    v = """
     -112.0,36.1,0
     -113.0,36.0,0
     """
    assert parse_coord_seq(v) == [[-112.0, 36.1, 0], [-113.0, 36.0, 0]]
    assert parse_coord_seq("") == []


def test_parse_gx_coord():
    assert parse_gx_coord("-113.0 36.0 0") == [-113.0, 36.0, 0.0]


def test_color_and_opacity():
    assert color_and_opacity("ee001122") == ("#221100", 0.93)
    assert color_and_opacity("#7f0000ff") == ("#ff0000", 0.5)
    assert color_and_opacity("ffcc00") == ("#00ccff", 1)
    assert isinstance(color_and_opacity("ffcc00")[1], int)  # int 1, not 1.0
    assert color_and_opacity("f0f") == ("#f0f", 1)
    assert color_and_opacity("zz") == ("#000000", 1)


def test_disambiguate_names():
    names = ["bingo", "bingo1", "bongo", "bingo", "bro", "bongo"]
    assert disambiguate_names(names) == [
        "bingo", "bingo1", "bongo", "bingo11", "bro", "bongo1",
    ]
    assert disambiguate_names(["sing", "song", "sing", "sing"]) == [
        "sing", "song", "sing1", "sing11",
    ]


def test_sanitize_filename():
    assert sanitize_filename("%   A d\nbla'{-+)(ç?") == "A_dbla-ç"


def test_parser_basics():
    root = parse_kml(
        "<?xml version='1.0'?><kml><Placemark id='p1'>"
        "<name>\n<![CDATA[Hi &amp; bye]]>\n</name>"
        "<desc><!-- c -->text</desc>"
        "<empty/><Point><coordinates>1,2</coordinates></Point>"
        "</Placemark></kml>"
    )
    pm = root.find("Placemark")
    assert pm is not None and pm.attr("id") == "p1"
    assert pm.find("name").text() == "Hi &amp; bye"  # CDATA is verbatim
    assert pm.find("desc").text() == ""  # comment breaks text adjacency
    assert pm.find("empty").text() == ""
    assert root.find("coordinates").text() == "1,2"
    assert root.find("nope") is None


def test_parser_entities_and_attrs():
    root = parse_kml('<a x="1 &lt; 2" y=\'&#65;\'>&gt;&#x41;</a>')
    el = root.find("a")
    assert el.attr("x") == "1 < 2"
    assert el.attr("y") == "A"
    assert el.text() == ">A"


# ---------------------------------------------------------------------------
# 2. Differential goldens vs the reference implementation
# ---------------------------------------------------------------------------

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not available"
)


def _fixture_stems():
    if not REFERENCE_DATA.is_dir():
        return []
    kml = {p.stem for p in REFERENCE_DATA.glob("*.kml")}
    geo = {p.stem for p in REFERENCE_DATA.glob("*.geojson")}
    return sorted(kml & geo)


@requires_reference
@pytest.mark.parametrize("stem", _fixture_stems() or ["__none__"])
def test_feature_collection_matches_golden(stem):
    if stem == "__none__":
        pytest.skip("no fixtures")
    kml_str = (REFERENCE_DATA / f"{stem}.kml").read_text(encoding="utf-8", errors="ignore")
    expected = json.loads((REFERENCE_DATA / f"{stem}.geojson").read_text())
    got = build_feature_collection_dict(parse_kml(kml_str))
    assert got == expected, f"fixture {stem} diverged"


@requires_reference
def test_nested_multigeometry_early_return_matches_reference(
        reference_module):
    """Reference quirk (main.py:349-354): build_geometry descends into
    the FIRST MultiGeometry descendant and returns — an inner
    MultiGeometry therefore wins over the outer one and the outer's
    sibling geometries are DISCARDED. Byte-parity on that exact shape."""
    import xml.dom.minidom as md

    kml = (
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
        "<Placemark><name>nest</name>"
        "<MultiGeometry>"
        "<Point><coordinates>1,1</coordinates></Point>"
        "<MultiGeometry>"
        "<LineString><coordinates>2,2 3,3</coordinates></LineString>"
        "<Point><coordinates>9,9</coordinates></Point>"
        "</MultiGeometry>"
        "<Point><coordinates>4,4</coordinates></Point>"
        "</MultiGeometry>"
        "</Placemark></Document></kml>"
    )
    expected = reference_module.build_feature_collection(md.parseString(kml))
    got = build_feature_collection_dict(parse_kml(kml))
    assert got == expected
    # the quirk really bit: only the INNER MultiGeometry's 2 geoms
    # survive, the outer's sibling Points are gone
    gc = expected["features"][0]["geometry"]
    assert gc["type"] == "GeometryCollection" and len(gc["geometries"]) == 2
    assert {g["type"] for g in gc["geometries"]} == {"LineString", "Point"}
    assert [1.0, 1.0] not in [
        g.get("coordinates") for g in gc["geometries"]]


@requires_reference
def test_gx_multitrack_per_track_times_matches_reference(reference_module):
    """Reference quirk (main.py:460-465): a gx:MultiTrack with several
    gx:Tracks nests times as a LIST OF LISTS (one per track), while a
    single track flattens to one list (times[0]). Byte-parity on both."""
    import xml.dom.minidom as md

    two = (
        '<kml xmlns="http://www.opengis.net/kml/2.2" '
        'xmlns:gx="http://www.google.com/kml/ext/2.2">'
        "<Placemark><name>trk</name>"
        "<gx:MultiTrack>"
        "<gx:Track>"
        "<when>2010-05-28T02:02:09Z</when><when>2010-05-28T02:02:35Z</when>"
        "<gx:coord>-122.2 37.4 156.0</gx:coord>"
        "<gx:coord>-122.3 37.5 152.0</gx:coord>"
        "</gx:Track>"
        "<gx:Track>"
        "<when>2010-05-28T02:02:44Z</when>"
        "<gx:coord>-122.4 37.6 147.0</gx:coord>"
        "</gx:Track>"
        "</gx:MultiTrack>"
        "</Placemark></kml>"
    )
    expected = reference_module.build_feature_collection(md.parseString(two))
    got = build_feature_collection_dict(parse_kml(two))
    assert got == expected
    props = expected["features"][0]["properties"]
    assert props["times"] == [
        ["2010-05-28T02:02:09Z", "2010-05-28T02:02:35Z"],
        ["2010-05-28T02:02:44Z"],
    ]
    one = two.replace(
        "<gx:Track>"
        "<when>2010-05-28T02:02:44Z</when>"
        "<gx:coord>-122.4 37.6 147.0</gx:coord>"
        "</gx:Track>", "", 1)
    expected1 = reference_module.build_feature_collection(md.parseString(one))
    got1 = build_feature_collection_dict(parse_kml(one))
    assert got1 == expected1
    # single track: times FLATTENS to one list (not a list of lists)
    assert expected1["features"][0]["properties"]["times"] == [
        "2010-05-28T02:02:09Z", "2010-05-28T02:02:35Z"]


@requires_reference
def test_style_catalogs_match_reference(reference_module):
    import xml.dom.minidom as md

    for stem in sorted(p.stem for p in REFERENCE_DATA.glob("*.kml")):
        kml_str = (REFERENCE_DATA / f"{stem}.kml").read_text(
            encoding="utf-8", errors="ignore")
        dom = md.parseString(kml_str)
        ours = parse_kml(kml_str)
        assert build_style_catalog(ours, "svg") == reference_module.build_svg_style(dom), stem
        assert build_style_catalog(ours, "leaflet") == reference_module.build_leaflet_style(dom), stem


@requires_reference
def test_two_layers_build_layers():
    k_path = REFERENCE_DATA / "two_layers" / "two_layers.kml"
    kml_str = k_path.read_text(encoding="utf-8", errors="ignore")
    got = build_layers_dicts(parse_kml(kml_str))
    for i, name in enumerate(["Bingo", "Bingo1"]):
        expected = json.loads((k_path.parent / f"{name}.geojson").read_text())
        assert got[i] == expected


@requires_reference
def test_convert_two_layers_all_modes():
    k_path = REFERENCE_DATA / "two_layers" / "two_layers.kml"
    kml_str = k_path.read_text(encoding="utf-8", errors="ignore")
    style_exp = json.loads((k_path.parent / "style.json").read_text())
    bingo = json.loads((k_path.parent / "Bingo.geojson").read_text())
    bingo1 = json.loads((k_path.parent / "Bingo1.geojson").read_text())

    style, layers = convert_kml_string(kml_str, style_type="svg", separate_folders=True)
    assert style == style_exp
    assert layers == [bingo, bingo1]

    style, layers = convert_kml_string(
        kml_str, style_type="svg", separate_folders=False,
        feature_collection_name="two_layers")
    assert style == style_exp
    assert layers == [{
        "name": "two_layers",
        "type": "FeatureCollection",
        "features": bingo["features"] + bingo1["features"],
    }]

    style, layers = convert_kml_string(
        kml_str, separate_folders=False, feature_collection_name="two_layers")
    assert style is None
    assert layers[0]["name"] == "two_layers"

    with pytest.raises(ValueError):
        convert_kml_string(kml_str, style_type="nope")


@requires_reference
def test_differential_layers_over_all_fixtures(reference_module):
    """build_layers parity over EVERY kml fixture (incl. ones without
    goldens, e.g. google_sample.kml, warnings.kml with nested folders)."""
    paths = sorted(REFERENCE_DATA.glob("*.kml")) + [
        REFERENCE_DATA / "two_layers" / "two_layers.kml"
    ]
    import xml.dom.minidom as md

    for p in paths:
        kml_str = p.read_text(encoding="utf-8", errors="ignore")
        dom = md.parseString(kml_str)
        expect_layers = reference_module.build_layers(dom)
        got_layers = build_layers_dicts(parse_kml(kml_str))
        assert got_layers == expect_layers, p.name
        expect_fc = reference_module.build_feature_collection(dom, name="x")
        got_fc = build_feature_collection_dict(parse_kml(kml_str), name="x")
        assert got_fc == expect_fc, p.name


def test_xml_eol_and_attribute_normalization(reference_module):
    """XML 1.0 §2.11 / §3.3.3 parity with minidom: \r\n in text becomes
    \n; literal tab/newline in attribute values become spaces."""
    import io
    from kml2geojson_spark.convert_core import convert_kml_string

    kml = ('<?xml version="1.0"?><kml><Document>'
           '<Placemark id="x\ty">'
           '<name>a\r\nb</name>'
           '<description>c\rd</description>'
           '<Point><coordinates>1.0,2.0</coordinates></Point>'
           '</Placemark></Document></kml>')
    expect = reference_module.convert(io.StringIO(kml))[0]
    _style, layers = convert_kml_string(kml)
    assert layers[0] == expect
    f = layers[0]["features"][0]
    assert f["properties"]["name"] == "a\nb"
    assert f["properties"]["description"] == "c\nd"
    assert f["id"] == "x y"


def test_doctype_pi_entity_parity(reference_module):
    """DOCTYPE declarations, processing instructions, and the five
    named + numeric character entities parse identically to minidom."""
    import xml.dom.minidom as md
    from kml2geojson_spark.convert_core import build_feature_collection_dict
    from kml2geojson_spark.kmlparse import parse_kml

    kml = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<!DOCTYPE kml SYSTEM "kml21.dtd">\n'
           '<?xml-stylesheet type="text/xsl" href="style.xsl"?>\n'
           '<kml><Document><name>t&#65;il</name>'
           '<Placemark><name>&quot;q&amp;a&apos; &lt;&gt; &#x4A;</name>'
           '<Point><coordinates>1,2</coordinates></Point></Placemark>'
           '</Document></kml>')
    expect = reference_module.build_feature_collection(
        md.parseString(kml), name="f")
    got = build_feature_collection_dict(parse_kml(kml), name="f")
    assert got == expect
