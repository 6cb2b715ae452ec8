"""Differential fuzzing vs the reference implementation.

A seeded grammar generator produces KML exercising the nasty corners
(CDATA, comments inside geometry containers, self-closing tags,
entities, namespace-prefixed tags, nested folders with duplication,
inline styles, tracks with times, ExtendedData/SimpleData, TimeSpan,
empty/whitespace text, multi-geometry nesting) and asserts dict
equality of build_feature_collection / build_layers / both style
catalogs between this engine and the reference library."""

from __future__ import annotations

import random

import pytest

from kml2geojson_spark import (
    build_feature_collection_dict,
    build_layers_dicts,
    build_style_catalog,
    parse_kml,
)

from .conftest import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not available"
)


def _coords(rng: random.Random, n: int, dims: int) -> str:
    sep = rng.choice(["\n   ", " ", "\n\t"])
    tuples = []
    for _ in range(n):
        parts = [f"{rng.uniform(-180, 180):.6f}", f"{rng.uniform(-85, 85):.6f}"]
        if dims == 3:
            parts.append(str(rng.randint(0, 5000)))
        tuples.append(",".join(parts))
    return sep.join(tuples)


def _name(rng: random.Random) -> str:
    choices = [
        "plain name",
        "<![CDATA[cdata name & <stuff>]]>",
        "entity &amp; name",
        "\n  padded  \n",
        "",
        "dup",  # encourage disambiguation collisions
        "dup1",
    ]
    return rng.choice(choices)


def _geometry(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if r < 0.30:
        return (f"<Point><coordinates>{_coords(rng, 1, rng.choice([2, 3]))}"
                "</coordinates></Point>")
    if r < 0.45:
        return (f"<LineString><tessellate>1</tessellate><coordinates>"
                f"{_coords(rng, rng.randint(2, 5), 3)}</coordinates></LineString>")
    if r < 0.55:
        rings = "".join(
            "<LinearRing><coordinates>"
            f"{_coords(rng, 4, 3)}</coordinates></LinearRing>"
            for _ in range(rng.randint(1, 3)))
        return ("<Polygon><outerBoundaryIs>" + rings +
                "</outerBoundaryIs></Polygon>")
    if r < 0.63:
        whens = "".join(f"<when>2010-05-28T02:0{i}:09Z</when>"
                        for i in range(rng.randint(0, 3)))
        coords = "".join(
            f"<gx:coord>{rng.uniform(-180, 180):.4f} "
            f"{rng.uniform(-85, 85):.4f} {rng.randint(0, 100)}</gx:coord>"
            for _ in range(rng.randint(1, 3)))
        tag = rng.choice(["gx:Track", "Track"])
        return f"<{tag}>{whens}{coords}</{tag}>"
    if r < 0.72:
        return "<Point><coordinates />  </Point>" if rng.random() < 0.5 \
            else "<LineString><coordinates></coordinates></LineString>"
    if r < 0.85 and depth < 2:
        inner = "".join(_geometry(rng, depth + 1)
                        for _ in range(rng.randint(1, 3)))
        return f"<MultiGeometry><!-- mixed -->{inner}</MultiGeometry>"
    if depth < 2:
        inner = "".join(_geometry(rng, depth + 1)
                        for _ in range(rng.randint(1, 2)))
        tag = rng.choice(["gx:MultiTrack", "MultiTrack"])
        return f"<{tag}>{inner}</{tag}>"
    return (f"<Point><coordinates>{_coords(rng, 1, 2)}</coordinates></Point>")


def _placemark(rng: random.Random, i: int) -> str:
    bits = []
    if rng.random() < 0.8:
        bits.append(f"<name>{_name(rng)}</name>")
    if rng.random() < 0.4:
        bits.append(rng.choice([
            "<description>  <![CDATA[\n\n   desc &lt;b&gt; text\n]]></description>",
            "<description>plain <!-- broken by comment --> tail</description>",
            "<description></description>",
        ]))
    if rng.random() < 0.4:
        url = rng.choice(["#style0", "style1", "#missing"])
        bits.append(f"<styleUrl>{url}</styleUrl>")
    if rng.random() < 0.3:
        bits.append(
            "<Style><PolyStyle><color>"
            + rng.choice(["7f0000ff", "ffcc00", "f0f", "#ee001122", "junk"])
            + "</color><fill>" + rng.choice(["0", "1"]) + "</fill>"
            "<outline>" + rng.choice(["0", "1"]) + "</outline></PolyStyle>"
            "<LineStyle><color>501400E6</color><width>"
            + rng.choice(["0", "4", "2.5", ""]) + "</width></LineStyle></Style>")
    if rng.random() < 0.3:
        bits.append(
            "<ExtendedData><Data name=\"k1\"><value>v&amp;1</value></Data>"
            "<Data name=\"k2\"></Data>"
            "<SchemaData><SimpleData name=\"s1\"> 3.14159 </SimpleData>"
            "</SchemaData></ExtendedData>")
    if rng.random() < 0.2:
        bits.append("<TimeSpan><begin>2011-02-03</begin></TimeSpan>")
    if rng.random() < 0.85:
        bits.append(_geometry(rng))
    attr = f' id="pm{i}"' if rng.random() < 0.3 else ""
    return f"<Placemark{attr}>{''.join(bits)}</Placemark>"


def make_fuzz_kml(seed: int) -> str:
    rng = random.Random(seed)
    n = rng.randint(1, 8)
    pms = [_placemark(rng, i) for i in range(n)]
    styles = "".join(
        f'<Style id="style{j}"><LineStyle><color>7f0000ff</color>'
        f"<width>{j}</width></LineStyle>"
        + ("<IconStyle><Icon><href> http://x/icon.png </href></Icon></IconStyle>"
           if rng.random() < 0.5 else "")
        + ("<PolyStyle><color>ee001122</color></PolyStyle>"
           if rng.random() < 0.3 else "")
        + "</Style>"
        for j in range(rng.randint(0, 3)))
    if rng.random() < 0.5:
        # nested folders: geodata duplication territory
        k = len(pms) // 2
        body = (f"<Folder><name>{_name(rng)}</name>{''.join(pms[:k])}"
                f"<Folder><name>{_name(rng)}</name>{''.join(pms[k:])}"
                "</Folder></Folder>")
    else:
        body = "".join(pms)
    doc = rng.random() < 0.8
    inner = f"<Document><name>{_name(rng)}</name>{styles}{body}</Document>" \
        if doc else styles + body
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            '<kml xmlns="http://www.opengis.net/kml/2.2" '
            'xmlns:gx="http://www.google.com/kml/ext/2.2">'
            f"{inner}</kml>")


@requires_reference
@pytest.mark.parametrize("seed", range(0, 400))
def test_differential_fuzz(reference_module, seed):
    import xml.dom.minidom as md

    kml = make_fuzz_kml(seed)
    try:
        dom = md.parseString(kml)
        expect_fc = reference_module.build_feature_collection(dom, name="f")
        expect_layers = reference_module.build_layers(dom)
        expect_svg = reference_module.build_svg_style(dom)
        expect_leaflet = reference_module.build_leaflet_style(dom)
    except Exception:
        # reference crashes on this input (e.g. unparsable color/coords)
        # — engine behavior on reference-crashing inputs is unspecified
        return

    root = parse_kml(kml)
    assert build_feature_collection_dict(root, name="f") == expect_fc, kml
    assert build_layers_dicts(root) == expect_layers, kml
    assert build_style_catalog(root, "svg") == expect_svg, kml
    assert build_style_catalog(root, "leaflet") == expect_leaflet, kml
