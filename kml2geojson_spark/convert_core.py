"""Per-document KML→GeoJSON conversion semantics.

Behavioral contract: byte-for-byte dict equality with
mrcagney/kml2geojson v5.1.0 on every fixture in the reference test
corpus (/root/reference/tests/test_main.py:63-162). Each function's
docstring cites the reference lines whose semantics it reproduces; the
code itself is written fresh for this engine (shared parameterized style
builder, iterative geometry extraction, spec-driven property extraction)
rather than translated.

These functions are pure Python over the :mod:`kmlparse` Element tree
and run inside Arrow-batched Spark workers (`mapInPandas`); they carry
no Spark dependency so they are unit-testable without a session.
"""

from __future__ import annotations

import re
from typing import Optional

from .constants import GEOTYPES, MULTI_CONTAINERS, STYLE_KEYS
from .kmlparse import Element

_WS = re.compile(r"\s+")
_FILENAME_JUNK = re.compile(r"(?u)[^-\w. ]")


# ---------------------------------------------------------------------------
# Scalar helpers
# ---------------------------------------------------------------------------

def parse_coord_tuple(s: str) -> list[float]:
    """One KML coordinate tuple → floats. All whitespace is removed
    before splitting on commas, so ``' -112.2,36.0,2357 '`` →
    ``[-112.2, 36.0, 2357.0]`` (reference ``coords1``, main.py:83-93)."""
    return [float(part) for part in _WS.sub("", s).split(",")]


def parse_coord_seq(s: str) -> list[list[float]]:
    """Whitespace-separated tuple sequence → list of float lists
    (reference ``coords``, main.py:96-110). Empty/blank input → []."""
    return [parse_coord_tuple(tok) for tok in s.split()]


def parse_gx_coord(s: str) -> list[float]:
    """One ``<gx:coord>`` payload, split on single spaces
    (reference ``gx_coords1``, main.py:113-123)."""
    return [float(part) for part in s.split(" ")]


def _float_or_none(s: str) -> Optional[float]:
    """float(s) with the reference's None-on-failure contract
    (``valf``, main.py:65-73; a missing element reads as "")."""
    try:
        return float(s)
    except ValueError:
        return None


def _elem_text(el: Optional[Element]) -> str:
    """Text of an element that may be absent (the reference's
    ``val(get1(...))`` pattern returns "" for None, main.py:54-62)."""
    return el.text() if el is not None else ""


def disambiguate_names(names: list[str], mark: str = "1") -> list[str]:
    """Sequential rename: append ``mark`` until the name is unseen.
    Collision chains interact with earlier results, e.g.
    ``['bingo','bingo1','bongo','bingo','bro','bongo']`` →
    ``['bingo','bingo1','bongo','bingo11','bro','bongo1']``
    (reference ``disambiguate``, main.py:146-165; test_main.py:85-89).
    Order-dependent and stateful — intentionally run per-document inside
    the parse worker, never as a window function."""
    taken = set()
    out = []
    for name in names:
        candidate = name
        while candidate in taken:
            candidate = candidate + mark
        taken.add(candidate)
        out.append(candidate)
    return out


def sanitize_filename(s: str) -> str:
    """Filename-safe layer name: strip non ``[-\\w. ]``, trim, spaces→_
    (reference ``to_filename``, main.py:168-182)."""
    cleaned = _FILENAME_JUNK.sub("", s)
    return cleaned.strip().replace(" ", "_")


def color_and_opacity(s: str) -> tuple[str, float]:
    """KML ``aabbggrr`` color → (``#rrggbb``, opacity).

    Reference ``build_rgb_and_opacity`` (main.py:188-212): leading ``#``
    stripped; 8 hex chars → byte-reversed bgr→rgb with opacity
    ``round(alpha/256, 2)`` (division by 256, NOT 255 — ``'ee'`` → 0.93,
    test_main.py:25-28); 6 chars → byte-pair reverse, opacity stays the
    *int* 1; 3 chars → string reverse; anything else → ``#000000``.
    The int-vs-float opacity distinction is preserved for JSON fidelity.
    """
    body = s[1:] if s.startswith("#") else s
    rgb = "000000"
    opacity: float = 1  # int on purpose
    n = len(body)
    if n == 8:
        rgb = body[6:8] + body[4:6] + body[2:4]
        opacity = round(int(body[0:2], 16) / 256, 2)
    elif n == 6:
        rgb = body[4:6] + body[2:4] + body[0:2]
    elif n == 3:
        rgb = body[::-1]
    return "#" + rgb, opacity


# ---------------------------------------------------------------------------
# Style catalogs
# ---------------------------------------------------------------------------

def _apply_poly_style(props: dict, poly: Element, K: dict) -> None:
    """PolyStyle contribution to a style/property dict.

    Semantics from reference main.py:237-255 (and the identical inline
    variant main.py:420-439): a color sets fill+default border including
    int stroke-width 1; the 0/1 ``fill``/``outline`` flags force-set on
    0 but only set-if-absent on 1.
    """
    color = _elem_text(poly.find("color"))
    if color:
        rgb, opacity = color_and_opacity(color)
        props[K["fill_color"]] = rgb
        props[K["fill_opacity"]] = opacity
        props[K["stroke_color"]] = rgb
        props[K["stroke_opacity"]] = opacity
        props[K["stroke_width"]] = 1
    fill_flag = _float_or_none(_elem_text(poly.find("fill")))
    if fill_flag == 0:
        props[K["fill_opacity"]] = fill_flag
    elif fill_flag == 1 and K["fill_opacity"] not in props:
        props[K["fill_opacity"]] = fill_flag
    outline_flag = _float_or_none(_elem_text(poly.find("outline")))
    if outline_flag == 0:
        props[K["stroke_opacity"]] = outline_flag
    elif outline_flag == 1 and K["stroke_opacity"] not in props:
        props[K["stroke_opacity"]] = outline_flag


def _apply_line_style(props: dict, line: Element, K: dict, *, width_truthy: bool) -> None:
    """LineStyle contribution. In style catalogs a width is applied when
    ``is not None`` (main.py:263-265) but in inline feature styles via
    truthiness — width 0 is dropped (main.py:446-448). The caller picks
    with ``width_truthy``."""
    color = _elem_text(line.find("color"))
    if color:
        rgb, opacity = color_and_opacity(color)
        props[K["stroke_color"]] = rgb
        props[K["stroke_opacity"]] = opacity
    width = _float_or_none(_elem_text(line.find("width")))
    if (width if width_truthy else width is not None):
        props[K["stroke_width"]] = width


def build_style_catalog(root: Element, style_type: str) -> dict:
    """All ``<Style id>`` nodes → ``{"#id": {props}}`` in the requested
    key vocabulary. One parameterized walk replaces the reference's twin
    ``build_svg_style``/``build_leaflet_style`` (main.py:215-340).

    Visit order inside a Style is fixed (PolyStyle → LineStyle →
    IconStyle) and an IconStyle containing an ``<Icon>`` RESETS the
    accumulated props to just ``{iconUrl}`` (main.py:266-272)."""
    K = STYLE_KEYS[style_type]
    catalog = {}
    for style in root.find_all("Style"):
        props: dict = {}
        for poly in style.find_all("PolyStyle"):
            _apply_poly_style(props, poly, K)
        for line in style.find_all("LineStyle"):
            _apply_line_style(props, line, K, width_truthy=False)
        for icon_style in style.find_all("IconStyle"):
            icon = icon_style.find("Icon")
            if icon is None:
                continue
            props = {K["icon_url"]: _elem_text(icon.find("href"))}
        catalog["#" + style.attr("id")] = props
    return catalog


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

_CONTAINER_SET = frozenset(MULTI_CONTAINERS)
_GEOTYPE_SET = frozenset(GEOTYPES)


def _collect_geo_nodes(node: Element):
    """One preorder walk → (winning multi-container | None,
    {geotype: [nodes in document order]}).

    Equivalent to the reference's repeated ``get1``/``get`` subtree
    scans (main.py:349-359) — container priority is by MULTI_CONTAINERS
    order (not document position), each with its first (preorder)
    occurrence — but ~8× fewer traversals per placemark.
    """
    containers: dict = {}
    buckets: dict = {g: [] for g in GEOTYPES}
    # inlined preorder walk (≡ node.iter_elements()): this runs once
    # per placemark on the bulk path — the explicit stack avoids the
    # generator frame suspension per element
    Element_t = type(node)
    stack = [c for c in reversed(node.children) if type(c) is Element_t]
    while stack:
        el = stack.pop()
        t = el.tag
        if t in _GEOTYPE_SET:
            buckets[t].append(el)
        elif t in _CONTAINER_SET and t not in containers:
            containers[t] = el
        for c in reversed(el.children):
            if type(c) is Element_t:
                stack.append(c)
    for tag in MULTI_CONTAINERS:
        if tag in containers:
            return containers[tag], buckets
    return None, buckets


def _extract_geometries(node: Element) -> tuple[list[dict], list[list[str]]]:
    """Geometry extraction for one placemark-ish node → (geoms, times).

    Reference ``build_geometry`` (main.py:343-394):

    - The first MultiGeometry / MultiTrack / gx:MultiTrack descendant
      (checked in that order) wins and recursion descends into it,
      discarding sibling geometries (main.py:349-354).
    - Otherwise atomic geometries are collected grouped by GEOTYPES
      order — NOT document order (main.py:355-359).
    - Point → single tuple; LineString → tuple sequence; Polygon → every
      descendant LinearRing in document order (no outer/inner
      distinction); Track/gx:Track → LineString from ``<gx:coord>``
      values zipped with ``<when>`` timestamps (main.py:360-392,
      gx_coords main.py:126-143).
    """
    container, buckets = _collect_geo_nodes(node)
    if container is not None:
        return _extract_geometries(container)

    geoms: list[dict] = []
    times: list[list[str]] = []
    for geotype in GEOTYPES:
        for geonode in buckets[geotype]:
            if geotype == "Point":
                geoms.append({
                    "type": "Point",
                    "coordinates": parse_coord_tuple(
                        _elem_text(geonode.find("coordinates"))),
                })
            elif geotype == "LineString":
                geoms.append({
                    "type": "LineString",
                    "coordinates": parse_coord_seq(
                        _elem_text(geonode.find("coordinates"))),
                })
            elif geotype == "Polygon":
                geoms.append({
                    "type": "Polygon",
                    "coordinates": [
                        parse_coord_seq(_elem_text(ring.find("coordinates")))
                        for ring in geonode.find_all("LinearRing")
                    ],
                })
            else:  # Track / gx:Track
                geoms.append({
                    "type": "LineString",
                    "coordinates": [
                        parse_gx_coord(c.text())
                        for c in geonode.find_all("gx:coord")
                    ],
                })
                whens = [w.text() for w in geonode.find_all("when")]
                if whens:
                    times.append(whens)
    return geoms, times


# ---------------------------------------------------------------------------
# Features, collections, layers
# ---------------------------------------------------------------------------

def build_feature_dict(node: Element) -> Optional[dict]:
    """One Placemark → GeoJSON Feature dict, or None when it has no
    geometry (reference ``build_feature``, main.py:397-484).

    Property extraction is first-descendant-only per tag (the
    reference's ``[:1]`` slices). Notables: empty name/description are
    skipped; styleUrl gets ``#`` prepended when missing; inline
    PolyStyle/LineStyle always use the svg key vocabulary; LineStyle
    width uses truthiness (width 0 dropped, main.py:446-448);
    ExtendedData Data@name→<value> text and SimpleData@name→text all
    stay strings; a single track's times flatten to one list
    (main.py:460-465); multiple geometries wrap in a
    GeometryCollection; a placemark ``id`` attribute becomes the
    feature id (main.py:481-482)."""
    geoms, times = _extract_geometries(node)
    if not geoms:
        return None

    K = STYLE_KEYS["svg"]
    props: dict = {}

    name_el = node.find("name")
    if name_el is not None:
        name = name_el.text()
        if name:
            props["name"] = name
    desc_el = node.find("description")
    if desc_el is not None:
        desc = desc_el.text()
        if desc:
            props["description"] = desc
    style_url_el = node.find("styleUrl")
    if style_url_el is not None:
        style_url = style_url_el.text()
        # reference indexes style_url[0] (main.py:417) — an empty
        # styleUrl crashes there; we normalize "" → "#" instead of
        # failing the whole partition.
        if not style_url.startswith("#"):
            style_url = "#" + style_url
        props["styleUrl"] = style_url
    poly = node.find("PolyStyle")
    if poly is not None:
        _apply_poly_style(props, poly, K)
    line = node.find("LineStyle")
    if line is not None:
        _apply_line_style(props, line, K, width_truthy=True)
    ext = node.find("ExtendedData")
    if ext is not None:
        for data in ext.find_all("Data"):
            props[data.attr("name")] = _elem_text(data.find("value"))
        for simple in ext.find_all("SimpleData"):
            props[simple.attr("name")] = simple.text()
    span = node.find("TimeSpan")
    if span is not None:
        props["timeSpan"] = {
            "begin": _elem_text(span.find("begin")),
            "end": _elem_text(span.find("end")),
        }
    if times:
        props["times"] = times[0] if len(times) == 1 else times

    feature: dict = {"type": "Feature", "properties": props}
    if len(geoms) == 1:
        feature["geometry"] = geoms[0]
    else:
        feature["geometry"] = {"type": "GeometryCollection", "geometries": geoms}
    if node.attr("id"):
        feature["id"] = node.attr("id")
    return feature


def iter_point_coords(root: Element):
    """Fast path for bulk tiling: yield (feature_idx, geom_idx, coords)
    for every Point geometry of every geometry-bearing placemark, with
    indices identical to the full feature builder (placemark document
    order; geometry-less placemarks skipped per main.py:402-404; geom
    order = :func:`_extract_geometries`). Skips all property work AND
    the coordinate parsing of non-Point geometries (their count and
    order still contribute to geom_idx) — several × cheaper than
    building feature dicts when only point coordinates are needed."""
    feature_idx = 0
    for placemark in root.find_all("Placemark"):
        node = placemark
        container, buckets = _collect_geo_nodes(node)
        while container is not None:
            node = container
            container, buckets = _collect_geo_nodes(node)
        n_geoms = sum(len(buckets[g]) for g in GEOTYPES)
        if n_geoms == 0:
            continue
        geom_idx = 0
        for geotype in GEOTYPES:
            for geonode in buckets[geotype]:
                if geotype == "Point":
                    # find_first: probed once per Point — skip the
                    # subtree-index build the amortized find() pays for
                    coords = parse_coord_tuple(
                        _elem_text(geonode.find_first("coordinates")))
                    if len(coords) >= 2:
                        yield feature_idx, geom_idx, coords
                geom_idx += 1
        feature_idx += 1


def build_feature_collection_dict(node: Element, name: Optional[str] = None) -> dict:
    """All descendant Placemarks (recursive) → FeatureCollection;
    geometry-less placemarks dropped; optional ``name`` key
    (reference ``build_feature_collection``, main.py:487-508)."""
    features = []
    for placemark in node.find_all("Placemark"):
        feature = build_feature_dict(placemark)
        if feature is not None:
            features.append(feature)
    fc: dict = {"type": "FeatureCollection", "features": features}
    if name is not None:
        fc["name"] = name
    return fc


def build_layers_dicts(root: Element, *, disambiguate: bool = True) -> list[dict]:
    """One FeatureCollection per geodata-bearing ``<Folder>`` descendant
    (recursive — nested folders DUPLICATE their geodata into every
    enclosing folder layer, reference warning main.py:518); falls back
    to the root as a single layer when no folder qualifies; layer names
    pass through :func:`disambiguate_names`
    (reference ``build_layers``, main.py:511-545)."""
    layers: list[dict] = []
    names: list[str] = []
    for folder in root.find_all("Folder"):
        name = _elem_text(folder.find("name"))
        fc = build_feature_collection_dict(folder, name)
        if fc["features"]:
            layers.append(fc)
            names.append(name)
    if not layers:
        name = _elem_text(root.find("name"))
        fc = build_feature_collection_dict(root, name)
        if fc["features"]:
            layers.append(fc)
            names.append(name)
    if disambiguate:
        for layer, new_name in zip(layers, disambiguate_names(names)):
            layer["name"] = new_name
    return layers


def convert_kml_string(
    kml_str: str,
    feature_collection_name: Optional[str] = None,
    style_type: Optional[str] = None,
    *,
    separate_folders: bool = False,
) -> tuple[Optional[dict], list[dict]]:
    """Whole-document conversion — the reference's ``convert`` entry
    point (main.py:548-603) over an in-memory string.

    Returns ``(style_catalog_or_None, layers)`` — a normalized shape
    instead of the reference's variadic tuple. ``separate_folders``
    selects folder layers vs one root FeatureCollection named
    ``feature_collection_name``; an unknown ``style_type`` raises
    ValueError against :data:`STYLE_TYPES` (main.py:594-601)."""
    from .kmlparse import parse_kml
    from .constants import STYLE_TYPES

    root = parse_kml(kml_str)
    if separate_folders:
        layers = build_layers_dicts(root)
    else:
        layers = [build_feature_collection_dict(root, name=feature_collection_name)]
    style = None
    if style_type is not None:
        if style_type not in STYLE_TYPES:
            raise ValueError(f"style type must be one of {list(STYLE_TYPES)}")
        style = build_style_catalog(root, style_type)
    return style, layers
