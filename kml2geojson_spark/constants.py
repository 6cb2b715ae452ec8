"""Engine constants.

Mirrors the reference vocabulary (/root/reference/kml2geojson/main.py:10-24):
the atomic KML geometry tag names scanned in fixed order (which determines
multi-geometry output grouping), and the supported style flavors.
"""

import re

# Atomic geometry tags, scanned in THIS order — a placemark containing
# mixed types emits geometries grouped by type in this order, not in
# document order (reference main.py:355-359).
GEOTYPES = ("Polygon", "LineString", "Point", "Track", "gx:Track")

# Multi-geometry container tags, checked in THIS order; the first one
# found wins and its siblings are discarded (reference main.py:349-354).
MULTI_CONTAINERS = ("MultiGeometry", "MultiTrack", "gx:MultiTrack")

STYLE_TYPES = ("svg", "leaflet")

# Whitespace-run pattern used by the coordinate tokenizer — exported for
# reference-name parity (main.py:24).
SPACE = re.compile(r"\s+")

# Key vocabularies for the two style flavors. One parameterized builder
# replaces the reference's two near-identical walkers
# (main.py:215-276 svg, main.py:279-340 leaflet).
STYLE_KEYS = {
    "svg": {
        "fill_color": "fill",
        "fill_opacity": "fill-opacity",
        "stroke_color": "stroke",
        "stroke_opacity": "stroke-opacity",
        "stroke_width": "stroke-width",
        "icon_url": "iconUrl",
    },
    "leaflet": {
        "fill_color": "fillColor",
        "fill_opacity": "fillOpacity",
        "stroke_color": "color",
        "stroke_opacity": "opacity",
        "stroke_width": "weight",
        "icon_url": "iconUrl",
    },
}
