#!/usr/bin/env python
"""``k2g`` CLI — drop-in equivalent of the reference console script
(/root/reference/kml2geojson/cli.py:9-66), argparse-based (no click
dependency): convert ONE KML file into an output directory of
``style.json`` + per-layer ``.geojson`` files.

Faithful to the reference including its unpacking quirk: with no
``--style-type`` the reference runs ``style, *layers = m.convert(...)``
against a plain layer LIST (cli.py:41, main.py:601-603), so the first
FeatureCollection lands in the style file and no layer files are
written. Reproduced verbatim — switching users get byte-compatible
behavior; pass ``-st svg|leaflet`` for the useful path.

For whole-directory distributed conversion use
``kml2geojson_spark.sources.convert_kml_dir`` instead.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    from kml2geojson_spark.constants import STYLE_TYPES
    from kml2geojson_spark.convert_core import (convert_kml_string,
                                                disambiguate_names,
                                                sanitize_filename)

    ap = argparse.ArgumentParser(prog="k2g",
                                 description="Convert KML to GeoJSON")
    ap.add_argument("kml_path")
    ap.add_argument("output_dir")
    ap.add_argument("-fcn", "--feature-collection-name", default="main")
    ap.add_argument("-st", "--style-type", choices=list(STYLE_TYPES),
                    default=None)
    ap.add_argument("-sf", "--style-filename", default="style.json")
    ap.add_argument("-f", "--separate-folders", action="store_true",
                    default=False)
    args = ap.parse_args(argv)

    text = pathlib.Path(args.kml_path).read_bytes().decode("utf-8", "ignore")
    style, layers = convert_kml_string(
        text, feature_collection_name=args.feature_collection_name,
        style_type=args.style_type, separate_folders=args.separate_folders)

    if args.style_type is None:
        # reference quirk (cli.py:41): `style, *layers = <layer list>`
        style, layers = layers[0], layers[1:]

    out = pathlib.Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / args.style_filename).write_text(json.dumps(style))

    stems = disambiguate_names(
        [sanitize_filename(layer["name"]) for layer in layers])
    for stem, layer in zip(stems, layers):
        (out / f"{stem}.geojson").write_text(json.dumps(layer))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
