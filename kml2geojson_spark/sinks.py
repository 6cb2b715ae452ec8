"""Output sinks.

- :func:`export_layers_table` — the scale path: converted documents as a
  distributed table sink (one row per layer, GeoJSON as a JSON string
  column) written with Spark's native writers.
- :func:`write_geojson_dir` — faithful reference-CLI semantics
  (``k2g``, /root/reference/kml2geojson/cli.py:40-66) for a single
  document: ``style.json`` plus one ``<stem>.geojson`` per layer, layer
  stems = sanitized + disambiguated names. Driver-side by design: the
  reference CLI is a one-file tool; the distributed sink above is what
  runs at scale.
"""

from __future__ import annotations

import json
from pathlib import Path
from pyspark.sql import DataFrame, functions as F

from .convert_core import disambiguate_names, sanitize_filename


def export_layers_table(converted: DataFrame) -> DataFrame:
    """(doc_id, style_json, layer_names, layers) → exploded layer table
    (doc_id, layer_idx, layer_name, geojson) ready for
    ``df.write.parquet/json`` — the engine's native sink shape."""
    return (converted.select(
        "doc_id", "style_json",
        F.posexplode(F.arrays_zip("layer_names", "layers"))
        .alias("layer_idx", "z"))
        .select("doc_id", "style_json", "layer_idx",
                F.col("z.layer_names").alias("layer_name"),
                F.col("z.layers").alias("geojson")))


def write_geojson_dir(row, output_dir: str | Path, *,
                      style_filename: str = "style.json") -> list[Path]:
    """Write one converted-document row the way the reference CLI does
    (cli.py:48-66): mkdir -p; style dict to ``style_filename`` when
    present; each layer to ``disambiguate(to_filename(name)).geojson``.

    ``row`` is a Row/dict with style_json, layer_names, layers.
    Returns the written paths in order (style first when written).
    """
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []

    style_json = row["style_json"]
    if style_json is not None:
        p = out / style_filename
        p.write_text(json.dumps(json.loads(style_json)))
        written.append(p)

    names = list(row["layer_names"])
    stems = disambiguate_names([sanitize_filename(n or "") for n in names])
    for stem, layer in zip(stems, row["layers"]):
        p = out / f"{stem}.geojson"
        p.write_text(json.dumps(json.loads(layer)))
        written.append(p)
    return written
