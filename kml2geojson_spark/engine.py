"""Spark-side conversion engine.

Input contract (BASELINE.json input_hint): an Iceberg-style table

    documents_kml(doc_id: string,
                  spans: array<struct<kind:string, text:string,
                                      media_ref:string, offset:int>>)

where concatenating ``spans.text`` in ``offset`` order reconstructs the
exact KML string the reference reads from disk
(/root/reference/kml2geojson/main.py:577-583) — span-sequence equality.

All Python execution is Arrow-batched (``mapInPandas``); there are no
row-at-a-time Python UDFs anywhere in the engine. Parsing is a narrow
transformation: one pass over the documents, no shuffle. Downstream
grouping/joins are plain DataFrame ops so Catalyst owns the physical
plan (broadcast vs SMJ, AQE, partial aggregation).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .convert_core import (
    build_feature_collection_dict,
    build_layers_dicts,
    build_style_catalog,
    convert_kml_string,
)
from .kmlparse import parse_kml

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------

SPANS_FIELD = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
DOCUMENTS_KML_SCHEMA = f"doc_id string, spans {SPANS_FIELD}"

CONVERTED_SCHEMA = (
    "doc_id string, style_json string, layer_names array<string>, "
    "layers array<string>"
)

FEATURES_SCHEMA = (
    "doc_id string, layer_idx int, layer_name string, feature_idx int, "
    "geom_idx int, geom_type string, parts array<array<array<double>>>, "
    "name string, style_url string, feature_id string, props_json string, "
    "feature_json string"
)

STYLES_SCHEMA = "doc_id string, style_id string, style_json string"


# ---------------------------------------------------------------------------
# Span reassembly
# ---------------------------------------------------------------------------

def reassemble_spans_kml(spans) -> str:
    """Concatenate span text in offset order → the original KML string.

    Enforces the per-row invariant vs the reference (span-sequence
    equality): spans may arrive unsorted; ``offset`` is authoritative.
    Accepts the shapes Arrow hands to pandas workers (list of dicts) as
    well as Rows/namedtuples for driver-side use.
    """
    def key(s):
        return s["offset"] if isinstance(s, dict) else s.offset

    def text(s):
        return s["text"] if isinstance(s, dict) else s.text

    return "".join(text(s) for s in sorted(spans, key=key))


# ---------------------------------------------------------------------------
# Whole-document conversion (golden-parity surface)
# ---------------------------------------------------------------------------

def convert_documents(
    df: DataFrame,
    feature_collection_name: Optional[str] = None,
    style_type: Optional[str] = None,
    *,
    separate_folders: bool = False,
) -> DataFrame:
    """documents_kml → one row per document with the full conversion
    result: the reference's ``convert`` (main.py:548-603) as a
    distributed table-to-table operator.

    Output: (doc_id, style_json, layer_names, layers) where ``layers``
    holds one canonical-JSON FeatureCollection per layer. JSON strings
    keep int-vs-float fidelity (e.g. ``"stroke-width": 1`` vs ``4.0``).
    """
    from .constants import STYLE_TYPES

    # Fail fast on the driver (reference main.py:594-597 raises the same
    # ValueError) instead of lazily inside an executor task.
    if style_type is not None and style_type not in STYLE_TYPES:
        raise ValueError(f"style type must be one of {list(STYLE_TYPES)}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, style_jsons, name_lists, layer_lists = [], [], [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                kml_str = reassemble_spans_kml(spans)
                style, layers = convert_kml_string(
                    kml_str,
                    feature_collection_name=feature_collection_name,
                    style_type=style_type,
                    separate_folders=separate_folders,
                )
                doc_ids.append(doc_id)
                style_jsons.append(None if style is None else json.dumps(style))
                name_lists.append([la.get("name", "") for la in layers])
                layer_lists.append([json.dumps(la) for la in layers])
            yield pd.DataFrame({
                "doc_id": doc_ids,
                "style_json": style_jsons,
                "layer_names": name_lists,
                "layers": layer_lists,
            })

    return df.select("doc_id", "spans").mapInPandas(run, CONVERTED_SCHEMA)


# ---------------------------------------------------------------------------
# Typed feature extraction (spatial-engine surface)
# ---------------------------------------------------------------------------

def _atomic_geometries(geometry: dict) -> list[dict]:
    if geometry["type"] == "GeometryCollection":
        return geometry["geometries"]
    return [geometry]


def _geometry_parts(geom: dict) -> list[list[list[float]]]:
    """Canonical depth-3 carrier: Polygon → rings; LineString → [line];
    Point → [[position]]. Positions stay 2-D or 3-D as parsed."""
    gtype = geom["type"]
    coords = geom["coordinates"]
    if gtype == "Point":
        return [[coords]] if coords else [[]]
    if gtype == "LineString":
        return [coords]
    return coords  # Polygon rings


def extract_features(
    df: DataFrame,
    *,
    separate_folders: bool = False,
) -> DataFrame:
    """documents_kml → exploded typed feature/geometry rows.

    One output row per atomic geometry (GeometryCollections are
    unnested with a ``geom_idx``), carrying both the typed coordinate
    parts (for the tiling engine) and the canonical feature JSON (for
    layer reassembly / golden checks). Narrow map — no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "layer_idx", "layer_name", "feature_idx",
                "geom_idx", "geom_type", "parts", "name", "style_url",
                "feature_id", "props_json", "feature_json")}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                kml_str = reassemble_spans_kml(spans)
                root = parse_kml(kml_str)
                if separate_folders:
                    layers = build_layers_dicts(root)
                else:
                    layers = [build_feature_collection_dict(root)]
                for layer_idx, layer in enumerate(layers):
                    layer_name = layer.get("name", "")
                    for feature_idx, feature in enumerate(layer["features"]):
                        props = feature["properties"]
                        fjson = json.dumps(feature)
                        pjson = json.dumps(props)
                        for geom_idx, geom in enumerate(
                                _atomic_geometries(feature["geometry"])):
                            rows["doc_id"].append(doc_id)
                            rows["layer_idx"].append(layer_idx)
                            rows["layer_name"].append(layer_name)
                            rows["feature_idx"].append(feature_idx)
                            rows["geom_idx"].append(geom_idx)
                            rows["geom_type"].append(geom["type"])
                            rows["parts"].append(_geometry_parts(geom))
                            rows["name"].append(props.get("name"))
                            rows["style_url"].append(props.get("styleUrl"))
                            rows["feature_id"].append(feature.get("id"))
                            rows["props_json"].append(pjson)
                            rows["feature_json"].append(fjson)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "spans").mapInPandas(run, FEATURES_SCHEMA)


def extract_styles(df: DataFrame, style_type: str = "svg") -> DataFrame:
    """documents_kml → (doc_id, style_id, style_json): the per-document
    style catalog (reference main.py:215-340) as a join-able dimension
    table. Tiny relative to features — intended for broadcast."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, style_ids, style_jsons = [], [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                catalog = build_style_catalog(
                    parse_kml(reassemble_spans_kml(spans)), style_type)
                for style_id, props in catalog.items():
                    doc_ids.append(doc_id)
                    style_ids.append(style_id)
                    style_jsons.append(json.dumps(props))
            yield pd.DataFrame({
                "doc_id": doc_ids,
                "style_id": style_ids,
                "style_json": style_jsons,
            })

    return df.select("doc_id", "spans").mapInPandas(run, STYLES_SCHEMA)


def resolve_styles(features: DataFrame, styles: DataFrame) -> DataFrame:
    """Attach the referenced style catalog entry to each feature row —
    the distributed equivalent of the reference's styleUrl → style-dict
    lookup (main.py:415-419 + the style catalog). The styles side is a
    small dimension → explicit broadcast hash join, no shuffle of the
    (huge) feature side."""
    dim = F.broadcast(
        styles.select(
            F.col("doc_id").alias("s_doc_id"),
            F.col("style_id"),
            F.col("style_json").alias("resolved_style_json"),
        )
    )
    return features.join(
        dim,
        on=[features["doc_id"] == dim["s_doc_id"],
            features["style_url"] == dim["style_id"]],
        how="left",
    ).drop("s_doc_id", "style_id")


def layer_feature_counts(df: DataFrame, *, separate_folders: bool = True) -> DataFrame:
    """Flagship aggregate: features per (doc, layer) — exercises the
    full physical skeleton (scan → Arrow parse → explode → hash agg)."""
    feats = extract_features(df, separate_folders=separate_folders)
    return (
        feats.where(F.col("geom_idx") == 0)  # one row per feature
        .groupBy("doc_id", "layer_idx", "layer_name")
        .agg(F.count(F.lit(1)).alias("n_features"))
    )
