"""Equality of the optimized hot paths vs the full-fidelity paths."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

import kml2geojson_spark as k2gs
from kml2geojson_spark.engine import extract_points, extract_points_from_parquet
from kml2geojson_spark.spatial import tile_assignments, tile_assignments_from_docs


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_extract_points_equals_feature_path(spark):
    docs = k2gs.synthesize_documents_kml(spark, 60, seed=13, max_placemarks=15)
    slim = extract_points(docs).toPandas()
    full = k2gs.extract_features(docs)
    full_pts = (full.where(F.col("geom_type") == "Point")
                .where(F.size(F.col("parts")) > 0)
                .withColumn("_pos", F.col("parts")[0][0])
                .where(F.size(F.col("_pos")) >= 2)
                .select("doc_id", "layer_idx", "feature_idx", "geom_idx",
                        F.col("_pos")[0].alias("x"),
                        F.col("_pos")[1].alias("y"))).toPandas()
    assert _sorted(slim).equals(_sorted(full_pts))


def test_tile_assignments_paths_equal(spark):
    docs = k2gs.synthesize_documents_kml(spark, 60, seed=17, max_placemarks=15)
    a = tile_assignments(k2gs.extract_features(docs), 7).toPandas()
    b = tile_assignments_from_docs(docs, 7).toPandas()
    assert _sorted(a).equals(_sorted(b))


def test_parquet_file_scan_equals_row_scan(spark, tmp_path):
    docs = k2gs.synthesize_documents_kml(spark, 80, seed=19, max_placemarks=10)
    path = str(tmp_path / "corpus")
    docs.write.parquet(path)
    via_rows = extract_points(spark.read.parquet(path)).toPandas()
    via_files = extract_points_from_parquet(spark, path).toPandas()
    assert _sorted(via_rows).equals(_sorted(via_files))


def test_file_scan_missing_dir_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        extract_points_from_parquet(spark, str(tmp_path / "nope"))


def test_tile_counts_fused_kernel_parity(spark, tmp_path):
    """The fused parse+encode+partial-agg kernel must produce exactly
    the same tile table as the unfused extract→encode→agg path."""
    import kml2geojson_spark as k2gs
    from kml2geojson_spark.engine import (extract_points_from_parquet,
                                          tile_counts_from_parquet)
    from kml2geojson_spark.spatial.ops import _tile_agg

    path = str(tmp_path / "corpus")
    k2gs.synthesize_documents_kml(spark, 60, seed=13,
                                  max_placemarks=12).write.parquet(path)
    fused = {(r["cell_id"], r["n_features"], r["n_docs"])
             for r in tile_counts_from_parquet(spark, path, 7).collect()}
    unfused = {(r["cell_id"], r["n_features"], r["n_docs"])
               for r in _tile_agg(
                   extract_points_from_parquet(spark, path), 7).collect()}
    assert fused == unfused
    assert len(fused) > 0


def test_convert_documents_from_parquet_parity(spark, tmp_path):
    """The file-granular conversion scan must equal the DataFrame path
    row-for-row (same doc ids, styles, layer names, layer JSON)."""
    import kml2geojson_spark as k2gs

    docs = k2gs.synthesize_documents_kml(spark, 60, seed=11,
                                         max_placemarks=6)
    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)

    via_df = k2gs.convert_documents(
        spark.read.parquet(path), style_type="svg").collect()
    via_files = k2gs.convert_documents_from_parquet(
        spark, path, style_type="svg").collect()

    def norm(rows):
        return sorted((r["doc_id"], r["style_json"],
                       tuple(r["layer_names"]), tuple(r["layers"]))
                      for r in rows)

    assert norm(via_df) == norm(via_files)
