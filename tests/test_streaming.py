"""Structured Streaming surface: incremental tiling over a growing
spans table equals the batch result."""

from __future__ import annotations

import pandas as pd

import kml2geojson_spark as k2gs
from kml2geojson_spark.streaming import (
    stream_documents,
    stream_tile_counts,
    stream_to_lineage,
)
from kml2geojson_spark.spatial import tile_assignments_from_docs


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_stream_tile_counts_equals_batch(spark, tmp_path):
    src = str(tmp_path / "incoming")
    docs = k2gs.synthesize_documents_kml(spark, 40, seed=21, max_placemarks=8)
    docs.write.parquet(src)

    stream = stream_documents(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    tiles = stream_tile_counts(stream, res=6)
    q = (tiles.writeStream.format("memory").queryName("tiles_mem")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM tiles_mem").toPandas()
    batch = (tile_assignments_from_docs(spark.read.parquet(src), 6)
             .select("cell_id", "n_features").toPandas())
    assert _sorted(got).equals(_sorted(batch))


def test_stream_to_lineage_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "incoming2")
    docs = k2gs.synthesize_documents_kml(spark, 20, seed=22, max_placemarks=5)
    docs.write.parquet(src)

    writer = stream_to_lineage(
        stream_documents(spark, src), res=6,
        out_root=str(tmp_path / "stages"),
        checkpoint_dir=str(tmp_path / "sck"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    from kml2geojson_spark.lineage import LineageLog
    log = LineageLog(tmp_path / "stages")
    latest = log.latest("tiles")
    assert latest is not None and latest["status"] == "committed"
    assert latest["total_rows"] > 0
    assert all(p["cells"] is not None for p in latest["partitions"])
