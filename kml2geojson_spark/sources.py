"""Input sources.

The reference reads one local KML file or file object per call
(/root/reference/kml2geojson/main.py:577-583: utf-8 decode with
``errors="ignore"``). The engine's native input is the interleaved
spans table (``documents_kml``); this module bridges the two so a
reference user can point the engine at their existing files:

- :func:`read_kml_files` — a directory/glob of raw ``.kml`` files →
  ``documents_kml(doc_id, spans)`` via Spark's distributed
  ``binaryFile`` source (file-granular tasks; scales to millions of
  files and prunes on ``pathGlobFilter`` at the scan).
- :func:`convert_kml_dir` — end-to-end ``k2g``-CLI equivalence over a
  whole directory: read → convert → one output subdirectory per input
  document with ``style.json`` + per-layer ``.geojson`` files.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .datagen import pack_spans, spans_schema


def read_kml_files(spark: SparkSession, path: str, *,
                   pattern: str = "*.kml",
                   doc_ids: str = "stem") -> DataFrame:
    """Distributed scan of raw KML files → spans table.

    ``binaryFile`` lists and reads files on executors (one task per
    file group); bytes are decoded utf-8 ``errors="ignore"`` exactly
    like the reference's reader (main.py:577-583), then packed into the
    interleaved span layout (text chunks + ``kind='media'`` spans for
    icon hrefs).

    ``doc_ids``: "stem" (file name without extension — human-friendly,
    but files with the same stem in DIFFERENT directories collide) or
    "path" (full file path — collision-free; use this for recursive
    multi-directory scans).
    """
    if doc_ids not in ("stem", "path"):
        raise ValueError("doc_ids must be 'stem' or 'path'")
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern)
             .load(path)
             .select("path", "content"))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, spans = [], []
            for p, blob in zip(pdf["path"], pdf["content"]):
                ids.append(Path(p).stem if doc_ids == "stem" else p)
                spans.append(pack_spans(bytes(blob).decode("utf-8",
                                                           "ignore")))
            yield pd.DataFrame({"doc_id": ids, "spans": spans})

    return files.mapInPandas(pack, spans_schema())


def convert_kml_dir(spark: SparkSession, input_path: str, output_dir: str, *,
                    pattern: str = "*.kml",
                    feature_collection_name: Optional[str] = None,
                    style_type: Optional[str] = None,
                    separate_folders: bool = False,
                    max_files: int = 10_000) -> list[Path]:
    """Reference-CLI (``k2g``) semantics over a directory: each input
    file gets ``<output_dir>/<doc_id>/`` with ``style.json`` (when
    ``style_type`` is set) and one ``.geojson`` per layer. The convert
    itself is distributed; only the small per-file JSON write happens
    on the driver (matching the single-file reference CLI,
    cli.py:48-66). Returns all written paths.

    ``max_files`` is the driver-safety gate (the pip_join
    ``max_driver_rings`` pattern): this CLI-parity path iterates the
    converted documents through the driver to write local files, which
    is unbounded state if pointed at a whole corpus — above the gate it
    raises instead of OOMing mid-write. For corpus-scale output use the
    distributed sink (``convert_documents`` + ``df.write``), which
    never routes rows through the driver. Rows stream through
    ``toLocalIterator`` (one partition in memory at a time), so below
    the gate peak driver memory is one partition, not the directory.
    """
    from .convert_core import disambiguate_names
    from .engine import convert_documents
    from .sinks import write_geojson_dir

    docs = read_kml_files(spark, input_path, pattern=pattern)
    n_files = docs.count()
    if n_files > max_files:
        raise ValueError(
            f"convert_kml_dir: {n_files} input files exceed max_files="
            f"{max_files}; this CLI-parity path writes through the "
            f"driver — raise max_files deliberately or use "
            f"convert_documents + a distributed writer for corpus-scale "
            f"output")
    converted = convert_documents(
        docs, feature_collection_name=feature_collection_name,
        style_type=style_type, separate_folders=separate_folders)
    written: list[Path] = []
    rows = sorted(converted.toLocalIterator(), key=lambda r: r["doc_id"])
    # same-stem files from different directories would collide on one
    # output dir and silently overwrite — disambiguate like the CLI
    # disambiguates layer stems
    dirs = disambiguate_names([r["doc_id"] for r in rows])
    for row, d in zip(rows, dirs):
        written.extend(write_geojson_dir(row, Path(output_dir) / d))
    return written


def read_kmz_files(spark: SparkSession, path: str, *,
                   pattern: str = "*.kmz",
                   doc_ids: str = "stem") -> DataFrame:
    """Distributed scan of KMZ archives (zip-wrapped KML, the Google
    Earth distribution format) → the same spans table as
    :func:`read_kml_files`, so every downstream operator works
    unchanged on zipped corpora.

    Per the KMZ convention the MAIN file is the first ``.kml`` entry
    in the archive, with a root-level ``doc.kml`` preferred when
    present; other entries (icons, overlays) are ignored here — media
    fetch is :mod:`..multimodal`'s job. Unzipping happens on
    EXECUTORS inside the same Arrow-batched ``mapInPandas`` kernel as
    the raw reader (one task per file group — embarrassingly
    parallel, nothing crosses the driver); bytes decode utf-8
    ``errors="ignore"`` exactly like the reference's reader
    (main.py:577-583). Archives with no ``.kml`` entry or that fail
    to open as zip are SKIPPED (corrupt-input discipline: a poisoned
    file must not kill a corpus-scale job); pass ``strict=True`` via
    functools.partial in tests if a hard failure is wanted —
    corruption surfaces in row-count reconciliation instead.
    """
    import io
    import zipfile

    if doc_ids not in ("stem", "path"):
        raise ValueError("doc_ids must be 'stem' or 'path'")
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern)
             .load(path)
             .select("path", "content"))

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, spans = [], []
            for p, blob in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(blob)))
                    names = [n for n in zf.namelist()
                             if n.lower().endswith(".kml")]
                    if not names:
                        continue
                    main = "doc.kml" if "doc.kml" in names else names[0]
                    text = zf.read(main).decode("utf-8", "ignore")
                except zipfile.BadZipFile:
                    continue
                ids.append(Path(p).stem if doc_ids == "stem" else p)
                spans.append(pack_spans(text))
            if ids:  # an all-skipped batch has no Arrow-typable frame
                yield pd.DataFrame({"doc_id": ids, "spans": spans})

    return files.mapInPandas(unpack, spans_schema())
