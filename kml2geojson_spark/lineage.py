"""Checkpoint / lineage: Iceberg-style snapshot manifests per stage so a
killed job resumes without recompute (BASELINE.json north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

No Iceberg runtime jars exist in this environment (SURVEY.md §0), so the
layer is parquet data files + a JSON snapshot manifest we maintain
ourselves, Iceberg-shaped:

    <root>/<stage>/<snapshot_id>/data/*.parquet
    <root>/<stage>/<snapshot_id>/manifest.json
    <root>/<stage>/LATEST            (pointer file)

- ``snapshot_id`` is a content hash of (stage name, parent snapshot ids,
  stage params) — the lineage DAG is encoded in the ids themselves, so a
  resume only reuses a checkpoint whose *entire upstream chain* is
  unchanged.
- ``manifest.json`` records status, wall time, totals, and per-partition
  lineage rows ``(partition_id, input_snapshot, rows, cells)`` computed
  from the persisted data (one cheap aggregation).
- Writes are atomic: data first, then manifest to a temp name + rename;
  a crash mid-write leaves status != "committed" and the stage reruns.

``run_stage`` also cuts the Spark lineage chain: downstream stages read
the checkpointed parquet, so a 40-stage pipeline never rebuilds a
kilometer-long logical plan and retried tasks re-read stable input.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

_PID = "_lineage_pid"


def _snapshot_id(stage: str, parents: Sequence[str], params) -> str:
    payload = json.dumps({"stage": stage, "parents": list(parents),
                          "params": params}, sort_keys=True, default=str)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


class LineageLog:
    """Snapshot log for one pipeline root directory."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- paths ------------------------------------------------------------

    def _stage_dir(self, stage: str, sid: str) -> Path:
        return self.root / stage / sid

    def manifest(self, stage: str, sid: str) -> Optional[dict]:
        p = self._stage_dir(stage, sid) / "manifest.json"
        if not p.is_file():
            return None
        try:
            return json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            return None

    # -- core -------------------------------------------------------------

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        builder: Callable[[], DataFrame],
        *,
        parents: Sequence[str] = (),
        params=None,
        cell_col: Optional[str] = None,
    ) -> tuple[DataFrame, dict]:
        """Build-or-resume one stage.

        If a committed manifest exists for this (stage, parents, params)
        snapshot, the builder is NOT invoked — the persisted parquet is
        returned (resume without recompute). Otherwise the builder runs,
        the result is persisted, per-partition lineage is recorded, and
        the manifest committed.

        Returns (DataFrame read from the checkpoint, manifest dict).
        """
        sid = _snapshot_id(stage, parents, params)
        sdir = self._stage_dir(stage, sid)
        data_dir = sdir / "data"

        existing = self.manifest(stage, sid)
        if existing is not None and existing.get("status") == "committed":
            # drop the internal partition column on resume too, so the
            # schema is identical between fresh and resumed runs
            return spark.read.parquet(str(data_dir)).drop(_PID), existing

        t0 = time.time()
        df = builder().withColumn(_PID, F.spark_partition_id())
        df.write.mode("overwrite").parquet(str(data_dir))
        persisted = spark.read.parquet(str(data_dir))

        aggs = [F.count(F.lit(1)).alias("rows")]
        if cell_col is not None and cell_col in persisted.columns:
            aggs.append(F.countDistinct(cell_col).alias("cells"))
        part_rows = persisted.groupBy(_PID).agg(*aggs).collect()
        wall = time.time() - t0

        input_snapshot = parents[0] if parents else None
        partitions = sorted(
            ({"partition_id": int(r[_PID]),
              "input_snapshot": input_snapshot,
              "rows": int(r["rows"]),
              "cells": int(r["cells"]) if "cells" in r.asDict() else None}
             for r in part_rows),
            key=lambda d: d["partition_id"])

        manifest = {
            "format": "kml2geojson-spark/lineage-v1",
            "stage": stage,
            "snapshot_id": sid,
            "parents": list(parents),
            "params": params,
            "status": "committed",
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "wall_time_s": round(wall, 3),
            "total_rows": sum(p["rows"] for p in partitions),
            "n_partitions": len(partitions),
            "partitions": partitions,
        }
        tmp = sdir / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, sdir / "manifest.json")
        (self.root / stage / "LATEST").write_text(sid)

        return persisted.drop(_PID), manifest

    def latest(self, stage: str) -> Optional[dict]:
        p = self.root / stage / "LATEST"
        if not p.is_file():
            return None
        return self.manifest(stage, p.read_text().strip())


class Pipeline:
    """Thin sequential-stage runner threading snapshot ids so each
    stage's identity covers its whole upstream chain."""

    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.log = LineageLog(root)
        self._last_sid: list[str] = []
        self.manifests: dict[str, dict] = {}

    def stage(self, name: str, builder: Callable[[], DataFrame], *,
              params=None, cell_col: Optional[str] = None) -> DataFrame:
        df, manifest = self.log.run_stage(
            self.spark, name, builder,
            parents=tuple(self._last_sid), params=params, cell_col=cell_col)
        self._last_sid = [manifest["snapshot_id"]]
        self.manifests[name] = manifest
        return df
