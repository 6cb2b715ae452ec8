"""Spatial operators over the quadtree cell index.

Design rules (BASELINE.json north_star / SURVEY.md §2.3):

- Bulk cell encoding is a pure Column expression (JVM, codegen) — the
  100-TB hot path never crosses into Python.
- Geometry-heavy kernels (polygon clipping, ray casting) run as numpy
  inside Arrow-batched ``mapInPandas`` — vectorized per batch, never
  per-row Python.
- Joins are plain DataFrame equi-joins on ``cell_id`` so Catalyst picks
  broadcast vs shuffled hash vs SMJ (with AQE); the explicitly-salted
  variant for hot cells lives in :mod:`.salted`.
- Every numeric formula that also appears in a DuckDB oracle query uses
  the identical double-precision expression so results match
  bit-for-bit (ray-cast crossing rule, interval coverage, squared
  distances).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from .cells import (
    MAX_RES,
    cell_encode_col,
    cell_encode_np,
    cell_kring_np,
    cell_bounds_np,
    cell_parent_col,
)


# ---------------------------------------------------------------------------
# Point encoding
# ---------------------------------------------------------------------------

def encode_points(df: DataFrame, res: int, lon_col: str = "x",
                  lat_col: str = "y", out_col: str = "cell_id") -> DataFrame:
    """Attach a cell id to every point row — whole-stage-codegen only."""
    return df.withColumn(out_col, cell_encode_col(F.col(lon_col), F.col(lat_col), res))


# ---------------------------------------------------------------------------
# Rectangle cover + exact interval coverage (SQL-parity path)
# ---------------------------------------------------------------------------

def cover_cells_rect(df: DataFrame, res: int, *, west: str = "west",
                     south: str = "south", east: str = "east",
                     north: str = "north",
                     with_fraction: bool = True) -> DataFrame:
    """Explode each rectangle into the grid cells it intersects at
    ``res``, with exact area-fraction of each cell covered (interval
    math — the raster←vector path for axis-aligned extents).

    Pure Column implementation: sequence + explode + Morton encode, all
    JVM-side. Fractions use ``max(0, min(e,ce)-max(w,cw)) * ... /
    cell_area`` — the same expression the DuckDB oracle runs.
    """
    n = float(1 << res)
    hi = (1 << res) - 1

    def scale_lo(c, offset, extent):
        return F.greatest(F.lit(0), F.least(F.lit(hi), F.floor(
            (F.col(c) + F.lit(offset)) / F.lit(extent) * F.lit(n)).cast("long")))

    def scale_hi(c, offset, extent):
        return F.greatest(F.lit(0), F.least(F.lit(hi), (F.ceil(
            (F.col(c) + F.lit(offset)) / F.lit(extent) * F.lit(n)) - F.lit(1)).cast("long")))

    # Spark's sequence(a, b) runs DESCENDING when a > b — a degenerate
    # (zero-width on a cell boundary) or inverted rectangle would emit
    # spurious cells. Empty-range → empty array → explode drops the row,
    # matching the DuckDB oracle's generate_series semantics.
    def seq(lo, hi):
        return F.when(F.col(hi) >= F.col(lo), F.sequence(lo, hi)) \
            .otherwise(F.array().cast("array<bigint>"))

    out = (
        df.withColumn("_ix0", scale_lo(west, 180.0, 360.0))
        .withColumn("_ix1", scale_hi(east, 180.0, 360.0))
        .withColumn("_iy0", scale_lo(south, 90.0, 180.0))
        .withColumn("_iy1", scale_hi(north, 90.0, 180.0))
        .withColumn("_ix", F.explode(seq("_ix0", "_ix1")))
        .withColumn("_iy", F.explode(seq("_iy0", "_iy1")))
    )
    # encode from grid coords: reuse the Column spreader via cell center
    cell_w = F.col("_ix") * F.lit(360.0 / n) - F.lit(180.0)
    cell_s = F.col("_iy") * F.lit(180.0 / n) - F.lit(90.0)
    cw, cs = cell_w, cell_s
    ce, cn = cell_w + F.lit(360.0 / n), cell_s + F.lit(180.0 / n)
    out = out.withColumn(
        "cell_id",
        cell_encode_col(cw + F.lit(180.0 / n), cs + F.lit(90.0 / n), res),
    )
    if with_fraction:
        ow = F.greatest(F.lit(0.0), F.least(F.col(east), ce) - F.greatest(F.col(west), cw))
        oh = F.greatest(F.lit(0.0), F.least(F.col(north), cn) - F.greatest(F.col(south), cs))
        cell_area = F.lit((360.0 / n) * (180.0 / n))
        out = out.withColumn("fraction", ow * oh / cell_area)
    return out.drop("_ix0", "_ix1", "_iy0", "_iy1", "_ix", "_iy")


# ---------------------------------------------------------------------------
# General polygon cover / coverage fractions (numpy kernel)
# ---------------------------------------------------------------------------

def _clip_half(pts: np.ndarray, axis: int, bound: float, keep_le: bool) -> np.ndarray:
    """Sutherland–Hodgman clip of a polygon against one half-plane."""
    if len(pts) == 0:
        return pts
    vals = pts[:, axis]
    inside = (vals <= bound) if keep_le else (vals >= bound)
    out = []
    m = len(pts)
    for i in range(m):
        j = (i + 1) % m
        p, q = pts[i], pts[j]
        pin, qin = inside[i], inside[j]
        if pin:
            out.append(p)
        if pin != qin:
            t = (bound - p[axis]) / (q[axis] - p[axis])
            out.append(p + t * (q - p))
    return np.asarray(out) if out else np.empty((0, 2))


def _clip_area_rect(ring: np.ndarray, w: float, s: float, e: float, n: float) -> float:
    """|area| of ring ∩ [w,e]×[s,n] (shoelace after 4 half-plane clips)."""
    pts = ring
    pts = _clip_half(pts, 0, w, keep_le=False)
    pts = _clip_half(pts, 0, e, keep_le=True)
    pts = _clip_half(pts, 1, s, keep_le=False)
    pts = _clip_half(pts, 1, n, keep_le=True)
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return abs(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _rings_to_np(rings) -> list[np.ndarray]:
    return [np.asarray([p[:2] for p in ring], dtype=np.float64)
            for ring in rings if len(ring) >= 3]


POLY_COVER_SCHEMA = "poly_id long, cell_id long, fraction double"


def polygon_cover(polygons: DataFrame, res: int, *,
                  id_col: str = "poly_id", rings_col: str = "rings",
                  min_fraction: float = 0.0) -> DataFrame:
    """General raster←vector coverage: each polygon → the cells of its
    bbox at ``res`` with the exact fraction of each cell covered
    (Sutherland–Hodgman clip + shoelace; ring 0 is the outer ring,
    further rings are holes whose clipped area is subtracted).

    numpy kernel in Arrow batches. Candidate cells per polygon are
    bounded by the bbox at ``res`` — pick ``res`` so bbox_cells ≈
    O(100..10k) per polygon; for planetary-scale polygons encode at a
    coarser parent resolution and refine hierarchically (parent =
    id >> 2) in a second pass.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nn = float(1 << res)
        cell_w, cell_h = 360.0 / nn, 180.0 / nn
        cell_area = cell_w * cell_h
        hi = (1 << res) - 1
        for pdf in batches:
            pids, cids, fracs = [], [], []
            for pid, rings in zip(pdf[id_col], pdf[rings_col]):
                rs = _rings_to_np(rings)
                if not rs:
                    continue
                outer = rs[0]
                ix0 = int(np.clip(np.floor((outer[:, 0].min() + 180.0) / 360.0 * nn), 0, hi))
                ix1 = int(np.clip(np.ceil((outer[:, 0].max() + 180.0) / 360.0 * nn) - 1, 0, hi))
                iy0 = int(np.clip(np.floor((outer[:, 1].min() + 90.0) / 180.0 * nn), 0, hi))
                iy1 = int(np.clip(np.ceil((outer[:, 1].max() + 90.0) / 180.0 * nn) - 1, 0, hi))
                for iy in range(iy0, iy1 + 1):
                    s = iy * cell_h - 90.0
                    for ix in range(ix0, ix1 + 1):
                        w = ix * cell_w - 180.0
                        area = _clip_area_rect(outer, w, s, w + cell_w, s + cell_h)
                        for hole in rs[1:]:
                            area -= _clip_area_rect(hole, w, s, w + cell_w, s + cell_h)
                        frac = area / cell_area
                        if frac > min_fraction:
                            cid = int(cell_encode_np(
                                np.array([w + cell_w / 2]),
                                np.array([s + cell_h / 2]), res)[0])
                            pids.append(int(pid))
                            cids.append(cid)
                            fracs.append(frac)
            yield pd.DataFrame({"poly_id": pids, "cell_id": cids,
                                "fraction": fracs})

    return polygons.select(F.col(id_col), F.col(rings_col)) \
        .mapInPandas(run, POLY_COVER_SCHEMA)


def coverage_fractions(polygons: DataFrame, res: int, **kw) -> DataFrame:
    """Per-cell total covered fraction across all polygons."""
    cover = polygon_cover(polygons, res, **kw)
    return cover.groupBy("cell_id").agg(
        F.sum("fraction").alias("total_fraction"),
        F.count(F.lit(1)).alias("n_polygons"),
    )


# ---------------------------------------------------------------------------
# Point-in-polygon join (cell-bucketed + ray cast)
# ---------------------------------------------------------------------------

_PIP_SCHEMA = "point_id long, poly_id long"


def _raycast_np(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Vectorized even-odd ray cast of m points against one polygon's
    rings. Crossing rule — identical expression to the SQL oracle:
    ``(y1 > py) != (y2 > py) AND px < (x2-x1)*(py-y1)/(y2-y1) + x1``.
    Holes fall out of even-odd parity automatically."""
    inside = np.zeros(len(px), dtype=np.int64)
    for ring in rings:
        r = ring
        if len(r) < 3:
            continue
        x1, y1 = r[:, 0][:, None], r[:, 1][:, None]  # (k,1)
        x2, y2 = np.roll(r[:, 0], -1)[:, None], np.roll(r[:, 1], -1)[:, None]
        cond = (y1 > py[None, :]) != (y2 > py[None, :])
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = (x2 - x1) * (py[None, :] - y1) / (y2 - y1) + x1
        cross = cond & (px[None, :] < xs)
        inside += cross.sum(axis=0)
    return (inside % 2) == 1


def pip_join(points: DataFrame, polygons: DataFrame, res: int, *,
             point_id: str = "point_id", x: str = "x", y: str = "y",
             poly_id: str = "poly_id", rings: str = "rings",
             broadcast_polygons: bool = True,
             salt: Optional[int] = None) -> DataFrame:
    """Ray-casting point-in-polygon join, bucketed by quadtree cell.

    Plan shape: points get a cell id (codegen); polygons explode to
    their bbox cover cells (numpy, tiny side); the candidate join is an
    equi-join on ``cell_id`` — broadcast when the polygon side is a
    dimension, hash otherwise (pass ``salt`` to route through the
    explicitly-salted join for hot cells); the exact ray-cast filter
    runs vectorized per Arrow batch against broadcast polygon rings.

    A point lives in exactly one cell, so candidate pairs are unique —
    no post-join dedup shuffle.
    """
    pts = encode_points(points.select(
        F.col(point_id).alias("point_id"), F.col(x).alias("x"),
        F.col(y).alias("y")), res)

    cover = polygon_cover(polygons, res, id_col=poly_id, rings_col=rings,
                          min_fraction=-1.0).select("poly_id", "cell_id")

    if salt:
        from .salted import salted_join
        cand = salted_join(pts, cover, "cell_id", n_salt=salt)
    elif broadcast_polygons:
        cand = pts.join(F.broadcast(cover), "cell_id")
    else:
        cand = pts.join(cover, "cell_id")

    ring_rows = polygons.select(F.col(poly_id).alias("poly_id"),
                                F.col(rings).alias("rings")).collect()
    ring_map = {int(r["poly_id"]): _rings_to_np(r["rings"]) for r in ring_rows}
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(ring_map)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rmap = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"point_id": [], "poly_id": []}).astype(
                    {"point_id": "int64", "poly_id": "int64"})
                continue
            keep_pt, keep_poly = [], []
            for pid, grp in pdf.groupby("poly_id"):
                rs = rmap.get(int(pid))
                if not rs:
                    continue
                mask = _raycast_np(grp["x"].to_numpy(np.float64),
                                   grp["y"].to_numpy(np.float64), rs)
                keep_pt.append(grp["point_id"].to_numpy(np.int64)[mask])
                keep_poly.append(np.full(int(mask.sum()), int(pid), dtype=np.int64))
            if keep_pt:
                yield pd.DataFrame({
                    "point_id": np.concatenate(keep_pt),
                    "poly_id": np.concatenate(keep_poly)})
            else:
                yield pd.DataFrame({"point_id": [], "poly_id": []}).astype(
                    {"point_id": "int64", "poly_id": "int64"})

    return cand.select("point_id", "x", "y", "poly_id").mapInPandas(run, _PIP_SCHEMA)


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------

def knn_exact(points: DataFrame, queries: DataFrame, k: int, *,
              point_id: str = "point_id", x: str = "x", y: str = "y",
              query_id: str = "query_id", qx: str = "x", qy: str = "y") -> DataFrame:
    """Exact kNN baseline: broadcast the query set, brute-force squared
    distance, window top-k. Deterministic tie-break on neighbor id."""
    q = F.broadcast(queries.select(
        F.col(query_id).alias("query_id"),
        F.col(qx).alias("_qx"), F.col(qy).alias("_qy")))
    p = points.select(F.col(point_id).alias("neighbor_id"),
                      F.col(x).alias("_px"), F.col(y).alias("_py"))
    d2 = ((F.col("_px") - F.col("_qx")) * (F.col("_px") - F.col("_qx"))
          + (F.col("_py") - F.col("_qy")) * (F.col("_py") - F.col("_qy")))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("neighbor_id").asc())
    return (p.crossJoin(q)
            .withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dist2", "rank"))


def knn_join(points: DataFrame, queries: DataFrame, k: int, res: int,
             radius: int, *, point_id: str = "point_id", x: str = "x",
             y: str = "y", query_id: str = "query_id") -> DataFrame:
    """kNN via k-ring expansion + exact distance re-rank
    (BASELINE.json north_star). Each query point explodes to the cells
    within Chebyshev ``radius`` rings at ``res``; candidates come from
    an equi-join on cell, then a window re-ranks by exact distance.

    Correctness contract: exact iff every query's true k-th neighbor
    lies within ``radius`` rings — i.e. within ``radius × cell_size``
    degrees (Chebyshev). Callers pick (res, radius) from the known
    density (tests verify equality against :func:`knn_exact`); an
    adaptive two-phase expansion is the planned follow-up.
    """
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(x).alias("_qx"), F.col(y).alias("_qy"))
    q = q.withColumn("_qcell", cell_encode_col(F.col("_qx"), F.col("_qy"), res))

    @F.pandas_udf("array<long>")
    def ring_cells(cells: pd.Series) -> pd.Series:
        return cells.map(lambda c: cell_kring_np(int(c), radius).tolist())

    q = q.withColumn("cell_id", F.explode(ring_cells(F.col("_qcell"))))

    p = encode_points(points.select(
        F.col(point_id).alias("neighbor_id"), F.col(x).alias("x"),
        F.col(y).alias("y")), res)

    cand = p.join(q, "cell_id")
    d2 = ((F.col("x") - F.col("_qx")) * (F.col("x") - F.col("_qx"))
          + (F.col("y") - F.col("_qy")) * (F.col("y") - F.col("_qy")))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dist2", "rank"))


def knn_join_adaptive(points: DataFrame, queries: DataFrame, k: int, res: int,
                      *, ring_radius: int = 2, level_step: int = 2,
                      point_id: str = "point_id", x: str = "x", y: str = "y",
                      query_id: str = "query_id") -> DataFrame:
    """Exact kNN via MULTI-RESOLUTION k-ring expansion — no magic radius.

    Instead of growing the ring (whose cell count grows quadratically),
    each round keeps a small fixed ring (``ring_radius``) but climbs the
    cell hierarchy ``level_step`` levels (parent = id >> 2·step) — the
    searched area quadruples per round at constant candidate-cell count.

    A query is PROVEN done when it has ≥ k candidates and its k-th
    distance fits inside the current level's guaranteed coverage
    (``ring_radius × cell_size``): any closer point would already be a
    candidate. Unsatisfied queries continue to the coarser level; at
    resolution 0 the ring is the whole grid, so convergence is
    unconditional. Each round is one equi-join + window over only the
    still-unsatisfied queries. Result equals :func:`knn_exact`
    (tested on clustered data where any fixed radius fails).
    """
    p = encode_points(points.select(
        F.col(point_id).alias("neighbor_id"), F.col(x).alias("x"),
        F.col(y).alias("y")), res).persist()

    q_all = queries.select(F.col(query_id).alias("query_id"),
                           F.col(x).alias("_qx"), F.col(y).alias("_qy"))

    @F.pandas_udf("array<long>")
    def ring_cells(cells: pd.Series) -> pd.Series:
        return cells.map(lambda c: cell_kring_np(int(c), ring_radius).tolist())

    d2 = ((F.col("x") - F.col("_qx")) * (F.col("x") - F.col("_qx"))
          + (F.col("y") - F.col("_qy")) * (F.col("y") - F.col("_qy")))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("neighbor_id").asc())

    pending = q_all
    done_parts = []
    cached = [p]  # unpersisted before return — no session-lifetime leak
    level = res
    while True:
        n = 1 << level
        cell_w, cell_h = 360.0 / n, 180.0 / n
        guarantee = ring_radius * min(cell_w, cell_h)

        q = pending.withColumn(
            "_qcell", cell_encode_col(F.col("_qx"), F.col("_qy"), level))
        q = q.withColumn("_cell_lvl", F.explode(ring_cells(F.col("_qcell"))))
        p_lvl = p.withColumn(
            "_cell_lvl",
            F.col("cell_id") if level == res
            else cell_parent_col(F.col("cell_id"), res - level))
        topk = (q.join(p_lvl, "_cell_lvl")
                .withColumn("dist2", d2)
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))
        if level == 0:
            done_parts.append(
                topk.select("query_id", "neighbor_id", "dist2", "rank"))
            break
        stats = (topk.groupBy("query_id")
                 .agg(F.count(F.lit(1)).alias("_n"),
                      F.max("dist2").alias("_dk")))
        ok = (F.col("_n") >= k) & (F.sqrt(F.col("_dk")) <= F.lit(guarantee))
        satisfied = stats.where(ok).select("query_id")
        done_parts.append(
            topk.join(F.broadcast(satisfied), "query_id", "left_semi")
            .select("query_id", "neighbor_id", "dist2", "rank"))
        pending = pending.join(F.broadcast(satisfied), "query_id",
                               "left_anti").persist()
        cached.append(pending)
        if pending.count() == 0:
            break
        level = max(level - level_step, 0)

    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    # materialize the (small: |queries| x k rows) result so every cached
    # frame it references can be released now rather than leaking for
    # the session lifetime
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


# ---------------------------------------------------------------------------
# Tile assignment
# ---------------------------------------------------------------------------

def tile_assignments(features: DataFrame, res: int) -> DataFrame:
    """Point features → per-cell tile stats: the engine's headline
    output table (cell_id, n_features, n_docs). Input is the
    ``extract_features`` frame; only Point geometries contribute
    (lines/polygons tile via :func:`polygon_cover`)."""
    pts = (features.where(F.col("geom_type") == "Point")
           .where(F.size(F.col("parts")) > 0)
           .withColumn("_pos", F.col("parts")[0][0])
           .where(F.size(F.col("_pos")) >= 2)
           .withColumn("x", F.col("_pos")[0])
           .withColumn("y", F.col("_pos")[1]))
    return _tile_agg(pts, res)


def _tile_agg(pts: DataFrame, res: int) -> DataFrame:
    # two-step instead of count+countDistinct in one agg: the combined
    # form plans an Expand that doubles every row into the shuffle; the
    # (cell_id, doc_id) pre-aggregate map-side combines the bulk of the
    # points before any exchange, and the second agg runs on tiny data
    pts = encode_points(pts, res)
    per_doc = (pts.groupBy("cell_id", "doc_id")
               .agg(F.count(F.lit(1)).alias("n")))
    return per_doc.groupBy("cell_id").agg(
        F.sum("n").alias("n_features"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def tile_assignments_from_docs(documents_kml: DataFrame, res: int) -> DataFrame:
    """Hot path: documents_kml → tile stats via the slim point
    extraction (flat Arrow columns, no feature JSON). Identical result
    to ``tile_assignments(extract_features(docs), res)`` for Point
    features — asserted in tests."""
    from ..engine import extract_points

    return _tile_agg(extract_points(documents_kml), res)


def polygon_stats(polys: DataFrame, *, rings_col: str = "rings",
                  id_col: str = "poly_id") -> DataFrame:
    """Vector analytics over polygon rings: shoelace area and perimeter
    of the outer ring, as pure Column expressions (in-order ``aggregate``
    fold over the vertex array — same double arithmetic an SQL oracle
    runs edge-by-edge). Rings are closed (first == last vertex).

    Output: (poly_id, area2 = 2x signed shoelace area, perimeter).
    """
    ring = F.col(rings_col)[0]
    idx = F.sequence(F.lit(1), F.size(ring) - 1)  # element_at is 1-based

    def vx(i):
        return F.element_at(ring, i)

    cross = F.aggregate(
        F.transform(idx, lambda i: vx(i)[0] * vx(i + 1)[1]
                    - vx(i + 1)[0] * vx(i)[1]),
        F.lit(0.0), lambda acc, v: acc + v)
    length = F.aggregate(
        F.transform(idx, lambda i: F.sqrt(
            (vx(i + 1)[0] - vx(i)[0]) * (vx(i + 1)[0] - vx(i)[0])
            + (vx(i + 1)[1] - vx(i)[1]) * (vx(i + 1)[1] - vx(i)[1]))),
        F.lit(0.0), lambda acc, v: acc + v)
    # degenerate rings (< 2 vertices, empty, or null rings) would make
    # the descending sequence index element_at(ring, 0) and crash the
    # job — they contribute 0 area/length instead
    ok = F.size(ring) >= 2
    return polys.select(F.col(id_col),
                        F.when(ok, cross).otherwise(F.lit(0.0)).alias("area2"),
                        F.when(ok, length).otherwise(F.lit(0.0))
                        .alias("perimeter"))


def rect_overlap_join(rects: DataFrame, res: int, *,
                      id_col: str = "rect_id") -> DataFrame:
    """Spatial self-join: pairs of axis-aligned rectangles with
    overlapping interiors, found via the cell-bucket candidate join —
    PROVABLY complete (an overlap region intersects some grid cell,
    which both cover lists contain), then an exact interval test.

    One shuffle on the cover cell; the exact test is a codegen'd row
    filter before the pair dedup, so the distinct only carries true
    overlaps. At 100 TB pick ``res`` so cells are near the median rect
    size (cover lists stay short and buckets stay selective); hot cells
    (dense areas) can be salted with :mod:`.salted`.

    Output: (rect_a, rect_b) with rect_a < rect_b.
    """
    cov = cover_cells_rect(rects, res, with_fraction=False)
    a = cov.select(F.col(id_col).alias("rect_a"),
                   F.col("west").alias("_wa"), F.col("south").alias("_sa"),
                   F.col("east").alias("_ea"), F.col("north").alias("_na"),
                   "cell_id")
    b = cov.select(F.col(id_col).alias("rect_b"),
                   F.col("west").alias("_wb"), F.col("south").alias("_sb"),
                   F.col("east").alias("_eb"), F.col("north").alias("_nb"),
                   "cell_id")
    overlap = ((F.col("_wa") < F.col("_eb")) & (F.col("_wb") < F.col("_ea"))
               & (F.col("_sa") < F.col("_nb")) & (F.col("_sb") < F.col("_na")))
    return (a.join(b, "cell_id")
            .where((F.col("rect_a") < F.col("rect_b")) & overlap)
            .select("rect_a", "rect_b").distinct())


def tile_pyramid(pts: DataFrame, base_res: int,
                 levels: list[int]) -> DataFrame:
    """Hypertable-style multi-resolution rollup: encode ONCE at
    ``base_res``, then derive every coarser level's cell id by the
    hierarchical parent bit-shift (parent = code >> 2·Δres — free,
    pure Column) and aggregate all levels in one shuffle. At 100 TB
    this replaces L separate scan+agg jobs with one; the exchange key
    (level, cell) also keeps level skew bounded because coarse levels
    have few cells but proportionally fewer rows after the map-side
    partial aggregate.

    Output: (level, cell_id, n_points).
    """
    from .cells import RES_BITS

    if any(lv > base_res for lv in levels):
        raise ValueError(f"levels {levels} must all be <= base_res {base_res}")
    enc = encode_points(pts, base_res)
    lvl = F.explode(F.array(*[F.lit(lv) for lv in levels])).alias("level")
    cell = F.expr(
        f"shiftleft(shiftright(cell_id, {RES_BITS} + 2 * ({base_res} - level)),"
        f" {RES_BITS}) | level").cast("long")
    return (enc.select("cell_id", lvl)
            .select("level", cell.alias("cell"))
            .groupBy("level", "cell")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .withColumnRenamed("cell", "cell_id"))


def _dp_keep_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker keep-mask (iterative, stack-based): endpoints
    always kept; a point is kept when its distance to the current
    simplification segment exceeds ``tol`` (segment-clipped distance —
    every DROPPED point is within ``tol`` of the output chain)."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        seg_l2 = float(seg @ seg)
        mid = pts[i + 1:j]
        if seg_l2 == 0.0:
            d2 = ((mid - pts[i]) ** 2).sum(axis=1)
        else:
            t = np.clip((mid - pts[i]) @ seg / seg_l2, 0.0, 1.0)
            proj = pts[i] + t[:, None] * seg
            d2 = ((mid - proj) ** 2).sum(axis=1)
        k = int(np.argmax(d2))
        if d2[k] > tol2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_lines(lines: DataFrame, tolerance: float, *,
                   id_col: str = "line_id",
                   coords_col: str = "coords") -> DataFrame:
    """Geometry generalization for multi-resolution tiling: Douglas–
    Peucker polyline simplification, numpy per line inside Arrow
    batches (``mapInPandas`` — a narrow map, no shuffle; at 100 TB each
    task simplifies its own partition's lines independently).

    Guarantees (property-tested): output vertices are a subsequence of
    the input with both endpoints kept; every dropped vertex lies
    within ``tolerance`` of the simplified chain; applying the operator
    to its own output is a fixpoint. Pair with :func:`tile_pyramid` —
    coarser levels render simplified geometry at matched tolerance
    (cell size).

    Input coords: array<array<double>> (one [x, y] per vertex).
    Output: (line_id, coords, n_in, n_out).
    """
    id_type = lines.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, n_in, n_out = [], [], [], []
            for line_id, coords in zip(pdf[id_col], pdf[coords_col]):
                # one NULL/ragged record must not abort a 100-TB job:
                # emit it unsimplified-empty instead of raising
                if coords is None:
                    ids.append(line_id)
                    outs.append([])
                    n_in.append(0)
                    n_out.append(0)
                    continue
                pts = np.asarray(
                    [c[:2] for c in coords
                     if c is not None and len(c) >= 2], dtype=np.float64)
                if len(pts) <= 2:
                    kept = pts
                else:
                    kept = pts[_dp_keep_mask(pts, tolerance)]
                ids.append(line_id)
                outs.append(kept.tolist())
                n_in.append(len(pts))
                n_out.append(len(kept))
            yield pd.DataFrame({id_col: ids, coords_col: outs,
                                "n_in": n_in, "n_out": n_out})

    return lines.select(id_col, coords_col).mapInPandas(
        run, f"{id_col} {id_type}, {coords_col} array<array<double>>, "
             "n_in int, n_out int")
