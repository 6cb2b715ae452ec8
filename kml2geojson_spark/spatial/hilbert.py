"""Hilbert-curve cell encoding — the locality-preserving alternative to
the Morton index in :mod:`kml2geojson_spark.spatial.cells`.

Why it exists at 100 TB: consecutive Hilbert keys are ALWAYS
grid-adjacent (the curve never jumps), so range-partitioning or
bucketing a planetary point table by Hilbert key gives each partition a
compact spatial footprint — a bbox query then prunes to O(few) key
ranges, where Morton's quadrant seams force it to touch many more runs.
Morton stays the default for the pure-arithmetic parent/child algebra
(tile pyramids, k-rings); Hilbert is the LAYOUT key.

Cell id layout matches the Morton one (``cells.py``):

    [ hilbert index d (2r bits) | resolution (5 bits) ]

over the same lon/lat grid (``2^r × 2^r``, lon ∈ [-180,180],
lat ∈ [-90,90], same clamped floor arithmetic), so the two indexes are
drop-in interchangeable as keys.

Implementation: the MSB-first base-4 digit state machine (4 curve
orientations). The digit/next-state tables are verified in
``tests/test_cells.py`` against the classic per-bit rotate/reflect
``xy2d`` algorithm (public domain, e.g. the Wikipedia "Hilbert curve"
reference implementation). Three bit-exact paths, mirroring the Morton
trio: numpy (Arrow kernels), Spark Columns (whole-stage codegen — the
unrolled per-level projections stay LINEAR in the plan because
CollapseProject refuses to duplicate the non-cheap state expression),
and DuckDB SQL text (staged CTEs, one per level) for the oracle.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from .cells import MAX_RES, RES_BITS

# Digit and next-state tables, indexed by state*4 + (x_bit*2 + y_bit),
# bits MSB-first. States are the 4 reachable orientations of the 2-D
# Hilbert curve.
HILBERT_DIGIT = (0, 1, 3, 2,   2, 1, 3, 0,   2, 3, 1, 0,   0, 3, 1, 2)
HILBERT_NEXT = (3, 0, 1, 0,   1, 1, 0, 2,   2, 3, 2, 1,   0, 2, 3, 3)

_DIG_NP = np.asarray(HILBERT_DIGIT, dtype=np.int64)
_NEXT_NP = np.asarray(HILBERT_NEXT, dtype=np.int64)


def _check_res(res: int) -> None:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")


def _grid_np(lon, lat, res: int):
    n = float(1 << res)
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n)
    hi = n - 1.0
    return (np.clip(ix, 0.0, hi).astype(np.int64),
            np.clip(iy, 0.0, hi).astype(np.int64))


def hilbert_encode_np(lon, lat, res: int) -> np.ndarray:
    """(lon, lat) arrays → int64 Hilbert cell ids at ``res``.
    Vectorized digit loop: ``res`` LUT gathers over the whole batch."""
    _check_res(res)
    ix, iy = _grid_np(lon, lat, res)
    st = np.zeros(ix.shape, dtype=np.int64)
    hd = np.zeros(ix.shape, dtype=np.int64)
    for i in range(res - 1, -1, -1):
        q = ((ix >> i) & 1) * 2 + ((iy >> i) & 1)
        idx = st * 4 + q
        hd = (hd << 2) | _DIG_NP[idx]
        st = _NEXT_NP[idx]
    return (hd << RES_BITS) | res


def hilbert_encode(df: DataFrame, lon: str, lat: str, res: int, *,
                   out: str = "hcell") -> DataFrame:
    """Append the int64 Hilbert cell id column ``out`` — pure Spark
    Columns, zero Python. The state machine unrolls into ``res``
    chained projections inside ONE whole-stage-codegen span
    (plan-asserted in tests/test_plans.py)."""
    _check_res(res)
    dig_arr = F.array(*[F.lit(v) for v in HILBERT_DIGIT])
    next_arr = F.array(*[F.lit(v) for v in HILBERT_NEXT])
    n = float(1 << res)
    hi = (1 << res) - 1
    ix = (F.greatest(F.lit(0), F.least(F.lit(hi), F.floor(
        (F.col(lon) + 180.0) / 360.0 * F.lit(n)))).cast("long"))
    iy = (F.greatest(F.lit(0), F.least(F.lit(hi), F.floor(
        (F.col(lat) + 90.0) / 180.0 * F.lit(n)))).cast("long"))
    d = (df.withColumn("_hx", ix).withColumn("_hy", iy)
         .withColumn("_hst", F.lit(0))
         .withColumn(out, F.lit(0).cast("long")))
    for i in range(res - 1, -1, -1):
        q = (F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1)) * 2
             + F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1)))
        idx = (F.col("_hst") * 4 + q + 1).cast("int")
        d = (d.withColumn(out, F.shiftleft(F.col(out), 2)
                          .bitwiseOR(F.element_at(dig_arr, idx)
                                     .cast("long")))
             .withColumn("_hst", F.element_at(next_arr, idx)))
    return (d.withColumn(out, F.shiftleft(F.col(out), RES_BITS)
                         .bitwiseOR(F.lit(res)))
            .drop("_hx", "_hy", "_hst"))


def hilbert_cte_sql(source: str, lon_expr: str, lat_expr: str, res: int,
                    keep_cols: str, *, out: str = "hcell") -> str:
    """DuckDB SQL computing the identical Hilbert ids: a WITH chain of
    one CTE per level (LINEAR text size — never substitute the state
    expression into itself). ``source`` is a relation name or a
    parenthesized subquery; ``keep_cols`` the comma-separated columns
    to carry through. Returns a complete ``WITH ... SELECT`` statement
    yielding (keep_cols, out)."""
    _check_res(res)
    dig = "[" + ",".join(map(str, HILBERT_DIGIT)) + "]"
    nxt = "[" + ",".join(map(str, HILBERT_NEXT)) + "]"
    n = float(1 << res)
    hi = (1 << res) - 1
    ctes = [
        f"h{res} AS (SELECT {keep_cols}, "
        f"CAST(GREATEST(0, LEAST({hi}, FLOOR(({lon_expr} + 180.0) / 360.0"
        f" * {n}))) AS BIGINT) AS hx, "
        f"CAST(GREATEST(0, LEAST({hi}, FLOOR(({lat_expr} + 90.0) / 180.0"
        f" * {n}))) AS BIGINT) AS hy, "
        f"0 AS hst, CAST(0 AS BIGINT) AS hd FROM {source})"]
    for i in range(res - 1, -1, -1):
        idx = (f"(hst * 4 + ((hx >> {i}) & 1) * 2 + ((hy >> {i}) & 1)"
               f" + 1)")
        ctes.append(
            f"h{i} AS (SELECT {keep_cols}, hx, hy, "
            f"CAST(list_extract({nxt}, {idx}) AS INTEGER) AS hst, "
            f"CAST(hd * 4 + list_extract({dig}, {idx}) AS BIGINT) AS hd"
            f" FROM h{i + 1})")
    return ("WITH " + ", ".join(ctes)
            + f" SELECT {keep_cols}, CAST(hd * {1 << RES_BITS} + {res} "
              f"AS BIGINT) AS {out} FROM h0")


def hilbert_decode_np(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hilbert cell ids → (ix, iy, res). Inverse digit walk (classic
    d2xy recast as the same LUT machine run in reverse)."""
    c = np.asarray(cell, dtype=np.int64)
    res_arr = c & ((1 << RES_BITS) - 1)
    if res_arr.size and not np.all(res_arr == res_arr.flat[0]):
        raise ValueError("mixed resolutions in one decode batch")
    res = int(res_arr.flat[0]) if res_arr.size else 0
    d = (c >> RES_BITS).astype(np.int64)
    ix = np.zeros(d.shape, dtype=np.int64)
    iy = np.zeros(d.shape, dtype=np.int64)
    st = np.zeros(d.shape, dtype=np.int64)
    # invert: at each level find the q whose digit matches under the
    # current state (the digit table is a bijection per state)
    inv_q = np.zeros((4, 4), dtype=np.int64)
    for s in range(4):
        for q in range(4):
            inv_q[s, HILBERT_DIGIT[s * 4 + q]] = q
    for i in range(res - 1, -1, -1):
        digit = (d >> (2 * i)) & 3
        q = inv_q[st, digit]
        ix = (ix << 1) | (q >> 1)
        iy = (iy << 1) | (q & 1)
        st = _NEXT_NP[st * 4 + q]
    return ix, iy, np.full(d.shape, res, dtype=np.int64)
