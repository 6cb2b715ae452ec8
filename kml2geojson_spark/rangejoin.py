"""Distributed interval (range) join: facts with a numeric point vs an
intervals table, matching ``start <= point <= end``.

Spark plans a naive ``ON p BETWEEN start AND end`` as a broadcast
nested loop (or worse, a cartesian product) — O(|facts|·|intervals|)
comparisons. The scalable shape mirrors the spatial cell-bucket joins:

    fact bucket     = floor(point / width)          (exactly one)
    interval covers = every bucket its span touches (explode)
    candidates      = equi-join on the bucket        (one shuffle)
    exact filter    = start <= point <= end          (codegen'd)

PROVABLY complete: a matching point lies in one bucket, which the
interval's cover contains. A point has exactly ONE bucket, so
candidate pairs are unique — no dedup shuffle. Pick ``bucket_width``
near the median interval length (cover lists stay short while buckets
stay selective); heavily-overlapped hot buckets can be salted like hot
cells (:mod:`.spatial.salted`).

Timestamps: convert to epoch integers upstream (for TIMESTAMP_NTZ use
``timestampdiff(MICROSECOND, epoch, ts)`` — tz-free) — the operator is
deliberately numeric so its semantics and the SQL oracle never touch
timezone arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(facts: DataFrame, intervals: DataFrame, *,
                  point_col: str, start_col: str, end_col: str,
                  bucket_width: int, how: str = "inner") -> DataFrame:
    """Join every fact row to every interval containing its point
    (``start <= point <= end``, inclusive both ends — SQL BETWEEN).
    Inverted/empty intervals (start > end) match nothing, like BETWEEN.

    Returns the fact columns + interval columns of all matches
    (column-name collisions must be resolved by the caller upfront).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = (set(facts.columns) & set(intervals.columns)) \
        | ({"_rj_b"} & (set(facts.columns) | set(intervals.columns)))
    if overlap:
        raise ValueError(
            f"interval_join column collision: {sorted(overlap)} appear on "
            f"both sides (or clash with the internal bucket column); "
            f"rename before joining")
    if how != "inner":
        raise ValueError("only how='inner' is supported")

    w = F.lit(int(bucket_width))
    fb = facts.withColumn(
        "_rj_b", F.floor(F.col(point_col) / w).cast("long"))
    lo = F.floor(F.col(start_col) / w).cast("long")
    hi = F.floor(F.col(end_col) / w).cast("long")
    # sequence(a, b) runs DESCENDING when a > b (inverted interval):
    # emit no buckets instead, matching BETWEEN's empty result
    buckets = F.when(hi >= lo, F.sequence(lo, hi)) \
        .otherwise(F.array().cast("array<bigint>"))
    ib = intervals.withColumn("_rj_b", F.explode(buckets))
    return (fb.join(ib, "_rj_b")
            .where((F.col(start_col) <= F.col(point_col))
                   & (F.col(point_col) <= F.col(end_col)))
            .drop("_rj_b"))


def interval_overlap_join(left: DataFrame, right: DataFrame, *,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          bucket_width: int) -> DataFrame:
    """Join every left interval to every right interval it overlaps:
    ``left_start <= right_end AND right_start <= left_end`` (inclusive
    — touching endpoints count, matching the SQL range predicate).
    Inverted intervals (start > end) match nothing on either side.

    The interval×interval twin of :func:`interval_join`. Spark plans
    the naive two-inequality ON as a nested-loop join; the scalable
    shape buckets BOTH sides:

        each side explodes to every bucket its span touches
        candidates = equi-join on the bucket       (one shuffle)
        exact filter = the overlap predicate       (codegen'd)
        ownership   = keep a pair only in the bucket containing
                      ``greatest(left_start, right_start)``

    The ownership filter makes the join exactly-once WITHOUT a
    distinct/dedup shuffle: an overlapping pair's intersection starts
    at ``max(start_l, start_r)``, a coordinate both spans cover by the
    overlap predicate itself, so both sides emit that bucket exactly
    once and every other shared bucket is dropped by the equality.

    Pick ``bucket_width`` near the median interval length (cover
    explode stays ~2 rows/interval while buckets stay selective); a
    pathological hot bucket can be salted like a hot cell
    (:mod:`.spatial.salted`).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = (set(left.columns) & set(right.columns)) \
        | ({"_rj_b"} & (set(left.columns) | set(right.columns)))
    if overlap:
        raise ValueError(
            f"interval_overlap_join column collision: {sorted(overlap)} "
            f"appear on both sides (or clash with the internal bucket "
            f"column); rename before joining")

    w = F.lit(int(bucket_width))

    def _cover(df: DataFrame, s: str, e: str) -> DataFrame:
        lo = F.floor(F.col(s) / w).cast("long")
        hi = F.floor(F.col(e) / w).cast("long")
        # gate on the RAW start <= end, not lo <= hi: an inverted
        # interval contained in one bucket has lo == hi, and the
        # overlap predicate alone would not reject it downstream
        buckets = F.when(F.col(s) <= F.col(e), F.sequence(lo, hi)) \
            .otherwise(F.array().cast("array<bigint>"))
        return df.withColumn("_rj_b", F.explode(buckets))

    lb = _cover(left, left_start, left_end)
    rb = _cover(right, right_start, right_end)
    own = F.floor(F.greatest(F.col(left_start), F.col(right_start)) / w) \
        .cast("long")
    return (lb.join(rb, "_rj_b")
            .where((F.col(left_start) <= F.col(right_end))
                   & (F.col(right_start) <= F.col(left_end))
                   & (F.col("_rj_b") == own))
            .drop("_rj_b"))
