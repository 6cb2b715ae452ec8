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
