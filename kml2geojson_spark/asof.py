"""Distributed as-of (temporal) join.

The reference engine has no temporal operators (KML is batch,
/root/reference/kml2geojson/main.py is a pure converter); an as-of join
is the canonical missing piece for event-stream training data: for each
left row, attach the latest right row with the same key whose timestamp
is <= the left timestamp.

Spark has no built-in as-of join, and expressing it as an inequality
join + window over the joined product explodes (|L|x|R| per key before
the window prunes). The scalable shape used here:

    bucket = pmod(hash(key), n_buckets)           # both sides
    left.groupBy(bucket).cogroup(right.groupBy(bucket))
        .applyInPandas(merge_asof(by=key))

— ONE hash shuffle per side on the bucket, then a single vectorized
``pd.merge_asof(..., by=key)`` per bucket that handles every key in it
at once. Bucketing (instead of cogrouping on the raw key) matters: a
per-key cogroup pays Python/Arrow dispatch per key (millions of tiny
calls at scale), while per-bucket calls amortize it to ``n_buckets``
calls regardless of key cardinality. Hot single keys can be further
split by coarse time range (replicate only the right rows that can
match each range); per-key volume here is a user/device stream, which
is bounded in practice.

Tie-break: equal right timestamps resolve to the greatest values of the
remaining right columns (right is sorted by (ts, other cols) ascending
and ``merge_asof`` takes the last in-order match per key), matching the
SQL oracle's ``ROW_NUMBER() OVER (ORDER BY ts DESC, tiebreak DESC) = 1``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (IntegerType, LongType, ShortType, StructField,
                               StructType)

_INT_TYPES = (IntegerType, LongType, ShortType)


def asof_join(left: DataFrame, right: DataFrame, *, key: str,
              left_ts: str, right_ts: str,
              right_prefix: str = "r_",
              n_buckets: int = 64) -> DataFrame:
    """Left as-of join: every left row, plus the columns of the latest
    right row (same ``key``) with ``right_ts <= left_ts``, or nulls.

    Right columns are emitted under ``right_prefix`` to avoid clashes.
    Integer right columns come back nullable (unmatched left rows).
    ``n_buckets`` bounds the number of Python invocations; size it near
    the cluster's task slots (the shuffle itself is hash-partitioned by
    Spark independently).
    """
    lfields = list(left.schema.fields)
    rfields = list(right.schema.fields)
    rnames = [f.name for f in rfields]
    if right_ts not in rnames:
        raise ValueError(f"right_ts {right_ts!r} not in right columns {rnames}")
    out_fields = [StructField(f.name, f.dataType, f.nullable) for f in lfields]
    out_fields += [StructField(right_prefix + f.name, f.dataType, True)
                   for f in rfields if f.name != key]
    schema = StructType(out_fields)
    lnames = [f.name for f in lfields]
    r_out = [right_prefix + n for n in rnames if n != key]
    r_int_cols = [right_prefix + f.name for f in rfields
                  if f.name != key and isinstance(f.dataType, _INT_TYPES)]
    r_ts_col = right_prefix + right_ts
    # deterministic within-key ordering: right sorted by (ts, every
    # other column) so equal timestamps break ties identically on every
    # run/partitioning
    r_sort = [r_ts_col] + [c for c in r_out if c != r_ts_col]

    # Rename right's non-key columns JVM-side BEFORE the cogroup: when
    # both sides derive from the same scan (self as-of join), shared
    # column names resolve to the SAME attribute and the analyzer drops
    # them from the right-side projection — distinct names keep the
    # attribute sets disjoint.
    bucket = F.pmod(F.hash(F.col(key)), F.lit(n_buckets)).alias("_asof_b")
    r_key = right_prefix + key
    left_b = left.withColumn("_asof_b", bucket)
    right_b = right.select(
        *[F.col(n).alias(right_prefix + n) for n in rnames]
    ).withColumn("_asof_b",
                 F.pmod(F.hash(F.col(r_key)), F.lit(n_buckets)))

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = (lpdf.drop(columns=["_asof_b"])
                .sort_values(left_ts, kind="mergesort").reset_index(drop=True))
        rpdf = (rpdf.drop(columns=["_asof_b"])
                .sort_values(r_sort, kind="mergesort").reset_index(drop=True))
        if len(rpdf) == 0:
            out = lpdf.copy()
            for c in r_out:
                out[c] = None
        else:
            out = pd.merge_asof(lpdf, rpdf, left_on=left_ts,
                                right_on=r_ts_col,
                                left_by=key, right_by=r_key,
                                direction="backward",
                                allow_exact_matches=True)
        for c in r_int_cols:
            out[c] = out[c].astype("Int64")
        return out[lnames + r_out]

    return (left_b.groupBy("_asof_b").cogroup(right_b.groupBy("_asof_b"))
            .applyInPandas(merge, schema))
