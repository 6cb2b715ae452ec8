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

Null semantics match the SQL formulation (``LEFT JOIN ... ON r.ts <=
l.ts`` + ``ROW_NUMBER() = 1``): a NULL left timestamp matches nothing
(the left row survives with NULL right columns); NULL right timestamps
never match. Unmatched right columns are NULL — including double
columns, which a naive pandas merge would hand back as NaN.

Tie-break: equal right timestamps resolve to the greatest values of the
remaining right columns (right is sorted by (ts, other cols) ascending
and ``merge_asof`` takes the last in-order match per key), matching the
SQL oracle's ``ROW_NUMBER() OVER (ORDER BY ts DESC, tiebreak DESC) = 1``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BooleanType, ByteType, DoubleType, FloatType,
                               IntegerType, LongType, ShortType, StructField,
                               StructType)

_INT_TYPES = (ByteType, IntegerType, LongType, ShortType)

# internal column carrying the per-row "found a right match" truth from
# pandas back to the JVM (type-independent, unlike ts-nullity inference)
_MATCHED_FLAG = "__asof_matched"


def asof_join(left: DataFrame, right: DataFrame, *, key: str,
              left_ts: str, right_ts: str,
              right_prefix: str = "r_",
              n_buckets: int = 64,
              direction: str = "backward") -> DataFrame:
    """Left as-of join: every left row, plus the columns of the latest
    right row (same ``key``) with ``right_ts <= left_ts``
    (``direction="backward"``, the default) or the EARLIEST right row
    with ``right_ts >= left_ts`` (``direction="forward"`` — the
    next-event lookup, e.g. "first click after each impression"), or
    nulls.

    Right columns are emitted under ``right_prefix`` to avoid clashes;
    on unmatched left rows they are NULL (true NULL, not NaN, for every
    type). ``n_buckets`` bounds the number of Python invocations; size
    it near the cluster's task slots (the shuffle itself is
    hash-partitioned by Spark independently).

    Forward tie-break: equal right timestamps resolve to the SMALLEST
    values of the remaining right columns (mirror of backward's
    greatest) — the SQL ``ROW_NUMBER() OVER (ORDER BY ts ASC, tiebreak
    ASC) = 1`` formulation.

    ``direction="nearest"`` attaches the right row minimizing
    ``|right_ts - left_ts|`` with a FULLY PINNED tie rule (pandas's
    own ``merge_asof(direction="nearest")`` tie behavior is
    undocumented, so it is not used): an exact distance tie between a
    backward and a forward candidate resolves to the BACKWARD (earlier)
    row, and equal right timestamps resolve to the SMALLEST remaining
    right columns in BOTH directions — i.e. the single SQL formulation
    ``ROW_NUMBER() OVER (ORDER BY abs(r.ts - l.ts) ASC, r.ts ASC,
    tiebreak ASC) = 1``. Implemented as one backward + one forward
    vectorized merge per bucket and a row-wise distance pick — still
    two ``pd.merge_asof`` calls per BUCKET, not per key.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lfields = list(left.schema.fields)
    rfields = list(right.schema.fields)
    rnames = [f.name for f in rfields]
    if right_ts not in rnames:
        raise ValueError(f"right_ts {right_ts!r} not in right columns {rnames}")
    out_fields = [StructField(f.name, f.dataType, f.nullable) for f in lfields]
    out_fields += [StructField(right_prefix + f.name, f.dataType, True)
                   for f in rfields if f.name != key]
    lnames = [f.name for f in lfields]
    r_out = [right_prefix + n for n in rnames if n != key]
    # float/double right columns lose NULL-vs-NaN across the Arrow →
    # pandas boundary; companion null-flag columns carry the truth so
    # a MATCHED right row's genuine NULL comes back as NULL, not NaN
    r_float_cols = [right_prefix + f.name for f in rfields
                    if f.name != key
                    and isinstance(f.dataType, (DoubleType, FloatType))]
    r_flags = {c: f"__isnull_{c}" for c in r_float_cols}
    # fail fast on name collisions: a left column literally named like a
    # prefixed right column (or any internal name — the match flag, the
    # bucket, or a per-column null flag) would make pd.merge_asof
    # suffix the duplicates (_x/_y) / duplicate schema fields and crash
    # inside a running task instead of up front
    internal = {_MATCHED_FLAG, "_asof_b", *r_flags.values()}
    collisions = (set(lnames) & (set(r_out) | internal)) \
        | (set(r_out) & internal)
    if collisions:
        raise ValueError(
            f"asof_join column collision: columns {sorted(collisions)} "
            f"clash between the left side, prefixed right columns, and "
            f"internal names; pick a different right_prefix or rename "
            f"the colliding columns")
    out_fields += [StructField(fl, BooleanType(), True)
                   for fl in r_flags.values()]
    # explicit match indicator: a miss must NOT be inferred from r_ts
    # nullity — a float/double right_ts encodes the miss as NaN (not
    # NULL) across the pandas boundary, which IS NULL would never see
    out_fields.append(StructField(_MATCHED_FLAG, BooleanType(), False))
    schema = StructType(out_fields)
    r_int_cols = [right_prefix + f.name for f in rfields
                  if f.name != key and isinstance(f.dataType, _INT_TYPES)]
    r_bool_cols = [right_prefix + f.name for f in rfields
                   if f.name != key and isinstance(f.dataType, BooleanType)]
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
        *[F.col(n).alias(right_prefix + n) for n in rnames],
        *[F.col(c.removeprefix(right_prefix)).isNull().alias(fl)
          for c, fl in r_flags.items()]
    ).withColumn("_asof_b",
                 F.pmod(F.hash(F.col(r_key)), F.lit(n_buckets)))

    def _with_null_right(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        for c in r_out:
            out[c] = None
        for fl in r_flags.values():
            out[fl] = None
        out[_MATCHED_FLAG] = False
        return out

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.drop(columns=["_asof_b"])
        rpdf = rpdf.drop(columns=["_asof_b"])
        # SQL semantics: NULL never equals NULL and never satisfies
        # the r.ts <= l.ts (backward) / r.ts >= l.ts (forward)
        # predicate — left rows with a null key OR null timestamp
        # pass through unmatched; right rows with either are dropped
        # (pandas merge_asof would otherwise group NaN keys together
        # and would raise on null on-keys)
        l_bad = lpdf[left_ts].isna() | lpdf[key].isna()
        null_l = lpdf[l_bad]
        lpdf = (lpdf[~l_bad]
                .sort_values(left_ts, kind="mergesort")
                .reset_index(drop=True))
        rpdf = (rpdf[rpdf[r_ts_col].notna() & rpdf[r_key].notna()]
                .sort_values(r_sort, kind="mergesort")
                .reset_index(drop=True))
        if len(lpdf) == 0:
            out = _with_null_right(null_l)
        else:
            if len(rpdf) == 0:
                out = _with_null_right(lpdf)
            elif direction == "nearest":
                # pinned-tie nearest: one backward + one forward merge,
                # then a row-wise distance pick (backward wins exact
                # ties). Equal right timestamps must resolve to the
                # SMALLEST remaining columns in BOTH directions so one
                # SQL oracle covers both: forward already takes the
                # first in-order row of the ASC sort; backward takes
                # the LAST, so re-sort equal-ts groups DESC by the
                # remaining columns to make that last row the smallest.
                rpdf = rpdf.copy()
                rpdf[_MATCHED_FLAG] = True
                rb = rpdf.sort_values(
                    r_sort,
                    ascending=[True] + [False] * (len(r_sort) - 1),
                    kind="mergesort").reset_index(drop=True)
                ob = pd.merge_asof(lpdf, rb, left_on=left_ts,
                                   right_on=r_ts_col,
                                   left_by=key, right_by=r_key,
                                   direction="backward",
                                   allow_exact_matches=True)
                of = pd.merge_asof(lpdf, rpdf, left_on=left_ts,
                                   right_on=r_ts_col,
                                   left_by=key, right_by=r_key,
                                   direction="forward",
                                   allow_exact_matches=True)
                bm = ob[_MATCHED_FLAG].notna()
                fm = of[_MATCHED_FLAG].notna()
                d_b = (ob[left_ts] - ob[r_ts_col]).abs()
                d_f = (of[r_ts_col] - of[left_ts]).abs()
                # NaN distances compare False, so an unmatched side
                # never wins through the comparison itself
                take_b = bm & (~fm | (d_b <= d_f))
                out = of
                for c in r_out + list(r_flags.values()):
                    out[c] = ob[c].where(take_b, of[c])
                out[_MATCHED_FLAG] = bm | fm
            else:
                # constant True on the right side: after the merge its
                # absence (NaN/None) marks the unmatched left rows —
                # works for every right_ts type, incl. float/double
                # where ts-nullity would see NaN instead of NULL
                rpdf = rpdf.copy()
                rpdf[_MATCHED_FLAG] = True
                out = pd.merge_asof(lpdf, rpdf, left_on=left_ts,
                                    right_on=r_ts_col,
                                    left_by=key, right_by=r_key,
                                    direction=direction,
                                    allow_exact_matches=True)
                out[_MATCHED_FLAG] = out[_MATCHED_FLAG].notna()
            if len(null_l):
                out = pd.concat([out, _with_null_right(null_l)],
                                ignore_index=True)
        for c in r_int_cols:
            out[c] = out[c].astype("Int64")
        for c in r_bool_cols + list(r_flags.values()):
            out[c] = out[c].astype("boolean")
        out[_MATCHED_FLAG] = out[_MATCHED_FLAG].astype("boolean").fillna(False)
        return out[lnames + r_out + list(r_flags.values()) + [_MATCHED_FLAG]]

    joined = (left_b.groupBy("_asof_b").cogroup(right_b.groupBy("_asof_b"))
              .applyInPandas(merge, schema))
    # NaN→NULL restore: pandas fills float right columns with NaN on
    # unmatched rows AND turns a matched row's genuine NULL double into
    # NaN — the explicit matched flag identifies misses (for every
    # right_ts type, incl. float) and the companion per-column flags
    # disambiguate genuine NULLs on matched rows
    miss = ~F.col(_MATCHED_FLAG)
    restored = []
    for c in r_out:
        if c in r_flags:
            restored.append(
                F.when(miss | F.col(r_flags[c]), F.lit(None))
                .otherwise(F.col(c)).alias(c))
        else:
            restored.append(
                F.when(miss, F.lit(None)).otherwise(F.col(c)).alias(c))
    return joined.select(*lnames, *restored)
