"""Explicitly-salted joins for hot-cell skew (BASELINE.json north_rule:
"partitioning / shuffle / skew handled explicitly ... salted
broadcast/hash joins with explicit skew splitting on hot cells").

AQE's skew-join only rewrites sort-merge joins after the fact; the
engine's geographic key distribution is *known* to be pathological
(cities → a handful of cells carry a large share of all points), so we
split hot keys deterministically before the shuffle:

- sample-count the join key to find hot keys (driver gets only the
  top-N list — a few KB);
- probe side (large): hot rows get a deterministic salt in [0, S) from
  a hash of the row, cold rows salt 0 — each hot key's rows spread
  over S shuffle partitions instead of one;
- build side (small): hot rows are replicated S× (explode), cold rows
  once — join key becomes (key, salt).

Result is row-identical to the unsalted join (tests assert equality).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, *, top: int = 64,
             min_share: float = 0.01, sample_fraction: float = 0.05,
             seed: int = 42) -> list:
    """Sampled heavy-hitter detection: keys whose sampled share exceeds
    ``min_share``, capped at ``top``. One small aggregation job; the
    driver only ever sees ≤ ``top`` values."""
    sample = df.sample(fraction=sample_fraction, seed=seed) \
        if sample_fraction < 1.0 else df
    total = sample.count()
    if total == 0:
        return []
    rows = (sample.groupBy(key).count()
            .where(F.col("count") >= max(2.0, min_share * total))
            .orderBy(F.col("count").desc())
            .limit(top)
            .collect())
    return [r[key] for r in rows]


def salted_join(probe: DataFrame, build: DataFrame, key: str, *,
                n_salt: int = 8, hot: Optional[Sequence] = None,
                how: str = "inner", probe_hash_cols: Optional[list] = None) -> DataFrame:
    """Skew-split equi-join: ``probe`` (large/skewed) ⋈ ``build``
    (small) on ``key``. ``hot`` keys (auto-detected from a probe sample
    when None) are split ``n_salt`` ways with a deterministic salt.

    The salt is derived from a hash of the probe row's non-key columns
    (or ``probe_hash_cols``), so retried tasks produce identical salt
    assignments — required for checkpoint/lineage resume determinism.

    Supported ``how``: inner / left / left_semi / left_anti — joins
    where replicating unmatched BUILD rows cannot surface in the output.
    right/full outer would emit each unmatched hot build row ``n_salt``
    times and are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicated build "
            "rows would duplicate unmatched-right output; use an unsalted "
            "join for right/full outer")
    if hot is None:
        hot = hot_keys(probe, key)
    hot = list(hot)
    if not hot:
        return probe.join(build, key, how)

    hash_cols = probe_hash_cols or [c for c in probe.columns if c != key]
    if not hash_cols:
        # key-only probe: no row content to hash — spread hot keys with
        # a per-partition row counter instead. Stable under plain task
        # retry (which replays the same partition content), but NOT
        # under upstream shuffle recomputation, where partition row
        # order can change and with it the salt assignment: join RESULTS
        # stay row-identical either way, only lineage-resume determinism
        # of intermediate salt values is weakened. Callers needing full
        # determinism should pass probe_hash_cols explicitly.
        hash_cols = None
        salt_src = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    else:
        salt_src = F.pmod(F.hash(*[F.col(c) for c in hash_cols]),
                          F.lit(n_salt))
    salt_probe = F.when(
        F.col(key).isin(hot), salt_src,
    ).otherwise(F.lit(0)).cast("int")
    p = probe.withColumn("_salt", salt_probe)

    salts = F.when(
        F.col(key).isin(hot),
        F.sequence(F.lit(0), F.lit(n_salt - 1)),
    ).otherwise(F.array(F.lit(0)))
    b = (build.withColumn("_salts", salts)
         .withColumn("_salt", F.explode(F.col("_salts")))
         .withColumn("_salt", F.col("_salt").cast("int"))
         .drop("_salts"))

    return p.join(b, [key, "_salt"], how).drop("_salt")
