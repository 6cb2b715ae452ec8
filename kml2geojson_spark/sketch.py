"""Cardinality sketching (HyperLogLog) with engine-portable hashing.

Spark's built-in ``approx_count_distinct`` and DuckDB's use different
internal hash functions, so their estimates can never be compared
bit-for-bit. This HLL builds its registers from md5 — identical in both
engines — so the REGISTER TABLE (the sketch itself) is exactly
reproducible cross-engine and the driver's hash-equality harness can
verify it, while the estimate keeps normal HLL accuracy (~1.04/√m).

Register construction (pure Column expressions, one hash-groupBy):

    h      = first 15 md5 hex chars of the value → 60-bit integer
    bucket = top ``p`` bits of h
    rho    = leading-zero count of the remaining (60-p) bits, + 1
             (computed integer-exactly via bin(): no float log2)
    register[bucket] = max(rho)

Sketches merge by elementwise max — the map-side partial aggregation
Spark already performs, so building a sketch over 10^12 rows is one
shuffle of at most m=2^p tiny rows per group.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def hll_registers(df: DataFrame, value_col: str, *,
                  group_cols: list[str] | None = None,
                  p: int = 8) -> DataFrame:
    """(group..., bucket, max_rho) — the sketch, bit-exact cross-engine.

    ``p`` register-index bits → m = 2**p registers (standard error
    ~1.04/sqrt(m); p=8 → ~6.5%).
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    rem_bits = 60 - p
    # COUNT(DISTINCT) semantics: NULLs contribute nothing (an unfiltered
    # NULL would become a NULL-bucket register and distort the estimate)
    df = df.where(F.col(value_col).isNotNull())
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15),
               16, 10).cast("long")
    bucket = F.shiftright(h, rem_bits).alias("bucket")
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    # leading zeros of rem within rem_bits, +1; bin() has no leading
    # zeros so length(bin(rem)) is the highest-set-bit position —
    # integer-exact in both engines (no float log2 boundary risk)
    rho = (F.when(rem == 0, F.lit(rem_bits + 1))
           .otherwise(F.lit(rem_bits + 1) - F.length(F.bin(rem)))
           .cast("int"))
    keys = list(group_cols or [])
    return (df.select(*keys, bucket, rho.alias("rho"))
            .groupBy(*keys, "bucket")
            .agg(F.max("rho").alias("max_rho")))


def hll_registers_sql(value_expr: str, table: str, *,
                      group_cols: list[str] | None = None,
                      p: int = 8) -> str:
    """The DuckDB oracle for :func:`hll_registers` — same formulas."""
    rem_bits = 60 - p
    mask = (1 << rem_bits) - 1
    keys = ", ".join(group_cols or [])
    key_sel = f"{keys}, " if keys else ""
    key_grp = f"{keys}, " if keys else ""
    return f"""
WITH h AS (
  SELECT {key_sel}
         ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table} WHERE {value_expr} IS NOT NULL),
br AS (
  SELECT {key_sel}
         (h >> {rem_bits}) AS bucket,
         CASE WHEN (h & {mask}) = 0 THEN {rem_bits + 1}
              ELSE {rem_bits + 1} - length(bin(h & {mask})) END AS rho
  FROM h)
SELECT {key_sel}bucket, MAX(rho) AS max_rho
FROM br GROUP BY {key_grp}bucket
"""


def deterministic_sample(df: DataFrame, value_col: str, *,
                         rate_num: int = 1, rate_den: int = 16) -> DataFrame:
    """Hash-deterministic row sample: keep rows whose md5 bucket of
    ``value_col`` falls below rate_num/rate_den of the 8-bit space.

    Unlike ``df.sample`` (RNG seeded per partition — changes with
    partitioning), the SAME rows are selected on every engine, cluster
    size, and run, so sampled-statistics pipelines (quantiles below)
    are exactly reproducible and cross-engine verifiable. The price is
    value-correlation: identical values are all in or all out —
    appropriate for distinct-value statistics, not for row counts.
    """
    from .textops import md5_bucket_col

    return df.where(
        md5_bucket_col(F.col(value_col)) < (256 * rate_num) // rate_den)


def sampled_quantiles(df: DataFrame, value_col: str, *,
                      group_cols: list[str] | None = None,
                      quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
                      rate_num: int = 1, rate_den: int = 16) -> DataFrame:
    """Approximate per-group quantiles via the deterministic sample +
    EXACT order statistics on the sample (lower order statistic:
    rank = floor(q*(n-1)) + 1) — fully reproducible cross-engine,
    unlike t-digest/GK sketches whose state depends on merge order.

    One pass: the ranked sample is computed once and every requested
    quantile is matched via an exploded quantile array. Scale caveat:
    with no ``group_cols`` the window is GLOBAL — the whole sample
    lands in one partition, so keep ``rate_num/rate_den`` small enough
    that the global sample fits one task, or supply group columns.

    Output: (group..., q, value) — one row per requested quantile.
    """
    from pyspark.sql import Window

    keys = list(group_cols or [])
    s = deterministic_sample(df, value_col, rate_num=rate_num,
                             rate_den=rate_den)
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    ranked = (s.select(*keys, value_col)
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_cnt", F.count(F.lit(1)).over(
                  Window.partitionBy(*keys))))
    q_arr = F.array(*[F.lit(float(q)) for q in quantiles])
    return (ranked
            .withColumn("q", F.explode(q_arr))
            .where(F.col("_rn")
                   == F.floor(F.col("q") * (F.col("_cnt") - 1)) + 1)
            .select(*keys, "q", F.col(value_col).alias("value")))


def hll_estimate(registers: DataFrame, *,
                 group_cols: list[str] | None = None,
                 p: int = 8) -> DataFrame:
    """Registers → cardinality estimate per group (standard HLL with
    linear-counting small-range correction). Missing buckets count as
    rho=0."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    keys = list(group_cols or [])
    agg = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_sum"),
        F.count(F.lit(1)).alias("_nonzero"))
    raw = F.lit(alpha * m * m) / (F.col("_sum") + (F.lit(m) - F.col("_nonzero")))
    zeros = F.lit(m) - F.col("_nonzero")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    out = agg.select(*keys, F.round(est).cast("long").alias("estimate"))
    # document the constant for callers computing error bars
    out._hll_std_error = 1.04 / math.sqrt(m)  # type: ignore[attr-defined]
    return out
