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
                      rate_num: int = 1, rate_den: int = 16,
                      range_partitions: int | None = None) -> DataFrame:
    """Approximate per-group quantiles via the deterministic sample +
    EXACT order statistics on the sample (lower order statistic:
    rank = floor(q*(n-1)) + 1) — fully reproducible cross-engine,
    unlike t-digest/GK sketches whose state depends on merge order.
    NULL values are excluded (SQL aggregate semantics).

    Grouped: one windowed pass per group (each group is one window
    partition — distributed across groups). Ungrouped: a global window
    would funnel the whole sample through ONE task, so the global
    quantiles run as two-phase distributed order statistics instead —
    range-partition the distinct (value, count) pairs, per-partition
    cumulative counts (window keyed by the range bucket), then merge
    the ≤ ``range_partitions`` per-bucket totals into global rank
    offsets (a window over that tiny frame) and probe the target ranks
    with a broadcast join. No driver-side data collect; every stage
    over sample-sized data runs with full parallelism.

    Output: (group..., q, value) — one row per requested quantile.
    """
    from pyspark.sql import Window

    keys = list(group_cols or [])
    s = deterministic_sample(df, value_col, rate_num=rate_num,
                             rate_den=rate_den) \
        .where(F.col(value_col).isNotNull())
    if not keys:
        return _global_quantiles(s, value_col, quantiles, range_partitions)
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


def _global_quantiles(s: DataFrame, value_col: str,
                      quantiles: tuple[float, ...],
                      range_partitions: int | None) -> DataFrame:
    """Distributed global order statistics: per-range-bucket cumulative
    counts + tiny offset merge. Phase data is lineage-truncated
    (localCheckpoint) because the bucket ids must be IDENTICAL between
    the offset computation and the rank probe — a recompute with
    re-sampled range boundaries would silently corrupt ranks, so a lost
    block fails loudly instead."""
    from pyspark.sql import Window

    spark = s.sparkSession
    n_parts = range_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vc = s.groupBy(value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    # eager=False defers the shuffle + window materialization to the
    # caller's first action (both consumers below then read the same
    # checkpointed blocks, and the range boundaries — fixed once at RDD
    # construction — stay consistent between them); note construction
    # still runs repartitionByRange's small boundary-sampling job
    ranked = (vc.repartitionByRange(n_parts, F.col(value_col).asc())
              .withColumn("_pid", F.spark_partition_id())
              .withColumn("_local_cum", F.sum("_cnt").over(
                  Window.partitionBy("_pid")
                  .orderBy(F.col(value_col).asc())))
              .localCheckpoint(eager=False))
    # ≤ n_parts rows: the only single-task window in the plan runs over
    # this tiny frame, never over the sample itself
    ptot = ranked.groupBy("_pid").agg(F.sum("_cnt").alias("_tot"))
    w_off = (Window.orderBy(F.col("_pid").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = ptot.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
    q_arr = F.array(*[F.lit(float(q)) for q in quantiles])
    targets = (offs.agg(F.coalesce(F.sum("_tot"), F.lit(0)).alias("_n"))
               .select(F.explode(q_arr).alias("q"), "_n")
               .withColumn("_r", F.floor(F.col("q")
                                         * (F.col("_n") - 1)) + 1)
               .where(F.col("_n") > 0))
    out = (ranked.join(F.broadcast(offs.select("_pid", "_off")), "_pid")
           .withColumn("_cum_end", F.col("_local_cum") + F.col("_off"))
           .join(F.broadcast(targets),
                 (F.col("_cum_end") - F.col("_cnt") < F.col("_r"))
                 & (F.col("_r") <= F.col("_cum_end")))
           .select("q", F.col(value_col).alias("value")))
    return out


def hll_std_error(p: int) -> float:
    """Relative standard error of an HLL estimate with 2**p registers
    (~1.04/sqrt(m)); the proper home of what used to ride along as a
    DataFrame attribute (lost on any transformation)."""
    return 1.04 / math.sqrt(1 << p)


def hll_estimate(registers: DataFrame, *,
                 group_cols: list[str] | None = None,
                 p: int = 8) -> DataFrame:
    """Registers → cardinality estimate per group (standard HLL with
    linear-counting small-range correction). Missing buckets count as
    rho=0.

    Bit-deterministic cross-engine: the harmonic sum Σ 2^-rho is
    accumulated as the INTEGER Σ 2^(R-rho) (R = max rho = 61-p, fits
    int64 for p ≥ 4) so the only float rounding is one int→double cast
    + one division by 2^R — identical IEEE results regardless of row
    order or engine, unlike a float sum whose value depends on
    aggregation order. The raw-estimate branch is therefore exactly
    reproducible (see :func:`hll_estimate_sql`); the linear-counting
    branch uses ln(), whose last-ulp may differ across libm builds —
    immaterial for the estimate, but oracle comparisons should use
    cardinalities on the raw branch.
    """
    m = 1 << p
    rem_bits = 60 - p
    r_max = rem_bits + 1
    alpha_mm = 0.7213 / (1.0 + 1.079 / m) * m * m
    keys = list(group_cols or [])
    agg = registers.groupBy(*keys).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {r_max} - max_rho)"))
        .alias("_isum"),
        F.count(F.lit(1)).alias("_nonzero"))
    zeros = F.lit(m) - F.col("_nonzero")
    # missing buckets contribute 2^-0 = 1 each → 2^r_max in the scaled
    # integer domain; the total stays < 2^62 for p >= 4
    total = F.col("_isum") + zeros.cast("long") * F.lit(1 << r_max)
    sumd = total.cast("double") / F.lit(float(1 << r_max))
    raw = F.lit(alpha_mm) / sumd
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(*keys, F.round(est).cast("long").alias("estimate"))


def hll_estimate_sql(value_expr: str, table: str, *,
                     group_cols: list[str] | None = None,
                     p: int = 8) -> str:
    """DuckDB oracle for ``hll_estimate(hll_registers(...))`` — the
    identical integer-scaled arithmetic over the register CTE, so the
    raw-branch estimate matches Spark bit-for-bit."""
    m = 1 << p
    rem_bits = 60 - p
    r_max = rem_bits + 1
    alpha_mm = 0.7213 / (1.0 + 1.079 / m) * m * m
    keys = ", ".join(group_cols or [])
    key_sel = f"{keys}, " if keys else ""
    key_grp = f"GROUP BY {keys}" if keys else ""
    regs = hll_registers_sql(value_expr, table, group_cols=group_cols, p=p)
    return f"""
WITH regs AS ({regs}),
agg AS (
  SELECT {key_sel}
         SUM((1::BIGINT << ({r_max} - max_rho))) AS isum,
         COUNT(*) AS nonzero
  FROM regs {key_grp}),
est AS (
  SELECT {key_sel}
         {alpha_mm!r} / (CAST(isum + ({m} - nonzero) * (1::BIGINT << {r_max})
                              AS DOUBLE) / {float(1 << r_max)!r}) AS raw,
         {m} - nonzero AS zeros
  FROM agg)
SELECT {key_sel}
       CAST(ROUND(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                       THEN {float(m)!r} * ln({float(m)!r} / zeros)
                       ELSE raw END) AS BIGINT) AS estimate
FROM est
"""


# ---------------------------------------------------------------------------
# Bloom filter (md5-portable, register-table representation)
# ---------------------------------------------------------------------------

def _bloom_positions(value_col: str, m_bits: int, k: int) -> F.Column:
    """The ``k`` md5-derived bit positions of a value — the ONE hash
    definition shared by build and probe (a divergence between the two
    would silently break the no-false-negatives contract)."""
    val = F.col(value_col).cast("string")
    return F.array(*[
        (F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(i), val)), 1, 15),
                16, 10).cast("long") % m_bits)
        for i in range(k)
    ])


def bloom_registers(df: DataFrame, value_col: str, *,
                    m_bits: int = 1 << 16, k: int = 4) -> DataFrame:
    """Bloom-filter sketch of a column as a REGISTER TABLE
    ``(word_idx, bits)`` — 64-bit words, only nonzero words stored.
    The probe-side prefilter a 100-TB dedup/antijoin pipeline ships to
    executors instead of the full key set.

    Hash positions derive from md5 (``pos_i = bigint(md5(i ':' value))
    % m_bits``), so the table is bit-exact cross-engine (driver q70
    replays it in DuckDB). Words hold 63 bits (positions 0..62): bit
    63 would be the sign bit, where a portable left shift diverges
    (Spark wraps silently, DuckDB raises on overflow) — one unused bit
    per word buys exact cross-engine replay. Building is one explode
    (k rows per value) + one ``bit_or`` hash aggregate — map-side
    combinable, a single small shuffle bounded by ~m_bits/63 output
    rows. Sketches of two datasets merge by OR-ing registers (bit_or
    over the union).
    """
    pos = df.select(F.explode(
        _bloom_positions(value_col, m_bits, k)).alias("_pos"))
    word = F.expr("_pos div 63").alias("word_idx")
    bit = F.expr("shiftleft(1L, CAST(_pos % 63 AS INT))")
    return (pos.select(word, bit.alias("_bit"))
            .groupBy("word_idx")
            .agg(F.expr("bit_or(_bit)").alias("bits")))


def bloom_might_contain(registers: DataFrame, probes: DataFrame,
                        value_col: str, *, m_bits: int = 1 << 16,
                        k: int = 4) -> DataFrame:
    """Membership probe against :func:`bloom_registers` output: a probe
    value "might be present" iff ALL ``k`` of its bit positions are set
    (no false negatives; false-positive rate ≈ (1-e^{-kn/m})^k,
    measured in tests). The register side is tiny (≤ m_bits/64 rows) —
    broadcast — so probing any number of rows is a narrow map + one
    small join, never a shuffle of the probe side.

    Output: probes' columns + ``might_contain`` boolean.
    """
    p = probes.withColumn(
        "_pos", F.explode(_bloom_positions(value_col, m_bits, k)))
    p = p.withColumn("word_idx", F.expr("_pos div 63")) \
         .withColumn("_need", F.expr("shiftleft(1L, CAST(_pos % 63 AS INT))"))
    joined = p.join(F.broadcast(registers), "word_idx", "left")
    hit = (F.col("bits").isNotNull()
           & (F.col("bits").bitwiseAND(F.col("_need")) == F.col("_need")))
    probe_cols = [c for c in probes.columns]
    # all exploded positions must hit; compare against the row count so
    # duplicate probe rows (collapsed by the groupBy) stay correct
    return (joined.withColumn("_hit", hit.cast("int"))
            .groupBy(*probe_cols)
            .agg((F.sum("_hit") == F.count(F.lit(1)))
                 .alias("might_contain")))


# ---------------------------------------------------------------------------
# Count-min sketch (md5-portable, register-table representation)
# ---------------------------------------------------------------------------

def _cms_positions(value_col: str, depth: int, width: int) -> F.Column:
    """The ``depth`` md5-derived (row, bucket) slots of a value — ONE
    hash definition shared by build and estimate (as with the Bloom
    filter, any build/probe divergence silently corrupts the
    overestimate-only guarantee). ``bucket_i = bigint(md5(i ':' value))
    % width`` — replayable verbatim in DuckDB (driver q76/q77)."""
    val = F.col(value_col).cast("string")
    return F.array(*[
        F.struct(
            F.lit(i).cast("long").alias("sketch_row"),
            (F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(i), val)),
                                1, 15), 16, 10).cast("long") % width)
            .alias("bucket"))
        for i in range(depth)
    ])


def cms_registers(df: DataFrame, value_col: str, *,
                  depth: int = 4, width: int = 1 << 10,
                  weight_col: str | None = None) -> DataFrame:
    """Count-min sketch of a column as a REGISTER TABLE
    ``(sketch_row, bucket, cnt)`` — the heavy-hitter / frequency
    companion to :func:`hll_registers` (distinct counts) and
    :func:`bloom_registers` (membership). At 100 TB this is how you
    ask "how often does each of these trillion tokens appear" without
    a trillion-row exact aggregate: the sketch is at most
    ``depth × width`` rows regardless of input size.

    Building is one explode (``depth`` rows per value) + one hash
    aggregate — map-side combinable, a single shuffle bounded by
    ``depth × width`` output rows. Sketches of two datasets merge by
    SUMMING registers; counts are long (``weight_col`` must be
    integral) so merges and replays are exact cross-engine.
    """
    w = (F.col(weight_col).cast("long") if weight_col is not None
         else F.lit(1).cast("long"))
    pos = df.select(
        F.explode(_cms_positions(value_col, depth, width)).alias("_p"),
        w.alias("_w"))
    return (pos.select("_p.sketch_row", "_p.bucket", "_w")
            .groupBy("sketch_row", "bucket")
            .agg(F.sum("_w").alias("cnt")))


def cms_estimate(registers: DataFrame, probes: DataFrame,
                 value_col: str, *, depth: int = 4,
                 width: int = 1 << 10) -> DataFrame:
    """Point-frequency estimate from :func:`cms_registers` output:
    ``est = min over rows of cnt[row][hash_row(value)]`` (missing
    register = 0). Never underestimates; overestimate probability
    shrinks exponentially in ``depth`` (measured in tests). The
    register side is ≤ depth×width rows — broadcast — so probing is a
    narrow map + small join; one row per DISTINCT probe value.

    Output: probes' columns + ``estimate`` (long).
    """
    p = probes.select(
        *probes.columns,
        F.explode(_cms_positions(value_col, depth, width)).alias("_p"))
    p = p.select(*probes.columns, "_p.sketch_row", "_p.bucket")
    joined = p.join(F.broadcast(registers), ["sketch_row", "bucket"], "left")
    return (joined
            .groupBy(*probes.columns)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("estimate")))


def weighted_sample(df: DataFrame, k: int, *, weight_col: str,
                    id_col: str) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement — the
    Efraimidis–Spirakis A-Res scheme: each row draws the key
    ``u**(1/w)`` with ``u`` an md5-derived uniform of its id, and the
    sample is the ``k`` largest keys. Inclusion probability is
    proportional-to-weight without replacement; rows with weight <= 0
    or NULL are excluded (zero mass), NULL ids likewise (no hash).

    Deterministic and cross-engine replayable (same property as
    :func:`deterministic_sample`): ``u = (h + 1) / 2**60`` with ``h``
    the first 60 md5 bits of the id — in (0, 1], so ``ln u`` is finite
    and the key is well-defined for every row. The selected SET is the
    contract (ties broken by id); the keys of distinct rows differ
    astronomically far above pow()'s last-ulp cross-libm wiggle.

    Scale shape: ``orderBy(key).limit(k)`` plans as
    TakeOrderedAndProject — a per-partition top-k heap and a merge of
    the ≤ k·P survivors, never a global sort (plan-asserted in tests).
    Driver/single-point memory is O(k); for k beyond driver memory,
    range-partition on the key and refine a threshold instead.

    Output: (id, weight) of the k sampled rows.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    idc = F.col(id_col)
    w = F.col(weight_col).cast("double")
    h = F.conv(F.substring(F.md5(idc.cast("string")), 1, 15), 16, 10) \
        .cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.pow(u, F.lit(1.0) / w)
    return (df.where(w.isNotNull() & (w > 0) & idc.isNotNull())
            .select(idc.alias("id"), w.alias("weight"),
                    key.alias("_key"))
            .orderBy(F.col("_key").desc(), F.col("id").asc())
            .limit(k)
            .select("id", "weight"))


def weighted_sample_sql(id_expr: str, weight_expr: str, table: str,
                        k: int) -> str:
    """DuckDB oracle for :func:`weighted_sample` — identical key
    arithmetic (md5 60-bit uniform, pow(u, 1/w)), identical ordering
    and tie-break."""
    u = (f"((('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 15))"
         f"::BIGINT + 1) / {float(1 << 60)!r})")
    return f"""
SELECT {id_expr} AS id, CAST({weight_expr} AS DOUBLE) AS weight
FROM {table}
WHERE {weight_expr} IS NOT NULL AND {weight_expr} > 0
      AND {id_expr} IS NOT NULL
ORDER BY pow({u}, 1.0 / CAST({weight_expr} AS DOUBLE)) DESC, {id_expr} ASC
LIMIT {k}
"""


def quantile_bucket_assign(df: DataFrame, value_col: str, *,
                           n_buckets: int = 10, rate_num: int = 1,
                           rate_den: int = 16,
                           bucket_col: str = "bucket") -> DataFrame:
    """Quantile bucketing (curriculum / difficulty deciles) WITHOUT a
    global sort: boundaries come from :func:`sampled_quantiles` over
    the hash-deterministic sample (distributed two-phase order
    statistics — exactly reproducible cross-engine), then every row's
    bucket is ``count(boundaries <= value)`` evaluated against the
    broadcast boundary LITERALS. A true ``ntile`` would range-shuffle
    all 100 TB; this touches the full data once, with a pure-Column
    codegen expression and zero shuffle in the assignment pass.

    The boundary collect is PROVABLY TINY (``n_buckets - 1`` rows by
    construction — the package's size-gated-collect rule). Duplicate
    boundaries (heavy skew) count with multiplicity, so extreme skew
    skips bucket ids rather than mis-binning; NULL values get a NULL
    bucket; boundary-equal values fall in the LOWER bucket (the
    ``<=`` side, matching the SQL replay).

    Output: ``df`` plus ``bucket_col`` (0 .. n_buckets-1).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = tuple(i / n_buckets for i in range(1, n_buckets))
    bounds = sampled_quantiles(df, value_col, quantiles=qs,
                               rate_num=rate_num, rate_den=rate_den)
    vals = sorted(r["value"] for r in bounds.select("value").collect())
    if vals:
        arr = F.array(*[F.lit(v) for v in vals])
        bucket = F.size(F.filter(arr, lambda b: b <= F.col(value_col)))
    else:  # empty input / empty sample: everything is bucket 0
        bucket = F.lit(0)
    return df.withColumn(
        bucket_col,
        F.when(F.col(value_col).isNull(), F.lit(None)).otherwise(bucket))


def hll_overlap(df: DataFrame, value_col: str, group_col: str, *,
                p: int = 8, max_groups: int = 64) -> DataFrame:
    """Pairwise approximate set overlap between groups from ONE pass
    over the data — "how much does source A's vocabulary overlap
    source B's?", the cross-source contamination / audience-overlap
    question at 100 TB, where the exact answer is a distinct-join per
    pair. Inclusion–exclusion over HLL sketches:
    ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` with the union estimated
    from the register-wise MAX (the HLL union is LOSSLESS — the union
    sketch equals the sketch of the union).

    Determinism: registers and the integer-scaled estimator are the
    bit-exact :func:`hll_registers` / :func:`hll_estimate` machinery;
    overlap is integer arithmetic over the rounded BIGINT estimates
    (clamped at 0 — inclusion–exclusion noise can go negative);
    jaccard is ONE fixed division of two BIGINTs.

    Scale shape: the data-sized work is the single register build
    (one hash-agg with map-side combine, |groups|·2^p output cells);
    everything after operates on that tiny frame — the G(G−1)/2
    pairing is quadratic in GROUPS, not rows, and is capped by
    ``max_groups`` (raises; pairwise overlap over thousands of groups
    is a different algorithm — sketch-join on register signatures).

    Output: (group_a, group_b, est_a, est_b, est_union, overlap_est,
    jaccard_est) for every unordered pair group_a < group_b.
    """
    regs = hll_registers(df, value_col, group_cols=[group_col],
                         p=p).localCheckpoint(eager=True)
    n_groups = regs.select(group_col).distinct().count()
    if n_groups > max_groups:
        raise ValueError(
            f"hll_overlap: {n_groups} groups exceeds max_groups="
            f"{max_groups} — the G² pairing is meant for handfuls of "
            "sources/langs, not high-cardinality keys")
    est = (hll_estimate(regs, group_cols=[group_col], p=p)
           .withColumnRenamed(group_col, "_g")
           .localCheckpoint(eager=True))
    ga = est.select(F.col("_g").alias("_ga"))
    gb = est.select(F.col("_g").alias("_gb"))
    pairs = ga.join(gb, F.col("_ga") < F.col("_gb"))  # tiny × tiny
    ra = (regs.join(F.broadcast(pairs),
                    F.col(group_col) == F.col("_ga"))
          .select("_ga", "_gb", "bucket", "max_rho"))
    rb = (regs.join(F.broadcast(pairs),
                    F.col(group_col) == F.col("_gb"))
          .select("_ga", "_gb", "bucket", "max_rho"))
    u = (ra.unionByName(rb)
         .groupBy("_ga", "_gb", "bucket")
         .agg(F.max("max_rho").alias("max_rho")))
    uest = (hll_estimate(u, group_cols=["_ga", "_gb"], p=p)
            .withColumnRenamed("estimate", "est_union"))
    out = (uest
           .join(F.broadcast(est.select(F.col("_g").alias("_ga"),
                                        F.col("estimate")
                                        .alias("est_a"))), "_ga")
           .join(F.broadcast(est.select(F.col("_g").alias("_gb"),
                                        F.col("estimate")
                                        .alias("est_b"))), "_gb"))
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.col("est_a") + F.col("est_b") - F.col("est_union"))
    return out.select(
        F.col("_ga").alias("group_a"), F.col("_gb").alias("group_b"),
        "est_a", "est_b", "est_union", overlap.alias("overlap_est"),
        F.when(F.col("est_union") > 0,
               overlap.cast("double")
               / F.col("est_union").cast("double"))
        .alias("jaccard_est"))


def hll_overlap_sql(value_expr: str, table: str, group_col: str, *,
                    p: int = 8) -> str:
    """DuckDB oracle for :func:`hll_overlap` — identical register
    build, identical integer-scaled estimates, identical
    inclusion–exclusion over the rounded BIGINTs."""
    m = 1 << p
    rem_bits = 60 - p
    r_max = rem_bits + 1
    alpha_mm = 0.7213 / (1.0 + 1.079 / m) * m * m
    regs = hll_registers_sql(value_expr, table,
                             group_cols=[group_col], p=p)

    def est_select(keys: str, src: str) -> str:
        return f"""
  SELECT {keys},
         CAST(ROUND(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                         THEN {float(m)!r} * ln({float(m)!r} / zeros)
                         ELSE raw END) AS BIGINT) AS estimate
  FROM (SELECT {keys},
               {alpha_mm!r} / (CAST(isum + ({m} - nonzero)
                                    * (1::BIGINT << {r_max})
                                    AS DOUBLE) / {float(1 << r_max)!r})
                 AS raw,
               {m} - nonzero AS zeros
        FROM (SELECT {keys},
                     SUM((1::BIGINT << ({r_max} - max_rho))) AS isum,
                     COUNT(*) AS nonzero
              FROM {src} GROUP BY {keys}))"""

    return f"""
WITH regs AS ({regs}),
gest AS ({est_select(group_col, "regs")}),
pairs AS (
  SELECT a.{group_col} AS ga, b.{group_col} AS gb
  FROM gest a JOIN gest b ON a.{group_col} < b.{group_col}),
ur AS (
  SELECT p.ga, p.gb, r.bucket, MAX(r.max_rho) AS max_rho
  FROM pairs p JOIN regs r
    ON r.{group_col} = p.ga OR r.{group_col} = p.gb
  GROUP BY p.ga, p.gb, r.bucket),
uest AS ({est_select("ga, gb", "ur")})
SELECT u.ga AS group_a, u.gb AS group_b,
       ea.estimate AS est_a, eb.estimate AS est_b,
       u.estimate AS est_union,
       GREATEST(0, ea.estimate + eb.estimate - u.estimate)
         AS overlap_est,
       CASE WHEN u.estimate > 0 THEN
         CAST(GREATEST(0, ea.estimate + eb.estimate - u.estimate)
              AS DOUBLE) / CAST(u.estimate AS DOUBLE)
       END AS jaccard_est
FROM uest u
JOIN gest ea ON ea.{group_col} = u.ga
JOIN gest eb ON eb.{group_col} = u.gb
"""


def kmv_registers(df: DataFrame, value_col: str, *,
                  k: int = 64,
                  group_cols: list[str] | None = None) -> DataFrame:
    """K-minimum-values distinct sketch: the k SMALLEST 60-bit hash
    values per group — the order-statistics cousin of
    :func:`hll_registers` (same md5 recipe, same mergeability story)
    with two extras HLL can't give: an unbiased-ish estimator with a
    clean closed form ((k−1)/R_k) and EXACT set algebra on the
    sketches themselves (the k smallest of a union are a subset of
    the unions of k-smallest — merge = union + re-take-k, and
    Jaccard over two sketches estimates set overlap, the
    :func:`hll_overlap` alternative).

    Determinism: the hash is the exact :func:`hll_registers` recipe
    (top 15 hex chars of md5 → BIGINT), selection is rank-by-value —
    integer-exact, bit-identical cross-engine.

    Scale shape: distinct on (group, hash) — one shuffle with
    map-side combine — then ONE per-group top-k window sharing that
    hash partitioning. The window ranks only DISTINCT hashes, and
    AQE splits skewed groups; for a group whose distinct count is
    enormous the rank-k selection is the irreducible cost of an
    order-statistics sketch (HLL is the no-sort alternative, one
    line away).

    Output: (group..., rn INT 1..k, h BIGINT) sorted ascending by h
    within each group.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    keys = list(group_cols or [])
    df = df.where(F.col(value_col).isNotNull())
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")),
                           1, 15), 16, 10).cast("long")
    from pyspark.sql import Window
    w = Window.partitionBy(*keys).orderBy(F.col("h").asc())
    return (df.select(*keys, h.alias("h")).distinct()
            .withColumn("rn", F.row_number().over(w).cast("int"))
            .where(F.col("rn") <= k))


def kmv_estimate(registers: DataFrame, *, k: int = 64,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_registers` sketch:
    ``(k−1) / (h_k / 2⁶⁰)`` when the sketch is full, the EXACT kept
    count when it isn't (fewer than k distinct hashes seen = we saw
    the whole set). Standard error ~1/√(k−2).

    Determinism: one correctly-rounded IEEE division per group —
    bit-exact cross-engine.

    Output: (group..., n_kept BIGINT, estimate DOUBLE).
    """
    keys = list(group_cols or [])
    agg = (registers.groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                F.max("h").alias("_hk")))
    full = F.col("n_kept") >= k
    est = (F.lit(float(k - 1))
           / (F.col("_hk").cast("double") / F.lit(float(1 << 60))))
    return agg.select(*keys, "n_kept",
                      F.when(full, est)
                      .otherwise(F.col("n_kept").cast("double"))
                      .alias("estimate"))
