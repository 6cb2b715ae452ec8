"""Data-quality audits for warehouse-scale pipelines: referential-
integrity orphan checks, single-pass column profiling, and duplicate-
cluster census.

The reference (a KML converter, /root/reference/kml2geojson/main.py)
has no data-quality surface; these are §2.4-style extensions — the
audits every 100-TB training-data pipeline runs BEFORE joining,
deduplicating, or sampling: do the foreign keys resolve, what do the
columns actually contain, and how duplicated is the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def orphan_audit(child: DataFrame, parent: DataFrame, *,
                 child_key: str, parent_key: str,
                 relation: str | None = None) -> DataFrame:
    """Referential-integrity audit of one child→parent relation:
    how many child rows exist, how many carry a NULL key, how many
    DISTINCT keys appear, and how many of those keys (and the rows
    behind them) fail to resolve in the parent.

    Scale shape — distinct-shrink BEFORE the join: the child is
    collapsed to one (key, row_count) pair per distinct key by a
    map-side-combinable hash aggregate, so the anti-join probes
    |distinct keys| rows, not |child rows| (lineitem→orders shrinks
    ~4×; fact→dim relations shrink by the fan-out). The parent side is
    projected to its key column only before the LEFT ANTI join — with
    a dimension parent that distinct key set is broadcast by AQE; with
    a fact parent both sides hash-partition on the key. The three
    single-row summaries are combined by 1×1 cross joins (no data
    movement). Never a row-level child×parent join.

    Output: one row (relation STRING, n_rows BIGINT,
    n_null_keys BIGINT, n_distinct_keys BIGINT, n_orphan_keys BIGINT,
    n_orphan_rows BIGINT).
    """
    rel = relation if relation is not None else f"{child_key}->{parent_key}"
    ck = F.col(child_key)
    totals = child.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(ck.isNull().cast("long")).alias("n_null_keys"))
    keys = (child.where(ck.isNotNull())
            .groupBy(ck.alias("_k"))
            .agg(F.count(F.lit(1)).alias("_c")))
    pkeys = parent.select(F.col(parent_key).alias("_pk")).distinct()
    orphans = keys.join(pkeys, keys["_k"] == pkeys["_pk"], "left_anti")
    key_stats = keys.agg(F.count(F.lit(1)).alias("n_distinct_keys"))
    orphan_stats = orphans.agg(
        F.count(F.lit(1)).alias("n_orphan_keys"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long")
        .alias("n_orphan_rows"))
    return (totals.crossJoin(key_stats).crossJoin(orphan_stats)
            .select(F.lit(rel).alias("relation"),
                    F.col("n_rows").cast("long"),
                    F.coalesce(F.col("n_null_keys"), F.lit(0))
                    .cast("long").alias("n_null_keys"),
                    F.col("n_distinct_keys").cast("long"),
                    F.col("n_orphan_keys").cast("long"),
                    "n_orphan_rows"))


def column_profile(df: DataFrame, cols: list[str], *,
                   exact: bool = True) -> DataFrame:
    """Single-pass column profiler: for each requested column report
    row count, NULL count, distinct count, and lexicographic min/max
    of the string form — the "what is actually in this table" audit
    run before schema contracts are trusted.

    All values are CAST to STRING first so one (col_name, val) layout
    serves every input type; min/max are therefore BINARY-collation
    string extremes (digits and ASCII text order naturally; document
    the cast if you profile timestamps). The unpivot is ``stack`` —
    a narrow per-row explode, NO shuffle — and the single hash
    aggregate that follows is the only exchange, keyed by col_name
    (≤ len(cols) groups).

    ``exact=True`` uses ``count(distinct val)``; with a single
    distinct aggregate Catalyst plans the classic two-level rewrite —
    a partial aggregate keyed by (col_name, val) that de-duplicates
    map-side, then a second exchange keyed by col_name — so exact
    mode costs TWO hash-partitioned exchanges and no Expand blowup;
    per-partition state is bounded by the distinct-value count.
    ``exact=False`` swaps in ``approx_count_distinct`` (HLL++, one
    exchange, constant memory) — the 100-TB default where a ±5%
    distinct count is acceptable.

    Output: (col_name STRING, n_rows BIGINT, n_null BIGINT,
    n_distinct BIGINT, min_val STRING, max_val STRING), one row per
    requested column.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    pairs = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in cols)
    stacked = df.select(F.expr(
        f"stack({len(cols)}, {pairs}) as (col_name, val)"))
    n_distinct = (F.count_distinct(F.col("val")) if exact
                  else F.approx_count_distinct("val"))
    return (stacked.groupBy("col_name")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("val").isNull().cast("long"))
                 .alias("n_null"),
                 n_distinct.alias("n_distinct"),
                 F.min("val").alias("min_val"),
                 F.max("val").alias("max_val")))


def join_cardinality_estimate(left: DataFrame, right: DataFrame, *,
                              left_key: str,
                              right_key: str) -> DataFrame:
    """Pre-flight join audit: the EXACT output cardinality the
    equi-join ``left ⋈ right`` would produce, computed without running
    it — the "will this join explode" check a planner (or an operator
    reviewing a 100-TB DAG) runs before committing the shuffle. For an
    equi-join, output rows = Σ over matching keys of
    count_left(k) · count_right(k), so the whole answer lives in the
    two (key, count) aggregates.

    Scale shape: each side collapses to one row per distinct key via a
    map-side-combinable hash aggregate BEFORE anything joins — the
    join then probes |distinct keys|, not |rows|, and a single-row
    aggregate over the matched pairs finishes the job. The
    ``max_single_key_rows`` output is the skew headline: if it rivals
    ``est_output_rows`` the join needs salting (see q15) or a
    broadcast, and you learned that for the cost of two shuffles of
    (key, count) pairs.

    Output: one row (n_left_rows, n_right_rows, n_left_keys,
    n_right_keys, n_common_keys, est_output_rows,
    max_single_key_rows — all BIGINT; the max is 0 when no key
    matches).
    """
    lc = (left.where(F.col(left_key).isNotNull())
          .groupBy(F.col(left_key).alias("_k"))
          .agg(F.count(F.lit(1)).alias("_cl")))
    rc = (right.where(F.col(right_key).isNotNull())
          .groupBy(F.col(right_key).alias("_k"))
          .agg(F.count(F.lit(1)).alias("_cr")))
    sides = (left.agg(F.count(F.lit(1)).alias("n_left_rows"))
             .crossJoin(right.agg(F.count(F.lit(1))
                                  .alias("n_right_rows")))
             .crossJoin(lc.agg(F.count(F.lit(1)).alias("n_left_keys")))
             .crossJoin(rc.agg(F.count(F.lit(1))
                               .alias("n_right_keys"))))
    matched = (lc.join(rc, "_k")
               .select((F.col("_cl") * F.col("_cr")).alias("_m"))
               .agg(F.count(F.lit(1)).alias("n_common_keys"),
                    F.coalesce(F.sum("_m"), F.lit(0)).cast("long")
                    .alias("est_output_rows"),
                    F.coalesce(F.max("_m"), F.lit(0)).cast("long")
                    .alias("max_single_key_rows")))
    return (sides.crossJoin(matched)
            .select(F.col("n_left_rows").cast("long"),
                    F.col("n_right_rows").cast("long"),
                    F.col("n_left_keys").cast("long"),
                    F.col("n_right_keys").cast("long"),
                    F.col("n_common_keys").cast("long"),
                    "est_output_rows", "max_single_key_rows"))


def grouped_heavy_hitters(df: DataFrame, *, group_col: str,
                          value_col: str, k: int = 10) -> DataFrame:
    """Per-group heavy hitters: the top-``k`` most frequent values
    inside each group, with their exact count and parts-per-million
    share of the group — per-language top tokens, per-source top
    domains, per-segment top priorities; the grouped twin of the
    global :func:`~kml2geojson_spark.relational.key_skew_stats`.

    Determinism: rank order is (count DESC, value ASC) — a total
    order, so ties at the k-boundary resolve identically on every
    engine. The ppm share uses integer floor division
    (``cnt * 1_000_000 div group_total``), never a float.

    Scale shape: ONE (group, value) hash aggregate with map-side
    combine collapses the data; the rank and group-total windows then
    run on the AGGREGATED frame (one row per distinct pair — bounded
    by the value vocabulary per group, not by input rows) and share
    one group-keyed exchange. NULL groups and values are dropped.

    Output: (group_col, value, cnt BIGINT, rnk INT, share_ppm BIGINT).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window
    g = F.col(group_col)
    v = F.col(value_col)
    counts = (df.where(g.isNotNull() & v.isNotNull())
              .groupBy(g.alias(group_col), v.alias("value"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    wg = Window.partitionBy(group_col)
    wr = wg.orderBy(F.col("cnt").desc(), F.col("value").asc())
    return (counts
            .withColumn("rnk", F.row_number().over(wr))
            .withColumn("_tot", F.sum("cnt").over(wg))
            .where(F.col("rnk") <= k)
            .select(group_col, "value", "cnt", "rnk",
                    F.expr("cnt * 1000000 div _tot")
                    .alias("share_ppm")))


def dup_cluster_stats(docs: DataFrame, *,
                      text_col: str = "text") -> DataFrame:
    """Duplicate-cluster census: md5-fingerprint every document,
    group identical texts into clusters, and return the histogram of
    cluster sizes — the first number a dedup pipeline reports
    (cluster_size=1 rows are the unique mass; the tail says how
    pathological the corpus is and predicts the exact-dup collapse
    ratio before :func:`~kml2geojson_spark.textops.near_dedup_representatives`
    runs).

    Scale shape: two hash aggregates, both map-side combinable — the
    first keyed by the 128-bit fingerprint (NOT the text itself: the
    shuffle carries 16-byte keys, not documents), the second keyed by
    cluster size (≤ max cluster size groups, essentially free). NULL
    texts are dropped. No joins, no windows, no Python.

    Output: (cluster_size BIGINT, n_clusters BIGINT, n_docs BIGINT).
    """
    sizes = (docs.where(F.col(text_col).isNotNull())
             .select(F.md5(F.col(text_col)).alias("_fp"))
             .groupBy("_fp")
             .agg(F.count(F.lit(1)).alias("cluster_size")))
    return (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"),
                 F.sum("cluster_size").cast("long").alias("n_docs")))


def classification_report(df: DataFrame, *, actual_col: str,
                          predicted_col: str) -> DataFrame:
    """Per-class precision / recall / F1 from a predictions table —
    the eval readout for any classifier in the pipeline (language
    guesser vs gold labels, quality-filter vs human audit).

    All counts are exact BIGINTs off ONE confusion-matrix hash-
    aggregate (classes × classes rows — tiny after the first agg);
    the metrics are single divisions of identical integers
    (precision = tp/pp, recall = tp/ap, F1 = 2·tp/(pp+ap), using
    pp+ap = 2tp+fp+fn), so bit-identical across engines. A class
    never predicted has NULL precision; never actual → NULL recall;
    F1 NULL only when both. NULL actual/predicted rows are dropped.

    Output: (label, tp, fp, fn, support, precision, recall, f1) —
    one row per class appearing in either column.
    """
    base = df.where(F.col(actual_col).isNotNull()
                    & F.col(predicted_col).isNotNull())
    conf = base.groupBy(
        F.col(actual_col).alias("_a"),
        F.col(predicted_col).alias("_p")).agg(
        F.count(F.lit(1)).alias("_c"))
    ap = conf.groupBy(F.col("_a").alias("label")).agg(
        F.sum("_c").alias("support"))
    pp = conf.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_c").alias("_pp"))
    tp = (conf.where(F.col("_a") == F.col("_p"))
          .groupBy(F.col("_a").alias("label"))
          .agg(F.sum("_c").alias("_tp")))
    out = (ap.join(pp, "label", "full_outer")
           .join(tp, "label", "left_outer")
           .select(
               "label",
               F.coalesce(F.col("_tp"), F.lit(0)).alias("tp"),
               (F.coalesce(F.col("_pp"), F.lit(0))
                - F.coalesce(F.col("_tp"), F.lit(0))).alias("fp"),
               (F.coalesce(F.col("support"), F.lit(0))
                - F.coalesce(F.col("_tp"), F.lit(0))).alias("fn"),
               F.coalesce(F.col("support"), F.lit(0)).alias("support"),
               F.coalesce(F.col("_pp"), F.lit(0)).alias("_ppn")))
    return out.select(
        "label", "tp", "fp", "fn", "support",
        F.when(F.col("_ppn") == 0, F.lit(None))
        .otherwise(F.col("tp").cast("double")
                   / F.col("_ppn").cast("double")).alias("precision"),
        F.when(F.col("support") == 0, F.lit(None))
        .otherwise(F.col("tp").cast("double")
                   / F.col("support").cast("double")).alias("recall"),
        F.when((F.col("_ppn") + F.col("support")) == 0, F.lit(None))
        .otherwise(2.0 * F.col("tp").cast("double")
                   / (F.col("_ppn") + F.col("support")).cast("double"))
        .alias("f1"))


def psi_drift(df: DataFrame, *, value_col: str, split_col: str,
              split_a, split_b, lo: float, hi: float,
              n_bins: int = 16) -> DataFrame:
    """Population Stability Index between two slices of one table —
    THE standard distribution-drift monitor in ML scoring pipelines
    (rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
    ``PSI = Σ_bins (p_a − p_b) · ln(p_a / p_b)`` over a fixed-width
    binning of ``[lo, hi]`` (same closed-right top edge as
    ``histogram1d``; out-of-range and NULL values drop).

    Determinism (the `group_entropy` integerized-ln rule, milli-nat
    scaled): bin counts c_a, c_b and totals n_a, n_b are exact
    BIGINTs; each bin's term is
    ``(c_a·n_b − c_b·n_a) · (mln(c_a·n_b) − mln(c_b·n_a))`` with
    ``mln(x) = round(ln(x)·10³)`` integerized PER EXACT PRODUCT
    before any sum — an exact BIGINT, addition-order independent, and
    sign-safe (ln is monotone, so rounding never flips a term's
    sign). PSI is then ONE division by ``n_a·n_b·10³``. Bins empty on
    either side are SKIPPED (no epsilon smoothing — exactness over
    convention) and counted in ``n_zero_bins`` so the caller sees
    when the binning is too fine — that counts OBSERVED bins with one
    empty side (the ones whose mass the skip discards); bins empty on
    both sides never reach the aggregate and discard nothing. Caller bound: c·n < 2⁶³/(27·10³)
    (n_a·n_b < ~3·10¹⁴ — raise, never wrap, under ANSI).

    Scale shape: ONE conditional hash-aggregate over the data (both
    slices in one pass, map-side combined to ≤ n_bins cells per
    side), then scalar work on n_bins rows. No window, no join, no
    second scan.

    Output: ONE row (n_a, n_b, n_bins_used, n_zero_bins,
    psi_num BIGINT, psi DOUBLE).
    """
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    lo = float(lo)
    hi = float(hi)
    if not hi > lo:
        raise ValueError("hi must be greater than lo")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(lo)) / F.lit(width)).cast("long")
    bin_ = F.when(raw >= n_bins, F.lit(n_bins - 1).cast("long")) \
        .otherwise(raw)
    is_a = F.col(split_col) == F.lit(split_a)
    is_b = F.col(split_col) == F.lit(split_b)
    # The bin frame feeds both the totals and the term sum;
    # materialize it once (≤ n_bins rows) so the base table is
    # scanned exactly once.
    cells = (df.where(v.isNotNull() & (v >= lo) & (v <= hi)
                      & (is_a | is_b))
             .groupBy(bin_.alias("_bin"))
             .agg(F.sum(F.when(is_a, 1).otherwise(0)).alias("_ca"),
                  F.sum(F.when(is_b, 1).otherwise(0)).alias("_cb"))
             .localCheckpoint(eager=True))
    tot = F.broadcast(cells.agg(F.sum("_ca").alias("_na"),
                                F.sum("_cb").alias("_nb")))
    pa = F.col("_ca") * F.col("_nb")
    pb = F.col("_cb") * F.col("_na")
    mln = [F.round(F.log(x.cast("double")) * F.lit(1000.0)).cast("long")
           for x in (pa, pb)]
    both = (F.col("_ca") > 0) & (F.col("_cb") > 0)
    term = F.when(both, (pa - pb) * (mln[0] - mln[1])).otherwise(F.lit(0))
    agg = (cells.crossJoin(tot)
           .agg(F.max("_na").alias("n_a"), F.max("_nb").alias("n_b"),
                F.sum(F.when(both, 1).otherwise(0)).alias("n_bins_used"),
                F.sum(F.when(both, 0).otherwise(1)).alias("n_zero_bins"),
                F.sum(term).alias("psi_num")))
    return agg.withColumn(
        "psi",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
               F.col("psi_num").cast("double")
               / (F.col("n_a") * F.col("n_b") * F.lit(1000))
               .cast("double")))


# Benford expected first-digit probabilities, micro-scaled:
# round(log10(1 + 1/d) * 1e6) for d = 1..9, precomputed so BOTH
# engines consume identical integer literals (a runtime log10 could
# differ by an ulp across libms).
_BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181,
                  66947, 57992, 51153, 45757)


def benford_audit(df: DataFrame, *, value_col: str,
                  group_cols: list[str] | None = None) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / synthetic-corpus screen (real-world
    magnitudes follow P(d) = log10(1 + 1/d); generated or truncated
    data usually does not).

    Determinism: values must be INTEGER (floats raise); the first
    significant digit is taken from the STRING rendering of |v|
    (``substr(cast(abs(v) as string), 1, 1)``) — exact on every
    engine, never ``floor(log10(v))`` whose ulp-level boundary at
    powers of ten can differ across libms. Expected probabilities are
    the precomputed micro-scaled integer literals above, identical in
    both plans. Per digit the deviation
    ``dev_micro = |n_d·10⁶ − n·p_micro|`` is an exact BIGINT. Zero
    values drop (no leading digit); NULL keys drop.

    Scale shape: ONE conditional hash-aggregate over the data (nine
    digit counters per group, map-side combined), then a scalar
    9-struct explode per group row — absent digits are zero by
    construction, the table is scanned exactly once, and there is no
    window, join, or second pass.

    Output: (group..., digit INT 1–9, n_d, n, p_obs, p_exp,
    dev_micro) — 9 rows per group; p_obs NULL when the group is
    empty after filtering.
    """
    from pyspark.sql.types import DoubleType, FloatType

    fields = {f.name: f for f in df.schema.fields}
    if isinstance(fields[value_col].dataType, (DoubleType, FloatType)):
        raise ValueError(
            f"benford_audit: {value_col!r} is floating-point — "
            "integerize first (scale by a power of ten; the leading "
            "digit is scale-invariant)")
    gcols = list(group_cols or [])
    keep = F.col(value_col).isNotNull() & (F.col(value_col) != 0)
    for g in gcols:
        keep = keep & F.col(g).isNotNull()
    digit = F.substring(
        F.abs(F.col(value_col).cast("long")).cast("string"), 1, 1) \
        .cast("int")
    aggs = [F.sum(F.when(digit == d, 1).otherwise(0)).alias(f"_c{d}")
            for d in range(1, 10)]
    base = df.where(keep)
    s = (base.groupBy(*gcols) if gcols else base.groupBy()).agg(*aggs)
    n = sum((F.coalesce(F.col(f"_c{d}"), F.lit(0))
             for d in range(2, 10)),
            F.coalesce(F.col("_c1"), F.lit(0)))
    rows = F.array(*[
        F.struct(F.lit(d).alias("digit"),
                 F.coalesce(F.col(f"_c{d}"), F.lit(0)).alias("n_d"),
                 F.lit(_BENFORD_MICRO[d - 1]).alias("p_micro"))
        for d in range(1, 10)])
    e = (s.withColumn("n", n)
         .select(*gcols, "n", F.explode(rows).alias("_r")))
    return e.select(
        *gcols,
        F.col("_r.digit").alias("digit"),
        F.col("_r.n_d").alias("n_d"), "n",
        F.when(F.col("n") > 0,
               F.col("_r.n_d").cast("double") / F.col("n").cast("double"))
        .alias("p_obs"),
        (F.col("_r.p_micro").cast("double") / F.lit(1000000.0))
        .alias("p_exp"),
        F.abs(F.col("_r.n_d") * F.lit(1000000)
              - F.col("n") * F.col("_r.p_micro")).alias("dev_micro"))


def table_diff(left: DataFrame, right: DataFrame, *,
               key_cols: list[str],
               value_cols: list[str]) -> DataFrame:
    """Snapshot regression diff between two versions of a table: how
    many keys were added, removed, changed, or kept identical — the
    "what did this pipeline change" audit run before promoting a new
    snapshot (the tabular analogue of a git diffstat).

    Rows are compared by the md5 of the CONCATENATED STRING forms of
    ``value_cols`` (the package md5 discipline — NULL encoded
    distinctly from the string 'NULL' via a \\x00 sentinel), so a
    change in any compared column flips the key to `changed` without
    shipping the values through the join. Duplicate keys on either
    side are counted (``n_dup_keys_*``) and compared by their
    key-level row-hash MULTISET (order-free: the per-key md5s are
    XOR-folded, so duplicates and reordering are handled without a
    sort).

    Scale shape: each side collapses to one (key, fold, count) row
    per distinct key via a map-side-combinable hash-aggregate BEFORE
    the single full-outer equi-join on the key; the final summary is
    one single-row aggregate. Never a row-level value join.

    Output: ONE row (n_left, n_right, n_left_keys, n_right_keys,
    n_dup_keys_left, n_dup_keys_right, n_added, n_removed, n_changed,
    n_same) — `added` means present only in ``right``.
    """
    if not key_cols:
        raise ValueError("table_diff: key_cols must be non-empty")
    if not value_cols:
        raise ValueError("table_diff: value_cols must be non-empty")

    def _fold(df: DataFrame, tag: str) -> DataFrame:
        parts = []
        for c in value_cols:
            parts.append(F.coalesce(F.col(c).cast("string"),
                                    F.lit("\x00N")))
            parts.append(F.lit("\x1f"))
        rh = F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15),
                    16, 10).cast("long")
        keyok = F.lit(True)
        for kc in key_cols:
            keyok = keyok & F.col(kc).isNotNull()
        return (df.where(keyok)
                .select(*key_cols, rh.alias("_h"))
                .groupBy(*key_cols)
                .agg(F.count(F.lit(1)).alias(f"_n_{tag}"),
                     # order-free multiset fold: xor of per-row hashes
                     # + the row count distinguishes {h,h} from {h}
                     F.sum("_h").alias(f"_fold_{tag}")))

    lk = _fold(left, "l")
    rk = _fold(right, "r")
    j = lk.join(rk, key_cols, "full_outer")
    in_l = F.col("_n_l").isNotNull()
    in_r = F.col("_n_r").isNotNull()
    same = (in_l & in_r & (F.col("_fold_l") == F.col("_fold_r"))
            & (F.col("_n_l") == F.col("_n_r")))
    changed = in_l & in_r & ~same
    return j.agg(
        F.coalesce(F.sum("_n_l"), F.lit(0)).alias("n_left"),
        F.coalesce(F.sum("_n_r"), F.lit(0)).alias("n_right"),
        F.sum(in_l.cast("long")).alias("n_left_keys"),
        F.sum(in_r.cast("long")).alias("n_right_keys"),
        F.sum((in_l & (F.col("_n_l") > 1)).cast("long"))
        .alias("n_dup_keys_left"),
        F.sum((in_r & (F.col("_n_r") > 1)).cast("long"))
        .alias("n_dup_keys_right"),
        F.sum((in_r & ~in_l).cast("long")).alias("n_added"),
        F.sum((in_l & ~in_r).cast("long")).alias("n_removed"),
        F.sum(changed.cast("long")).alias("n_changed"),
        F.sum(same.cast("long")).alias("n_same"))


def k_anonymity_audit(df: DataFrame, *, quasi_cols: list[str],
                      k: int = 5) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns —
    before a table (or a training corpus's metadata sidecar) ships,
    how many rows sit in a quasi-identifier group smaller than k and
    are therefore re-identifiable by joining on those columns?

    Semantics: groups are the DISTINCT quasi-identifier combinations
    (NULL is a value — a NULL zip code still identifies the cohort of
    rows missing a zip code, so it audits like any other level). All
    counts are exact BIGINTs, the risk fraction ONE division.

    Scale shape: one hash-aggregate to group grain (map-side
    combine), one global aggregate over the (much smaller) group
    table. No window, no join, no Python.

    Output: ONE row (n_rows, n_groups, min_group_size,
    groups_at_risk, rows_at_risk, risk_fraction) — a table passes
    k-anonymity iff rows_at_risk = 0.
    """
    if not quasi_cols:
        raise ValueError(
            "k_anonymity_audit: quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k_anonymity_audit: k must be >= 2")
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    s = g.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_n").alias("min_group_size"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
        .alias("groups_at_risk"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .alias("rows_at_risk"))
    return s.select(
        "n_rows", "n_groups", "min_group_size", "groups_at_risk",
        "rows_at_risk",
        F.when(F.col("n_rows") > 0,
               F.col("rows_at_risk").cast("double")
               / F.col("n_rows").cast("double"))
        .alias("risk_fraction"))


def cohens_kappa(df: DataFrame, *, rater_a: str,
                 rater_b: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two label columns
    over the same rows — chance-corrected agreement, THE metric for
    "do my two quality filters / LLM judges / annotators actually
    agree?" beside :func:`classification_report` (which presumes one
    side is ground truth).

    Determinism: observed agreement and the per-label marginal
    products are exact BIGINTs off two tiny hash-aggregates;
    ``kappa = (agree·n − Σ na·nb) / (n·n − Σ na·nb)`` is ONE
    division of exact integers (po/pe likewise single divisions).
    NULL labels on either side drop the row.

    Scale shape: one full-scan aggregate for (n, agree), two
    per-label aggregates joined on the tiny label set, two 1-row
    broadcast cross-joins. Overflow headroom: n·n — safe to ~3·10⁹
    rows (documented).

    Output: one row (n, n_agree, po, pe, kappa) — kappa NULL when
    pe = 1 (both raters constant and equal: agreement is
    indistinguishable from chance).
    """
    base = (df.where(F.col(rater_a).isNotNull()
                     & F.col(rater_b).isNotNull())
            .select(F.col(rater_a).cast("string").alias("_a"),
                    F.col(rater_b).cast("string").alias("_b")))
    tot = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long"))
        .alias("n_agree"))
    na = base.groupBy(F.col("_a").alias("_l")).agg(
        F.count(F.lit(1)).alias("_na"))
    nb = base.groupBy(F.col("_b").alias("_l")).agg(
        F.count(F.lit(1)).alias("_nb"))
    pe_num = (na.join(nb, "_l")
              .agg(F.coalesce(F.sum(F.col("_na") * F.col("_nb")),
                              F.lit(0)).alias("_pn")))
    j = tot.crossJoin(F.broadcast(pe_num))
    n = F.col("n")
    nd = n.cast("double")
    po = F.when(n > 0, F.col("n_agree").cast("double") / nd)
    pe = F.when(n > 0, F.col("_pn").cast("double") / (nd * nd))
    kap = F.when(
        (n > 0) & (n * n != F.col("_pn")),
        (F.col("n_agree") * n - F.col("_pn")).cast("double")
        / (n * n - F.col("_pn")).cast("double"))
    return j.select("n", "n_agree", po.alias("po"), pe.alias("pe"),
                    kap.alias("kappa"))


def fd_violations(df: DataFrame, *, key_cols: list[str],
                  dep_cols: list[str]) -> DataFrame:
    """Functional-dependency audit: which keys map to MORE than one
    distinct dependent tuple? The "should-be-determined" data-quality
    check beside :func:`orphan_audit`'s referential view — a clean
    key→attribute dependency (user → country, order → priority)
    violated by dirty ingestion shows up here as a key with
    n_variants > 1.

    Determinism: exact distinct counts — bit-exact cross-engine.

    Scale shape: one distinct on (key, dep) with map-side combine,
    one hash-aggregate on the key, then the violation filter — two
    shuffles on the key, no join. The output is bounded by the
    number of VIOLATING keys (clean data → empty).

    Output: (key..., n_variants BIGINT, n_rows BIGINT) for keys
    with n_variants > 1.
    """
    if not key_cols or not dep_cols:
        raise ValueError("fd_violations: key_cols and dep_cols must "
                         "be non-empty")
    keep = F.lit(True)
    for c in key_cols:
        keep = keep & F.col(c).isNotNull()
    base = df.where(keep)
    per = (base.groupBy(*key_cols)
           .agg(F.countDistinct(F.struct(*[F.col(c) for c in dep_cols]))
                .cast("long").alias("n_variants"),
                F.count(F.lit(1)).cast("long").alias("n_rows")))
    return per.where(F.col("n_variants") > 1)
