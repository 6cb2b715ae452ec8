"""Benchmark harness — one JSON line on stdout.

Runs the headline end-to-end KML→tiles pipeline (synthesized interleaved
spans corpus → Arrow state-machine parse → typed features → Morton tile
assignment) plus representative operator queries from ``__spark_entry__``
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

``tools/scaling_bench.py`` reuses ``run_suite`` at two parallelism
levels for the N→4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))

# representative operator queries (name → exercises)
BENCH_QUERIES = [
    "q02_pricing_summary",   # 600k-row hash agg
    "q03_topk_revenue",      # 3-way join + agg + top-k
    "q06_window_topn",       # window function
    "q10_cell_counts",       # JVM Morton encode + agg
    "q11_pip",               # cell-bucketed ray-cast PIP join
    "q13_knn_kring",         # k-ring kNN + re-rank
    "q14_coverage_rect",     # cover explode + interval fractions
    "q15_salted_join_agg",   # explicit skew-salted join
    "q16_cell_rollup",       # res-12 encode + parent rollup (600k rows)
    "q17_asof_join",         # cogrouped as-of join (events)
    "q18_rollup",            # OLAP rollup + grouping ids
    "q20_exact_dedup",       # hash dedup
    "q25_ngram_jaccard",     # n-gram explode + self-join
    "q26_simhash_pairs",     # SQL simhash + complete banded self-join
    "q28_tumbling_window",   # 1h tumbling time-window agg
    "q30_cosine_topk",       # brute-force cosine top-k
    "q40_minhash_pairs",     # minhash + LSH banding
    "q44_ivf_topk",          # IVF-bucketed ANN probe + re-rank
    "q132_geofence_dwell",   # pip_join x trajectory-window dwell
    "q234_polygon_overlap",  # bbox-cell-bucketed SH polygon overlap join
    "q237_hits",             # 3-round integer HITS (iterative join loop)
    "q249_peak_concurrency",  # half-open interval sweep window
]


def make_spark(cpus: int, app: str = "kml2geojson-spark-bench"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


CORPUS_ROOT = os.environ.get("SPARK_GRAFT_CORPUS", "/tmp/kml2geojson_bench")


def ensure_corpus(spark, n_docs: int, partitions: int = 128) -> str:
    """Materialize the deterministic spans corpus ONCE (lineage
    checkpoint — reruns and other parallelism levels reuse it). The
    corpus parquet is the benchmark input table; generation is setup,
    not measurement."""
    import kml2geojson_spark as k2gs
    from kml2geojson_spark.lineage import LineageLog

    log = LineageLog(CORPUS_ROOT)
    _, manifest = log.run_stage(
        spark, "corpus",
        lambda: k2gs.synthesize_documents_kml(
            spark, n_docs, seed=42, partitions=partitions),
        params={"n_docs": n_docs, "seed": 42, "partitions": partitions})
    sid = manifest["snapshot_id"]
    return f"{CORPUS_ROOT}/corpus/{sid}/data"


def run_kml_pipeline(spark, n_docs: int, res: int = 8) -> dict:
    """Headline: spans parquet (Iceberg-style table) → Arrow
    state-machine parse → Morton encode → tile assignment.
    Returns timings + invariant counts (cross-run equality evidence)."""
    from kml2geojson_spark.engine import tile_counts_from_parquet

    corpus = ensure_corpus(spark, n_docs)
    t0 = time.time()
    tiles = tile_counts_from_parquet(spark, corpus, res)
    agg = tiles.agg(
        {"n_features": "sum", "cell_id": "count"}).collect()[0]
    wall = time.time() - t0
    return {
        "sec": wall,
        "n_docs": n_docs,
        "docs_per_sec": n_docs / wall,
        "total_point_features": int(agg["sum(n_features)"]),
        "n_tiles": int(agg["count(cell_id)"]),
    }


SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "1000000"))
SCALE_COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))


def ensure_scaled_lineitem(spark, sf_dir: str, copies: int) -> str:
    """10x-replicated lineitem (key-offset copies, deterministic,
    materialized once via the lineage log) — the shuffle-heavy
    relational bench input (~6M rows at sf0.1 x10 ≈ sf1)."""
    from pyspark.sql import functions as F
    from kml2geojson_spark.lineage import LineageLog

    log = LineageLog(CORPUS_ROOT)

    def build():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        c = F.explode(F.array(*[F.lit(i) for i in range(copies)])).alias("_c")
        # repartition BEFORE the write: the source is one small file, so
        # without it the whole x10 corpus lands in ONE parquet file /
        # one row-group — every downstream scan then degenerates to a
        # single working task (observed: 11 empty byte-range splits + 1
        # straggler doing all 6M rows). File layout IS the parallelism
        # at any scale; 64 files ≈ 0.7 MB each here, and at 100 TB the
        # same rule is "write as many files as you want scan tasks".
        return (li.select("*", c)
                .withColumn("l_orderkey",
                            F.col("l_orderkey")
                            + F.col("_c").cast("long") * F.lit(1 << 40))
                .drop("_c")
                .repartition(64))

    _, manifest = log.run_stage(
        spark, f"lineitem_x{copies}", build,
        params={"sf_dir": sf_dir, "copies": copies, "layout": "r64"})
    sid = manifest["snapshot_id"]
    return f"{CORPUS_ROOT}/lineitem_x{copies}/{sid}/data"


def run_scaled_relational(spark, sf_dir: str, copies: int,
                          timings: dict) -> None:
    """Shuffle-heavy operators at ~sf1 row counts (10x lineitem):
    regressions in exchange/agg plans show up here, not at sf0.1."""
    from pyspark.sql import functions as F
    from kml2geojson_spark.spatial import encode_points, salted_join, hot_keys
    from kml2geojson_spark.spatial.cells import cell_parent_col

    path = ensure_scaled_lineitem(spark, sf_dir, copies)
    li = spark.read.parquet(path)

    # res-12 encode + parent rollup over ~6M synthetic points
    t0 = time.time()
    x = ((F.col("l_orderkey") * 131 + F.col("l_linenumber") * 7 + 17)
         % 36000) / 100.0 - 180.0
    y = ((F.col("l_orderkey") * 241 + F.col("l_linenumber") * 11 + 29)
         % 17000) / 100.0 - 85.0
    pts = li.select(x.alias("x"), y.alias("y"))
    fine = encode_points(pts, 12)
    n = (fine.withColumn("cell6", cell_parent_col(F.col("cell_id"), 6))
         .groupBy("cell6").agg(F.count(F.lit(1)).alias("n_points"))).count()
    timings["x10_cell_rollup"] = round(time.time() - t0, 3)
    if n == 0:
        print("WARN: x10_cell_rollup returned 0 rows", file=sys.stderr)

    # explicit skew-salted join + agg at 10x probe size
    t0 = time.time()
    s = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
         .select(F.col("s_suppkey").alias("l_suppkey"), "s_name"))
    probe = li.select("l_suppkey", "l_quantity")
    hot = hot_keys(probe, "l_suppkey", sample_fraction=0.02, min_share=0.005)
    joined = salted_join(probe, s, "l_suppkey", n_salt=8, hot=hot)
    n = (joined.groupBy("s_name")
         .agg(F.sum("l_quantity").alias("q"))).count()
    timings["x10_salted_join_agg"] = round(time.time() - t0, 3)
    if n == 0:
        print("WARN: x10_salted_join_agg returned 0 rows", file=sys.stderr)


def run_near_dedup_scaled(spark, sf_dir: str, copies: int,
                          timings: dict) -> None:
    """The flagship LLM-pipeline COMPOSITION (q59) at a 10x corpus:
    exact-dup collapse → SimHash over representatives only → star
    connected components → per-doc representative. The replicated
    corpus is adversarial by construction: even copies repeat each
    document byte-for-byte (a k-member exact-dup group that MUST
    collapse before the band join — the k² collision hazard), odd
    copies append a per-copy suffix (near-dup chains for the SimHash +
    components stages). Materialized once via the lineage log, like
    the other x10 inputs."""
    from pyspark.sql import functions as F
    from kml2geojson_spark.lineage import LineageLog
    from kml2geojson_spark.textops import near_dedup_representatives

    log = LineageLog(CORPUS_ROOT)

    def build():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        c = F.explode(F.array(*[F.lit(i) for i in range(copies)])).alias("_c")
        return (docs.select("doc_id", "text", c)
                .withColumn("doc_id",
                            F.col("doc_id")
                            + F.col("_c").cast("long") * F.lit(1 << 40))
                .withColumn("text", F.when(
                    F.col("_c") % 2 == 1,
                    F.concat(F.col("text"), F.lit(" tail"),
                             F.col("_c").cast("string")))
                    .otherwise(F.col("text")))
                .drop("_c")
                .repartition(32))  # file layout = scan parallelism

    _, manifest = log.run_stage(
        spark, f"documents_x{copies}", build,
        params={"sf_dir": sf_dir, "copies": copies, "layout": "r32"})
    path = f"{CORPUS_ROOT}/documents_x{copies}/{manifest['snapshot_id']}/data"
    docs = spark.read.parquet(path)
    best, n = None, 0
    for _ in range(2):
        t0 = time.time()
        n = near_dedup_representatives(docs).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["x10_near_dedup"] = round(best, 3)
    if n == 0:
        print("WARN: x10_near_dedup returned 0 rows", file=sys.stderr)


SKEW_ROWS = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "8000000"))


def run_skew_join_bench(spark, timings: dict) -> None:
    """MEASURED salting benefit (not just row-equality): the same
    shuffle join + agg on a deliberately skewed key — 7/8 of all probe
    rows share ONE hot key (a city cell) — run unsalted vs through
    :func:`salted_join`. Broadcast is disabled and AQE's skew-join
    rewrite is off for BOTH compared runs: that isolates the
    non-broadcastable regime (a polygon-cell build side at 100 TB)
    where the north rule's explicit salting is the mechanism (AQE only
    rescues sort-merge joins after the fact; the engine's salting works
    on any equi-join and keeps lineage-deterministic salt assignments).
    The ``_aqe`` entry is the session's default conf for transparency —
    at this toy build-side size it broadcasts (no shuffle, skew-immune),
    which is indeed the engine's first-choice plan when the build side
    fits. Single-host caveat: all 32 threads share one memory bus, so
    the single hot task runs at full uncontended single-core speed
    while salted tasks compete — the measured ~2-2.6x win here
    UNDERSTATES a real cluster, where the unsalted hot partition is one
    executor's entire wall clock while the rest idle. The 7/8 hot
    share keeps the signal above host-clock noise (min-of-2 per
    variant)."""
    from pyspark.sql import functions as F
    from kml2geojson_spark.spatial import salted_join

    hot_key = 7
    # 7/8 of all probe rows share ONE key (the hot-task cost must
    # dominate the fixed all-rows shuffle for the single-host signal
    # to be robust); inputs are cached and materialized BEFORE timing
    # so the numbers isolate join+agg, not row generation
    probe = spark.range(SKEW_ROWS).select(
        F.when(F.col("id") % 8 != 0, F.lit(hot_key))
        .otherwise(F.col("id") % 100_000).alias("cell_key"),
        (F.col("id") % 9973).cast("double").alias("val")).cache()
    build = spark.range(100_000).select(
        F.col("id").alias("cell_key"),
        (F.col("id") % 13).alias("grp")).cache()
    probe.count(), build.count()

    def run_agg(joined) -> int:
        return (joined.groupBy("grp")
                .agg(F.sum("val").alias("v")).count())

    t0 = time.time()
    run_agg(probe.join(build, "cell_key"))
    timings["skew_join_unsalted_aqe"] = round(time.time() - t0, 3)

    saved = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.enabled":
            spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

        def timed_min2(make_df) -> float:
            # interleave-resistant: min of 2 runs per variant (the
            # shared-host clock drifts under sustained bench load)
            best = None
            for _ in range(2):
                t0 = time.time()
                run_agg(make_df())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 3)

        timings["skew_join_unsalted"] = timed_min2(
            lambda: probe.join(build, "cell_key"))
        timings["skew_join_salted"] = timed_min2(
            lambda: salted_join(probe, build, "cell_key", n_salt=32,
                                hot=[hot_key]))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        probe.unpersist()
        build.unpersist()
    if timings["skew_join_salted"] >= timings["skew_join_unsalted"]:
        print("WARN: salted skew join did not beat unsalted "
              f"({timings['skew_join_salted']}s vs "
              f"{timings['skew_join_unsalted']}s)", file=sys.stderr)


def run_pip_cogroup(spark, sf_dir: str, timings: dict) -> None:
    """The any-scale PIP shape under per-round measurement: ~600k
    lineitem-derived points ⋈ 2000 synthetic diamond polygons via the
    cell cogroup (rings never touch the driver)."""
    from pyspark.sql import functions as F
    from kml2geojson_spark.spatial import pip_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    x = ((F.col("l_orderkey") * 131 + F.col("l_linenumber") * 7 + 17)
         % 36000) / 100.0 - 180.0
    y = ((F.col("l_orderkey") * 241 + F.col("l_linenumber") * 11 + 29)
         % 17000) / 100.0 - 85.0
    pts = li.select(
        F.xxhash64("l_orderkey", "l_linenumber").alias("point_id"),
        x.alias("x"), y.alias("y"))
    p = spark.read.parquet(f"{sf_dir}/part.parquet") \
        .where(F.col("p_partkey") <= 2000)
    cx = ((F.col("p_partkey") * 2971 + 1234) % 30000) / 100.0 - 150.0
    cy = ((F.col("p_partkey") * 4231 + 567) % 13000) / 100.0 - 65.0
    r = F.lit(2.0) + (F.col("p_partkey") % 7) * 1.0
    ring = F.array(
        F.array(cx + r, cy), F.array(cx, cy + r),
        F.array(cx - r, cy), F.array(cx, cy - r), F.array(cx + r, cy))
    polys = p.select(F.col("p_partkey").cast("long").alias("poly_id"),
                     F.array(ring).alias("rings"))
    t0 = time.time()
    n = pip_join(pts, polys, 7, rings_distribution="cogroup").count()
    timings["pip_cogroup_600k"] = round(time.time() - t0, 3)
    if n == 0:
        print("WARN: pip_cogroup_600k returned 0 rows", file=sys.stderr)


def run_suite(spark, sf_dir: str, n_docs: int) -> dict:
    import __spark_entry__ as entry_mod

    qdefs = entry_mod.queries()
    timings: dict[str, float] = {}

    # cold run pays one-time corpus build + Python-worker spin-up;
    # the warm run is the steady-state number a long job sees.
    cold = run_kml_pipeline(spark, n_docs)
    pipeline = run_kml_pipeline(spark, n_docs)
    timings["kml_parse_tile_pipeline"] = round(pipeline["sec"], 3)
    timings["kml_parse_tile_pipeline_cold"] = round(cold["sec"], 3)

    # full conversion throughput: every document -> complete GeoJSON
    # layers + style catalog (the reference's convert(), distributed;
    # row path — measured faster than the file-granular scan for this
    # CPU-dominated op, see convert_documents_from_parquet docstring)
    from kml2geojson_spark.engine import convert_documents
    corpus = ensure_corpus(spark, n_docs)
    docs_df = spark.read.parquet(corpus)
    # cold vs warm recorded separately: the first run pays Python
    # worker spin-up + scan warmup (~2x measured: 16.5s cold vs
    # 7-9s warm at 100k docs) — exactly the r2→r3 "regression" that
    # turned out to be which run the sampler caught
    best, n_layers = None, 0
    for i in range(2):
        t0 = time.time()
        n_layers = convert_documents(docs_df, style_type="svg").select(
            "doc_id", "layer_names").count()
        dt = time.time() - t0
        if i == 0:
            timings["kml_convert_full_cold"] = round(dt, 3)
        best = dt if best is None else min(best, dt)
    timings["kml_convert_full"] = round(best, 3)
    if n_layers == 0:
        print("WARN: convert_full returned 0 rows", file=sys.stderr)

    # min over two TEMPORALLY SEPARATED passes of min-of-2 warm runs:
    # the shared host's load arrives in multi-minute bursts (observed
    # 4-20x slowdowns on unchanged queries), so back-to-back samples
    # share the burst — a second pass minutes later escapes it. A
    # single sample conflates host load with code changes (round 3's
    # driver run measured 2.1x uniform slowdowns on unchanged queries).
    for _pass in range(2):
        for name in BENCH_QUERIES:
            fn = qdefs[name]
            best, n = timings.get(name), 0
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            if n == 0:
                print(f"WARN: {name} returned 0 rows", file=sys.stderr)

    # the RECORDED scale numbers (not a one-off probe): the headline
    # pipeline at 10x docs and shuffle-heavy relational ops at 10x rows
    scale = {}
    if SCALE_DOCS:
        # min-of-2 for the headline scale entry as well: at 35-75 s a
        # single sample swings ~2x with shared-host load
        big = run_kml_pipeline(spark, SCALE_DOCS)
        big2 = run_kml_pipeline(spark, SCALE_DOCS)
        if big2["sec"] < big["sec"]:
            big = big2
        timings["kml_parse_tile_pipeline_10x"] = round(big["sec"], 3)
        scale = {
            "scale_docs": big["n_docs"],
            "scale_docs_per_sec": round(big["docs_per_sec"], 1),
            "scale_point_features": big["total_point_features"],
            "scale_n_tiles": big["n_tiles"],
        }
    if SCALE_COPIES:
        run_scaled_relational(spark, sf_dir, SCALE_COPIES, timings)
        run_near_dedup_scaled(spark, sf_dir, SCALE_COPIES, timings)
    run_pip_cogroup(spark, sf_dir, timings)
    if SKEW_ROWS:
        run_skew_join_bench(spark, timings)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "kml-convert+tile pipeline and operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_docs": pipeline["n_docs"],
        "docs_per_sec": round(pipeline["docs_per_sec"], 1),
        "total_point_features": pipeline["total_point_features"],
        "n_tiles": pipeline["n_tiles"],
        **scale,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    result = run_suite(spark, sf_dir, BENCH_DOCS)
    result["cpus"] = cpus
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
