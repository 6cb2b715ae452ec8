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
    # layers + style catalog (the reference's convert(), distributed)
    from kml2geojson_spark.engine import convert_documents
    corpus = ensure_corpus(spark, n_docs)
    docs_df = spark.read.parquet(corpus)
    t0 = time.time()
    n_layers = convert_documents(docs_df, style_type="svg").select(
        "doc_id", "layer_names").count()
    timings["kml_convert_full"] = round(time.time() - t0, 3)
    if n_layers == 0:
        print("WARN: convert_full returned 0 rows", file=sys.stderr)

    for name in BENCH_QUERIES:
        fn = qdefs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        if n == 0:
            print(f"WARN: {name} returned 0 rows", file=sys.stderr)

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
