"""Data-quality audits (kml2geojson_spark/quality.py, registered
q124–q126 post-pin — driver CORRECTNESS rows never appear for them;
the in-repo oracle sweep in BENCH/ is their cross-engine evidence).
These tests pin the edge semantics and plan shapes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kml2geojson_spark.quality import (orphan_audit, column_profile,
                                       dup_cluster_stats,
                                       join_cardinality_estimate,
                                       grouped_heavy_hitters)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ----------------------------------------------------------- orphan audit


def test_orphan_audit_counts_orphans_nulls_and_fanout(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, 99),
         (7, None)],
        "row_id long, fk long")
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    (row,) = orphan_audit(child, parent, child_key="fk",
                          parent_key="pk", relation="c->p").collect()
    assert row["relation"] == "c->p"
    assert row["n_rows"] == 7
    assert row["n_null_keys"] == 1
    assert row["n_distinct_keys"] == 3      # 10, 20, 99
    assert row["n_orphan_keys"] == 1        # 99
    assert row["n_orphan_rows"] == 3        # rows 4, 5, 6


def test_orphan_audit_clean_relation_is_all_zero_orphans(spark):
    child = spark.createDataFrame([(1, 10), (2, 20)], "r long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    (row,) = orphan_audit(child, parent, child_key="fk",
                          parent_key="pk").collect()
    assert row["relation"] == "fk->pk"      # default label
    assert row["n_orphan_keys"] == 0 and row["n_orphan_rows"] == 0


def test_orphan_audit_empty_child(spark):
    child = spark.createDataFrame([], "r long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    (row,) = orphan_audit(child, parent, child_key="fk",
                          parent_key="pk").collect()
    assert (row["n_rows"], row["n_null_keys"], row["n_distinct_keys"],
            row["n_orphan_keys"], row["n_orphan_rows"]) == (0, 0, 0,
                                                            0, 0)


def test_orphan_audit_distinct_shrinks_before_antijoin(spark):
    """The anti-join must probe the (key, count) aggregate, not raw
    child rows: the plan's anti-join sits ABOVE a hash aggregate on
    the child side."""
    child = spark.createDataFrame([(i, i % 5) for i in range(100)],
                                  "r long, fk long")
    parent = spark.createDataFrame([(0,), (1,)], "pk long")
    plan = _plan(orphan_audit(child, parent, child_key="fk",
                              parent_key="pk"))
    assert "LeftAnti" in plan
    # no row-level child×parent join: the only join inputs are
    # aggregates / single-row frames
    assert "HashAggregate" in plan


# --------------------------------------------------------- column profile


def test_column_profile_counts_and_extremes(spark):
    df = spark.createDataFrame(
        [(1, "b", 2.5), (2, "a", 2.5), (2, None, None), (None, "c", 9.0)],
        "k long, s string, v double")
    got = {r["col_name"]: r for r in column_profile(
        df, ["k", "s", "v"]).collect()}
    assert set(got) == {"k", "s", "v"}
    k = got["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 1, 2)
    assert (k["min_val"], k["max_val"]) == ("1", "2")
    s = got["s"]
    assert (s["n_null"], s["n_distinct"]) == (1, 3)
    assert (s["min_val"], s["max_val"]) == ("a", "c")
    v = got["v"]  # doubles profiled engine-side (cast parity note)
    assert (v["n_null"], v["n_distinct"]) == (1, 2)
    assert v["min_val"] == "2.5" and v["max_val"] == "9.0"


def test_column_profile_approx_mode_values_and_plans(spark):
    df = spark.createDataFrame([(i, str(i)) for i in range(50)],
                               "k long, s string")
    exact = {r["col_name"]: r["n_distinct"]
             for r in column_profile(df, ["k", "s"]).collect()}
    approx = {r["col_name"]: r["n_distinct"]
              for r in column_profile(df, ["k", "s"],
                                      exact=False).collect()}
    assert exact == {"k": 50, "s": 50}
    for c in ("k", "s"):  # HLL++ default rsd 5%
        assert abs(approx[c] - 50) <= 5
    # single-distinct rewrite: two exchanges, never an Expand blowup;
    # approx mode drops to the single col_name exchange
    exact_plan = _plan(column_profile(df, ["k"]))
    assert "Expand" not in exact_plan
    assert exact_plan.count("Exchange") == 2
    assert "Expand" not in _plan(column_profile(df, ["k"], exact=False))


def test_column_profile_single_shuffle(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = _plan(column_profile(df, ["k", "s"], exact=False))
    assert plan.count("Exchange") == 1  # the col_name hash-agg only


def test_column_profile_rejects_empty_cols(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        column_profile(df, [])


# ------------------------------------------------------ dup cluster stats


def test_dup_cluster_stats_histogram(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"),       # cluster of 3
         (4, "y"), (5, "y"),                 # cluster of 2
         (6, "z"), (7, "w"),                 # two singletons
         (8, None)],                         # dropped
        "doc_id long, text string")
    got = {r["cluster_size"]: r for r in
           dup_cluster_stats(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_clusters"] == 2 and got[1]["n_docs"] == 2
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3


def test_dup_cluster_stats_shuffles_fingerprints_not_text(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = _plan(dup_cluster_stats(docs))
    # the text column must be pruned before the first exchange: after
    # projection only the md5 fingerprint survives
    assert "md5" in plan.lower()
    first_exchange = plan.index("Exchange")
    assert "text" not in plan[first_exchange:plan.index(
        "Exchange", first_exchange + 1) if plan.count("Exchange") > 1
        else len(plan)].split("Scan")[0]


# ------------------------------------------------ join cardinality audit


def test_join_cardinality_exact_counts(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (None, "e")],
        "k long, payload string")
    right = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "w"), (9, "v")],
        "k long, payload string")
    (row,) = join_cardinality_estimate(
        left, right, left_key="k", right_key="k").collect()
    assert row["n_left_rows"] == 5 and row["n_right_rows"] == 5
    assert row["n_left_keys"] == 3 and row["n_right_keys"] == 3
    assert row["n_common_keys"] == 2           # keys 1 and 2
    assert row["est_output_rows"] == 2 * 3 + 1  # k=1: 2·3, k=2: 1·1
    assert row["max_single_key_rows"] == 6
    # ground truth: the estimate equals the real join's cardinality
    real = left.where(F.col("k").isNotNull()).join(
        right.withColumnRenamed("payload", "p2"), "k").count()
    assert row["est_output_rows"] == real


def test_join_cardinality_disjoint_keys(spark):
    left = spark.createDataFrame([(1,)], "k long")
    right = spark.createDataFrame([(2,)], "k long")
    (row,) = join_cardinality_estimate(
        left, right, left_key="k", right_key="k").collect()
    assert row["n_common_keys"] == 0
    assert row["est_output_rows"] == 0
    assert row["max_single_key_rows"] == 0


def test_join_cardinality_probes_aggregates_not_rows(spark):
    left = spark.createDataFrame([(i % 3, i) for i in range(60)],
                                 "k long, v long")
    right = spark.createDataFrame([(i % 3, i) for i in range(60)],
                                  "k long, v long")
    plan = _plan(join_cardinality_estimate(
        left, right, left_key="k", right_key="k"))
    # the key-key equi-join consumes two hash aggregates; the raw
    # tables only ever feed aggregates (no row-level left x right join)
    assert "HashAggregate" in plan


# ------------------------------------------------------ grouped heavy hitters


def test_grouped_heavy_hitters_rank_share_and_ties(spark):
    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"),
         ("g1", "c"),
         ("g2", "z"),
         (None, "q"), ("g3", None)],
        "grp string, val string")
    rows = grouped_heavy_hitters(df, group_col="grp", value_col="val",
                                 k=2).collect()
    got = {(r["grp"], r["rnk"]): r for r in rows}
    # g1: a and b tie at cnt=2 → value-asc breaks it; c cut by k=2
    assert got[("g1", 1)]["value"] == "a"
    assert got[("g1", 2)]["value"] == "b"
    assert ("g1", 3) not in got
    assert got[("g1", 1)]["share_ppm"] == 2 * 1000000 // 5
    assert got[("g2", 1)]["value"] == "z"
    assert got[("g2", 1)]["share_ppm"] == 1000000
    # NULL group / NULL value rows dropped entirely
    assert all(r["grp"] in ("g1", "g2") for r in rows)


def test_grouped_heavy_hitters_windows_on_aggregate(spark):
    df = spark.createDataFrame([("g", str(i % 4)) for i in range(100)],
                               "grp string, val string")
    plan = _plan(grouped_heavy_hitters(df, group_col="grp",
                                       value_col="val", k=3))
    # the window input is the (grp, val) aggregate, never raw rows
    agg_pos = plan.index("HashAggregate")
    assert "Window" in plan
    assert plan.index("Window") < agg_pos  # window sits above the agg


def test_grouped_heavy_hitters_rejects_bad_k(spark):
    df = spark.createDataFrame([("g", "v")], "grp string, val string")
    with pytest.raises(ValueError):
        grouped_heavy_hitters(df, group_col="grp", value_col="val",
                              k=0)


# ------------------------------------------------- cross-engine (duckdb)


def test_q124_q126_match_duckdb_at_sf0001(spark):
    import duckdb
    import __spark_entry__ as entry
    from tools.check_oracle import value_hash, TABLES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name in ("q124_orphan_audit", "q125_column_profile",
                 "q126_dup_cluster_stats", "q127_join_card",
                 "q128_heavy_hitters"):
        spdf = qs[name](spark, sf).toPandas()
        dkdf = con.execute(oracles[name]).df()
        assert sorted(spdf.columns) == sorted(dkdf.columns), name
        assert len(spdf) == len(dkdf), name
        assert value_hash(spdf) == value_hash(dkdf), name
