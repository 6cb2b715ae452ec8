"""Bucketed (co-located) tables: pre-shuffle once at write time, then
join/aggregate on the bucket key with NO exchange at read time.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Spark's table bucketing (`DataFrameWriter.bucketBy`) hash-
partitions rows into a fixed number of files per partition AT WRITE
TIME; two tables bucketed by the same key into the same bucket count
then join with zero Exchange — each task reads matching bucket files
from both sides (plan-asserted in tests/test_plans.py). The same
write also serves repeated aggregations on the bucket key.

This is the table-layout counterpart of :mod:`.spatial.salted`: salting
handles skewed keys inside one query; bucketing amortizes the shuffle
across EVERY future query on the key. For the engine's spans tables,
bucketing by ``doc_id`` co-locates a documents⋈features⋈styles
pipeline end-to-end.

Requires a session catalog (Spark's default in-memory catalog with a
spark-warehouse dir works; a production deployment uses its metastore /
Iceberg catalog, where the same ``bucketBy`` call applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   *, sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and by default
    sorted) by ``key``. Pick ``n_buckets`` ≈ cluster task slots ×
    small-multiple; both sides of a co-located join MUST use the same
    key and bucket count."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog;
    a plain ``spark.read.parquet`` of the files would LOSE the bucket
    spec and reintroduce the shuffle)."""
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two same-key/same-count bucketed tables — shuffle-free by
    construction (the plan contains no Exchange; asserted in tests)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key, how)
