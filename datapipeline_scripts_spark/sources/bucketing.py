"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the lineitem⋈orders join is the dominant shuffle. Bucketing
both tables by the join key at write time (`.bucketBy(n, key)
.sortBy(key)`) persists a hash-partitioned, per-bucket-sorted layout in
the metastore; a later join on that key reads matching buckets
pairwise — **zero exchange, zero sort** in the plan. This is the Spark
equivalent of the co-located table strategy every MPP warehouse uses,
and the right physical design for the snapshot warehouse this engine
writes (SURVEY §4.2 "partitioning/shuffling").

Bucket count guidance: #buckets × target-file-size ≈ table size;
buckets must match across co-joined tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and per-bucket sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With matching
    bucket counts the planner emits a SortMergeJoin with NO Exchange on
    either side (asserted in tests/test_bucketing.py).

    The merge hint pins the sort-merge strategy: at fixture scale AQE
    would broadcast one side instead, which bypasses the bucketed read
    ("Bucketed: false — disabled by query planner"); at the scale
    bucketing exists for, neither side is broadcastable anyway."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
