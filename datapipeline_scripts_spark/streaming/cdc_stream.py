"""Streaming CDC merge: an upsert stream applied incrementally into a
parquet base table via foreachBatch — the lakehouse ingestion pattern
(`MERGE INTO` per micro-batch) built from first principles.

Each micro-batch: (1) reduce the batch to its newest row per key,
(2) latest-wins merge with the current base version, (3) write a NEW
versioned directory (never overwrite-in-place while readers exist —
poor man's snapshot isolation, the same idea a table format's commit
log formalizes). The merge result is provably independent of how the
stream was chopped into micro-batches because latest-wins is
associative — asserted in tests/test_streaming.py by replaying the
same data as 1 batch and as N batches.

Scale notes: the per-batch merge is one equi-join on the merge key —
the changeset side is a micro-batch (≪ base) so AQE broadcasts it; a
partitioned base rewrites only touched partitions
(partitionOverwriteMode=dynamic). State lives in the base table, not
the state store, so key cardinality is unbounded.

Reference analogue: replaces re-extracting the whole database each
schedule (/root/reference/backup.sh:210) with applying the day's
changes.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_scripts_spark.registry import query
from datapipeline_scripts_spark.streaming.stream_jobs import _events_stream


def _latest_per_user(df: DataFrame) -> DataFrame:
    """Newest row per user_id (ts desc, event_id desc tie-break)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def merge_stream(spark: SparkSession, source: DataFrame) -> DataFrame:
    """Drain `source` (availableNow) through a foreachBatch latest-wins
    merge into a versioned parquet base; return the final base content
    (localCheckpoint-ed so scratch can be removed)."""
    root = tempfile.mkdtemp(prefix="spark_cdc_merge_")
    state = {"version": None}
    try:

        def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
            newest = _latest_per_user(batch_df)
            if state["version"] is not None:
                cur = spark.read.parquet(os.path.join(root, f"v{state['version']}"))
                newest = _latest_per_user(cur.unionByName(newest))
            newest.write.mode("overwrite").parquet(os.path.join(root, f"v{batch_id}"))
            state["version"] = batch_id

        q = (
            source.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        if state["version"] is None:  # empty stream
            return spark.createDataFrame([], source.schema)
        final = spark.read.parquet(os.path.join(root, f"v{state['version']}"))
        return final.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "cdc_stream_merge",
    oracle="""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_id AS last_event_id,
           value AS last_value
    FROM (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def cdc_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table replayed as an upsert stream and merged into a
    per-user latest-state table. Must hash-match the batch latest-row
    oracle exactly — streaming/batch unification for the CDC path."""
    stream = _events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    merged = merge_stream(spark, stream)
    return merged.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )
