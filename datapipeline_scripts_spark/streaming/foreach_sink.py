"""foreachBatch sink: idempotent micro-batch writes to a parquet
landing zone — the pattern for sinks Spark has no transactional
connector for.

Exactly-once = checkpointed source offsets (a replayed trigger resumes
where the last committed batch ended) + an idempotent batch write (a
retried batch_id overwrites its own output instead of appending a
duplicate). Here each micro-batch lands in `batch_id=N/` with
dynamic-overwrite semantics, so re-processing batch N is a no-op
rewrite, never a duplicate append.

At scale the same shape backs merge/upsert sinks: foreachBatch gives
you the batch as a plain DataFrame plus a monotonically increasing
batch_id, and the sink-side write must key on that id (or a
transactional target) to stay exactly-once under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_idempotent_append(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> int:
    """Drain `source` (availableNow) into `out_dir` via foreachBatch,
    one parquet subdir per micro-batch, idempotently. Returns the
    number of batches committed in THIS run (0 on a replay with an
    up-to-date checkpoint — proof the offsets did their job)."""
    seen: list[int] = []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    q = (
        source.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout=300)
    finally:
        q.stop()
    return len(seen)
