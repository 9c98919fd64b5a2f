"""E5 — event-time window aggregation over `events` (batch forms).

The reference has no data-plane streams (SURVEY §1.1) — its polling
loops are control-plane — but the engine layer declares the standard
event-time surface: tumbling, sliding, and session windows. Batch and
Structured Streaming share these semantics (`F.window` /
`F.session_window` are identical in both); the true streaming runner
lives in `stream_jobs.py`.

Parity notes: `events.ts` is ns-precision parquet truncated to µs by
Spark; every oracle groups at ≥1-hour granularity or compares gaps of
30 min, so the ≤1 µs truncation can't flip a bucket (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "events_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event type (epoch-aligned, so the
    window start equals date_trunc('hour')). Group keys are derived
    pre-shuffle; partial aggregation keeps the exchange tiny."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "events_sliding",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS ws,
             value
      FROM events
    )
    GROUP BY 1
    """,
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 2-hour length, 1-hour slide — each event lands in
    exactly two windows (Spark expands this internally; the oracle
    expands it explicitly with unnest)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n", "sum_value")
    )


@query(
    "events_topk_per_window",
    oracle="""
    WITH agg AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT win_start, event_type, n, sum_value
    FROM (SELECT *, row_number() OVER (PARTITION BY win_start
                                       ORDER BY n DESC, event_type) AS rn
          FROM agg)
    WHERE rn = 1
    """,
)
def events_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant event type per hour: windowed aggregation composed with
    a per-window ranking — the standard 'trending item' analytics shape.
    Two shuffles total (agg on (window,type), rank on window); both keys
    derive pre-shuffle."""
    e = load_table(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    w = W.partitionBy("win_start").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        agg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


@query(
    "events_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           CAST(sid AS BIGINT) AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           round(sum(value), 2) AS session_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (gaps-and-islands:
    lag → new-session marker → running sum → group).

    Scale: one shuffle on user_id + per-user sort; identical shape to
    what `session_window` does in Structured Streaming. Skewed users
    would need salting the window partition key."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # µs arithmetic on both engines: a seconds-truncated diff could flip
    # a bucket for gaps in [30min, 30min+1s) — µs keeps them identical.
    gap_over = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    marked = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(gap_over.isNull() | (gap_over > 30 * 60 * 1_000_000), 1).otherwise(0).alias("new_s"),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.round(F.sum("value"), 2).alias("session_value"),
    ).select(
        "user_id",
        F.col("sid").cast("long").alias("session_id"),
        "n_events",
        "session_start",
        "session_value",
    )
