"""True Structured Streaming jobs over the events table.

`events_stream_tumbling` is registered as a declared query with the
SAME oracle as the batch `events_tumbling` — the stream replays the
parquet fixture with `availableNow` and lands the windowed aggregate in
a parquet sink, which must equal the batch result (streaming/batch
unification is the point of Structured Streaming).

Sink topology (VERDICT r01 item 4): results land in a parquet
directory — executor-side writes, never a driver-bound memory sink or
`collect()` bridge. Append-mode queries use the real file sink;
complete-mode aggregations use `foreachBatch` overwriting the same
directory each micro-batch (the last batch leaves the complete
result). The read-back is `localCheckpoint`ed so the scratch dir can
be removed immediately.

Scale notes: in production the source is kafka/files with
`withWatermark` bounding state; `availableNow` here keeps the fixture
replay deterministic. State-store sizing = #open windows × #event
types — both tiny.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table, table_path
from datapipeline_scripts_spark.registry import query


def _stamp_slice_order(slice_dirs: list[str]) -> None:
    """Give every file under each slice directory a strictly-increasing
    mtime (1 s apart, oldest first, anchored 1 h in the past so files
    the query itself writes later can never sort earlier than the
    input). The file-stream source orders files by modification time;
    a write-then-sleep dance is nondeterministic on filesystems with
    coarse (1 s) mtime granularity (ADVICE r03), so the timestamps are
    set explicitly after the writes instead."""
    import os
    import time

    base = time.time() - 3600.0
    for i, d in enumerate(slice_dirs):
        ts = base + i
        for dirpath, _dirs, files in os.walk(d):
            for name in files:
                os.utime(os.path.join(dirpath, name), (ts, ts))


def _replay_to_parquet(spark: SparkSession, sdf: DataFrame, mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    scratch parquet sink and return the materialized result.

    `mode="append"` uses Spark's transactional file sink directly;
    `mode="complete"` (aggregations) uses foreachBatch with
    mode-overwrite so the final micro-batch leaves the complete result.
    Both paths write from executors; the only driver involvement is the
    read-back plan. The result is localCheckpoint-ed (cluster-side
    materialization) so the scratch directory is deletable on return."""
    base = tempfile.mkdtemp(prefix="spark_stream_sink_")
    data, ckpt = f"{base}/data", f"{base}/ckpt"
    # Stateful streaming pays a fixed per-micro-batch cost per state
    # partition (store open/commit/snapshot), and the partition count is
    # frozen into the checkpoint at first start — it must be sized to the
    # STATE (|open windows| × |keys|), not inherited from the batch
    # shuffle default. 8 here cuts the fixture replay ~40% (measured
    # 2.97→1.65 s events_stream_session at sf0.1); a production job sets
    # SPARK_GRAFT_STREAM_SHUFFLE to its cluster-appropriate width. The
    # conf is restored after the (synchronous) replay finishes. NOTE:
    # spark.conf is session-global, so a batch query running CONCURRENTLY
    # on this SparkSession during the replay would inherit the narrow
    # setting — the harness is single-threaded per session, which is the
    # assumption this override relies on (ADVICE r03); a server-style
    # deployment must give replays their own spark.newSession() whose
    # conf overlay is isolated from sibling sessions.
    import os as _os

    sess = sdf.sparkSession
    prev_parts = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set(
        "spark.sql.shuffle.partitions",
        _os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"),
    )
    try:
        if mode == "append":
            writer = sdf.writeStream.format("parquet").option("path", data)
        else:

            def _overwrite(batch_df: DataFrame, _batch_id: int) -> None:
                batch_df.write.mode("overwrite").parquet(data)

            writer = sdf.writeStream.foreachBatch(_overwrite).outputMode("complete")
        q = writer.option("checkpointLocation", ckpt).trigger(availableNow=True).start()
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        try:
            return spark.read.parquet(data).localCheckpoint(eager=True)
        except Exception:
            # zero-row stream → file sink wrote no data files
            return spark.createDataFrame([], sdf.schema)
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(base, ignore_errors=True)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (schema from the batch read;
    the ns→µs conversion is applied identically)."""
    import os

    batch = load_table(spark, sf_dir, "events")
    path = table_path(sf_dir, "events")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # Spark-written table (e.g. the scale proxies): the table IS a
        # directory of part files — stream it directly
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        # driver fixture layout: single file inside the scale-factor dir;
        # the file-stream source needs a directory, so glob-filter to it
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream.select(*batch.columns)


def tumbling_agg(df: DataFrame) -> DataFrame:
    """The shared (batch ≡ streaming) tumbling aggregation plan."""
    return (
        df.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "events_stream_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the tumbling window as a real stream (availableNow replay →
    foreachBatch parquet sink, complete mode), return the materialized
    result. Must hash-match the batch oracle exactly."""
    return _replay_to_parquet(spark, tumbling_agg(_events_stream(spark, sf_dir)), "complete")


@query(
    "events_stream_enriched",
    oracle="""
    SELECT CAST(user_id % 3 AS BIGINT) AS segment,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension (user → segment) before aggregating per segment.

    The static side is a plain batch DataFrame — Spark re-plans it per
    micro-batch and broadcasts it under the join (the standard
    enrichment topology: stream facts, broadcast dims). State is only
    the aggregation's; the join itself is stateless. Must hash-match
    the batch oracle."""
    segments = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select("user_id", (F.col("user_id") % 3).alias("segment"))
    )
    enriched = (
        _events_stream(spark, sf_dir)
        .join(segments, "user_id")
        .groupBy("segment", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select("segment", "event_type", "n", "sum_value")
    )
    return _replay_to_parquet(spark, enriched, "complete")

@query(
    "events_stream_join",
    oracle="""
    SELECT a.user_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS buy_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
)
def events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: views joined to same-user purchases
    within the following hour, run as a REAL streaming join (two
    readStream sources, watermarks on both sides, event-time range
    condition, append mode) and replayed to completion with
    availableNow. Must hash-match the batch self-join oracle.

    Scale/state notes: the watermark + time-range pair is what bounds
    the join state — each side buffers only rows younger than
    (watermark - range), so state is O(rate × 3 h) per side here, not
    O(stream). Without the time condition Spark rejects the plan
    (unbounded state) — the engine enforces the 100 TB discipline."""
    s1 = _events_stream(spark, sf_dir)
    s2 = _events_stream(spark, sf_dir)
    views = (
        s1.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "2 hours")
    )
    buys = (
        s2.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b_user"), F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", "2 hours")
    )
    joined = views.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "user_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("buy_ts", "yyyy-MM-dd HH:mm:ss").alias("buy_ts"),
    )
    return _replay_to_parquet(spark, joined, "append")

@query(
    "events_stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the event stream unioned with a
    second replay of itself (every event delivered twice — the
    at-least-once failure mode), then dropDuplicatesWithinWatermark on
    event_id. Per-type counts of the deduped sink must equal the
    batch counts of the ORIGINAL table — i.e., the dedup removed
    exactly the redelivered copies.

    Scale/state notes: dropDuplicatesWithinWatermark keeps one state
    row per key only until the watermark passes its event time, so
    state is O(rate × watermark), not O(stream) — the unbounded-state
    plain dropDuplicates is the thing you must NOT deploy on an
    infinite stream. The final count runs batch-side on the sink."""
    doubled = _events_stream(spark, sf_dir).unionAll(_events_stream(spark, sf_dir))
    deduped = doubled.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(["event_id"])
    landed = _replay_to_parquet(spark, deduped.select("event_id", "event_type"), "append")
    return landed.groupBy("event_type").agg(F.count("*").alias("n"))


@query(
    "events_stream_outer_join",
    oracle="""
    WITH v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
    b AS (SELECT user_id AS b_user, ts AS buy_ts FROM events WHERE event_type = 'purchase'),
    wm AS (
      SELECT least((SELECT max(ts) FROM events WHERE event_type = 'view'),
                   (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
             - INTERVAL 2 HOUR AS w
    ),
    matched AS (
      SELECT v.user_id,
             strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
             strftime(b.buy_ts, '%Y-%m-%d %H:%M:%S') AS buy_ts
      FROM v JOIN b ON v.user_id = b.b_user
       AND b.buy_ts >= v.view_ts AND b.buy_ts <= v.view_ts + INTERVAL 1 HOUR
    ),
    unmatched AS (
      SELECT v.user_id,
             strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
             'NO_MATCH' AS buy_ts
      FROM v
      WHERE NOT EXISTS (
              SELECT 1 FROM b WHERE v.user_id = b.b_user
               AND b.buy_ts >= v.view_ts AND b.buy_ts <= v.view_ts + INTERVAL 1 HOUR)
        AND v.view_ts + INTERVAL 1 HOUR < (SELECT w FROM wm)
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
    tier="ext",
)
def events_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: like `events_stream_join` but
    views with no purchase inside their hour emit a null-padded row —
    only once the global watermark proves no future match can arrive.

    The oracle encodes the exact emission rule: matches emit
    unconditionally; a null-padded row emits iff the view's join
    window closed below the terminal watermark (min of both sides'
    max event time, minus the 2 h delay). Views whose window was
    still open when the replay ended are withheld — deterministic
    for a static input, and precisely the at-most-once-then-timeout
    semantics an outer stream join contracts to provide.

    Scale/state notes: same bounded state as the inner form (each side
    buffers ~3 h of rows); the extra cost of OUTER is keeping the
    unmatched left rows until eviction — still O(rate × window)."""
    s1 = _events_stream(spark, sf_dir)
    s2 = _events_stream(spark, sf_dir)
    views = (
        s1.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "2 hours")
    )
    buys = (
        s2.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b_user"), F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", "2 hours")
    )
    joined = views.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "user_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        # NULL-safe marker: string NULLs break tuple-sorting
        # canonicalizers (driver and local), so the no-match case is an
        # explicit value on both sides
        F.coalesce(F.date_format("buy_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("NO_MATCH")).alias("buy_ts"),
    )
    return _replay_to_parquet(spark, joined, "append")


@query(
    "events_stream_session",
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
    ),
    agg AS (
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events,
             round(sum(value), 2) AS session_value
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start, n_events, session_value
    FROM agg
    WHERE session_end <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
    """,
    tier="ext",
)
def events_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True-streaming sessionization with `F.session_window` (30-min
    gap), append mode: a session row is emitted exactly once, when the
    watermark passes its end (last event + gap) — before that the
    session could still be extended by a late event. The batch oracle
    computes ALL sessions (the same gaps-and-islands SQL as
    `events_session`) and keeps those whose end cleared the terminal
    watermark — so the emission contract itself is hash-proven, the
    same technique as `events_stream_outer_join`.

    Scale/state notes: session state is one open window per active
    user, merged on arrival and evicted at watermark — O(active
    users), the engine-managed version of stateful.py's hand-rolled
    sessionizer."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
    return _replay_to_parquet(spark, sess, "append")


@query(
    "events_stream_sliding",
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
    tier="ext",
)
def events_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True-streaming sliding window (2 h length, 1 h slide): each
    event feeds two window states; the replay's complete-mode sink must
    hash-match the SAME oracle as the batch `events_sliding` — batch ≡
    streaming equivalence for overlapping windows, completing the
    stream family (tumbling / sliding / session / joins / dedup / CDC).

    Scale/state notes: state is one row per open window (2 per slide
    interval here), evicted at watermark; the overlap multiplies state
    by length/slide, not by the event rate."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    slid = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n", "sum_value")
    )
    return _replay_to_parquet(spark, slid, "complete")


@query(
    "events_stream_topk",
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
    tier="ext",
)
def events_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending item over a live stream: the windowed aggregation runs
    IN the stream (complete mode — ranking is not stream-expressible
    in append mode because a late row can demote the current leader),
    then the per-window row_number ranks the LANDED aggregate
    batch-side. This split — streaming holds the mergeable aggregate,
    batch post-processing does the non-incremental ranking on the
    thousand-row result — is the standard production topology for
    top-k dashboards; same oracle as the batch `events_topk_per_window`.

    State: one row per (window, type); the post-rank touches window
    counts, never raw events."""
    landed = _replay_to_parquet(spark, tumbling_agg(_events_stream(spark, sf_dir)), "complete")
    agg = landed.groupBy("win_start", "event_type").agg(
        F.sum("n").alias("n"), F.round(F.sum("sum_value"), 2).alias("sum_value")
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("win_start").orderBy(F.col("n").desc(), F.col("event_type"))
    return agg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def _ohlc_oracle() -> str:
    from datapipeline_scripts_spark.operators.history import _OHLC_ORACLE

    return _OHLC_ORACLE


@query("events_stream_ohlc", oracle=_ohlc_oracle(), tier="ext")
def events_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars computed BY THE STREAMING ENGINE: the same
    min_by/max_by aggregation as the batch `time_ohlc_bars`, run as a
    structured stream (availableNow replay → foreachBatch parquet
    sink, complete mode) — and it must hash-match the identical batch
    oracle, proving min_by/max_by state merges correctly under
    micro-batch execution (the candlestick dashboard topology: ticks
    in, bars out, continuously updated).

    Scale: state per (type, day) is one candidate row per extreme —
    constant-size entries like any streaming min/max; at production a
    watermark on day bounds the state to open bars only."""
    from datapipeline_scripts_spark.operators.history import _OHLC_KEY_SPARK

    sdf = _events_stream(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    bars = (
        sdf.select(
            "event_type",
            F.to_date("ts").alias("d"),
            cents.alias("cents"),
            F.expr(_OHLC_KEY_SPARK).alias("k"),
        )
        .groupBy("event_type", "d")
        .agg(
            F.expr("min_by(cents, k)").cast("long").alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.expr("max_by(cents, k)").cast("long").alias("close_cents"),
            F.count("*").alias("n_events"),
            F.sum("cents").alias("volume_cents"),
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n_events",
            "volume_cents",
        )
    )
    return _replay_to_parquet(spark, bars, "complete")


@query(
    "events_stream_late_drop",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn,
             count(*) OVER () AS n
      FROM events
    ),
    kept AS (SELECT * FROM ranked WHERE rn > n // 4),
    wm AS (
      SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events
    )
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM kept CROSS JOIN wm
    GROUP BY 1
    HAVING max(time_bucket(INTERVAL 1 HOUR, ts)) + INTERVAL 1 HOUR
           <= any_value(w)
    ORDER BY 1
    """,
)
def events_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics proven END TO END: the event
    table replays as FOUR ordered micro-batches (maxFilesPerTrigger=1
    over sequentially-written slice files) with the OLDEST quartile
    delivered third — by then the 10-minute watermark has advanced
    past its windows, so the engine drops every one of those rows
    from the tumbling aggregation, exactly as a production stream
    drops a stalled upstream partition's backlog. The oracle encodes
    the full contract: counts exclude the late quartile AND windows
    not yet finalized at the final watermark (append mode withholds
    open windows). Everything is deterministic because batch order is
    file order and the watermark path depends only on event times —
    the one semantics in the streaming family that cannot be shown
    with a single-batch replay."""
    import os
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "events")
    # stream construction: quartile slices by exact (ts, event_id) rank.
    # The global rank window is part of building the test harness's
    # input files, not the streaming plan under test (a production
    # source is already multi-batch).
    w = Window.orderBy("ts", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    )
    q = F.expr("n div 4")
    slices = [
        ranked.filter((F.col("rn") > q) & (F.col("rn") <= 2 * q)),       # Q2
        ranked.filter((F.col("rn") > 2 * q) & (F.col("rn") <= 3 * q)),   # Q3
        ranked.filter(F.col("rn") <= q),                                 # Q1 — LATE
        ranked.filter(F.col("rn") > 3 * q),                              # Q4
    ]
    root = tempfile.mkdtemp(prefix="spark_stream_late_")
    try:
        cols = e.columns
        slice_dirs = [os.path.join(root, "slices", f"s{i}") for i in range(len(slices))]
        for sl, d in zip(slices, slice_dirs):
            sl.select(*cols).coalesce(1).write.parquet(d)
        _stamp_slice_order(slice_dirs)
        stream = (
            spark.readStream.schema(spark.read.parquet(slice_dirs[0]).schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "part-*")
            .parquet(os.path.join(root, "slices"))
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count("*").cast("long").alias("n_events"))
            .select(
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "n_events",
            )
        )
        out = _replay_to_parquet(spark, agg, "append")
        return out.orderBy("window_start")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "events_stream_update_mode",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn,
             count(*) OVER () AS n
      FROM events
    ),
    labeled AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win,
             CASE WHEN rn <= n // 4 THEN 'late'
                  WHEN rn <= 2 * (n // 4) THEN 'b0'
                  WHEN rn <= 3 * (n // 4) THEN 'b1'
                  ELSE 'b3' END AS slice
      FROM ranked
    )
    SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(DISTINCT slice) AS BIGINT) AS n_updates,
           CAST(count(*) AS BIGINT) AS final_count
    FROM labeled WHERE slice <> 'late'
    GROUP BY win ORDER BY 1
    """,
)
def events_stream_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode proven end-to-end — the third output-mode
    semantic (append: events_stream_late_drop; complete:
    events_stream_tumbling): each micro-batch re-emits only the
    windows it CHANGED, so a window straddling two delivered slices
    shows two update emissions, the late quartile produces none (its
    rows die at the watermark), and open windows emit without waiting
    for finalization. The foreachBatch sink appends each batch's
    emissions to a log; the declared result is per-window
    (n_updates, final_count), which the oracle derives purely from
    the slice construction — update-mode re-emission is exactly
    'count of delivered slices containing surviving rows of the
    window'. A 1-hour window can never span the weeks-long middle
    quartiles, so eviction cannot suppress a legitimate update in
    this construction."""
    import os
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "events")
    # global rank window builds the TEST HARNESS's slice files only —
    # not part of the streaming plan under test (a production source
    # is already multi-batch)
    w = Window.orderBy("ts", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n",
        F.count("*").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    q = F.expr("n div 4")
    slices = [
        ranked.filter((F.col("rn") > q) & (F.col("rn") <= 2 * q)),       # Q2
        ranked.filter((F.col("rn") > 2 * q) & (F.col("rn") <= 3 * q)),   # Q3
        ranked.filter(F.col("rn") <= q),                                 # Q1 — LATE
        ranked.filter(F.col("rn") > 3 * q),                              # Q4
    ]
    root = tempfile.mkdtemp(prefix="spark_stream_upd_")
    try:
        cols = e.columns
        # slices live under their own subdirectory so the source can
        # never see the foreachBatch sink's part-* output below `log`
        # (ADVICE r03: safe today only because availableNow snapshots
        # the file list at start; a checkpoint restart would self-ingest)
        slice_dirs = [os.path.join(root, "slices", f"s{i}") for i in range(len(slices))]
        for sl, d in zip(slices, slice_dirs):
            sl.select(*cols).coalesce(1).write.parquet(d)
        _stamp_slice_order(slice_dirs)
        stream = (
            spark.readStream.schema(spark.read.parquet(slice_dirs[0]).schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "part-*")
            .parquet(os.path.join(root, "slices"))
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count("*").cast("long").alias("cnt"))
            .select(
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "cnt",
            )
        )
        log = os.path.join(root, "log")

        def _append(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(log)

        qh = (
            agg.writeStream.foreachBatch(_append)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            qh.awaitTermination(timeout=300)
        finally:
            qh.stop()
        emitted = spark.read.parquet(log)
        out = (
            emitted.groupBy("window_start")
            .agg(
                F.count("*").cast("long").alias("n_updates"),
                F.max_by("cnt", "batch_id").cast("long").alias("final_count"),
            )
            .orderBy("window_start")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "events_stream_join_expiry",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn,
             count(*) OVER () AS n
      FROM events
    ),
    kept AS (SELECT * FROM ranked WHERE rn > n // 4),
    purchases AS (
      SELECT user_id, ts AS p_ts FROM kept WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts AS c_ts FROM kept WHERE event_type = 'click'
    )
    SELECT strftime(CAST(p.p_ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM purchases p JOIN clicks c
      ON p.user_id = c.user_id
     AND c.c_ts BETWEEN p.p_ts - INTERVAL 1 HOUR AND p.p_ts + INTERVAL 1 HOUR
    GROUP BY 1 ORDER BY 1
    """,
)
def events_stream_join_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join STATE EXPIRY proven end-to-end — the third
    leg of the streaming-semantics trilogy (late-drop: input
    eviction; update-mode: re-emission; here: join state lifetime).
    Purchases and clicks replay as two coordinated 4-batch file
    streams (one slice file per source per trigger, written in
    lockstep) with the oldest quartile delivered third on BOTH
    sides: by then the watermark has advanced weeks past the
    quartile, so its rows are dropped at input and every join-state
    entry that could have matched them is long evicted — the engine
    keeps ±1h of state per side, not the stream's history. The
    construction leaves a >1h margin at every slice boundary, so the
    oracle is exactly 'all same-user purchase-click pairs within ±1h
    among the on-time quartiles' — no boundary case depends on
    eviction tie-breaking."""
    import os
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "events")
    # global rank window builds the TEST HARNESS's slice files only —
    # not part of the streaming plan under test (a production source
    # is already multi-batch)
    w = Window.orderBy("ts", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n",
        F.count("*").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    q = F.expr("n div 4")
    slice_preds = [
        (F.col("rn") > q) & (F.col("rn") <= 2 * q),
        (F.col("rn") > 2 * q) & (F.col("rn") <= 3 * q),
        F.col("rn") <= q,  # LATE
        F.col("rn") > 3 * q,
    ]
    root = tempfile.mkdtemp(prefix="spark_stream_ssj_")
    try:
        cols = e.columns
        for i, pred in enumerate(slice_preds):
            sl = ranked.filter(pred).select(*cols)
            sl.filter(F.col("event_type") == "purchase").coalesce(1).write.parquet(
                os.path.join(root, "left", f"s{i}")
            )
            sl.filter(F.col("event_type") == "click").coalesce(1).write.parquet(
                os.path.join(root, "right", f"s{i}")
            )
        # lockstep delivery: slice i gets the same explicit mtime rank on
        # both sides, so each source's mtime-ordered 4-trigger replay
        # stays coordinated
        _stamp_slice_order([os.path.join(root, "left", f"s{i}") for i in range(len(slice_preds))])
        _stamp_slice_order([os.path.join(root, "right", f"s{i}") for i in range(len(slice_preds))])

        def _src(side: str) -> DataFrame:
            return (
                spark.readStream.schema(
                    spark.read.parquet(os.path.join(root, side, "s0")).schema
                )
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .option("pathGlobFilter", "part-*")
                .parquet(os.path.join(root, side))
            )

        purchases = (
            _src("left")
            .withWatermark("ts", "10 minutes")
            .select("user_id", F.col("ts").alias("p_ts"))
        )
        clicks = (
            _src("right")
            .withWatermark("ts", "10 minutes")
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        )
        joined = purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        landed = _replay_to_parquet(
            spark, joined.select("user_id", "p_ts", "c_ts"), "append"
        )
        return (
            landed.groupBy(F.date_format(F.col("p_ts").cast("date"), "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").cast("long").alias("n_pairs"))
            .orderBy("day")
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
