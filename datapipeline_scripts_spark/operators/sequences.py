"""Event-sequence analytics over `events` — funnel conversion, the
ordered-steps query family (first step A, then step B strictly after
it), reported per entry-hour cohort.

This is the classic product/behavior-analytics workload on an event
log, and at training-data scale the same shape drives interaction-log
curation (e.g. "prompt followed by accepted completion within T").

Scale shape: both steps reduce to per-user MIN aggregates — partial
aggregation collapses each map partition to |users| rows before the
exchange, and the step-2 join is an equi-join on user_id against the
already-reduced step-1 table. Nothing touches the raw event log twice
at full width, and no window function materializes per-user event
arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query

_CONVERT_S = 3600  # "fast conversion" threshold


@query(
    "events_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      SELECT v.user_id, v.t_view, min(e.ts) AS t_purchase
      FROM v JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'purchase' AND e.ts > v.t_view
      GROUP BY 1, 2
    ),
    f AS (
      SELECT v.user_id, v.t_view, p.t_purchase,
             (epoch_us(p.t_purchase) - epoch_us(v.t_view)) / 1000000.0 AS lat_s
      FROM v LEFT JOIN p ON v.user_id = p.user_id
    )
    SELECT strftime(date_trunc('hour', t_view), '%Y-%m-%d %H:00') AS cohort_hour,
           count(*) AS n_viewers,
           count(t_purchase) AS n_converted,
           CAST(count(CASE WHEN lat_s <= {_CONVERT_S} THEN 1 END) AS BIGINT)
             AS n_converted_1h,
           round(avg(lat_s), 2) AS avg_latency_s
    FROM f
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → purchase funnel per entry-hour cohort: viewers, converts
    (any purchase strictly after the first view), fast converts
    (≤ 1 h), and mean conversion latency.

    Latency compares unix_micros — never seconds-truncated casts, which
    flip results for sub-second margins (same pitfall as session
    gaps)."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat = (F.unix_micros("t_purchase") - F.unix_micros("t_view")) / F.lit(1_000_000.0)
    f = v.join(p, ["user_id", "t_view"], "left").withColumn("lat_s", lat)
    return (
        f.groupBy(F.date_format(F.date_trunc("hour", "t_view"), "yyyy-MM-dd HH:00").alias("cohort_hour"))
        .agg(
            F.count("*").alias("n_viewers"),
            F.count("t_purchase").alias("n_converted"),
            F.count(F.when(F.col("lat_s") <= _CONVERT_S, 1)).cast("long").alias("n_converted_1h"),
            F.round(F.avg("lat_s"), 2).alias("avg_latency_s"),
        )
        .orderBy("cohort_hour")
    )


@query(
    "events_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS island
      FROM events
    )
    SELECT user_id, event_type,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS run_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS run_end,
           count(*) AS n_events
    FROM seq
    GROUP BY user_id, event_type, island
    """,
)
def events_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's consecutive same-type
    event runs into validity intervals (run_start, run_end, n) — the
    row-number-difference trick that also builds SCD2 history tables
    from ordered change logs.

    Both row_numbers sort within the same user_id partition, so
    Catalyst plans ONE exchange on user_id and evaluates the second
    window on the already-sorted partition; (ts, event_id) tie-break
    makes run boundaries engine-independent. The grouped interval
    aggregation reuses the same partitioning — no second data-sized
    shuffle."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    return (
        seq.groupBy("user_id", "event_type", "island")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("run_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("run_end"),
            F.count("*").alias("n_events"),
        )
        .drop("island")
    )


@query(
    "events_ewma",
    oracle="""
    SELECT user_id,
           round(list_reduce(
             list_prepend(0.0, list(value ORDER BY ts, event_id)),
             (acc, x) -> 0.9 * acc + 0.1 * x
           ), 4) AS ewma
    FROM events
    WHERE user_id % 5 = 0
    GROUP BY user_id
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    (α = 0.1) — the sequential-fold operator class (EWMA, compound
    interest, stateful scores) that has no order-independent
    aggregate form.

    Determinism: both engines fold the SAME (ts, event_id)-sorted
    sequence with the SAME IEEE ops, so results are bit-identical —
    no rounding tricks needed beyond the final display round. Scale:
    collect_list state is bounded by events-per-user (the same bound
    the stateful sessionizer carries); the fold itself is per-group,
    embarrassingly parallel. The HOF lambda evaluates interpreted,
    which is acceptable off the hot path — a codegen'd running
    product over a window is the alternative for very long series."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(
        ordered.getField("value"),
        F.lit(0.0),
        lambda acc, x: 0.9 * acc + 0.1 * x,
    )
    return ev.groupBy("user_id").agg(F.round(fold, 4).alias("ewma"))


@query(
    "events_new_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('hour', ts)) AS first_day
      FROM events
      GROUP BY user_id
    ),
    daily AS (
      SELECT first_day, count(*) AS new_users
      FROM first_seen
      GROUP BY first_day
    )
    SELECT strftime(first_day, '%Y-%m-%d %H:%M:%S') AS hour,
           new_users,
           CAST(sum(new_users) OVER (ORDER BY first_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
)
def events_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-user and cumulative-user growth per first-seen hour: one
    partial-aggregated reduction per user, hourly counts, then a
    running sum over the tiny per-hour frame — the standard growth
    curve, with the window sorting #days rows, never the event log."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.date_trunc("hour", "ts")).alias("first_day"))
    daily = first_seen.groupBy("first_day").agg(F.count("*").alias("new_users"))
    w = W.orderBy("first_day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        F.date_format("first_day", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )
