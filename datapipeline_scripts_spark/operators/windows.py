"""D17/D18 — window functions: ranking, running aggregates, lag/lead.

Scale notes: a window is one shuffle on its partition key + a per-key
sort. Both queries partition by o_custkey (high cardinality, uniform) —
no skew. Window ORDER BY always includes the unique o_orderkey so frame
order (and therefore lag/running values) is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned top-N: each customer's 3 most expensive orders."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


@query(
    "window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend,
           round(coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
                                                  ORDER BY o_orderdate, o_orderkey), 0), 2)
             AS prev_price,
           CAST(rank() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running spend per customer + previous order price (lag) + rank."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
            "running_spend"
        ),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
        F.rank().over(w).alias("order_seq"),
    )


@query(
    "window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS last_price,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation functions per customer order history: lead,
    first/last value, ntile quartile. last_value needs the explicit
    unbounded-following frame in BOTH engines (the default frame stops
    at CURRENT ROW — the classic silent-wrong-answer); order includes
    the unique o_orderkey so every value is engine-independent."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_time_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(value) OVER w, 2) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour per-user aggregate with a time-RANGE frame (not
    ROWS): the frame is defined by event-time distance, so ts ties all
    enter the frame together in both engines — no tie-break needed.
    Spark has no interval RANGE frame; the equivalence is a
    rangeBetween on unix_micros (inclusive bounds both engines)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume,
           CAST(ntile(10) OVER w AS INTEGER) AS decile
    FROM orders
    WHERE o_orderkey % 11 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank / cume_dist /
    ntile deciles of order value within each priority class (the
    quality-score percentile cut a curation pipeline uses to keep the
    top X% of documents).

    The ORDER BY carries o_orderkey as tie-break so rank positions are
    engine-independent; one shuffle on the partition key."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "window_moving_median",
    oracle="""
    WITH fr AS (
      SELECT event_id, user_id,
             round(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS med5,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
      WHERE user_id % 10 = 0
    )
    SELECT event_id, user_id, med5 FROM fr WHERE rn >= 5
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a trailing 5-event frame per user — the
    robust rolling statistic (`events_anomaly`'s mean/stddev version
    breaks on one fat-tailed spike; the median doesn't). Spark's exact
    `percentile` runs as a window aggregate directly; the frame holds
    ≤5 values so the per-row sort is O(1) — at 100× the frame size,
    not the partition size, is the cost knob.

    Cross-engine exactness: output restricted to FULL 5-row frames
    (row_number ≥ 5), where the median is the exact middle ELEMENT —
    engines interpolate even-sized frames differently in the last ulp
    (caught at sf0.01: Spark a+(b−a)·φ vs DuckDB's variant landing on
    opposite sides of a round-half-cent), but an odd full frame never
    interpolates."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    w = wo.rowsBetween(-4, W.currentRow)
    med = F.round(F.expr("percentile(value, 0.5)").over(w), 2)
    return (
        e.select(
            "event_id",
            "user_id",
            med.alias("med5"),
            F.row_number().over(wo).alias("rn"),
        )
        .filter(F.col("rn") >= 5)
        .drop("rn")
    )
