"""D5 — date/time functions.

Reference parity (§2.B B14): UTC timestamp formatting
(`date -u +"%Y-%m-%dT%H:%M:%S%Z"` /root/reference/backup.sh:11,
run-scoped naming /root/reference/psql-backups.sh:10-11,64-66).

Parity discipline: the session runs in UTC and temporal *outputs* are
rendered as strings so the DuckDB comparison is representation-exact
(SURVEY §7.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + month truncation, aggregated per month.

    Scale: group keys are low-cardinality ints/strings derived before the
    shuffle — partial aggregation collapses each map partition to ~#months
    rows, so the exchange is tiny regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(datediff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS INTEGER) AS days_to_cut,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS due_ts,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_ts
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff, interval arithmetic, and the reference's ISO-8601 UTC
    log format (/root/reference/backup.sh:11)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_cut"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd HH:mm:ss").alias("due_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
    )
