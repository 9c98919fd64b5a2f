"""Classic TPC-H query shapes (Q3/Q19 analogues on the fixture star
schema) — composite workloads exercising multi-join + selective filter
+ aggregate + top-k in the combinations the benchmark made canonical.

These complement the per-operator catalog: a user of the reference's
delegated SQL engines runs queries shaped like these, not isolated
operators (SURVEY §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "tpch_q3_shape",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1999-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 'shipping priority': top-10 open-revenue orders for one
    segment. Plan: broadcast filtered customer, shuffle join
    orders⋈lineitem, partial-agg before the exchange, TakeOrdered for
    the top-k. Filters on both fact scans push to parquet."""
    cutoff = F.lit("1999-03-15 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q19_shape",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 25)
       OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 30)
    """,
)
def tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 'discounted revenue': disjunction of conjunctive predicates
    across both join sides. The per-side conjuncts can't be pushed
    below the join (they reference both tables), but the broadcast of
    part keeps lineitem unshuffled; Catalyst extracts the common
    p_partkey join key from the OR."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pred = (
        (F.col("p_brand") == "Brand#13")
        & F.col("l_quantity").between(1, 11)
        & F.col("p_size").between(1, 25)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("l_quantity").between(10, 20)
        & F.col("p_size").between(1, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(pred)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
