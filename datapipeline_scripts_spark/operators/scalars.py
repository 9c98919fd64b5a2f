"""D6 — math / conditional scalar expressions.

Reference parity (§2.B): B11 numeric compare on parsed strings
(`[[ $majorVersion -ge 10 ]]` /root/reference/backup.sh:176), B12
default-value coalesce (`${ATTEMPTS-9}` /root/reference/backup.sh:40),
B15 arithmetic (`timeout * 2` /root/reference/backup.sh:62-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "math_case",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           round(abs(c_acctbal), 1) AS abs_bal,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CAST(c_custkey % 10 AS BIGINT) AS bucket,
           round(c_acctbal * 1.07 + 100.0, 2) AS adj_bal,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS k_bal
    FROM customer
    """,
)
def math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding, abs/round, coalesce/nullif defaulting
    (the reference's `${VAR:-default}` idiom), modulo bucketing,
    floor division."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.round(F.abs("c_acctbal"), 1).alias("abs_bal"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg_or_other"),
        (F.col("c_custkey") % 10).alias("bucket"),
        F.round(F.col("c_acctbal") * 1.07 + 100.0, 2).alias("adj_bal"),
        F.floor(F.col("c_acctbal") / 1000.0).alias("k_bal"),
    )


@query(
    "try_functions",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CASE WHEN TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_prio,
           CAST(sum(CASE WHEN TRY_CAST(o_orderstatus AS INTEGER) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
           CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS div_by_zero,
           CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 0
                         ELSE CAST(floor(o_totalprice / (o_orderkey % 5) * 100)
                                   AS BIGINT) END) AS BIGINT)
             AS sum_safe_div_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe ingest scalars: `try_cast` (NULL on unparseable
    instead of job abort) and `try_divide` (NULL on ÷0) — the ANSI-mode
    escape hatches a production loader uses so one malformed record
    quarantines itself instead of killing a 100 TB job. The audit
    counts each failure class and aggregates the safely-computed
    values; the oracle mirrors with TRY_CAST and guarded division.

    Contrast: A2's fail-fast abort is the CONTROL-plane posture; try_*
    is the DATA-plane posture (row-level quarantine, job survives)."""
    o = load_table(spark, sf_dir, "orders")
    prio_num = F.try_to_number(F.substring("o_orderpriority", 1, 1), F.lit("9"))
    status_num = F.expr("try_cast(o_orderstatus AS int)")
    safe_div = F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5)
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.when(prio_num.isNull(), 1).otherwise(0)).alias("bad_prio"),
        F.sum(F.when(status_num.isNull(), 1).otherwise(0)).alias("bad_status"),
        F.sum(F.when(safe_div.isNull(), 1).otherwise(0)).alias("div_by_zero"),
        # per-row floor-to-cents BEFORE summing: bigint summation is
        # order-independent, unlike round(sum(double)) whose shuffle-merge
        # order could flip a half-cent boundary (ADVICE r02); floor (not
        # cast) because DuckDB double→bigint rounds while Spark truncates
        F.sum(F.when(safe_div.isNull(), F.lit(0)).otherwise(F.floor(safe_div * 100))).alias(
            "sum_safe_div_cents"
        ),
    )
