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
