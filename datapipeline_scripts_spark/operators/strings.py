"""D3/D4 — regex extract/replace and string functions.

Reference parity (§2.B): B3 `grep -o "[0-9]*"` → regexp_extract
(/root/reference/backup.sh:130); B4 `sed` replace/delete
(/root/reference/psql-backups.sh:146-148); B6-B9 split / concat /
substring / length (/root/reference/backup.sh:172-173,
/root/reference/psql-backups.sh:56-62).

All expressions are built-in Catalyst string functions — evaluated inside
whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "string_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '[0-9]+', 0) AS cust_num,
           regexp_replace(lower(c_mktsegment), '[aeiou]', '_', 'g') AS seg_masked
    FROM customer
    WHERE regexp_matches(c_name, '^Customer#[0-9]+$')
    """,
)
def string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract of the numeric id (the reference's
    `grep -o "[0-9]*"` task-id parse) + global regexp_replace."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").rlike(r"^Customer#[0-9]+$"))
        .select(
            "c_custkey",
            F.regexp_extract("c_name", "[0-9]+", 0).alias("cust_num"),
            F.regexp_replace(F.lower("c_mktsegment"), "[aeiou]", "_").alias("seg_masked"),
        )
    )


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(length(c_name) AS INTEGER) AS name_len,
           substring(c_name, 1, 29) AS name_29,
           concat(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           string_split(c_name, '#')[1] AS name_word,
           trim(concat('  ', c_mktsegment, '  ')) AS seg_trim
    FROM customer
    WHERE length(c_name) < 30
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/length/substring(1,29)/concat/split/trim — the reference's
    identifier-building toolkit (id clamp to 29 chars,
    /root/reference/psql-backups.sh:56-62)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.length("c_name") < 30).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 29).alias("name_29"),
        F.concat("c_mktsegment", F.lit("-"), F.col("c_nationkey").cast("string")).alias("seg_nat"),
        F.split("c_name", "#").getItem(0).alias("name_word"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("seg_trim"),
    )


@query(
    "column_masking",
    oracle="""
    WITH masked AS (
      SELECT c_mktsegment,
             regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS masked_name
      FROM customer
    )
    SELECT c_mktsegment,
           count(*) AS n,
           count(DISTINCT masked_name) AS n_patterns,
           min(masked_name) AS sample_pattern
    FROM masked
    GROUP BY c_mktsegment
    """,
)
def column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level PII masking with the built-in `mask()` (upper→X,
    lower→x, digit→n, punctuation preserved) — the display-layer
    counterpart to `text_redact`'s rewrite audit. The per-segment
    pattern census proves the masked column still supports structural
    analytics (format validation, cardinality) while carrying zero
    identifying characters. The DuckDB oracle replays mask() as three
    character-class regex passes — proving the masked VALUES match,
    not just the counts.

    Scale: mask() is a codegen'd JVM expression in the scan projection;
    no UDF, no second pass."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_mktsegment", F.mask("c_name").alias("masked_name"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("masked_name").alias("n_patterns"),
            F.min("masked_name").alias("sample_pattern"),
        )
    )
