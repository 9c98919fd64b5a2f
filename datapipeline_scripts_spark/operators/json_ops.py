"""D21 — JSON extraction on `events.props`.

Reference parity (§2.B B13): JMESPath field extraction over AWS JSON
(`--query 'DBInstances[0].Endpoint.Address'`
/root/reference/backup.sh:284,298).

Two idioms: path-based `get_json_object` (no schema needed) and typed
`from_json` with an explicit schema (preferred at scale — parsed once,
pruned to the referenced field by Catalyst's JSON schema pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction + cast + aggregate per event type."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE event_id % 5 = 0
    """,
)
def json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed parse via from_json with an explicit schema, then struct
    field access — the scale-preferred form (schema pruning applies)."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return (
        e.filter(F.col("event_id") % 5 == 0)
        .withColumn("_p", F.from_json("props", schema))
        .select("event_id", F.col("_p.k").alias("k"))
    )


@query(
    "json_variant",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1, 2
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): `parse_json` once into
    an open-schema VARIANT column, then typed `variant_get` extraction
    — the shredded-JSON idiom for data whose schema drifts too fast for
    `from_json` structs. The parse cost is paid once per row; every
    downstream extraction is a binary-encoded field probe, not a
    re-parse (contrast json_extract's per-path get_json_object).

    At 100 TB: VARIANT is what you store when producers add fields
    weekly; the bucket aggregate shows typed math on extracted values
    stays JVM-side (no Python round trip)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.expr("cast(variant_get(v, '$.k', 'int') as int)")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type", F.expr("k div 10").alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("k").cast("long").alias("sum_k"))
    )
