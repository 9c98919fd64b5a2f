"""D25 — array operations over `embeddings.embedding`
(ArrayType(FloatType), 64-dim).

Higher-order functions (`transform`/`aggregate`/`zip_with`) run inside
codegen; explode is the relational bridge (array → rows). All arithmetic
is cast to DOUBLE on both engines so sequential folds are bit-stable
(functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.functions.vectors import sq_norm
from datapipeline_scripts_spark.registry import query


@query(
    "array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val
    FROM embeddings
    WHERE vec_id % 10 = 0
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element access / fold (squared L2 norm) / array max."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(sq_norm(F.col("embedding")), 4).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_val"),
    )


@query(
    "array_explode",
    oracle="""
    SELECT label,
           count(*) AS n_vals,
           round(sum(v), 4) AS sum_vals
    FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
    GROUP BY label
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode array → rows, aggregate per label (the lateral-view
    pattern; at scale explode multiplies row count ×dim — aggregate
    immediately after, as here, so the shuffle stays small)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.explode("embedding").alias("v"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vals"),
            F.round(F.sum(F.col("v").cast("double")), 4).alias("sum_vals"),
        )
    )


@query(
    "map_ops",
    oracle="""
    WITH counts AS (
      SELECT source, lang, count(*) AS n
      FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS INTEGER) AS n_langs,
           CAST(coalesce(sum(CASE WHEN lang = 'en' THEN n END), 0) AS BIGINT) AS en_docs,
           CAST(count(CASE WHEN n >= 10 THEN 1 END) AS INTEGER) AS n_langs_10plus
    FROM counts
    GROUP BY source
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column operations: build a lang→count map per source
    (map_from_entries over collected structs), then read it back with
    element_at, map_filter, and map size. The oracle expresses the same
    semantics relationally — the map type is Spark-side surface being
    exercised; results must agree with the plain-SQL twin.

    Scale: the map's cardinality is bounded by |langs| (~10²), so the
    per-group state stays small no matter the row count; the heavy
    reduction happens in the relational pre-aggregation."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    mapped = counts.groupBy("source").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("lang", "n")))
        ).alias("lang_counts")
    )
    return mapped.select(
        "source",
        F.size("lang_counts").alias("n_langs"),
        F.coalesce(F.element_at("lang_counts", F.lit("en")), F.lit(0)).cast("long").alias("en_docs"),
        F.size(F.map_filter("lang_counts", lambda k, v: v >= 10)).alias("n_langs_10plus"),
    )


@query(
    "array_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0))
                AS INTEGER) AS n_pos,
           CAST(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 2)) > 0
                AS BOOLEAN) AS any_large,
           CAST(list_sum(list_transform(list_zip(embedding, list_reverse(embedding)),
                p -> CAST(round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
                                * 1000000) AS BIGINT))) AS BIGINT)
             AS selfdot_rev_micro,
           CAST(list_sum(list_reverse_sort(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))[1:3])
                AS BIGINT) AS top3_milli
    FROM embeddings
    WHERE vec_id % 7 = 0
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full higher-order-function surface on one query: lambda
    `filter` (positive-element count), `exists` (any |x|>2),
    `zip_with` (element-wise product with the reversed vector),
    `transform` + `aggregate` (integer fold), and `sort_array`+`slice`
    (top-3 sum). All lambdas run inside whole-stage codegen — zero
    Python, zero serialization boundary.

    Determinism: every float product/element is quantized to integers
    PER-TERM (round(x·10⁶)) before any sum, so fold order — which
    differs between Spark's sequential aggregate and DuckDB's
    list_sum — cannot change the result. The pattern to copy for any
    cross-engine float reduction.

    Scale: per-row array work, embarrassingly parallel, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0)
    d = lambda c: c.cast("double")  # noqa: E731
    prod_rev = F.zip_with("embedding", F.reverse("embedding"), lambda a, b: d(a) * d(b))
    as_micro = F.transform(prod_rev, lambda t: F.round(t * 1000000).cast("long"))
    milli = F.transform("embedding", lambda x: F.round(d(x) * 1000).cast("long"))
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: d(x) > 0)).alias("n_pos"),
        F.exists("embedding", lambda x: F.abs(d(x)) > 2).alias("any_large"),
        F.aggregate(as_micro, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "selfdot_rev_micro"
        ),
        F.aggregate(
            F.slice(F.sort_array(milli, asc=False), 1, 3),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("top3_milli"),
    )
