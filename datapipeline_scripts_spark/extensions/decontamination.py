"""Benchmark decontamination — the training-pipeline op that flags
documents sharing any word 8-gram with a held-out benchmark set, so
eval data never leaks into training corpora.

Here the 'benchmark' is a deterministic ~1% slice of the corpus
(doc_id % 97 == 0); in production it is the eval suites. The check is
the standard n-gram-overlap decontamination used by large-corpus
pipelines (exact 8-gram collision, not fuzzy match).

Scale shape: benchmark grams are DISTINCT'd then broadcast (eval
suites are tiny next to a 100 TB corpus), so the corpus side is one
projection + explode + broadcast LEFT SEMI join — the corpus never
shuffles. Gram dedup per doc happens before the join to cap the
explode factor; at extreme scale, hash grams to int64 (xxhash64) so
the semi-join carries 8 bytes per gram instead of the string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.functions.text import ngram_join
from datapipeline_scripts_spark.registry import query

_N = 8  # gram width
_MOD = 97  # doc_id % _MOD == 0 → benchmark member


@query(
    "text_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(generate_series(1, len(t) - {_N - 1}),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7])))) AS g
      FROM toks WHERE len(t) >= {_N}
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {_MOD} = 0),
    cont AS (
      SELECT DISTINCT gr.doc_id
      FROM grams gr JOIN bench USING (g)
      WHERE gr.doc_id % {_MOD} <> 0
    )
    SELECT d.source,
           count(*) AS n_docs,
           CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
           round(CAST(count(c.doc_id) AS DOUBLE) / count(*), 4) AS pct_contaminated
    FROM documents d LEFT JOIN cont c ON d.doc_id = c.doc_id
    WHERE d.doc_id % {_MOD} <> 0
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination report: of the non-benchmark docs, how
    many collide with the benchmark on ≥1 word 8-gram."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " ")
    grams_col = F.when(
        F.size(toks) >= _N, F.array_distinct(ngram_join(toks, _N))
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", "source", F.explode(grams_col).alias("g"))
    is_bench = F.col("doc_id") % _MOD == 0
    bench = grams.filter(is_bench).select("g").distinct()
    cont = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        d.filter(~is_bench)
        .join(cont, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("hit").cast("long").alias("n_contaminated"),
            F.round(F.count("hit").cast("double") / F.count("*"), 4).alias(
                "pct_contaminated"
            ),
        )
        .orderBy("source")
    )
