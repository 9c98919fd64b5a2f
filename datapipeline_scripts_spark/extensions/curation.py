"""Training-data curation pipeline — the E-family operators composed
end-to-end the way an LLM data pipeline actually runs them:

    quality gate → language ID → exact dedup → per-language corpus stats

One declared query (`curation_pipeline`), fully oracle-checked: every
stage is deterministic Catalyst expressions, so the whole chain has a
DuckDB twin. This is the flagship composite for the dedup/text family,
as the TPC-H shapes are for the relational family.

Scale shape (the reason the stages are ordered this way):
- the quality gate and langid are per-row, shuffle-free, and cheap —
  they run first so everything downstream sees fewer rows;
- dedup groups on a 32-char md5 of the *normalized* text, never the
  body: the only data-sized shuffle in the pipeline carries
  fingerprints (≈3 GB per 100 TB of corpus, not 100 TB);
- the final rollup groups on language (cardinality ~10²) — partial
  aggregation collapses it map-side to almost nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.functions.text import fingerprint_md5, normalize_text, stopword_hits
from datapipeline_scripts_spark.registry import query

_MIN_WORDS = 30

_NORM_SQL = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_HIT = "len(list_filter(string_split({norm}, ' '), t -> {pred}))"
_H_EN = _HIT.format(norm="norm_text", pred="t = 'the' OR t = 'a' OR t = 'of'")
_H_ES = _HIT.format(norm="norm_text", pred="t = 'el' OR t = 'la' OR t = 'de'")
_H_DE = _HIT.format(norm="norm_text", pred="t = 'der' OR t = 'die' OR t = 'das'")


@query(
    "curation_pipeline",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, lang, {_NORM_SQL} AS norm_text FROM documents
    ),
    sig AS (
      SELECT doc_id, lang, norm_text,
             len(string_split(norm_text, ' ')) AS n_words,
             {_H_EN} AS h_en, {_H_ES} AS h_es, {_H_DE} AS h_de
      FROM norm
    ),
    keep AS (
      SELECT doc_id, lang, norm_text, n_words,
             CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en > 0 THEN 'en'
                  WHEN h_es >= h_de AND h_es > 0 THEN 'es'
                  WHEN h_de > 0 THEN 'de'
                  ELSE 'und' END AS predicted
      FROM sig
      WHERE n_words >= {_MIN_WORDS}
        AND (h_en + h_es + h_de) > 0
    ),
    surv AS (
      SELECT lang, predicted, md5(norm_text) AS fp,
             min(doc_id) AS keep_doc_id,
             count(*) AS n_copies,
             min(n_words) AS n_words
      FROM keep
      WHERE predicted <> 'und'
      GROUP BY 1, 2, 3
    )
    SELECT lang AS labeled_lang, predicted,
           CAST(count(*) AS BIGINT) AS n_unique_docs,
           CAST(sum(n_copies) AS BIGINT) AS n_docs_in,
           CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dupes_removed,
           CAST(sum(n_words) AS BIGINT) AS n_tokens_kept,
           round(avg(CAST(n_words AS DOUBLE)), 2) AS avg_doc_tokens
    FROM surv
    GROUP BY 1, 2
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-stage curation chain over `documents`; returns the
    per-language corpus summary after filtering + dedup.

    Stages (all one DataFrame expression — Catalyst fuses the per-row
    stages into a single codegen'd projection over the scan):
    1. normalize + quality gate: ≥ 30 normalized words and at
       least one stopword marker hit (garbage filter);
    2. language ID: marker-word argmax (en/es/de, fixed precedence),
       'und' dropped;
    3. exact dedup per language on md5(normalized text), survivor =
       lowest doc_id, copies counted;
    4. rollup per (labeled lang × predicted lang): unique docs, input
       docs, dupes removed, kept token volume — the curation report a
       pipeline owner reads before a training run.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    toks = F.split(norm, " ")
    n_words = F.size(toks)
    h_en = stopword_hits(toks, ("the", "a", "of"))
    h_es = stopword_hits(toks, ("el", "la", "de"))
    h_de = stopword_hits(toks, ("der", "die", "das"))
    predicted = (
        F.when((h_en >= h_es) & (h_en >= h_de) & (h_en > 0), "en")
        .when((h_es >= h_de) & (h_es > 0), "es")
        .when(h_de > 0, "de")
        .otherwise("und")
    )
    kept = (
        d.filter((n_words >= _MIN_WORDS) & ((h_en + h_es + h_de) > 0))
        .select(
            "doc_id",
            "lang",
            n_words.alias("n_words"),
            predicted.alias("predicted"),
            fingerprint_md5(F.col("text")).alias("fp"),
        )
        .filter(F.col("predicted") != "und")
    )
    surv = kept.groupBy("lang", "predicted", "fp").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
        F.min("n_words").alias("n_words"),
    )
    return surv.groupBy(F.col("lang").alias("labeled_lang"), F.col("predicted")).agg(
        F.count("*").cast("long").alias("n_unique_docs"),
        F.sum("n_copies").cast("long").alias("n_docs_in"),
        (F.sum("n_copies") - F.count("*")).cast("long").alias("n_dupes_removed"),
        F.sum("n_words").cast("long").alias("n_tokens_kept"),
        F.round(F.avg(F.col("n_words").cast("double")), 2).alias("avg_doc_tokens"),
    )
