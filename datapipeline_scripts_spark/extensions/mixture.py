"""Training-corpus assembly operators: deterministic splits and
mixture reweighting.

Two ops every large-scale training-data pipeline runs after curation
(quality → dedup → THIS) and that must be *reproducible across
engines and re-runs*:

- `split_assign`: train/val/test assignment by hashing a stable key —
  never `rand()` (re-run drift, no cross-engine twin) and never
  row-order (shuffles reorder). md5 is the cross-engine hash family
  (functions/text.py): assignment is a pure function of doc_id, so any
  engine, any partitioning, any day reproduces the same split.
- `corpus_mixture`: per-source sampling weights that rebalance the
  observed token distribution toward a target mixture (uniform here) —
  the up/down-sampling factor table a sampler consumes. Exact decimal
  ratios (basis points) so the report is hash-identical cross-engine.

Scale: both are one aggregate over the corpus (split stats reuse the
assignment expression inside the same scan; mixture is a groupBy over
sources joined to a 1-row total) — nothing materializes per-row state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.functions.text import md5_48_sql
from datapipeline_scripts_spark.registry import query

# split by md5(doc_id) mod 100: 80 / 10 / 10
_TRAIN_PCT, _VAL_PCT = 80, 10

_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT source,
         n_chars,
         CASE WHEN ({md5_48_sql("CAST(doc_id AS VARCHAR)")}) % 100 < {_TRAIN_PCT} THEN 'train'
              WHEN ({md5_48_sql("CAST(doc_id AS VARCHAR)")}) % 100 < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM assigned
GROUP BY split, source
"""


def split_bucket_col() -> Column:
    """md5_48(doc_id) % 100 — the registered split's hash bucket.
    Shared with the staged split_leakage_audit so the audited split
    and the shipped split cannot drift. Materialize it in a
    projection before branching on it: codegen does not CSE the md5
    across WHEN branches."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        % 100
    )


def split_of_bucket(b: Column) -> Column:
    """The 80/10/10 bucket-to-split mapping over a materialized bucket."""
    return (
        F.when(b < _TRAIN_PCT, "train")
        .when(b < _TRAIN_PCT + _VAL_PCT, "val")
        .otherwise("test")
    )


@query("split_assign", oracle=_SPLIT_ORACLE, tier="ext")
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(doc_id) mod
    100 — assignment is a pure function of the key (reproducible under
    reshuffling, appends, and engine changes; a doc never migrates
    between splits when the corpus grows). Reports per-(split, source)
    doc and char counts; the DuckDB oracle replays the identical hash
    arithmetic, so the split itself — not just the counts — is proven
    equivalent.

    Scale: the assignment is a codegen'd expression inside the single
    aggregate scan; no shuffle beyond the (3×sources)-group agg."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(split_bucket_col().alias("b"), "source", "n_chars")
        .select(split_of_bucket(F.col("b")).alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )


_MIXTURE_ORACLE = """
WITH per_source AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_chars) AS total_chars, count(*) AS n_sources FROM per_source)
SELECT s.source,
       s.n_docs,
       s.n_chars,
       CAST((s.n_chars * 10000) // (SELECT total_chars FROM tot) AS BIGINT)
         AS share_bp,
       CAST(((SELECT total_chars FROM tot) * 10000)
            // ((SELECT n_sources FROM tot) * s.n_chars) AS BIGINT)
         AS weight_bp
FROM per_source s
"""


@query("corpus_mixture", oracle=_MIXTURE_ORACLE, tier="ext")
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting table: each source's observed char share
    (basis points) and the sampling weight that moves it to a uniform
    target mixture — weight > 10000 means upsample, < 10000 downsample.
    Integer basis-point arithmetic (floor division on both engines)
    keeps the table hash-exact; a sampler multiplies per-doc inclusion
    probability by weight_bp/10000.

    Scale: one groupBy(source) over the corpus + a broadcast 1-row
    total — the weight table stays |sources| rows at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = per_source.agg(
        F.sum("n_chars").alias("total_chars"), F.count("*").alias("n_sources")
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        F.expr("n_chars * 10000 div total_chars").alias("share_bp"),
        F.expr("(total_chars * 10000) div (n_sources * n_chars)").alias("weight_bp"),
    )


_PACK_BUDGET = 8192  # chars per training shard (token-proxy budget)

_PACK_ORACLE = f"""
WITH ordered AS (
  SELECT doc_id, source, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cum_before
  FROM documents
),
binned AS (
  SELECT doc_id, source, n_chars,
         CAST(coalesce(cum_before, 0) // {_PACK_BUDGET} AS BIGINT) AS shard_id
  FROM ordered
)
SELECT shard_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS shard_chars,
       CAST(sum(n_chars) * 10000 // {_PACK_BUDGET} AS BIGINT) AS fill_bp
FROM binned
GROUP BY shard_id
"""


@query("corpus_pack", oracle=_PACK_ORACLE, tier="ext")
def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: assign docs (in stable doc_id
    order) to fixed-budget training shards by exclusive running char
    count — the packing step that turns a curated corpus into
    uniform training sequences. Reports per-shard doc count, size, and
    fill ratio (basis points; >10000 = the shard-crossing doc
    overflows into it, the standard greedy-pack behavior).

    Scale: ONE global window sort is the honest cost of strict global
    packing — at 100 TB you'd pack per partition instead (one window
    per date/source partition, embarrassingly parallel, same code with
    a partitionBy) and accept shard-boundary waste at partition edges.
    The global form here is the oracle-checkable reference semantics."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    binned = d.select(
        "doc_id",
        "n_chars",
        (F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / F.lit(_PACK_BUDGET))
        .cast("long")
        .alias("shard_id"),
    )
    return binned.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("shard_chars"),
        F.expr(f"sum(n_chars) * 10000 div {_PACK_BUDGET}").alias("fill_bp"),
    )


_PACK_PART_ORACLE = f"""
WITH ordered AS (
  SELECT doc_id, source, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cum_before
  FROM documents
),
binned AS (
  SELECT doc_id, source, n_chars,
         CAST(coalesce(cum_before, 0) // {_PACK_BUDGET} AS BIGINT) AS shard_id
  FROM ordered
)
SELECT source, shard_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS shard_chars,
       CAST(sum(n_chars) * 10000 // {_PACK_BUDGET} AS BIGINT) AS fill_bp
FROM binned
GROUP BY source, shard_id
"""


@query("corpus_pack_partitioned", oracle=_PACK_PART_ORACLE, tier="ext")
def corpus_pack_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of `corpus_pack` (VERDICT r02 item 2): greedy
    fixed-budget shard packing with the running-sum window PARTITIONED
    by source — each source packs independently and in parallel, so no
    `Exchange SinglePartition` funnel exists anywhere in the plan
    (asserted in tests/test_plans.py). The trade is shard-boundary
    waste at partition edges (each source's last shard may be
    under-filled) — the standard accept at scale, measured here by
    fill_bp. Shard identity is (source, shard_id), stable under
    repartitioning because the window order is the stable doc_id.

    At 100 TB the partition key would be (source, date) or a hashed
    doc_id prefix sized so each partition's char mass is ~executor
    memory; the code is identical, only the key changes."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = d.select(
        "doc_id",
        "source",
        "n_chars",
        (F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / F.lit(_PACK_BUDGET))
        .cast("long")
        .alias("shard_id"),
    )
    return binned.groupBy("source", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("shard_chars"),
        F.expr(f"sum(n_chars) * 10000 div {_PACK_BUDGET}").alias("fill_bp"),
    )


_SAMPLE_W_ORACLE = f"""
WITH per_source AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_chars) AS total_chars, count(*) AS n_sources FROM per_source),
weights AS (
  SELECT source,
         CAST(((SELECT total_chars FROM tot) * 10000)
              // ((SELECT n_sources FROM tot) * n_chars) AS BIGINT) AS weight_bp
  FROM per_source
),
drawn AS (
  SELECT d.source, d.n_chars,
         w.weight_bp // 10000
           + CASE WHEN ({md5_48_sql("CAST(d.doc_id AS VARCHAR)")}) % 10000
                       < w.weight_bp % 10000 THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN weights w ON d.source = w.source
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_copies > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_drawn,
       CAST(sum(n_copies) AS BIGINT) AS total_copies,
       CAST(sum(n_chars * n_copies) AS BIGINT) AS chars_out
FROM drawn
GROUP BY source
"""


@query("corpus_sample_weighted", oracle=_SAMPLE_W_ORACLE, tier="ext")
def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the mixture loop: APPLY `corpus_mixture`'s weights as a
    deterministic sampler. Each doc's copy count is
    weight_bp div 10⁴ (guaranteed copies — upsampling) plus one more
    iff md5(doc_id) mod 10⁴ < weight_bp mod 10⁴ (the fractional part as
    a hash-Bernoulli draw — downsampling). Pure function of
    (doc_id, weight): reproducible across engines, re-runs, and
    repartitioning — never rand(). Reports per-source draw counts and
    the char mass actually emitted, which converges on uniform
    per-source mass as the corpus grows.

    Scale: weight table is |sources| rows broadcast onto one corpus
    scan; the draw is a codegen'd expression — no shuffle beyond the
    final |sources|-group agg."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.sum("n_chars").alias("src_chars"))
    tot = per_source.agg(
        F.sum("src_chars").alias("total_chars"), F.count("*").alias("n_sources")
    )
    weights = (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr("(total_chars * 10000) div (n_sources * src_chars)").alias("weight_bp"),
        )
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast(
        "long"
    ) % 10000
    n_copies = F.expr("weight_bp div 10000") + F.when(
        u < F.col("weight_bp") % 10000, 1
    ).otherwise(0)
    drawn = d.join(F.broadcast(weights), "source").select(
        "source", "n_chars", n_copies.alias("n_copies")
    )
    return drawn.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_copies") > 0, 1).otherwise(0)).alias("n_drawn"),
        F.sum("n_copies").alias("total_copies"),
        F.sum(F.col("n_chars") * F.col("n_copies")).alias("chars_out"),
    )
