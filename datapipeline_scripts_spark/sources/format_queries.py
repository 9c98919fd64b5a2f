"""Driver-visible source-format queries: round-trip a table through
CSV / JSON-lines on local disk, read it back with an explicit schema,
and aggregate — proving the text-format readers/writers preserve
values (the reference's pipelines move dumps through flat files the
same way: plain-text dump → restore, /root/reference/backup.sh:264-375).

The oracle aggregates the original parquet directly, so a hash match
certifies the round-trip is lossless. Doubles survive because Spark
writes shortest-round-trip representations; money is still re-cast to
DECIMAL before summing (summation-order independence, SURVEY §7.0).

Scale shape: the write is a distributed `df.write` (one file per
partition, no driver collect); the read-back is a parallel scan with a
user-supplied schema — schema inference is disabled on the hot path
(inference is an extra full scan at 100 TB).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query

_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)

_ORACLE = """
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # per-session path component: concurrent sessions on one machine must
    # not race on a shared overwrite location (ADVICE r01)
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{fmt}_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(out)
        back = spark.read.schema(_SCHEMA).option("header", "true").csv(out)
    elif fmt == "orc":
        writer.orc(out)
        back = spark.read.schema(_SCHEMA).orc(out)
    else:
        writer.json(out)
        back = spark.read.schema(_SCHEMA).json(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query("csv_roundtrip", oracle=_ORACLE)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → headered CSV on disk → schema'd read-back → aggregate;
    hash-matches the direct-parquet oracle iff the CSV codec is
    value-preserving."""
    return _roundtrip(spark, sf_dir, "csv")


@query("jsonl_roundtrip", oracle=_ORACLE)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → JSON-lines on disk → schema'd read-back → aggregate
    (same oracle as `csv_roundtrip`)."""
    return _roundtrip(spark, sf_dir, "json")


@query("orc_roundtrip", oracle=_ORACLE)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC on disk → schema'd read-back → aggregate (same
    oracle as `csv_roundtrip`); exercises the columnar non-parquet
    path, which keeps pushdown + pruning unlike the text formats."""
    return _roundtrip(spark, sf_dir, "orc")


@query(
    "partitioned_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderstatus → read back with a
    partition filter → aggregate. The filter prunes at the DIRECTORY
    level (PartitionFilters in the scan, not a data filter) — at
    100 TB this is the difference between scanning one status's files
    and scanning everything; the hash match against unpartitioned
    parquet certifies the layout loses nothing."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    # per-session path component: concurrent sessions on one machine must
    # not race on overwrite/rmtree of a shared location (ADVICE r01)
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_part_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query("dumpline_roundtrip", oracle=_ORACLE)
def dumpline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → pipe-delimited dump lines (the reference's pg_dump COPY
    text format, backup.sh:210) → `spark.read.text` → split/parse →
    aggregate. The numeric columns round-trip losslessly because the
    line carries Spark's canonical double/long rendering (shortest
    round-trip repr), so cast-back is bit-exact — the same property a
    restore drill depends on.

    Scale: text lines are splittable input (no footer), so a 100 TB
    dump directory parallelizes by line ranges; the parse is
    codegen'd split/cast, no Python."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_dumpline_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    lines = src.select(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    raw = spark.read.text(out)
    parts = F.split(F.col("value"), r"\|")
    back = raw.select(
        F.element_at(parts, 1).cast("long").alias("o_orderkey"),
        F.element_at(parts, 2).alias("o_orderstatus"),
        F.element_at(parts, 3).cast("double").alias("o_totalprice"),
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query("fixedwidth_roundtrip", oracle=_ORACLE)
def fixedwidth_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → fixed-width text records (mainframe/EDI ingest shape) →
    `spark.read.text` → substring-sliced parse → aggregate. Columns are
    space-padded to fixed offsets; values stay lossless because each
    field carries the canonical string rendering, only padded.

    Scale: fixed-width slicing is pure codegen substring math — the
    cheapest possible parse — and the writer pads with format_string,
    so neither side leaves the JVM."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_fixedwidth_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    lines = src.select(
        F.concat(
            F.format_string("%-20s", F.col("o_orderkey").cast("string")),
            F.format_string("%-4s", F.col("o_orderstatus")),
            F.format_string("%-24s", F.col("o_totalprice").cast("string")),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    raw = spark.read.text(out)
    back = raw.select(
        F.trim(F.substring("value", 1, 20)).cast("long").alias("o_orderkey"),
        F.trim(F.substring("value", 21, 4)).alias("o_orderstatus"),
        F.trim(F.substring("value", 25, 24)).cast("double").alias("o_totalprice"),
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "schema_evolution_roundtrip",
    oracle="""
    SELECT l_linenumber > 3 AS has_discount,
           count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_qty,
           CAST(round(coalesce(sum(CASE WHEN l_linenumber > 3
                       THEN CAST(l_discount AS DECIMAL(18,4)) END), 0), 4) AS DOUBLE)
             AS sum_disc
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: batch 1 writes the v1 schema (orderkey, qty),
    batch 2 appends the v2 schema with a new `l_discount` column; the
    read-back uses `mergeSchema=true` and must surface the union schema
    with NULL-filled v1 rows. The aggregate splits on column presence,
    so the hash match against raw lineitem certifies both the merge and
    the null-fill are lossless.

    Scale: schema merge reads only parquet FOOTERS (one tiny task per
    file), not data; the v1/v2 batches stay separately scannable. This
    is the additive-column evolution every long-lived 100 TB dataset
    goes through — no rewrite of historical files."""
    li = load_table(spark, sf_dir, "lineitem")
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_schevo_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    v1 = li.filter(F.col("l_linenumber") <= 3).select("l_orderkey", "l_linenumber", "l_quantity")
    v2 = li.filter(F.col("l_linenumber") > 3).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "batch=1"), os.path.join(out, "batch=2")
    )
    return (
        back.groupBy(F.col("l_discount").isNotNull().alias("has_discount"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).cast("double").alias("sum_qty"),
            F.round(
                F.coalesce(F.sum(F.col("l_discount").cast("decimal(18,4)")), F.lit(0).cast("decimal(18,4)")), 4
            )
            .cast("double")
            .alias("sum_disc"),
        )
        .orderBy("has_discount")
    )


@query("xml_roundtrip", oracle=_ORACLE)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → XML on disk → schema'd read-back → aggregate (same
    oracle as `csv_roundtrip`). Spark 4 ships the XML source natively
    (the former spark-xml package) — rowTag framing, distributed write,
    schema'd parallel read with inference disabled on the hot path."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_xml_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    src.write.mode("overwrite").option("rootTag", "orders").option("rowTag", "order").format("xml").save(out)
    back = spark.read.schema(_SCHEMA).option("rowTag", "order").format("xml").load(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "jsonl_corrupt_roundtrip",
    oracle="""
    SELECT count(*) AS n_good,
           7 AS n_bad,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_price
    FROM orders
    """,
)
def jsonl_corrupt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine: a JSONL dataset with 7 injected
    garbage lines, read in PERMISSIVE mode with a corrupt-record
    column — bad lines land in `_corrupt` instead of failing the job
    (the data-plane posture `try_functions` provides for scalars,
    applied to the source itself). The report proves the good rows
    survive bit-exact AND the bad-row count is exactly the injected 7.

    At 100 TB: PERMISSIVE + corrupt-column (plus a quarantine sink for
    the bad rows) is the only sane way to ingest third-party feeds;
    FAILFAST turns one upstream typo into a dead pipeline."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_corrupt_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    src.write.mode("overwrite").json(out)
    bad = spark.createDataFrame(
        [(f"{{not json at all #{i}",) for i in range(7)], "value string"
    )
    bad.coalesce(1).write.mode("append").text(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    # Spark disallows queries referencing ONLY the corrupt-record
    # column; one conditional aggregate over all columns sidesteps the
    # restriction and is a single pass anyway
    ok = F.col("_corrupt").isNull()
    return back.agg(
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("int").alias("n_bad"),
        F.round(
            F.sum(F.when(ok, F.col("o_totalprice").cast("decimal(18,2)"))), 2
        )
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "textfile_roundtrip",
    oracle=_ORACLE,
)
def textfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → pipe-delimited lines via the `text` sink → `text`
    source read-back → parse → aggregate (same oracle as
    `csv_roundtrip`). Exercises the raw line-oriented source/sink the
    reference's dump files flow through (one string column, no codec
    in the way — /root/reference/backup.sh's plain-SQL dump analogue).

    Doubles survive because CAST(double AS STRING) emits the
    shortest-round-trip representation, and the read-back casts it
    straight back; the write is distributed (one file per partition)
    and the read is a parallel line scan — no schema inference pass."""
    src = load_table(spark, sf_dir, "orders").select(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
        ).alias("value")
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_text_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    src.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    parts = F.split(F.col("value"), "\\|")
    parsed = back.select(
        parts.getItem(0).cast("long").alias("o_orderkey"),
        parts.getItem(1).alias("o_orderstatus"),
        parts.getItem(2).cast("double").alias("o_totalprice"),
    )
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


_BINARYFILE_ORACLE = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    WHERE doc_id % 199 = 0
"""


@query("binaryfile_roundtrip", oracle=_BINARYFILE_ORACLE)
def binaryfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob ingest via the built-in `binaryFile` source — the
    front door for multimodal corpora (multimodal.py's decode plumbing
    assumes blobs already sit in a binary column; this query proves the
    path that GETS them there from raw files: path, length, content).

    Fixture materialization: a bounded subset of documents
    (doc_id % 199, ≤ a few dozen rows at any fixture SF) is written as
    one .bin file each — a driver-side loop, acceptable ONLY because it
    creates the on-disk fixture this source query exists to read; at
    100 TB the files already exist (that's the premise) and the
    binaryFile scan itself is fully parallel with one task per file.
    The report recomputes doc_id from the file path and hashes the
    bytes; the oracle recomputes both from the table text (UTF-8), so
    a hash match proves byte-exact ingest."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 199 == 0)
        .select("doc_id", "text")
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_binaryfile_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    # fresh directory each run: a stale doc_*.bin from a prior run (other
    # sf_dir with the same basename, regenerated fixtures) must not leak
    # into the scan — same overwrite semantics as the sibling round trips
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for row in docs.collect():  # bounded fixture write, see docstring
        with open(os.path.join(out, f"doc_{row['doc_id']}.bin"), "wb") as fh:
            fh.write(row["text"].encode("utf-8"))
    back = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(out)
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


_DPP_ORACLE = """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE strftime(l_shipdate, '%Y') = '1996'
      AND CAST(strftime(l_shipdate, '%m') AS INTEGER) <= 3
    GROUP BY l_returnflag
"""


@query("join_dpp_partitioned", oracle=_DPP_ORACLE)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out
    partitioned by ship-month, the month dimension is filtered to
    1996-Q1 at *runtime*, and Catalyst injects a dynamicpruning
    subquery into the fact scan so only the three matching month
    directories are read — the star-schema scan killer at 100 TB
    (static pruning can't help because the quarter→month mapping
    lives in the dim, not in the fact predicate). Plan-asserted in
    test_plans.py: `dynamicpruningexpression` on the scan.

    The hash match against the flat-oracle (plain date predicate on
    unpartitioned lineitem) certifies the pruned read loses nothing."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_dpp_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    li.write.mode("overwrite").partitionBy("ship_month").parquet(out)
    fact = spark.read.parquet(out)
    # month dim with the quarter attribute the fact table doesn't have
    months = (
        fact.select("ship_month")
        .distinct()
        .select(
            "ship_month",
            F.concat(
                F.substring("ship_month", 1, 4),
                F.lit("-Q"),
                F.ceil(F.substring("ship_month", 6, 2).cast("int") / 3).cast("string"),
            ).alias("quarter"),
        )
    )
    dim = months.filter(F.col("quarter") == "1996-Q1")
    return (
        fact.join(F.broadcast(dim), "ship_month")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )
