"""Small-files compaction — the table-maintenance operator every
long-lived 100 TB lake needs.

Streaming ingests, per-batch writes, and fine-grained partitioning all
leave a trail of tiny files; a scan of 1M × 1 MB files spends more time
in task scheduling and footer reads than in I/O. Compaction rewrites a
directory into size-targeted files: file count = ceil(total_bytes /
target_file_bytes). On a cluster the same recipe is
`spark.sql.files.maxPartitionBytes` for the read side plus one
`repartition(n)` before the write (or AQE's
`spark.sql.adaptive.coalescePartitions` for free at shuffle
boundaries); `maxRecordsPerFile` caps stragglers.

Reference analogue: the nightly re-dump compacts the day's WAL/exports
into one artifact per table (/root/reference/backup.sh:81-119) — here
the artifact is a right-sized parquet directory instead of a .dump.
"""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query

_FRAGMENT_FILES = 64
_TARGET_FILE_BYTES = 4 << 20  # 4 MiB at fixture scale; ~512 MiB in production


def parquet_bytes(path: str) -> int:
    """Total bytes of the parquet data files under `path` (driver-side
    metadata listing — no data is read)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    return total


def compact(spark: SparkSession, src_dir: str, out_dir: str, target_file_bytes: int = _TARGET_FILE_BYTES) -> int:
    """Rewrite `src_dir` into ceil(total/target) files at `out_dir`;
    returns the file count. `repartition(n)` (round-robin) gives evenly
    sized output files, unlike `coalesce` which merges adjacent input
    partitions and inherits their skew."""
    n = max(1, math.ceil(parquet_bytes(src_dir) / target_file_bytes))
    spark.read.parquet(src_dir).repartition(n).write.mode("overwrite").parquet(out_dir)
    return n


@query(
    "compaction_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → fragmented into 64 small files → size-targeted
    compaction → read back → aggregate. The hash match against the
    source table certifies compaction is content-preserving; the
    file-count arithmetic is asserted in tests/test_sources.py."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_compaction_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    frag, comp = os.path.join(base, "fragmented"), os.path.join(base, "compacted")
    li.repartition(_FRAGMENT_FILES).write.mode("overwrite").parquet(frag)
    compact(spark, frag, comp)
    back = spark.read.parquet(comp)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2).cast("double").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "clustered_write_roundtrip",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_price
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 2000
    """,
)
def clustered_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data clustering for scan pruning: range-repartition by the hot
    predicate key + per-file sort, so every output file covers a
    DISJOINT l_orderkey range and its parquet footer min/max statistics
    actually prune (a selective point/range query touches 1-2 files
    instead of all of them).

    This is the zorder-lite single-key form — at 100 TB, clustering the
    fact table on its dominant filter key is the cheapest 10-100× scan
    win there is, and it composes with compaction (cluster while
    rewriting). Disjointness of the written file ranges is asserted
    from the real parquet footers in tests/test_sources.py; the hash
    match certifies the layout loses nothing."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_clustered_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("l_orderkey").between(1000, 2000))
    return back.agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2).cast("double").alias("sum_price"),
    )


@query(
    "zorder_write_roundtrip",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_price,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40
    """,
)
def zorder_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional clustering (Z-order): interleave the bits of
    the two hot filter keys (l_partkey, l_suppkey) into one Morton
    code, range-partition + sort on it, and read back through a
    conjunctive 2-D predicate. Z-ordering gives every output file a
    small rectangle of the (partkey, suppkey) plane, so footer min/max
    stats prune on BOTH keys — single-key clustering
    (`clustered_write_roundtrip`) can only prune one.

    The 16-bit × 2 interleave is a codegen'd shift/mask expression
    (no UDF): bit i of each key lands at Morton bit 2i / 2i+1. At
    100 TB this is the layout for fact tables with two selective
    dimensions (date × tenant, part × supplier); the hash match
    certifies the rewrite loses nothing and the 2-D read-back is
    correct."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    x = F.col("l_partkey").cast("bigint") % 65536
    y = F.col("l_suppkey").cast("bigint") % 65536
    morton = sum(
        (F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        + (F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        for i in range(16)
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_zorder_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    (
        li.withColumn("_z", morton)
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("l_partkey").between(100, 300) & F.col("l_suppkey").between(10, 40)
    )
    return back.agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2).cast("double").alias("sum_price"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )
