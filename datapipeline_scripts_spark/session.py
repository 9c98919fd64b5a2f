"""SparkSession factory.

Settings chosen for DuckDB-oracle parity and scale-readiness:

- ``spark.sql.session.timeZone=UTC``: fixture timestamps are written in
  UTC; DuckDB hashes match only if Spark renders them in UTC too
  (SURVEY.md §1.2).
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast demotion/promotion — the 100 TB story is "let AQE re-plan
  with real stats" rather than hand-tuned partition counts.
- ``spark.sql.shuffle.partitions``: defaults to the local core count via
  SPARK_GRAFT_CPUS; on a real cluster this would be ~2-3× total cores
  (AQE coalesces down, so err high there / exact here).
- Arrow enabled: every pandas interchange (Pandas UDFs, toPandas in the
  bench harness) rides the vectorized Arrow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "datapipeline_scripts_spark", **extra_conf: str) -> SparkSession:
    """Build (or fetch) the SparkSession used by every job and test."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS) which Spark has no native
        # type for; read it as a ns-since-epoch long, converted to a µs
        # TimestampType in catalog.load_table (matches DuckDB's ns→µs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # fixture timestamps are parquet NTZ holding UTC wall-clock values;
        # surface them as plain TIMESTAMP (event-time ops need it, and the
        # UTC session zone keeps DuckDB-oracle hashes identical)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # scan-split granularity: map-stage parallelism is bounded by
        # input splits, and a compact table whose rows EXPAND downstream
        # (band-join probes, shingle explodes) can starve the box — the
        # 100x proxy's 50MB/8-file part table put a 5e9-row band-join
        # expansion through 8 map tasks. Lower this for such runs
        # (e.g. SPARK_GRAFT_MAX_PARTITION_BYTES=4194304); on a real
        # cluster the default 128MB is right because inputs are big.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
