"""Readers/writers with format dispatch.

The reference branches its whole pipeline on `$DB_ENGINE ==
"sqlserver-se"` vs Postgres (/root/reference/backup.sh:100,171,242,309).
Here the dispatch is over storage formats: a strategy map format →
reader, the Spark-idiomatic equivalent. JDBC is configured but not
exercised locally (no database in the container) — `jdbc_options`
builds the exact option dict `spark.read.jdbc` needs, including the
partitioned-read settings that matter at scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """`merge_schema` reconciles files written under an evolved schema
    (added nullable columns) into one superset schema — a footer-level
    merge at planning time. Leave it off on stable tables: merging
    reads every file's footer up front, which at 100 TB of small files
    is a real listing cost."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with explicit schema preferred — inference costs a full extra
    pass over the data (fatal at 100 TB). Mirrors the reference's
    sqlcmd CSV result sets (`-W -s ',' -k 1`,
    /root/reference/backup.sh:118-121)."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def jdbc_options(
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetchsize: int = 10_000,
    driver: str | None = None,
) -> dict[str, str]:
    """Options for a *partitioned* JDBC extract — the snapshot job's
    `pg_dump` analogue (/root/reference/backup.sh:210) reading N key
    ranges in parallel instead of one serial dump stream.

    Exercised LIVE in-container against embedded Derby (the JDBC
    driver pyspark itself ships for its Hive metastore) — see
    test_sources.py::test_jdbc_live_extract_roundtrip_embedded_derby,
    which proves the partitioned read splits into `num_partitions`
    range-predicate tasks and the write/read roundtrip is lossless.

    IAM-auth deployments swap `password` for a token minted per
    connection (the reference's `generate-db-auth-token`,
    /root/reference/psql-backups-iam-auth.sh:119-124) via a JDBC
    ConnectionProvider — out of local scope."""
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": str(fetchsize),
    }
    if driver is not None:
        opts["driver"] = driver
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Partitioned JDBC extract from a `jdbc_options()` dict. With the
    partition keys present, Spark plans `num_partitions` concurrent
    range-predicate scans (`WHERE pc >= lo AND pc < hi`) — each task
    holds one connection, so size `num_partitions` to what the source
    database tolerates, not to the cluster's core count."""
    return spark.read.format("jdbc").options(**options).load()


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_partition_bytes: str | None = None,
) -> DataFrame:
    """binaryFile source — the multimodal ingest path: each file becomes
    one row (`path`, `modificationTime`, `length`, `content: binary`)
    feeding the extensions/multimodal.py decode plumbing.

    Scale notes: `pathGlobFilter` prunes at listing time (never read
    bytes you filter later); whole files can't split, so a partition's
    size is bounded by `spark.sql.files.maxPartitionBytes` times the
    largest-file skew — set it so the biggest file batch fits executor
    memory, and keep huge media out of this path (chunk upstream)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if max_partition_bytes is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    return reader.load(path)


# Signatures that mean "the optional JVM connector is not on the
# classpath" — the ONLY condition under which the two-tier readers
# below fall back to their pure-Python tier (ADVICE r06: a bare
# `except Exception` rerouted genuine failures — corrupt files, IO
# errors, mid-job write aborts — to the slow tier and discarded the
# real error; worst case write_avro(mode='overwrite') rmtree'ing JVM
# partial output). Probed in-container: missing spark-avro raises
# AnalysisException condition _LEGACY_ERROR_TEMP_1139 ("Failed to
# find data source: avro"), missing spark-protobuf raises condition
# PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE; the others cover the
# documented Spark-version spellings of the same absence.
_CONNECTOR_ABSENT_SIGNATURES = (
    "Failed to find data source",
    "Failed to find the data source",
    "DATA_SOURCE_NOT_FOUND",
    "_LEGACY_ERROR_TEMP_1139",
    "PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE",
    "CANNOT_LOAD_PROTOBUF_CLASS",
)

# A ClassNotFoundException only means "connector absent" when the class
# it names IS the connector (ADVICE r07: a mid-job CNFE for an
# unrelated class — codec shim, filesystem impl, UDF dependency — is a
# deployment fault that must surface, not a cue to silently reroute to
# the slow Python tier). The JVM spelling puts the missing class name
# right after the exception class, so anchor on connector prefixes.
_CONNECTOR_CLASS_PREFIXES = (
    "org.apache.spark.sql.avro",
    "org.apache.spark.sql.protobuf",
    "org.apache.spark.sql.v2.avro",
    "avro.AvroFileFormat",
)


def _connector_absent(exc: BaseException) -> bool:
    """True iff `exc` is a missing-connector signature (fall back to the
    Python tier); anything else is a genuine failure and must re-raise."""
    if isinstance(exc, ImportError):  # pyspark.sql.protobuf wrapper absent
        return True
    parts = [str(exc)]
    get_cond = getattr(exc, "getCondition", None)
    if get_cond is not None:
        try:
            cond = get_cond()
            if cond:
                parts.append(cond)
        except Exception:
            pass
    text = " ".join(parts)
    if any(sig in text for sig in _CONNECTOR_ABSENT_SIGNATURES):
        return True
    if "ClassNotFoundException" in text:
        return any(prefix in text for prefix in _CONNECTOR_CLASS_PREFIXES)
    return False


def read_avro(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Avro source, two-tier (round 6 closes the former hard gate):

    1. The JVM `spark-avro` connector when on the classpath (a cluster
       submitted with `--packages
       org.apache.spark:spark-avro_2.13:<spark-version>`) — columnar,
       codegen'd, splittable within files: the 100 TB path.
    2. Otherwise the pure-Python Object Container File DataSource
       (`sources/avro_pysource.py`, partition-per-file, every
       spec-named codec — null/deflate/snappy/bzip2/xz stdlib-only,
       zstandard via pyarrow — and full union coverage via spark-avro's
       member-struct convention) — so Avro reads WORK in this container
       instead of raising.

    A caller-supplied `schema` applies as-is on the JVM tier; the
    Python tier decodes by the file's writer schema, so there it must
    match the inferred schema exactly (projection/cast belong in a
    `.select` on the returned frame)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as exc:
        if not _connector_absent(exc):
            raise  # genuine failure (corrupt file, IO, perms) — never mask it
        from datapipeline_scripts_spark.sources.avro_pysource import (
            read_avro_py,
            spark_schema_for_path,
        )

        if schema is not None and schema != spark_schema_for_path(path):
            raise NotImplementedError(
                "the pure-Python Avro tier reads the file's writer schema; "
                f"requested schema differs from {spark_schema_for_path(path).simpleString()} "
                "— drop the schema argument (then .select/.cast), or use the "
                "spark-avro connector (--packages "
                "org.apache.spark:spark-avro_2.13:<spark-version>)"
            ) from exc
        return read_avro_py(spark, path)


def protobuf_decode(df: DataFrame, data_col: str, message_name: str, desc_path: str) -> DataFrame:
    """Protobuf column decode, two-tier (round 6 closes the former hard
    gate, mirroring read_avro):

    1. `from_protobuf` when the external spark-protobuf module is on
       the classpath (a cluster submitted with `--packages
       org.apache.spark:spark-protobuf_2.13:<spark-version>`) —
       columnar, codegen'd: the 100 TB path.
    2. Otherwise the pure-Python wire-format tier
       (`sources/protobuf_pywire.py`): the .desc FileDescriptorSet is
       parsed driver-side by the same wire reader (descriptor.proto's
       field numbers are public and frozen), the decoder compiles once
       and runs as an Arrow-batched UDF — so protobuf decode WORKS in
       this container instead of raising. Holder semantics match
       protobuf-java (unsigned wrap, enum symbol names, proto3
       defaults), so results are tier-independent."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        out = df.withColumn(
            data_col, from_protobuf(df[data_col], message_name, descFilePath=desc_path)
        )
        out.schema  # force analysis: missing connector surfaces here
        return out
    except Exception as exc:
        if not _connector_absent(exc):
            raise  # bad desc path / wrong message name / etc: both tiers fail
        from datapipeline_scripts_spark.sources.protobuf_pywire import (
            decode_protobuf_py,
        )

        return decode_protobuf_py(df, data_col, message_name, desc_path)


READERS: dict[str, Callable[..., DataFrame]] = {
    "parquet": read_parquet,
    "csv": read_csv,
    "json": read_json,
    "orc": read_orc,
    "binary": read_binary_files,
    "avro": read_avro,
}


def read(spark: SparkSession, fmt: str, path: str, **kwargs) -> DataFrame:
    """Format-dispatched read (A6)."""
    try:
        reader = READERS[fmt]
    except KeyError as exc:
        raise ValueError(f"unsupported source format {fmt!r}; known: {sorted(READERS)}") from exc
    return reader(spark, path, **kwargs)


def write_avro(df: DataFrame, path: str, mode: str = "error", codec: str = "deflate") -> None:
    """Avro sink, two-tier like read_avro: the JVM spark-avro connector
    when on the classpath (columnar, any Hadoop filesystem — the 100 TB
    path), else the pure-Python OCF writer (`avro_pysource.write_avro_py`:
    one part-file per partition on a POSIX-visible directory,
    null/deflate codecs)."""
    try:
        jvm_codec = "uncompressed" if codec == "null" else codec
        writer = df.write.mode(mode).option("compression", jvm_codec)
        writer.format("avro").save(path)
    except Exception as exc:
        if not _connector_absent(exc):
            # mode='error' refusals, mid-job write failures, IO errors:
            # re-raise — falling through would rmtree JVM partial output
            # under mode='overwrite' and mask the real failure
            raise
        from datapipeline_scripts_spark.sources.avro_pysource import write_avro_py

        write_avro_py(df, path, codec=codec, mode=mode)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Parquet sink; `partition_by` gives downstream partition pruning,
    `maxRecordsPerFile` bounds file sizes so a skewed partition can't
    produce a multi-GB file, `compression` trades write CPU for scan
    bytes (zstd ≈ gzip ratio at ~3× the speed; snappy when CPU-bound)."""
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
