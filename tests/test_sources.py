"""Source/sink connector tests: format dispatch, CSV/JSON round trips
with explicit schemas, partitioned writes, JDBC option building."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F, types as T

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.sources import readers


def test_format_dispatch_unknown():
    with pytest.raises(ValueError, match="unsupported source format"):
        readers.read(None, "xml", "/nope")


def test_orc_round_trip(spark, sf_dir, tmp_path):
    supplier = load_table(spark, sf_dir, "supplier")
    path = str(tmp_path / "supplier_orc")
    supplier.write.orc(path)
    back = readers.read(spark, "orc", path, schema=supplier.schema)
    assert back.count() == supplier.count()
    assert {r["s_name"] for r in back.collect()} == {r["s_name"] for r in supplier.collect()}


def test_csv_round_trip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = readers.read(spark, "csv", path, schema=schema)
    assert back.count() == 25
    assert {r["n_name"] for r in back.collect()} == {r["n_name"] for r in nation.collect()}


def test_json_round_trip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    region.write.json(path)
    back = readers.read(spark, "json", path, schema=region.schema)
    assert sorted(r["r_name"] for r in back.collect()) == sorted(
        r["r_name"] for r in region.collect()
    )


def test_partitioned_parquet_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    readers.write_parquet(orders, path, partition_by=("o_orderstatus",))
    # hive-style partition dirs exist
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    # partition pruning: only the F directory is scanned
    from datapipeline_scripts_spark.plans.audit import formatted_plan

    plan = formatted_plan(back)
    assert "PartitionFilters" in plan
    n_f = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f


def test_jdbc_options_partitioned():
    opts = readers.jdbc_options(
        "jdbc:postgresql://host/db",
        "public.orders",
        "u",
        "p",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"


def test_jdbc_options_requires_bounds():
    with pytest.raises(ValueError, match="lower_bound"):
        readers.jdbc_options("jdbc:x", "t", "u", "p", partition_column="k")


def test_encrypted_sink_conf():
    from datapipeline_scripts_spark.sources import sinks

    kms = sinks.encrypted_sink_conf("arn:aws:kms:key/123")
    assert kms["fs.s3a.server-side-encryption-algorithm"] == "SSE-KMS"
    assert kms["fs.s3a.server-side-encryption.key"] == "arn:aws:kms:key/123"
    default = sinks.encrypted_sink_conf()
    assert default["fs.s3a.server-side-encryption-algorithm"] == "AES256"


def test_cross_account_and_token_conf():
    from datapipeline_scripts_spark.sources import sinks

    xacct = sinks.cross_account_conf("arn:aws:iam::123:role/backups")
    assert xacct["fs.s3a.assumed.role.arn"].endswith("role/backups")
    tok = sinks.token_auth_conf("tkn", 1700000000)
    assert tok["fs.s3a.session.token"] == "tkn"


def test_binary_file_reader_reads_whole_files(spark, sf_dir):
    """binaryFile ingest: one row per file with the exact byte length,
    and pathGlobFilter pruning at listing time."""
    import os

    df = readers.read(spark, "binary", sf_dir, glob="nation.parquet")
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["path"].endswith("nation.parquet")
    assert r["length"] == os.path.getsize(os.path.join(sf_dir, "nation.parquet"))
    assert bytes(r["content"][:4]) == b"PAR1"  # parquet magic — real bytes
    # glob pruning: nothing matches → zero rows, no error
    assert readers.read(spark, "binary", sf_dir, glob="*.nope").count() == 0


def test_avro_reader_is_gated_without_connector(spark, sf_dir):
    with pytest.raises(NotImplementedError, match="spark-avro"):
        readers.read(spark, "avro", f"{sf_dir}/nation.parquet")


def test_merge_schema_reconciles_evolved_files(spark, tmp_path):
    """Schema evolution: files written before/after a column addition
    read back as one superset schema with NULLs for the old files."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(f"{base}/p=1")
    spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double").write.parquet(
        f"{base}/p=2"
    )
    merged = readers.read_parquet(spark, base, merge_schema=True)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5
    # without mergeSchema, one file's footer wins and may drop the column
    plain = readers.read_parquet(spark, base)
    assert set(plain.columns) <= set(merged.columns)


def test_write_parquet_compression_codec(spark, sf_dir, tmp_path):
    import duckdb

    out = str(tmp_path / "zstd_out")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    readers.write_parquet(nation, out, compression="zstd")
    files = [f for f in __import__("os").listdir(out) if f.endswith(".parquet")]
    assert files
    meta = duckdb.connect().execute(
        f"SELECT DISTINCT compression FROM parquet_metadata('{out}/*.parquet')"
    ).fetchall()
    assert ("ZSTD",) in meta, meta


def test_compaction_reduces_file_count_and_preserves_content(spark, sf_dir):
    """Compaction must hit the computed size-targeted file count and
    lose nothing: fragmented dir has 64 files, compacted dir has
    ceil(bytes/target) files (far fewer), and row counts agree."""
    import glob
    import math
    import os
    import tempfile

    from datapipeline_scripts_spark.sources.compaction import compact, parquet_bytes

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    base = tempfile.mkdtemp(prefix="compaction_test_")
    frag, comp = os.path.join(base, "frag"), os.path.join(base, "comp")
    li.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 64
    target = 1 << 20
    n = compact(spark, frag, comp, target_file_bytes=target)
    files = glob.glob(f"{comp}/*.parquet")
    assert len(files) == n == max(1, math.ceil(parquet_bytes(frag) / target))
    assert n < 64
    assert spark.read.parquet(comp).count() == li.count()


def test_clustered_write_produces_disjoint_file_ranges(spark, sf_dir):
    """The clustered layout's pruning power comes from disjoint per-file
    key ranges — assert them from the REAL parquet footer statistics,
    and assert the 1000-2000 probe range overlaps at most 2 files."""
    import glob
    import os
    import tempfile

    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_extendedprice")
    out = os.path.join(tempfile.mkdtemp(prefix="clustered_test_"), "data")
    li.repartitionByRange(8, "l_orderkey").sortWithinPartitions("l_orderkey").write.parquet(out)
    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = {md.schema.column(i).name: i for i in range(md.num_columns)}["l_orderkey"]
        stats = [md.row_group(g).column(col).statistics for g in range(md.num_row_groups)]
        if stats and all(s is not None for s in stats):
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"
    touched = sum(1 for lo, hi in ranges if not (hi < 1000 or lo > 2000))
    # a ~1/6-keyspace probe over >=4 disjoint files must skip most files
    assert touched <= 3 and touched < len(ranges), f"probe touches {touched}/{len(ranges)}"


def test_protobuf_decode_is_gated_without_connector(spark, sf_dir):
    df = spark.range(1).selectExpr("CAST('x' AS BINARY) AS payload")
    with pytest.raises(NotImplementedError, match="spark-protobuf"):
        readers.protobuf_decode(df, "payload", "M", "/nonexistent.desc")
