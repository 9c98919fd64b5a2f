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


# ---- Avro: pure-Python OCF tier (round 6) ---------------------------------
#
# The JVM spark-avro CONNECTOR is absent in this container, but the core
# org.apache.avro library ships inside pyspark's jars — so the tests write
# reference files with the REAL Avro implementation (via py4j) and read
# them back through the pure-Python DataSource tier, proving the decoder
# against the spec's canonical encoder rather than against itself.

_AVRO_RICH_SCHEMA = """{
  "type": "record", "name": "Rich", "namespace": "t", "fields": [
    {"name": "id", "type": "long"},
    {"name": "name", "type": ["null", "string"], "default": null},
    {"name": "score", "type": "double"},
    {"name": "flag", "type": "boolean"},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "attrs", "type": {"type": "map", "values": "int"}},
    {"name": "nested", "type": {"type": "record", "name": "Inner", "fields": [
      {"name": "a", "type": "int"}, {"name": "b", "type": "string"}]}},
    {"name": "color", "type": {"type": "enum", "name": "Color",
      "symbols": ["RED", "GREEN", "BLUE"]}},
    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    {"name": "day", "type": {"type": "int", "logicalType": "date"}},
    {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
      "precision": 10, "scale": 2}}
  ]}"""


def _write_avro_reference(spark, path, n_rows, codec="deflate"):
    """Write an OCF file with the JVM org.apache.avro library."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(_AVRO_RICH_SCHEMA)
    inner_sch = sch.getField("nested").schema()
    color_sch = sch.getField("color").schema()
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    if codec == "deflate":
        w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    elif codec == "snappy":
        w.setCodec(jvm.org.apache.avro.file.CodecFactory.snappyCodec())
    elif codec == "zstandard":
        w.setCodec(jvm.org.apache.avro.file.CodecFactory.zstandardCodec(3))
    elif codec == "bzip2":
        w.setCodec(jvm.org.apache.avro.file.CodecFactory.bzip2Codec())
    elif codec == "xz":
        w.setCodec(jvm.org.apache.avro.file.CodecFactory.xzCodec(6))
    w.create(sch, jvm.java.io.File(path))
    GR = jvm.org.apache.avro.generic.GenericData.Record
    for i in range(n_rows):
        r = GR(sch)
        r.put("id", i)
        r.put("name", None if i % 3 == 0 else f"name-{i}")
        r.put("score", i * 1.25)
        r.put("flag", i % 2 == 0)
        tags = jvm.java.util.ArrayList()
        for t in range(i % 3):
            tags.add(f"tag{t}")
        r.put("tags", tags)
        attrs = jvm.java.util.HashMap()
        attrs.put("k", i)
        r.put("attrs", attrs)
        inner = GR(inner_sch)
        inner.put("a", i * 10)
        inner.put("b", f"inner-{i}")
        r.put("nested", inner)
        r.put(
            "color",
            jvm.org.apache.avro.generic.GenericData.EnumSymbol(
                color_sch, ["RED", "GREEN", "BLUE"][i % 3]
            ),
        )
        r.put("ts", 1_700_000_000_000_000 + i)
        r.put("day", 19_000 + i)
        # decimal 10,2: unscaled big-endian two's-complement bytes
        unscaled = 12_345 + i
        r.put("amount", jvm.java.nio.ByteBuffer.wrap(
            bytearray(unscaled.to_bytes(3, "big", signed=True))
        ))
        w.append(r)
    w.close()


def test_avro_python_tier_roundtrips_rich_types(spark, tmp_path):
    """JVM-encoded OCF → pure-Python DataSource: every supported shape
    (nullable union, array, map, nested record, enum, logical date /
    timestamp-micros / decimal), both codecs, partition-per-file."""
    import datetime as dt
    from decimal import Decimal

    d = tmp_path / "avro_dir"
    d.mkdir()
    _write_avro_reference(spark, str(d / "part-0.avro"), 4, codec="deflate")
    _write_avro_reference(spark, str(d / "part-1.avro"), 4, codec="null")
    n_files = 2
    try:  # snappy codec: decoded by the pure-Python block decoder
        _write_avro_reference(spark, str(d / "part-2.avro"), 4, codec="snappy")
        n_files = 3
    except Exception:
        pass  # JVM snappy unavailable to write the fixture; 2-codec run
    df = readers.read(spark, "avro", str(d))
    assert df.rdd.getNumPartitions() == n_files  # one task per container file
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert len(rows) == 4 * n_files
    if n_files == 3:  # every codec decoded the same 4 logical rows
        assert {r["id"] for r in rows} == {0, 1, 2, 3}
        assert sum(1 for r in rows if r["id"] == 1) == 3
    r1 = next(r for r in rows if r["id"] == 1)
    assert r1["name"] == "name-1" and rows[0]["name"] is None
    assert r1["score"] == 1.25 and r1["flag"] is False
    assert r1["tags"] == ["tag0"] and r1["attrs"] == {"k": 1}
    assert r1["nested"]["a"] == 10 and r1["nested"]["b"] == "inner-1"
    assert r1["color"] == "GREEN"
    assert r1["ts"] == dt.datetime(2023, 11, 14, 22, 13, 20, 1)  # UTC session
    assert r1["day"] == dt.date(1970, 1, 1) + dt.timedelta(days=19_001)
    assert r1["amount"] == Decimal("123.46")


def _reframe_ocf_codec(src: str, dst: str, codec: str) -> None:
    """Rewrite a null-codec OCF with each block recompressed by a stdlib
    codec — canonical JVM-encoded VALUES under spec-framed bzip2/xz
    compression, for when the JVM lacks the jar to write the fixture
    itself (pyspark ships commons-compress but not org.tukaani:xz)."""
    import bz2
    import io
    import lzma

    from datapipeline_scripts_spark.sources.avro_pysource import _TK

    read_long = _TK["read_long"]

    def zz(n: int) -> bytes:  # zigzag-varint encode (spec)
        u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        out = bytearray()
        while True:
            b7 = u & 0x7F
            u >>= 7
            if u:
                out.append(b7 | 0x80)
            else:
                out.append(b7)
                return bytes(out)

    with open(src, "rb") as f:
        meta, sync = _TK["parse_header"](f)
        assert meta.get("avro.codec", b"null") in (b"null", b"")
        rest = io.BytesIO(f.read())
        blocks = []
        while rest.tell() < len(rest.getvalue()):
            n_records = read_long(rest)
            size = read_long(rest)
            payload = rest.read(size)
            assert rest.read(16) == sync
            blocks.append((n_records, payload))
    comp = bz2.compress if codec == "bzip2" else (
        lambda b: lzma.compress(b, format=lzma.FORMAT_XZ)
    )
    meta["avro.codec"] = codec.encode()
    with open(dst, "wb") as g:
        g.write(b"Obj\x01")
        g.write(zz(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            g.write(zz(len(kb)) + kb + zz(len(v)) + v)
        g.write(zz(0))
        g.write(sync)
        for n_records, payload in blocks:
            c = comp(payload)
            g.write(zz(n_records) + zz(len(c)) + c + sync)


def test_avro_python_tier_bzip2_xz_codecs(spark, tmp_path):
    """bzip2/xz OCF blocks decode via stdlib bz2/lzma to the exact rows
    of the null-codec reference file. Fixtures come from the JVM codec
    when its jar is present, else from reframing the JVM-encoded blocks
    under stdlib compression (same values, same spec framing)."""
    base = str(tmp_path / "base.avro")
    _write_avro_reference(spark, base, 5, codec="null")
    expected = sorted(readers.read(spark, "avro", base).collect(),
                      key=lambda r: r["id"])
    for codec in ("bzip2", "xz", "zstandard"):
        fixtures = []
        if codec != "zstandard":  # stdlib-compressed reframe of the JVM blocks
            fixtures.append(str(tmp_path / f"reframed-{codec}.avro"))
            _reframe_ocf_codec(base, fixtures[0], codec)
        try:  # canonical JVM-compressed fixture too, when its jar is present
            fixtures.append(str(tmp_path / f"jvm-{codec}.avro"))
            _write_avro_reference(spark, fixtures[-1], 5, codec=codec)
        except Exception:
            fixtures.pop()
        assert fixtures, f"no fixture could be produced for codec {codec}"
        for fx in fixtures:
            rows = sorted(readers.read(spark, "avro", fx).collect(),
                          key=lambda r: r["id"])
            assert rows == expected, f"{fx} diverged from null-codec rows"


_AVRO_UNION_SCHEMA = """{
  "type": "record", "name": "U", "fields": [
    {"name": "id", "type": "long"},
    {"name": "pick", "type": ["int", "string"]},
    {"name": "num", "type": ["null", "int", "long"]},
    {"name": "mix", "type": ["null", "string", "double"]}
  ]}"""


def test_avro_python_tier_multibranch_unions(spark, tmp_path):
    """Full union coverage per spark-avro's documented mapping:
    [int,string] → struct<member0,member1> (exactly one non-NULL),
    [null,int,long] → nullable long (numeric promotion),
    [null,string,double] → NULLABLE member-struct."""
    from pyspark.sql import types as T

    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(_AVRO_UNION_SCHEMA)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    p = str(tmp_path / "union.avro")
    w.create(sch, jvm.java.io.File(p))
    GR = jvm.org.apache.avro.generic.GenericData.Record
    for i in range(6):
        r = GR(sch)
        r.put("id", i)
        r.put("pick", i * 7 if i % 2 == 0 else f"s-{i}")
        r.put("num", [None, i, 5_000_000_000 + i][i % 3])  # int AND long branch
        r.put("mix", [None, f"m-{i}", i * 2.5][i % 3])
        w.append(r)
    w.close()

    df = readers.read(spark, "avro", p)
    assert df.schema["pick"].dataType == T.StructType([
        T.StructField("member0", T.IntegerType(), True),
        T.StructField("member1", T.StringType(), True),
    ])
    assert df.schema["num"].dataType == T.LongType()
    assert df.schema["mix"].dataType == T.StructType([
        T.StructField("member0", T.StringType(), True),
        T.StructField("member1", T.DoubleType(), True),
    ])
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 6
    assert rows[0]["pick"]["member0"] == 0 and rows[0]["pick"]["member1"] is None
    assert rows[1]["pick"]["member1"] == "s-1" and rows[1]["pick"]["member0"] is None
    assert rows[0]["num"] is None and rows[1]["num"] == 1
    assert rows[2]["num"] == 5_000_000_002  # the long branch
    assert rows[3]["mix"] is None  # null branch → whole struct NULL
    assert rows[4]["mix"]["member0"] == "m-4" and rows[4]["mix"]["member1"] is None
    assert rows[5]["mix"]["member1"] == 12.5 and rows[5]["mix"]["member0"] is None


def test_avro_python_tier_gates_are_loud(spark, sf_dir, tmp_path):
    """Non-Avro bytes, unsupported codecs, and mismatched user schemas
    all fail with actionable errors — never wrong data."""
    from pyspark.sql import types as T

    # a parquet file is not an OCF: bad magic, loud
    with pytest.raises(Exception, match="magic"):
        readers.read(spark, "avro", f"{sf_dir}/nation.parquet")
    p = str(tmp_path / "one.avro")
    _write_avro_reference(spark, p, 2)
    # user schema that disagrees with the writer schema is refused
    with pytest.raises(NotImplementedError, match="writer schema"):
        readers.read_avro(spark, p, schema=T.StructType([T.StructField("id", T.LongType())]))
    # a codec outside the Avro 1.12 spec list: loud remediation
    from datapipeline_scripts_spark.sources.avro_pysource import _TK

    with pytest.raises(NotImplementedError, match="re-encode"):
        _TK["decompress"]("lz4-future", b"\x00")


def test_avro_varint_golden_bytes():
    """Zigzag-varint decode pinned against hand-computed spec bytes."""
    import io

    from datapipeline_scripts_spark.sources.avro_pysource import _TK

    cases = {
        b"\x00": 0,
        b"\x01": -1,
        b"\x02": 1,
        b"\x03": -2,
        b"\x7f": -64,
        b"\x80\x01": 64,
        b"\xfe\x01": 127,
        b"\x80\x02": 128,
        b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01": 2**63 - 1,
        b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01": -(2**63),
    }
    for raw, want in cases.items():
        assert _TK["read_long"](io.BytesIO(raw)) == want, raw


# ---- JDBC: live extract against embedded Derby (round 6) ------------------
#
# pyspark ships the Derby JDBC driver (its Hive-metastore dependency), so
# the "live JDBC extract" path — previously config-builder-only — gets a
# real in-container smoke: create a database, load it over JDBC with the
# WRITE path, then run the PARTITIONED extract and assert both the data
# and the task split. On a real deployment the same `jdbc_options` dict
# points at Postgres/SQL Server (the reference's engines).


def test_jdbc_live_extract_roundtrip_embedded_derby(spark, tmp_path):
    jvm = spark._jvm
    # keep Derby's boot log out of the repo cwd (harmless if already booted)
    jvm.java.lang.System.setProperty("derby.stream.error.file", str(tmp_path / "derby.log"))
    url = f"jdbc:derby:{tmp_path}/smokedb;create=true"
    opts = dict(driver="org.apache.derby.jdbc.EmbeddedDriver", user="app", password="app")

    src = spark.range(0, 1_000).selectExpr(
        "id", "CAST(id % 7 AS INT) AS bucket", "CONCAT('row-', id) AS label"
    )
    src.write.format("jdbc").options(
        url=url, dbtable="EXTRACT_SMOKE", **opts
    ).mode("overwrite").save()

    got = readers.read_jdbc(
        spark,
        readers.jdbc_options(
            url,
            "EXTRACT_SMOKE",
            user="app",
            password="app",
            partition_column="id",
            lower_bound=0,
            upper_bound=1_000,
            num_partitions=4,
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        ),
    )
    assert got.rdd.getNumPartitions() == 4  # the parallel-extract split
    assert got.count() == 1_000
    # value-level roundtrip, not just counts
    assert got.selectExpr(
        "sum(id) AS s", "sum(bucket) AS b", "count(DISTINCT label) AS d"
    ).collect()[0].asDict() == {"s": 499_500, "b": 2_997, "d": 1_000}
    # predicate pushdown reaches the database: only matching rows return
    assert (
        readers.read_jdbc(
            spark, readers.jdbc_options(url, "EXTRACT_SMOKE", "app", "app")
        )
        .filter("bucket = 3")
        .count()
        == 143
    )


def test_avro_python_writer_roundtrips_and_jvm_reads_it(spark, tmp_path):
    """Pure-Python Avro WRITER: rich-typed DataFrame → OCF part-files →
    (a) byte-exact roundtrip through the pure-Python reader, and
    (b) canonical proof: the REAL JVM org.apache.avro DataFileReader
    decodes the same files (writer proven against the spec's reference
    decoder, mirroring how the reader is proven against its encoder)."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from datapipeline_scripts_spark.sources.avro_pysource import write_avro_py

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("flag", T.BooleanType(), False),
        T.StructField("day", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("amount", T.DecimalType(10, 2), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType(), True), True),
        T.StructField("nested", T.StructType([
            T.StructField("a", T.IntegerType(), True),
            T.StructField("b", T.StringType(), True),
        ]), True),
        T.StructField("payload", T.BinaryType(), True),
    ])
    rows = [
        (1, "héllo", 1.5, True, dt.date(2024, 2, 29),
         dt.datetime(2024, 2, 29, 12, 34, 56, 789012), Decimal("123.46"),
         ["a", None, "c"], {"k": 7, "z": -1}, (5, "x"), bytearray(b"\x00\xff")),
        (2, None, -0.25, False, None, None, Decimal("-0.07"),
         [], {}, None, None),
    ]
    df = spark.createDataFrame(rows, schema).repartition(3)
    out_dir = str(tmp_path / "pywrite")
    files = write_avro_py(df, out_dir, codec="deflate")
    assert files and all(f.endswith(".avro") for f in files)

    back = readers.read(spark, "avro", out_dir)
    got = sorted(back.collect(), key=lambda r: r["id"])
    assert got[0]["name"] == "héllo" and got[1]["name"] is None
    assert got[0]["score"] == 1.5 and got[1]["score"] == -0.25
    assert got[0]["day"] == dt.date(2024, 2, 29) and got[1]["day"] is None
    assert got[0]["ts"] == dt.datetime(2024, 2, 29, 12, 34, 56, 789012)
    assert got[0]["amount"] == Decimal("123.46")
    assert got[1]["amount"] == Decimal("-0.07")  # negative two's complement
    assert got[0]["tags"] == ["a", None, "c"] and got[1]["tags"] == []
    assert got[0]["attrs"] == {"k": 7, "z": -1} and got[1]["attrs"] == {}
    assert got[0]["nested"]["a"] == 5 and got[1]["nested"] is None
    assert bytes(got[0]["payload"]) == b"\x00\xff"

    # canonical cross-check: the JVM reference implementation reads it
    jvm = spark._jvm
    seen = {}
    for f in files:
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        while rdr.hasNext():
            rec = rdr.next()
            seen[rec.get("id")] = rec
        rdr.close()
    assert set(seen) == {1, 2}
    r1 = seen[1]
    assert str(r1.get("name")) == "héllo"
    assert r1.get("score") == 1.5 and r1.get("flag") is True
    assert str(r1.get("nested").get("b")) == "x"
    assert [str(x) for x in r1.get("tags") if x is not None] == ["a", "c"]
    assert seen[2].get("name") is None

    # overwrite semantics + empty-frame write stays readable
    with pytest.raises(FileExistsError, match="overwrite"):
        write_avro_py(df, out_dir)
    empty = write_avro_py(df.limit(0), out_dir, mode="overwrite")
    assert len(empty) == 1
    assert readers.read(spark, "avro", out_dir).count() == 0


def test_avro_python_writer_boundary_values(spark, tmp_path):
    """Writer→reader→JVM-reader agreement at the integer boundaries
    where varint/zigzag encoders classically break: 7-bit group edges,
    int32/int64 extremes, decimal precision edges."""
    from decimal import Decimal

    from pyspark.sql import types as T

    from datapipeline_scripts_spark.sources.avro_pysource import write_avro_py

    edges64 = [0, 1, -1, 63, -64, 64, -65, 127, 128, 8191, 8192,
               2**31 - 1, -(2**31), 2**31, -(2**31) - 1, 2**63 - 1, -(2**63)]
    edges32 = [0, 1, -1, 63, -64, 2**31 - 1, -(2**31)]
    rows = [
        (i, v, edges32[i % len(edges32)],
         Decimal("99999999.99") if v > 0 else Decimal("-99999999.99"))
        for i, v in enumerate(edges64)
    ]
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("v64", T.LongType(), False),
        T.StructField("v32", T.IntegerType(), False),
        T.StructField("amt", T.DecimalType(10, 2), False),
    ])
    out = str(tmp_path / "edges")
    write_avro_py(spark.createDataFrame(rows, schema), out, codec="null")
    got = {r["id"]: r for r in readers.read(spark, "avro", out).collect()}
    assert len(got) == len(edges64)
    for i, v in enumerate(edges64):
        assert got[i]["v64"] == v, f"v64 edge {v}"
        assert got[i]["v32"] == edges32[i % len(edges32)]
    jvm = spark._jvm
    import glob as g

    seen = {}
    for f in g.glob(f"{out}/*.avro"):
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        while rdr.hasNext():
            rec = rdr.next()
            seen[rec.get("id")] = rec.get("v64")
        rdr.close()
    assert seen == {i: v for i, v in enumerate(edges64)}


def test_protobuf_wire_boundary_varints():
    """Decoder at the int32/int64/uint extremes and the 10-byte varint
    ceiling (hand-encoded per spec)."""
    from datapipeline_scripts_spark.sources import protobuf_pywire as pw

    def uv(v):  # unsigned LE base-128
        out = bytearray()
        while True:
            if v > 0x7F:
                out.append((v & 0x7F) | 0x80)
                v >>= 7
            else:
                out.append(v)
                return bytes(out)

    def reg_one(ftype):
        return {".m.M": {"kind": "message", "map_entry": False, "fields": [
            {"name": "x", "number": 1, "label": 1, "type": ftype,
             "type_name": None}]}}

    int64 = pw.compile_decoder(".m.M", reg_one(3))
    assert int64(b"\x08" + uv(2**63 - 1)) == (2**63 - 1,)
    assert int64(b"\x08" + uv(2**64 - 2**63)) == (-(2**63),)  # wire = 2's comp
    uint64 = pw.compile_decoder(".m.M", reg_one(4))
    assert uint64(b"\x08" + uv(2**64 - 1)) == (-1,)  # java long wrap
    uint32 = pw.compile_decoder(".m.M", reg_one(13))
    assert uint32(b"\x08" + uv(2**32 - 1)) == (-1,)  # java int wrap
    sint64 = pw.compile_decoder(".m.M", reg_one(18))
    assert sint64(b"\x08" + uv(2**64 - 1)) == (-(2**63),)  # zigzag min
    assert sint64(b"\x08" + uv(2**64 - 2)) == (2**63 - 1,)  # zigzag max
    with pytest.raises(ValueError, match="longer than 10"):
        pw.read_varint(b"\xff" * 11, 0)


def test_avro_write_read_randomized_sweep(spark, tmp_path):
    """Seeded randomized writer→reader roundtrip over the full type
    lattice (300 rows), plus a JVM-reader aggregate cross-check — the
    values property tests would explore, pinned deterministic."""
    import random
    from decimal import Decimal

    from pyspark.sql import types as T

    rng = random.Random(0xA5817)
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("amt", T.DecimalType(18, 4), True),
        T.StructField("arr", T.ArrayType(T.LongType(), True), True),
        T.StructField("m", T.MapType(T.StringType(), T.StringType(), True), True),
    ])

    def maybe(gen, p=0.85):
        return gen() if rng.random() < p else None

    def rand_str():
        return "".join(rng.choice("abčdé日本\U0001F600xyz _") for _ in range(rng.randrange(0, 12)))

    rows = [
        (
            i,
            maybe(lambda: rng.randrange(-(2**63), 2**63)),
            maybe(rand_str),
            maybe(lambda: rng.choice([0.0, -0.0, 1e300, -1e-300, 2.5, float("inf")])),
            maybe(lambda: Decimal(rng.randrange(-(10**14), 10**14)).scaleb(-4)),
            maybe(lambda: [maybe(lambda: rng.randrange(-(2**31), 2**31), 0.9)
                           for _ in range(rng.randrange(0, 5))]),
            maybe(lambda: {rand_str() or "k": maybe(rand_str, 0.9)
                           for _ in range(rng.randrange(0, 4))}),
        )
        for i in range(300)
    ]
    from datapipeline_scripts_spark.sources.avro_pysource import write_avro_py

    out = str(tmp_path / "sweep")
    files = write_avro_py(spark.createDataFrame(rows, schema).repartition(4), out)
    got = {r["id"]: r for r in readers.read(spark, "avro", out).collect()}
    assert len(got) == 300
    for row in rows:
        g = got[row[0]]
        assert g["v"] == row[1] and g["s"] == row[2]
        assert g["d"] == row[3] or (g["d"] != g["d"] and row[3] != row[3])
        assert g["amt"] == row[4]
        assert g["arr"] == row[5] and g["m"] == row[6]
    # canonical aggregate cross-check: JVM reader sees the same id-sum
    # and non-null long-sum
    jvm = spark._jvm
    id_sum = v_sum = n = 0
    for f in files:
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        while rdr.hasNext():
            rec = rdr.next()
            n += 1
            id_sum += rec.get("id")
            v = rec.get("v")
            if v is not None:
                v_sum = (v_sum + v) % (2**61 - 1)
        rdr.close()
    assert n == 300 and id_sum == sum(r[0] for r in rows)
    assert v_sum == sum(r[1] for r in rows if r[1] is not None) % (2**61 - 1)


def test_write_avro_two_tier_dispatch(spark, tmp_path):
    """readers.write_avro lands on the pure-Python tier here (no
    spark-avro jar) and mode='error' refuses an existing directory
    without falling through to a double-write."""
    df = spark.range(5).selectExpr("id", "CONCAT('n-', id) AS name")
    out = str(tmp_path / "sink")
    readers.write_avro(df, out)
    assert readers.read(spark, "avro", out).count() == 5
    with pytest.raises(Exception, match="(?i)exists"):
        readers.write_avro(df, out)
    readers.write_avro(df.limit(2), out, mode="overwrite", codec="null")
    assert readers.read(spark, "avro", out).count() == 2


def test_snappy_block_golden_bytes():
    """Pure-Python snappy block decode pinned against hand-computed
    spec bytes: literal, overlapping 1-byte-offset copy (pattern
    repeat), 60-escape long literal, 2-byte-offset copy."""
    from datapipeline_scripts_spark.sources.avro_pysource import _TK

    sd = _TK["snappy_decompress"]
    # 12-byte preamble | literal "abc" | copy off=3 len=9 (overlaps itself)
    assert sd(b"\x0c" + b"\x08abc" + b"\x15\x03") == b"abcabcabcabc"
    # 70-byte preamble | 64-byte literal via the v=60 escape | copy off=64 len=6
    lit = bytes(range(64))
    assert sd(b"\x46" + b"\xf0\x3f" + lit + b"\x16\x40\x00") == lit + lit[:6]
    with pytest.raises(ValueError, match="length mismatch"):
        sd(b"\x05" + b"\x08abc")  # header promises 5, stream yields 3


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


# ---- Protobuf: pure-Python wire tier (round 6) -----------------------------
#
# The spark-protobuf CONNECTOR is absent and this image's google.protobuf
# is broken, but the ORC jars inside pyspark shade the REAL protobuf-java
# runtime — so the tests build descriptors and DynamicMessages through it
# (via py4j) and decode the canonical wire bytes with the pure-Python tier,
# the same encoder-vs-decoder strategy as the Avro tests above.


def _pb(jvm):
    return jvm.org.apache.orc.protobuf


def _build_rich_descriptor(spark):
    """FileDescriptorProto for: enum Color; message Inner{int32 a=1;
    string b=2}; message Rich{<every scalar type> + enum + nested +
    repeated packed/unpacked + map<string,int64>} (proto3)."""
    jvm = spark._jvm
    DP = _pb(jvm).DescriptorProtos
    FT = DP.FieldDescriptorProto.Type
    FL = DP.FieldDescriptorProto.Label

    def add_field(b, name, num, ftype, label=None, type_name=None):
        f = DP.FieldDescriptorProto.newBuilder()
        f.setName(name)
        f.setNumber(num)
        f.setType(ftype)
        f.setLabel(label or FL.LABEL_OPTIONAL)
        if type_name:
            f.setTypeName(type_name)
        b.addField(f)

    fdp = DP.FileDescriptorProto.newBuilder()
    fdp.setName("rich.proto")
    fdp.setPackage("t")
    fdp.setSyntax("proto3")

    en = DP.EnumDescriptorProto.newBuilder()
    en.setName("Color")
    for i, s in enumerate(("RED", "GREEN", "BLUE")):
        ev = DP.EnumValueDescriptorProto.newBuilder()
        ev.setName(s)
        ev.setNumber(i)
        en.addValue(ev)
    fdp.addEnumType(en)

    inner = DP.DescriptorProto.newBuilder()
    inner.setName("Inner")
    add_field(inner, "a", 1, FT.TYPE_INT32)
    add_field(inner, "b", 2, FT.TYPE_STRING)
    fdp.addMessageType(inner)

    rich = DP.DescriptorProto.newBuilder()
    rich.setName("Rich")
    entry = DP.DescriptorProto.newBuilder()
    entry.setName("AttrsEntry")
    mo = DP.MessageOptions.newBuilder()
    mo.setMapEntry(True)
    entry.setOptions(mo)
    add_field(entry, "key", 1, FT.TYPE_STRING)
    add_field(entry, "value", 2, FT.TYPE_INT64)
    rich.addNestedType(entry)
    scalars = [
        ("d", 1, FT.TYPE_DOUBLE), ("f", 2, FT.TYPE_FLOAT),
        ("i32", 3, FT.TYPE_INT32), ("i64", 4, FT.TYPE_INT64),
        ("u32", 5, FT.TYPE_UINT32), ("u64", 6, FT.TYPE_UINT64),
        ("s32", 7, FT.TYPE_SINT32), ("s64", 8, FT.TYPE_SINT64),
        ("fx32", 9, FT.TYPE_FIXED32), ("fx64", 10, FT.TYPE_FIXED64),
        ("sf32", 11, FT.TYPE_SFIXED32), ("sf64", 12, FT.TYPE_SFIXED64),
        ("flag", 13, FT.TYPE_BOOL), ("name", 14, FT.TYPE_STRING),
        ("payload", 15, FT.TYPE_BYTES),
    ]
    for nm, num, ft in scalars:
        add_field(rich, nm, num, ft)
    add_field(rich, "color", 16, FT.TYPE_ENUM, type_name=".t.Color")
    add_field(rich, "inner", 17, FT.TYPE_MESSAGE, type_name=".t.Inner")
    add_field(rich, "nums", 18, FT.TYPE_INT64, label=FL.LABEL_REPEATED)
    add_field(rich, "labels", 19, FT.TYPE_STRING, label=FL.LABEL_REPEATED)
    add_field(rich, "attrs", 20, FT.TYPE_MESSAGE, label=FL.LABEL_REPEATED,
              type_name=".t.Rich.AttrsEntry")
    # repeated message + int-keyed map + message-valued map
    add_field(rich, "inners", 21, FT.TYPE_MESSAGE, label=FL.LABEL_REPEATED,
              type_name=".t.Inner")
    scores = DP.DescriptorProto.newBuilder()
    scores.setName("ScoresEntry")
    mo2 = DP.MessageOptions.newBuilder()
    mo2.setMapEntry(True)
    scores.setOptions(mo2)
    add_field(scores, "key", 1, FT.TYPE_INT32)
    add_field(scores, "value", 2, FT.TYPE_DOUBLE)
    rich.addNestedType(scores)
    add_field(rich, "scores", 22, FT.TYPE_MESSAGE, label=FL.LABEL_REPEATED,
              type_name=".t.Rich.ScoresEntry")
    objs = DP.DescriptorProto.newBuilder()
    objs.setName("ObjsEntry")
    mo3 = DP.MessageOptions.newBuilder()
    mo3.setMapEntry(True)
    objs.setOptions(mo3)
    add_field(objs, "key", 1, FT.TYPE_STRING)
    add_field(objs, "value", 2, FT.TYPE_MESSAGE, type_name=".t.Inner")
    rich.addNestedType(objs)
    add_field(rich, "objs", 23, FT.TYPE_MESSAGE, label=FL.LABEL_REPEATED,
              type_name=".t.Rich.ObjsEntry")
    fdp.addMessageType(rich)
    return fdp.build()


def _encode_rich_fixture(spark, tmp_path):
    """→ (desc_path, [row0_bytes (all fields set), row1_bytes (empty)])
    encoded by the canonical protobuf-java runtime."""
    jvm = spark._jvm
    pb = _pb(jvm)
    fdp = _build_rich_descriptor(spark)
    desc_set = pb.DescriptorProtos.FileDescriptorSet.newBuilder().addFile(fdp).build()
    desc_path = str(tmp_path / "rich.desc")
    with open(desc_path, "wb") as fh:
        fh.write(bytes(desc_set.toByteArray()))

    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp, arr)
    rich = fd.findMessageTypeByName("Rich")

    # py4j auto-unboxes java.lang.Float/Long returns back into Python,
    # so reflection setField can't be fed typed wrappers — TextFormat
    # parses the canonical text rendering with correct field typing.
    text = """
    d: 1.5
    f: 1.25
    i32: -7
    i64: -1099511627776
    u32: 4000000000
    u64: 9223372036854775813
    s32: -3
    s64: -34359738368
    fx32: 4000000001
    fx64: 9223372036854775815
    sf32: -9
    sf64: -2199023255552
    flag: true
    name: "h\\xc3\\xa9llo"
    payload: "\\000\\001\\377"
    color: GREEN
    inner { a: 5 b: "x" }
    nums: 1 nums: -2 nums: 3
    labels: "alpha" labels: "beta"
    attrs { key: "k1" value: 10 }
    attrs { key: "k2" value: -20 }
    inners { a: 1 b: "p" }
    inners { a: 2 b: "q" }
    scores { key: 3 value: 0.5 }
    scores { key: -4 value: -2.5 }
    objs { key: "o1" value { a: 9 b: "z" } }
    """
    b = pb.DynamicMessage.newBuilder(rich)
    pb.TextFormat.merge(text, b)
    full = bytes(b.build().toByteArray())
    empty = bytes(pb.DynamicMessage.newBuilder(rich).build().toByteArray())
    return desc_path, [full, empty]


def test_protobuf_python_tier_decodes_canonical_wire(spark, tmp_path):
    """protobuf-java-encoded messages → pure-Python tier: every scalar
    type (incl. unsigned wrap semantics), enum symbol, nested message,
    packed repeated, map field, proto3 defaults on an empty message,
    and unknown-field skipping."""
    from pyspark.sql import types as T

    desc_path, (full, empty) = _encode_rich_fixture(spark, tmp_path)
    # unknown fields must be skipped by wire type: append field 99
    # (varint 1) and field 98 (LEN "zz") to the full message
    def uvarint(v):
        out = bytearray()
        while True:
            if v > 0x7F:
                out.append((v & 0x7F) | 0x80)
                v >>= 7
            else:
                out.append(v)
                return bytes(out)

    full_plus = (full + uvarint(99 << 3) + b"\x01"
                 + uvarint((98 << 3) | 2) + b"\x02zz")
    df = spark.createDataFrame(
        [(0, bytearray(full_plus)), (1, bytearray(empty)), (2, None)],
        "id long, data binary",
    )
    out = readers.protobuf_decode(df, "data", "Rich", desc_path)
    assert out.schema["data"].dataType["u32"].dataType == T.IntegerType()
    assert out.schema["data"].dataType["u64"].dataType == T.LongType()
    assert out.schema["data"].dataType["attrs"].dataType == T.MapType(
        T.StringType(), T.LongType(), True
    )
    rows = {r["id"]: r["data"] for r in out.collect()}
    r = rows[0]
    assert r["d"] == 1.5 and r["f"] == 1.25
    assert r["i32"] == -7 and r["i64"] == -(2**40)
    assert r["u32"] == 4_000_000_000 - (1 << 32)  # two's-complement holder
    assert r["u64"] == (2**63 + 5) - (1 << 64)
    assert r["s32"] == -3 and r["s64"] == -(2**35)
    assert r["fx32"] == 4_000_000_001 - (1 << 32)
    assert r["fx64"] == (2**63 + 7) - (1 << 64)
    assert r["sf32"] == -9 and r["sf64"] == -(2**41)
    assert r["flag"] is True and r["name"] == "héllo"
    assert bytes(r["payload"]) == b"\x00\x01\xff"
    assert r["color"] == "GREEN"
    assert r["inner"]["a"] == 5 and r["inner"]["b"] == "x"
    assert r["nums"] == [1, -2, 3]  # protobuf-java packs these (proto3)
    assert r["labels"] == ["alpha", "beta"]
    assert r["attrs"] == {"k1": 10, "k2": -20}
    assert [tuple(x) for x in r["inners"]] == [(1, "p"), (2, "q")]
    assert r["scores"] == {3: 0.5, -4: -2.5}
    assert set(r["objs"]) == {"o1"}
    assert tuple(r["objs"]["o1"]) == (9, "z")
    e = rows[1]  # proto3 defaults materialize; sub-message is NULL
    assert e["d"] == 0.0 and e["i64"] == 0 and e["flag"] is False
    assert e["name"] == "" and bytes(e["payload"]) == b""
    assert e["color"] == "RED" and e["inner"] is None
    assert e["nums"] == [] and e["attrs"] == {}
    assert e["inners"] == [] and e["scores"] == {} and e["objs"] == {}
    assert rows[2] is None  # NULL binary stays NULL


def test_protobuf_wire_golden_bytes():
    """Wire decode pinned against hand-computed spec bytes — including
    protobuf.dev's canonical `08 96 01` = field 1, varint 150."""
    from datapipeline_scripts_spark.sources import protobuf_pywire as pw

    def reg_one(ftype, type_name=None, label=1, extra=None):
        reg = {".m.M": {"kind": "message", "map_entry": False, "fields": [
            {"name": "x", "number": 1, "label": label, "type": ftype,
             "type_name": type_name}]}}
        reg.update(extra or {})
        return reg

    assert pw.compile_decoder(".m.M", reg_one(5))(b"\x08\x96\x01") == (150,)
    # int32 -2 arrives as a 10-byte two's-complement varint
    neg2 = b"\x08" + b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    assert pw.compile_decoder(".m.M", reg_one(5))(neg2) == (-2,)
    # sint32 zigzag: wire 1 → -1
    assert pw.compile_decoder(".m.M", reg_one(17))(b"\x08\x01") == (-1,)
    # fixed32 little-endian, i32 wire type
    assert pw.compile_decoder(".m.M", reg_one(7))(b"\x0d\x01\x00\x00\x80") == (
        -(2**31) + 1,
    )
    # packed repeated int64: LEN of three varints
    assert pw.compile_decoder(".m.M", reg_one(3, label=3))(
        b"\x0a\x03\x01\x02\x03"
    ) == ([1, 2, 3],)
    # groups raise loudly; truncation raises loudly
    with pytest.raises(NotImplementedError, match="group"):
        list(pw.iter_records(b"\x0b"))
    with pytest.raises(ValueError, match="truncated"):
        list(pw.iter_records(b"\x08"))
    with pytest.raises(ValueError, match="descriptor"):
        pw.parse_descriptor_set(b"")


def test_protobuf_randomized_scalar_sweep(spark, tmp_path):
    """Seeded randomized values through the canonical protobuf-java
    encoder (TextFormat) and back through the pure-Python tier — 60
    messages sweeping the full signed/unsigned/zigzag/fixed ranges."""
    import random

    jvm = spark._jvm
    pb = _pb(jvm)
    fdp = _build_rich_descriptor(spark)
    desc_set = pb.DescriptorProtos.FileDescriptorSet.newBuilder().addFile(fdp).build()
    desc_path = str(tmp_path / "rich.desc")
    with open(desc_path, "wb") as fh:
        fh.write(bytes(desc_set.toByteArray()))
    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp, arr)
    rich = fd.findMessageTypeByName("Rich")

    rng = random.Random(0xBEEF06)
    expected = []
    blobs = []
    for i in range(60):
        i32 = rng.randrange(-(2**31), 2**31)
        i64 = rng.randrange(-(2**63), 2**63)
        u32 = rng.randrange(0, 2**32)
        u64 = rng.randrange(0, 2**64)
        s32 = rng.randrange(-(2**31), 2**31)
        s64 = rng.randrange(-(2**63), 2**63)
        nums = [rng.randrange(-(2**63), 2**63) for _ in range(rng.randrange(0, 6))]
        text = (f"i32: {i32} i64: {i64} u32: {u32} u64: {u64} "
                f"s32: {s32} s64: {s64} "
                + " ".join(f"nums: {v}" for v in nums))
        b = pb.DynamicMessage.newBuilder(rich)
        pb.TextFormat.merge(text, b)
        blobs.append((i, bytearray(bytes(b.build().toByteArray()))))
        expected.append({
            "i32": i32, "i64": i64,
            "u32": u32 - (1 << 32) if u32 >= 1 << 31 else u32,  # java int wrap
            "u64": u64 - (1 << 64) if u64 >= 1 << 63 else u64,  # java long wrap
            "s32": s32, "s64": s64, "nums": nums,
        })
    df = spark.createDataFrame(blobs, "id long, data binary")
    out = readers.protobuf_decode(df, "data", "Rich", desc_path)
    rows = {r["id"]: r["data"] for r in out.collect()}
    assert len(rows) == 60
    for i, want in enumerate(expected):
        got = rows[i]
        for k, v in want.items():
            assert got[k] == v, (i, k, v, got[k])


# ---- ADVICE r06 closures (round 7) -----------------------------------------


def test_connector_absent_classifier_narrows_fallback():
    """The two-tier fallback in read_avro/protobuf_decode/write_avro
    triggers ONLY on missing-connector signatures (ADVICE r06 medium):
    genuine failures — IO errors, mid-job aborts, already-exists
    refusals — classify as NOT absent and re-raise."""

    class Cond(Exception):
        def __init__(self, msg, cond=None):
            super().__init__(msg)
            self._c = cond

        def getCondition(self):
            return self._c

    absent = [
        Cond("Failed to find data source: avro. Avro is built-in but external"),
        Cond("boom", "_LEGACY_ERROR_TEMP_1139"),
        Cond("boom", "DATA_SOURCE_NOT_FOUND"),
        Cond("cannot call FROM_PROTOBUF", "PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE"),
        Cond("java.lang.ClassNotFoundException: org.apache.spark.sql.avro.AvroFileFormat"),
        ImportError("No module named 'pyspark.sql.protobuf'"),
    ]
    genuine = [
        Cond("Job aborted due to stage failure: disk quota exceeded"),
        Cond("path file:/x/out already exists.", "PATH_ALREADY_EXISTS"),
        FileNotFoundError("/tmp/nope.desc"),
        Cond("Malformed records are detected in record parsing"),
        PermissionError("denied"),
    ]
    for e in absent:
        assert readers._connector_absent(e), e
    for e in genuine:
        assert not readers._connector_absent(e), e


def test_protobuf_decode_missing_desc_is_loud(spark, tmp_path):
    """A bad desc path is a genuine failure: FileNotFoundError surfaces
    instead of being silently rerouted through the Python tier."""
    df = spark.createDataFrame([(bytearray(b"\x08\x01"),)], "data binary")
    with pytest.raises(FileNotFoundError):
        readers.protobuf_decode(df, "data", "M", str(tmp_path / "nope.desc"))


def test_read_avro_corrupt_file_is_loud(spark, tmp_path):
    """Garbage bytes behind a .avro name: the Python tier refuses with
    the bad-magic error (never silent wrong data)."""
    bad = tmp_path / "bad.avro"
    bad.write_bytes(b"this is definitely not an avro container file")
    with pytest.raises(Exception, match="magic|Avro"):
        readers.read_avro(spark, str(bad)).collect()


def test_write_avro_py_save_modes(spark, tmp_path):
    """All four DataFrameWriter save modes behave per spec in the pure
    Python tier (ADVICE r06 low): ignore no-ops, append adds run-unique
    part files, errorifexists aliases error, unknown modes are loud."""
    from datapipeline_scripts_spark.sources.avro_pysource import (
        read_avro_py,
        write_avro_py,
    )

    df = spark.range(5).selectExpr("id", "cast(id as string) AS s")
    tgt = str(tmp_path / "modes")
    write_avro_py(df, tgt, codec="null", mode="error")
    with pytest.raises(FileExistsError):
        write_avro_py(df, tgt, codec="null", mode="errorifexists")
    assert write_avro_py(df, tgt, codec="null", mode="ignore") == []
    assert read_avro_py(spark, tgt).count() == 5

    files = write_avro_py(df, tgt, codec="null", mode="append")
    assert files and all(os.path.exists(f) for f in files)
    appended = read_avro_py(spark, tgt)
    assert appended.count() == 10
    assert appended.groupBy("id").count().filter("count != 2").count() == 0

    write_avro_py(spark.range(3).selectExpr("id", "'x' AS s"), tgt, codec="null", mode="overwrite")
    assert read_avro_py(spark, tgt).count() == 3
    with pytest.raises(ValueError, match="save mode"):
        write_avro_py(df, tgt, mode="bogus")


_AVRO_XNS_SCHEMA = """{
  "type": "record", "name": "Top", "namespace": "com.ex", "fields": [
    {"name": "first", "type": {"type": "record", "name": "Pt", "fields": [
        {"name": "x", "type": "int"}]}},
    {"name": "second", "type": "com.ex.Pt"},
    {"name": "other", "type": {"type": "record", "name": "Q",
        "namespace": "org.other", "fields": [
        {"name": "p", "type": "com.ex.Pt"}]}},
    {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}},
    {"name": "fx2", "type": "com.ex.F4"}
  ]}"""


def test_avro_fullname_references_across_namespaces(spark, tmp_path):
    """avro-java emits FULLNAME type references when a reference crosses
    a namespace context (here: org.other.Q referencing com.ex.Pt, and
    top-level reuse of com.ex.Pt / com.ex.F4). ADVICE r06: schema
    inference previously failed on these even though the decoder could
    read the file; both sides now resolve fullnames identically."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(_AVRO_XNS_SCHEMA)
    pt_sch = sch.getField("first").schema()
    q_sch = sch.getField("other").schema()
    fx_sch = sch.getField("fx").schema()
    path = str(tmp_path / "xns.avro")
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    w.create(sch, jvm.java.io.File(path))
    GR = jvm.org.apache.avro.generic.GenericData.Record
    for i in range(4):
        r = GR(sch)
        p1 = GR(pt_sch)
        p1.put("x", i)
        r.put("first", p1)
        p2 = GR(pt_sch)
        p2.put("x", 100 + i)
        r.put("second", p2)
        qq = GR(q_sch)
        p3 = GR(pt_sch)
        p3.put("x", 200 + i)
        qq.put("p", p3)
        r.put("other", qq)
        r.put("fx", jvm.org.apache.avro.generic.GenericData.Fixed(
            fx_sch, bytearray([i, i + 1, i + 2, i + 3])))
        r.put("fx2", jvm.org.apache.avro.generic.GenericData.Fixed(
            fx_sch, bytearray([9, 9, 9, i])))
        w.append(r)
    w.close()

    out = readers.read_avro(spark, path)
    assert out.schema["second"].dataType == out.schema["first"].dataType
    rows = sorted(out.collect(), key=lambda r: r["first"]["x"])
    assert len(rows) == 4
    for i, row in enumerate(rows):
        assert row["first"]["x"] == i
        assert row["second"]["x"] == 100 + i
        assert row["other"]["p"]["x"] == 200 + i
        assert bytes(row["fx"]) == bytes([i, i + 1, i + 2, i + 3])
        assert bytes(row["fx2"]) == bytes([9, 9, 9, i])


def _build_presence_descriptors(spark):
    """Two FileDescriptorProtos: proto3 `Pick` (a real oneof, a proto3
    `optional`, and an implicit-presence int32) and proto2 `Defaults`
    (declared defaults across scalar/string/bytes/enum/uint32)."""
    jvm = spark._jvm
    pb = _pb(jvm)
    DP = pb.DescriptorProtos
    FT = DP.FieldDescriptorProto.Type
    FL = DP.FieldDescriptorProto.Label

    def field(name, num, ftype, oneof=None, p3opt=False, default=None, type_name=None):
        f = DP.FieldDescriptorProto.newBuilder()
        f.setName(name)
        f.setNumber(num)
        f.setType(ftype)
        f.setLabel(FL.LABEL_OPTIONAL)
        if oneof is not None:
            f.setOneofIndex(oneof)
        if p3opt:
            f.setProto3Optional(True)
        if default is not None:
            f.setDefaultValue(default)
        if type_name:
            f.setTypeName(type_name)
        return f

    p3 = DP.FileDescriptorProto.newBuilder()
    p3.setName("pick.proto")
    p3.setPackage("p")
    p3.setSyntax("proto3")
    pick = DP.DescriptorProto.newBuilder()
    pick.setName("Pick")
    od = DP.OneofDescriptorProto.newBuilder()
    od.setName("pick")
    pick.addOneofDecl(od)
    od2 = DP.OneofDescriptorProto.newBuilder()
    od2.setName("_oz")
    pick.addOneofDecl(od2)
    pick.addField(field("x", 1, FT.TYPE_INT32, oneof=0))
    pick.addField(field("y", 2, FT.TYPE_STRING, oneof=0))
    pick.addField(field("oz", 3, FT.TYPE_INT64, oneof=1, p3opt=True))
    pick.addField(field("plain", 4, FT.TYPE_INT32))
    p3.addMessageType(pick)

    p2 = DP.FileDescriptorProto.newBuilder()
    p2.setName("defaults.proto")
    p2.setPackage("d")  # no syntax => proto2
    en = DP.EnumDescriptorProto.newBuilder()
    en.setName("Col")
    for i, s in enumerate(("NONE", "GREEN", "BLUE")):
        ev = DP.EnumValueDescriptorProto.newBuilder()
        ev.setName(s)
        ev.setNumber(i)
        en.addValue(ev)
    p2.addEnumType(en)
    dm = DP.DescriptorProto.newBuilder()
    dm.setName("Defaults")
    dm.addField(field("di", 1, FT.TYPE_INT32, default="42"))
    dm.addField(field("ds", 2, FT.TYPE_STRING, default="hey"))
    dm.addField(field("db", 3, FT.TYPE_BYTES, default="\\001\\377"))
    dm.addField(field("dd", 4, FT.TYPE_DOUBLE, default="-1.5"))
    dm.addField(field("du", 5, FT.TYPE_UINT32, default="4000000000"))
    dm.addField(field("de", 6, FT.TYPE_ENUM, default="GREEN", type_name=".d.Col"))
    dm.addField(field("dbo", 7, FT.TYPE_BOOL, default="true"))
    dm.addField(field("bare", 8, FT.TYPE_INT32))
    p2.addMessageType(dm)
    return p3.build(), p2.build()


def test_protobuf_oneof_and_proto3_optional_presence(spark, tmp_path):
    """ADVICE r06 medium: oneof members and proto3 `optional`s are
    presence-tracked — absent means NULL, never a zero-default — and
    setting one oneof member clears the group's others (last-set-wins
    ACROSS the oneof, matching protobuf-java setter semantics).
    Implicit-presence proto3 fields keep zero-defaults."""
    jvm = spark._jvm
    pb = _pb(jvm)
    p3, p2 = _build_presence_descriptors(spark)
    desc_set = pb.DescriptorProtos.FileDescriptorSet.newBuilder().addFile(p3).addFile(p2).build()
    desc_path = str(tmp_path / "presence.desc")
    with open(desc_path, "wb") as fh:
        fh.write(bytes(desc_set.toByteArray()))

    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(p3, arr)
    pick = fd.findMessageTypeByName("Pick")

    def enc(text):
        b = pb.DynamicMessage.newBuilder(pick)
        pb.TextFormat.merge(text, b)
        return bytes(b.build().toByteArray())

    blobs = [
        (0, bytearray(enc(""))),                 # nothing set
        (1, bytearray(enc("x: 7"))),             # oneof member x
        (2, bytearray(enc('y: "hi"'))),          # oneof member y
        (3, bytearray(enc("oz: 5 plain: 9"))),   # proto3 optional + implicit
        # hand-framed wire with BOTH members (java never emits this):
        # x first then y  => y wins, x is NULL
        (4, bytearray(b"\x08\x07" + b"\x12\x02hi")),
        # y first then x  => x wins, y is NULL
        (5, bytearray(b"\x12\x02hi" + b"\x08\x07")),
    ]
    df = spark.createDataFrame(blobs, "id long, data binary")
    out = readers.protobuf_decode(df, "data", "Pick", desc_path)
    rows = {r["id"]: r["data"] for r in out.collect()}
    assert rows[0] == (None, None, None, 0)
    assert rows[1] == (7, None, None, 0)
    assert rows[2] == (None, "hi", None, 0)
    assert rows[3] == (None, None, 5, 9)
    assert rows[4] == (None, "hi", None, 0)
    assert rows[5] == (7, None, None, 0)


def test_protobuf_proto2_declared_defaults(spark, tmp_path):
    """ADVICE r06 medium: absent proto2 fields materialize their
    DECLARED defaults (int/string/C-escaped bytes/double/wrapped
    uint32/enum symbol/bool), cross-checked against protobuf-java's
    own getField defaults on the same descriptor."""
    jvm = spark._jvm
    pb = _pb(jvm)
    p3, p2 = _build_presence_descriptors(spark)
    desc_set = pb.DescriptorProtos.FileDescriptorSet.newBuilder().addFile(p3).addFile(p2).build()
    desc_path = str(tmp_path / "defaults.desc")
    with open(desc_path, "wb") as fh:
        fh.write(bytes(desc_set.toByteArray()))

    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(p2, arr)
    dmt = fd.findMessageTypeByName("Defaults")
    empty = bytes(pb.DynamicMessage.newBuilder(dmt).build().toByteArray())
    # protobuf-java's own holder values for the absent fields
    inst = pb.DynamicMessage.getDefaultInstance(dmt)
    java_di = inst.getField(dmt.findFieldByName("di"))
    java_db = bytes(inst.getField(dmt.findFieldByName("db")).toByteArray())
    java_du = inst.getField(dmt.findFieldByName("du"))
    assert java_di == 42 and java_db == b"\x01\xff" and java_du == -294967296

    df = spark.createDataFrame([(0, bytearray(empty)), (1, bytearray(b"\x08\x05"))],
                               "id long, data binary")
    out = readers.protobuf_decode(df, "data", "Defaults", desc_path)
    rows = {r["id"]: r["data"] for r in out.collect()}
    assert rows[0] == (42, "hey", b"\x01\xff", -1.5, -294967296, "GREEN", True, 0)
    assert rows[1] == (5, "hey", b"\x01\xff", -1.5, -294967296, "GREEN", True, 0)


# ---- tier-1 / tier-2 equivalence (VERDICT r6 item 3) ------------------------
#
# The JVM spark-avro / spark-protobuf connectors are NOT on this
# container's classpath, so these tests skip here — but on any cluster
# (or future sandbox) where the jars ARE present, they pin that both
# tiers decode the same files to identical (schema, values). Run with:
#   pyspark --packages org.apache.spark:spark-avro_2.13:<ver>,\
#                      org.apache.spark:spark-protobuf_2.13:<ver>


def _spark_avro_present(spark) -> bool:
    try:
        spark.read.format("avro").schema("x int").load("/nonexistent-avro-probe")
        return True  # unreachable: a present connector raises PATH_NOT_FOUND
    except Exception as exc:  # noqa: BLE001 - classifying, not handling
        return not readers._connector_absent(exc)


def _spark_protobuf_present(spark, desc_path: str) -> bool:
    try:
        from pyspark.sql.protobuf.functions import from_protobuf
    except ImportError:
        return False
    try:
        df = spark.createDataFrame([(bytearray(b""),)], "data binary")
        df.withColumn("data", from_protobuf(df["data"], "Rich", descFilePath=desc_path)).schema
        return True
    except Exception as exc:  # noqa: BLE001 - classifying, not handling
        return not readers._connector_absent(exc)


def _rows_canon(df):
    """Collected rows → sorted list of plain-Python tuples (Row → dict
    for structs, bytes normalized) so tier outputs compare exactly."""
    def norm(v):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        if hasattr(v, "asDict"):  # Row
            return tuple((f, norm(x)) for f, x in v.asDict().items())
        return v
    return sorted(repr(tuple(norm(v) for v in r)) for r in df.collect())


def test_avro_tier_equivalence_when_connector_present(spark, tmp_path):
    """spark-avro vs the pure-Python OCF tier on the SAME files (rich
    schema incl. logical types + cross-namespace fullname refs): equal
    schemas, equal values. Skips unless the connector is on the
    classpath (VERDICT r6 item 3 — a union/logical-type divergence
    would otherwise only surface on a real cluster)."""
    if not _spark_avro_present(spark):
        pytest.skip("spark-avro connector not on the classpath")
    from datapipeline_scripts_spark.sources.avro_pysource import read_avro_py

    rich = str(tmp_path / "rich.avro")
    _write_avro_reference(spark, rich, 25, codec="deflate")
    for path in (rich,):
        jvm_df = spark.read.format("avro").load(path)
        py_df = read_avro_py(spark, path)
        assert py_df.schema == jvm_df.schema, (path, py_df.schema, jvm_df.schema)
        assert _rows_canon(py_df) == _rows_canon(jvm_df), path


def test_protobuf_tier_equivalence_when_connector_present(spark, tmp_path):
    """from_protobuf vs the pure-Python wire tier on the SAME blobs
    (every scalar type, enum, nested, packed repeated, maps, presence
    tracking): equal schemas, equal values. Skips unless the
    spark-protobuf module is on the classpath."""
    desc_path, blobs = _encode_rich_fixture(spark, tmp_path)
    if not _spark_protobuf_present(spark, desc_path):
        pytest.skip("spark-protobuf module not on the classpath")
    from pyspark.sql.protobuf.functions import from_protobuf

    from datapipeline_scripts_spark.sources.protobuf_pywire import decode_protobuf_py

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)], "id long, data binary"
    )
    jvm_df = df.withColumn("data", from_protobuf(df["data"], "Rich", descFilePath=desc_path))
    py_df = decode_protobuf_py(df, "data", "Rich", desc_path)
    assert py_df.schema == jvm_df.schema
    assert _rows_canon(py_df) == _rows_canon(jvm_df)


def test_avro_heterogeneous_directory_is_loud(spark, tmp_path):
    """Two container files with DIFFERENT writer schemas in one
    directory: each file decodes by its own schema, so without a guard
    the second file's values would silently land under the first
    file's column labels. The Python tier must refuse loudly (the JVM
    connector applies reader-schema resolution; this tier has none)."""
    from datapipeline_scripts_spark.sources.avro_pysource import (
        read_avro_py,
        write_avro_py,
    )

    d = str(tmp_path / "hetero")
    write_avro_py(
        spark.range(3).selectExpr("id", "cast(id as string) AS s"),
        d, codec="null", mode="error",
    )
    # same column COUNT, different names/types: the nastiest silent case
    write_avro_py(
        spark.range(3).selectExpr("cast(id as string) AS z", "id AS q"),
        d, codec="null", mode="append",
    )
    with pytest.raises(Exception, match="writer schema differs"):
        read_avro_py(spark, d).collect()
    # homogeneous multi-file directories still read fine
    d2 = str(tmp_path / "homo")
    write_avro_py(
        spark.range(4).repartition(2).selectExpr("id", "cast(id as string) AS s"),
        d2, codec="null", mode="error",
    )
    assert read_avro_py(spark, d2).count() == 4


# ---- ADVICE r07 closures (round 8) -----------------------------------------


def test_connector_absent_cnfe_anchored_to_connector_classes():
    """ADVICE r07: a ClassNotFoundException only means connector-absent
    when the missing class IS the connector. A mid-job CNFE for an
    unrelated class (codec shim, filesystem impl, UDF dependency) is a
    deployment fault and must re-raise, not reroute to the slow tier."""

    class Cond(Exception):
        pass

    absent = [
        Cond("java.lang.ClassNotFoundException: org.apache.spark.sql.avro.AvroFileFormat"),
        Cond("java.lang.ClassNotFoundException: org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"),
        Cond("java.lang.ClassNotFoundException: org.apache.spark.sql.v2.avro.AvroScan"),
    ]
    genuine = [
        Cond("java.lang.ClassNotFoundException: com.hadoop.compression.lzo.LzoCodec"),
        Cond("java.lang.ClassNotFoundException: org.apache.hadoop.fs.s3a.S3AFileSystem"),
        Cond("Job aborted: java.lang.ClassNotFoundException: com.example.MyUdfDep"),
    ]
    for e in absent:
        assert readers._connector_absent(e), e
    for e in genuine:
        assert not readers._connector_absent(e), e


def _write_jvm_avro_simple(spark, path: str, schema_json: str, ids) -> None:
    """One OCF file via the canonical JVM encoder, schema supplied
    verbatim (so tests control doc/aliases/defaults attributes)."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    w.create(sch, jvm.java.io.File(path))
    GR = jvm.org.apache.avro.generic.GenericData.Record
    for i in ids:
        r = GR(sch)
        r.put("id", i)
        w.append(r)
    w.close()


def test_avro_attribute_only_schema_drift_reads_fine(spark, tmp_path):
    """ADVICE r07: two writer schemas that differ ONLY in non-structural
    attributes (doc, aliases, field default) decode identically — the
    heterogeneous-directory guard must compare Parsing-Canonical-Form,
    not exact JSON, so evolving-tooling directories still read."""
    from datapipeline_scripts_spark.sources.avro_pysource import read_avro_py

    d = tmp_path / "attr_drift"
    d.mkdir()
    v1 = '{"type":"record","name":"R","namespace":"t","fields":[{"name":"id","type":"long"}]}'
    v2 = (
        '{"type":"record","name":"R","namespace":"t","doc":"rev 2",'
        '"aliases":["Old"],"fields":[{"name":"id","type":"long",'
        '"doc":"pk","default":0,"aliases":["ident"]}]}'
    )
    _write_jvm_avro_simple(spark, str(d / "part-0.avro"), v1, range(3))
    _write_jvm_avro_simple(spark, str(d / "part-1.avro"), v2, range(3, 7))
    assert read_avro_py(spark, str(d)).count() == 7
    # but a LOGICAL-TYPE difference is structural for this tier (the
    # decoded value type changes): still refused loudly
    d2 = tmp_path / "ltype_drift"
    d2.mkdir()
    v3 = (
        '{"type":"record","name":"R","namespace":"t","fields":'
        '[{"name":"id","type":{"type":"long","logicalType":"timestamp-micros"}}]}'
    )
    _write_jvm_avro_simple(spark, str(d2 / "part-0.avro"), v1, range(3))
    _write_jvm_avro_simple(spark, str(d2 / "part-1.avro"), v3, range(3))
    with pytest.raises(Exception, match="writer schema differs"):
        read_avro_py(spark, str(d2)).collect()


def test_avro_canonical_form_rules():
    """Unit pin of the canonicalizer: STRIP attributes collapse, unions/
    wrappers normalize, logicalType+precision/scale are retained."""
    from datapipeline_scripts_spark.sources.avro_pysource import _TK

    canon = _TK["canonical_form"]
    q = _TK["qualify_names"]
    base = {
        "type": "record", "name": "R", "namespace": "t",
        "fields": [{"name": "a", "type": "int"}],
    }
    decorated = {
        "type": "record", "name": "R", "namespace": "t", "doc": "x",
        "aliases": ["S"],
        "fields": [{"name": "a", "type": {"type": "int"}, "doc": "y", "default": 1}],
    }
    assert canon(q(base)) == canon(q(decorated))
    ltype = {
        "type": "record", "name": "R", "namespace": "t",
        "fields": [{"name": "a", "type": {"type": "int", "logicalType": "date"}}],
    }
    assert canon(q(base)) != canon(q(ltype))
    dec1 = {
        "type": "record", "name": "R", "namespace": "t",
        "fields": [{"name": "a", "type": {"type": "bytes",
                    "logicalType": "decimal", "precision": 10, "scale": 2}}],
    }
    dec2 = {
        "type": "record", "name": "R", "namespace": "t",
        "fields": [{"name": "a", "type": {"type": "bytes",
                    "logicalType": "decimal", "precision": 12, "scale": 2}}],
    }
    assert canon(q(dec1)) != canon(q(dec2))


def test_avro_short_name_collision_is_loud():
    """ADVICE r07: two named types sharing a short name across
    namespaces — a bare short reference must raise 'ambiguous', not
    silently bind whichever type was defined last. Fullname references
    keep working; a single-definition short net keeps working."""
    from datapipeline_scripts_spark.sources.avro_pysource import (
        _TK,
        _avro_to_spark,
    )

    q = _TK["qualify_names"]

    def root(ref):
        return q({
            "type": "record", "name": "Root", "fields": [
                {"name": "p", "type": {"type": "record", "name": "X",
                 "namespace": "a", "fields": [{"name": "v", "type": "int"}]}},
                {"name": "r", "type": {"type": "record", "name": "X",
                 "namespace": "b", "fields": [{"name": "w", "type": "string"}]}},
                {"name": "ref", "type": ref},
            ],
        })

    # schema-inference side
    with pytest.raises(ValueError, match="ambiguous short"):
        _avro_to_spark(root("X"), {})
    st, _ = _avro_to_spark(root("a.X"), {})  # fullnames stay exact
    assert st.fields[2].dataType == st.fields[0].dataType
    # decoder side mirrors: building a reader through the bare ref and
    # invoking it raises the same ambiguity error
    import io
    rdr = _TK["make_reader"](root("X"), {})
    with pytest.raises(ValueError, match="ambiguous short"):
        rdr(io.BytesIO(b"\x02\x00\x02\x00\x00"))
    # single-definition short net still resolves
    single = q({
        "type": "record", "name": "Root", "fields": [
            {"name": "p", "type": {"type": "record", "name": "Y",
             "namespace": "a", "fields": [{"name": "v", "type": "int"}]}},
            {"name": "ref", "type": "Y"},
        ],
    })
    st2, _ = _avro_to_spark(single, {})
    assert st2.fields[1].dataType == st2.fields[0].dataType
