"""Fixture-drift guard (VERDICT r02 item 3): the driver regenerates
the testdata parquet between rounds and has already changed physical
types once (round-1 events.ts was TIMESTAMP(NANOS); round-2+ is µs
NTZ). These tests pin the canonical *logical* schema every fixture
table must present after `catalog.load_table`'s defensive casts, so a
regeneration that drifts fails loudly here — in the builder's loop —
instead of as a hash mismatch in the driver's CORRECTNESS run.

If a round legitimately changes a fixture type, the fix is to extend
`catalog.load_table`'s normalization (as the ns→µs path did), NOT to
relax these expectations: every oracle assumes these logical types.
"""

from __future__ import annotations

import pytest

from datapipeline_scripts_spark.catalog import TABLES, load_table

# canonical logical dtypes as seen through load_table (Spark simpleString)
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_guard_covers_every_catalog_table():
    assert sorted(EXPECTED) == sorted(TABLES)


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_is_canonical(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == EXPECTED[table], (
        f"fixture drift in {table!r}: {got} != {EXPECTED[table]} — "
        "extend catalog.load_table normalization, do not relax this test"
    )


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_nonempty(spark, sf_dir, table):
    # a regenerated-but-empty fixture would green-wash every oracle
    # (0 rows == 0 rows); require actual data
    assert load_table(spark, sf_dir, table).limit(1).count() == 1


# ---------------------------------------------------------------------------
# Content fingerprints (VERDICT r03 item 3): the schema guard above catches
# dtype drift, but a fixture REGENERATION with the same schema and different
# values would silently flip not-yet-driver-proven keys red in the driver's
# next run. Fingerprint = (row count, sum of each row's md5-derived 48-bit
# int) — order-insensitive, value-exact, stable across DuckDB versions
# (md5 is specified; struct→text rendering is pinned by the values below —
# if THAT ever shifts, this test fails loudly too, which is the point:
# any change to /root/testdata content must be noticed, never discovered
# via a red CORRECTNESS row).
_CONTENT_FP = {
    "/root/testdata/sf0.001": {
        "customer": (150, 21670157456555865),
        "documents": (500, 68109008863441952),
        "embeddings": (500, 70543585968586012),
        "events": (1000, 142781260452233221),
        "lineitem": (6000, 848207706809276186),
        "nation": (25, 3700710569055916),
        "orders": (1500, 216410460567556739),
        "part": (200, 27025206807496926),
        "region": (5, 456347259059421),
        "supplier": (10, 1702436148514735),
    },
    "/root/testdata/sf0.01": {
        "customer": (1500, 206086443277054044),
        "documents": (500, 70472263032308818),
        "embeddings": (500, 72491476999259410),
        "events": (10000, 1421271886709211442),
        "lineitem": (60000, 8418928966843352350),
        "nation": (25, 3700710569055916),
        "orders": (15000, 2118631126500469026),
        "part": (2000, 280864998489074840),
        "region": (5, 456347259059421),
        "supplier": (100, 14257846071374805),
    },
    # sf0.1 is the BENCH scale (VERDICT r04 item 6): a silent fixture
    # regeneration here would skew every cross-round bench comparison,
    # so it is pinned too. Sums exceed int64 at these row counts, so
    # fingerprints are the raw HUGEINT row-sums (Python ints).
    "/root/testdata/sf0.1": {
        "customer": (15000, 2117754323028189088),
        "documents": (5000, 697555762266129839),
        "embeddings": (2000, 282390997789240039),
        "events": (100000, 14020040023389603495),
        "lineitem": (600000, 84475957283277904813),
        "nation": (25, 3700710569055916),
        "orders": (150000, 21112711338310196708),
        "part": (20000, 2818240548558826242),
        "region": (5, 456347259059421),
        "supplier": (1000, 144470955336104479),
    },
}


@pytest.mark.parametrize("sf_path", sorted(_CONTENT_FP))
def test_fixture_content_fingerprint(sf_path):
    import os

    import duckdb

    if not os.path.isdir(sf_path):
        pytest.skip(f"{sf_path} not present")
    con = duckdb.connect()
    for table, (exp_n, exp_fp) in sorted(_CONTENT_FP[sf_path].items()):
        # no BIGINT cast on the sum: the per-row terms are 48-bit, so the
        # sum passes int64 around ~65k rows (sf0.1 events/lineitem do)
        n, fp = con.execute(
            "SELECT count(*), coalesce(sum(CAST(('0x' || "
            "substr(md5(CAST(t AS TEXT)), 1, 12)) AS BIGINT)), 0) "
            f"FROM read_parquet('{sf_path}/{table}.parquet') t"
        ).fetchone()
        assert (n, fp) == (exp_n, exp_fp), (
            f"/root/testdata CONTENT changed for {table!r} under {sf_path} "
            f"(got n={n} fp={fp}, recorded n={exp_n} fp={exp_fp}): re-verify "
            "every unproven query key against the new fixtures and re-record "
            "these fingerprints — do NOT assume prior green runs still hold"
        )


def test_scan_spread_is_scale_adaptive(spark, sf_dir):
    """scan_spread (optimization r14) must keep the round-robin spread
    on the tiny fixture (one scan split would serialize downstream
    compute) and DROP the exchange once the scan itself yields enough
    splits — pinned by flipping maxPartitionBytes at runtime."""
    from pyspark.sql import functions as F

    from datapipeline_scripts_spark.catalog import (
        _parse_jvm_bytes,
        est_scan_splits,
        load_table,
        scan_spread,
        table_path,
    )

    assert _parse_jvm_bytes("134217728") == 134217728
    assert _parse_jvm_bytes("128m") == 128 * 1024**2
    assert _parse_jvm_bytes("1g") == 1024**3
    assert _parse_jvm_bytes("64kb") == 64 * 1024

    df = load_table(spark, sf_dir, "documents").select("doc_id")
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # tiny split ceiling → fixture is "small": spread fires
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        plan_small = df.transform(
            scan_spread(spark, sf_dir, "documents")
        )._jdf.queryExecution().executedPlan().toString()
        assert "roundrobin" in plan_small.lower()
        # split ceiling far below the file size → enough scan splits:
        # the exchange must be gone
        nbytes = __import__("os").path.getsize(table_path(sf_dir, "documents"))
        small = max(1, nbytes // (2 * spark.sparkContext.defaultParallelism))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(small))
        assert est_scan_splits(spark, table_path(sf_dir, "documents")) >= (
            spark.sparkContext.defaultParallelism
        )
        plan_big = df.transform(
            scan_spread(spark, sf_dir, "documents")
        )._jdf.queryExecution().executedPlan().toString()
        assert "roundrobin" not in plan_big.lower()
        # results are identical either way (repartition never changes rows)
        a = df.transform(scan_spread(spark, sf_dir, "documents"))
        assert a.agg(F.sum("doc_id")).collect()[0][0] == df.agg(
            F.sum("doc_id")
        ).collect()[0][0]
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_group_spread_is_scale_adaptive(spark, sf_dir):
    """group_spread (optimization r14) must pin a grouped Python
    stage's shuffle to hashpartitioning(keys, defaultParallelism) on
    the tiny fixture (AQE's byte-targeted coalescing would serialize
    the per-group Python work) and pass the frame through UNTOUCHED
    once the upstream scan yields enough splits — and the grouped
    result must be identical either way."""
    from pyspark.sql import functions as F

    from datapipeline_scripts_spark.catalog import (
        group_spread,
        load_table,
        table_path,
    )

    df = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    grouped = lambda frame: frame.groupBy("lang").agg(  # noqa: E731
        F.sum("doc_id").alias("s")
    )
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # small regime: explicit hash repartition on the keys fires
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        spread = df.transform(group_spread(spark, sf_dir, "documents", "lang"))
        plan_small = spread._jdf.queryExecution().executedPlan().toString()
        n = spark.sparkContext.defaultParallelism
        assert "hashpartitioning(lang" in plan_small and str(n) in plan_small
        # large regime: identity — no exchange added
        nbytes = __import__("os").path.getsize(table_path(sf_dir, "documents"))
        small = max(1, nbytes // (2 * n))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(small))
        passthrough = df.transform(
            group_spread(spark, sf_dir, "documents", "lang")
        )
        plan_big = passthrough._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning" not in plan_big.lower()
        # grouped results identical on both sides of the decision
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        want = sorted(map(tuple, grouped(df).collect()))
        got = sorted(map(tuple, grouped(spread).collect()))
        assert got == want
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
