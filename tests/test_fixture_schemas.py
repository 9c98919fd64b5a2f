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
