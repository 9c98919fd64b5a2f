"""Oracle proofs for the STAGED round-11 keys (sources/staged_r11.py).

Round 10's driver window is committed to the _ADDED_R10 keys plus
stalest-evidence re-proofs, so the round-10-built surface stages
through this round exactly as r9/r10 keys staged before it — held to
the registration bar (the driver's own `oracle.compare` hash gate,
both fixture SFs) without touching the registry."""

from __future__ import annotations

import pytest

from datapipeline_scripts_spark.oracle import compare, duck_connection
from datapipeline_scripts_spark.registry import all_queries
from datapipeline_scripts_spark.sources.staged_r11 import STAGED


@pytest.mark.parametrize("key", sorted(STAGED))
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_staged_key_matches_oracle(spark, key, sf_dir):
    build, oracle = STAGED[key]
    sdf = build(spark, sf_dir)
    with duck_connection(sf_dir) as con:
        opdf = con.execute(oracle).fetch_df()
    report = compare(key, sdf, opdf)
    assert report.ok, str(report)
    assert report.spark_rows > 0


def test_staged_r11_keys_not_registered_during_round_10():
    """The staging invariant: the catalog is 326 this round; the r11
    keys enter the registry only with round 11's deliberate flip."""
    registered = set(all_queries())
    assert len(registered) == 326
    assert not (set(STAGED) & registered)


def test_canonical_url_edge_cases(spark):
    """Edges beyond the fixture's variants: utm-only query collapses
    to no '?', bare path keeps the root, repeated trailing slashes
    all strip, mixed-case scheme+host fold, :443 strips only as a
    port suffix."""
    from pyspark.sql import types as T

    from datapipeline_scripts_spark.sources.staged_r11 import canonical_url

    cases = [
        ("HTTPS://Host.COM:443/a/b///?utm_source=x", "https://host.com/a/b"),
        ("https://host.com/a?utm_a=1&utm_b=2", "https://host.com/a"),
        ("https://host.com/?z=2&a=1", "https://host.com?a=1&z=2"),
        ("http://x443.example/p443/q?id=443", "http://x443.example/p443/q?id=443"),
        ("https://host.com/a/", "https://host.com/a"),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _ in cases],
        schema=T.StructType([T.StructField("url", T.StringType())]),
    )
    from pyspark.sql import functions as F

    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases], got
