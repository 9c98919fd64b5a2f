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
