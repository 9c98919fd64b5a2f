"""Oracle proofs for the STAGED round-8 keys (sources/staged_r8.py).

The catalog is frozen at 306 until CORRECTNESS_r07 closes the gate
(VERDICT r6 items 1-2), so these builders are not registered yet —
but they are held to the exact bar registration will apply: the same
`oracle.compare` hash gate the driver uses, at both fixture SFs."""

from __future__ import annotations

import pytest

from datapipeline_scripts_spark.oracle import compare, duck_connection
from datapipeline_scripts_spark.registry import all_queries
from datapipeline_scripts_spark.sources.staged_r8 import STAGED


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


def test_staged_keys_not_registered_while_catalog_frozen():
    """The freeze invariant itself: staging must not leak into the
    registry before round 8 flips it deliberately."""
    registered = set(all_queries())
    assert len(registered) == 306
    assert not (set(STAGED) & registered)
