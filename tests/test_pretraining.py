"""Proofs for the end-to-end pretraining flagship
(extensions/pretraining.py): the full WARC-ingest → gate → dedup →
mixture → pack → TFRecord-export → CRC-verified-read-back chain must
hash-match its single DuckDB oracle at both fixture SFs, and every
stage must do real work on the fixture (a stage that never fires is a
stage the proof doesn't cover)."""

from __future__ import annotations

import duckdb
import pytest

from datapipeline_scripts_spark.oracle import compare, duck_connection
from datapipeline_scripts_spark.registry import get


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_pretraining_pipeline_matches_oracle(spark, sf):
    spec = get("pretraining_pipeline")
    sdf = spec.build(spark, sf)
    with duck_connection(sf) as con:
        opdf = con.execute(spec.oracle).fetch_df()
    report = compare("pretraining_pipeline", sdf, opdf)
    assert report.ok, str(report)
    assert report.spark_rows > 0


def test_every_stage_fires_on_the_fixture():
    """Recompute the chain's intermediate CTE counts in DuckDB: the
    gate, BOTH dedup stages, and the mixture downsample must each
    drop at least one document at sf0.01 — otherwise a regression in
    that stage would be invisible to the hash gate."""
    from datapipeline_scripts_spark.extensions.pretraining import _oracle

    body = _oracle().split("SELECT source, pack_id,")[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )

    def n(cte: str) -> int:
        return con.execute(body + f"SELECT count(*) FROM {cte}").fetchone()[0]

    total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    gated, s2, s3, sampled = n("gated"), n("s2"), n("s3"), n("sampled")
    assert total > gated, "quality gate never fired"
    assert gated > s2, "minhash dedup never fired"
    assert s2 > s3, "passage dedup never fired"
    assert s3 > sampled, "mixture downsample never fired"
    assert sampled > 0


def test_pipeline_is_deterministic_across_builds(spark):
    """Two full builds (including the export rewrite) produce the
    identical inventory — the reproducibility contract every stage
    was designed around (hash splits, not rand; deterministic shard
    bytes)."""
    spec = get("pretraining_pipeline")
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, spec.build(spark, sf).collect()))
    b = sorted(map(tuple, spec.build(spark, sf).collect()))
    assert a == b
