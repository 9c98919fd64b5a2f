"""Engine-side agg-hash fingerprint mode (VERDICT r04 item 2).

`oracle.agg_hash_check` computes (count, Σ md5_48(canonical row)) inside
each engine and compares one row — the scale mode for proxy datasets
whose results exceed the driver's py4j materialization budget. These
tests pin that (a) it agrees with the exact row-collect compare on
representative schemas (ints, doubles, strings, dates, timestamps),
(b) it actually DETECTS value / row-count drift, and (c) unsupported
shapes fail loudly instead of fingerprinting garbage.
"""

from __future__ import annotations

import pytest

from datapipeline_scripts_spark.oracle import (
    _duck_fingerprint,
    _spark_fingerprint,
    agg_hash_check,
    duck_connection,
)
from datapipeline_scripts_spark.registry import get


# one key per render class in play: micro (double), ts (timestamp),
# cast (ints/strings/dates), plus the two harness-bound proxy keys the
# mode exists for (docs/SCALE_EXPERIMENT.md "harness bound")
@pytest.mark.parametrize(
    "key",
    ["scan_project", "join_band", "date_funcs", "dedup_clusters", "text_contamination"],
)
def test_agg_hash_matches_oracle(spark, sf_dir, key):
    report = agg_hash_check(key, spark, sf_dir)
    assert report.ok, str(report)
    assert report.spark_rows == report.oracle_rows > 0


def test_agg_hash_detects_value_drift(spark, sf_dir):
    """A one-cell perturbation of the oracle must flip the fingerprint."""
    spec = get("join_band")
    sdf = spec.build(spark, sf_dir)
    s_cols, s_cls, s_n, s_fp = _spark_fingerprint(sdf)
    drifted = (
        f"SELECT part_a, part_b + CASE WHEN part_a = (SELECT min(part_a) FROM ({spec.oracle}) m)"
        f" THEN 1 ELSE 0 END AS part_b, price_gap FROM ({spec.oracle}) t"
    )
    with duck_connection(sf_dir) as con:
        o_cols, o_cls, o_n, o_fp = _duck_fingerprint(con, drifted)
    assert s_cols == o_cols and s_cls == o_cls and s_n == o_n
    assert s_fp != o_fp  # the drift is visible in the fingerprint


def test_agg_hash_detects_missing_row(spark, sf_dir):
    spec = get("join_band")
    sdf = spec.build(spark, sf_dir)
    _, _, s_n, s_fp = _spark_fingerprint(sdf)
    with duck_connection(sf_dir) as con:
        _, _, o_n, o_fp = _duck_fingerprint(
            con, f"SELECT * FROM ({spec.oracle}) t LIMIT {s_n - 1}"
        )
    assert o_n == s_n - 1 and o_fp != s_fp


def test_agg_hash_double_quantization_is_microunits(spark, sf_dir):
    """Doubles render as round(x*1e6) integers — a sub-1e-6 wiggle is
    invisible (documented quantization), a 1e-5 wiggle is not."""
    spec = get("join_band")
    sdf = spec.build(spark, sf_dir)
    _, _, _, s_fp = _spark_fingerprint(sdf)
    with duck_connection(sf_dir) as con:
        _, _, _, o_small = _duck_fingerprint(
            con,
            f"SELECT part_a, part_b, price_gap + 1e-9 AS price_gap FROM ({spec.oracle}) t",
        )
        _, _, _, o_big = _duck_fingerprint(
            con,
            f"SELECT part_a, part_b, price_gap + 1e-5 AS price_gap FROM ({spec.oracle}) t",
        )
    assert o_small == s_fp
    assert o_big != s_fp


def test_agg_hash_rejects_unrenderable_schema(spark, sf_dir):
    """array<> results must error loudly, never fingerprint silently."""
    sdf = spark.sql("SELECT array(1, 2) AS a")
    with pytest.raises(ValueError, match="agg-hash mode cannot render"):
        _spark_fingerprint(sdf)
