"""The spark-avro tier-1 honesty pin (VERDICT r11 item 5).

sources/readers.py documents a two-tier Avro path: the JVM
`spark-avro` connector when on the classpath (the 100 TB path), else
the pure-Python Object Container File DataSource. This container
ships Spark's core Avro jars (avro-1.12.1 etc.) but NOT the
`spark-avro_2.13` connector, and has no network to fetch it — so only
tier 2 has runtime evidence in-container.

This module keeps the two-tier claim honest either way:

- If the connector IS present (the day the sandbox takes
  `--packages`, or on a real cluster), the test runs a full tier-1
  roundtrip against a Python-tier-written file — cross-tier proof,
  automatically, no code change needed.
- If it is absent, the test pins that the LIVE in-container error is
  exactly the missing-connector signature `_connector_absent`
  dispatches on (so the fallback can never be triggered by — and
  therefore never mask — a different error class), then skips with
  the documented reason.
"""

from __future__ import annotations

import pytest

from datapipeline_scripts_spark.sources.readers import _connector_absent


def _tier1_probe(spark, path):
    """Attempt a tier-1 (JVM connector) read; return (df, None) or
    (None, exception)."""
    try:
        df = spark.read.format("avro").load(path)
        df.count()  # force execution — lazy load can defer the failure
        return df, None
    except Exception as exc:  # noqa: BLE001 — inspected below
        return None, exc


def test_tier1_roundtrip_or_pinned_absence(spark, tmp_path):
    from datapipeline_scripts_spark.sources.avro_pysource import write_avro_py

    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)],
        schema="id long, name string, score double",
    )
    out = str(tmp_path / "tier1_probe")
    write_avro_py(src.coalesce(1), out, codec="null")

    df, exc = _tier1_probe(spark, out)
    if exc is None:
        # tier 1 is live: prove the JVM connector reads the
        # Python-tier writer's output losslessly (cross-tier roundtrip)
        got = sorted(tuple(r) for r in df.collect())
        want = sorted(tuple(r) for r in src.collect())
        assert got == want
        return
    # tier 1 absent: the live error MUST be the exact signature the
    # two-tier dispatch falls back on — anything else would mean
    # read_avro could mask a genuine failure class as "connector
    # missing" (or vice versa), and the pin would catch the drift.
    assert _connector_absent(exc), (
        "in-container avro failure is not the missing-connector "
        f"signature readers.py dispatches on: {type(exc).__name__}: {exc}"
    )
    pytest.skip(
        "spark-avro connector not on the classpath and no network to "
        "fetch it — tier 1 unprovable in this container (tier 2 is "
        "proven against real JVM-encoded files elsewhere); the "
        "missing-connector signature itself is pinned above"
    )
