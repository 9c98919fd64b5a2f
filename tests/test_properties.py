"""Property-based tests (hypothesis): engine expressions vs pure-Python
models on generated inputs — the unit-level complement to the DuckDB
differential oracle."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from datapipeline_scripts_spark.functions.text import normalize_text
from datapipeline_scripts_spark.pipeline.retrying import retry

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=200
)


def _py_rolling_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1000000007
    return h


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(ASCII_TEXT, min_size=1, max_size=8))
def test_rolling_hash_matches_python_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], schema=T.StructType([T.StructField("text", T.StringType())]))
    codes = F.transform(F.split("text", ""), lambda ch: F.ascii(ch).cast("long"))
    rhash = F.aggregate(codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % 1000000007)
    got = [r["h"] for r in df.select(rhash.alias("h")).collect()]
    assert got == [_py_rolling_hash(t) for t in texts]


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(ASCII_TEXT, min_size=1, max_size=8))
def test_normalize_text_matches_python_model(spark, texts):
    import re

    df = spark.createDataFrame([(t,) for t in texts], schema=T.StructType([T.StructField("text", T.StringType())]))
    got = [r["n"] for r in df.select(normalize_text(F.col("text")).alias("n")).collect()]
    want = [re.sub(r"\s+", " ", t.lower().strip()) for t in texts]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    fail_times=st.integers(min_value=0, max_value=8),
    attempts=st.integers(min_value=1, max_value=9),
    base=st.floats(min_value=0.1, max_value=4.0),
)
def test_retry_sleep_schedule_is_exponential(fail_times, attempts, base):
    sleeps: list[float] = []
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= fail_times:
            raise ValueError
        return "ok"

    try:
        retry(fn, attempts=attempts, base_delay_s=base, sleep=sleeps.append)
        succeeded = True
    except Exception:
        succeeded = False
    assert succeeded == (fail_times < attempts)
    expected_sleeps = min(fail_times, attempts - 1)
    assert sleeps == [base * (2.0**i) for i in range(expected_sleeps)]
