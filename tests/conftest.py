from __future__ import annotations

import os

import pytest

# Tests run at the tiny fixture SFs, where per-job scheduling overhead
# dominates and local[32] is measurably SLOWER than local[8] (the
# repo's standing low-core observation: the full 8-core bench beat the
# 32-core bench at sf0.1, and the verify notes prescribe CPUS=8 for
# tests). Default the suite to 8 unless the caller pinned a count —
# optimization r14, in service of the driver's pytest budget
# (VERIFY_r13 tests_ok=false was a timeout).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datapipeline_scripts_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
