"""The pipeline layer as a declared query: run a real snapshot →
restore-verify round trip (the reference's whole purpose, SURVEY §3)
and return the verified per-table row counts.

The oracle is plain COUNT(*) SQL — so the driver's hash gate proves the
snapshot+verify machinery reproduces the source tables exactly, the
same way the reference proves every backup by restoring it
(/root/reference/backup.sh:264-375).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datapipeline_scripts_spark.pipeline.config import JobConfig
from datapipeline_scripts_spark.pipeline.snapshot import snapshot
from datapipeline_scripts_spark.pipeline.verify import verify_or_raise
from datapipeline_scripts_spark.registry import query

_TABLES = ("region", "nation", "supplier", "customer")

_SCHEMA = T.StructType(
    [
        T.StructField("tbl", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("verified", T.BooleanType(), False),
    ]
)


@query(
    "pipeline_roundtrip",
    oracle="""
    SELECT 'region' AS tbl, count(*) AS n_rows, TRUE AS verified FROM region
    UNION ALL SELECT 'nation', count(*), TRUE FROM nation
    UNION ALL SELECT 'supplier', count(*), TRUE FROM supplier
    UNION ALL SELECT 'customer', count(*), TRUE FROM customer
    """,
)
def pipeline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot 4 tables to scratch, restore-verify against the manifest
    (rows + schema + distributed content hash), return verified counts."""
    import json
    import os

    root = tempfile.mkdtemp(prefix="pipeline_roundtrip_")
    try:
        cfg = JobConfig(service_name="roundtrip", env_name="q", tables=_TABLES)
        snap = snapshot(spark, sf_dir, root, cfg=cfg)
        result = verify_or_raise(spark, snap, os.path.join(root, "scratch"))
        with open(os.path.join(snap, "_MANIFEST.json")) as fh:
            manifest = json.load(fh)
        rows = [
            (name, manifest["tables"][name]["n_rows"], name in result.tables_ok) for name in _TABLES
        ]
        return spark.createDataFrame(rows, schema=_SCHEMA)
    finally:
        shutil.rmtree(root, ignore_errors=True)
