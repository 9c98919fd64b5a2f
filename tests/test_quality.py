"""Observation / df.observe surface: metrics ride the main job."""

from __future__ import annotations


def test_observe_metrics_reconcile_with_result(spark, sf_dir):
    # the observation must ride the same job (no second scan) and its
    # numbers must reconcile: scanned - dropped == result row mass
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from datapipeline_scripts_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.when(F.col("o_totalprice") <= 1000, 1).otherwise(0)).alias("rows_dropped"),
    )
    kept = observed.filter(F.col("o_totalprice") > 1000).count()
    m = obs.get
    assert m["rows_scanned"] == o.count()
    assert m["rows_scanned"] - m["rows_dropped"] == kept
