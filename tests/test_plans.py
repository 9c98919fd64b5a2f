"""Physical-plan audits: assert the scale properties the engine claims
are actually in the optimized plans (SURVEY brief: iterate on
`.explain` until it's the plan you'd want)."""

from __future__ import annotations

from datapipeline_scripts_spark.plans.audit import (
    has_codegen,
    join_strategies,
    pushed_filters,
    read_schemas,
)
from datapipeline_scripts_spark.registry import get


def test_scan_project_prunes_columns(spark, sf_dir):
    df = get("scan_project").build(spark, sf_dir)
    schemas = read_schemas(df)
    assert schemas, "no parquet scan found"
    assert sorted(schemas[0]) == ["l_extendedprice", "l_linenumber", "l_orderkey", "l_quantity"]


def test_filter_pred_pushes_down(spark, sf_dir):
    df = get("filter_pred").build(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed and "l_returnflag" in pushed
    # projection also pruned to the needed columns + filter columns
    cols = read_schemas(df)[0]
    assert "l_extendedprice" not in cols


def test_agg_group_reads_only_needed_columns(spark, sf_dir):
    df = get("agg_group").build(spark, sf_dir)
    cols = read_schemas(df)[0]
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert has_codegen(df)


def test_join_star_broadcasts_dims(spark, sf_dir):
    df = get("join_star").build(spark, sf_dir)
    joins = join_strategies(df)
    assert joins.count("BroadcastHashJoin") >= 3, joins
    assert "CartesianProduct" not in joins


def test_join_range_is_not_cartesian(spark, sf_dir):
    df = get("join_range").build(spark, sf_dir)
    joins = join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_join_band_is_equi_not_nested_loop(spark, sf_dir):
    # the band-bucketized rewrite must plan as a hash/sort-merge equi
    # join, not the O(n^2) nested loop the naive theta join produces
    df = get("join_band").build(spark, sf_dir)
    joins = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in joins
    assert "CartesianProduct" not in joins


def test_subquery_scalar_broadcasts_aggregate(spark, sf_dir):
    df = get("subquery_scalar").build(spark, sf_dir)
    assert "BroadcastNestedLoopJoin" in join_strategies(df) or "BroadcastHashJoin" in join_strategies(df)


def test_dedup_fingerprint_shuffles_hash_not_text(spark, sf_dir):
    # the exchange key for exact dedup must be the md5 fingerprint, so
    # the shuffle payload is 32 hex chars, not the document body
    df = get("dedup_exact_norm").build(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "hashpartitioning(fp" in plan.replace("#", "(").replace("fp(", "fp") or "fp" in plan
