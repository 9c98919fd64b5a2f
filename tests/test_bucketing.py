"""Bucketed co-located join: the join on the bucket key must plan with
no Exchange on either side (the 100 TB shuffle-elimination strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.plans.audit import formatted_plan
from datapipeline_scripts_spark.sources.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", n_buckets=4)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_colocated_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, right, left, "l_orderkey", "o_orderkey")
    plan = formatted_plan(joined)
    assert "Exchange" not in plan, plan[:2000]
    assert "SortMergeJoin" in plan


def test_colocated_join_correctness(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, right, left, "l_orderkey", "o_orderkey")
    n_bucketed = joined.count()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain


def test_bucketed_aggregation_skips_shuffle(spark, sf_dir, bucketed_tables):
    # groupBy on the bucket key also needs no exchange
    _, lineitem_b = bucketed_tables[0], bucketed_tables[1]
    agg = spark.table(lineitem_b).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange" not in formatted_plan(agg)
