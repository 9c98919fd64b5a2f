"""Driver-visible bucketed co-located join: persist both join sides
bucketed on the join key, then join with ZERO exchange on either side
— the physical design that removes the dominant shuffle of a 100 TB
lineitem⋈orders workload (see `sources/bucketing.py` for the write
helpers and tests/test_bucketing.py for the no-Exchange plan audit).

The query key re-buckets from the given sf_dir on every call (mode
overwrite), so the oracle — the same join/aggregate straight off the
parquet — certifies the bucketed path end-to-end: layout write,
metastore read, exchange-free join, aggregate.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query
from datapipeline_scripts_spark.sources.bucketing import colocated_join, write_bucketed


@query(
    "join_bucketed",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem through same-bucketed managed tables (8 buckets
    on the order key, per-bucket sorted): the join plans as a
    SortMergeJoin with no Exchange — at warehouse scale the only data
    movement left is the bucket-pairwise read."""
    # per-session table/location suffix: concurrent sessions sharing one
    # warehouse dir must not race on DROP TABLE/rmtree (ADVICE r01)
    app = "".join(c if c.isalnum() else "_" for c in spark.sparkContext.applicationId)
    tag = f"{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}_{app}"
    o_tbl, li_tbl = f"orders_bkt_{tag}", f"lineitem_bkt_{tag}"
    for tbl in (o_tbl, li_tbl):
        # a fresh session's metastore may not know the table even though
        # its warehouse dir survives from a previous process — saveAsTable
        # then fails with LOCATION_ALREADY_EXISTS; drop both layers
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), tbl
        )
        if os.path.exists(loc):
            shutil.rmtree(loc)
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        o_tbl,
        "o_orderkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        li_tbl,
        "l_orderkey",
    )
    joined = colocated_join(spark, o_tbl, li_tbl, "o_orderkey", "l_orderkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )
