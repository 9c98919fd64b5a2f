"""E6 — as-of join: each event matched to the latest order at-or-before
its timestamp for the same user (events.user_id ↔ orders.o_custkey).

The DuckDB oracle uses its native ASOF LEFT JOIN; Spark has no as-of
operator, so the engine composes one from built-ins:

  equi+range join (user key + orderdate ≤ ts)  →  per-event
  row_number() pick-latest  →  left join back to keep matchless events.

Scale: the equality on the user key makes the first join hash/sort-merge
partitioned — never cartesian; the pick-latest window shuffles on
event_id only. For sorted-bucket layouts, `applyInPandas` +
`pandas.merge_asof` per key-partition is the zero-extra-shuffle
alternative (see `asof_join_pandas`).

Determinism: orders are first deduped to one row per (custkey,
orderdate) — max orderkey wins — because the as-of tie between two
same-timestamp orders is otherwise engine-defined.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F, types as T

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query

_DEDUP_ORDERS_SQL = """
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders)
      WHERE rn = 1
"""


@query(
    "asof_join",
    oracle=f"""
    WITH o AS ({_DEDUP_ORDERS_SQL})
    SELECT e.event_id,
           e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           o.o_orderkey,
           round(o.o_totalprice, 2) AS totalprice
    FROM events e
    ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (nearest-before) join, composed from equi+range join +
    pick-latest window + left join back."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    wdedup = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    o1 = (
        o.withColumn("rn", F.row_number().over(wdedup))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    matched = e.join(o1, (e.user_id == o1.o_custkey) & (e.ts >= o1.o_orderdate), "inner")
    wpick = W.partitionBy("event_id").orderBy(F.col("o_orderdate").desc())
    best = (
        matched.withColumn("pick", F.row_number().over(wpick))
        .filter(F.col("pick") == 1)
        .select("event_id", "o_orderkey", "o_totalprice")
    )
    return e.join(best, "event_id", "left").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


_ASOF_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
    ]
)


def _merge_asof_group(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        events = (
            pdf[pdf["side"] == "e"][["event_id", "user_id", "ts"]]
            .sort_values("ts")
            .reset_index(drop=True)
        )
        orders = (
            pdf[pdf["side"] == "o"][["o_orderkey", "ts"]].sort_values("ts").reset_index(drop=True)
        )
        if events.empty:
            continue
        merged = pd.merge_asof(events, orders, on="ts", direction="backward")
        yield merged[["event_id", "user_id", "o_orderkey"]]


@query("asof_join_pandas", oracle=None, tier="ext")
def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via union → repartition by user →
    within-partition sort → Arrow-batched `pandas.merge_asof`.

    This is the single-shuffle scale path: both tables shuffle once on
    the key, and the merge is a linear scan per partition — no
    candidate-pair blowup for users with many orders. Rows-only (the
    oracle-checked twin is `asof_join`)."""
    e = load_table(spark, sf_dir, "events").select(
        F.lit("e").alias("side"), "event_id", "user_id", "ts", F.lit(None).cast("long").alias("o_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("o").alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey"),
    )
    both = e.unionByName(o).repartition("user_id")
    # mapInPandas receives whole partitions; all rows of a user share one
    # partition, and _merge_asof_group sorts within the batch.
    return (
        both.sortWithinPartitions("user_id", "ts")
        .groupBy("user_id")
        .applyInPandas(
            lambda pdf: next(_merge_asof_group(iter([pdf])), pd.DataFrame(columns=["event_id", "user_id", "o_orderkey"])),
            schema=_ASOF_SCHEMA,
        )
    )
