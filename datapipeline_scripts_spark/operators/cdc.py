"""CDC / incremental-load operators: MERGE (upsert + delete) semantics
expressed as a full-outer join — the Delta/Iceberg `MERGE INTO` shape
built from first principles on plain DataFrames.

This is the engine-layer form of the reference's incremental pipeline
surface: its snapshot jobs move whole databases every run
(/root/reference/backup.sh:210 — full `pg_dump` each schedule); a
change-data-capture merge is what replaces that full re-extract at
100 TB, where re-shipping the base table nightly is not an option.

Scale notes: the merge is one shuffle join on the merge key. The
changeset side is typically ≪ base (a day of changes vs years of
data), so AQE broadcasts it when it fits; with a bucketed/partitioned
base table the join co-locates and only the changeset moves. No
driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query(
    "merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    changes AS (
      SELECT o_orderkey,
             'U' AS o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS o_totalprice,
             (o_orderkey % 10 = 0) AS is_delete
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                  WHEN c.o_orderkey IS NULL THEN 'keep'
                  WHEN c.is_delete THEN 'delete'
                  ELSE 'update' END AS action,
             coalesce(c.o_orderstatus, b.o_orderstatus) AS status,
             coalesce(c.o_totalprice, b.o_totalprice) AS price,
             coalesce(c.is_delete, FALSE) AS is_delete
      FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
    )
    SELECT action, status,
           count(*) AS n_rows,
           CAST(round(sum(price), 2) AS DOUBLE) AS total_price
    FROM merged
    WHERE NOT (is_delete AND action IN ('delete', 'insert'))
    GROUP BY action, status
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics over a full-outer join: matched rows
    update, unmatched-source rows insert, matched rows flagged
    `is_delete` drop, and flagged non-matches are never inserted.
    Result is the per-action/status audit the merge job would emit.

    The base is orders minus every 3rd key (a stale snapshot); the
    changeset is every 2nd key re-priced +10%, with every 10th key a
    tombstone — so all five MERGE branches (update/insert/keep/delete/
    suppressed-insert) are exercised and oracle-checked."""
    o = load_table(spark, sf_dir, "orders")
    # All price math stays in DECIMAL end-to-end: double×1.1 followed
    # by round() is not cross-engine-stable per row, and a double sum's
    # partial-agg order flips round() at .005 boundaries. Decimal
    # multiply/add are exact, so both engines agree bit-for-bit.
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("b_status"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("b_price"),
        F.lit(True).alias("in_base"),
    )
    changes = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("c_status"),
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit("1.1").cast("decimal(2,1)")).alias("c_price"),
        (F.col("o_orderkey") % 10 == 0).alias("is_delete"),
    )
    action = (
        F.when(F.col("in_base").isNull(), "insert")
        .when(F.col("c_status").isNull(), "keep")
        .when(F.col("is_delete"), "delete")
        .otherwise("update")
    )
    merged = (
        base.join(changes, "o_orderkey", "full_outer")
        .select(
            action.alias("action"),
            F.coalesce("c_status", "b_status").alias("status"),
            F.coalesce("c_price", "b_price").alias("price"),
            F.coalesce("is_delete", F.lit(False)).alias("is_delete"),
        )
        .filter(~(F.col("is_delete") & F.col("action").isin("delete", "insert")))
    )
    return merged.groupBy("action", "status").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("price"), 2).cast("double").alias("total_price"),
    )


def build_incremental_agg_refresh(
    spark: SparkSession, sf_dir: str, state_dir: str
) -> DataFrame:
    """Write the base partial-aggregate state under `state_dir` and
    return the LAZY refreshed plan (state scan + delta scan, exactly
    two FileScans — test_plans asserts this shape). Callers own the
    lifetime of `state_dir` while the returned plan is unmaterialized;
    a real nightly rollup keeps it as its managed state table."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = "1997-01-01"
    state = lambda df: df.groupBy("o_orderstatus").agg(  # noqa: E731
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_state"),
    )
    state(o.filter(F.col("o_orderdate") < cutoff)).write.mode("overwrite").parquet(state_dir)
    base = spark.read.parquet(state_dir)  # materialized: base rows never rescanned
    delta = state(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.round(F.sum("sum_state"), 2).cast("double").alias("sum_price"),
        )
    )


@query(
    "incremental_agg_refresh",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the base
    aggregate (orders before the cutoff) is MATERIALIZED to parquet —
    partial-state columns (count, decimal sum), not finished metrics —
    then refreshed by merging the delta batch's partial aggregate,
    WITHOUT rescanning base rows. The hash must equal the full
    recompute over all orders: sum/count state merges associatively,
    so incremental == full.

    At 100 TB this is THE nightly-rollup pattern: yesterday's
    aggregate + today's partition, cost O(delta) not O(history). The
    mergeable-state discipline (keep count+sum, derive avg at read)
    is the same one the sketch rollups apply to non-algebraic
    metrics."""
    import os
    import shutil as _sh
    import tempfile as _tf

    out = os.path.join(
        _tf.gettempdir(),
        f"spark_graft_incragg_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    try:
        merged = build_incremental_agg_refresh(spark, sf_dir, out)
        # localCheckpoint materializes the (tiny, per-status) result so the
        # scratch state dir is deletable immediately — repeated runs across
        # applications no longer accumulate orphans (ADVICE r03). A real
        # nightly rollup KEEPS this state as its managed table; the scratch
        # dir here only exists to prove the merge discipline.
        return merged.localCheckpoint(eager=True)
    finally:
        _sh.rmtree(out, ignore_errors=True)


@query(
    "incremental_topk_refresh",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    ORDER BY n_events DESC, user_id LIMIT 10
    """,
)
def incremental_topk_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained top-k (heaviest users): top-k itself is
    NOT a mergeable aggregate — yesterday's top-10 plus today's top-10
    is not tomorrow's top-10 — so the materialized state is the full
    per-user count map (the underlying monoid), merged with the delta
    batch's counts and re-ranked at read. The hash must equal the
    full recompute, proving the state discipline: materialize the
    mergeable layer, derive the non-mergeable answer at the end
    (exactly incremental_agg_refresh's contract, on an aggregate
    where the naive 'merge the answers' shortcut is WRONG). Refresh
    cost is O(delta + |keys|), never O(history); the final top-10 is
    TakeOrdered over the |users|-sized state."""
    import os
    import tempfile as _tf

    e = load_table(spark, sf_dir, "events")
    # data-derived cutoff (corpus max minus 7 days) so base and delta
    # are both non-empty at every scale factor and across fixture
    # regenerations — a literal date rots when fixtures move. The
    # 1-row bound broadcasts; nothing collects to the driver.
    cut = e.agg(F.date_sub(F.max(F.to_date("ts")), 7).alias("cut"))
    counts = lambda df, pred: (  # noqa: E731
        df.crossJoin(F.broadcast(cut))
        .filter(pred)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    out = os.path.join(
        _tf.gettempdir(),
        f"spark_graft_incrtopk_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    import shutil as _sh

    try:
        counts(e, F.to_date("ts") < F.col("cut")).write.mode("overwrite").parquet(out)
        base = spark.read.parquet(out)  # materialized count map — base rows never rescanned
        delta = counts(e, F.to_date("ts") >= F.col("cut"))
        merged = (
            base.unionByName(delta)
            .groupBy("user_id")
            .agg(F.sum("n_events").cast("long").alias("n_events"))
        )
        # top-10 result materialized via localCheckpoint so the scratch
        # count-map dir can be removed at once (ADVICE r03 — no orphaned
        # per-application state dirs)
        return merged.orderBy(F.desc("n_events"), "user_id").limit(10).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(out, ignore_errors=True)


@query(
    "dsl_query_compile",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents,
           min(l_quantity) AS min_qty
    FROM lineitem
    WHERE l_quantity >= 10 AND l_returnflag IN ('A', 'R')
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def dsl_query_compile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The programmatic query surface: a JSON-able spec compiled to a
    Catalyst plan by plans/dsl.py — tools emit data structures, the
    engine compiles them, and the optimizer treats the result exactly
    like handwritten DataFrame code (pushdown and pruning asserted in
    test_plans.py). The declared spec exercises scan, conjunctive
    filter with IN, grouped count/sum_cents/min, and ordering; the
    oracle is the SQL a human would have written."""
    from datapipeline_scripts_spark.plans.dsl import compile_spec

    spec = {
        "table": "lineitem",
        "filter": {
            "op": "and",
            "args": [
                {"op": ">=", "col": "l_quantity", "lit": 10},
                {"op": "in", "col": "l_returnflag", "lit": ["A", "R"]},
            ],
        },
        "group_by": ["l_returnflag"],
        "aggs": [
            {"fn": "count", "as": "n"},
            {"fn": "sum_cents", "col": "l_extendedprice", "as": "rev_cents"},
            {"fn": "min", "col": "l_quantity", "as": "min_qty"},
        ],
        "order_by": [["l_returnflag", "asc"]],
    }
    return compile_spec(spark, sf_dir, spec)


@query(
    "dsl_query_join",
    oracle="""
    SELECT o.o_orderpriority AS pri,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 25
    GROUP BY 1 ORDER BY 1
    """,
)
def dsl_query_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec-compiled JOIN: the declarative surface extended with a
    joins clause (equi-keys, join type, optional broadcast hint) —
    the compiled plan carries the broadcast hint into a
    BroadcastHashJoin and still gets filter pushdown on the fact
    side (both plan-asserted). Specs stay pure data; the engine owns
    physical strategy."""
    from datapipeline_scripts_spark.plans.dsl import compile_spec

    spec = {
        "table": "lineitem",
        "joins": [
            {
                "table": "orders",
                "on": [["l_orderkey", "o_orderkey"]],
                "type": "inner",
                "broadcast": True,
            }
        ],
        "filter": {"op": ">=", "col": "l_quantity", "lit": 25},
        "group_by": ["o_orderpriority"],
        "aggs": [
            {"fn": "count", "as": "n"},
            {"fn": "sum_cents", "col": "l_extendedprice", "as": "rev_cents"},
        ],
        "order_by": [["o_orderpriority", "asc"]],
    }
    return compile_spec(spark, sf_dir, spec).withColumnRenamed("o_orderpriority", "pri")
