"""D23/D24 — approximate / sampling operators (rows-only checks).

`approx_count_distinct` (HyperLogLog++) and `sample` are not bit-equal
across engines by design, so they register without an oracle — the
driver records a rows-only check (SURVEY §2.D). Exact twins live in
aggregates.py (`agg_global.n_orders`) so the counts are still verified.

Scale: HLL is THE cardinality tool at 100 TB — fixed ~KB of state per
group vs an unbounded distinct-set; sampling feeds cheap stats/dev
loops without full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import query


@query("approx_distinct", oracle=None, tier="ext")
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct orderkeys/partkeys per return flag (rsd=1%)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count("*").alias("n"),
    )


@query("approx_quantiles", oracle=None, tier="ext")
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles of order totalprice."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("p50_p90_p99"),
        F.count("*").alias("n"),
    )


@query("sample", oracle=None, tier="ext")
def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (~10%) — deterministic per partition
    layout, but engine-specific → rows-only."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query("sample_stratified", oracle=None, tier="ext")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample (`sampleBy`): per-stratum Bernoulli fractions —
    keep 50% of URGENT orders but 5% of the rest, the shape used to
    rebalance a skewed training corpus (over-sample the rare class,
    down-sample the common one). Seeded but engine-specific → rows-only;
    the per-stratum rate honoring is asserted in tests."""
    o = load_table(spark, sf_dir, "orders")
    fractions = {"1-URGENT": 0.5, "2-HIGH": 0.05, "3-MEDIUM": 0.05, "4-NOT SPECIFIED": 0.05, "5-LOW": 0.05}
    return (
        o.sampleBy("o_orderpriority", fractions, seed=42)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_sampled"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )
