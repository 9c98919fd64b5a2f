"""Scale-proxy experiment: how do the headline operators' runtimes grow
when the data grows 10x?

Builds a "sf1 proxy" under /tmp by replicating the sf0.1 fixtures 10x
with KEY-CONSISTENT remapping (orderkey/custkey/partkey/suppkey offsets
applied to every referencing table, so join selectivities and group
cardinalities scale the way a real TPC-H SF bump scales them — not the
degenerate all-duplicates blowup a naive unionAll of identical copies
would give):

- lineitem 600k -> 6M, orders 150k -> 1.5M, customer 15k -> 150k,
  part 20k -> 200k, supplier 1k -> 10k (region/nation stay fixed —
  they are fixed-cardinality dims at any SF)
- events 100k -> 1M: event_id offset, ts shifted +7 days per copy (the
  time span grows with volume, as in production; per-user history gets
  10x deeper)
- documents 5k -> 50k: doc_id offset, content suffixed per copy so the
  copies are NEAR-duplicates (one shingle differs) — the hard realistic
  case for MinHash/LSH bucket load, not trivially-identical rows
- embeddings 2k -> 20k: vec_id offset (vector values unchanged; ANN
  cost depends on cardinality, not values)

Then times a representative headline set at BOTH scale factors (best
of N on the same session) and prints per-key ratios. A scale-safe
operator should grow ~linearly (ratio ~10x or less thanks to fixed
overheads); a super-linear ratio flags a pair blowup or a global
funnel. Results are recorded in docs/SCALE_EXPERIMENT.md.

Usage: python scripts/scale_experiment.py [--regen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.registry import all_queries
from datapipeline_scripts_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
BIG_SF = os.environ.get("SPARK_GRAFT_BIG_SF_DIR", "/tmp/spark_graft_sf1_proxy")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))

# key column -> offset stride (must exceed the max key in sf0.1; round
# powers of ten keep the remap readable in spot checks)
_STRIDES = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
}

# per-table: (key columns to offset by {stride * copy}, extra transform)
_TABLES = {
    "region": ((), None),
    "nation": ((), None),
    "customer": (("c_custkey",), None),
    "supplier": (("s_suppkey",), None),
    "part": (("p_partkey",), None),
    "orders": (("o_orderkey", "o_custkey"), None),
    "lineitem": (("l_orderkey", "l_partkey", "l_suppkey"), None),
    "events": (("event_id",), "events"),
    "documents": (("doc_id",), "documents"),
    "embeddings": (("vec_id",), None),
}

HEADLINE = (
    "agg_group",
    "join_star",
    "tpch_q3_shape",
    "tpch_q18_shape",
    "window_rank",
    "dedup_exact_norm",
    "dedup_minhash",
    "knn_pq",
    "text_tfidf",
    "events_session",
    "orders_abc_pareto",
    "table_diff",
    "corpus_build_pipeline",
)


def _stride_for(col: str) -> int:
    for suffix, stride in _STRIDES.items():
        if col.endswith(suffix):
            return stride
    raise KeyError(col)


def generate(spark) -> None:
    for name, (key_cols, extra) in _TABLES.items():
        out = os.path.join(BIG_SF, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = load_table(spark, BASE_SF, name)
        if not key_cols and extra is None:
            base.write.mode("overwrite").parquet(out)
            continue
        copies = []
        for i in range(COPIES):
            df = base
            for col in key_cols:
                df = df.withColumn(col, F.col(col) + F.lit(i * _stride_for(col)))
            if extra == "events":
                df = df.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {7 * i} DAYS"))
            elif extra == "documents":
                # near-duplicate copies: one trailing shingle differs, so
                # dedup sees realistic 10-member near-dup clusters
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" rev{i}"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(len(f" rev{i}")))
            copies.append(df)
        big = copies[0]
        for df in copies[1:]:
            big = big.unionByName(df)
        # realistic file layout: multiple fragments, not one giant file
        big.repartition(8).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"# generated {name}: {n} rows", file=sys.stderr, flush=True)


def bench(spark, sf_dir: str, runs: int) -> dict[str, float]:
    specs = all_queries()
    out: dict[str, float] = {}
    for key in HEADLINE:
        best = float("inf")
        specs[key].build(spark, sf_dir).count()  # warm
        for _ in range(runs):
            t0 = time.perf_counter()
            specs[key].build(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[key] = round(best, 3)
        print(f"# {os.path.basename(sf_dir)} {key}: {best:.3f}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = get_spark("scale_experiment")
    if "--regen" in sys.argv:
        import shutil

        shutil.rmtree(BIG_SF, ignore_errors=True)
    os.makedirs(BIG_SF, exist_ok=True)
    generate(spark)
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
    small = bench(spark, BASE_SF, runs)
    big = bench(spark, BIG_SF, runs)
    print(f"{'key':28} {'sf0.1':>8} {'10x':>8} {'ratio':>7}")
    for key in HEADLINE:
        r = big[key] / small[key] if small[key] else float("nan")
        print(f"{key:28} {small[key]:8.3f} {big[key]:8.3f} {r:7.2f}")
    tot_s, tot_b = sum(small.values()), sum(big.values())
    print(f"{'TOTAL':28} {tot_s:8.3f} {tot_b:8.3f} {tot_b / tot_s:7.2f}")


if __name__ == "__main__":
    main()
