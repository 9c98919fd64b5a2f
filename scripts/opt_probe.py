"""Optimization-round probe: time keys bench-style (warm best-of-N
count()) and dump their formatted plans for plans/<round>/ (round dir
from $SPARK_GRAFT_PLAN_DIR, default r14).

Usage:
  python scripts/opt_probe.py time key1,key2,...   [sf_dir]
  python scripts/opt_probe.py plan key1,key2,... suffix [sf_dir]

`time` prints per-key warm best-of-5 (bench.py's exact convention:
2 untimed warmups then best of 5 timed count() runs).
`plan` writes plans/<round>/<key>_<suffix>.txt with explain("formatted").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scripts_spark.registry import all_queries
from datapipeline_scripts_spark.session import get_spark


def main() -> int:
    mode = sys.argv[1]
    keys = [k for k in sys.argv[2].split(",") if k]
    specs = all_queries()
    unknown = set(keys) - set(specs)
    if unknown:
        raise SystemExit(f"unknown keys: {sorted(unknown)}")
    if mode == "time":
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("opt_probe")
        specs["agg_group"].build(spark, sf_dir).count()
        for key in keys:
            spark.sparkContext.setJobDescription(f"probe:{key}")
            for _ in range(2):
                specs[key].build(spark, sf_dir).count()
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                specs[key].build(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            print(f"{key:42s} {best:7.3f}s", flush=True)
    elif mode == "plan":
        suffix = sys.argv[3]
        sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
        spark = get_spark("opt_probe")
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
        )
        os.makedirs(out_dir, exist_ok=True)
        from datapipeline_scripts_spark.plans.audit import formatted_plan

        for key in keys:
            df = specs[key].build(spark, sf_dir)
            txt = formatted_plan(df)
            path = os.path.join(out_dir, f"{key}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt.splitlines())} lines)", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
