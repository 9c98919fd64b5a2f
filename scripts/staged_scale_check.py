"""Scale-proxy check for the CURRENTLY STAGED keys (every
sources/staged_r*.py whose keys are not yet registered, plus the
already-registered r9 keys for continuity): run each builder against
the 10x key-consistent proxy fixtures
(scripts/scale_experiment.py --regen builds them under /tmp) and
hash-compare with its DuckDB oracle — the same gate the driver
applies at sf0.01, at 10x the rows. The media/ingest staged keys are
per-row Python codec work, so this is both a correctness check on
50k-document inputs and a wall-clock reading of each codec tier's
real per-row cost at depth.

Usage: SPARK_GRAFT_CPUS=8 python scripts/staged_scale_check.py [sf_dir] [key1,key2]

A key that errors (e.g. an executor OOM at an adversarial replica, or
an oracle past its documented scale bound — see dedup_survivorship in
docs/SCALE_EXPERIMENT.md) is reported as ERR and the sweep CONTINUES;
the optional comma-separated key filter scopes a re-run to the
stragglers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scripts_spark.oracle import compare, duck_connection
from datapipeline_scripts_spark.session import get_spark
from datapipeline_scripts_spark.sources.staged_r9 import STAGED as STAGED_R9
from datapipeline_scripts_spark.sources.staged_r10 import STAGED as STAGED_R10
from datapipeline_scripts_spark.sources.staged_r11 import STAGED as STAGED_R11
from datapipeline_scripts_spark.sources.staged_r12 import STAGED as STAGED_R12
from datapipeline_scripts_spark.sources.staged_r13 import STAGED as STAGED_R13
from datapipeline_scripts_spark.sources.staged_r14 import STAGED as STAGED_R14

STAGED = {**STAGED_R9, **STAGED_R10, **STAGED_R11, **STAGED_R12, **STAGED_R13, **STAGED_R14}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1_proxy"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if only is not None and (missing := only - set(STAGED)):
        raise SystemExit(f"unknown staged key(s): {sorted(missing)}")
    keys = [k for k in sorted(STAGED) if only is None or k in only]
    spark = get_spark("staged-scale")
    failures = 0
    for key in keys:
        build, oracle = STAGED[key]
        t0 = time.perf_counter()
        try:
            sdf = build(spark, sf_dir)
            with duck_connection(sf_dir) as con:
                opdf = con.execute(oracle).fetch_df()
            report = compare(key, sdf, opdf)
        except Exception as e:  # keep sweeping; report the straggler
            dt = time.perf_counter() - t0
            failures += 1
            print(
                f"{dt:7.1f}s [ERR ] {key}: {type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
            continue
        dt = time.perf_counter() - t0
        status = "OK " if report.ok else "FAIL"
        print(
            f"{dt:7.1f}s [{status}] {key}: spark={report.spark_rows} "
            f"oracle={report.oracle_rows}",
            flush=True,
        )
        if not report.ok:
            failures += 1
            print(str(report), flush=True)
    print(f"done: {failures} failures / {len(keys)} staged keys at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
