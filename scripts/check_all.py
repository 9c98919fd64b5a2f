"""Run every declared query against its DuckDB oracle; print one line
per query. Usage: python scripts/check_all.py [sf_dir]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scripts_spark.oracle import check_query
from datapipeline_scripts_spark.registry import all_queries
from datapipeline_scripts_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # accept both comma- and space-separated key lists; an unknown key is
    # a loud error, not a silent no-op (a typo'd key must never look like
    # a passing check)
    only = (
        {k for arg in sys.argv[2:] for k in arg.split(",") if k} if len(sys.argv) > 2 else None
    )
    if only:
        unknown = only - set(all_queries())
        if unknown:
            raise SystemExit(f"unknown query key(s): {sorted(unknown)}")
    spark = get_spark("check_all")
    failures = 0
    for key in sorted(all_queries()):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            report = check_query(key, spark, sf_dir)
            print(f"{time.time() - t0:6.1f}s {report}", flush=True)
            if not report.ok:
                failures += 1
        except Exception as exc:  # noqa: BLE001
            failures += 1
            msg = str(exc).splitlines()[0][:300]
            print(f"{time.time() - t0:6.1f}s [ERR ] {key}: {msg}", flush=True)
    n_checked = len(only) if only else len(all_queries())
    print(f"done: {failures} failures / {n_checked} queries checked", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
