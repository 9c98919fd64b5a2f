"""Snapshot + restore-verify CLI — the engine's `backup.sh`.

Usage:
    python scripts/run_snapshot.py <sf_dir> <out_root> [--verify] [--tables t1,t2]

Env (same surface as the reference's env-var API, SURVEY §1.1):
    SERVICE_NAME, BACKUP_ENV, ATTEMPTS, TIMEOUT, CHECK_IN_URL
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scripts_spark.pipeline.config import JobConfig
from datapipeline_scripts_spark.pipeline.retrying import retry
from datapipeline_scripts_spark.pipeline.snapshot import snapshot
from datapipeline_scripts_spark.pipeline.verify import verify_or_raise
from datapipeline_scripts_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_root")
    ap.add_argument("--verify", action="store_true", help="run the restore drill after snapshotting")
    ap.add_argument("--tables", default=None, help="comma-separated subset")
    ap.add_argument("--base", default=None, help="previous manifest path → incremental snapshot")
    args = ap.parse_args()

    cfg = JobConfig(tables=tuple(args.tables.split(",")) if args.tables else None)
    spark = get_spark("snapshot_job")
    snap_dir = retry(
        lambda: snapshot(spark, args.sf_dir, args.out_root, cfg=cfg, base_manifest=args.base),
        attempts=cfg.attempts,
        base_delay_s=cfg.backoff_s,
    )
    print(f"snapshot: {snap_dir}")
    if args.verify:
        scratch = tempfile.mkdtemp(prefix="restore_verify_")
        result = verify_or_raise(spark, snap_dir, scratch)
        print(f"verify: OK ({len(result.tables_ok)} tables)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
