"""Snapshot job — the engine's `pg_dump` (A9/A10/A17/A18).

Extracts a database (a catalog of tables) to a timestamped, partitioned
parquet snapshot plus a JSON manifest carrying schema, row counts and an
order-insensitive content hash per table. The manifest is what the
restore drill (verify.py) checks against — the analogue of
`pg_restore --exit-on-error` proving the artifact (A21).

Layout (mirrors `s3://bucket/<env>/<service>/<ts>/`,
/root/reference/backup.sh:220):

    <root>/<env>/<service>/<snapshot_ts>/<table>/part-*.parquet
    <root>/<env>/<service>/<snapshot_ts>/_MANIFEST.json

Scale notes:
- Content hash = sum of per-row xxhash64 — computed distributed, one
  aggregate per table, no data through the driver (the reference's
  "server-side execution" pattern, /root/reference/backup.sh:119-120).
- Writes go through `df.write.parquet` so a 1000-executor cluster
  writes all partitions in parallel; `partition_cols` lets downstream
  reads prune (e.g. snapshot events by event_type).
- A12 duplicate-task guard = atomic lock file creation.
- A23 check-in = success record appended to _CHECKINS.jsonl (the
  dead-man's-switch `curl $CHECK_IN_URL` analogue).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark import catalog
from datapipeline_scripts_spark.pipeline.config import JobConfig

MANIFEST_NAME = "_MANIFEST.json"
LOCK_NAME = "_LOCK"
CHECKINS_NAME = "_CHECKINS.jsonl"


def content_hash(df: DataFrame) -> int:
    """Order-insensitive table hash: sum of per-row xxhash64 over all
    columns (cast to string for type stability). Distributed partial
    aggregation; constant driver memory."""
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    # accumulate in decimal(38,0): a plain long sum overflows (ANSI mode
    # raises); reduce mod 2^64 at the end for a compact stable value
    out = df.agg(F.sum(row_hash.cast("decimal(38,0)")).alias("h")).collect()[0]["h"]
    return int(out) % (1 << 64) if out is not None else 0


class SnapshotLockError(RuntimeError):
    """A snapshot is already running for this target (A12 duplicate-task
    guard: 'A task has already been issued for database…',
    /root/reference/backup.sh:124-126)."""


def _acquire_lock(snap_root: str, run_id: str) -> str:
    os.makedirs(snap_root, exist_ok=True)
    lock_path = os.path.join(snap_root, LOCK_NAME)
    try:
        fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise SnapshotLockError(f"a snapshot task already holds {lock_path}") from exc
    with os.fdopen(fd, "w") as fh:
        fh.write(run_id)
    return lock_path


def check_in(root: str, record: dict) -> None:
    """Dead-man's-switch success report (A23). With a CHECK_IN_URL this
    would be an HTTP GET; locally it appends a dated success record the
    monitor greps."""
    with open(os.path.join(root, CHECKINS_NAME), "a") as fh:
        fh.write(json.dumps(record) + "\n")


def snapshot(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    cfg: JobConfig | None = None,
    snapshot_ts: str | None = None,
    partition_cols: dict[str, list[str]] | None = None,
    base_manifest: str | None = None,
    max_workers: int = 1,
) -> str:
    """Snapshot every configured table; return the snapshot directory.

    Flow (mirrors backup.sh): lock → extract+validate each table →
    manifest → check-in → unlock (always, via finally — the reference's
    `trap cleanup_on_exit EXIT`, /root/reference/backup.sh:20-36).

    Incremental mode: pass `base_manifest` (a previous snapshot's
    manifest path) and tables whose distributed content hash equals the
    base are NOT rewritten — their manifest entry points at the base
    snapshot (`based_on`). At 100 TB this turns the nightly job from a
    full 100 TB write into hash scans + changed-table writes.

    `max_workers > 1` submits per-table extract jobs from a driver
    thread pool: Spark's scheduler interleaves their stages, so the
    cluster stays busy through each table's scan→write→verify gaps
    instead of draining between tables (the reference has no such
    overlap — tables serialize through one pg_dump). Job submission
    is thread-safe; results are collected in table order and any
    table's failure fails the snapshot (A2 fail-fast)."""
    cfg = cfg or JobConfig()
    snapshot_ts = snapshot_ts or time.strftime("%Y_%m_%d_%H%M%S", time.gmtime())
    tables = [
        t
        for t in (cfg.tables or catalog.TABLES)
        if t not in set(cfg.exclude_tables)  # A9's `-N apgcc` exclusion
    ]
    snap_root = os.path.join(out_root, cfg.snapshot_prefix())
    # read the base manifest BEFORE taking the lock: a missing/corrupt
    # manifest must not leave a stale _LOCK behind (ADVICE r01)
    base: dict | None = None
    if base_manifest is not None:
        with open(base_manifest) as fh:
            base = json.load(fh)
    lock_path = _acquire_lock(snap_root, snapshot_ts)
    snap_dir = os.path.join(snap_root, snapshot_ts)
    try:

        def _snap_table(name: str) -> tuple[str, dict]:
            df = catalog.load_table(spark, sf_dir, name)
            src_hash = content_hash(df.select(sorted(df.columns)))
            base_entry = (base or {}).get("tables", {}).get(name)
            if base_entry and base_entry["content_hash"] == src_hash and base_entry["schema"] == df.schema.json():
                # unchanged since the base snapshot: record a pointer,
                # skip the write entirely (differential backup). If the
                # base entry is itself a pointer (chained incrementals),
                # keep ITS target — the pointer must always name the
                # snapshot that physically holds the data.
                return name, {
                    **base_entry,
                    "based_on": base_entry.get("based_on", base["snapshot_ts"]),
                }
            target = os.path.join(snap_dir, name)
            writer = df.write.mode("error")
            for col in (partition_cols or {}).get(name, []):
                writer = writer.partitionBy(col)
            writer.parquet(target)
            restored = spark.read.parquet(target)
            n = restored.count()
            if n == 0 and df.limit(1).count() > 0:  # A18 non-empty validation
                raise RuntimeError(f"snapshot of {name} is empty")
            return name, {
                "n_rows": n,
                "content_hash": content_hash(restored.select(sorted(restored.columns))),
                "schema": restored.schema.json(),
            }

        table_entries: dict[str, dict] = {}
        if max_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                # pool.map preserves table order and re-raises the first
                # failure — fail-fast with the lock still released in
                # the enclosing finally
                for name, entry in pool.map(_snap_table, tables):
                    table_entries[name] = entry
        else:
            for name in tables:
                name, entry = _snap_table(name)
                table_entries[name] = entry
        manifest = {
            "service": cfg.clamped_service,
            "env": cfg.env_name,
            "snapshot_ts": snapshot_ts,
            "source": sf_dir,
            "tables": table_entries,
        }
        os.makedirs(snap_dir, exist_ok=True)
        with open(os.path.join(snap_dir, MANIFEST_NAME), "w") as fh:
            json.dump(manifest, fh, indent=2)
        check_in(snap_root, {"ok": True, "snapshot_ts": snapshot_ts, "n_tables": len(table_entries)})
        return snap_dir
    finally:
        os.unlink(lock_path)  # A4 guaranteed cleanup


def export_metadata_only(spark: SparkSession, sf_dir: str, out_path: str, cfg: JobConfig | None = None) -> str:
    """A10 `pg_dumpall --globals-only` analogue: catalog metadata (table
    schemas + row counts) without data. Unlike the reference's v≥10
    quirk (metadata-only dumps replacing data dumps,
    /root/reference/psql-backups.sh:117-121 — a bug we fix, SURVEY §7.2),
    this is an *additional* artifact, never a substitute."""
    cfg = cfg or JobConfig()
    meta = {}
    for name in cfg.tables or catalog.TABLES:
        df = catalog.load_table(spark, sf_dir, name)
        meta[name] = {"schema": json.loads(df.schema.json()), "n_rows": df.count()}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(meta, fh, indent=2)
    return out_path
