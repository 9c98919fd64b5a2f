"""Restore-verify job — the engine's restore drill (A14/A19/A21/A22).

The reference proves every backup by provisioning a fresh database and
restoring into it with abort-on-first-error
(/root/reference/backup.sh:264-375, psql `ON_ERROR_STOP=on`
/root/reference/psql-backups.sh:222). Here: read the snapshot back,
load it into a scratch warehouse directory, and assert row counts,
schemas and content hashes against the manifest — then tear the scratch
down in a `finally` (A4/A22).

A19/A20 are made real: `include`/`exclude` restore only listed tables
(`pg_restore -L list`), and `drop_line_pattern` filters rows whose text
matches a regex — applied *for real*, unlike the reference's dead sed
filters (the `-f`-already-wrote-the-file bug at
/root/reference/psql-backups.sh:146-148; SURVEY §2.A A20).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.pipeline.snapshot import MANIFEST_NAME, content_hash


class RestoreVerifyError(RuntimeError):
    pass


@dataclass
class VerifyResult:
    snapshot_dir: str
    tables_ok: list[str] = field(default_factory=list)
    issues: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.issues


def verify_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    scratch_dir: str,
    include: list[str] | None = None,
    exclude: tuple[str, ...] = (),
    drop_line_pattern: dict[str, tuple[str, str]] | None = None,
    keep_scratch: bool = False,
) -> VerifyResult:
    """Full restore round-trip: snapshot → scratch warehouse → manifest
    parity. `drop_line_pattern` maps table → (column, regex) rows to
    filter out during restore (counts are then checked as
    original - dropped)."""
    manifest_path = os.path.join(snapshot_dir, MANIFEST_NAME)
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    result = VerifyResult(snapshot_dir=snapshot_dir)
    tables = list(manifest["tables"])
    if include is not None:  # A19 restore-list filtering
        tables = [t for t in tables if t in include]
    tables = [t for t in tables if t not in exclude]
    try:
        for name in tables:
            expect = manifest["tables"][name]
            # incremental snapshots point unchanged tables at the base
            # snapshot ("based_on") instead of re-writing their data
            data_dir = snapshot_dir
            if "based_on" in expect:
                data_dir = os.path.join(os.path.dirname(snapshot_dir.rstrip("/")), expect["based_on"])
            src = spark.read.parquet(os.path.join(data_dir, name))
            dropped = 0
            if drop_line_pattern and name in drop_line_pattern:
                col, pattern = drop_line_pattern[name]
                # NULLs must be KEPT (and not counted as dropped): a bare
                # ~rlike filters NULL rows out silently, which made the
                # rows == expect - dropped check spuriously fail (ADVICE r01)
                matches = F.col(col).isNotNull() & F.col(col).rlike(pattern)
                dropped = src.filter(matches).count()
                src = src.filter(~matches)
            target = os.path.join(scratch_dir, name)
            src.write.mode("error").parquet(target)  # abort-on-first-error
            restored = spark.read.parquet(target)
            n = restored.count()
            if n != expect["n_rows"] - dropped:
                result.issues.append(f"{name}: rows {n} != manifest {expect['n_rows']} - dropped {dropped}")
                continue
            if restored.schema.json() != expect["schema"]:
                result.issues.append(f"{name}: schema drift")
                continue
            if dropped == 0:
                h = content_hash(restored.select(sorted(restored.columns)))
                if h != expect["content_hash"]:
                    result.issues.append(f"{name}: content hash {h} != {expect['content_hash']}")
                    continue
            result.tables_ok.append(name)
    finally:
        if not keep_scratch:
            shutil.rmtree(scratch_dir, ignore_errors=True)  # A4/A22 cleanup
    return result


def verify_or_raise(*args, **kwargs) -> VerifyResult:
    result = verify_snapshot(*args, **kwargs)
    if not result.ok:
        raise RestoreVerifyError("; ".join(result.issues))
    return result
