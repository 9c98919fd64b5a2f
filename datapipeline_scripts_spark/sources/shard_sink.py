"""Shared distributed shard-sink scaffolding — the write half of the
corpus-shard story, common to every format this repo exports
(TFRecord, WebDataset tar, .jsonl.zst). One part-file per partition,
written BY THE EXECUTORS via `rdd.mapPartitionsWithIndex` (no driver
data path — only names/manifest entries return, one per partition);
full DataFrameWriter save-mode semantics matching the Avro sink
(sources/avro_pysource.py `write_avro_py`, the original of this
shape); optional writer-attested per-shard manifest
`{path, n_records, n_bytes, md5}` computed in the same pass, feeding
straight into the readers' `expected_records`/`expected_rows` checks
so boundary truncation is loud end-to-end.

Scale shape: export bandwidth scales with executor count; shard size
is the upstream partitioning (`repartition(n)` → n shards). `path`
must be a POSIX directory visible to the executors (local mode /
shared-FS clusters; object stores want a committer).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def write_shard_dataset(
    df: DataFrame,
    path: str,
    suffix: str,
    encode_partition: Callable[[list], tuple[bytes, int] | None],
    empty_payload: Callable[[], bytes],
    mode: str = "error",
    manifest: bool = False,
) -> list:
    """Write one shard per partition. ``encode_partition`` receives
    the partition's rows (as an iterator materialized to a list) and
    returns ``(shard_bytes, n_records)`` — or None for an empty
    partition (no file). ``empty_payload()`` provides the one valid
    empty shard written when EVERY partition is empty, so reads still
    work. Save modes: `error`/`errorifexists` refuse a non-empty
    target, `overwrite` replaces it, `ignore` returns [] when the
    target is non-empty, `append` adds part-files under run-unique
    names. Returns manifest dicts when ``manifest=True``, else bare
    paths — both sorted by path."""
    mode = "error" if mode == "errorifexists" else mode
    if mode not in ("error", "overwrite", "append", "ignore"):
        raise ValueError(
            f"unknown save mode {mode!r}; expected "
            "error/errorifexists/overwrite/append/ignore"
        )
    if os.path.exists(path):
        if mode == "overwrite":
            shutil.rmtree(path)
        elif os.listdir(path):
            if mode == "ignore":
                return []
            if mode == "error":
                raise FileExistsError(f"{path!r} exists; pass mode='overwrite'")
            # append falls through: run-unique part names below
    os.makedirs(path, exist_ok=True)
    run_token = f"-{uuid.uuid4().hex[:12]}" if mode == "append" else ""

    def write_partition(pid: int, rows) -> Iterator[dict]:
        encoded = encode_partition(list(rows))
        if encoded is None:
            return iter(())
        payload, n_records = encoded
        part_path = os.path.join(path, f"part-{pid:05d}{run_token}{suffix}")
        with open(part_path, "wb") as fh:
            fh.write(payload)
        return iter(
            [
                {
                    "path": part_path,
                    "n_records": n_records,
                    "n_bytes": len(payload),
                    "md5": hashlib.md5(payload).hexdigest(),
                }
            ]
        )

    entries = sorted(
        df.rdd.mapPartitionsWithIndex(write_partition).collect(),
        key=lambda e: e["path"],
    )
    if not entries:  # all partitions empty: one empty shard so reads work
        part_path = os.path.join(path, f"part-00000{run_token}{suffix}")
        payload = empty_payload()
        with open(part_path, "wb") as fh:
            fh.write(payload)
        entries = [
            {
                "path": part_path,
                "n_records": 0,
                "n_bytes": len(payload),
                "md5": hashlib.md5(payload).hexdigest(),
            }
        ]
    return entries if manifest else [e["path"] for e in entries]
