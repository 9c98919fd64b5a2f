"""Pipeline-layer tests: snapshot → restore-verify round trip (the
reference's restore drill, SURVEY §5.1), retry/poll/lock/config utils."""

from __future__ import annotations

import json
import os

import pytest

from datapipeline_scripts_spark.pipeline.config import JobConfig, clamp_identifier, scratch_password
from datapipeline_scripts_spark.pipeline.retrying import PollTimeout, RetriesExhausted, poll, retry
from datapipeline_scripts_spark.pipeline.snapshot import (
    CHECKINS_NAME,
    MANIFEST_NAME,
    SnapshotLockError,
    _acquire_lock,
    snapshot,
)
from datapipeline_scripts_spark.pipeline.verify import RestoreVerifyError, verify_or_raise, verify_snapshot

TABLES = ("region", "nation", "supplier")


def _cfg() -> JobConfig:
    return JobConfig(service_name="unit-test-service", env_name="test", tables=TABLES)


@pytest.fixture(scope="module")
def snap_dir(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snap"))
    path = snapshot(spark, sf_dir, root, cfg=_cfg(), snapshot_ts="2026_01_01_000000")
    return path


def test_snapshot_layout_and_manifest(snap_dir):
    assert snap_dir.endswith("test/unit-test-service/2026_01_01_000000")
    with open(os.path.join(snap_dir, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    assert set(manifest["tables"]) == set(TABLES)
    assert manifest["tables"]["region"]["n_rows"] == 5
    assert manifest["tables"]["nation"]["n_rows"] == 25
    # check-in recorded at the service root (dead-man's-switch analogue)
    service_root = os.path.dirname(snap_dir)
    with open(os.path.join(service_root, CHECKINS_NAME)) as fh:
        record = json.loads(fh.readlines()[-1])
    assert record["ok"] is True


def test_verify_round_trip_ok(spark, snap_dir, tmp_path):
    result = verify_or_raise(spark, snap_dir, str(tmp_path / "scratch"))
    assert sorted(result.tables_ok) == sorted(TABLES)


def test_verify_include_exclude(spark, snap_dir, tmp_path):
    result = verify_snapshot(spark, snap_dir, str(tmp_path / "s2"), include=["region", "nation"], exclude=("nation",))
    assert result.tables_ok == ["region"]


def test_verify_drop_line_pattern(spark, snap_dir, tmp_path):
    # A20 made real: filter rows during restore, counts reconcile
    result = verify_snapshot(
        spark,
        snap_dir,
        str(tmp_path / "s3"),
        include=["region"],
        drop_line_pattern={"region": ("r_name", "^A")},  # AFRICA, AMERICA, ASIA
    )
    assert result.ok


def test_verify_drop_line_pattern_keeps_nulls(spark, tmp_path):
    # ADVICE r01: NULLs in the filter column must be KEPT, not silently
    # excluded (a bare ~rlike drops them and desyncs the count check)
    from datapipeline_scripts_spark.pipeline.snapshot import snapshot
    from datapipeline_scripts_spark.pipeline.config import JobConfig
    import datapipeline_scripts_spark.pipeline.snapshot as snap_mod
    import datapipeline_scripts_spark.catalog as catalog

    df = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "beta"), (4, None), (5, "axe")],
        "id INT, name STRING",
    )
    src_dir = str(tmp_path / "src")
    df.write.parquet(src_dir + "/weird")
    orig = catalog.load_table
    catalog.load_table = lambda sp, d, n: sp.read.parquet(src_dir + "/weird")
    snap_mod.catalog.load_table = catalog.load_table
    try:
        sdir = snapshot(spark, src_dir, str(tmp_path / "out"), JobConfig(tables=["weird"]))
    finally:
        catalog.load_table = orig
        snap_mod.catalog.load_table = orig
    result = verify_snapshot(
        spark,
        sdir,
        str(tmp_path / "scratch"),
        drop_line_pattern={"weird": ("name", "^a")},  # drops alpha, axe; keeps NULLs
    )
    assert result.ok, result.issues


def test_verify_detects_tampering(spark, snap_dir, tmp_path):
    with open(os.path.join(snap_dir, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    manifest["tables"]["region"]["content_hash"] += 1
    tampered = tmp_path / "tampered"
    tampered.mkdir()
    os.symlink(os.path.join(snap_dir, "region"), tampered / "region")
    with open(tampered / MANIFEST_NAME, "w") as fh:
        json.dump({**manifest, "tables": {"region": manifest["tables"]["region"]}}, fh)
    with pytest.raises(RestoreVerifyError, match="content hash"):
        verify_or_raise(spark, str(tampered), str(tmp_path / "s4"))


def test_incremental_snapshot_skips_unchanged(spark, sf_dir, tmp_path):
    """Differential backup: a second snapshot against the first one's
    manifest writes NO table data (nothing changed) but its manifest
    still verifies end-to-end via the base pointers."""
    root = str(tmp_path / "incr")
    first = snapshot(spark, sf_dir, root, cfg=_cfg(), snapshot_ts="2026_01_01_000000")
    second = snapshot(
        spark,
        sf_dir,
        root,
        cfg=_cfg(),
        snapshot_ts="2026_01_02_000000",
        base_manifest=os.path.join(first, MANIFEST_NAME),
    )
    # no data directories in the incremental snapshot — only the manifest
    assert sorted(os.listdir(second)) == [MANIFEST_NAME]
    with open(os.path.join(second, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    assert all(t["based_on"] == "2026_01_01_000000" for t in manifest["tables"].values())
    # the restore drill resolves the pointers and still verifies content
    result = verify_or_raise(spark, second, str(tmp_path / "incr_scratch"))
    assert sorted(result.tables_ok) == sorted(TABLES)


def test_chained_incremental_snapshots_point_at_data(spark, sf_dir, tmp_path):
    """Three snapshots, the last two incremental: the third's pointers
    must target the FIRST snapshot (which holds the data), not the
    manifest-only second — and the restore drill must still pass."""
    root = str(tmp_path / "chain")
    s1 = snapshot(spark, sf_dir, root, cfg=_cfg(), snapshot_ts="2026_01_01_000000")
    s2 = snapshot(spark, sf_dir, root, cfg=_cfg(), snapshot_ts="2026_01_02_000000",
                  base_manifest=os.path.join(s1, MANIFEST_NAME))
    s3 = snapshot(spark, sf_dir, root, cfg=_cfg(), snapshot_ts="2026_01_03_000000",
                  base_manifest=os.path.join(s2, MANIFEST_NAME))
    with open(os.path.join(s3, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    assert all(t["based_on"] == "2026_01_01_000000" for t in manifest["tables"].values())
    assert verify_or_raise(spark, s3, str(tmp_path / "chain_scratch")).ok


def test_partitioned_snapshot_layout(spark, sf_dir, tmp_path):
    root = str(tmp_path / "partsnap")
    cfg = JobConfig(service_name="partsvc", env_name="test", tables=("orders",))
    snap = snapshot(
        spark, sf_dir, root, cfg=cfg, snapshot_ts="2026_01_01_000000",
        partition_cols={"orders": ["o_orderstatus"]},
    )
    orders_dir = os.path.join(snap, "orders")
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(orders_dir))
    # partition column round-trips through the hive layout; verify passes
    assert verify_or_raise(spark, snap, str(tmp_path / "ps_scratch")).ok


def test_snapshot_lock_guard(tmp_path):
    lock = _acquire_lock(str(tmp_path), "run1")
    with pytest.raises(SnapshotLockError):
        _acquire_lock(str(tmp_path), "run2")
    os.unlink(lock)
    os.unlink(_acquire_lock(str(tmp_path), "run3"))


def test_retry_backoff_schedule():
    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise ValueError("boom")
        return "ok"

    assert retry(flaky, attempts=9, base_delay_s=2.0, sleep=sleeps.append) == "ok"
    assert sleeps == [2.0, 4.0, 8.0]  # exponential ×2, reference defaults


def test_retry_exhaustion():
    with pytest.raises(RetriesExhausted):
        retry(lambda: 1 / 0, attempts=3, base_delay_s=0.0, sleep=lambda _: None)


def test_poll_until_success():
    states = iter(["CREATED", "IN_PROGRESS", "IN_PROGRESS", "SUCCESS"])
    assert poll(lambda: next(states), interval_s=0, sleep=lambda _: None) == "SUCCESS"


def test_poll_terminal_failure():
    with pytest.raises(RuntimeError, match="ERROR"):
        poll(lambda: "ERROR", sleep=lambda _: None)


def test_poll_timeout():
    clock = iter(range(100))
    with pytest.raises(PollTimeout):
        poll(
            lambda: "IN_PROGRESS",
            interval_s=1,
            timeout_s=3,
            sleep=lambda _: None,
            clock=lambda: float(next(clock)),
        )


def test_identifier_clamp_and_secret():
    assert clamp_identifier("x" * 64) == "x" * 29  # psql-backups.sh:56-62 semantics
    pw = scratch_password()
    assert pw.isalnum() and len(pw) >= 20


def test_config_env_defaults(monkeypatch):
    monkeypatch.setenv("ATTEMPTS", "3")
    monkeypatch.setenv("SERVICE_NAME", "svc-from-env")
    cfg = JobConfig()
    assert cfg.attempts == 3
    assert cfg.service_name == "svc-from-env"


def test_snapshot_parallel_matches_sequential(spark, sf_dir, snap_dir, tmp_path):
    # driver-side thread pool must yield the same manifest content as
    # the sequential path (same hashes/rows/schemas), just faster
    root = str(tmp_path / "psnap")
    pdir = snapshot(
        spark, sf_dir, root, cfg=_cfg(), snapshot_ts="2026_01_02_000000", max_workers=3
    )
    with open(os.path.join(pdir, MANIFEST_NAME)) as fh:
        par = json.load(fh)["tables"]
    with open(os.path.join(snap_dir, MANIFEST_NAME)) as fh:
        seq = json.load(fh)["tables"]
    assert par == seq
