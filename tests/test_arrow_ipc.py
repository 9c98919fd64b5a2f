"""Arrow IPC shard module (sources/arrow_ipc.py): typed roundtrip
including the binary lane, footer-enforced truncation loudness,
manifest defense-in-depth, projection, and shard-sink save modes."""

from __future__ import annotations

import os

import pytest

from datapipeline_scripts_spark.sources.arrow_ipc import (
    read_arrow_ipc,
    read_arrow_ipc_bytes,
    write_arrow_ipc,
    write_arrow_ipc_dataset,
)

ROWS = [
    {"id": i, "text": f"t{i}", "blob": bytes([i, 255 - i, 7])} for i in range(7)
]


@pytest.mark.parametrize("compression", [None, "zstd", "lz4"])
@pytest.mark.parametrize("batches_of", [None, 1, 3])
def test_bytes_roundtrip_typed(compression, batches_of):
    payload = write_arrow_ipc(ROWS, compression=compression, batches_of=batches_of)
    table = read_arrow_ipc_bytes(payload)
    assert table.to_pylist() == ROWS


def test_truncation_is_loud_at_every_cut():
    """The IPC file format ends in footer+magic: a shard cut at ANY
    byte — including clean record-batch boundaries — must refuse.
    (This is the property the zstd-frame formats lack.)"""
    payload = write_arrow_ipc(ROWS, batches_of=1)
    for cut in range(0, len(payload), max(1, len(payload) // 23)):
        with pytest.raises(ValueError, match="not a valid Arrow IPC file"):
            read_arrow_ipc_bytes(payload[:cut], where="trunc")


def test_empty_table_roundtrip():
    assert read_arrow_ipc_bytes(write_arrow_ipc([])).num_rows == 0


def test_dataset_roundtrip_with_manifest_and_projection(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(
        [(i, f"t{i}", bytes([i])) for i in range(10)],
        schema="id long, text string, blob binary",
    ).repartition(3)
    manifest = write_arrow_ipc_dataset(df, out, compression="zstd", manifest=True)
    assert sum(m["n_records"] for m in manifest) == 10
    expected = {os.path.basename(m["path"]): m["n_records"] for m in manifest}
    back = read_arrow_ipc(
        spark, out, {"id": "int64", "blob": "binary"}, expected_rows=expected
    )
    got = {r["id"]: bytes(r["blob"]) for r in back.collect()}
    assert got == {i: bytes([i]) for i in range(10)}
    # a field absent from the shards projects as null, not an error
    withmiss = read_arrow_ipc(spark, out, {"id": "int64", "nope": "string"})
    assert all(r["nope"] is None for r in withmiss.collect())


def test_manifest_mismatch_refuses(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame([(1, "a")], schema="id long, text string").coalesce(1)
    manifest = write_arrow_ipc_dataset(df, out, manifest=True)
    bad = {os.path.basename(m["path"]): m["n_records"] + 1 for m in manifest}
    with pytest.raises(Exception, match="manifest"):
        read_arrow_ipc(spark, out, {"id": "int64"}, expected_rows=bad).collect()


def test_save_modes(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame([(1, "a")], schema="id long, text string").coalesce(1)
    write_arrow_ipc_dataset(df, out)
    with pytest.raises(Exception):
        write_arrow_ipc_dataset(df, out)  # mode=error on non-empty target
    assert write_arrow_ipc_dataset(df, out, mode="ignore") == []
    write_arrow_ipc_dataset(df, out, mode="append")
    write_arrow_ipc_dataset(df, out, mode="overwrite")
    n = len([f for f in os.listdir(out) if f.endswith(".arrow")])
    assert n == 1  # overwrite replaced the appended pair


def test_unsupported_field_type_refuses(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported type"):
        read_arrow_ipc(spark, str(tmp_path), {"id": "decimal"})


def test_property_roundtrip_nulls_unicode_and_empties():
    """Property pin: arbitrary rows with nulls in every column,
    unicode text, empty strings/bytes and empty batches roundtrip
    exactly (hypothesis-driven over the bytes API)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.fixed_dictionaries(
        {
            "id": st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            "text": st.one_of(st.none(), st.text(max_size=40)),
            "blob": st.one_of(st.none(), st.binary(max_size=40)),
        }
    )

    @settings(max_examples=60, deadline=None)
    @given(rows=st.lists(row, min_size=1, max_size=12),
           comp=st.sampled_from([None, "zstd", "lz4"]),
           bsz=st.sampled_from([None, 1, 5]))
    def check(rows, comp, bsz):
        payload = write_arrow_ipc(rows, compression=comp, batches_of=bsz)
        assert read_arrow_ipc_bytes(payload).to_pylist() == rows

    check()


def test_manifest_full_path_lookup_actually_matches(spark, tmp_path):
    """ADVICE r10: binaryFile reports file:-URI paths, manifests record
    plain local paths — the full-path lookup must match after
    normalization, not silently fall through to basenames. Proven by
    keying the manifest with FULL local paths and tampering one count:
    the read must refuse (pre-fix this refusal only worked by luck of
    the basename fallback; the ambiguity test below closes that)."""
    out = str(tmp_path / "shards")
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema="id long, text string").coalesce(1)
    manifest = write_arrow_ipc_dataset(df, out, manifest=True)
    good = {m["path"]: m["n_records"] for m in manifest}
    got = read_arrow_ipc(spark, out, {"id": "int64"}, expected_rows=good).collect()
    assert len(got) == 2
    bad = {m["path"]: m["n_records"] + 5 for m in manifest}
    with pytest.raises(Exception, match="manifest"):
        read_arrow_ipc(spark, out, {"id": "int64"}, expected_rows=bad).collect()


def test_manifest_ambiguous_basename_refuses(spark, tmp_path):
    """Two manifest entries sharing a basename in different directories
    must make the basename fallback refuse loudly instead of
    validating the shard against whichever entry won the dict race."""
    out = str(tmp_path / "shards")
    df = spark.createDataFrame([(1, "a")], schema="id long, text string").coalesce(1)
    manifest = write_arrow_ipc_dataset(df, out, manifest=True)
    base = os.path.basename(manifest[0]["path"])
    ambiguous = {f"runA/{base}": 1, f"runB/{base}": 1}
    with pytest.raises(Exception, match="ambiguous"):
        read_arrow_ipc(spark, out, {"id": "int64"}, expected_rows=ambiguous).collect()


def test_norm_path_percent_decoding_and_authority():
    """ADVICE r11: binaryFile percent-encodes unsafe characters and may
    report a file://host authority — _norm_path must decode %20 back to
    the manifest's plain spelling and must NOT fold the authority into
    the path as a directory segment."""
    from datapipeline_scripts_spark.sources.arrow_ipc import _norm_path

    assert _norm_path("file:/a/my%20dir/s.arrow") == "/a/my dir/s.arrow"
    assert _norm_path("file:///a/b/s.arrow") == "/a/b/s.arrow"
    # authority (host) is dropped, not treated as /host/...
    assert _norm_path("file://localhost/a/b/s.arrow") == "/a/b/s.arrow"
    assert _norm_path("/a/b/../b/s.arrow") == "/a/b/s.arrow"


def test_manifest_path_with_space_matches_after_decode(spark, tmp_path):
    """End-to-end: a shard directory containing a space roundtrips —
    binaryFile reports %20, the manifest records the plain path, and
    the full-path lookup (not the basename fallback) must match."""
    out = str(tmp_path / "my shards")
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema="id long, text string").coalesce(1)
    manifest = write_arrow_ipc_dataset(df, out, manifest=True)
    good = {m["path"]: m["n_records"] for m in manifest}
    assert all(" " in p for p in good)  # the fixture actually exercises encoding
    got = read_arrow_ipc(spark, out, {"id": "int64"}, expected_rows=good).collect()
    assert len(got) == 2
    # and a tampered count still refuses via the SAME full-path match
    bad = {m["path"]: m["n_records"] + 1 for m in manifest}
    with pytest.raises(Exception, match="manifest"):
        read_arrow_ipc(spark, out, {"id": "int64"}, expected_rows=bad).collect()


def test_manifest_colliding_full_paths_refuse(spark, tmp_path):
    """ADVICE r11: two manifest keys that normalize to the SAME path
    must poison that entry (loud refusal), mirroring the basename map —
    not collapse last-writer-wins."""
    out = str(tmp_path / "shards")
    df = spark.createDataFrame([(1, "a")], schema="id long, text string").coalesce(1)
    manifest = write_arrow_ipc_dataset(df, out, manifest=True)
    p = manifest[0]["path"]
    n = manifest[0]["n_records"]
    # same file spelled two ways: plain and with a redundant ./ segment
    d, b = os.path.dirname(p), os.path.basename(p)
    colliding = {p: n, f"{d}/./{b}": n + 7}
    with pytest.raises(Exception, match="ambiguous"):
        read_arrow_ipc(spark, out, {"id": "int64"}, expected_rows=colliding).collect()
