"""jsonl.zst shard ingest tests: multi-frame concatenation (the
append-writer layout), plain-jsonl passthrough, loud malformed rows,
and the shard-parallel Spark read."""

from __future__ import annotations

import json

import pytest

from datapipeline_scripts_spark.sources import jsonl_zst as jz


def _rows(n, start=0):
    return [
        {"id": i, "text": f"document {i}", "meta": {"lang": "en", "score": i % 7}}
        for i in range(start, start + n)
    ]


def test_roundtrip_single_and_multi_frame():
    rows = _rows(25)
    one = jz.write_jsonl_zst(rows)
    framed = jz.write_jsonl_zst(rows, frames_of=4)  # 7 frames
    assert one[:4] == jz._ZSTD_MAGIC
    assert jz.iter_jsonl(one) == rows
    # the multi-frame stream MUST concatenate — a first-frame-only
    # reader would silently return 4 rows
    assert jz.iter_jsonl(framed) == rows
    assert framed != one


def test_plain_jsonl_passthrough_and_blank_lines():
    raw = b'{"a":1}\n\n{"a":2}\n   \n{"a":3}\n'
    assert jz.iter_jsonl(raw) == [{"a": 1}, {"a": 2}, {"a": 3}]


def test_malformed_rows_are_loud():
    with pytest.raises(ValueError, match=r"shard9:2: invalid JSON"):
        jz.iter_jsonl(b'{"ok":1}\n{broken\n', where="shard9")
    with pytest.raises(ValueError, match=r"shard9:1: JSON-Lines row is not an object"):
        jz.iter_jsonl(b"[1,2,3]\n", where="shard9")
    good = jz.write_jsonl_zst(_rows(50))
    with pytest.raises(ValueError, match="zstd"):
        jz.iter_jsonl(good[: len(good) // 2])


def test_read_jsonl_zst_shard_parallel(spark, tmp_path):
    """Spark surface: three shards (.zst single-frame, .zst
    multi-frame, plain .jsonl) in one directory — one task each,
    stable (shard, line_idx) identity, string projection with
    JSON-encoded non-strings and null for missing fields."""
    (tmp_path / "s0.jsonl.zst").write_bytes(jz.write_jsonl_zst(_rows(5)))
    (tmp_path / "s1.jsonl.zst").write_bytes(jz.write_jsonl_zst(_rows(6, 100), frames_of=2))
    plain = b"".join(
        json.dumps(r).encode() + b"\n" for r in _rows(3, 200)
    )
    (tmp_path / "s2.jsonl").write_bytes(plain)
    (tmp_path / "ignore.bin").write_bytes(b"\x00\x01")

    df = jz.read_jsonl_zst(spark, str(tmp_path), fields=["text", "meta", "missing"])
    rows = df.collect()
    assert len(rows) == 14
    by_key = {(r["shard"].rsplit("/", 1)[-1], r["line_idx"]): r for r in rows}
    assert by_key[("s1.jsonl.zst", 3)]["text"] == "document 103"
    assert json.loads(by_key[("s0.jsonl.zst", 2)]["meta"]) == {"lang": "en", "score": 2}
    assert by_key[("s2.jsonl", 0)]["missing"] is None
    # line_idx is dense per shard — the dedup-stable identity
    for shard, n in (("s0.jsonl.zst", 5), ("s1.jsonl.zst", 6), ("s2.jsonl", 3)):
        idxs = sorted(k[1] for k in by_key if k[0] == shard)
        assert idxs == list(range(n))


def test_expected_rows_manifest_catches_frame_boundary_truncation(spark, tmp_path):
    """A shard truncated exactly AT a frame boundary parses cleanly
    with fewer rows — undetectable from the bytes (ADVICE r08). The
    expected_rows manifest is the loud check for corpora that ship
    one; a stale/missing manifest entry is loud too."""
    rows = _rows(3)
    # frames_of=1 ⇒ the first frame alone IS the boundary-truncated shard
    (tmp_path / "full.jsonl.zst").write_bytes(jz.write_jsonl_zst(rows, frames_of=1))
    (tmp_path / "cut.jsonl.zst").write_bytes(jz.write_jsonl_zst(rows[:1]))

    good = {"full.jsonl.zst": 3, "cut.jsonl.zst": 1}
    df = jz.read_jsonl_zst(spark, str(tmp_path), fields=["text"], expected_rows=good)
    assert df.count() == 4

    truncated = {"full.jsonl.zst": 3, "cut.jsonl.zst": 3}
    with pytest.raises(Exception, match="manifest expects 3"):
        jz.read_jsonl_zst(
            spark, str(tmp_path), fields=["text"], expected_rows=truncated
        ).count()

    with pytest.raises(Exception, match="missing from expected_rows manifest"):
        jz.read_jsonl_zst(
            spark, str(tmp_path), fields=["text"],
            expected_rows={"full.jsonl.zst": 3},
        ).count()
