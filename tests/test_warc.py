"""WARC ingest tests: golden bytes pinned to the ISO 28500 grammar,
roundtrips through the per-record-gzip layout, HTTP payload
splitting, loud corruption, and the executor-parallel Spark read."""

from __future__ import annotations

import zlib

import pytest

from datapipeline_scripts_spark.sources import warc


def _response(doc: int, body: bytes, gzip_member=True) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
    )
    return warc.write_warc_record(
        "response",
        f"<urn:uuid:00000000-0000-0000-0000-{doc:012d}>",
        "2026-01-02T03:04:05Z",
        http,
        target_uri=f"https://example.org/doc/{doc}",
        content_type="application/http;msgtype=response",
        gzip_member=gzip_member,
    )


def test_golden_record_bytes():
    """The exact serialization the spec's grammar prescribes — version
    line, CRLF discipline, Content-Length in octets, double-CRLF
    terminator."""
    raw = warc.write_warc_record(
        "resource", "<urn:a>", "2026-01-02T03:04:05Z", b"hello",
        content_type="text/plain", gzip_member=False,
    )
    assert raw == (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:a>\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello\r\n\r\n"
    )
    (rec,) = warc.parse_warc(raw)
    assert rec["version"] == "WARC/1.0"
    assert rec["content"] == b"hello"
    assert rec["headers"]["warc-type"] == "resource"


def test_gzip_member_roundtrip_and_boundaries():
    """Three records, each its own gzip member (the splittable
    layout) — the member walk must find all three and keep order."""
    stream = b"".join(_response(i, f"body {i}".encode()) for i in range(3))
    members = warc.gunzip_members(stream)
    assert len(members) == 3
    recs = warc.parse_warc(stream)
    assert [r["headers"]["warc-target-uri"] for r in recs] == [
        f"https://example.org/doc/{i}" for i in range(3)
    ]
    for i, r in enumerate(recs):
        status, headers, body = warc.split_http(r["content"])
        assert (status, headers["content-type"], body) == (
            200, "text/plain", f"body {i}".encode(),
        )
    # a plain (uncompressed) concatenation parses identically
    plain = b"".join(_response(i, f"body {i}".encode(), gzip_member=False) for i in range(3))
    assert [r["content"] for r in warc.parse_warc(plain)] == [r["content"] for r in recs]


def test_header_continuation_and_case():
    raw = (
        b"WARC/1.1\r\n"
        b"warc-type: metadata\r\n"
        b"WARC-RECORD-ID: <urn:b>\r\n"
        b"X-Long: first\r\n\tsecond\r\n"
        b"Content-Length: 2\r\n"
        b"\r\nok\r\n\r\n"
    )
    (rec,) = warc.parse_warc(raw)
    assert rec["version"] == "WARC/1.1"
    assert rec["headers"]["warc-type"] == "metadata"
    assert rec["headers"]["x-long"] == "first second"
    assert rec["content"] == b"ok"


def test_corruption_is_loud():
    good = _response(1, b"abc", gzip_member=False)
    with pytest.raises(ValueError, match="version line"):
        warc.parse_warc(b"NOT A WARC\r\n" + good)
    with pytest.raises(ValueError, match="truncated"):
        warc.parse_warc(good[: len(good) - 10])
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n\r\n\r\n")
    gz = _response(1, b"abc")
    with pytest.raises(ValueError, match="gzip"):
        warc.gunzip_members(gz[: len(gz) // 2])
    with pytest.raises(ValueError, match="separator"):
        warc.split_http(b"no http here")


def test_read_warc_executor_parallel(spark, tmp_path):
    """The Spark surface: two .warc.gz files (one task each via
    binaryFile), mixed record types, HTTP fields split worker-side."""
    f1 = tmp_path / "a.warc.gz"
    info = warc.write_warc_record(
        "warcinfo", "<urn:info>", "2026-01-02T03:04:05Z",
        b"software: test\r\n", content_type="application/warc-fields",
    )
    f1.write_bytes(info + _response(1, b"alpha") + _response(2, b"beta"))
    f2 = tmp_path / "b.warc.gz"
    f2.write_bytes(_response(3, b"gamma"))
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")

    df = warc.read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 4
    by_uri = {r["target_uri"]: r for r in rows if r["warc_type"] == "response"}
    assert set(by_uri) == {f"https://example.org/doc/{i}" for i in (1, 2, 3)}
    for i, body in ((1, b"alpha"), (2, b"beta"), (3, b"gamma")):
        r = by_uri[f"https://example.org/doc/{i}"]
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/plain"
        assert bytes(r["body"]) == body
        assert r["record_idx"] in (0, 1, 2)
    info_rows = [r for r in rows if r["warc_type"] == "warcinfo"]
    assert len(info_rows) == 1 and info_rows[0]["http_status"] is None


def test_expected_records_manifest_catches_member_boundary_truncation(spark, tmp_path):
    """A .warc.gz truncated exactly AT a gzip member boundary parses
    cleanly with fewer records — undetectable from the bytes (ADVICE
    r08). The expected_records manifest is the loud check for crawls
    that ship one."""
    full = _response(1, b"alpha") + _response(2, b"beta") + _response(3, b"gamma")
    cut = _response(1, b"alpha")  # == full truncated at the first member boundary
    (tmp_path / "full.warc.gz").write_bytes(full)
    (tmp_path / "cut.warc.gz").write_bytes(cut)

    good = {"full.warc.gz": 3, "cut.warc.gz": 1}
    df = warc.read_warc(spark, str(tmp_path), expected_records=good)
    assert df.count() == 4

    with pytest.raises(Exception, match="manifest expects 3"):
        warc.read_warc(
            spark, str(tmp_path),
            expected_records={"full.warc.gz": 3, "cut.warc.gz": 3},
        ).count()

    with pytest.raises(Exception, match="missing from expected_records manifest"):
        warc.read_warc(
            spark, str(tmp_path), expected_records={"cut.warc.gz": 1}
        ).count()
