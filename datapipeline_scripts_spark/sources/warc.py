"""WARC (Web ARChive, ISO 28500) ingestion — the format web-crawl
training corpora actually arrive in (Common Crawl ships WARC/1.0
files of per-record gzip members). A 100 TB crawl ingest is
"parallelize over .warc.gz files, stream records inside each" — this
module provides exactly that shape on Spark: `read_warc` lists files
through the built-in `binaryFile` source (one executor task per
file, no driver-side listing loops) and walks records inside a
`mapInPandas` worker, so record parsing never leaves the executor
and only the projected columns cross into the JVM.

Format notes honored here, each pinned by a test:
- A record is `WARC/1.x CRLF` + named headers + CRLF CRLF + exactly
  Content-Length payload octets + CRLF CRLF. Header names are
  case-insensitive; values may wrap onto continuation lines (SP/TAB).
- A .warc.gz stores EACH RECORD as its own gzip member (that is what
  makes the format splittable at scale); the reader walks members
  with zlib and tolerates a plain uncompressed stream too.
- `response` records carry an HTTP message as payload:
  `split_http` separates status/headers/body without guessing at
  charsets (bytes in, bytes out).
- Truncated payloads, missing mandatory headers and non-WARC bytes
  refuse loudly. One honest limitation (inherent to every
  concatenated-member format, ADVICE r08): a file truncated exactly
  AT a gzip member boundary is indistinguishable from a shorter file
  — the surviving members parse cleanly. For corpora that ship
  manifests, `read_warc(expected_records=...)` closes that hole by
  checking each file's parsed record count against the manifest.

Proof posture, stated honestly: no canonical WARC implementation
exists inside this container, so the reader/writer pair is proven by
roundtrip plus golden bytes pinned to the ISO 28500 grammar; the
gzip layer underneath is the canonical zlib. (Same one-tier-weaker
posture as the AVI container, documented the same way.)

Reference parity: the reference's extract pipelines treat upstream
dumps as opaque files to snapshot (SURVEY.md §2.A9/A17); this module
is the corresponding crawl-corpus ingest surface for the
training-data extensions (SURVEY.md §2.E).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"


def gunzip_members(payload: bytes) -> list[bytes]:
    """Split a multi-member gzip stream into decompressed members —
    the .warc.gz record boundary walk. Plain (non-gzip) bytes return
    as a single pseudo-member."""
    if not payload[:2] == b"\x1f\x8b":
        return [bytes(payload)]
    members = []
    pos = 0
    n = len(payload)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(payload[pos:]))
        if not d.eof:
            raise ValueError("corrupt .warc.gz: truncated gzip member")
        consumed = n - pos - len(d.unused_data)
        pos += consumed
        # tolerate trailing zero padding some writers emit
        while pos < n and payload[pos] == 0:
            pos += 1
    return members


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC stream (plain or per-record-gzip) into records:
    {version, headers (lowercased names), content (bytes)}."""
    records: list[dict] = []
    for member in gunzip_members(bytes(payload)):
        pos = 0
        n = len(member)
        while pos < n:
            # skip inter-record CRLFs
            while member[pos : pos + 2] == _CRLF:
                pos += 2
            if pos >= n:
                break
            eol = member.find(_CRLF, pos)
            if eol < 0 or not member[pos:eol].startswith(b"WARC/"):
                raise ValueError(
                    f"corrupt WARC: expected a WARC/1.x version line at offset {pos}"
                )
            version = member[pos:eol].decode("ascii")
            pos = eol + 2
            headers: dict[str, str] = {}
            last: str | None = None
            while True:
                eol = member.find(_CRLF, pos)
                if eol < 0:
                    raise ValueError("corrupt WARC: unterminated header block")
                line = member[pos:eol]
                pos = eol + 2
                if not line:
                    break
                if line[:1] in (b" ", b"\t") and last is not None:
                    headers[last] += " " + line.strip().decode("utf-8", "replace")
                    continue
                name, sep, value = line.partition(b":")
                if not sep:
                    raise ValueError(f"corrupt WARC: malformed header line {line!r}")
                last = name.decode("ascii").strip().lower()
                headers[last] = value.strip().decode("utf-8", "replace")
            if "warc-type" not in headers or "content-length" not in headers:
                raise ValueError(
                    "corrupt WARC: record missing WARC-Type/Content-Length"
                )
            clen = int(headers["content-length"])
            if pos + clen > n:
                raise ValueError(
                    f"corrupt WARC: payload truncated ({n - pos} of {clen} octets)"
                )
            content = member[pos : pos + clen]
            pos += clen
            if member[pos : pos + 4] != _CRLF + _CRLF:
                raise ValueError("corrupt WARC: record not terminated by CRLF CRLF")
            pos += 4
            records.append({"version": version, "headers": headers, "content": content})
    return records


def split_http(content: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) from an HTTP response payload block."""
    sep = content.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("corrupt HTTP payload: no header/body separator")
    head_lines = content[:sep].split(_CRLF)
    parts = head_lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"corrupt HTTP payload: bad status line {head_lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        name, sep2, value = line.partition(b":")
        if sep2:
            headers[name.decode("ascii").strip().lower()] = value.strip().decode(
                "utf-8", "replace"
            )
    return status, headers, content[sep + 4 :]


def write_warc_record(
    warc_type: str,
    record_id: str,
    date: str,
    content: bytes,
    *,
    target_uri: str | None = None,
    content_type: str | None = None,
    extra: dict[str, str] | None = None,
    gzip_member: bool = True,
    gzip_level: int = 1,
) -> bytes:
    """One spec-conformant record, optionally as its own gzip member
    (the splittable .warc.gz layout). Deterministic: the caller owns
    ids and dates, nothing is sampled here.

    ``gzip_level`` defaults to 1 (fastest): every consumer of this
    writer immediately re-parses the member (roundtrip proof keys) or
    ships it once, and gzip decompression is level-independent, so the
    only effect of a higher level is encode CPU per byte (measured ~2×
    at level 6 — optimization r14, guide §1.2 per-task work). An
    archival writer that keeps .warc.gz on disk long-term can pass 6+
    for the better ratio; parse/roundtrip semantics are identical at
    any level."""
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + date.encode(),
    ]
    if target_uri is not None:
        head.append(b"WARC-Target-URI: " + target_uri.encode())
    if content_type is not None:
        head.append(b"Content-Type: " + content_type.encode())
    for k, v in (extra or {}).items():
        head.append(k.encode() + b": " + v.encode())
    head.append(b"Content-Length: " + str(len(content)).encode())
    raw = _CRLF.join(head) + _CRLF + _CRLF + content + _CRLF + _CRLF
    if not gzip_member:
        return raw
    co = zlib.compressobj(gzip_level, zlib.DEFLATED, 31)
    return co.compress(raw) + co.flush()


_WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def _warc_worker(
    batches: Iterator[pd.DataFrame],
    expected_records: dict[str, int] | None = None,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in _WARC_SCHEMA}
        for path, blob in zip(pdf["path"], pdf["content"]):
            records = parse_warc(bytes(blob))
            if expected_records is not None:
                want = expected_records.get(str(path))
                if want is None:
                    want = expected_records.get(str(path).rsplit("/", 1)[-1])
                if want is None:
                    raise ValueError(
                        f"{path}: file missing from expected_records manifest"
                    )
                if len(records) != want:
                    raise ValueError(
                        f"{path}: parsed {len(records)} records but the "
                        f"manifest expects {want} — possible member-boundary "
                        "truncation or a stale manifest"
                    )
            for i, rec in enumerate(records):
                h = rec["headers"]
                status, hct, body = None, None, rec["content"]
                if h["warc-type"] == "response" and h.get("content-type", "").startswith(
                    "application/http"
                ):
                    status, hh, body = split_http(rec["content"])
                    hct = hh.get("content-type")
                out["path"].append(path)
                out["record_idx"].append(i)
                out["warc_type"].append(h["warc-type"])
                out["record_id"].append(h.get("warc-record-id"))
                out["target_uri"].append(h.get("warc-target-uri"))
                out["warc_date"].append(h.get("warc-date"))
                out["content_type"].append(h.get("content-type"))
                out["content_length"].append(int(h["content-length"]))
                out["http_status"].append(status)
                out["http_content_type"].append(hct)
                out["body"].append(body)
        yield pd.DataFrame(out)


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    expected_records: dict[str, int] | None = None,
) -> DataFrame:
    """Crawl-corpus ingest: one executor task per WARC file (the
    Common Crawl parallelism unit), records parsed worker-side. The
    `binaryFile` source prunes to (path, content), so nothing but the
    file bytes and the projected record columns ever move.

    ``expected_records`` (file basename or full path → record count,
    e.g. from a crawl manifest) makes member-boundary truncation loud
    — a .warc.gz cut exactly between gzip members parses cleanly with
    fewer records, which the bytes alone cannot reveal (ADVICE r08).
    The dict ships inside the task closure (one int per file)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _warc_worker(batches, expected_records)

    return files.mapInPandas(worker, schema=_WARC_SCHEMA)
