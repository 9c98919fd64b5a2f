"""Zstandard-compressed JSON-Lines shard ingest — the packaging the
current generation of public text corpora actually ships (Dolma, The
Pile, RedPajama: one `.jsonl.zst` shard per worker-unit, one JSON
document per line). Spark's own text reader can't split zstd without
a native Hadoop codec on every executor; at shard granularity it
doesn't need to — the formats are DESIGNED shard-parallel, so this
module maps one executor task per shard (built-in `binaryFile`
listing) and streams decompress + parse inside `mapInPandas`,
exactly like `sources/warc.py` and `sources/webdataset.py`.

The zstd layer is pyarrow's bundled libzstd — canonical, nothing
hand-rolled (same rationale as stdlib tarfile in webdataset.py); the
JSON layer is stdlib json. What this module owns and the tests pin:
- multi-FRAME streams concatenate (writers append frames; a reader
  that stops at the first frame silently drops data — ours walks all
  of them via a streaming decompressor);
- plain uncompressed `.jsonl` reads through the same path (sniffed
  by the zstd magic), so mixed directories work;
- blank lines are skipped per the JSON-Lines convention; a
  non-object line, invalid JSON, or a MID-FRAME zstd truncation
  refuses loudly with the shard path and line number — silent row
  drops are how corpus bugs hide. One honest limitation (inherent to
  every concatenated-frame format, ADVICE r08): a shard truncated
  exactly AT a frame boundary is indistinguishable from a shorter
  shard — the surviving frames parse cleanly. For corpora that ship
  manifests, `read_jsonl_zst(expected_rows=...)` closes that hole by
  checking each shard's parsed row count against the manifest;
- field projection happens at parse time (`fields=`), so only the
  requested columns ever materialize — the worker-side analogue of
  column pruning.

Reference parity: the reference snapshots upstream dumps as opaque
files (SURVEY.md §2.A9/A17); this is the text-corpus ingest surface
beside WARC (crawl) and WebDataset (multimodal shards), feeding the
text-analysis operators (extensions/textstats.py) with real shard
bytes.
"""

from __future__ import annotations

import io
import json
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def decompress_zst(payload: bytes) -> bytes:
    """All frames of a zstd stream, concatenated; plain bytes pass
    through. Loud on MID-frame truncation; truncation at a frame
    boundary cannot be detected from the bytes alone (the stream
    format carries no trailer) — see ``read_jsonl_zst(expected_rows)``
    for the manifest-backed check."""
    payload = bytes(payload)
    if payload[:4] != _ZSTD_MAGIC:
        return payload
    try:
        stream = pa.input_stream(io.BytesIO(payload), compression="zstd")
        return stream.read()
    except (OSError, pa.ArrowInvalid) as exc:
        raise ValueError(f"corrupt zstd stream: {exc}") from exc


def iter_jsonl(payload: bytes, *, where: str = "<bytes>") -> list[dict]:
    """Parsed objects of a (possibly zstd) JSON-Lines shard, in line
    order. Blank lines skip; anything else malformed names the shard
    and 1-based line number."""
    raw = decompress_zst(payload)
    out: list[dict] = []
    for lineno, line in enumerate(raw.split(b"\n"), start=1):
        if not line.strip():
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError as exc:
            raise ValueError(f"{where}:{lineno}: invalid JSON line: {exc}") from exc
        if not isinstance(obj, dict):
            raise ValueError(
                f"{where}:{lineno}: JSON-Lines row is not an object "
                f"({type(obj).__name__})"
            )
        out.append(obj)
    return out


def write_jsonl_zst(rows: list[dict], *, frames_of: int | None = None) -> bytes:
    """A canonical shard: compact separators, one object per line,
    zstd-compressed. `frames_of=N` closes a frame every N rows — the
    append-style layout real writers produce, which readers must
    concatenate."""
    groups: list[list[dict]]
    if frames_of:
        groups = [rows[i : i + frames_of] for i in range(0, len(rows), frames_of)]
    else:
        groups = [rows]
    out = bytearray()
    codec = pa.Codec("zstd")
    for g in groups:
        text = b"".join(
            json.dumps(r, separators=(",", ":"), sort_keys=True).encode() + b"\n"
            for r in g
        )
        out += codec.compress(text, asbytes=True)
    return bytes(out)


def read_jsonl_zst(
    spark: SparkSession,
    path: str,
    fields: list[str],
    glob: str = "*.jsonl*",
    expected_rows: dict[str, int] | None = None,
) -> DataFrame:
    """Shard-parallel corpus ingest: one executor task per
    .jsonl(.zst) shard, decompress + parse worker-side, projecting
    `fields` (strings; missing fields are null). Row identity is
    (shard, line_idx) — stable across re-reads, the join key a
    dedup/decontamination pass needs.

    ``expected_rows`` (shard basename or full path → row count, e.g.
    from a corpus manifest) makes frame-boundary truncation loud: a
    zstd stream cut exactly between frames parses cleanly with fewer
    rows, which the bytes alone cannot reveal (ADVICE r08) — the
    worker refuses any shard whose parsed count disagrees. The dict
    ships to executors inside the task closure (one int per shard —
    a few MB even at 100k-shard corpus scale)."""
    schema = T.StructType(
        [
            T.StructField("shard", T.StringType()),
            T.StructField("line_idx", T.LongType()),
        ]
        + [T.StructField(f, T.StringType()) for f in fields]
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema}
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows = iter_jsonl(bytes(blob), where=str(p))
                if expected_rows is not None:
                    want = expected_rows.get(str(p))
                    if want is None:
                        want = expected_rows.get(str(p).rsplit("/", 1)[-1])
                    if want is None:
                        raise ValueError(
                            f"{p}: shard missing from expected_rows manifest"
                        )
                    if len(rows) != want:
                        raise ValueError(
                            f"{p}: parsed {len(rows)} rows but the manifest "
                            f"expects {want} — possible frame-boundary "
                            "truncation or a stale manifest"
                        )
                for i, obj in enumerate(rows):
                    out["shard"].append(p)
                    out["line_idx"].append(i)
                    for f in fields:
                        v = obj.get(f)
                        out[f].append(
                            v
                            if isinstance(v, str)
                            else (None if v is None else json.dumps(v))
                        )
            yield pd.DataFrame(out)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(worker, schema=schema)


def write_jsonl_zst_dataset(
    df: DataFrame,
    path: str,
    frames_of: int | None = None,
    mode: str = "error",
    manifest: bool = False,
) -> list:
    """Write a DataFrame as .jsonl.zst shards, one shard per
    partition, written by the executors (the export half of the
    text-corpus story — the Dolma/Pile packaging, straight from
    Spark). Every column becomes a JSON field (nested structs/arrays/
    maps recurse; binary refuses loudly — JSON has no bytes type, put
    binary corpora in WebDataset/TFRecord shards instead);
    ``frames_of`` forwards to `write_jsonl_zst` (frame-per-N-rows, the
    append-writer layout). Save modes + optional writer-attested
    manifest per the shared shard-sink contract
    (sources/shard_sink.py) — manifest n_records counts LINES, the
    unit `read_jsonl_zst(expected_rows=...)` verifies."""
    from datapipeline_scripts_spark.sources.shard_sink import write_shard_dataset

    def encode_partition(rows):
        dicts = []
        for r in rows:
            d = r.asDict(recursive=True)
            for k, v in d.items():
                if isinstance(v, (bytes, bytearray)):
                    raise TypeError(
                        f"column {k!r} is binary; JSON-Lines shards cannot "
                        "carry bytes — use write_webdataset_dataset or "
                        "write_tfrecord_dataset for binary corpora"
                    )
            dicts.append(d)
        if not dicts:
            return None
        return write_jsonl_zst(dicts, frames_of=frames_of), len(dicts)

    return write_shard_dataset(
        df,
        path,
        ".jsonl.zst",
        encode_partition,
        empty_payload=lambda: write_jsonl_zst([]),
        mode=mode,
        manifest=manifest,
    )
