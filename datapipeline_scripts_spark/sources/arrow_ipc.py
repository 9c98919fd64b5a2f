"""Arrow IPC (Feather V2) shard ingest/export — the interchange
format ML data tooling actually passes between processes (Arrow
Flight payloads, Feather files, HuggingFace Datasets' on-disk cache
is Arrow IPC under the hood). Same shard-parallel contract as the
other corpus formats (sources/warc.py, webdataset.py, jsonl_zst.py,
tfrecord.py): one executor task per shard via `binaryFile` listing,
decode worker-side with pyarrow (canonical — nothing hand-rolled),
save modes + writer-attested manifests via the shared shard sink
(sources/shard_sink.py).

What this module owns and the tests pin:

- TYPED columns survive the roundtrip — including BINARY, which the
  JSON-Lines sibling refuses by design (JSON has no bytes type);
  Arrow IPC is the text+bytes interchange lane between WebDataset
  (tar of files) and TFRecord (protobuf features).
- Truncation is loud BY CONSTRUCTION: the IPC *file* format ends in
  a footer + magic, so a shard cut at ANY byte — including a clean
  record-batch boundary — fails to open. This is strictly stronger
  than the concatenated-frame formats (zstd/TFRecord), whose
  boundary-truncation hole needs the manifest check (ADVICE r08);
  `read_arrow_ipc(expected_rows=...)` still supports the manifest
  for defense in depth (a stale/wrong WRITER can also produce a
  short shard — the footer can't see that).
- Buffer compression (none/zstd/lz4) is a per-shard writer choice
  and transparent to readers — mixed directories work.
- Field projection (`fields`) materializes only the requested
  columns worker-side; the IPC file layout makes this a true
  column skip (record-batch buffers are per-column).

Reference parity: the reference snapshots upstream dumps as opaque
files (SURVEY.md §2.A9/A17); this is the typed-interchange ingest
surface beside WARC/WebDataset/jsonl.zst/TFRecord.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.ipc as paipc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SPARK_TYPES = {
    "int64": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}


def _norm_path(p: str) -> str:
    """Canonical filesystem path for manifest lookups. Spark's
    binaryFile source reports URI-form paths (``file:/a/b``,
    ``file:///a/b``) while writer manifests record plain local paths
    (``/a/b``) — without normalizing both sides the full-path lookup
    never matched and every read silently fell through to the
    basename map (ADVICE r10). binaryFile additionally percent-encodes
    unsafe characters (a space becomes %20) and may carry an authority
    (``file://host/a/b``) — parse as a URI so the authority never folds
    into the path as a directory segment and encoded characters match
    the manifest's plain local spelling (ADVICE r11)."""
    import os.path
    from urllib.parse import unquote, urlparse

    if p.startswith("file:"):
        u = urlparse(p)
        # drop the authority (host) — manifests record local paths;
        # unquote AFTER parsing so %2F in a segment can't split it.
        p = unquote(u.path)
    return os.path.normpath(p)


def write_arrow_ipc(
    rows: list[dict],
    compression: str | None = None,
    batches_of: int | None = None,
) -> bytes:
    """One Arrow IPC *file* (Feather V2) from dict rows. `compression`
    ∈ {None, 'zstd', 'lz4'} applies pyarrow's buffer compression;
    `batches_of` splits the table into record batches of that many
    rows (the append-writer layout readers must walk completely)."""
    table = pa.Table.from_pylist(rows)
    opts = paipc.IpcWriteOptions(compression=compression)
    sink = io.BytesIO()
    with paipc.new_file(sink, table.schema, options=opts) as w:
        if batches_of is None:
            w.write_table(table)
        else:
            for i in range(0, max(len(rows), 1), batches_of):
                w.write_table(table.slice(i, batches_of))
    return sink.getvalue()


def read_arrow_ipc_bytes(payload: bytes, *, where: str = "<bytes>") -> pa.Table:
    """All record batches of one IPC file as a Table. Loud on ANY
    truncation or corruption — the file format's trailing footer +
    magic make a cut shard unopenable, there is no silent-prefix
    failure mode to defend against."""
    try:
        return paipc.open_file(pa.BufferReader(bytes(payload))).read_all()
    except pa.ArrowInvalid as e:
        raise ValueError(f"{where}: not a valid Arrow IPC file ({e})") from None


def read_arrow_ipc(
    spark: SparkSession,
    path: str,
    fields: dict[str, str],
    glob: str = "*.arrow",
    expected_rows: dict[str, int] | None = None,
) -> DataFrame:
    """Shard-parallel typed ingest: one executor task per .arrow
    shard, decoded worker-side, projecting `fields` (name → one of
    int64/double/string/binary; a field absent from a shard is
    null). Row identity is (shard, row_idx) — stable across
    re-reads. ``expected_rows`` (shard basename or full path → row
    count) additionally pins each shard's row count to a manifest —
    the footer already catches byte truncation, the manifest catches
    a writer that legitimately wrote fewer rows than the corpus
    ledger says."""
    for f, t in fields.items():
        if t not in _SPARK_TYPES:
            raise ValueError(f"field {f!r}: unsupported type {t!r}")
    if expected_rows is not None:
        # normalize once driver-side; entries that collide after
        # normalization (full path or basename) make the lookup
        # unsafe — poison them so the reader refuses loudly instead
        # of last-writer-wins (ADVICE r11).
        _full_rows: dict[str, int | None] = {}
        for k, v in expected_rows.items():
            nk = _norm_path(k)
            _full_rows[nk] = None if nk in _full_rows else v
        _base_rows: dict[str, int | None] = {}
        for k, v in expected_rows.items():
            b = k.rsplit("/", 1)[-1]
            _base_rows[b] = None if b in _base_rows else v
    else:
        _full_rows, _base_rows = {}, {}
    schema = T.StructType(
        [
            T.StructField("shard", T.StringType()),
            T.StructField("row_idx", T.LongType()),
        ]
        + [T.StructField(f, _SPARK_TYPES[t]) for f, t in fields.items()]
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema}
            for p, blob in zip(pdf["path"], pdf["content"]):
                table = read_arrow_ipc_bytes(bytes(blob), where=str(p))
                n = table.num_rows
                if expected_rows is not None:
                    norm = _norm_path(str(p))
                    if norm in _full_rows and _full_rows[norm] is None:
                        raise ValueError(
                            f"{p}: path {norm!r} is ambiguous across "
                            "manifest entries after normalization — "
                            "de-duplicate the manifest to disambiguate"
                        )
                    want = _full_rows.get(norm)
                    if want is None:
                        base = norm.rsplit("/", 1)[-1]
                        if base in _base_rows and _base_rows[base] is None:
                            raise ValueError(
                                f"{p}: basename {base!r} is ambiguous across "
                                "manifest entries — record full paths in the "
                                "manifest to disambiguate"
                            )
                        want = _base_rows.get(base)
                    if want is None:
                        raise ValueError(
                            f"{p}: shard missing from expected_rows manifest"
                        )
                    if n != want:
                        raise ValueError(
                            f"{p}: shard holds {n} rows but the manifest "
                            f"expects {want} — short write or stale manifest"
                        )
                cols = {}
                for f in fields:
                    if f in table.column_names:
                        cols[f] = table.column(f).to_pylist()
                    else:
                        cols[f] = [None] * n
                for i in range(n):
                    out["shard"].append(str(p))
                    out["row_idx"].append(i)
                    for f in fields:
                        out[f].append(cols[f][i])
            yield pd.DataFrame(out)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(worker, schema=schema)


def write_arrow_ipc_dataset(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    batches_of: int | None = None,
    mode: str = "error",
    manifest: bool = False,
) -> list:
    """Write a DataFrame as .arrow shards, one per partition, written
    by the executors. Long/double/string/binary columns pass through
    natively (the binary lane JSON-Lines cannot carry); manifest
    n_records counts ROWS, the unit `read_arrow_ipc(expected_rows=)`
    verifies. Save modes + manifest per the shared shard-sink
    contract (sources/shard_sink.py)."""
    from datapipeline_scripts_spark.sources.shard_sink import write_shard_dataset

    def encode_partition(rows):
        dicts = [r.asDict(recursive=True) for r in rows]
        if not dicts:
            return None
        return (
            write_arrow_ipc(dicts, compression=compression, batches_of=batches_of),
            len(dicts),
        )

    return write_shard_dataset(
        df,
        path,
        ".arrow",
        encode_partition,
        empty_payload=lambda: write_arrow_ipc([]),
        mode=mode,
        manifest=manifest,
    )
