"""WebDataset tar-shard ingest — the de-facto packaging for
multimodal training data: a dataset is a set of POSIX tar "shards",
each sample a run of ADJACENT members sharing a basename key and
differing by extension (`000123.jpg`, `000123.txt`,
`000123.json`, …). Shard-level parallelism is the whole point of the
format, and it maps one-to-one onto Spark here: `read_webdataset`
lists shards through the built-in `binaryFile` source (one executor
task per shard, the same unit a 1000-executor cluster would use) and
walks samples inside `mapInPandas`, emitting one row per sample with
the member payloads as an ext→binary map.

The tar layer is the stdlib's `tarfile` — a canonical, decades-old
implementation; there is nothing to hand-roll and no custom codec to
prove. What this module owns, and what the tests pin, is the
WebDataset CONTRACT on top of tar:
- the sample key is the path minus its FIRST dotted suffix chain
  segment's extension (`a/b/000123.seg.npy` → key `a/b/000123`,
  ext `seg.npy` — multi-dot extensions belong to the ext, matching
  the reference implementation's `base_plus_ext` split);
- members of one sample are adjacent; a key reappearing later in the
  shard is a DIFFERENT occurrence and refuses loudly (silent
  regrouping would merge distinct samples);
- duplicate extensions within one sample refuse loudly;
- non-file members (directories, symlinks) are skipped;
- `.tar` and `.tar.gz`/`.tgz` shards both read (tarfile sniffs).

Reference parity: the reference treats upstream data as opaque files
to move (SURVEY.md §2.A9/A17); this is the corresponding
training-shard ingest surface beside `sources/warc.py`, feeding the
multimodal decode family (extensions/*_stdlib.py) with real bytes.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def base_plus_ext(path: str) -> tuple[str, str]:
    """WebDataset key split: `dir/name.tail.ext` → (`dir/name`,
    `tail.ext`) — the dot split happens at the FIRST dot of the
    basename, so multi-suffix extensions stay whole."""
    dirname, _, basename = path.rpartition("/")
    stem, dot, ext = basename.partition(".")
    if not dot or not stem:
        raise ValueError(
            f"member {path!r} has no extension — not a WebDataset sample member"
        )
    return (dirname + "/" + stem if dirname else stem), ext


def iter_samples(shard: bytes) -> list[tuple[str, dict[str, bytes]]]:
    """Samples of one shard, in shard order: [(key, {ext: bytes})].
    Adjacency is the grouping rule; violations refuse loudly."""
    samples: list[tuple[str, dict[str, bytes]]] = []
    seen_keys: set[str] = set()
    cur_key: str | None = None
    cur: dict[str, bytes] = {}
    with tarfile.open(fileobj=io.BytesIO(bytes(shard))) as tf:
        for member in tf:
            if not member.isfile():
                continue
            key, ext = base_plus_ext(member.name)
            if key != cur_key:
                if cur_key is not None:
                    samples.append((cur_key, cur))
                if key in seen_keys:
                    raise ValueError(
                        f"shard violates WebDataset adjacency: key {key!r} "
                        "reappears after other samples"
                    )
                seen_keys.add(key)
                cur_key, cur = key, {}
            if ext in cur:
                raise ValueError(f"sample {key!r} has duplicate extension {ext!r}")
            fh = tf.extractfile(member)
            cur[ext] = fh.read() if fh is not None else b""
    if cur_key is not None:
        samples.append((cur_key, cur))
    return samples


def write_webdataset_shard(
    samples: list[tuple[str, dict[str, bytes]]],
    *,
    gzipped: bool = False,
) -> bytes:
    """A spec-shaped shard: members emitted sample by sample (the
    adjacency contract), deterministic metadata (zeroed mtime/uid) so
    identical inputs produce identical shards."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gzipped else "w") as tf:
        for key, files in samples:
            for ext in sorted(files):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(files[ext])
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(files[ext]))
    return buf.getvalue()


_WDS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("files", T.MapType(T.StringType(), T.BinaryType())),
    ]
)


def _wds_worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in _WDS_SCHEMA}
        for path, blob in zip(pdf["path"], pdf["content"]):
            for i, (key, files) in enumerate(iter_samples(bytes(blob))):
                out["shard"].append(path)
                out["sample_idx"].append(i)
                out["key"].append(key)
                out["files"].append(files)
        yield pd.DataFrame(out)


def read_webdataset(
    spark: SparkSession, path: str, glob: str = "*.tar*"
) -> DataFrame:
    """Shard-parallel sample ingest: one executor task per tar shard
    via `binaryFile`, one output row per sample with the member map.
    Downstream feature extraction joins this straight into the
    multimodal decode family without any further shuffle — the map
    column keeps a sample's modalities co-located by construction."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_wds_worker, schema=_WDS_SCHEMA)


def write_webdataset_dataset(
    df: DataFrame,
    path: str,
    key_col: str,
    file_cols: dict[str, str],
    gzipped: bool = False,
    mode: str = "error",
    manifest: bool = False,
) -> list:
    """Write a DataFrame as WebDataset tar shards, one shard per
    partition, written by the executors (the export half of the
    multimodal-shard story — pack a corpus in Spark, hand `.tar`
    shards straight to a trainer's WebDataset loader). ``key_col``
    supplies each sample's base key (cast to string; must satisfy the
    no-dot key grammar `base_plus_ext` enforces on read);
    ``file_cols`` maps tar member extension → column (binary or
    string; string encodes utf-8; NULL columns are omitted from the
    sample). Save modes + optional writer-attested manifest: the
    shared shard-sink contract (sources/shard_sink.py) — manifest
    n_records counts SAMPLES. Determinism: zeroed tar metadata via
    `write_webdataset_shard`, so identical partitions give identical
    shard bytes."""
    from pyspark.sql import functions as F

    from datapipeline_scripts_spark.sources.shard_sink import write_shard_dataset

    exts = sorted(file_cols)
    cols = [F.col(key_col).cast("string").alias("__key")] + [
        F.col(file_cols[e]).alias(f"__f_{e}") for e in exts
    ]

    def encode_partition(rows):
        samples = []
        for r in rows:
            files = {}
            for e in exts:
                v = r[f"__f_{e}"]
                if v is None:
                    continue
                files[e] = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            samples.append((r["__key"], files))
        if not samples:
            return None
        return write_webdataset_shard(samples, gzipped=gzipped), len(samples)

    return write_shard_dataset(
        df.select(*cols),
        path,
        ".tar.gz" if gzipped else ".tar",
        encode_partition,
        empty_payload=lambda: write_webdataset_shard([], gzipped=gzipped),
        mode=mode,
        manifest=manifest,
    )
