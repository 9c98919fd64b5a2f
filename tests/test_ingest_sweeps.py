"""Seeded generative sweeps for the corpus-ingest surfaces — same
discipline as the codec sweeps: random record/sample/line populations
through the full write→parse chain, exact equality throughout."""

from __future__ import annotations

import random
import string

import pytest

from datapipeline_scripts_spark.sources import jsonl_zst as jz
from datapipeline_scripts_spark.sources import warc
from datapipeline_scripts_spark.sources import webdataset as wds


@pytest.mark.parametrize("seed", range(10))
def test_warc_random_streams(seed):
    """Random record mixes: types, optional headers, binary bodies
    that CONTAIN the CRLF-CRLF separator (Content-Length framing must
    never scan the payload), per-record gzip or plain."""
    rnd = random.Random(6000 + seed)
    gz = rnd.random() < 0.5
    recs = []
    for i in range(rnd.randint(1, 8)):
        body = bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 300)))
        body += b"\r\n\r\nWARC/1.0\r\n"  # adversarial: fake separator + version line
        recs.append(
            warc.write_warc_record(
                rnd.choice(["response", "request", "metadata", "resource"]),
                f"<urn:sweep:{seed}:{i}>",
                "2026-03-04T05:06:07Z",
                body,
                target_uri=f"https://s/{i}" if rnd.random() < 0.7 else None,
                content_type="application/octet-stream",
                extra={"X-K": "".join(rnd.choices(string.ascii_letters, k=9))},
                gzip_member=gz,
            )
        )
    parsed = warc.parse_warc(b"".join(recs))
    assert len(parsed) == len(recs)
    for i, rec in enumerate(parsed):
        assert rec["headers"]["warc-record-id"] == f"<urn:sweep:{seed}:{i}>"
        assert rec["content"].endswith(b"\r\n\r\nWARC/1.0\r\n")
        assert int(rec["headers"]["content-length"]) == len(rec["content"])


@pytest.mark.parametrize("seed", range(10))
def test_jsonl_zst_random_streams(seed):
    """Random row populations: unicode text, nested values, random
    frame sizes — the parse must return exactly the input rows."""
    rnd = random.Random(7000 + seed)
    alphabet = string.printable + "äöüßéπ漢字😀"
    rows = [
        {
            "id": i,
            "text": "".join(rnd.choices(alphabet, k=rnd.randint(0, 60))),
            "nested": {"a": [i, i * 2], "b": None if i % 3 else "x"},
        }
        for i in range(rnd.randint(1, 40))
    ]
    frames = rnd.choice([None, 1, 3, 7])
    shard = jz.write_jsonl_zst(rows, frames_of=frames)
    assert jz.iter_jsonl(shard) == rows


@pytest.mark.parametrize("seed", range(10))
def test_webdataset_random_shards(seed):
    """Random sample populations: member counts, extension shapes
    (incl. multi-dot), binary payloads, gz on/off — the walk must
    reproduce the exact sample list."""
    rnd = random.Random(8000 + seed)
    exts = ["jpg", "txt", "json", "cls", "seg.npy", "feat.bin"]
    samples = []
    for i in range(rnd.randint(1, 12)):
        n = rnd.randint(1, 4)
        files = {
            e: bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 120)))
            for e in rnd.sample(exts, n)
        }
        prefix = rnd.choice(["", "a/", "b/c/"])
        samples.append((f"{prefix}{i:06d}", files))
    shard = wds.write_webdataset_shard(samples, gzipped=rnd.random() < 0.5)
    assert wds.iter_samples(shard) == samples
