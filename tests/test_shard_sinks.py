"""Distributed shard-sink tests for the WebDataset and .jsonl.zst
export halves (the TFRecord sink is covered in test_tfexample.py;
all three share sources/shard_sink.py): executor-written shards
roundtrip through the production readers, writer-attested manifests
verify, save modes hold, and the binary-in-JSON refusal is loud."""

from __future__ import annotations

import json
import os

import pytest

from datapipeline_scripts_spark.sources import jsonl_zst as jz
from datapipeline_scripts_spark.sources import webdataset as wds


def test_webdataset_export_import_roundtrip(spark, tmp_path):
    rows = [
        (f"{i:06d}", f"doc {i}", bytes([i, 255 - i]), str(i % 3) if i % 4 else None)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "k string, txt string, payload binary, cls string"
    ).repartition(3)
    out = str(tmp_path / "wds")
    entries = wds.write_webdataset_dataset(
        df, out, key_col="k",
        file_cols={"txt": "txt", "bin": "payload", "cls": "cls"},
        manifest=True,
    )
    assert sum(e["n_records"] for e in entries) == 8
    assert all(e["path"].endswith(".tar") for e in entries)
    for e in entries:  # manifest attests the on-disk bytes
        blob = open(e["path"], "rb").read()
        assert len(blob) == e["n_bytes"]

    got = {r["key"]: r["files"] for r in wds.read_webdataset(spark, out).collect()}
    assert len(got) == 8
    assert bytes(got["000004"]["txt"]) == b"doc 4"
    assert bytes(got["000004"]["bin"]) == bytes([4, 251])
    assert "cls" not in got["000004"]  # NULL column omitted from the sample
    assert bytes(got["000003"]["cls"]) == b"0"

    with pytest.raises(FileExistsError):
        wds.write_webdataset_dataset(df, out, key_col="k", file_cols={"txt": "txt"})
    replaced = wds.write_webdataset_dataset(
        df, out, key_col="k", file_cols={"txt": "txt"}, mode="overwrite", gzipped=True
    )
    assert all(p.endswith(".tar.gz") for p in replaced)
    assert wds.read_webdataset(spark, out).count() == 8


def test_jsonl_zst_export_import_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}", {"lang": "en", "score": i}) for i in range(9)],
        "id long, text string, meta map<string,string>",
    ).repartition(3)
    out = str(tmp_path / "jz")
    entries = jz.write_jsonl_zst_dataset(df, out, frames_of=2, manifest=True)
    assert sum(e["n_records"] for e in entries) == 9
    assert all(e["path"].endswith(".jsonl.zst") for e in entries)

    # manifest feeds the reader's truncation check directly
    expected = {os.path.basename(e["path"]): e["n_records"] for e in entries}
    got = jz.read_jsonl_zst(
        spark, out, fields=["id", "text", "meta"], expected_rows=expected
    ).collect()
    assert len(got) == 9
    by_id = {int(r["id"]): r for r in got}
    assert by_id[4]["text"] == "doc 4"
    assert json.loads(by_id[4]["meta"]) == {"lang": "en", "score": "4"}

    # binary columns refuse loudly — JSON has no bytes type
    bdf = spark.createDataFrame([(b"\x00",)], "payload binary")
    with pytest.raises(Exception, match="binary"):
        jz.write_jsonl_zst_dataset(bdf, str(tmp_path / "bad"))

    # all-empty frame → one valid empty shard
    empty_out = str(tmp_path / "empty")
    files = jz.write_jsonl_zst_dataset(df.filter("id < 0"), empty_out)
    assert len(files) == 1
    assert jz.read_jsonl_zst(spark, empty_out, fields=["id"]).count() == 0
