"""tf.Example codec tests: bit-exactness against the canonical JVM
protobuf runtime (the shaded protobuf-java inside Spark's ORC jars —
the same oracle the generic protobuf tier is proven against), wire
semantics (packed+unpacked, duplicate map keys, unknown-field skip,
loud truncation), a seeded generative sweep, the distributed TFRecord
sink's save modes, and the typed Spark reader."""

from __future__ import annotations

import random
import struct

import pytest

from datapipeline_scripts_spark.sources import tfexample as tfe
from datapipeline_scripts_spark.sources import tfrecord as tfr


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        if v > 0x7F:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        else:
            out.append(v)
            return bytes(out)


# ---- pure codec --------------------------------------------------------------


def test_roundtrip_all_kinds_and_determinism():
    features = {
        "text": [b"h\xc3\xa9llo", "plain", b""],
        "ids": [1, -2, 1 << 62, -(1 << 62)],
        "scores": [0.5, -1.25, 3.75],
        "empty_ints": ("int64", []),
    }
    data = tfe.encode_example(features)
    assert tfe.encode_example(features) == data  # deterministic
    got = tfe.decode_example(data)
    assert got["text"] == ("bytes", [b"h\xc3\xa9llo", b"plain", b""])
    assert got["ids"] == ("int64", [1, -2, 1 << 62, -(1 << 62)])
    assert got["scores"] == ("float", [0.5, -1.25, 3.75])
    # an explicitly-typed empty list still emits its (empty) kind message
    assert got["empty_ints"] == ("int64", [])


def _build_tfexample_descriptor(spark):
    """FileDescriptorProto for the public tf.Example schema
    (tensorflow/core/example/{example,feature}.proto), numeric lists
    packed as TensorFlow's writers emit them. The Features map field
    is declared as a repeated entry message — wire-identical to
    map<string, Feature>."""
    jvm = spark._jvm
    pb = jvm.org.apache.orc.protobuf
    DP = pb.DescriptorProtos
    FT = DP.FieldDescriptorProto.Type
    FL = DP.FieldDescriptorProto.Label

    def field(name, num, ftype, label=None, type_name=None, packed=False, oneof=None):
        f = DP.FieldDescriptorProto.newBuilder()
        f.setName(name)
        f.setNumber(num)
        f.setType(ftype)
        f.setLabel(label or FL.LABEL_OPTIONAL)
        if type_name:
            f.setTypeName(type_name)
        if packed:
            f.setOptions(DP.FieldOptions.newBuilder().setPacked(True))
        if oneof is not None:
            f.setOneofIndex(oneof)
        return f

    fdp = DP.FileDescriptorProto.newBuilder()
    fdp.setName("tfexample.proto")
    fdp.setPackage("tf")

    for list_name, ftype, packed in (
        ("BytesList", FT.TYPE_BYTES, False),
        ("FloatList", FT.TYPE_FLOAT, True),
        ("Int64List", FT.TYPE_INT64, True),
    ):
        m = DP.DescriptorProto.newBuilder()
        m.setName(list_name)
        m.addField(field("value", 1, ftype, label=FL.LABEL_REPEATED, packed=packed))
        fdp.addMessageType(m)

    feat = DP.DescriptorProto.newBuilder()
    feat.setName("Feature")
    # the public feature.proto declares `oneof kind { ... }` — the
    # oneof matters for wire-merge semantics (a later DIFFERENT member
    # clears the earlier one; repeats of the SAME member merge), so
    # the oracle descriptor must carry it
    feat.addOneofDecl(DP.OneofDescriptorProto.newBuilder().setName("kind"))
    feat.addField(field("bytes_list", 1, FT.TYPE_MESSAGE, type_name=".tf.BytesList", oneof=0))
    feat.addField(field("float_list", 2, FT.TYPE_MESSAGE, type_name=".tf.FloatList", oneof=0))
    feat.addField(field("int64_list", 3, FT.TYPE_MESSAGE, type_name=".tf.Int64List", oneof=0))
    fdp.addMessageType(feat)

    feats = DP.DescriptorProto.newBuilder()
    feats.setName("Features")
    entry = DP.DescriptorProto.newBuilder()
    entry.setName("FeatureEntry")
    entry.addField(field("key", 1, FT.TYPE_STRING))
    entry.addField(field("value", 2, FT.TYPE_MESSAGE, type_name=".tf.Feature"))
    feats.addNestedType(entry)
    feats.addField(
        field("feature", 1, FT.TYPE_MESSAGE, label=FL.LABEL_REPEATED,
              type_name=".tf.Features.FeatureEntry")
    )
    fdp.addMessageType(feats)

    ex = DP.DescriptorProto.newBuilder()
    ex.setName("Example")
    ex.addField(field("features", 1, FT.TYPE_MESSAGE, type_name=".tf.Features"))
    fdp.addMessageType(ex)
    return fdp.build()


def test_canonical_jvm_bit_exact(spark):
    """The strongest proof available in-container: the canonical
    protobuf-java runtime serializes the SAME example to the SAME
    bytes our encoder emits (features listed in sorted-name order,
    numeric lists packed), and parses our bytes back to the same
    message it built."""
    jvm = spark._jvm
    pb = jvm.org.apache.orc.protobuf
    fdp = _build_tfexample_descriptor(spark)
    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp, arr)
    example_t = fd.findMessageTypeByName("Example")

    text = """
    features {
      feature { key: "ids" value { int64_list { value: 1 value: -2 value: 4611686018427387904 } } }
      feature { key: "scores" value { float_list { value: 0.5 value: -1.25 } } }
      feature { key: "text" value { bytes_list { value: "h\\xc3\\xa9llo" value: "\\000\\377" } } }
    }
    """
    b = pb.DynamicMessage.newBuilder(example_t)
    pb.TextFormat.merge(text, b)
    canonical = bytes(b.build().toByteArray())

    ours = tfe.encode_example(
        {
            "ids": [1, -2, 1 << 62],
            "scores": [0.5, -1.25],
            "text": [b"h\xc3\xa9llo", b"\x00\xff"],
        }
    )
    assert ours == canonical  # bit-exact encode

    # and the canonical runtime accepts our bytes as the same message
    reparsed = pb.DynamicMessage.parseFrom(example_t, ours)
    assert bytes(reparsed.toByteArray()) == canonical
    # our decoder reads the canonical bytes back to the same values
    got = tfe.decode_example(canonical)
    assert got["ids"] == ("int64", [1, -2, 1 << 62])
    assert got["scores"] == ("float", [0.5, -1.25])
    assert got["text"] == ("bytes", [b"h\xc3\xa9llo", b"\x00\xff"])


@pytest.mark.parametrize("seed", range(10))
def test_random_examples_roundtrip(seed):
    rnd = random.Random(9200 + seed)
    features = {}
    for i in range(rnd.randint(0, 8)):
        kind = rnd.choice(["bytes", "int64", "float"])
        n = rnd.randint(0, 6)
        if kind == "bytes":
            vals = [bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 30))) for _ in range(n)]
        elif kind == "int64":
            vals = [rnd.randint(-(1 << 63), (1 << 63) - 1) for _ in range(n)]
        else:
            # binary32-exact values so roundtrip equality is exact
            vals = [struct.unpack("<f", struct.pack("<f", rnd.uniform(-1e6, 1e6)))[0] for _ in range(n)]
        features[f"f{i}"] = (kind, vals)
    data = tfe.encode_example(features)
    got = tfe.decode_example(data)
    assert got == {k: (kind, list(v)) for k, (kind, v) in features.items()}


def test_unpacked_numeric_lists_accepted():
    """Writers pack; the spec requires readers to accept unpacked too
    — build both encodings by hand."""
    # Int64List{ value: 7 value: -1 } unpacked (wire type 0 per element)
    il = _uvarint((1 << 3) | 0) + _uvarint(7)
    il += _uvarint((1 << 3) | 0) + _uvarint((-1) & ((1 << 64) - 1))
    feat = tfe._ld(3, il)
    entry = tfe._ld(1, b"n") + tfe._ld(2, feat)
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["n"] == ("int64", [7, -1])
    # FloatList unpacked (wire type 5 per element)
    fl = _uvarint((1 << 3) | 5) + struct.pack("<f", 2.5)
    fl += _uvarint((1 << 3) | 5) + struct.pack("<f", -0.5)
    feat = tfe._ld(2, fl)
    entry = tfe._ld(1, b"x") + tfe._ld(2, feat)
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["x"] == ("float", [2.5, -0.5])


def test_duplicate_keys_last_wins_and_unknown_fields_skip():
    a = tfe._ld(1, b"k") + tfe._ld(2, tfe.encode_feature("int64", [1]))
    b = tfe._ld(1, b"k") + tfe._ld(2, tfe.encode_feature("int64", [2]))
    unknown_example_field = _uvarint((9 << 3) | 0) + _uvarint(5)
    unknown_feature_field = tfe._ld(8, b"zz")
    feats = tfe._ld(1, a) + tfe._ld(1, b)
    data = tfe._ld(1, feats) + unknown_example_field
    assert tfe.decode_example(data)["k"] == ("int64", [2])
    # unknown field inside a Feature skips too
    feat = tfe.encode_feature("int64", [3]) + unknown_feature_field
    entry = tfe._ld(1, b"q") + tfe._ld(2, feat)
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["q"] == ("int64", [3])
    # empty Feature (unset oneof) decodes as kindless
    entry = tfe._ld(1, b"e") + tfe._ld(2, b"")
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["e"] == ("", [])


def test_malformed_is_loud():
    good = tfe.encode_example({"ids": [1, 2, 3]})
    with pytest.raises(ValueError, match="truncated"):
        tfe.decode_example(good[:-2], where="shard[0]")
    # packed float payload not a multiple of 4
    feat = tfe._ld(2, tfe._ld(1, b"\x00\x00\x00"))
    entry = tfe._ld(1, b"x") + tfe._ld(2, feat)
    with pytest.raises(ValueError, match="multiple of 4"):
        tfe.decode_example(tfe._ld(1, tfe._ld(1, entry)))
    # int64 list element with a fixed32 wire type
    il = _uvarint((1 << 3) | 5) + b"\x01\x02\x03\x04"
    feat = tfe._ld(3, il)
    entry = tfe._ld(1, b"x") + tfe._ld(2, feat)
    with pytest.raises(ValueError, match="wire type"):
        tfe.decode_example(tfe._ld(1, tfe._ld(1, entry)))


def test_generic_pywire_decoder_agrees(spark, tmp_path):
    """Consistency inside the repo: the descriptor-driven generic
    protobuf tier decodes our tf.Example bytes to the same values."""
    jvm = spark._jvm
    pb = jvm.org.apache.orc.protobuf
    fdp = _build_tfexample_descriptor(spark)
    desc_set = pb.DescriptorProtos.FileDescriptorSet.newBuilder().addFile(fdp).build()
    desc_path = str(tmp_path / "tfexample.desc")
    with open(desc_path, "wb") as fh:
        fh.write(bytes(desc_set.toByteArray()))

    from datapipeline_scripts_spark.sources.protobuf_pywire import (
        _qualify,
        compile_decoder,
        parse_descriptor_set,
    )

    registry = parse_descriptor_set(open(desc_path, "rb").read())
    decode = compile_decoder(_qualify("Example", registry), registry)
    data = tfe.encode_example({"ids": [10, -20], "text": [b"abc"], "s": [1.5]})
    # the compiled decoder returns struct cells as tuples in field order:
    # Example=(features,), Features=([entry...],), entry=(key, Feature),
    # Feature=(bytes_list, float_list, int64_list), each list msg=(values,)
    (features,) = decode(data)
    (entries,) = features
    by_key = {e[0]: e[1] for e in entries}
    assert by_key["ids"][2][0] == [10, -20]
    assert [bytes(v) for v in by_key["text"][0][0]] == [b"abc"]
    assert by_key["s"][1][0] == [1.5]


# ---- distributed sink + typed reader ------------------------------------------


def _examples_df(spark, n=9, partitions=3):
    rows = [
        (tfe.encode_example(
            {
                "doc_id": [i],
                "text": [f"doc {i}".encode()],
                "scores": [i * 0.5, -float(i)],
            }
        ),)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "record binary").repartition(partitions)


def test_write_dataset_and_read_tfexample(spark, tmp_path):
    """End-to-end export→import: executor-written shards, CRC-verified
    read, typed projection (scalar, string, list), absent feature →
    null."""
    out = str(tmp_path / "ds")
    files = tfr.write_tfrecord_dataset(_examples_df(spark), out)
    assert len(files) >= 2  # multiple partitions → multiple shards
    assert all(f.endswith(".tfrecord") for f in files)

    df = tfe.read_tfexample(
        spark, out,
        features={
            "doc_id": "int64",
            "text": "string",
            "scores": "float_list",
            "missing": "bytes",
        },
    )
    rows = df.collect()
    assert len(rows) == 9
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[4]["text"] == "doc 4"
    assert by_id[4]["scores"] == [2.0, -4.0]
    assert all(r["missing"] is None for r in rows)

    # wrong-kind projection refuses loudly
    with pytest.raises(Exception, match="holds a bytes_list"):
        tfe.read_tfexample(spark, out, features={"text": "int64"}).count()


def test_write_dataset_save_modes(spark, tmp_path):
    out = str(tmp_path / "modes")
    df = _examples_df(spark, n=4, partitions=2)
    first = tfr.write_tfrecord_dataset(df, out)
    with pytest.raises(FileExistsError):
        tfr.write_tfrecord_dataset(df, out)  # mode=error default
    assert tfr.write_tfrecord_dataset(df, out, mode="ignore") == []
    appended = tfr.write_tfrecord_dataset(df, out, mode="append")
    assert len(set(appended) & set(first)) == 0  # run-unique names
    assert tfr.read_tfrecord(spark, out).count() == 8
    replaced = tfr.write_tfrecord_dataset(df, out, mode="overwrite")
    assert tfr.read_tfrecord(spark, out).count() == 4
    assert len(replaced) == 2


def test_write_dataset_gzip_and_empty(spark, tmp_path):
    out = str(tmp_path / "gz")
    tfr.write_tfrecord_dataset(_examples_df(spark, n=3, partitions=1), out, compress=True)
    df = tfe.read_tfexample(spark, out, features={"doc_id": "int64"}, glob="*.tfrecord.gz")
    assert sorted(r["doc_id"] for r in df.collect()) == [0, 1, 2]
    # all-empty frame → one valid empty shard, reads as zero records
    empty_out = str(tmp_path / "empty")
    empty_df = _examples_df(spark, n=3, partitions=1).filter("length(record) < 0")
    files = tfr.write_tfrecord_dataset(empty_df, empty_out)
    assert len(files) == 1
    assert tfr.read_tfrecord(spark, empty_out).count() == 0


def test_write_dataset_manifest_closes_truncation_loop(spark, tmp_path):
    """Writer-attested manifest → reader verification, end to end:
    what the writer says it wrote, the reader enforces; truncating a
    shard at a record boundary then trips the manifest check that the
    bytes alone cannot."""
    import hashlib
    import os

    out = str(tmp_path / "m")
    entries = tfr.write_tfrecord_dataset(
        _examples_df(spark, n=6, partitions=2), out, manifest=True
    )
    assert sum(e["n_records"] for e in entries) == 6
    for e in entries:
        blob = open(e["path"], "rb").read()
        assert len(blob) == e["n_bytes"]
        assert hashlib.md5(blob).hexdigest() == e["md5"]

    expected = {os.path.basename(e["path"]): e["n_records"] for e in entries}
    assert tfr.read_tfrecord(spark, out, expected_records=expected).count() == 6

    # boundary-truncate one shard: drop its last record cleanly
    victim = entries[0]["path"]
    records = tfr.parse_tfrecord(open(victim, "rb").read())
    open(victim, "wb").write(tfr.write_tfrecord(records[:-1]))
    assert tfr.read_tfrecord(spark, out).count() == 5  # silent without manifest
    with pytest.raises(Exception, match="manifest expects"):
        tfr.read_tfrecord(spark, out, expected_records=expected).count()


# ---- SequenceExample ----------------------------------------------------------


def test_sequence_example_roundtrip():
    ctx = {"doc_id": [7], "title": [b"t"]}
    lists = {
        "tokens": [("bytes", [b"a"]), ("bytes", [b"b", b"c"])],
        "logits": [[0.5, -1.5], [2.0]],
        "steps": [("int64", [1]), ("int64", [2]), ("int64", [3])],
    }
    data = tfe.encode_sequence_example(ctx, lists)
    assert tfe.encode_sequence_example(ctx, lists) == data
    got_ctx, got_lists = tfe.decode_sequence_example(data)
    assert got_ctx["doc_id"] == ("int64", [7])
    assert got_ctx["title"] == ("bytes", [b"t"])
    assert got_lists["tokens"] == [("bytes", [b"a"]), ("bytes", [b"b", b"c"])]
    assert got_lists["logits"] == [("float", [0.5, -1.5]), ("float", [2.0])]
    assert got_lists["steps"] == [("int64", [1]), ("int64", [2]), ("int64", [3])]


def _extend_with_sequence_example(spark, fdp_builder_fn):
    """tf.SequenceExample on top of the Example descriptor."""
    jvm = spark._jvm
    pb = jvm.org.apache.orc.protobuf
    DP = pb.DescriptorProtos
    FT = DP.FieldDescriptorProto.Type
    FL = DP.FieldDescriptorProto.Label
    fdp = fdp_builder_fn(spark).toBuilder()

    def field(name, num, ftype, label=None, type_name=None):
        f = DP.FieldDescriptorProto.newBuilder()
        f.setName(name)
        f.setNumber(num)
        f.setType(ftype)
        f.setLabel(label or FL.LABEL_OPTIONAL)
        if type_name:
            f.setTypeName(type_name)
        return f

    flist = DP.DescriptorProto.newBuilder()
    flist.setName("FeatureList")
    flist.addField(field("feature", 1, FT.TYPE_MESSAGE, label=FL.LABEL_REPEATED,
                         type_name=".tf.Feature"))
    fdp.addMessageType(flist)

    flists = DP.DescriptorProto.newBuilder()
    flists.setName("FeatureLists")
    entry = DP.DescriptorProto.newBuilder()
    entry.setName("FeatureListEntry")
    entry.addField(field("key", 1, FT.TYPE_STRING))
    entry.addField(field("value", 2, FT.TYPE_MESSAGE, type_name=".tf.FeatureList"))
    flists.addNestedType(entry)
    flists.addField(field("feature_list", 1, FT.TYPE_MESSAGE, label=FL.LABEL_REPEATED,
                          type_name=".tf.FeatureLists.FeatureListEntry"))
    fdp.addMessageType(flists)

    seq = DP.DescriptorProto.newBuilder()
    seq.setName("SequenceExample")
    seq.addField(field("context", 1, FT.TYPE_MESSAGE, type_name=".tf.Features"))
    seq.addField(field("feature_lists", 2, FT.TYPE_MESSAGE, type_name=".tf.FeatureLists"))
    fdp.addMessageType(seq)
    return fdp.build()


def test_sequence_example_canonical_jvm_bit_exact(spark):
    jvm = spark._jvm
    pb = jvm.org.apache.orc.protobuf
    fdp = _extend_with_sequence_example(spark, _build_tfexample_descriptor)
    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp, arr)
    seq_t = fd.findMessageTypeByName("SequenceExample")

    text = """
    context {
      feature { key: "doc_id" value { int64_list { value: 7 } } }
    }
    feature_lists {
      feature_list { key: "logits" value {
        feature { float_list { value: 0.5 value: -1.5 } }
        feature { float_list { value: 2.0 } }
      } }
      feature_list { key: "tokens" value {
        feature { bytes_list { value: "a" } }
        feature { bytes_list { value: "b" value: "c" } }
      } }
    }
    """
    b = pb.DynamicMessage.newBuilder(seq_t)
    pb.TextFormat.merge(text, b)
    canonical = bytes(b.build().toByteArray())

    ours = tfe.encode_sequence_example(
        {"doc_id": [7]},
        {"logits": [[0.5, -1.5], [2.0]],
         "tokens": [("bytes", [b"a"]), ("bytes", [b"b", b"c"])]},
    )
    assert ours == canonical
    reparsed = pb.DynamicMessage.parseFrom(seq_t, ours)
    assert bytes(reparsed.toByteArray()) == canonical
    ctx, lists = tfe.decode_sequence_example(canonical)
    assert ctx["doc_id"] == ("int64", [7])
    assert lists["logits"] == [("float", [0.5, -1.5]), ("float", [2.0])]


@pytest.mark.parametrize("seed", range(6))
def test_sequence_example_random_roundtrip(seed):
    rnd = random.Random(9300 + seed)
    ctx = {}
    for i in range(rnd.randint(0, 4)):
        ctx[f"c{i}"] = ("int64", [rnd.randint(-1000, 1000) for _ in range(rnd.randint(0, 4))])
    lists = {}
    for i in range(rnd.randint(0, 4)):
        kind = rnd.choice(["bytes", "int64", "float"])
        steps = []
        for _ in range(rnd.randint(0, 5)):
            n = rnd.randint(0, 4)
            if kind == "bytes":
                steps.append((kind, [bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 10))) for _ in range(n)]))
            elif kind == "int64":
                steps.append((kind, [rnd.randint(-(1 << 62), 1 << 62) for _ in range(n)]))
            else:
                steps.append((kind, [struct.unpack("<f", struct.pack("<f", rnd.uniform(-10, 10)))[0] for _ in range(n)]))
        lists[f"l{i}"] = steps
    data = tfe.encode_sequence_example(ctx, lists)
    got_ctx, got_lists = tfe.decode_sequence_example(data)
    assert got_ctx == {k: (kind, list(v)) for k, (kind, v) in ctx.items()}
    assert got_lists == {k: [(kind, list(v)) for kind, v in steps] for k, steps in lists.items()}


def test_split_list_fields_merge_by_concatenation(spark):
    """ADVICE r09 (medium): the same list field appearing twice in one
    Feature merges by CONCATENATION (canonical embedded-message merge
    — TensorFlow's parsers yield [1,2,3], not [3]); a different oneof
    member appearing later still replaces (oneof last-wins). Pinned
    against the JVM DynamicMessage oracle."""
    jvm = spark._jvm
    pb = jvm.org.apache.orc.protobuf
    fdp = _build_tfexample_descriptor(spark)
    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp, arr)
    example_t = fd.findMessageTypeByName("Example")

    # int64_list split across two chunks inside ONE Feature
    split_feat = tfe.encode_feature("int64", [1, 2]) + tfe.encode_feature("int64", [3])
    entry = tfe._ld(1, b"k") + tfe._ld(2, split_feat)
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["k"] == ("int64", [1, 2, 3])
    # the canonical runtime agrees: its merged reserialization decodes
    # to the same concatenated list
    merged = bytes(pb.DynamicMessage.parseFrom(example_t, data).toByteArray())
    assert tfe.decode_example(merged)["k"] == ("int64", [1, 2, 3])

    # bytes chunks concatenate too
    split_b = tfe.encode_feature("bytes", [b"a"]) + tfe.encode_feature("bytes", [b"b", b"c"])
    entry = tfe._ld(1, b"t") + tfe._ld(2, split_b)
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["t"] == ("bytes", [b"a", b"b", b"c"])
    merged = bytes(pb.DynamicMessage.parseFrom(example_t, data).toByteArray())
    assert tfe.decode_example(merged)["t"] == ("bytes", [b"a", b"b", b"c"])

    # a kind SWITCH resets: int64 → float → int64 ends as int64 [7]
    # (the float occurrence cleared the first chunk), matching the
    # canonical oneof semantics
    switch_feat = (
        tfe.encode_feature("int64", [1])
        + tfe.encode_feature("float", [0.5])
        + tfe.encode_feature("int64", [7])
    )
    entry = tfe._ld(1, b"s") + tfe._ld(2, switch_feat)
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["s"] == ("int64", [7])
    merged = bytes(pb.DynamicMessage.parseFrom(example_t, data).toByteArray())
    assert tfe.decode_example(merged)["s"] == ("int64", [7])


def test_varint_truncates_to_64_bits(spark):
    """ADVICE r09 (low): a 10-byte varint carrying 70 payload bits
    (e.g. 2^70-1) decodes as its low 64 bits — 2^64-1, wrapped to the
    canonical int64 -1 — exactly what the JVM runtime yields, instead
    of a huge positive Python int."""
    over = b"\xff" * 9 + b"\x7f"  # 2^70 - 1 on the wire
    v, i = tfe._read_varint(over, 0, "t")
    assert (v, i) == ((1 << 64) - 1, 10)
    assert tfe._sign64(v) == -1

    # end-to-end: an int64_list holding that varint decodes to [-1]
    # and the canonical runtime reserializes it to our encoding of -1
    jvm = spark._jvm
    pb = jvm.org.apache.orc.protobuf
    fdp = _build_tfexample_descriptor(spark)
    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp, arr)
    example_t = fd.findMessageTypeByName("Example")
    feat = tfe._ld(3, tfe._ld(1, over))
    entry = tfe._ld(1, b"x") + tfe._ld(2, feat)
    data = tfe._ld(1, tfe._ld(1, entry))
    assert tfe.decode_example(data)["x"] == ("int64", [-1])
    canon = bytes(pb.DynamicMessage.parseFrom(example_t, data).toByteArray())
    assert canon == tfe.encode_example({"x": [-1]})
