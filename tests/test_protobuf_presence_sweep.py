"""Seeded randomized presence sweep for the pure-Python protobuf tier
(round 7, extends ADVICE r06 closure): random subsets of a message's
fields are set through protobuf-java (TextFormat + DynamicMessage),
and the EXPECTED decoded row is derived from protobuf-java's own
presence API (`hasField`/`getField`) mapped through spark-protobuf's
holder semantics — oneof members and proto3 optionals NULL unless set,
implicit-presence fields materialized via getField (which also yields
declared proto2 defaults). So the Python tier is proven against the
canonical runtime's presence tracking, not against itself.

Uses its own file so it can be authored while a full suite run is in
flight (pytest collects files at session start)."""

from __future__ import annotations

import random

import pytest

from datapipeline_scripts_spark.sources import readers
from tests.test_sources import _build_presence_descriptors, _pb


def _expected_row(pb, msg, desc):
    """protobuf-java message → the tuple spark-protobuf (and our tier)
    should emit: presence-tracked fields None unless hasField, others
    getField (enum values rendered as symbol names)."""
    out = []
    for fd in desc.getFields():
        # NULL-when-unset applies to oneof members only — real oneofs and
        # the synthetic ones proto3 `optional` compiles to (both have a
        # containing oneof). Plain proto2 optionals are NOT nulled:
        # getField materializes their declared defaults, which is the
        # spark-protobuf holder behavior ADVICE r06 cited.
        tracked = fd.getContainingOneof() is not None
        if tracked and not msg.hasField(fd):
            out.append(None)
            continue
        v = msg.getField(fd)
        jt = fd.getJavaType().toString()
        if jt == "ENUM":
            v = v.getName()
        elif jt == "BYTE_STRING":
            v = bytes(v.toByteArray())
        out.append(v)
    return tuple(out)


@pytest.mark.parametrize("which", ["Pick", "Defaults"])
def test_randomized_presence_sweep_vs_protobuf_java(spark, tmp_path, which):
    jvm = spark._jvm
    pb = _pb(jvm)
    p3, p2 = _build_presence_descriptors(spark)
    desc_set = (
        pb.DescriptorProtos.FileDescriptorSet.newBuilder().addFile(p3).addFile(p2).build()
    )
    desc_path = str(tmp_path / "sweep.desc")
    with open(desc_path, "wb") as fh:
        fh.write(bytes(desc_set.toByteArray()))

    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fdp = p3 if which == "Pick" else p2
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp, arr)
    desc = fd.findMessageTypeByName(which)

    rng = random.Random(20260815)
    setters = {
        "Pick": {
            "x": lambda: f"x: {rng.randrange(-2**31, 2**31)}",
            "y": lambda: f'y: "s{rng.randrange(1000)}"',
            "oz": lambda: f"oz: {rng.randrange(-2**63, 2**63)}",
            "plain": lambda: f"plain: {rng.randrange(-2**31, 2**31)}",
        },
        "Defaults": {
            "di": lambda: f"di: {rng.randrange(-2**31, 2**31)}",
            "ds": lambda: f'ds: "v{rng.randrange(1000)}"',
            "db": lambda: f'db: "\\\\{rng.randrange(64, 256):03o}"',
            "dd": lambda: f"dd: {rng.randrange(-9, 9)}.25",
            "du": lambda: f"du: {rng.randrange(0, 2**32)}",
            "de": lambda: f"de: {rng.choice(['NONE', 'GREEN', 'BLUE'])}",
            "dbo": lambda: f"dbo: {rng.choice(['true', 'false'])}",
            "bare": lambda: f"bare: {rng.randrange(-2**31, 2**31)}",
        },
    }[which]

    blobs, expected = [], []
    for i in range(80):
        names = [n for n in setters if rng.random() < 0.5]
        if which == "Pick" and "x" in names and "y" in names:
            names.remove(rng.choice(["x", "y"]))  # TextFormat refuses dual oneof
        text = " ".join(setters[n]() for n in names)
        b = pb.DynamicMessage.newBuilder(desc)
        pb.TextFormat.merge(text, b)
        m = b.build()
        blobs.append((i, bytearray(bytes(m.toByteArray()))))
        expected.append(_expected_row(pb, m, desc))

    df = spark.createDataFrame(blobs, "id long, data binary")
    out = readers.protobuf_decode(df, "data", which, desc_path)
    rows = {r["id"]: tuple(r["data"]) for r in out.collect()}
    assert len(rows) == 80
    for i, want in enumerate(expected):
        got = rows[i]
        assert len(got) == len(want)
        for g, w, fdesc in zip(got, want, range(len(want))):
            if isinstance(w, float):
                assert g == pytest.approx(w, abs=0, rel=1e-12), (i, fdesc, g, w)
            else:
                assert g == w, (which, i, fdesc, g, w)


def test_oneof_with_message_member_clears_across_types(spark, tmp_path):
    """Last-set-wins must clear across a oneof whose members mix a
    MESSAGE and a scalar (the two decoder set-paths): hand-framed wire
    carrying both members in each order, plus protobuf-java
    single-member encodings."""
    jvm = spark._jvm
    pb = _pb(jvm)
    DP = pb.DescriptorProtos
    FT = DP.FieldDescriptorProto.Type
    FL = DP.FieldDescriptorProto.Label

    fdp = DP.FileDescriptorProto.newBuilder()
    fdp.setName("mix.proto")
    fdp.setPackage("mx")
    fdp.setSyntax("proto3")
    inner = DP.DescriptorProto.newBuilder()
    inner.setName("Inner")
    fa = DP.FieldDescriptorProto.newBuilder()
    fa.setName("a")
    fa.setNumber(1)
    fa.setType(FT.TYPE_INT32)
    fa.setLabel(FL.LABEL_OPTIONAL)
    inner.addField(fa)
    fdp.addMessageType(inner)

    mix = DP.DescriptorProto.newBuilder()
    mix.setName("Mix")
    od = DP.OneofDescriptorProto.newBuilder()
    od.setName("pick")
    mix.addOneofDecl(od)
    fm = DP.FieldDescriptorProto.newBuilder()
    fm.setName("m")
    fm.setNumber(1)
    fm.setType(FT.TYPE_MESSAGE)
    fm.setLabel(FL.LABEL_OPTIONAL)
    fm.setTypeName(".mx.Inner")
    fm.setOneofIndex(0)
    mix.addField(fm)
    fk = DP.FieldDescriptorProto.newBuilder()
    fk.setName("k")
    fk.setNumber(2)
    fk.setType(FT.TYPE_INT32)
    fk.setLabel(FL.LABEL_OPTIONAL)
    fk.setOneofIndex(0)
    mix.addField(fk)
    fdp.addMessageType(mix)

    fdp_built = fdp.build()
    desc_set = pb.DescriptorProtos.FileDescriptorSet.newBuilder().addFile(fdp_built).build()
    desc_path = str(tmp_path / "mix.desc")
    with open(desc_path, "wb") as fh:
        fh.write(bytes(desc_set.toByteArray()))

    arr = spark.sparkContext._gateway.new_array(pb.Descriptors.FileDescriptor, 0)
    fd = pb.Descriptors.FileDescriptor.buildFrom(fdp_built, arr)
    mixd = fd.findMessageTypeByName("Mix")

    def enc(text):
        b = pb.DynamicMessage.newBuilder(mixd)
        pb.TextFormat.merge(text, b)
        return bytes(b.build().toByteArray())

    inner5 = b"\x08\x05"  # Inner{a:5}
    wire_m = b"\x0a" + bytes([len(inner5)]) + inner5  # field 1 LEN
    wire_k = b"\x10\x09"  # field 2 varint 9
    blobs = [
        (0, bytearray(enc(""))),
        (1, bytearray(enc("m { a: 5 }"))),
        (2, bytearray(enc("k: 9"))),
        (3, bytearray(wire_m + wire_k)),  # m then k => k wins, m NULL
        (4, bytearray(wire_k + wire_m)),  # k then m => m wins, k NULL
    ]
    df = spark.createDataFrame(blobs, "id long, data binary")
    out = readers.protobuf_decode(df, "data", "Mix", desc_path)
    rows = {r["id"]: r["data"] for r in out.collect()}
    assert rows[0] == (None, None)
    assert rows[1] == ((5,), None)
    assert rows[2] == (None, 9)
    assert rows[3] == (None, 9)
    assert rows[4] == ((5,), None)
