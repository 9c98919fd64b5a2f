"""tf.Example payload codec + typed Spark reader — the layer ABOVE
TFRecord framing (sources/tfrecord.py). TFRecord shards in the wild
almost always hold `tf.train.Example` protos (the TensorFlow
training-sample schema), whose wire grammar is public and small
(tensorflow/core/example/{example,feature}.proto):

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }
    Feature  { oneof kind { BytesList bytes_list = 1;
                            FloatList float_list = 2;
                            Int64List int64_list = 3; } }
    BytesList{ repeated bytes value = 1; }
    FloatList{ repeated float value = 1 [packed]; }
    Int64List{ repeated int64 value = 1 [packed]; }

A map field is wire-identical to a repeated entry message
(key = field 1, value = field 2), so the codec here is a direct wire
walk — no descriptor machinery needed for this one fixed schema.
Proof posture: the encoder/decoder pair is proven BIT-EXACT against
the canonical JVM protobuf runtime (the shaded protobuf-java that
ships inside Spark's ORC jars — the same oracle protobuf_pywire is
proven against) via a DynamicMessage build of the tf.Example schema
in tests/test_tfexample.py, plus a seeded generative sweep and a
cross-check through protobuf_pywire's generic descriptor-driven
decoder.

Decode semantics honored (each pinned by a test):
- numeric lists accept BOTH packed and unpacked encodings (writers
  pack; the spec requires readers to accept either);
- duplicate map keys: last entry wins (proto3 map semantics);
- unknown fields SKIP per protobuf convention (schema evolution),
  but wire-type violations and truncation refuse loudly;
- floats are IEEE binary32 — decoded exactly as Python floats of the
  32-bit value (struct '<f'), never re-rounded through binary64 math.

Scale shape: `read_tfexample` layers the example decode inside the
same task-per-shard `mapInPandas` worker as `read_tfrecord` — one
pass over the shard bytes, typed columns out, no shuffle, no second
scan. Feature projection happens at decode time, the worker-side
analogue of column pruning.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---- varint / wire primitives ------------------------------------------------


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # int64 negatives encode as 10-byte two's complement
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, i: int, where: str) -> tuple[int, int]:
    result, shift = 0, 0
    start = i
    while True:
        if i >= len(buf):
            raise ValueError(f"{where}: truncated varint at offset {start}")
        b = buf[i]
        result |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            # canonical 64-bit truncation (ADVICE r09): a 10-byte
            # varint carries up to 70 payload bits, and canonical
            # parsers (JVM/C++ runtimes) keep only the low 64 — e.g.
            # 2^70-1 on the wire decodes as 2^64-1, which _sign64 then
            # wraps to -1 exactly as TensorFlow's readers do
            return result & ((1 << 64) - 1), i
        shift += 7
        if shift > 63:
            raise ValueError(f"{where}: varint overflow at offset {start}")


def _sign64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _ld(field_no: int, payload: bytes) -> bytes:
    """A length-delimited field (wire type 2)."""
    out = bytearray()
    _write_varint(out, (field_no << 3) | 2)
    _write_varint(out, len(payload))
    out += payload
    return bytes(out)


# ---- encode ------------------------------------------------------------------

_KIND_FIELD = {"bytes": 1, "float": 2, "int64": 3}


def encode_feature(kind: str, values: list) -> bytes:
    """Wire bytes of one Feature message. ``kind`` ∈ bytes/float/int64;
    numeric lists are PACKED (what TensorFlow's writers emit)."""
    if kind == "bytes":
        inner = bytearray()
        for v in values:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            inner += _ld(1, b)
        return _ld(_KIND_FIELD["bytes"], bytes(inner))
    if kind == "float":
        packed = b"".join(struct.pack("<f", float(v)) for v in values)
        return _ld(_KIND_FIELD["float"], _ld(1, packed))
    if kind == "int64":
        inner = bytearray()
        for v in values:
            _write_varint(inner, int(v))
        return _ld(_KIND_FIELD["int64"], _ld(1, bytes(inner)))
    raise ValueError(f"unknown feature kind {kind!r}; expected bytes/float/int64")


def _detect_kind(values: list) -> str:
    if any(isinstance(v, (bytes, bytearray, str)) for v in values):
        return "bytes"
    if any(isinstance(v, float) for v in values):
        return "float"
    return "int64"


def encode_example(features: dict) -> bytes:
    """Wire bytes of one tf.Example. ``features`` maps name → list of
    values (kind auto-detected: any str/bytes → bytes_list, any float
    → float_list, else int64_list) or → ``(kind, list)`` to pin the
    kind explicitly (e.g. an empty list, or ints stored as floats).
    Deterministic: features emit in sorted-name order, so identical
    inputs give identical bytes (the shard-dedup property every other
    writer in this repo guarantees)."""
    entries = bytearray()
    for name in sorted(features):
        spec = features[name]
        if isinstance(spec, tuple):
            kind, values = spec
        else:
            values = list(spec)
            kind = _detect_kind(values)
        feature = encode_feature(kind, values)
        entry = _ld(1, name.encode("utf-8")) + _ld(2, feature)
        entries += _ld(1, entry)  # Features.feature map entry
    return _ld(1, bytes(entries))  # Example.features


# ---- decode ------------------------------------------------------------------


def _iter_fields(buf: bytes, where: str):
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i, where)
        field_no, wire = tag >> 3, tag & 7
        if wire == 2:
            n, i = _read_varint(buf, i, where)
            if i + n > len(buf):
                raise ValueError(
                    f"{where}: truncated length-delimited field {field_no}"
                )
            yield field_no, wire, buf[i : i + n]
            i += n
        elif wire == 0:
            v, i = _read_varint(buf, i, where)
            yield field_no, wire, v
        elif wire == 1:
            if i + 8 > len(buf):
                raise ValueError(f"{where}: truncated fixed64 field {field_no}")
            yield field_no, wire, buf[i : i + 8]
            i += 8
        elif wire == 5:
            if i + 4 > len(buf):
                raise ValueError(f"{where}: truncated fixed32 field {field_no}")
            yield field_no, wire, buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"{where}: unsupported wire type {wire} at offset {i}")


def _decode_numeric_list(payload_fields, *, floats: bool, where: str) -> list:
    """BytesList-style repeated field 1, packed or unpacked."""
    out: list = []
    for fno, wire, val in payload_fields:
        if fno != 1:
            continue  # unknown field: skip
        if floats:
            if wire == 2:  # packed
                if len(val) % 4:
                    raise ValueError(f"{where}: packed float list not a multiple of 4")
                out += [struct.unpack_from("<f", val, o)[0] for o in range(0, len(val), 4)]
            elif wire == 5:  # unpacked
                out.append(struct.unpack("<f", val)[0])
            else:
                raise ValueError(f"{where}: float list has wire type {wire}")
        else:
            if wire == 2:  # packed
                i = 0
                while i < len(val):
                    v, i = _read_varint(val, i, where)
                    out.append(_sign64(v))
            elif wire == 0:  # unpacked
                out.append(_sign64(val))
            else:
                raise ValueError(f"{where}: int64 list has wire type {wire}")
    return out


def decode_feature(buf: bytes, *, where: str = "<feature>") -> tuple[str, list]:
    """(kind, values) of one Feature message. An empty Feature (no
    kind set) decodes as ('', []) — the proto3 unset oneof.

    Repeated occurrences of the SAME list field merge by
    concatenation (ADVICE r09): canonical protobuf merges embedded-
    message fields, so two `int64_list` chunks in one Feature yield
    one combined value list — replacing would silently drop the first
    chunk on wire bytes the JVM/TensorFlow parsers accept. A kind
    SWITCH (a different oneof member appears later) still replaces,
    per oneof last-wins semantics."""
    kind, values = "", []
    for fno, wire, val in _iter_fields(buf, where):
        if fno == 1 and wire == 2:  # BytesList
            if kind != "bytes":
                kind, values = "bytes", []
            values += [v for f, w, v in _iter_fields(val, where) if f == 1 and w == 2]
        elif fno == 2 and wire == 2:  # FloatList
            if kind != "float":
                kind, values = "float", []
            values += _decode_numeric_list(
                _iter_fields(val, where), floats=True, where=where
            )
        elif fno == 3 and wire == 2:  # Int64List
            if kind != "int64":
                kind, values = "int64", []
            values += _decode_numeric_list(
                _iter_fields(val, where), floats=False, where=where
            )
        # unknown fields: skip (already consumed by _iter_fields)
    return kind, values


def decode_example(data: bytes, *, where: str = "<example>") -> dict[str, tuple[str, list]]:
    """name → (kind, values) of one tf.Example. Duplicate map keys:
    last wins (proto3 map semantics). Unknown fields skip; malformed
    wire data refuses loudly with ``where``."""
    out: dict[str, tuple[str, list]] = {}
    for fno, wire, features_buf in _iter_fields(bytes(data), where):
        if fno != 1 or wire != 2:
            continue  # unknown Example field
        for efno, ewire, entry in _iter_fields(features_buf, where):
            if efno != 1 or ewire != 2:
                continue
            name, feature = None, b""
            for kfno, kwire, kval in _iter_fields(entry, where):
                if kfno == 1 and kwire == 2:
                    name = kval.decode("utf-8")
                elif kfno == 2 and kwire == 2:
                    feature = kval
            if name is None:
                raise ValueError(f"{where}: map entry without a key")
            out[name] = decode_feature(feature, where=where)
    return out


# ---- SequenceExample ----------------------------------------------------------
#
# The sequence sibling (same public proto file):
#   SequenceExample { Features context = 1; FeatureLists feature_lists = 2; }
#   FeatureLists    { map<string, FeatureList> feature_list = 1; }
#   FeatureList     { repeated Feature feature = 1; }
# Context carries per-sequence features (an Example's Features,
# reused verbatim); each feature_list carries one Feature PER STEP —
# the shape token/frame sequences ship in.


def encode_sequence_example(context: dict, feature_lists: dict) -> bytes:
    """Wire bytes of one tf.SequenceExample. ``context`` is an
    `encode_example`-style features dict; ``feature_lists`` maps name
    → list of per-step feature specs (each a value list with the kind
    auto-detected, or an explicit ``(kind, values)``). Deterministic:
    both maps emit in sorted-name order."""
    ctx = encode_example(context)  # = Features wrapped as field 1 — reuse as-is
    out = bytearray(ctx)
    lists = bytearray()
    for name in sorted(feature_lists):
        steps = bytearray()
        for spec in feature_lists[name]:
            if isinstance(spec, tuple):
                kind, values = spec
            else:
                values = list(spec)
                kind = _detect_kind(values)
            steps += _ld(1, encode_feature(kind, values))
        entry = _ld(1, name.encode("utf-8")) + _ld(2, bytes(steps))
        lists += _ld(1, entry)
    out += _ld(2, bytes(lists))
    return bytes(out)


def decode_sequence_example(
    data: bytes, *, where: str = "<seq-example>"
) -> tuple[dict, dict]:
    """(context, feature_lists) of one tf.SequenceExample: context as
    name → (kind, values); feature_lists as name → [(kind, values)]
    per step. Same wire discipline as decode_example (duplicate keys
    last-wins, unknown fields skip, loud truncation)."""
    context: dict = {}
    lists: dict = {}
    for fno, wire, buf in _iter_fields(bytes(data), where):
        if fno == 1 and wire == 2:  # context: a Features message
            context = decode_example(_ld(1, buf), where=where)
        elif fno == 2 and wire == 2:  # FeatureLists
            for efno, ewire, entry in _iter_fields(buf, where):
                if efno != 1 or ewire != 2:
                    continue
                name, steps = None, []
                for kfno, kwire, kval in _iter_fields(entry, where):
                    if kfno == 1 and kwire == 2:
                        name = kval.decode("utf-8")
                    elif kfno == 2 and kwire == 2:
                        steps = [
                            decode_feature(f, where=where)
                            for fn2, w2, f in _iter_fields(kval, where)
                            if fn2 == 1 and w2 == 2
                        ]
                if name is None:
                    raise ValueError(f"{where}: feature_list entry without a key")
                lists[name] = steps
    return context, lists


# ---- Spark surface -----------------------------------------------------------

_SCALAR_TYPES = {
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "int64": T.LongType(),
    "float": T.DoubleType(),
}
_LIST_TYPES = {
    "bytes_list": T.ArrayType(T.BinaryType()),
    "string_list": T.ArrayType(T.StringType()),
    "int64_list": T.ArrayType(T.LongType()),
    "float_list": T.ArrayType(T.DoubleType()),
}


def _project(kind_values: tuple[str, list] | None, ftype: str, col: str, shard: str):
    """One feature → one cell under the projection spec."""
    if kind_values is None or kind_values[0] == "":
        return None
    kind, values = kind_values
    base = ftype.removesuffix("_list")
    want_kind = {"bytes": "bytes", "string": "bytes", "int64": "int64", "float": "float"}[base]
    if kind != want_kind:
        raise ValueError(
            f"{shard}: feature {col!r} holds a {kind}_list but the "
            f"projection asks for {ftype}"
        )
    if base == "string":
        values = [v.decode("utf-8") for v in values]
    elif base == "bytes":
        values = [bytes(v) for v in values]
    if ftype.endswith("_list"):
        return values
    return values[0] if values else None


def read_tfexample(
    spark: SparkSession,
    path: str,
    features: dict[str, str],
    glob: str = "*.tfrecord*",
    expected_records: dict[str, int] | None = None,
) -> DataFrame:
    """Typed tf.Example ingest: one executor task per TFRecord shard,
    records CRC-verified and example-decoded in the SAME worker pass.
    ``features`` maps feature name → projected type: ``bytes``/
    ``string``/``int64``/``float`` take the first element (null when
    the feature is absent or empty), the ``*_list`` variants keep the
    whole list. A feature present with the WRONG kind refuses loudly
    (silent type coercion is how training-data bugs hide); an absent
    feature is null (schema evolution). Row identity is
    (shard, record_idx), same as read_tfrecord; ``expected_records``
    is the same manifest-backed truncation check."""
    from datapipeline_scripts_spark.sources import tfrecord as tfr

    fields = [
        T.StructField("shard", T.StringType()),
        T.StructField("record_idx", T.LongType()),
    ]
    for name, ftype in features.items():
        if ftype in _SCALAR_TYPES:
            fields.append(T.StructField(name, _SCALAR_TYPES[ftype]))
        elif ftype in _LIST_TYPES:
            fields.append(T.StructField(name, _LIST_TYPES[ftype]))
        else:
            raise ValueError(
                f"feature {name!r}: unknown projection type {ftype!r}; expected "
                f"one of {sorted(_SCALAR_TYPES) + sorted(_LIST_TYPES)}"
            )
    schema = T.StructType(fields)

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema}
            for p, blob in zip(pdf["path"], pdf["content"]):
                records = tfr.parse_tfrecord(bytes(blob), where=str(p))
                if expected_records is not None:
                    want = expected_records.get(str(p))
                    if want is None:
                        want = expected_records.get(str(p).rsplit("/", 1)[-1])
                    if want is None:
                        raise ValueError(
                            f"{p}: shard missing from expected_records manifest"
                        )
                    if len(records) != want:
                        raise ValueError(
                            f"{p}: parsed {len(records)} records but the "
                            f"manifest expects {want}"
                        )
                for i, rec in enumerate(records):
                    ex = decode_example(rec, where=f"{p}[{i}]")
                    out["shard"].append(p)
                    out["record_idx"].append(i)
                    for name, ftype in features.items():
                        out[name].append(_project(ex.get(name), ftype, name, str(p)))
            yield pd.DataFrame(out)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(worker, schema=schema)
