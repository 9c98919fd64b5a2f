"""Seeded generative sweep of Avro named-type structures (round 7):
random schemas — nested records / enums / fixed under random
namespaces, re-referenced by short name or fullname depending on
namespace context, exactly as avro-java renders them — are parsed and
WRITTEN by the canonical org.apache.avro library, then schema-inferred
and decoded by the pure-Python tier. Values are deterministic
sentinels, so any name-resolution or decode drift is a loud mismatch
(proves the ADVICE r06 `qualify_names` closure across the structure
space, not just the hand-picked cases)."""

from __future__ import annotations

import json
import random

import pytest

from datapipeline_scripts_spark.sources.avro_pysource import read_avro_py

_INT_SENTINEL = 7
_STR_SENTINEL = "s"
_NAMESPACES = [None, "a", "a.b", "c"]


class _Gen:
    def __init__(self, rng: random.Random):
        self.rng = rng
        self.n = 0
        # fullname -> ("record"|"enum"|"fixed", namespace-or-None)
        self.defined: dict[str, tuple[str, str | None]] = {}

    def _name(self) -> str:
        self.n += 1
        return f"N{self.n}"

    def _register(self, name: str, ns: str | None, kind: str) -> str:
        full = f"{ns}.{name}" if ns else name
        self.defined[full] = (kind, ns)
        return full

    def named_def(self, enclosing_ns: str | None, depth: int):
        """A new named-type definition node (dict schema)."""
        name = self.name = self._name()
        ns = self.rng.choice(_NAMESPACES)
        node: dict = {"name": name}
        if ns is not None:
            node["namespace"] = ns
        effective_ns = ns if ns is not None else enclosing_ns
        kind = self.rng.choice(["record", "enum", "fixed"] if depth <= 0 else ["record"])
        if kind == "record":
            node["type"] = "record"
            # register AFTER the field walk: a reference to a still-open
            # record would make the schema recursive — legal Avro, but
            # with no finite Spark schema (and no finite sentinel row)
            node["fields"] = [
                {"name": f"f{i}", "type": self.field_type(effective_ns, depth - 1)}
                for i in range(self.rng.randrange(1, 4))
            ]
            self._register(name, effective_ns, "record")
        elif kind == "enum":
            node["type"] = "enum"
            node["symbols"] = ["ONE", "TWO"]
            self._register(name, effective_ns, "enum")
        else:
            node["type"] = "fixed"
            node["size"] = 2
            self._register(name, effective_ns, "fixed")
        return node

    def reference(self, enclosing_ns: str | None):
        """A reference to an already-defined type, rendered the way
        avro-java renders it: short when the enclosing namespace
        matches (or both null), fullname otherwise."""
        full = self.rng.choice(sorted(self.defined))
        _kind, ns = self.defined[full]
        short = full.rsplit(".", 1)[-1]
        return short if ns == enclosing_ns else full

    def field_type(self, enclosing_ns: str | None, depth: int):
        roll = self.rng.random()
        if roll < 0.35:
            return "int"
        if roll < 0.45:
            return "string"
        if roll < 0.6 and self.defined:
            return self.reference(enclosing_ns)
        if roll < 0.7 and depth > 0:
            return {"type": "array", "items": self.field_type(enclosing_ns, depth - 1)}
        if roll < 0.8:
            return ["null", "int"]
        return self.named_def(enclosing_ns, depth)

    def top(self):
        ns = self.rng.choice([ns for ns in _NAMESPACES if ns])
        name = self._name()
        fields = [
            {"name": f"t{i}", "type": self.field_type(ns, 2)}
            for i in range(self.rng.randrange(2, 5))
        ]
        return {"type": "record", "name": name, "namespace": ns, "fields": fields}


def _fill(jvm, jschema):
    """Deterministic sentinel value for a JVM Avro schema node."""
    t = jschema.getType().getName()
    if t == "record":
        r = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        for f in list(jschema.getFields()):
            r.put(f.name(), _fill(jvm, f.schema()))
        return r
    if t == "enum":
        return jvm.org.apache.avro.generic.GenericData.EnumSymbol(jschema, "ONE")
    if t == "fixed":
        return jvm.org.apache.avro.generic.GenericData.Fixed(jschema, bytearray(b"\x02\x03"))
    if t == "array":
        lst = jvm.java.util.ArrayList()
        lst.add(_fill(jvm, jschema.getElementType()))
        return lst
    if t == "union":
        for b in list(jschema.getTypes()):
            if b.getType().getName() != "null":
                return _fill(jvm, b)
        return None
    if t == "int":
        return _INT_SENTINEL
    if t == "string":
        return _STR_SENTINEL
    raise AssertionError(f"unexpected generated type {t}")


def _assert_sentinels(value, dtype):
    """Every leaf of the decoded row must be its sentinel."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.StructType):
        assert value is not None
        for f, v in zip(dtype.fields, value):
            _assert_sentinels(v, f.dataType)
    elif isinstance(dtype, T.ArrayType):
        assert len(value) == 1
        _assert_sentinels(value[0], dtype.elementType)
    elif isinstance(dtype, T.IntegerType):
        assert value == _INT_SENTINEL
    elif isinstance(dtype, T.StringType):
        assert value in (_STR_SENTINEL, "ONE")  # plain string or enum symbol
    elif isinstance(dtype, T.BinaryType):
        assert bytes(value) == b"\x02\x03"
    else:
        raise AssertionError(f"unexpected inferred type {dtype}")


@pytest.mark.parametrize("seed", range(30))
def test_random_named_structures_roundtrip_from_avro_java(spark, tmp_path, seed):
    gen = _Gen(random.Random(900 + seed))
    schema_json = json.dumps(gen.top())
    jvm = spark._jvm
    try:
        sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    except Exception:
        pytest.skip(f"generator emitted a schema avro-java rejects: {schema_json}")
    path = str(tmp_path / f"sweep{seed}.avro")
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    w.create(sch, jvm.java.io.File(path))
    for _ in range(3):
        w.append(_fill(jvm, sch))
    w.close()

    df = read_avro_py(spark, path)
    rows = df.collect()
    assert len(rows) == 3
    for row in rows:
        _assert_sentinels(tuple(row), df.schema)
