"""Unit edges for the Avro namespace/fullname rules (ADVICE r06 low,
closed in round 7): `qualify_names` + the mirrored named-type
registries. Pure-Python — no Spark session needed."""

from __future__ import annotations

import pytest

from datapipeline_scripts_spark.sources.avro_pysource import _TK, _avro_to_spark

qualify = _TK["qualify_names"]


def _rec(name, fields, **extra):
    return {"type": "record", "name": name, "fields": fields, **extra}


def test_empty_namespace_attr_means_null_namespace():
    # spec: "namespace": "" puts the type in the NULL namespace — it must
    # NOT inherit the enclosing one
    s = _rec(
        "Outer",
        [{"name": "i", "type": _rec("Bare", [{"name": "x", "type": "int"}], namespace="")},
         {"name": "j", "type": "Bare"}],
        namespace="com.ex",
    )
    q = qualify(s)
    assert q["name"] == "com.ex.Outer"
    assert q["fields"][0]["type"]["name"] == "Bare"
    assert q["fields"][1]["type"] == "Bare"


def test_dotted_name_ignores_namespace_attr():
    s = _rec("a.b.C", [{"name": "x", "type": "int"}], namespace="ignored.ns")
    q = qualify(s)
    assert q["name"] == "a.b.C"
    assert "namespace" not in q


def test_two_level_namespace_inheritance():
    # Mid inherits com.ex from Outer; Leaf inherits com.ex from Mid;
    # a short reference inside Leaf's context resolves to com.ex.Mid
    leaf = _rec("Leaf", [{"name": "back", "type": "Mid"}])
    mid = _rec("Mid", [{"name": "l", "type": ["null", leaf]}])
    s = _rec("Outer", [{"name": "m", "type": mid}], namespace="com.ex")
    q = qualify(s)
    mid_q = q["fields"][0]["type"]
    assert mid_q["name"] == "com.ex.Mid"
    leaf_q = mid_q["fields"][0]["type"][1]
    assert leaf_q["name"] == "com.ex.Leaf"
    assert leaf_q["fields"][0]["type"] == "com.ex.Mid"


def test_enum_and_fixed_fullname_references_map_and_decode():
    s = _rec(
        "T",
        [
            {"name": "c", "type": {"type": "enum", "name": "Col", "symbols": ["A", "B"]}},
            {"name": "c2", "type": "ns.Col"},
            {"name": "f", "type": {"type": "fixed", "name": "F2", "size": 2}},
            {"name": "f2", "type": "ns.F2"},
        ],
        namespace="ns",
    )
    q = qualify(s)
    st, _ = _avro_to_spark(q, {})
    assert st["c2"].dataType == st["c"].dataType
    assert st["f2"].dataType == st["f"].dataType
    # the decoder compiles the same normalized schema
    assert _TK["make_reader"](q, {}) is not None


def test_array_and_map_values_are_qualified():
    inner = _rec("I", [{"name": "x", "type": "int"}])
    s = _rec(
        "T",
        [
            {"name": "a", "type": {"type": "array", "items": inner}},
            {"name": "m", "type": {"type": "map", "values": "I"}},
        ],
        namespace="p.q",
    )
    q = qualify(s)
    assert q["fields"][0]["type"]["items"]["name"] == "p.q.I"
    assert q["fields"][1]["type"]["values"] == "p.q.I"


def test_unresolvable_reference_stays_loud():
    s = _rec("T", [{"name": "x", "type": "NoSuchType"}], namespace="z")
    q = qualify(s)
    assert q["fields"][0]["type"] == "NoSuchType"  # left as-written
    with pytest.raises(NotImplementedError, match="unresolved"):
        _avro_to_spark(q, {})


def test_recursive_record_schema_inference_is_loud():
    # the decoder supports recursion, but a recursive record has no
    # finite Spark schema — inference must refuse loudly
    s = _rec("Node", [{"name": "next", "type": ["null", "Node"]}], namespace="g")
    q = qualify(s)
    assert q["fields"][0]["type"][1] == "g.Node"
    with pytest.raises(NotImplementedError, match="unresolved"):
        _avro_to_spark(q, {})
