"""Declarative query-spec compiler: a JSON-able spec → DataFrame plan.

The reference's public surface is "run the query you are handed"
(/root/reference/backup.sh passes SQL through to its engines); an
engine library additionally wants a PROGRAMMATIC surface — tools emit a
data-structure description of a query and the engine compiles it to a
logical plan, letting Catalyst optimize exactly as if the DataFrame
code had been written by hand. This is that surface, deliberately
small: scan, conjunctive/disjunctive predicates, grouped integer-exact
aggregation, ordering, limit.

Spec grammar (all keys optional except `table`):

    {
      "table": "lineitem",
      "filter": {"op": "and", "args": [
          {"op": ">=", "col": "l_quantity", "lit": 10},
          {"op": "in", "col": "l_returnflag", "lit": ["A", "R"]}
      ]},
      "joins": [{"table": "orders", "on": [["l_orderkey", "o_orderkey"]],
                 "type": "inner", "broadcast": false}],
      "group_by": ["l_returnflag"],
      "aggs": [
          {"fn": "count", "as": "n"},
          {"fn": "sum_cents", "col": "l_extendedprice", "as": "rev_cents"},
          {"fn": "min", "col": "l_quantity", "as": "min_qty"}
      ],
      "order_by": [["l_returnflag", "asc"]],
      "limit": 100
    }

Because the compiler emits ordinary Column expressions, every Catalyst
optimization (filter pushdown, column pruning, partial aggregation)
applies to compiled specs exactly as to handwritten plans — asserted in
tests/test_plans.py. `sum_cents` bakes in the house exactness idiom
(per-row integer cents before the sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table

_CMP = {
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}


def _predicate(node: dict) -> Column:
    op = node["op"]
    if op == "and":
        out = _predicate(node["args"][0])
        for child in node["args"][1:]:
            out = out & _predicate(child)
        return out
    if op == "or":
        out = _predicate(node["args"][0])
        for child in node["args"][1:]:
            out = out | _predicate(child)
        return out
    if op == "not":
        return ~_predicate(node["args"][0])
    if op == "in":
        return F.col(node["col"]).isin(*node["lit"])
    if op in _CMP:
        return _CMP[op](F.col(node["col"]), F.lit(node["lit"]))
    raise ValueError(f"unknown predicate op {op!r}")


def _agg(node: dict) -> Column:
    fn, alias = node["fn"], node["as"]
    if fn == "count":
        return F.count("*").cast("long").alias(alias)
    col = F.col(node["col"])
    if fn == "sum_cents":
        return F.sum(F.round(col * 100).cast("long")).cast("long").alias(alias)
    if fn == "sum":
        return F.sum(col).cast("long").alias(alias)
    if fn == "min":
        return F.min(col).alias(alias)
    if fn == "max":
        return F.max(col).alias(alias)
    if fn == "count_distinct":
        return F.countDistinct(col).cast("long").alias(alias)
    raise ValueError(f"unknown aggregate fn {fn!r}")


def compile_spec(spark: SparkSession, sf_dir: str, spec: dict) -> DataFrame:
    """Compile a query spec to a (lazy) DataFrame plan."""
    df = load_table(spark, sf_dir, spec["table"])
    for j in spec.get("joins", ()):
        right = load_table(spark, sf_dir, j["table"])
        if j.get("broadcast"):
            right = F.broadcast(right)
        cond = None
        for left_col, right_col in j["on"]:
            leg = df[left_col] == right[right_col]
            cond = leg if cond is None else (cond & leg)
        df = df.join(right, cond, j.get("type", "inner"))
    if "filter" in spec:
        df = df.filter(_predicate(spec["filter"]))
    if "group_by" in spec:
        df = df.groupBy(*spec["group_by"]).agg(*[_agg(a) for a in spec["aggs"]])
    elif "aggs" in spec:
        df = df.agg(*[_agg(a) for a in spec["aggs"]])
    if "order_by" in spec:
        df = df.orderBy(
            *[
                F.col(c).asc() if d == "asc" else F.col(c).desc()
                for c, d in spec["order_by"]
            ]
        )
    if "limit" in spec:
        df = df.limit(int(spec["limit"]))
    return df
