"""Physical-plan audits — mechanical checks that the scale properties
we claim are actually in the plan (SURVEY brief: "`.explain` the plan
and iterate until it's the plan you'd want").

Used by tests/test_plans.py to lock in:
- column pruning (ReadSchema ⊆ expected columns),
- predicate pushdown (PushedFilters non-empty where claimed),
- broadcast joins for dimension tables (BroadcastHashJoin present,
  no SortMergeJoin for the small side),
- whole-stage codegen coverage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [m.group(1).strip() for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan) if m.group(1).strip()]


def join_strategies(df: DataFrame) -> list[str]:
    plan = simple_plan(df)
    return re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)


def has_codegen(df: DataFrame) -> bool:
    """AQE keeps the 'simple' plan adaptive (no codegen markers) until
    execution; the 'codegen' explain mode compiles the subtrees up
    front, so it reports faithfully without running the query."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    return "WholeStageCodegen" in plan


def audit(df: DataFrame) -> dict:
    return {
        "read_schemas": read_schemas(df),
        "pushed_filters": pushed_filters(df),
        "joins": join_strategies(df),
        "codegen": has_codegen(df),
    }
