"""DuckDB differential-test harness — the engine's own copy of the
driver's correctness gate (SURVEY §5.2), so every declared query is
verified locally before the driver ever sees it.

Comparison = row count + sorted column names + exact cell-by-cell
equality after canonicalization (rows sorted by their string image).
This is strictly *stricter* than an order-insensitive value hash: if
this passes, any hash over the same values passes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from datapipeline_scripts_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with every fixture table as a view —
    matching the driver's pre-registered views."""
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        # fixtures are single files, but Spark-written tables (e.g. the
        # scale-proxy datasets) are DIRECTORIES of part files — glob those
        # so the oracle runs on either layout
        import os as _os

        if _os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v: object) -> object:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and represent exactly
        return repr(v + 0.0)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


@dataclass
class DiffReport:
    key: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        extra = ("; " + "; ".join(self.issues)) if self.issues else ""
        return f"[{status}] {self.key}: spark={self.spark_rows} oracle={self.oracle_rows}{extra}"


def compare(key: str, spark_df: DataFrame, oracle_pdf: pd.DataFrame) -> DiffReport:
    spark_pdf = spark_df.toPandas()
    report = DiffReport(key=key, ok=True, spark_rows=len(spark_pdf), oracle_rows=len(oracle_pdf))
    s_cols, s_rows = canon_rows(spark_pdf)
    o_cols, o_rows = canon_rows(oracle_pdf)
    if s_cols != o_cols:
        report.ok = False
        report.issues.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return report
    if len(s_rows) != len(o_rows):
        report.ok = False
        report.issues.append("row count mismatch")
    mismatches = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    if mismatches:
        report.ok = False
        i = mismatches[0]
        report.issues.append(
            f"{len(mismatches)} differing rows; first at sorted idx {i}: spark={s_rows[i]} oracle={o_rows[i]}"
        )
    return report


def check_query(key: str, spark, sf_dir: str) -> DiffReport:
    """Run one declared query against its oracle (or rows-only)."""
    from datapipeline_scripts_spark.registry import get

    spec = get(key)
    sdf = spec.build(spark, sf_dir)
    if spec.oracle is None:
        n = sdf.count()
        return DiffReport(key=key, ok=True, spark_rows=n, oracle_rows=-1, issues=["rows-only"])
    with duck_connection(sf_dir) as con:
        opdf = con.execute(spec.oracle).fetch_df()
    return compare(key, sdf, opdf)
