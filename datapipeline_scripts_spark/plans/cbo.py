"""Cost-based optimization surface: table/column statistics feeding
Catalyst's planner (ANALYZE TABLE → join strategy / join reorder).

Path-based reads (`spark.read.parquet(path)`) estimate sizes from file
footers, which is enough for broadcast decisions but gives the planner
no row counts or column NDVs. The catalog path is how a production
deployment runs: register the table, `ANALYZE TABLE`, and Catalyst's
CBO (join reorder, stats-based build-side choice) and the optimized
plan's `stats()` use the recorded statistics instead of guesses.

At 100 TB this is not optional polish: a star join whose fact-table
row count is a guess can put the build side on the wrong relation, and
join *reorder* (`spark.sql.cbo.joinReorder.enabled`) needs column NDV
to estimate intermediate cardinalities. ANALYZE is a metadata-only
scan-once job — amortized over every query planned afterwards.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

#: session conf that turns the recorded stats into planner behavior
CBO_CONF = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.statistics.histogram.enabled": "true",
}


def register_external(spark: SparkSession, sf_dir: str, table: str, suffix: str) -> str:
    """Register the fixture parquet as an external catalog table (no
    copy — `LOCATION` points at the existing file). Returns the
    catalog name `{table}_{suffix}`."""
    name = f"{table}_{suffix}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{sf_dir}/{table}.parquet'")
    return name


def analyze(spark: SparkSession, name: str, columns: list[str] | None = None) -> None:
    """ANALYZE TABLE: row count + size; with `columns`, per-column
    min/max/NDV/null-count (what join reorder and selectivity
    estimation consume)."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}")


def table_stats(spark: SparkSession, name: str) -> dict[str, int]:
    """Recorded table-level statistics, parsed from DESCRIBE EXTENDED
    (e.g. `{'sizeInBytes': 123, 'rowCount': 456}`)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    for r in rows:
        if r["col_name"] == "Statistics":
            out: dict[str, int] = {}
            m = re.search(r"(\d+)\s+bytes", r["data_type"])
            if m:
                out["sizeInBytes"] = int(m.group(1))
            m = re.search(r"(\d+)\s+rows", r["data_type"])
            if m:
                out["rowCount"] = int(m.group(1))
            return out
    return {}


def column_stats(spark: SparkSession, name: str, column: str) -> dict[str, str]:
    """Per-column statistics (distinct_count, min, max, num_nulls …)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name} {column}").collect()
    return {r["info_name"]: r["info_value"] for r in rows}


def plan_row_count(spark: SparkSession, sql: str) -> int | None:
    """Row count the optimizer *estimates* for a query — the CBO's view,
    from the optimized logical plan's stats."""
    jqe = spark.sql(sql)._jdf.queryExecution()
    stats = jqe.optimizedPlan().stats()
    opt = stats.rowCount()
    return int(opt.get()) if not opt.isEmpty() else None
