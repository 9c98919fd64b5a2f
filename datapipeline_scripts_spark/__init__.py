"""datapipeline_scripts_spark — a PySpark-native analytics / data-pipeline engine.

A from-scratch re-expression of the capability surface of
``articulate/datapipeline-scripts`` (a bash RDS backup/restore-verify
pipeline; see SURVEY.md) as an idiomatic Apache Spark engine:

- ``session``    — SparkSession factory (UTC, AQE, local tuning).
- ``catalog``    — fixture-table loader / temp-view registration.
- ``registry``   — declared-query registry: every operator ships a
  DataFrame builder AND a DuckDB oracle SQL string, so the engine is
  differentially tested query-by-query (SURVEY.md §5.2).
- ``operators``  — core relational catalog (SURVEY.md §2.D).
- ``extensions`` — dedup / similarity / text analysis / multimodal
  (SURVEY.md §2.E, BASELINE.json north star).
- ``streaming``  — event-time windows, watermarks, as-of joins.
- ``pipeline``   — the reference's own control-plane surface: snapshot,
  restore-verify, retry/backoff, cleanup, check-in (SURVEY.md §2.A).
- ``sources``    — readers/writers (parquet, csv, json, jdbc config).

Design for 100 TB: DataFrame/SQL only (Catalyst + whole-stage codegen),
broadcast for dims, partitioned writes, no collect() on the data path.
"""

__version__ = "0.1.0"
