"""Reusable column-expression libraries (pure `pyspark.sql.functions`
compositions — JVM-side, codegen-friendly; no Python UDFs here)."""
