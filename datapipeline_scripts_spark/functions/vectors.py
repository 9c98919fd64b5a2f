"""Vector column functions over ArrayType(FloatType) embeddings.

Everything is expressed with `zip_with` / `aggregate` / `transform` —
higher-order functions that run JVM-side inside codegen, so similarity
search needs no Python on the hot path (SURVEY §2.E E2).

Precision discipline: accumulate in DOUBLE (cast each element) so
results are reproducible against the DuckDB oracle, which is made to
cast to DOUBLE[] too. Sequential fold order == list order on both
engines → bit-stable results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket_sql(list_expr: str, dims: int = 8) -> str:
    """DuckDB twin of `sign_bucket`: the identical bucket id computed in
    SQL over a DOUBLE[] expression, so LSH-bucketed queries stay fully
    hash-checkable (dedup_embedding, knn_bucketed)."""
    return " + ".join(
        f"(CASE WHEN {list_expr}[{i + 1}] >= 0 THEN 1 ELSE 0 END) * {1 << (dims - 1 - i)}"
        for i in range(dims)
    )


def sign_bucket(a: Column, dims: int = 8) -> Column:
    """Cheap LSH bucket id: sign bits of the first `dims` coordinates.

    A stand-in random-hyperplane projection (axis-aligned planes are a
    valid, deterministic special case). Used to restrict candidate sets
    so similarity search joins on bucket instead of cross-joining — the
    100 TB scale path (SURVEY §7.2: "similarity via LSH bucketing, not
    cross-join").
    """
    bucket = F.lit(0)
    for i in range(dims):
        bit = F.when(F.element_at(a, i + 1) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket
