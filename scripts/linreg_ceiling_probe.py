"""Measured probe of stats_linreg_multi's INT128 ceiling (VERDICT r05
item 4, ADVICE r05 finding 1).

The centered-covariance OLS form (advstats.py `_linreg_sql`) keeps the
Cramer-determinant EXPANSION terms under DECIMAL(38)/INT128 to ~6e8
rows — but the intercept-recovery product `cy*det` in the `nums` CTE
grows as mean_cents x n^3-scale det and crosses 1.7e38 first: on the
lineitem value distribution (cy ~ 3.8e6 cents, det ~ 3.75e30 at the
60M-row proxy) that is ~1.4e8 rows, ~4x BELOW the expansion's own
ceiling.  This script measures that instead of arguing it:

- generates a lineitem-shaped 3-column table (quantity ~ U{1..50},
  discount ~ U{0,1bp..1000bp}, extendedprice = quantity x unit-price so
  the covariance structure matches) at each requested row count,
- runs the SAME `_linreg_sql` template both engines share on the same
  parquet bytes,
- verifies the two 1-row results are identical BELOW the ceiling and
  that BOTH engines fail LOUDLY (overflow error, never a wrong number)
  ABOVE it.

Default bracket: 8e7 rows (must match) and 2e8 rows (must overflow).
Results are recorded in docs/SCALE_EXPERIMENT.md.

Usage: python scripts/linreg_ceiling_probe.py [n_rows ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from datapipeline_scripts_spark.operators.advstats import _linreg_sql
from datapipeline_scripts_spark.session import get_spark

_PROBE_DIR = "/tmp/spark_graft_linreg_probe"


def _generate(spark, n_rows: int) -> str:
    """Write an n-row lineitem-shaped table; both engines read the
    same parquet bytes, so the probe is distribution-identical."""
    path = f"{_PROBE_DIR}_{n_rows}"
    if os.path.isdir(path):
        return path
    df = spark.range(n_rows).select(
        (F.lit(1) + F.pmod(F.xxhash64("id"), F.lit(50))).alias("l_quantity"),
        # 0..1000 bp in 100-bp steps, /1e4 -> the 0.00..0.10 discount domain
        (
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(11)) * 100).cast("double")
            / 1e4
        ).alias("l_discount"),
        # price = quantity x unit-price (200.00..2000.00 dollars) so
        # extendedprice correlates with quantity the way lineitem's does;
        # cents stay far below 2^53 so the double roundtrip is exact
        (
            (
                (F.lit(1) + F.pmod(F.xxhash64("id"), F.lit(50)))
                * (F.lit(20000) + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(180001)))
            ).cast("double")
            / 100.0
        ).alias("l_extendedprice"),
    )
    df.write.mode("overwrite").parquet(path)
    return path


def _run_spark(spark, path: str):
    spark.read.parquet(path).createOrReplaceTempView("linreg_probe_v")
    df = spark.sql(_linreg_sql("linreg_probe_v", "DECIMAL(38,0)", "div"))
    row = df.first()
    return tuple(row)


def _run_duck(path: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW linreg_probe_v AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    row = con.execute(_linreg_sql("linreg_probe_v", "HUGEINT", "//")).fetchone()
    con.close()
    return tuple(row)


def main() -> int:
    ns = [int(float(a)) for a in sys.argv[1:]] or [80_000_000, 200_000_000]
    spark = get_spark("linreg_ceiling_probe")
    failures = 0
    for n in ns:
        t0 = time.time()
        path = _generate(spark, n)
        print(f"# n={n}: generated {path} ({time.time() - t0:.1f}s)", flush=True)
        results: dict[str, object] = {}
        for engine, runner in (("spark", _run_spark), ("duck", _run_duck)):
            t0 = time.time()
            try:
                results[engine] = runner(spark, path) if engine == "spark" else runner(path)
                print(
                    f"#   {engine}: {results[engine]} ({time.time() - t0:.1f}s)",
                    flush=True,
                )
            except Exception as ex:  # noqa: BLE001 - overflow is an expected outcome
                msg = str(ex).split("\n")[0][:160]
                results[engine] = ("OVERFLOW", msg)
                print(f"#   {engine}: LOUD overflow ({time.time() - t0:.1f}s): {msg}", flush=True)
        s, d = results["spark"], results["duck"]
        s_over = isinstance(s, tuple) and s and s[0] == "OVERFLOW"
        d_over = isinstance(d, tuple) and d and d[0] == "OVERFLOW"
        if s_over or d_over:
            ok = s_over and d_over  # loud on BOTH sides, never a wrong number
            print(f"[{'OK ' if ok else 'FAIL'}] n={n}: overflow spark={s_over} duck={d_over}", flush=True)
        else:
            ok = s == d
            print(f"[{'OK ' if ok else 'FAIL'}] n={n}: match={ok} spark={s} duck={d}", flush=True)
        if not ok:
            failures += 1
        shutil.rmtree(path, ignore_errors=True)  # keep /tmp bounded
    print(f"done: {failures} failures / {len(ns)} probed", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
