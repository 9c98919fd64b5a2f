"""Round-9 query keys, STAGED but NOT registered (the staged_r8.py
pattern, one round later): round 8's driver window is spent on the
five _ADDED_R8 keys plus oldest-evidence re-proofs (VERDICT r7 items
1-2), so the round-8 JPEG codec work enters the registry in round 9 —
already held to the registration bar here: `tests/test_staged_r9.py`
runs the builder against its DuckDB oracle at both fixture SFs.

multimodal_real_jpeg: per-document baseline JPEGs are ENCODED and
DECODED executor-side through the production stdlib codec
(extensions/jpeg_stdlib.py — the exact decode path
SPARK_GRAFT_REAL_DECODE routes JPEG payloads through, including a
restart marker every MCU, the path ImageIO's writer cannot emit), and
the DuckDB oracle recomputes width/height/dHash ARITHMETICALLY from
doc_id: the encoder takes quantized coefficients, so each decoded
pixel is the exact integer ((16384·dc + B[x][1]·11·ac + 4096 +
2^20) // 8192) with B the pinned fixed-point IDCT basis column —
SQL-expressible because the offset keeps the numerator positive
(truncating ≡ floor division, both engines). A hash match therefore
proves the whole huffman-encode → bitstream → huffman-decode →
dequantize → integer-IDCT → band-average → dHash chain bit-exact
under the driver's own eye.

Registration recipe (round 9): move ``@query`` in for the key, add an
``_ADDED_R9`` set to ``__spark_entry__.py``'s deferral union, bump the
freeze-invariant count in tests/test_staged_r9.py (311 → 312), update
COVERAGE.md + docs/SCALE.md.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipeline_scripts_spark.catalog import load_table

_W, _H = 16, 8  # two 8×8 blocks side by side
_Q00, _Q01 = 16, 11  # STD_LUMA_QUANT[0], [1] — asserted in the worker


def _coefs(doc_id: int) -> tuple[int, int, int, int]:
    """(dc0, ac0, dc1, ac1) from doc_id — ranges keep every decoded
    pixel inside [0, 255] so the oracle needs no clamp arithmetic."""
    return (
        (doc_id % 37) - 18,
        (doc_id % 5) - 2,
        ((doc_id * 7) % 41) - 20,
        ((doc_id * 3) % 7) - 3,
    )


def _jpeg_worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from datapipeline_scripts_spark.extensions import jpeg_stdlib as js
    from datapipeline_scripts_spark.extensions import multimodal as mm

    assert js.STD_LUMA_QUANT[0] == _Q00 and js.STD_LUMA_QUANT[1] == _Q01

    def blk(dc: int, ac01: int) -> list[int]:
        b = [0] * 64
        b[0], b[1] = dc, ac01
        return b

    for pdf in batches:
        widths, heights, phashes = [], [], []
        for doc_id in pdf["doc_id"]:
            dc0, ac0, dc1, ac1 = _coefs(int(doc_id))
            payload = js.encode_gray_baseline(
                _W, _H, [blk(dc0, ac0), blk(dc1, ac1)], restart_interval=1
            )
            w, h = mm._real_decode_dims("png", None, payload)
            widths.append(w)
            heights.append(h)
            phashes.append(mm._phash_pixels_jpeg(payload))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": widths,
                "height": heights,
                "phash": phashes,
            }
        )


def _real_jpeg_oracle() -> str:
    from datapipeline_scripts_spark.extensions import jpeg_stdlib as js
    from datapipeline_scripts_spark.extensions.multimodal import _PHASH_BITS

    b01 = [js._IDCT_BASIS[x][1] for x in range(8)]  # column (u=0,v=1)
    dc = ["((doc_id % 37) - 18)", "(((doc_id * 7) % 41) - 20)"]
    ac = ["((doc_id % 5) - 2)", "(((doc_id * 3) % 7) - 3)"]

    def val(x: int) -> str:
        blk, col = x // 8, x % 8
        return (
            f"((16384 * {dc[blk]} + {b01[col] * _Q01} * {ac[blk]}"
            f" + 1052672) // 8192)"
        )

    bands = []
    for k in range(_PHASH_BITS + 1):
        x0 = k * _W // (_PHASH_BITS + 1)
        x1 = max((k + 1) * _W // (_PHASH_BITS + 1), x0 + 1)
        total = " + ".join(val(x) for x in range(x0, x1))
        bands.append(f"(({total}) // {x1 - x0})")
    bits = " + ".join(
        f"(CASE WHEN {bands[i]} < {bands[i + 1]} THEN {1 << i} ELSE 0 END)"
        for i in range(_PHASH_BITS)
    )
    return f"""
        SELECT doc_id,
               {_W} AS width,
               {_H} AS height,
               CAST({bits} AS INTEGER) AS phash
        FROM documents
        WHERE doc_id % 4 = 0
        ORDER BY doc_id
    """


MULTIMODAL_REAL_JPEG_ORACLE = _real_jpeg_oracle()


def multimodal_real_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline-JPEG decode under the driver harness — see the
    module docstring for the proof structure. Scale shape:
    embarrassingly parallel Arrow-batch work; only (doc_id, 3 ints)
    leave the worker, never image bytes (same as multimodal_real_png).
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(
        _jpeg_worker,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("phash", T.IntegerType()),
            ]
        ),
    ).orderBy("doc_id")


STAGED: dict[str, tuple] = {
    "multimodal_real_jpeg": (multimodal_real_jpeg, MULTIMODAL_REAL_JPEG_ORACLE),
}
