"""Text column functions: normalization, tokenization, shingling,
fingerprinting.

These mirror the reference's shell text pipeline primitives (sed/grep/awk
— /root/reference/backup.sh:130, /root/reference/psql-backups.sh:146-148)
as Catalyst expressions, and power the SURVEY §2.E text-analysis /
dedup extensions.

All functions return Column expressions (lazy, codegen'd); nothing here
touches Python row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase, trim, collapse whitespace — canonical form for dedup."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(normalize_text(col), " ")


def fingerprint_md5(col: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text.

    Scale note: at 100 TB, group/dedup on this 32-char hex instead of the
    full document body — the shuffle moves 32 bytes per row, not the text.
    """
    return F.md5(normalize_text(col).cast("binary"))


def md5_48(col: Column) -> Column:
    """First 48 bits of md5 as a BIGINT — the cross-engine token hash.

    Unlike xxhash64 (Spark-only), md5 exists in DuckDB too, so every
    fingerprint built on this is oracle-checkable bit-for-bit; 48 bits
    keeps the value positive and exact in BIGINT/DOUBLE on both sides."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def md5_48_sql(expr: str) -> str:
    """DuckDB twin of `md5_48` over a VARCHAR SQL expression. DuckDB has
    no hex→int builtin, so the 12 hex digits are parsed positionally."""
    hx = f"substr(md5({expr}), 1, 12)"
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({hx}, {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    )


def ngram_join(arr_col: Column, n: int, sep: str = " ") -> Column:
    """UNGUARDED n-gram fold over an array column: n aligned slices
    folded pairwise with zip_with (the fast form `shingles` uses —
    14× over the index-transform + element_at construction). Valid
    only when size(arr_col) >= n; callers own the short-array guard
    (shingles wraps the whole array, the 8-gram keys emit empty)."""
    cnt = F.size(arr_col) - (n - 1)
    parts = [F.slice(arr_col, j + 1, cnt) for j in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.concat_ws(sep, a, b))
    return acc


def shingles(tok_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (for MinHash / Jaccard).

    Built as n aligned `slice`s folded pairwise with `zip_with` —
    measured 14× faster than the previous index-`transform` form
    (`transform(sequence(...), i -> concat_ws(element_at ×n))`): HOF
    lambdas evaluate interpreted either way, but the old form paid n
    full `element_at` array lookups per shingle per lambda call,
    while zip_with streams the two aligned arrays once per fold.
    Output is bit-identical (the r10 switch re-proved every
    shingle-consuming oracle hash unchanged); no UDF either way.
    """
    # ngram_join is valid only when size >= n; guard with when().
    return F.when(F.size(tok_col) >= n, ngram_join(tok_col, n)).otherwise(
        F.array(F.concat_ws(" ", tok_col))
    )


def stopword_hits(tok_col: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are in `stopwords` (int)."""
    return F.size(F.filter(tok_col, lambda t: t.isin(*stopwords)))


def winnow_fps(tok_col: Column, window: int) -> Column:
    """Per-document winnowing fingerprint set, computed IN-ROW:
    md5_48-hash every 3-shingle, slide a `window`-wide min over the
    hash sequence keeping only full windows (plus the single short
    window of a doc with < `window` shingles), dedupe — all as
    higher-order array functions over the token array.

    Optimization round 13 (guide §2.4 — remove shuffles outright):
    this replaces the posexplode → md5 → two window functions
    (count + min, each needing the rows hash-partitioned by doc_id)
    → DISTINCT construction, which shuffled every (doc_id, pos, hash)
    shingle triple and then the fingerprint table again, with a pure
    projection: ZERO exchanges until a consumer aggregates the
    fingerprints. Values are bit-identical to the window form — the
    window min over `ROWS BETWEEN CURRENT AND window-1 FOLLOWING`
    (truncating at the partition end) is `array_min(slice(hs, pos+1,
    window))` (slice truncates at the array end), and the
    `pos <= greatest(n - window, 0)` full-window filter is the
    sequence bound — re-proven by the unchanged oracle hashes of
    every winnow-consuming key.

    The hash array is let-bound through a single-element-array
    `transform` so the per-shingle md5 runs ONCE per document even
    though the sliding windows reference it `n_fps` times — without
    the binding, CollapseProject would inline the whole hash-array
    expression into every window position (the guide §4.4 duplication
    problem, in expression form)."""
    hs_expr = F.transform(shingles(tok_col, 3), md5_48)
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.array(hs_expr),
                lambda hs: F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(hs) - window, F.lit(0))),
                    lambda p: F.array_min(F.slice(hs, p + F.lit(1), F.lit(window))),
                ),
            )
        )
    )
