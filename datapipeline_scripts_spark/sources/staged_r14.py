"""Round-14 query keys, STAGED but NOT registered (the staged_r10-r13
pattern, one round later): round 13's driver window is committed to
the eleven _ADDED_R13 keys plus stalest-evidence re-proofs, so the
surface built in round 13 enters the registry in round 14 — already
held to the registration bar here: `tests/test_staged_r14.py` runs
every builder against its DuckDB oracle at both fixture SFs.

The round-13 steer (VERDICT r12 item 6) named the family: PII
detection / redaction for text corpora — the one standard
LLM-pipeline curation stage the catalog lacked, the D38
`column_masking` idiom generalized to free text (reference analogue:
the line-filter semantics of psql-backups.sh:146-148 — regex-selected
content rewritten/dropped before the artifact ships — applied for
real), plus the integer-exact IVF training step VERDICT r12 item 8
asked the similarity family to close.

**The fixture corpus contains NO natural PII** (probed: zero digits,
hyphens, '@' or '.' characters in any text at either SF), so every
class is CONSTRUCTED — the refetch-idiom generalized: docs get a
deterministic doc_id-derived PII suffix by doc_id % 11 class (email /
phone / IPv4 / SSN-shaped ID / email+IP multi-class), built from one
shared SQL template rendered for both engines, so every verdict class
provably fires at every SF (scale-honesty lesson 3) and the detection
counts are exactly predictable. The four class regexes were probed
character-for-character identical between Spark's Java regex and
DuckDB's RE2 (counts AND rewritten strings) before staging.

pii_detect_classes: the detection census — one row per (source,
pii_class): documents hit, spans, characters. Regex stays in codegen
(regexp_count / regexp_replace-length), never a Python UDF.

pii_density_report: the per-document triage view — per-class span
counts, total PII characters (via blank-redaction length delta, so
overlapping classes can never double-count), and density in bp.

pii_redact_corpus: the rewrite itself — every class replaced with a
typed placeholder; per source: docs touched, chars in/out, and a
bit_xor(md5_48(redacted)) corpus fingerprint, so the oracle proves
the redacted TEXTS match bit-for-bit, not just the counts (bit_xor,
never sum — the hash-rollup overflow lesson).

pii_gate_filter: the curation gate — any SSN-shaped ID is an
unconditional drop; otherwise density above _PII_MAX_BP drops; per
lang: arrived / kept / per-reason drops. Both drop classes fire at
every SF (short docs push injected density past the threshold; doc_id
% 11 == 4 docs carry IDs).

pii_anonymize_consistent: consistent pseudonymization — every email
mention maps to a stable md5_48-derived surrogate, so referential
structure survives anonymization. The construction reuses one email
across ~6 docs per 33-window (doc_id div 33 drives the address), so
the consistency machinery (mentions > distinct, surrogate-count ==
email-count) provably fires.

pii_residual_audit: the verification gate a privacy pipeline runs
after redaction — per class, spans before vs spans after the full
rewrite (after == 0 when every class is redacted; the test tamper
drill drops one class from the chain and asserts exactly that class's
residual count goes nonzero).

docs_stream_pii_gate: the streaming twin beside the registered
docs_stream_quality_gate / docs_stream_dedup_gate / staged DSIR gate:
arriving docs (doc_id % 10 >= 7) flow through a REAL Structured
Streaming replay; the gate decision is a stateless codegen'd
projection and the per-lang rollup is ONE streaming aggregation in
complete mode.

privacy_pipeline: the composite — gate → redact survivors → publish;
per lang: arrived / gated-out / kept, spans+chars removed from the
kept set, and the kept-corpus redacted fingerprint. Every stage is
the standalone keys' machinery by import.

knn_ivf_train_int: the INTEGER-EXACT Lloyd training step (VERDICT r12
item 8): `knn_ivf_lloyd` (extensions/similarity.py:180) stays
unregistered because float mean re-centering is partial-agg-order
sensitive; this key quantizes to 2^10-scaled BIGINTs, re-centers with
shifted integer division ((sum + n*shift) div n - shift, so the
division never sees a negative operand — Spark div truncates toward
zero, DuckDB // floors), and reassigns against the integer centroids:
bit-reproducible across engines at any parallelism, the registrable
form of the same maintenance operation.

dedup_semantic_crowding: the SemDeDup-shaped centroid-crowding report
(Abbas et al., arXiv:2303.09540) — every vector assigns to its
nearest seed centroid and members whose cosine to the CENTROID clears
0.95 are the near-duplicates a semantic dedup pass prunes (keep one
per list). Integer-exact cosine via 2^8 quantization and a squared
comparison (dot^2 * 10^4 >= t^2*10^4 * |q|^2 * |c|^2 — no sqrt, no
float), and the crowding form is member-to-PROTOTYPE only: linear in
members under any duplication profile, never pairwise-within-cluster
(the canonical-partner lesson applied to vectors). The fixtures'
embeddings are near-orthogonal, so the crowding class is CONSTRUCTED
(vec_id % 125 == 7 carries seed (vec_id % 16)'s embedding scaled by
2 + vec_id % 3 — the scaling makes the cosine semantics load-bearing:
a dot-threshold bug rejects the scaled copies).

pii_k_anonymity: the k-anonymity / l-diversity release audit
(Sweeney 2002; Machanavajjhala et al. 2007) over the customer
quasi-identifiers — the structured-microdata counterpart of the
free-text keys above: a 5-level generalization ladder (exact balance
cents -> 2500-band -> drop band -> nation->region -> drop segment,
each a strict coarsening, so suppression is provably monotone), per
level the class census, forced suppression at k=10, and minimum
surviving-class sensitive diversity.

split_leakage_audit: the dedup-across-splits contamination check
(Lee et al. 2107.06499; Dodge et al. 2104.08758) — MinHash-LSH near-
dup clusters (the registered dedup_minhash + connected_components
machinery by import) crossed with the registered 80/10/10 md5 split:
one row per cluster split-mix, with per-split doc counts; '+' rows
are the contamination and their n_val/n_test the eval docs a clean
pipeline drops. The oracle reuses the registered recursive-closure
twin at fixture SFs and the staged iterative twin
(proxy_oracles.py::twin_split_leakage_audit) at deep rungs.

pii_randomized_response: the local-DP release stage (Warner 1965;
RAPPOR's core) — per-category counts published through deterministic
md5 coins (keep p = 3/4, else uniform over the k OBSERVED
categories, k and the category table derived from the data) plus the
integer-exact debiased estimate, GREATEST-shifted so no cross-engine
division ever sees a negative operand. Deterministic coins are what
make a DP mechanism hash-testable at all.

Scale shapes:
- The PII keys are single-scan codegen'd projections + one groupBy on
  (source|lang|class): no joins, no explodes beyond per-mention email
  extraction (bounded by match count), shuffles carry counters. At
  100 TB this is the cheapest family in the catalog.
- The anonymize key groups on (source, email) — cardinality is the
  distinct-address count, the join-free pseudonym table a production
  run would persist.
- The stream gate holds |langs| counters of state, nothing per-doc.
- knn_ivf_train_int: assignment is |vectors| x K broadcast dots
  (array-local zip_with, no explode); recentering is one
  partial-aggregable groupBy over (K x dims) cells; the model that
  ships is K rows.
- pii_k_anonymity: one broadcast dim join + |levels| counter-only
  groupBys; the report is |levels| rows at any population size.
- pii_randomized_response: one scan + a k-row broadcast category
  join; the release is k counter rows from one partial-aggregable
  groupBy. Hash-exact at the 5M-doc 1000x rung in 23 s.
- split_leakage_audit: inherits dedup_minhash's proven banded pair
  shape + diameter-bounded CC on the pairs frame; the census is two
  counter-only groupBys. 100x fingerprint-proven over the 27M-pair
  adversarial profile via the staged iterative twin.
- dedup_semantic_crowding: |vectors| x K broadcast dots (the
  knn_ivf_train_int assignment shape) + one K-counter rollup; no
  member-to-member comparison exists in the plan, so cost is linear
  in members at any duplication profile. Proxy ladder: crowded counts
  grow exactly linearly (310 -> 3,100 at 10x/100x), value-exact at
  the 2M-vector 1000x rung in 71 s.

Registration recipe (round 14): register all keys from ``STAGED``
(the staged_r11/r12/r13 programmatic flip), ``_ADDED_R14`` in
``__spark_entry__.py``'s deferral union, staged_r14 import in
``registry._ensure_loaded``, freeze counts 379 -> 379+len(STAGED)
across tests/test_staged_r*.py, COVERAGE.md + docs/SCALE.md, and any
heavy keys into ``bench.py`` BENCH_KEYS with probed warm costs
(docs/BENCH_NOTES.md "Round-14 prospective").

The flip was DRY-RUN in a throwaway clone at the end of round 13
(re-run after each late addition; final family: the 8 PII keys +
knn_ivf_train_int, dedup_semantic_crowding, pii_k_anonymity,
split_leakage_audit, pii_randomized_response): registering the staged
keys + the registry import + the ``_ADDED_R14`` union took the
catalog to 392 with no import-order issues, and
``scripts/driver_sim.py sf0.01 50`` over the flipped surface passed
0/50 with all thirteen new keys inside the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scripts_spark.catalog import load_table
from datapipeline_scripts_spark.functions.text import md5_48, md5_48_sql

STAGED: dict[str, tuple] = {}

# ---- shared PII machinery ----------------------------------------------------

_PII_MOD = 11  # doc_id % 11 selects the constructed class
_PII_MAX_BP = 600  # density gate: drop docs more than 6% PII by characters

# Class regexes — probed identical between Spark (Java regex) and
# DuckDB (RE2) on counts AND rewritten strings, including the
# multi-class and boundary cases, before staging. No backreferences,
# no lookaround — the RE2-safe subset.
_PII_RE = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}
_PII_PLACEHOLDER = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
    "ssn": "<SSN>",
}
# Redaction applies in this fixed order on BOTH engines. email first
# (its matches contain dots that the ipv4 regex must never see), then
# ipv4 / ssn / phone (mutually disjoint formats: 3-2-4 vs 3-3-4
# digit groups cannot overlap, and \b never splits a digit run).
_PII_REDACT_ORDER = ("email", "ipv4", "ssn", "phone")
_PII_CLASSES = tuple(sorted(_PII_RE))  # report order

# One suffix template rendered for both engines ({div}: Spark `div`,
# DuckDB `//`; {vc}: STRING vs VARCHAR) — the construction cannot
# fork. Every arithmetic operand is non-negative, so div/// agree.
_PII_EMAIL_TMPL = (
    "' contact user' || CAST(doc_id {div} 33 AS {vc})"
    " || '@mail' || CAST((doc_id {div} 33) % 7 AS {vc}) || '.example.com'"
)
_PII_SUFFIX_TMPL = (
    "CASE CAST(doc_id % " + str(_PII_MOD) + " AS INT)"
    " WHEN 1 THEN " + _PII_EMAIL_TMPL +
    " WHEN 2 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS {vc}), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS {vc}), 4, '0')"
    " WHEN 3 THEN ' from 10.' || CAST(doc_id % 256 AS {vc}) || '.'"
    " || CAST((doc_id {div} 256) % 256 AS {vc})"
    " || '.' || CAST(doc_id % 250 + 1 AS {vc})"
    " WHEN 4 THEN ' ssn ' || lpad(CAST(doc_id % 900 + 100 AS {vc}), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 90 + 10 AS {vc}), 2, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS {vc}), 4, '0')"
    " WHEN 5 THEN " + _PII_EMAIL_TMPL +
    " || ' via 192.168.' || CAST(doc_id % 256 AS {vc})"
    " || '.' || CAST(doc_id % 200 + 1 AS {vc})"
    " ELSE '' END"
)


def _pii_body_expr(engine: str) -> str:
    """The (doc_id, text) -> body expression for `engine` ('spark' |
    'duck'). NULL text coalesces to '' on both engines (the ADVICE
    r12 span-bodies lesson applied by construction)."""
    div, vc = ("div", "STRING") if engine == "spark" else ("//", "VARCHAR")
    suffix = _PII_SUFFIX_TMPL.format(div=div, vc=vc)
    return f"concat(coalesce(text, ''), {suffix})"


def _pii_bodies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, body): fixture text with the
    deterministic constructed-PII suffix."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", "source", F.expr(_pii_body_expr("spark")).alias("body")
    )


def _pii_bodies_sql() -> str:
    return (
        "bodies AS (SELECT doc_id, lang, source, "
        + _pii_body_expr("duck")
        + " AS body FROM documents)"
    )


def _redacted(col: Column, blank: bool = False, skip: tuple = ()) -> Column:
    """The redaction chain (fixed class order, both engines)."""
    for k in _PII_REDACT_ORDER:
        if k in skip:
            continue
        col = F.regexp_replace(col, _PII_RE[k], "" if blank else _PII_PLACEHOLDER[k])
    return col


def _redact_sql(expr: str, blank: bool = False, skip: tuple = ()) -> str:
    for k in _PII_REDACT_ORDER:
        if k in skip:
            continue
        rep = "" if blank else _PII_PLACEHOLDER[k]
        expr = f"regexp_replace({expr}, '{_PII_RE[k]}', '{rep}', 'g')"
    return expr


def _count_sql(expr: str, klass: str) -> str:
    return f"len(regexp_extract_all({expr}, '{_PII_RE[klass]}'))"


def _chars_sql(expr: str, klass: str) -> str:
    return (
        f"length({expr}) - length(regexp_replace({expr}, '{_PII_RE[klass]}', '', 'g'))"
    )


# ---- pii_detect_classes --------------------------------------------------------


def pii_detect_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection census; one row per (source, pii_class):
    (source, pii_class, n_docs, n_spans, n_chars). The whole key is
    one codegen'd scan projection + one groupBy(source) — regex never
    leaves the JVM, shuffles carry 4x3 counters per source."""
    b = _pii_bodies(spark, sf_dir)
    per = b.select(
        "source",
        *[F.regexp_count("body", F.lit(_PII_RE[k])).alias(f"{k}_n") for k in _PII_CLASSES],
        *[
            (
                F.length("body")
                - F.length(F.regexp_replace("body", _PII_RE[k], ""))
            ).alias(f"{k}_c")
            for k in _PII_CLASSES
        ],
    )
    agg = per.groupBy("source").agg(
        *[
            a
            for k in _PII_CLASSES
            for a in (
                F.sum(F.when(F.col(f"{k}_n") > 0, 1).otherwise(0)).alias(f"{k}_docs"),
                F.sum(f"{k}_n").alias(f"{k}_spans"),
                F.sum(f"{k}_c").alias(f"{k}_chars"),
            )
        ]
    )
    out = agg.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("pii_class"),
                        F.col(f"{k}_docs").cast("long").alias("n_docs"),
                        F.col(f"{k}_spans").cast("long").alias("n_spans"),
                        F.col(f"{k}_chars").cast("long").alias("n_chars"),
                    )
                    for k in _PII_CLASSES
                ]
            )
        ).alias("e"),
    )
    return out.select(
        "source", "e.pii_class", "e.n_docs", "e.n_spans", "e.n_chars"
    ).orderBy("source", "pii_class")


def _detect_oracle() -> str:
    selects = []
    for k in _PII_CLASSES:
        selects.append(
            f"""
SELECT source, '{k}' AS pii_class,
       CAST(count(*) FILTER (WHERE {_count_sql('body', k)} > 0) AS BIGINT) AS n_docs,
       CAST(coalesce(sum({_count_sql('body', k)}), 0) AS BIGINT) AS n_spans,
       CAST(coalesce(sum({_chars_sql('body', k)}), 0) AS BIGINT) AS n_chars
FROM bodies GROUP BY source"""
        )
    return (
        "WITH "
        + _pii_bodies_sql()
        + " SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY source, pii_class"
    )


PII_DETECT_CLASSES_ORACLE = _detect_oracle()

STAGED["pii_detect_classes"] = (pii_detect_classes, PII_DETECT_CLASSES_ORACLE)


# ---- pii_density_report --------------------------------------------------------


def pii_density_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII triage; one row per document carrying any PII:
    (doc_id, n_email, n_ipv4, n_phone, n_ssn, pii_chars, density_bp).
    pii_chars is the length delta of the blank-redaction chain, so
    overlapping class matches can never double-count a character."""
    b = _pii_bodies(spark, sf_dir)
    pii_chars = F.length("body") - F.length(_redacted(F.col("body"), blank=True))
    out = b.select(
        "doc_id",
        *[
            F.regexp_count("body", F.lit(_PII_RE[k])).cast("long").alias(f"n_{k}")
            for k in _PII_CLASSES
        ],
        pii_chars.cast("long").alias("pii_chars"),
        F.expr(
            "CAST((length(body) - length({red})) * 10000 div greatest(length(body), 1) AS BIGINT)".format(
                red=_redact_sql_spark("body")
            )
        ).alias("density_bp"),
    )
    return out.filter(F.col("pii_chars") > 0).orderBy("doc_id")


def _redact_sql_spark(expr: str) -> str:
    """The blank-redaction chain as a Spark SQL string (regexp_replace
    without a flags argument replaces ALL matches in Spark; escape
    backslashes for the SQL-literal parser)."""
    for k in _PII_REDACT_ORDER:
        pat = _PII_RE[k].replace("\\", "\\\\")
        expr = f"regexp_replace({expr}, '{pat}', '')"
    return expr


PII_DENSITY_REPORT_ORACLE = f"""
WITH {_pii_bodies_sql()}
SELECT doc_id,
       {", ".join(f"CAST({_count_sql('body', k)} AS BIGINT) AS n_{k}" for k in _PII_CLASSES)},
       CAST(length(body) - length({_redact_sql('body', blank=True)}) AS BIGINT) AS pii_chars,
       CAST((length(body) - length({_redact_sql('body', blank=True)})) * 10000
            // greatest(length(body), 1) AS BIGINT) AS density_bp
FROM bodies
WHERE length(body) - length({_redact_sql('body', blank=True)}) > 0
ORDER BY doc_id
"""

STAGED["pii_density_report"] = (pii_density_report, PII_DENSITY_REPORT_ORACLE)


# ---- pii_redact_corpus ---------------------------------------------------------


def pii_redact_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The redaction rewrite audit; one row per source: (source,
    n_docs, n_docs_redacted, chars_in, chars_out, redacted_xor).
    redacted_xor = bit_xor(md5_48(redacted body)) — the oracle proves
    the rewritten TEXTS are identical cross-engine, not just counts
    (bit_xor: order-independent, 64-bit-closed, the hash-rollup
    overflow lesson)."""
    b = _pii_bodies(spark, sf_dir)
    red = _redacted(F.col("body"))
    per = b.select(
        "source",
        F.length("body").alias("len_in"),
        F.length(red).alias("len_out"),
        (red != F.col("body")).cast("int").alias("touched"),
        md5_48(red).alias("rh"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("touched").cast("long").alias("n_docs_redacted"),
            F.sum("len_in").cast("long").alias("chars_in"),
            F.sum("len_out").cast("long").alias("chars_out"),
            F.bit_xor("rh").alias("redacted_xor"),
        )
        .orderBy("source")
    )


PII_REDACT_CORPUS_ORACLE = f"""
WITH {_pii_bodies_sql()},
red AS (SELECT source, body, {_redact_sql('body')} AS r FROM bodies)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN r <> body THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
       CAST(sum(length(body)) AS BIGINT) AS chars_in,
       CAST(sum(length(r)) AS BIGINT) AS chars_out,
       bit_xor({md5_48_sql('r')}) AS redacted_xor
FROM red GROUP BY source ORDER BY source
"""

STAGED["pii_redact_corpus"] = (pii_redact_corpus, PII_REDACT_CORPUS_ORACLE)


# ---- pii_gate_filter -----------------------------------------------------------


def _pii_gate_flags(b: DataFrame) -> DataFrame:
    """(doc_id, lang, source, body, drop_ssn, drop_density): the gate
    decision — shared by the gate key, the composite and (as an
    expression twin) the streaming gate, so the policy cannot fork."""
    n_ssn = F.regexp_count("body", F.lit(_PII_RE["ssn"]))
    dens = F.expr(
        "CAST((length(body) - length({red})) * 10000 div greatest(length(body), 1) AS BIGINT)".format(
            red=_redact_sql_spark("body")
        )
    )
    return b.select(
        "doc_id",
        "lang",
        "source",
        "body",
        (n_ssn > 0).cast("int").alias("drop_ssn"),
        ((n_ssn == 0) & (dens > _PII_MAX_BP)).cast("int").alias("drop_density"),
    )


_GATE_FLAGS_SQL = f"""
flags AS (
  SELECT doc_id, lang, source, body,
         CASE WHEN {_count_sql('body', 'ssn')} > 0 THEN 1 ELSE 0 END AS drop_ssn,
         CASE WHEN {_count_sql('body', 'ssn')} = 0
                   AND (length(body) - length({_redact_sql('body', blank=True)})) * 10000
                       // greatest(length(body), 1) > {_PII_MAX_BP}
              THEN 1 ELSE 0 END AS drop_density
  FROM bodies
)
"""


def pii_gate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII curation gate; one row per lang: (lang, n_arrived,
    n_kept, n_drop_ssn, n_drop_density). SSN-shaped IDs drop
    unconditionally; otherwise density above _PII_MAX_BP (600 bp)
    drops. Both drop classes fire at every SF by construction
    (doc_id % 11 == 4 docs carry IDs; short injected docs exceed the
    density bar)."""
    flags = _pii_gate_flags(_pii_bodies(spark, sf_dir))
    return (
        flags.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_arrived"),
            F.sum(
                1 - F.greatest(F.col("drop_ssn"), F.col("drop_density"))
            )
            .cast("long")
            .alias("n_kept"),
            F.sum("drop_ssn").cast("long").alias("n_drop_ssn"),
            F.sum("drop_density").cast("long").alias("n_drop_density"),
        )
        .orderBy("lang")
    )


PII_GATE_FILTER_ORACLE = f"""
WITH {_pii_bodies_sql()},
{_GATE_FLAGS_SQL}
SELECT lang, CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(sum(1 - greatest(drop_ssn, drop_density)) AS BIGINT) AS n_kept,
       CAST(sum(drop_ssn) AS BIGINT) AS n_drop_ssn,
       CAST(sum(drop_density) AS BIGINT) AS n_drop_density
FROM flags GROUP BY lang ORDER BY lang
"""

STAGED["pii_gate_filter"] = (pii_gate_filter, PII_GATE_FILTER_ORACLE)


# ---- pii_anonymize_consistent --------------------------------------------------


def pii_anonymize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent email pseudonymization; one row per source:
    (source, n_mentions, n_distinct_emails, n_distinct_surrogates,
    n_cross_source_emails, max_global_reuse, mapping_xor). Every
    mention of one address maps to the same md5_48-derived surrogate,
    so joins on the anonymized column still link the same entity
    ACROSS documents and sources. n_distinct_surrogates ==
    n_distinct_emails is the collision check; reuse is computed over
    the GLOBAL mention table (one address spans ~6 docs per
    33-window, and those docs scatter across sources — a per-source
    reuse count would be structurally 1 on these fixtures, the
    dead-machinery trap), so max_global_reuse >= 2 and
    n_cross_source_emails >= 1 provably fire. mapping_xor
    fingerprints the DISTINCT (email -> surrogate) pairs per source
    (xor over per-mention rows would cancel even-count duplicates).

    Scale shape: one scan + one groupBy(email) for the global reuse
    table + one groupBy(source, email) — mention-table-sized
    shuffles carrying short strings, the pseudonym table a
    production run persists."""
    b = _pii_bodies(spark, sf_dir)
    mentions = b.select(
        "source",
        F.explode(F.regexp_extract_all("body", F.lit(_PII_RE["email"]), 0)).alias(
            "email"
        ),
    )
    glob = mentions.groupBy("email").agg(
        F.count("*").alias("n_global"),
        F.count_distinct("source").alias("n_sources"),
    )
    pairs = (
        mentions.groupBy("source", "email")
        .agg(F.count("*").alias("n"))
        .join(glob, "email")
        .withColumn(
            "surrogate",
            F.concat(
                F.lit("user-"), md5_48(F.col("email")).cast("string"), F.lit("@anon.invalid")
            ),
        )
    )
    return (
        pairs.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_mentions"),
            F.count("*").cast("long").alias("n_distinct_emails"),
            F.count_distinct("surrogate").cast("long").alias("n_distinct_surrogates"),
            F.sum(F.when(F.col("n_sources") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_cross_source_emails"),
            F.max("n_global").cast("long").alias("max_global_reuse"),
            F.bit_xor(md5_48(F.concat("email", F.lit("=>"), "surrogate"))).alias(
                "mapping_xor"
            ),
        )
        .orderBy("source")
    )


PII_ANONYMIZE_CONSISTENT_ORACLE = f"""
WITH {_pii_bodies_sql()},
mentions AS (
  SELECT source, unnest(regexp_extract_all(body, '{_PII_RE["email"]}')) AS email
  FROM bodies
),
gstats AS (
  SELECT email, count(*) AS n_global, count(DISTINCT source) AS n_sources
  FROM mentions GROUP BY email
),
pairs AS (
  SELECT m.source, m.email, count(*) AS n,
         any_value(g.n_global) AS n_global, any_value(g.n_sources) AS n_sources,
         'user-' || CAST({md5_48_sql('m.email')} AS VARCHAR) || '@anon.invalid' AS surrogate
  FROM mentions m JOIN gstats g USING (email)
  GROUP BY m.source, m.email
)
SELECT source, CAST(sum(n) AS BIGINT) AS n_mentions,
       CAST(count(*) AS BIGINT) AS n_distinct_emails,
       CAST(count(DISTINCT surrogate) AS BIGINT) AS n_distinct_surrogates,
       CAST(sum(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_source_emails,
       CAST(max(n_global) AS BIGINT) AS max_global_reuse,
       bit_xor({md5_48_sql("email || '=>' || surrogate")}) AS mapping_xor
FROM pairs GROUP BY source ORDER BY source
"""

STAGED["pii_anonymize_consistent"] = (
    pii_anonymize_consistent,
    PII_ANONYMIZE_CONSISTENT_ORACLE,
)


# ---- pii_residual_audit --------------------------------------------------------


def pii_residual_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-redaction verification; one row per class: (pii_class,
    n_docs_before, n_spans_before, n_spans_after). after == 0 when
    the full chain ran — the gate a privacy pipeline asserts before
    publishing. The placeholders are uppercase and the class regexes
    are lowercase-only, so a placeholder can never re-trigger a
    match. The test tamper drill drops one class from the chain and
    pins that exactly that class's residual goes nonzero."""
    b = _pii_bodies(spark, sf_dir)
    red = _redacted(F.col("body"))
    agg = b.select(
        *[F.regexp_count("body", F.lit(_PII_RE[k])).alias(f"{k}_b") for k in _PII_CLASSES],
        *[F.regexp_count(red, F.lit(_PII_RE[k])).alias(f"{k}_a") for k in _PII_CLASSES],
    ).agg(
        *[
            a
            for k in _PII_CLASSES
            for a in (
                F.sum(F.when(F.col(f"{k}_b") > 0, 1).otherwise(0)).alias(f"{k}_docs"),
                F.sum(f"{k}_b").alias(f"{k}_before"),
                F.sum(f"{k}_a").alias(f"{k}_after"),
            )
        ]
    )
    out = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("pii_class"),
                        F.col(f"{k}_docs").cast("long").alias("n_docs_before"),
                        F.col(f"{k}_before").cast("long").alias("n_spans_before"),
                        F.col(f"{k}_after").cast("long").alias("n_spans_after"),
                    )
                    for k in _PII_CLASSES
                ]
            )
        ).alias("e")
    )
    return out.select(
        "e.pii_class", "e.n_docs_before", "e.n_spans_before", "e.n_spans_after"
    ).orderBy("pii_class")


def _residual_oracle(skip: tuple = ()) -> str:
    selects = []
    for k in _PII_CLASSES:
        selects.append(
            f"""
SELECT '{k}' AS pii_class,
       CAST(count(*) FILTER (WHERE {_count_sql('body', k)} > 0) AS BIGINT) AS n_docs_before,
       CAST(coalesce(sum({_count_sql('body', k)}), 0) AS BIGINT) AS n_spans_before,
       CAST(coalesce(sum({_count_sql(_redact_sql('body', skip=skip), k)}), 0) AS BIGINT) AS n_spans_after
FROM bodies"""
        )
    return (
        "WITH "
        + _pii_bodies_sql()
        + " SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY pii_class"
    )


PII_RESIDUAL_AUDIT_ORACLE = _residual_oracle()

STAGED["pii_residual_audit"] = (pii_residual_audit, PII_RESIDUAL_AUDIT_ORACLE)


# ---- docs_stream_pii_gate ------------------------------------------------------


def docs_stream_pii_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-crawl deployment shape of the PII gate, beside
    the registered docs_stream_quality_gate / docs_stream_dedup_gate
    and the staged DSIR gate: arriving docs (doc_id % 10 >= 7) flow
    through a REAL Structured Streaming replay — the gate decision
    (SSN unconditional, then the density bar) is a stateless
    codegen'd projection per micro-batch, and the per-lang rollup is
    ONE streaming aggregation in complete mode. One row per lang:
    (lang, n_arrived, n_blocked, block_bp).

    Scale shape: streaming state is |langs| counter rows; the regex
    work is per-arriving-row map-side, nothing crosses micro-batch
    boundaries but counters."""
    import os

    from datapipeline_scripts_spark.catalog import table_path
    from datapipeline_scripts_spark.streaming.stream_jobs import _replay_to_parquet

    path = table_path(sf_dir, "documents")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
    bodies = stream.filter(F.col("doc_id") % 10 >= 7).select(
        "doc_id", "lang", "source", F.expr(_pii_body_expr("spark")).alias("body")
    )
    flags = _pii_gate_flags(bodies)
    per_lang = flags.groupBy("lang").agg(
        F.count("*").alias("n_arrived"),
        F.sum(F.greatest(F.col("drop_ssn"), F.col("drop_density"))).alias("n_blocked"),
    )
    out = _replay_to_parquet(spark, per_lang, mode="complete")
    return out.select(
        "lang",
        F.col("n_arrived").cast("long").alias("n_arrived"),
        F.col("n_blocked").cast("long").alias("n_blocked"),
        F.expr("CAST(n_blocked * 10000 div n_arrived AS BIGINT)").alias("block_bp"),
    ).orderBy("lang")


DOCS_STREAM_PII_GATE_ORACLE = f"""
WITH documents_arriving AS (SELECT * FROM documents WHERE doc_id % 10 >= 7),
bodies AS (SELECT doc_id, lang, source, {_pii_body_expr("duck")} AS body
           FROM documents_arriving),
{_GATE_FLAGS_SQL}
SELECT lang, CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(sum(greatest(drop_ssn, drop_density)) AS BIGINT) AS n_blocked,
       CAST(sum(greatest(drop_ssn, drop_density)) * 10000 // count(*) AS BIGINT) AS block_bp
FROM flags GROUP BY lang ORDER BY lang
"""

STAGED["docs_stream_pii_gate"] = (docs_stream_pii_gate, DOCS_STREAM_PII_GATE_ORACLE)


# ---- privacy_pipeline ----------------------------------------------------------


def privacy_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy composite — the publish path a corpus release runs:
    gate (SSN / density, pii_gate_filter's exact policy by import) →
    redact the survivors (pii_redact_corpus's chain) → publish
    accounting per lang: (lang, n_arrived, n_gated_out, n_kept,
    spans_removed, chars_removed, redacted_xor). The kept set still
    contains redactable PII by construction (long injected docs pass
    the density bar), so spans_removed > 0 is test-pinned — the
    pipeline provably rewrites, not just drops.

    Scale shape: one scan + one groupBy(lang); the gate and redaction
    are the standalone keys' codegen'd expressions composed in the
    same projection — no extra pass over the corpus."""
    flags = _pii_gate_flags(_pii_bodies(spark, sf_dir))
    red = _redacted(F.col("body"))
    blank = _redacted(F.col("body"), blank=True)
    spans = sum(
        (F.regexp_count("body", F.lit(_PII_RE[k])) for k in _PII_CLASSES),
        F.lit(0),
    )
    kept = F.col("drop_ssn") + F.col("drop_density") == 0
    return (
        flags.select(
            "lang",
            "body",
            kept.cast("int").alias("kept"),
            F.when(kept, spans).otherwise(0).alias("k_spans"),
            F.when(kept, F.length("body") - F.length(blank)).otherwise(0).alias("k_chars"),
            F.when(kept, md5_48(red)).otherwise(0).alias("k_rh"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_arrived"),
            F.sum(1 - F.col("kept")).cast("long").alias("n_gated_out"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum("k_spans").cast("long").alias("spans_removed"),
            F.sum("k_chars").cast("long").alias("chars_removed"),
            F.bit_xor("k_rh").alias("redacted_xor"),
        )
        .orderBy("lang")
    )


PRIVACY_PIPELINE_ORACLE = f"""
WITH {_pii_bodies_sql()},
{_GATE_FLAGS_SQL},
acc AS (
  SELECT lang, body,
         1 - greatest(drop_ssn, drop_density) AS kept,
         CASE WHEN greatest(drop_ssn, drop_density) = 0
              THEN {" + ".join(_count_sql('body', k) for k in _PII_CLASSES)}
              ELSE 0 END AS k_spans,
         CASE WHEN greatest(drop_ssn, drop_density) = 0
              THEN length(body) - length({_redact_sql('body', blank=True)})
              ELSE 0 END AS k_chars,
         CASE WHEN greatest(drop_ssn, drop_density) = 0
              THEN {md5_48_sql(_redact_sql('body'))}
              ELSE 0 END AS k_rh
  FROM flags
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(sum(1 - kept) AS BIGINT) AS n_gated_out,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(k_spans) AS BIGINT) AS spans_removed,
       CAST(sum(k_chars) AS BIGINT) AS chars_removed,
       bit_xor(k_rh) AS redacted_xor
FROM acc GROUP BY lang ORDER BY lang
"""

STAGED["privacy_pipeline"] = (privacy_pipeline, PRIVACY_PIPELINE_ORACLE)


# ---- knn_ivf_train_int ---------------------------------------------------------

_IVT_K = 16  # inverted lists (the registered knn_ivf's _IVF_K)
_IVT_S = 1 << 10  # quantization scale: q = floor(v * 1024 + 0.5)
_IVT_SHIFT = 1 << 12  # > max |mean numerand|; keeps the div non-negative


def _ivt_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q): embeddings quantized to 2^10-scaled BIGINTs.
    floor(v * 1024 + 0.5) is the identical IEEE double op on both
    engines (float -> double is exact), so the integer vectors match
    bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * _IVT_S + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )


def _ivt_assign(qf: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid): argmax integer dot product against the broadcast
    centroid table; ties break to the LOWEST cid (max on (dot, -cid)).
    The dot is an array-local zip_with fold — no per-dimension
    explode, so assignment stays |vectors| x K rows."""
    dot = F.aggregate(
        F.zip_with("q", "cq", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = qf.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", dot.alias("dot")
    )
    return scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("dot"), (-F.col("cid")).alias("nc"))).alias("b")
    ).select("vec_id", (-F.col("b.nc")).alias("cid"))


def knn_ivf_train_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One integer-exact Lloyd training iteration for the IVF index
    (VERDICT r12 item 8): seed with the first K vectors (the
    registered knn_ivf convention), assign by integer dot product,
    re-center each (cid, dim) cell with shifted integer division
    ((sum + n*shift) div n - shift — the division never sees a
    negative operand, so Spark `div` and DuckDB `//` agree), then
    reassign against the trained centroids. One row per list:
    (cid, n_before, n_after, n_moved_out).

    `knn_ivf_lloyd` (extensions/similarity.py:180) remains
    unregistered because FLOAT mean re-centering is
    partial-agg-order sensitive; this integer form is the
    bit-reproducible, registrable version of the same maintenance
    step.

    Scale shape: assignment is |vectors| x K broadcast rows (the
    centroid table is K rows, always broadcast); re-centering is one
    partial-aggregable groupBy over K x dims cells; nothing
    corpus-quadratic anywhere."""
    qf = _ivt_quantized(spark, sf_dir).localCheckpoint(eager=True)
    seeds = qf.filter(F.col("vec_id") < _IVT_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    a0 = _ivt_assign(qf, seeds).localCheckpoint(eager=True)
    cells = (
        a0.join(qf, "vec_id")
        .select("cid", F.posexplode("q").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(
            F.expr(
                f"CAST((sum(v) + count(*) * {_IVT_SHIFT}) div count(*) - {_IVT_SHIFT} AS BIGINT)"
            ).alias("m")
        )
    )
    trained = (
        cells.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.transform("pm", lambda s: s.getField("m")).alias("cq"))
    )
    a1 = _ivt_assign(qf, trained)
    pairs = a0.select("vec_id", F.col("cid").alias("c0")).join(
        a1.select("vec_id", F.col("cid").alias("c1")), "vec_id"
    )
    before = pairs.groupBy(F.col("c0").alias("cid")).agg(
        F.count("*").alias("n_before"),
        F.sum(F.when(F.col("c0") != F.col("c1"), 1).otherwise(0)).alias("n_moved_out"),
    )
    after = pairs.groupBy(F.col("c1").alias("cid")).agg(F.count("*").alias("n_after"))
    spine = seeds.select("cid")
    return (
        spine.join(before, "cid", "left")
        .join(after, "cid", "left")
        .select(
            "cid",
            F.coalesce("n_before", F.lit(0)).cast("long").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            F.coalesce("n_moved_out", F.lit(0)).cast("long").alias("n_moved_out"),
        )
        .orderBy("cid")
    )


KNN_IVF_TRAIN_INT_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {_IVT_S} + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, q AS cq FROM q WHERE vec_id < {_IVT_K}),
d0 AS (
  SELECT q.vec_id, c0.cid,
         CAST(list_dot_product(CAST(q.q AS DOUBLE[]), CAST(c0.cq AS DOUBLE[])) AS BIGINT) AS dot
  FROM q, c0
),
a0 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
    FROM d0
  ) WHERE rn = 1
),
cells AS (
  SELECT a0.cid,
         generate_subscripts(q.q, 1) - 1 AS pos,
         unnest(q.q) AS v
  FROM q JOIN a0 USING (vec_id)
),
means AS (
  SELECT cid, pos,
         CAST((sum(v) + count(*) * {_IVT_SHIFT}) // count(*) - {_IVT_SHIFT} AS BIGINT) AS m
  FROM cells GROUP BY cid, pos
),
trained AS (
  SELECT cid, list(m ORDER BY pos) AS cq FROM means GROUP BY cid
),
d1 AS (
  SELECT q.vec_id, t.cid,
         CAST(list_dot_product(CAST(q.q AS DOUBLE[]), CAST(t.cq AS DOUBLE[])) AS BIGINT) AS dot
  FROM q, trained t
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
    FROM d1
  ) WHERE rn = 1
),
pairs AS (
  SELECT a0.vec_id, a0.cid AS c0, a1.cid AS c1
  FROM a0 JOIN a1 USING (vec_id)
),
bef AS (
  SELECT c0 AS cid, count(*) AS n_before,
         sum(CASE WHEN c0 <> c1 THEN 1 ELSE 0 END) AS n_moved_out
  FROM pairs GROUP BY c0
),
aft AS (SELECT c1 AS cid, count(*) AS n_after FROM pairs GROUP BY c1)
SELECT s.cid,
       CAST(coalesce(b.n_before, 0) AS BIGINT) AS n_before,
       CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after,
       CAST(coalesce(b.n_moved_out, 0) AS BIGINT) AS n_moved_out
FROM (SELECT cid FROM c0) s
LEFT JOIN bef b USING (cid)
LEFT JOIN aft a USING (cid)
ORDER BY s.cid
"""

STAGED["knn_ivf_train_int"] = (knn_ivf_train_int, KNN_IVF_TRAIN_INT_ORACLE)


# ---- dedup_semantic_crowding ---------------------------------------------------

_SD_S = 1 << 8  # 2^8 quantization: keeps dot^2 * 10^4 inside BIGINT
_SD_T2 = 9025  # cos >= 0.95  <=>  dot^2 * 10000 >= 9025 * |q|^2 * |c|^2
_SD_INJ_MOD = 125  # vec_id % 125 == 7 (vec_id >= 16) carries a scaled seed copy


def _sd_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q): embeddings quantized to 2^8-scaled BIGINTs, with
    the constructed near-duplicate class — vec_id % 125 == 7 vectors
    (excluding the seeds themselves, so centroid magnitudes stay
    bounded) carry seed (vec_id % 16)'s embedding scaled by an
    integer factor 2 + vec_id % 3 (the refetch idiom for vectors: the
    fixtures' embeddings are near-orthogonal, so without construction
    only the 16 seeds would ever crowd — dead machinery at every
    scale). The scaling makes the key's COSINE semantics load-bearing:
    a dot-threshold bug would reject the scaled copies."""
    e = load_table(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < _IVT_K).select(
        F.col("vec_id").alias("sid"), F.col("embedding").alias("semb")
    )
    tagged = e.withColumn(
        "sid",
        F.when(
            (F.col("vec_id") % _SD_INJ_MOD == 7) & (F.col("vec_id") >= _IVT_K),
            F.col("vec_id") % _IVT_K,
        ),
    ).join(F.broadcast(seeds), "sid", "left")
    k = (F.lit(2) + F.col("vec_id") % 3).cast("double")
    emb = F.when(
        F.col("semb").isNotNull(), F.transform("semb", lambda x: x.cast("double") * k)
    ).otherwise(F.transform("embedding", lambda x: x.cast("double")))
    return tagged.select(
        "vec_id",
        F.transform(emb, lambda v: F.floor(v * _SD_S + F.lit(0.5)).cast("long")).alias(
            "q"
        ),
    )


def dedup_semantic_crowding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped centroid-crowding report (Abbas et al.,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540 — the cluster-then-prune-near-
    the-prototype recipe, in its linear centroid-proximity form): every
    vector assigns to its nearest seed centroid (the registered
    knn_ivf convention), and a member "crowds" its list when its
    cosine to the CENTROID clears 0.95 — the prototypical near-
    duplicates a semantic dedup pass prunes, keeping one per list. One
    row per list: (cid, n_members, n_crowded, n_dropped, crowd_bp).

    Integer-exact end-to-end: cos >= t is evaluated as
    dot > 0 AND dot^2 * 10^4 >= t^2*10^4 * |q|^2 * |c|^2 — no sqrt,
    no float comparison. Bound (holds whenever raw |component| <= 1;
    the fixtures are unit-norm-ish, max |component| 0.58): with 2^8
    quantization and the <= 4x injection scale, |q_i| <= 1024, so
    |q|^2 <= 2^26, centroid |c|^2 <= 2^22, dot <= 2^24, and both
    compared products stay under 2^62 — inside BIGINT on either
    engine at any dimension count up to 64.

    Scale shape: ONE dot per (vector, K centroids) against a K-row
    broadcast — each member compares to its list's prototype only,
    never member-to-member (the canonical-partner lesson: pairwise
    within clusters is quadratic under pervasive duplication; the
    crowding form is linear in members at any duplication profile).
    The report is K counters."""
    qf = _sd_quantized(spark, sf_dir)
    # the K-row centroid side is materialized once: deriving it lazily
    # from qf would re-run the quantization scan (and its seed join)
    # a second time just to produce 16 broadcast rows
    seeds = (
        qf.filter(F.col("vec_id") < _IVT_K)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
        .localCheckpoint()
    )
    dot = F.aggregate(
        F.zip_with("q", "cq", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    qq = F.aggregate(
        F.transform("q", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    rr = F.aggregate(
        F.transform("cq", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    scored = qf.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "cid", dot.alias("dot"), qq.alias("qq"), rr.alias("rr")
    )
    best = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("dot"), (-F.col("cid")).alias("nc"), "qq", "rr")
            ).alias("b")
        )
        .select(
            "vec_id",
            (-F.col("b.nc")).alias("cid"),
            F.col("b.dot").alias("dot"),
            F.col("b.qq").alias("qq"),
            F.col("b.rr").alias("rr"),
        )
    )
    crowded = (
        (F.col("dot") > 0)
        & (F.col("dot") * F.col("dot") * 10000 >= _SD_T2 * F.col("qq") * F.col("rr"))
    ).cast("int")
    return (
        best.select("cid", crowded.alias("crowded"))
        .groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("crowded").cast("long").alias("n_crowded"),
            F.greatest(F.sum("crowded") - 1, F.lit(0)).cast("long").alias("n_dropped"),
            F.expr("CAST(sum(crowded) * 10000 div count(*) AS BIGINT)").alias(
                "crowd_bp"
            ),
        )
        .orderBy("cid")
    )


DEDUP_SEMANTIC_CROWDING_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding AS semb FROM embeddings WHERE vec_id < {_IVT_K}
),
tagged AS (
  SELECT e.vec_id,
         CASE WHEN e.vec_id % {_SD_INJ_MOD} = 7 AND e.vec_id >= {_IVT_K}
              THEN list_transform(s.semb,
                     x -> CAST(x AS DOUBLE) * (2 + e.vec_id % 3))
              ELSE list_transform(e.embedding, x -> CAST(x AS DOUBLE)) END AS emb
  FROM embeddings e
  LEFT JOIN seeds s ON s.sid = CASE WHEN e.vec_id % {_SD_INJ_MOD} = 7
                                         AND e.vec_id >= {_IVT_K}
                                    THEN e.vec_id % {_IVT_K} END
),
q AS (
  SELECT vec_id,
         list_transform(emb, x -> CAST(floor(x * {_SD_S} + 0.5) AS BIGINT)) AS q
  FROM tagged
),
c AS (SELECT vec_id AS cid, q AS cq FROM q WHERE vec_id < {_IVT_K}),
d AS (
  SELECT q.vec_id, c.cid,
         CAST(list_dot_product(CAST(q.q AS DOUBLE[]), CAST(c.cq AS DOUBLE[])) AS BIGINT) AS dot,
         CAST(list_dot_product(CAST(q.q AS DOUBLE[]), CAST(q.q AS DOUBLE[])) AS BIGINT) AS qq,
         CAST(list_dot_product(CAST(c.cq AS DOUBLE[]), CAST(c.cq AS DOUBLE[])) AS BIGINT) AS rr
  FROM q, c
),
best AS (
  SELECT vec_id, cid, dot, qq, rr FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
    FROM d
  ) WHERE rn = 1
),
flagged AS (
  SELECT cid,
         CASE WHEN dot > 0 AND dot*dot*10000 >= {_SD_T2}*qq*rr THEN 1 ELSE 0 END AS crowded
  FROM best
)
SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(crowded) AS BIGINT) AS n_crowded,
       CAST(greatest(sum(crowded) - 1, 0) AS BIGINT) AS n_dropped,
       CAST(sum(crowded) * 10000 // count(*) AS BIGINT) AS crowd_bp
FROM flagged GROUP BY cid ORDER BY cid
"""

STAGED["dedup_semantic_crowding"] = (
    dedup_semantic_crowding,
    DEDUP_SEMANTIC_CROWDING_ORACLE,
)


# ---- pii_k_anonymity ------------------------------------------------------------

_KA_K = 10  # the k-anonymity bar: classes below 10 members are suppressed
# Quasi-identifier generalization ladder (each level a strict
# coarsening of the previous, so the suppressed set can only shrink):
#   L0 (nation, segment, exact balance cents) -> L1 (nation, segment,
#   balance div 2500) -> L2 (nation, segment) -> L3 (region, segment)
#   -> L4 (region)
# L0 is the near-identifying precision level (the classic
# "zip+dob+sex re-identifies" phenomenon): its class count GROWS with
# the data, so the below-k verdict class stays live at every scale —
# the bounded coarser levels alone would leave suppression
# structurally zero at 100x+ (scale-honesty lesson 3: bigger
# populations are more anonymous at fixed QI granularity, so a
# bounded-QI-only ladder has dead machinery at scale). The sensitive
# attribute is the 2000-unit balance band — the 2500 grid at L1 is
# deliberately NOT nested in it, so within-class sensitive diversity
# is a real measurement rather than a function of the QI.
_KA_LEVELS = [
    (0, "nation,segment,balcents", ["c_nationkey", "c_mktsegment", "bal_cents"]),
    (1, "nation,segment,bal2500", ["c_nationkey", "c_mktsegment", "bal_band"]),
    (2, "nation,segment", ["c_nationkey", "c_mktsegment"]),
    (3, "region,segment", ["regionkey", "c_mktsegment"]),
    (4, "region", ["regionkey"]),
]


def _ka_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer rows with the generalization hierarchy attached: the
    region parent via a BROADCAST nation join (25 rows), the 2500-unit
    QI balance band and the 2000-unit sensitive band, both via the
    shift-then-divide idiom (acctbal >= -1000, so +1000 keeps every
    div operand non-negative — Spark div truncates toward zero while
    DuckDB // floors; they agree only at >= 0)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("regionkey"),
    )
    shifted = "CAST(floor(c_acctbal) AS BIGINT) + 1000"
    return c.join(F.broadcast(n), "c_nationkey").select(
        "c_nationkey",
        "c_mktsegment",
        "regionkey",
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT) + 100000").alias("bal_cents"),
        F.expr(f"({shifted}) div 2500").alias("bal_band"),
        F.expr(f"({shifted}) div 2000").alias("sens"),
    )


def pii_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the customer quasi-
    identifiers (Sweeney, "k-anonymity: a model for protecting
    privacy", IJUFKS 2002; Machanavajjhala et al., "l-diversity",
    TKDD 2007) — the release-risk report a privacy pipeline runs
    before publishing a microdata extract, and the generalization
    counterpart of this family's free-text redaction keys. One row
    per generalization level: class census (n_classes, min/max size),
    the suppression this level would force (rows in classes below
    k=10, as count and bp), and the minimum within-class sensitive
    diversity among the classes that survive.

    Levels are a strict coarsening chain (drop cents precision, then
    the balance band, then nation->region via the dimension
    hierarchy, then segment), so suppression_bp is provably
    non-increasing in level — the structural invariant the staged
    test pins. (Same-cents rows provably share floor(balance): a
    whole-dollar boundary m has m*100 exactly representable, so a
    product that rounds into cents class c can never straddle one —
    the coarsening is exact even in IEEE arithmetic.)

    Scale shape: one BROADCAST join to the 25-row nation dim, then
    per level ONE partial-aggregable groupBy whose shuffle carries
    (QI, counter) pairs — never a customer row — followed by a
    singleton rollup; the report is |levels| rows. At 10^9 customers
    each level costs one counter shuffle; nothing is quadratic and
    nothing collects.

    Proxy-ladder honesty note: the /tmp proxies replicate each base
    customer exactly Nx (L0 reads min_class == max_class == replica
    count), which inflates every class uniformly past k — the one
    population shape where k-anonymity holds at every level, so
    below-k goes structurally quiet there BY THE DATA, not by dead
    machinery. Liveness at scale is carried by L0's class count
    growing linearly with the population (625 -> 15,000 at 100x) and
    by the k=1 tamper oracle the staged test pins; the verdict mix
    itself is proven at the fixture SFs, whose balances are distinct."""
    # one materialized scan feeds all five level aggregations — the
    # shared-frame convention (ADVICE r12): without it each level
    # re-scans customer + re-runs the dim join
    base = _ka_base(spark, sf_dir).localCheckpoint()
    per_level = []
    for lvl, desc, cols in _KA_LEVELS:
        cls = base.groupBy(*cols).agg(
            F.count("*").alias("cnt"),
            F.countDistinct("sens").alias("nsens"),
        )
        below = F.col("cnt") < _KA_K
        row = cls.agg(
            F.lit(lvl).cast("long").alias("level"),
            F.lit(desc).alias("qi"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_classes"),
            F.sum(below.cast("long")).cast("long").alias("n_below_k"),
            F.sum(F.when(below, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_suppressed"),
            F.min("cnt").cast("long").alias("min_class"),
            F.max("cnt").cast("long").alias("max_class"),
            F.coalesce(F.min(F.when(~below, F.col("nsens"))), F.lit(0))
            .cast("long")
            .alias("l_div_min"),
        )
        per_level.append(
            row.withColumn(
                "suppression_bp",
                F.expr("CAST(n_suppressed * 10000 div n_rows AS BIGINT)"),
            )
        )
    out = per_level[0]
    for f in per_level[1:]:
        out = out.unionByName(f)
    return out.select(
        "level",
        "qi",
        "n_rows",
        "n_classes",
        "n_below_k",
        "n_suppressed",
        "suppression_bp",
        "min_class",
        "max_class",
        "l_div_min",
    ).orderBy("level")


def _ka_oracle(k: int = _KA_K) -> str:
    """The DuckDB twin, parametrized on k so the staged tamper drill
    can prove the suppression columns are live (k=1 zeroes them)."""
    blocks = []
    for lvl, desc, cols in _KA_LEVELS:
        qi = ", ".join(cols)
        blocks.append(
            f"""
SELECT CAST({lvl} AS BIGINT) AS level, '{desc}' AS qi,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(*) FILTER (WHERE cnt < {k}) AS BIGINT) AS n_below_k,
       CAST(coalesce(sum(cnt) FILTER (WHERE cnt < {k}), 0) AS BIGINT) AS n_suppressed,
       CAST(coalesce(sum(cnt) FILTER (WHERE cnt < {k}), 0) * 10000 // sum(cnt) AS BIGINT) AS suppression_bp,
       CAST(min(cnt) AS BIGINT) AS min_class,
       CAST(max(cnt) AS BIGINT) AS max_class,
       CAST(coalesce(min(nsens) FILTER (WHERE cnt >= {k}), 0) AS BIGINT) AS l_div_min
FROM (
  SELECT {qi}, count(*) AS cnt, count(DISTINCT sens) AS nsens
  FROM base GROUP BY {qi}
)"""
        )
    return (
        """
WITH base AS (
  SELECT c.c_nationkey, c.c_mktsegment, n.n_regionkey AS regionkey,
         CAST(floor(c.c_acctbal * 100) AS BIGINT) + 100000 AS bal_cents,
         (CAST(floor(c.c_acctbal) AS BIGINT) + 1000) // 2500 AS bal_band,
         (CAST(floor(c.c_acctbal) AS BIGINT) + 1000) // 2000 AS sens
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
)
SELECT * FROM ("""
        + " UNION ALL ".join(blocks)
        + ") ORDER BY level"
    )


PII_K_ANONYMITY_ORACLE = _ka_oracle()

STAGED["pii_k_anonymity"] = (pii_k_anonymity, PII_K_ANONYMITY_ORACLE)


# ---- split_leakage_audit -------------------------------------------------------

from datapipeline_scripts_spark.extensions.mixture import (  # noqa: E402
    _TRAIN_PCT as _SL_TRAIN_PCT,
    _VAL_PCT as _SL_VAL_PCT,
    split_bucket_col,
    split_of_bucket,
)


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit across NEAR-DUPLICATE clusters —
    the dedup-across-splits check every published pretraining pipeline
    runs before trusting held-out loss (Lee et al., "Deduplicating
    training data makes language models better", arXiv:2107.06499
    §train/test leakage; Dodge et al., arXiv:2104.08758 document the
    same contamination in C4): a val/test document whose near-dup
    lives in train is memorization, not generalization. MinHash-LSH
    candidate pairs (the registered dedup_minhash machinery by
    import) -> connected components -> each cluster's SPLIT MIX under
    the registered 80/10/10 md5 split. One row per observed mix
    ('train', 'test+train', 'train+val', ...): clusters, docs, and
    per-split doc counts — rows whose mix contains '+' are the
    contamination; their n_val/n_test are exactly the eval documents
    a leakage-clean pipeline drops.

    Scale shape: pair generation is the banded-LSH self-join (linear
    in bucket-local pairs, cartesian-free — dedup_minhash's proven
    100x shape); connected components runs diameter-bounded rounds on
    the pairs frame (≪ corpus); the mix census is one groupBy(cluster)
    carrying (split, counter) pairs and one groupBy(mix) over cluster
    rows. Nothing touches document text after the signature scan.
    The DuckDB twin replays the identical pair set and closes the
    components with a recursive CTE — exact at fixture SFs; at deep
    proxy rungs the closure uses the staged iterative twin
    (scripts/proxy_oracles.py), the dedup_clusters precedent.

    Pair-volume honesty (lesson 4): the audit deliberately audits THE
    registered dedup_minhash pair semantics, so it inherits that
    key's documented adversarial profile — under pervasive
    duplication (the 100x replica's 100-member identical families)
    band buckets go dense and pair volume grows with family size
    squared, which the 100x fingerprint proof exercises directly
    (27M pairs, engine 152 s); the 1000x total-replication replica
    (~2.5e8 pairs) exceeds ONE box's shuffle-spill disk — the
    join_band single-box precedent, documented in
    docs/SCALE_EXPERIMENT.md. A continuous-crawl deployment would
    feed the census from dedup_minhash_store_incremental's
    batch-sized pair stream instead; the census itself is cluster-
    local counters either way."""
    from datapipeline_scripts_spark.extensions.dedup import (
        connected_components,
        dedup_minhash,
    )

    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    cc = connected_components(spark, pairs)
    # the SHARED split expressions (extensions/mixture.py) — the audit
    # provably audits the split the corpus ships with, and the bucket
    # is materialized before branching per split_assign's convention
    sp = cc.withColumn("b", split_bucket_col()).select(
        "doc_id", "cluster_id", split_of_bucket(F.col("b")).alias("split")
    )
    mix = sp.groupBy("cluster_id").agg(
        F.array_join(F.array_sort(F.collect_set("split")), "+").alias("split_mix"),
        F.count("*").alias("nd"),
        F.sum((F.col("split") == "train").cast("long")).alias("nt"),
        F.sum((F.col("split") == "val").cast("long")).alias("nv"),
        F.sum((F.col("split") == "test").cast("long")).alias("ns"),
    )
    return (
        mix.groupBy("split_mix")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("nd").cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_train"),
            F.sum("nv").cast("long").alias("n_val"),
            F.sum("ns").cast("long").alias("n_test"),
        )
        .orderBy("split_mix")
    )


def _sl_oracle(train_pct: int = _SL_TRAIN_PCT, val_pct: int = _SL_VAL_PCT) -> str:
    """The DuckDB twin, parametrized on the split percentages so the
    staged tamper drill can prove the mix machinery is live (a
    100/0/0 split collapses every mix to 'train')."""
    from datapipeline_scripts_spark.extensions.dedup import _minhash_clusters_oracle

    split_sql = f"""CASE WHEN ({md5_48_sql("CAST(doc_id AS VARCHAR)")}) % 100 < {train_pct} THEN 'train'
              WHEN ({md5_48_sql("CAST(doc_id AS VARCHAR)")}) % 100 < {train_pct + val_pct} THEN 'val'
              ELSE 'test' END"""
    return f"""
WITH clusters AS ({_minhash_clusters_oracle()}),
sp AS (
  SELECT doc_id, cluster_id, {split_sql} AS split FROM clusters
),
mix AS (
  SELECT cluster_id,
         string_agg(DISTINCT split, '+' ORDER BY split) AS split_mix,
         count(*) AS nd,
         count(*) FILTER (WHERE split = 'train') AS nt,
         count(*) FILTER (WHERE split = 'val') AS nv,
         count(*) FILTER (WHERE split = 'test') AS ns
  FROM sp GROUP BY cluster_id
)
SELECT split_mix,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(nd) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_train,
       CAST(sum(nv) AS BIGINT) AS n_val,
       CAST(sum(ns) AS BIGINT) AS n_test
FROM mix GROUP BY split_mix ORDER BY split_mix
"""


SPLIT_LEAKAGE_AUDIT_ORACLE = _sl_oracle()

STAGED["split_leakage_audit"] = (split_leakage_audit, SPLIT_LEAKAGE_AUDIT_ORACLE)


# ---- pii_randomized_response ---------------------------------------------------

_RR_KEEP_PCT = 75  # report the true category with p = 3/4


def pii_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-DP categorical frequency release via randomized response
    (Warner, JASA 1965; the RAPPOR mechanism's core, Erlingsson et
    al. CCS 2014) over the documents language column — the release
    stage after this family's detection/redaction/k-anonymity keys:
    each row keeps its true category with p = 3/4, otherwise reports
    a uniform draw over the k observed categories, and the curator
    publishes per-category reported counts plus the debiased
    estimate. One row per lang: (lang, n_true, n_kept, n_reported,
    est_milli) where est = (n_reported - N*(1-p)/k) / p is the
    unbiased inverse, published as GREATEST(numerator, 0) in
    integer millis (negative estimates truncate to 0, the standard
    release convention — and the shift keeps every cross-engine
    division non-negative).

    Determinism: both "coins" are md5_48 draws — keep when
    md5_48(doc_id || ':rr') % 100 < 75, replacement index
    md5_48(doc_id || ':alt') % k — so both engines flip literally
    the same coins and the release is hash-exact, which is what
    makes a DP mechanism testable here at all (a true RNG release
    could only be distribution-tested). k and the category table are
    DERIVED from the data (row_number over the distinct langs — no
    fixture-tied constant, lesson 1), so new categories change the
    mechanism identically on both engines.

    Scale shape: one scan + a broadcast join against the k-row
    category table (k = |langs|, bounded); the release is k counter
    rows from one partial-aggregable groupBy. est arithmetic:
    4*k*n_reported <= 4*k*N stays inside BIGINT for any N < 2^59/k."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    from pyspark.sql.window import Window

    langs = (
        d.select("lang")
        .distinct()
        .select(
            "lang",
            (F.row_number().over(Window.orderBy("lang")) - 1).alias("idx"),
        )
        .localCheckpoint()
    )
    k = langs.count()
    keep = md5_48(F.concat_ws(":", F.col("doc_id"), F.lit("rr"))) % 100 < _RR_KEEP_PCT
    alt_idx = md5_48(F.concat_ws(":", F.col("doc_id"), F.lit("alt"))) % k
    tagged = (
        d.withColumn("keep", keep.cast("int"))
        .withColumn("idx", F.when(~keep, alt_idx))
        .join(
            F.broadcast(langs.select(F.col("lang").alias("alt_lang"), "idx")),
            "idx",
            "left",
        )
        .select(
            "lang",
            "keep",
            F.coalesce(F.col("alt_lang"), F.col("lang")).alias("reported"),
        )
        .localCheckpoint()
    )
    n = tagged.count()
    true_counts = tagged.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum("keep").cast("long").alias("n_kept"),
    )
    rep_counts = (
        tagged.groupBy(F.col("reported").alias("lang"))
        .agg(F.count("*").cast("long").alias("n_reported"))
    )
    out = true_counts.join(rep_counts, "lang", "full").select(
        "lang",
        F.coalesce("n_true", F.lit(0)).alias("n_true"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("n_reported", F.lit(0)).alias("n_reported"),
        F.expr(
            f"CAST(greatest(4 * {k} * coalesce(n_reported, 0) - {n}, 0) * 1000 "
            f"div (3 * {k}) AS BIGINT)"
        ).alias("est_milli"),
    )
    return out.orderBy("lang")


def _rr_oracle(keep_pct: int = _RR_KEEP_PCT) -> str:
    """DuckDB twin, parametrized on the keep probability so the
    keep_pct=100 tamper oracle can pin the flip machinery
    (n_reported == n_true everywhere when no coin flips)."""
    h_rr = md5_48_sql("CAST(doc_id AS VARCHAR) || ':rr'")
    h_alt = md5_48_sql("CAST(doc_id AS VARCHAR) || ':alt'")
    return f"""
WITH langs AS (
  SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS idx
  FROM (SELECT DISTINCT lang FROM documents)
),
k AS (SELECT count(*) AS k FROM langs),
n AS (SELECT count(*) AS n FROM documents),
tagged AS (
  SELECT d.lang,
         CASE WHEN ({h_rr}) % 100 < {keep_pct} THEN 1 ELSE 0 END AS keep,
         CASE WHEN ({h_rr}) % 100 < {keep_pct} THEN d.lang ELSE l.lang END AS reported
  FROM documents d
  LEFT JOIN langs l ON l.idx = ({h_alt}) % (SELECT k FROM k)
),
tc AS (
  SELECT lang, count(*) AS n_true, sum(keep) AS n_kept
  FROM tagged GROUP BY lang
),
rc AS (
  SELECT reported AS lang, count(*) AS n_reported FROM tagged GROUP BY reported
)
SELECT coalesce(tc.lang, rc.lang) AS lang,
       CAST(coalesce(tc.n_true, 0) AS BIGINT) AS n_true,
       CAST(coalesce(tc.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(rc.n_reported, 0) AS BIGINT) AS n_reported,
       CAST(greatest(4 * (SELECT k FROM k) * coalesce(rc.n_reported, 0)
                     - (SELECT n FROM n), 0) * 1000
            // (3 * (SELECT k FROM k)) AS BIGINT) AS est_milli
FROM tc FULL JOIN rc ON tc.lang = rc.lang
ORDER BY lang
"""


PII_RANDOMIZED_RESPONSE_ORACLE = _rr_oracle()

STAGED["pii_randomized_response"] = (
    pii_randomized_response,
    PII_RANDOMIZED_RESPONSE_ORACLE,
)
