"""Round-14 stage-isolation probes (guide §1.4 noop sink / §1.5 labels).

Usage: python scripts/r14_probes.py <probe> [sf_dir]
Probes:
  gate_stages     — docs_stream_quality_gate stage isolation
  winnow_hist     — dedup_passage_winnow fingerprint-frequency histogram
  sel_stages      — corpus_selection_pipeline stage isolation
  pretrain_stages — pretraining_pipeline leg isolation
  dsir_stages     — corpus_dsir_resample stage isolation
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datapipeline_scripts_spark.session import get_spark


def _t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:50s} {best:7.3f}s", flush=True)
    return best


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def gate_stages(spark, sf_dir):
    from datapipeline_scripts_spark.sources.staged_r12 import (
        _pe_weights,
        _perceptron_features,
    )

    feats = None

    def build_ckpt():
        nonlocal feats
        f = _perceptron_features(spark, sf_dir).filter(F.col("doc_id") % 2 == 0)
        feats = f.localCheckpoint(eager=True)

    _t("train features eager checkpoint", build_ckpt)
    _t("_pe_weights (3 gradient jobs)", lambda: _pe_weights(spark, feats).collect())

    # stream side, batch-equivalent cost (features+agg over odds as a
    # plain batch job — the replay minus streaming machinery)
    from datapipeline_scripts_spark.sources.staged_r12 import (
        _pe_score,
        _perceptron_features_of,
    )
    from datapipeline_scripts_spark.catalog import load_table

    w = _pe_weights(spark, feats).withColumn("jk", F.lit(1))

    def batch_equiv():
        d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
        sfeat = _perceptron_features_of(d, extra=("source",)).select(
            "source", "x1", "x2", "x3", F.lit(1).alias("jk")
        )
        scored = sfeat.join(F.broadcast(w), "jk").select(
            "source", _pe_score().alias("margin")
        )
        agg = scored.groupBy("source").agg(
            F.count("*").cast("long").alias("n_arrived"),
            F.sum(F.when(F.col("margin") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_accept"),
        )
        _noop(agg)

    _t("stream-side features+agg as BATCH (noop)", batch_equiv)

    # full replay with batch counting
    from datapipeline_scripts_spark.registry import get

    def full():
        get("docs_stream_quality_gate").build(spark, sf_dir).count()

    _t("full docs_stream_quality_gate", full)


def winnow_hist(spark, sf_dir):
    from datapipeline_scripts_spark.sources.staged_r10 import _PW_CAP, _winnowed_fps

    fps = _winnowed_fps(spark, sf_dir).localCheckpoint(eager=True)
    per_fp = fps.groupBy("fp").count()
    hist = (
        per_fp.groupBy("count")
        .agg(F.count("*").alias("n_fps"))
        .orderBy(F.col("count").desc())
    )
    print("fingerprint frequency histogram (count = docs per fp):")
    for r in hist.collect()[:30]:
        print(f"  docs_per_fp={r['count']:>6d}  n_fps={r['n_fps']}")
    tot = fps.count()
    capped = per_fp.filter(
        (F.col("count") >= 2) & (F.col("count") <= _PW_CAP)
    ).count()
    above = per_fp.filter(F.col("count") > _PW_CAP).count()
    print(f"total fp rows={tot}, distinct in [2,{_PW_CAP}]={capped}, above cap={above}")
    # pair-join input volume per fp class
    pairs_by_cnt = (
        per_fp.filter((F.col("count") >= 2) & (F.col("count") <= _PW_CAP))
        .select((F.col("count") * (F.col("count") - 1) / 2).alias("pairs"))
        .agg(F.sum("pairs"))
        .collect()[0][0]
    )
    print(f"total candidate pairs (pre-dedup) = {pairs_by_cnt}")


def sel_stages(spark, sf_dir):
    from datapipeline_scripts_spark.sources.staged_r13 import (
        _dsir_doc_scores_of_toks,
        _dup_gram_occurrences_of_toks,
        _excise_of,
        _SEL_KEEP_BP,
        _sel_fused_toks,
    )

    fused = None

    def build_fused():
        nonlocal fused
        fused = _sel_fused_toks(spark, sf_dir)

    _t("fused tokenize checkpoint", build_fused)

    dup = None

    def build_dup():
        nonlocal dup
        dup = _dup_gram_occurrences_of_toks(fused.select("doc_id", "toks"))

    _t("8-gram dup-occurrence chain (checkpoint inside)", build_dup)

    ntok = fused.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    keep = None

    def build_keep():
        nonlocal keep
        keep = (
            _excise_of(ntok, dup)
            .filter(F.col("keep_bp") >= _SEL_KEEP_BP)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )

    _t("excise accounting + keep_ids checkpoint", build_keep)

    surv = fused.join(keep, "doc_id").select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(
            F.col("n_inj") > 0,
            F.slice(F.col("toks"), F.col("n_inj") + 1, F.size("toks") - F.col("n_inj")),
        )
        .otherwise(F.col("toks"))
        .alias("ntoks"),
    )
    _t("DSIR fit+score over survivors (noop)", lambda: _noop(_dsir_doc_scores_of_toks(surv)))


def pretrain_stages(spark, sf_dir):
    from pyspark.sql import types as T

    from datapipeline_scripts_spark.catalog import load_table, scan_spread
    from datapipeline_scripts_spark.extensions import pretraining as P

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .transform(scan_spread(spark, sf_dir, "documents"))
    )
    ingested = docs.mapInPandas(
        P._ingest_worker,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("source", T.StringType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    _t("S0 scan+WARC ingest (noop)", lambda: _noop(ingested))

    from datapipeline_scripts_spark.extensions.curation import (
        _MIN_WORDS,
        _lang_columns,
    )
    from datapipeline_scripts_spark.functions.text import shingles, tokens

    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    h_en, h_es, h_de, predicted = _lang_columns(toks)
    sh3 = shingles(toks, 3)
    n_sh = F.when(n_words >= 3, n_words - 2).otherwise(0)
    n_repeated = F.when(n_words >= 3, n_words - 2 - F.size(F.array_distinct(sh3))).otherwise(0)
    gated_expr = (
        ingested.select(
            "doc_id",
            "source",
            "text",
            toks.alias("toks"),
            n_words.alias("n_words"),
            (h_en + h_es + h_de).alias("hits"),
            predicted.alias("predicted"),
            n_sh.alias("n_sh"),
            n_repeated.alias("n_repeated"),
        )
        .filter(
            (F.col("n_words") >= _MIN_WORDS)
            & (F.col("hits") > 0)
            & (F.col("predicted") != "und")
            & (F.col("n_sh") > 0)
            & (F.expr(f"n_repeated * {P._MIX_MOD} div n_sh") <= P._REP_BP_MAX)
        )
        .select("doc_id", "source", "text", "toks")
    )
    _t("S0+S1 ingest+gate (noop)", lambda: _noop(gated_expr))

    pinned = []

    def pin(df):
        pinned.append(df.persist())
        return pinned[-1]

    gated = pin(gated_expr)
    gated.count()

    _t("S2 minhash drop-set (from pinned gate)", lambda: P._minhash_drop(gated, pin).count())
    s2 = pin(gated.join(P._minhash_drop(gated, pin), "doc_id", "left_anti"))
    s2.count()
    _t("S3 winnow drop-set (from pinned s2)", lambda: P._winnow_drop(s2, pin).count())
    for df in pinned:
        df.unpersist()

    from datapipeline_scripts_spark.registry import get

    _t("full pretraining_pipeline", lambda: get("pretraining_pipeline").build(spark, sf_dir).count())


def dsir_stages(spark, sf_dir):
    from datapipeline_scripts_spark.catalog import load_table
    from datapipeline_scripts_spark.sources.staged_r13 import (
        _dsir_doc_scores_of,
        _dsir_grams_of,
        _dsir_lambda_of,
    )

    d = load_table(spark, sf_dir, "documents")
    g = None

    def build_g():
        nonlocal g
        g = _dsir_grams_of(d).localCheckpoint(eager=True)

    _t("grams build + checkpoint", build_g)
    _t("lambda model (from ckpt)", lambda: _dsir_lambda_of(g).select("b", "lam").localCheckpoint(eager=True))
    lam = _dsir_lambda_of(g).select("b", "lam").localCheckpoint(eager=True)
    doc_s = (
        g.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.sum(F.col("lam") + 32).alias("lam_sum"))
        .select("doc_id", F.expr("(lam_sum * 100) div n_grams").alias("s_shift"))
    )
    _t("doc scores (ckpt join + groupBy, noop)", lambda: _noop(doc_s))
    _t("scores + corpus join-back (noop)", lambda: _noop(_dsir_doc_scores_of(d)))

    from datapipeline_scripts_spark.registry import get

    _t("full corpus_dsir_resample", lambda: get("corpus_dsir_resample").build(spark, sf_dir).count())


def main():
    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("r14_probes")
    spark.sparkContext.setJobDescription(f"r14probe:{probe}")
    globals()[probe](spark, sf_dir)


if __name__ == "__main__":
    main()
