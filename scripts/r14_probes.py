"""Round-14 stage-isolation probes (guide §1.4 noop sink / §1.5 labels).

Usage: python scripts/r14_probes.py <probe> [sf_dir]
Probes:
  gate_stages   — docs_stream_quality_gate stage isolation
  winnow_hist   — dedup_passage_winnow fingerprint-frequency histogram
  sel_stages    — corpus_selection_pipeline stage isolation
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


def main():
    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("r14_probes")
    spark.sparkContext.setJobDescription(f"r14probe:{probe}")
    globals()[probe](spark, sf_dir)


if __name__ == "__main__":
    main()
