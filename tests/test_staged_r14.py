"""Oracle proofs for the STAGED round-14 keys (sources/staged_r14.py).

Round 13's driver window is committed to the _ADDED_R13 keys plus
stalest-evidence re-proofs, so the round-13-built surface (the PII
detection / redaction / anonymization family + the integer-exact IVF
training step) stages through this round exactly as r10-r13 keys
staged before it — held to the registration bar (the driver's own
`oracle.compare` hash gate, both fixture SFs) without touching the
registry."""

from __future__ import annotations

import pytest

from datapipeline_scripts_spark.oracle import compare, duck_connection
from datapipeline_scripts_spark.registry import all_queries
from datapipeline_scripts_spark.sources.staged_r14 import STAGED

_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("key", sorted(STAGED))
@pytest.mark.parametrize("sf_dir", _SFS)
def test_staged_key_matches_oracle(spark, key, sf_dir):
    build, oracle = STAGED[key]
    sdf = build(spark, sf_dir)
    with duck_connection(sf_dir) as con:
        opdf = con.execute(oracle).fetch_df()
    report = compare(key, sdf, opdf)
    assert report.ok, str(report)
    assert report.spark_rows > 0


def test_staged_r14_keys_not_registered_during_round_13():
    """The staging invariant: the catalog is 379 this round; the r14
    keys enter the registry only with round 14's deliberate flip."""
    registered = set(all_queries())
    assert len(registered) == 379
    assert not (set(STAGED) & registered)


def test_detect_every_class_fires():
    """Scale-honesty lesson 3: the fixtures carry NO natural PII, so
    the constructed classes must ALL fire at every SF — a class whose
    n_spans is 0 means the injection or its regex is dead machinery."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        _PII_CLASSES,
        PII_DETECT_CLASSES_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            d = con.execute(PII_DETECT_CLASSES_ORACLE).fetch_df()
        per_class = d.groupby("pii_class").n_spans.sum()
        for k in _PII_CLASSES:
            assert per_class[k] > 0, (sf_dir, k)
        # the multi-class docs make ipv4 and email co-fire: both
        # classes carry MORE spans than their dedicated doc share
        assert per_class["email"] > per_class["phone"], sf_dir
        assert per_class["ipv4"] > per_class["phone"], sf_dir


def test_gate_both_drop_reasons_fire_and_conserve():
    """Both gate verdicts must fire (SSN unconditional, density bar),
    survivors must exist, and the funnel must conserve arrivals."""
    from datapipeline_scripts_spark.sources.staged_r14 import PII_GATE_FILTER_ORACLE

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            g = con.execute(PII_GATE_FILTER_ORACLE).fetch_df()
        assert int(g.n_drop_ssn.sum()) > 0, sf_dir
        assert int(g.n_drop_density.sum()) > 0, sf_dir
        assert int(g.n_kept.sum()) > 0, sf_dir
        assert (
            g.n_arrived == g.n_kept + g.n_drop_ssn + g.n_drop_density
        ).all(), sf_dir
        assert int(g.n_arrived.sum()) == 500, sf_dir


def test_residual_audit_zero_after_and_tamper_drill():
    """The audit must read 0 residual spans per class after the full
    chain — and the drill must be able to fire: dropping the ipv4
    stage from the chain must surface exactly ipv4's residuals (the
    per-stage oracle tamper discipline; an audit that cannot go
    nonzero proves nothing)."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        _residual_oracle,
        PII_RESIDUAL_AUDIT_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            r = con.execute(PII_RESIDUAL_AUDIT_ORACLE).fetch_df().set_index("pii_class")
            t = con.execute(_residual_oracle(skip=("ipv4",))).fetch_df().set_index(
                "pii_class"
            )
        assert (r.n_spans_before > 0).all(), sf_dir
        assert (r.n_spans_after == 0).all(), sf_dir
        assert t.loc["ipv4", "n_spans_after"] == r.loc["ipv4", "n_spans_before"], sf_dir
        for k in ("email", "phone", "ssn"):
            assert t.loc[k, "n_spans_after"] == 0, (sf_dir, k)


def test_anonymize_consistency_machinery_fires():
    """The pseudonymization invariants: surrogate count == email count
    (no collisions at fixture scale), and the REUSE machinery is
    live — one address provably spans multiple docs and sources
    (max_global_reuse >= 2, n_cross_source_emails >= 1). A
    per-source reuse count would be structurally 1 on these fixtures
    (the dead-machinery trap this key's design note records)."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        PII_ANONYMIZE_CONSISTENT_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            a = con.execute(PII_ANONYMIZE_CONSISTENT_ORACLE).fetch_df()
        assert (a.n_distinct_emails == a.n_distinct_surrogates).all(), sf_dir
        assert int(a.max_global_reuse.max()) >= 2, sf_dir
        assert int(a.n_cross_source_emails.sum()) >= 1, sf_dir
        assert int(a.n_mentions.sum()) > 0, sf_dir


def test_privacy_pipeline_funnel_accounting():
    """Composite honesty: arrivals conserve, the gate fires, the kept
    set still carries redactable PII (spans_removed > 0 — the
    pipeline provably rewrites, not just drops), and the gate
    threshold is live: re-running the oracle with an infinite density
    bar must change the report."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        _PII_MAX_BP,
        PRIVACY_PIPELINE_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            p = con.execute(PRIVACY_PIPELINE_ORACLE).fetch_df()
            tampered = con.execute(
                PRIVACY_PIPELINE_ORACLE.replace(f"> {_PII_MAX_BP}", "> 1000000")
            ).fetch_df()
        assert int(p.n_arrived.sum()) == 500, sf_dir
        assert (p.n_arrived == p.n_kept + p.n_gated_out).all(), sf_dir
        assert int(p.n_gated_out.sum()) > 0, sf_dir
        assert int(p.spans_removed.sum()) > 0, sf_dir
        assert int(p.chars_removed.sum()) > 0, sf_dir
        assert not p.equals(tampered), sf_dir


def test_ivf_train_int_moves_and_conserves():
    """The Lloyd step must be live: membership conserves across the
    re-centering (sum n_before == sum n_after == |vectors|) and at
    least one vector provably moves lists (a training step that
    changes nothing is dead machinery). The quantized components must
    also sit far inside the _IVT_SHIFT bound the shifted division
    depends on."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        _IVT_S,
        _IVT_SHIFT,
        KNN_IVF_TRAIN_INT_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            k = con.execute(KNN_IVF_TRAIN_INT_ORACLE).fetch_df()
            mx = con.execute(
                f"""SELECT max(list_max(list_transform(embedding,
                      x -> abs(CAST(floor(CAST(x AS DOUBLE) * {_IVT_S} + 0.5) AS BIGINT)))))
                    FROM embeddings"""
            ).fetchone()[0]
        assert len(k) == 16, sf_dir
        assert int(k.n_before.sum()) == int(k.n_after.sum()), sf_dir
        assert int(k.n_before.sum()) == 500, sf_dir
        assert int(k.n_moved_out.sum()) > 0, sf_dir
        assert mx < _IVT_SHIFT, (sf_dir, mx)


def test_stream_gate_matches_batch_policy():
    """The streaming gate's oracle is the batch gate restricted to the
    arriving split — the policy (SSN + density bar) must agree with
    pii_gate_filter's on that split, so the two keys cannot fork."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        DOCS_STREAM_PII_GATE_ORACLE,
        PII_GATE_FILTER_ORACLE,
    )

    batch_on_arrivals = PII_GATE_FILTER_ORACLE.replace(
        "FROM documents)", "FROM documents WHERE doc_id % 10 >= 7)"
    )
    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            s = con.execute(DOCS_STREAM_PII_GATE_ORACLE).fetch_df()
            b = con.execute(batch_on_arrivals).fetch_df()
        assert (s.n_arrived == b.n_arrived).all(), sf_dir
        assert (s.n_blocked == b.n_drop_ssn + b.n_drop_density).all(), sf_dir


def test_staged_r14_plan_shapes(spark):
    """No CartesianProduct in any staged key's executed plan (the
    knn key's K-row centroid table rides a broadcast join) — and the
    keys whose scale shape DEPENDS on a broadcast dimension actually
    plan one (a silent fallback to a shuffle join on the bounded side
    would survive the hash gate while breaking the 100 TB story)."""
    sf_dir = "/root/testdata/sf0.001"
    must_broadcast = {
        "knn_ivf_train_int",  # K-row centroid table
        "dedup_semantic_crowding",  # K-row prototype table
    }
    for key, (build, _oracle) in sorted(STAGED.items()):
        df = build(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, key
        if key in must_broadcast:
            assert "Broadcast" in plan, key
    # pii_k_anonymity and pii_randomized_response broadcast their
    # bounded dimension INSIDE an eagerly-materialized frame (the
    # localCheckpoint hides the join from the final plan string), so
    # their broadcast shape is asserted on the pre-checkpoint frame
    from datapipeline_scripts_spark.sources.staged_r14 import _ka_base

    base_plan = (
        _ka_base(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in base_plan, "pii_k_anonymity dim join"


def test_semantic_crowding_both_classes_fire():
    """The fixtures' embeddings are near-orthogonal, so crowding must
    be driven by construction: the 16 seeds (cos 1 to their own
    centroid) plus the injected scaled seed copies — the SCALED
    copies are the load-bearing class (cos 1, dot != |c|^2), so a
    dot-threshold bug fails this test. Non-crowded members must also
    exist, and lists with an injected copy must drop exactly the
    surplus."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        _IVT_K,
        _SD_INJ_MOD,
        DEDUP_SEMANTIC_CROWDING_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            k = con.execute(DEDUP_SEMANTIC_CROWDING_ORACLE).fetch_df()
            n_vecs = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
            n_inj = con.execute(
                f"""SELECT count(*) FROM embeddings
                    WHERE vec_id % {_SD_INJ_MOD} = 7 AND vec_id >= {_IVT_K}"""
            ).fetchone()[0]
        assert len(k) == _IVT_K, sf_dir
        assert int(k.n_members.sum()) == n_vecs, sf_dir
        # every seed crowds its own list; every injected copy crowds
        assert int(k.n_crowded.sum()) == _IVT_K + n_inj, sf_dir
        assert n_inj > 0, sf_dir  # the constructed class exists
        assert int(k.n_crowded.sum()) < n_vecs, sf_dir  # non-crowded exists
        assert int(k.n_dropped.sum()) == n_inj, sf_dir


def test_k_anonymity_structure_fires_and_tamper_drill():
    """Scale-honesty lesson 3 for the microdata audit: both verdict
    classes must fire at every SF (below-k classes at the finest
    levels, surviving classes at every level), suppression must be
    provably NON-INCREASING along the coarsening chain (each level is
    a strict merge of the previous partition, so a row kept at a fine
    level can never become suppressed at a coarser one), l-diversity
    must be a real measurement (> 1 somewhere — the 2500/2000 grid
    offset exists precisely so L0's sensitive band is not a function
    of its QI), and the k=1 tamper oracle must zero exactly the
    suppression columns (proving they are live, not fixture
    accidents)."""
    from datapipeline_scripts_spark.sources.staged_r14 import _ka_oracle

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            r = con.execute(_ka_oracle()).fetch_df().set_index("level")
            t = con.execute(_ka_oracle(k=1)).fetch_df().set_index("level")
        assert (r.n_rows == r.n_rows.iloc[0]).all(), sf_dir  # conservation
        assert r.loc[0, "n_below_k"] > 0, sf_dir  # fine level suppresses
        kept = r.n_classes - r.n_below_k
        assert kept.loc[4] > 0, sf_dir  # coarse level survives
        # at least one level is a genuine MIX (both verdicts live in
        # one partition — at sf0.001 the finest levels suppress
        # everything, which is itself the k-anonymity phenomenon)
        assert ((kept > 0) & (r.n_below_k > 0)).any(), sf_dir
        assert (r.suppression_bp.diff().dropna() <= 0).all(), sf_dir  # monotone
        assert (r.n_classes.diff().dropna() < 0).all(), sf_dir  # strict coarsening
        assert int(r.loc[4, "l_div_min"]) > 1, sf_dir  # diversity is live
        assert (t.n_below_k == 0).all() and (t.suppression_bp == 0).all(), sf_dir
        assert (t.n_classes == r.n_classes).all(), sf_dir  # census unchanged


def test_split_leakage_both_classes_fire_and_tamper():
    """Straddling mixes (the contamination) AND pure single-split
    clusters must both exist at every SF; per-row split counts must
    conserve into n_docs; the all-train tamper oracle (100/0/0 split)
    must collapse every mix to 'train' while preserving the clustered
    doc total — proving the mix machinery is live, not a fixture
    accident."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        _sl_oracle,
        SPLIT_LEAKAGE_AUDIT_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            r = con.execute(SPLIT_LEAKAGE_AUDIT_ORACLE).fetch_df()
            t = con.execute(_sl_oracle(train_pct=100, val_pct=0)).fetch_df()
        mixes = set(r.split_mix)
        assert any("+" in m for m in mixes), sf_dir  # contamination fires
        assert any("+" not in m for m in mixes), sf_dir  # pure clusters exist
        assert (r.n_train + r.n_val + r.n_test == r.n_docs).all(), sf_dir
        # eval-side leakage is non-empty: some val/test doc shares a
        # cluster with a train doc (the thing the audit exists to catch)
        leak = r[r.split_mix.str.contains("train") & r.split_mix.str.contains("+", regex=False)]
        assert int((leak.n_val + leak.n_test).sum()) > 0, sf_dir
        assert list(t.split_mix) == ["train"], sf_dir
        assert int(t.n_docs.sum()) == int(r.n_docs.sum()), sf_dir


def test_randomized_response_flips_debiases_and_tamper():
    """The flip machinery must be live at every SF (kept AND flipped
    rows both exist), the release must conserve (reported counts sum
    to N), the debiased estimate must track the true counts within
    the mechanism's sampling envelope (deterministic coins make the
    realized error a fixture constant, so the bound is stable), and
    the keep_pct=100 tamper oracle must read a no-flip release
    (n_reported == n_kept == n_true everywhere)."""
    from datapipeline_scripts_spark.sources.staged_r14 import (
        _rr_oracle,
        PII_RANDOMIZED_RESPONSE_ORACLE,
    )

    for sf_dir in _SFS:
        with duck_connection(sf_dir) as con:
            r = con.execute(PII_RANDOMIZED_RESPONSE_ORACLE).fetch_df()
            t = con.execute(_rr_oracle(keep_pct=100)).fetch_df()
        assert int(r.n_kept.sum()) > 0, sf_dir
        assert int((r.n_true - r.n_kept).sum()) > 0, sf_dir  # flips fire
        assert int(r.n_reported.sum()) == int(r.n_true.sum()), sf_dir
        dev = (r.est_milli / 1000.0 - r.n_true).abs()
        assert (dev <= 0.25 * r.n_true + 10).all(), (sf_dir, dev.tolist())
        assert (t.n_reported == t.n_true).all(), sf_dir
        assert (t.n_kept == t.n_true).all(), sf_dir


def _h48(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_k_anonymity_python_model():
    """Third-implementation triangle check: the hash gate proves
    Spark == DuckDB, but a shared misreading of the spec would
    survive it — a pure pandas model of the 5-level census must
    reproduce the oracle row-for-row."""
    import math

    import pandas as pd

    from datapipeline_scripts_spark.sources.staged_r14 import (
        _KA_K,
        _KA_LEVELS,
        PII_K_ANONYMITY_ORACLE,
    )

    for sf_dir in _SFS:
        cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
        nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
        df = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        shifted = df.c_acctbal.map(math.floor).astype("int64") + 1000
        base = pd.DataFrame(
            {
                "c_nationkey": df.c_nationkey,
                "c_mktsegment": df.c_mktsegment,
                "regionkey": df.n_regionkey,
                "bal_cents": (df.c_acctbal * 100).map(math.floor).astype("int64")
                + 100000,
                "bal_band": shifted // 2500,
                "sens": shifted // 2000,
            }
        )
        rows = []
        for lvl, desc, cols in _KA_LEVELS:
            g = base.groupby(cols).agg(
                cnt=("sens", "size"), nsens=("sens", "nunique")
            )
            below = g.cnt < _KA_K
            kept_ns = g.nsens[~below]
            n_rows, n_sup = int(g.cnt.sum()), int(g.cnt[below].sum())
            rows.append(
                (
                    lvl,
                    desc,
                    n_rows,
                    len(g),
                    int(below.sum()),
                    n_sup,
                    n_sup * 10000 // n_rows,
                    int(g.cnt.min()),
                    int(g.cnt.max()),
                    int(kept_ns.min()) if len(kept_ns) else 0,
                )
            )
        with duck_connection(sf_dir) as con:
            r = con.execute(PII_K_ANONYMITY_ORACLE).fetch_df()
        got = [tuple(x) for x in r.itertuples(index=False)]
        assert [tuple(map(lambda v: v, t)) for t in got] == rows, sf_dir


def test_randomized_response_python_model():
    """The RR release replayed with hashlib coins: proves the shared
    md5_48 coin convention end-to-end against a third engine."""
    import pandas as pd

    from datapipeline_scripts_spark.sources.staged_r14 import (
        _RR_KEEP_PCT,
        PII_RANDOMIZED_RESPONSE_ORACLE,
    )

    for sf_dir in _SFS:
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "lang"]]
        langs = sorted(docs.lang.unique())
        k, n = len(langs), len(docs)
        true_c: dict = {}
        kept_c: dict = {}
        rep_c: dict = {}
        for doc_id, lang in docs.itertuples(index=False):
            keep = _h48(f"{doc_id}:rr") % 100 < _RR_KEEP_PCT
            rep = lang if keep else langs[_h48(f"{doc_id}:alt") % k]
            true_c[lang] = true_c.get(lang, 0) + 1
            kept_c[lang] = kept_c.get(lang, 0) + (1 if keep else 0)
            rep_c[rep] = rep_c.get(rep, 0) + 1
        model = [
            (
                lang,
                true_c.get(lang, 0),
                kept_c.get(lang, 0),
                rep_c.get(lang, 0),
                max(4 * k * rep_c.get(lang, 0) - n, 0) * 1000 // (3 * k),
            )
            for lang in langs
        ]
        with duck_connection(sf_dir) as con:
            r = con.execute(PII_RANDOMIZED_RESPONSE_ORACLE).fetch_df()
        assert [tuple(x) for x in r.itertuples(index=False)] == model, sf_dir


def test_semantic_crowding_python_model():
    """The crowding report replayed in numpy (float64 widening and
    integer dot products match both engines exactly): every
    quantization, argmax tie-break, and squared-threshold decision
    must agree."""
    import numpy as np
    import pandas as pd

    from datapipeline_scripts_spark.sources.staged_r14 import (
        _IVT_K,
        _SD_INJ_MOD,
        _SD_S,
        _SD_T2,
        DEDUP_SEMANTIC_CROWDING_ORACLE,
    )

    for sf_dir in _SFS:
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        vecs = {
            int(t.vec_id): np.asarray(t.embedding, dtype=np.float64)
            for t in emb.itertuples(index=False)
        }
        seeds = {i: vecs[i] for i in range(_IVT_K)}
        q = {}
        for vid, v in vecs.items():
            vv = (
                seeds[vid % _IVT_K] * (2 + vid % 3)
                if vid % _SD_INJ_MOD == 7 and vid >= _IVT_K
                else v
            )
            q[vid] = np.floor(vv * _SD_S + 0.5).astype(np.int64)
        cq = {i: q[i] for i in range(_IVT_K)}
        members = {i: 0 for i in range(_IVT_K)}
        crowded = {i: 0 for i in range(_IVT_K)}
        for vid, qv in q.items():
            best = max(
                ((int(qv @ cq[c]), -c) for c in range(_IVT_K)),
            )
            dot, cid = best[0], -best[1]
            qq, rr = int(qv @ qv), int(cq[cid] @ cq[cid])
            members[cid] += 1
            if dot > 0 and dot * dot * 10000 >= _SD_T2 * qq * rr:
                crowded[cid] += 1
        model = [
            (
                c,
                members[c],
                crowded[c],
                max(crowded[c] - 1, 0),
                crowded[c] * 10000 // members[c],
            )
            for c in range(_IVT_K)
        ]
        with duck_connection(sf_dir) as con:
            r = con.execute(DEDUP_SEMANTIC_CROWDING_ORACLE).fetch_df()
        assert [tuple(x) for x in r.itertuples(index=False)] == model, sf_dir


def test_split_leakage_python_model():
    """The full chain replayed in pure Python — shingles, one md5 per
    shingle with Kirsch-Mitzenmacher double hashing, 16-minimum
    signatures, 4x4 banded candidate pairs, the >= 8/16 estimate
    gate, union-find components, md5 split, mix census — a third
    engine for the most compositional staged key."""
    import hashlib
    import re

    import pandas as pd

    from datapipeline_scripts_spark.sources.staged_r14 import (
        _SL_TRAIN_PCT,
        _SL_VAL_PCT,
        SPLIT_LEAKAGE_AUDIT_ORACLE,
    )

    for sf_dir in _SFS:
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        sigs = {}
        for doc_id, text in docs.itertuples(index=False):
            # mirror the SQL: lower -> trim(spaces) -> \s+ collapse -> split(' ')
            toks = re.sub(r"\s+", " ", str(text).lower().strip(" ")).split(" ")
            if len(toks) < 3:
                continue
            shset = {
                f"{toks[i]} {toks[i+1]} {toks[i+2]}" for i in range(len(toks) - 2)
            }
            mins = [2**33] * 16
            for sh in shset:
                hx = hashlib.md5(sh.encode()).hexdigest()
                h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
                for i in range(16):
                    v = (h1 + i * h2) % 4294967296
                    if v < mins[i]:
                        mins[i] = v
            sigs[int(doc_id)] = mins
        buckets: dict = {}
        for d, s in sigs.items():
            for b in range(4):
                buckets.setdefault((b, tuple(s[4 * b : 4 * b + 4])), []).append(d)
        parent = {d: d for d in sigs}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        linked = set()
        for members in buckets.values():
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = min(members[i], members[j]), max(members[i], members[j])
                    if (a, b) in linked:
                        continue
                    linked.add((a, b))
                    if sum(x == y for x, y in zip(sigs[a], sigs[b])) >= 8:
                        ra, rb = find(a), find(b)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        comp: dict = {}
        for d in sigs:
            comp.setdefault(find(d), []).append(d)
        mixes: dict = {}
        for members in comp.values():
            if len(members) < 2:
                # a union-find singleton has no est >= 0.5 edge by
                # construction, and the oracle's clusters carry only
                # docs that appear in the pair table — skip it
                continue
            splits = {}
            for d in members:
                h = int(hashlib.md5(str(d).encode()).hexdigest()[:12], 16) % 100
                sp = (
                    "train"
                    if h < _SL_TRAIN_PCT
                    else "val" if h < _SL_TRAIN_PCT + _SL_VAL_PCT else "test"
                )
                splits[sp] = splits.get(sp, 0) + 1
            mix = "+".join(sorted(splits))
            agg = mixes.setdefault(mix, [0, 0, 0, 0, 0])
            agg[0] += 1
            agg[1] += len(members)
            agg[2] += splits.get("train", 0)
            agg[3] += splits.get("val", 0)
            agg[4] += splits.get("test", 0)
        model = [
            (m, *mixes[m]) for m in sorted(mixes)
        ]
        with duck_connection(sf_dir) as con:
            r = con.execute(SPLIT_LEAKAGE_AUDIT_ORACLE).fetch_df()
        assert [tuple(x) for x in r.itertuples(index=False)] == model, sf_dir
