"""Independent-model tests for the round-8 wave-4 curation queries
(p20 DSIR, p21 perplexity bands, t30 C4 rules, t31 Kneser–Ney, v18 JL
grid). The registry differential already pins each against its DuckDB
oracle; these pin the SEMANTICS against pure-python/numpy recomputes and
the integer invariants the methods promise, so an oracle that drifted in
lockstep with the plan would still be caught."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

from mdio_cpp_spark.functions import hashing
from mdio_cpp_spark.plans import REGISTRY

_TOK = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return [t for t in _TOK.split(text.lower()) if t]


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------- p20


def _dsir_model(docs: pd.DataFrame, buckets: int = 256, target_lang: str = "en"):
    """Pure-python DSIR: hashed unigram+bigram features, Laplace-smoothed
    target/raw bucket distributions, per-doc summed log ratios."""
    feats: dict[int, list[int]] = {}
    langs: dict[int, str] = {}
    for r in docs.itertuples():
        w = _tokens(r.text)
        if not w:
            continue
        fs = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
        bs = [
            int(hashlib.md5(f.encode()).hexdigest()[:2], 16) % buckets
            for f in fs
        ]
        feats[r.doc_id] = bs
        langs[r.doc_id] = r.lang
    ct = [0] * buckets
    cr = [0] * buckets
    for did, bs in feats.items():
        for b in bs:
            cr[b] += 1
            if langs[did] == target_lang:
                ct[b] += 1
    n_r, n_t = sum(cr), sum(ct)
    lw = [
        math.log((ct[b] + 1) / (n_t + buckets))
        - math.log((cr[b] + 1) / (n_r + buckets))
        for b in range(buckets)
    ]
    return {did: round(sum(lw[b] for b in bs), 4) for did, bs in feats.items()}


def test_p20_matches_pure_python_model(spark, sf_dir, docs):
    out = REGISTRY["p20_dsir_resample"].spark(spark, sf_dir).toPandas()
    model = _dsir_model(docs)
    assert len(out) == 100
    for r in out.itertuples():
        assert model[r.doc_id] == pytest.approx(r.logw, abs=1e-4), r.doc_id
    # the returned rows ARE the top-100 of the model ranking
    want = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert list(out["doc_id"]) == [d for d, _ in want]


def test_p20_selects_toward_the_target_distribution(spark, sf_dir, docs):
    """The whole point of DSIR: the resampled picks must look more like
    the target (lang=en) slice than the raw corpus does."""
    out = REGISTRY["p20_dsir_resample"].spark(spark, sf_dir).toPandas()
    lang = docs.set_index("doc_id")["lang"]
    top_share = (lang.loc[out["doc_id"]] == "en").mean()
    corpus_share = (docs["lang"] == "en").mean()
    assert top_share > corpus_share


# --------------------------------------------------------------------- p21


def test_p21_band_bounds_are_cumulative_share_cuts(spark, sf_dir):
    """Discrete cumulative-share cuts promise: head holds at least a
    quarter of each language, head+middle at least three quarters, and
    the three bands partition the scored docs."""
    out = REGISTRY["p21_perplexity_buckets"].spark(spark, sf_dir).toPandas()
    for lang, g in out.groupby("lang"):
        by = dict(zip(g["bucket"], g["n_docs"]))
        n = int(g["n_docs"].sum())
        head = int(by.get("head", 0))
        mid = int(by.get("middle", 0))
        assert 4 * head >= n, lang
        assert 4 * (head + mid) >= 3 * n, lang
        assert set(by) <= {"head", "middle", "tail"}


# --------------------------------------------------------------------- t30


def test_t30_flag_counts_match_pandas_recompute(spark, sf_dir, docs):
    out = (
        REGISTRY["t30_c4_filters"].spark(spark, sf_dir).toPandas()
        .set_index("source")
    )
    rows = []
    for r in docs.itertuples():
        w = _tokens(r.text)
        mwl = (sum(map(len, w)) / len(w)) if w else None
        flags = dict(
            f_short=len(w) < 5,
            f_noterm=re.search(r"[.!?]\s*$", r.text) is None,
            f_brace="{" in r.text,
            f_lorem="lorem ipsum" in r.text.lower(),
            f_longword=bool(w) and max(map(len, w)) > 25,
            f_badmwl=mwl is not None and (mwl < 3 or mwl > 10),
        )
        rows.append({"source": r.source, **flags, "ok": not any(flags.values())})
    m = pd.DataFrame(rows).groupby("source").sum()
    for src in m.index:
        assert out.loc[src, "n_short"] == m.loc[src, "f_short"]
        assert out.loc[src, "n_noterm"] == m.loc[src, "f_noterm"]
        assert out.loc[src, "n_brace"] == m.loc[src, "f_brace"]
        assert out.loc[src, "n_lorem"] == m.loc[src, "f_lorem"]
        assert out.loc[src, "n_longword"] == m.loc[src, "f_longword"]
        assert out.loc[src, "n_badmwl"] == m.loc[src, "f_badmwl"]
        assert out.loc[src, "n_pass"] == m.loc[src, "ok"]


# --------------------------------------------------------------------- t31


def test_t31_kneser_ney_is_a_proper_discounted_model(spark, sf_dir, docs):
    """Every interpolated-KN bigram probability lies in (0, 1], so every
    per-doc mean surprisal is >= 0; and the doc set/bigram counts agree
    with a direct recompute."""
    out = REGISTRY["t31_kneser_ney"].spark(spark, sf_dir).toPandas()
    assert (out["avg_kn_surprisal"] >= 0).all()
    n_bg = {
        r.doc_id: len(_tokens(r.text)) - 1
        for r in docs.itertuples()
        if len(_tokens(r.text)) >= 2
    }
    got = dict(zip(out["doc_id"], out["n_bigrams"]))
    assert got == n_bg


def test_t31_discount_raises_surprisal_of_rare_bigrams(spark, sf_dir):
    """KN discounts every observed count by D, so a document made of
    singleton bigrams must score strictly higher under KN than under the
    t17 MLE (where a singleton unique-prefix bigram has P = 1)."""
    kn = (
        REGISTRY["t31_kneser_ney"].spark(spark, sf_dir).toPandas()
        .set_index("doc_id")
    )
    mle = (
        REGISTRY["t17_bigram_surprisal"].spark(spark, sf_dir).toPandas()
        .set_index("doc_id")
    )
    joined = kn.join(mle, how="inner", lsuffix="_kn", rsuffix="_mle")
    assert len(joined) == len(kn) == len(mle)
    # corpus-wide: the discounted model can never be more confident on
    # average than the MLE it discounts
    assert (
        joined["avg_kn_surprisal"].mean() > joined["avg_surprisal2"].mean()
    )


# --------------------------------------------------------------------- v18


def test_v18_matches_numpy_model(spark, sf_dir):
    out = REGISTRY["v18_jl_grid"].spark(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    planes = np.array(hashing.hyperplane_weights(2, 64))
    cells: dict[tuple[int, int], list[int]] = {}
    for r in emb.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        # left-to-right fold, matching the engine/oracle dot contract
        x = round(math.fsum([]) + _ltr_dot(v, planes[0]), 4)
        y = round(math.fsum([]) + _ltr_dot(v, planes[1]), 4)
        cells.setdefault(
            (math.floor(x / 2.0), math.floor(y / 2.0)), []
        ).append(r.label)
    assert len(out) == len(cells)
    for r in out.itertuples():
        labels = cells[(r.cx, r.cy)]
        assert r.n_vecs == len(labels)
        counts = pd.Series(labels).value_counts()
        best_n = counts.max()
        best = min(l for l, c in counts.items() if c == best_n)
        assert r.top_label == best
        assert r.top_share == pytest.approx(best_n / len(labels), abs=1e-4)


def _ltr_dot(v: np.ndarray, w: np.ndarray) -> float:
    acc = 0.0
    for a, b in zip(v.tolist(), w.tolist()):
        acc += float(a) * float(b)
    return acc


# ------------------------------------------------- from-raw model recomputes


def test_p21_bands_match_full_python_model(spark, sf_dir, docs):
    """End-to-end CCNet-band recompute from raw documents: bigram-LM
    surprisal (4dp), per-language cumulative-share cuts (4*cum >= n),
    band counts and means — the whole p21 pipeline in ~30 lines of
    pure python."""
    from collections import Counter, defaultdict

    c2, c1 = Counter(), Counter()
    doc_bigrams = {}
    for r in docs.itertuples():
        w = _tokens(r.text)
        if len(w) < 2:
            continue
        bg = list(zip(w, w[1:]))
        doc_bigrams[r.doc_id] = bg
        for a, b in bg:
            c2[(a, b)] += 1
            c1[a] += 1
    lang = docs.set_index("doc_id")["lang"]
    ppl = {
        d: round(sum(-math.log(c2[p] / c1[p[0]]) for p in bg) / len(bg), 4)
        for d, bg in doc_bigrams.items()
    }
    by_lang = defaultdict(list)
    for d, v in ppl.items():
        by_lang[lang.loc[d]].append(v)
    want = {}
    for lg, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        # discrete cumulative-share cuts over the 4dp value lattice
        cum, p25, p75 = 0, None, None
        for v, cnt in sorted(Counter(vals).items()):
            cum += cnt
            if p25 is None and 4 * cum >= n:
                p25 = v
            if p75 is None and 4 * cum >= 3 * n:
                p75 = v
        for v in vals:
            b = "head" if v <= p25 else ("middle" if v <= p75 else "tail")
            key = (lg, b)
            c, s = want.get(key, (0, 0.0))
            want[key] = (c + 1, s + v)
    out = REGISTRY["p21_perplexity_buckets"].spark(spark, sf_dir).toPandas()
    assert len(out) == len(want)
    for r in out.itertuples():
        c, s = want[(r.lang, r.bucket)]
        assert r.n_docs == c, (r.lang, r.bucket)
        assert r.avg_ppl == pytest.approx(round(s / c, 4), abs=2e-4)


def test_ev19_km_matches_lifelines_style_recompute(spark, sf_dir):
    """Kaplan–Meier from raw events: per-user purchase spans in hours,
    right-censor inside the final 48h, product-limit survival — the
    textbook estimator, independently of the engine's SQL shapes."""
    from collections import Counter

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = e[e["event_type"] == "purchase"]
    t0 = pd.Timestamp("2024-01-01")
    hours = ((p["ts"] - t0).dt.total_seconds() // 3600).astype("int64")
    g = pd.DataFrame({"u": p["user_id"], "h": hours}).groupby("u")["h"]
    first, last = g.min(), g.max()
    max_h = int(last.max())
    t = (last - first).astype(int)
    event = (last <= max_h - 48).astype(int)
    n = len(t)
    d_at = Counter(t[event == 1])
    all_at = Counter(t)
    out = REGISTRY["ev19_survival_km"].spark(spark, sf_dir).toPandas()
    s, removed = 1.0, 0
    expect = {}
    for ti in sorted(all_at):
        n_risk = n - removed
        d = d_at.get(ti, 0)
        s *= max(1.0 - d / n_risk, 1e-12)
        expect[ti] = (n_risk, d, round(s, 4))
        removed += all_at[ti]
    got = {
        r.t: (r.n_risk, r.d_churn, r.survival) for r in out.itertuples()
    }
    assert got == expect
