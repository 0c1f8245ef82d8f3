"""Independent-model tests for the round-8 wave-5 queries (p22 pack
spans, ml11 covariance, v19 scalar quantization, ga07 modularity) —
numpy/pure-python recomputes plus the exact integer invariants each
method promises, complementing the registry's DuckDB differential."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mdio_cpp_spark.plans import REGISTRY


# --------------------------------------------------------------------- p22


def test_p22_spans_conserve_tokens_and_respect_budget(spark, sf_dir):
    spans = REGISTRY["p22_pack_spans"].spark(spark, sf_dir).toPandas()
    packed = REGISTRY["p01_sequence_packing"].spark(spark, sf_dir).toPandas()
    budget = 256
    # every span lies inside its pack's coordinate system
    assert (spans["pos_start"] >= 0).all()
    assert (spans["len_in_pack"] >= 1).all()
    assert (spans["pos_start"] + spans["len_in_pack"] <= budget).all()
    # token conservation: the split pieces of a doc sum to its token count
    per_doc = spans.groupby("doc_id")["len_in_pack"].sum()
    want = packed.set_index("doc_id")["n_tok"]
    want = want[want >= 1]
    assert per_doc.to_dict() == want.to_dict()
    # a doc's first span starts at start_off mod budget in pack start_off/B
    first = spans.sort_values(["doc_id", "pack_id"]).groupby("doc_id").first()
    merged = first.join(packed.set_index("doc_id"), lsuffix="_s")
    assert (merged["pack_id_s"] == merged["start_off"] // budget).all()
    assert (merged["pos_start"] == merged["start_off"] % budget).all()
    # within a (shard, pack), spans tile without overlap: total resident
    # tokens never exceed the budget
    per_pack = spans.groupby(["shard", "pack_id"])["len_in_pack"].sum()
    assert (per_pack <= budget).all()


# -------------------------------------------------------------------- ml11


def test_ml11_matches_numpy_cov(spark, sf_dir):
    out = REGISTRY["ml11_embedding_cov"].spark(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, bias=True)  # population covariance
    assert len(out) == 64 * 65 // 2
    for r in out.itertuples():
        assert C[r.i, r.j] == pytest.approx(r.cov, abs=2e-6), (r.i, r.j)


# --------------------------------------------------------------------- v19


def test_v19_matches_numpy_quantizer(spark, sf_dir):
    out = (
        REGISTRY["v19_scalar_quant"].spark(spark, sf_dir).toPandas()
        .set_index("label")
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    lo, hi = X.min(axis=0), X.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    q = np.floor((X - lo) * 255 / span + 0.5)
    Xr = np.where(hi > lo, lo + q * span / 255, lo)
    err = X - Xr
    mse = (err**2).mean(axis=1)
    labels = emb["label"].to_numpy()
    for lab in np.unique(labels):
        sel = labels == lab
        assert out.loc[lab, "n_vecs"] == sel.sum()
        assert out.loc[lab, "avg_mse"] == pytest.approx(
            mse[sel].mean(), abs=2e-6
        )
        assert out.loc[lab, "max_abs_err"] == pytest.approx(
            np.abs(err[sel]).max(), abs=2e-6
        )
    # the quantizer must actually be int8-grade: worst error <= half a step
    assert (out["max_abs_err"] <= (hi - lo).max() / 255 / 2 + 1e-9).all()


# --------------------------------------------------------------------- ga07


def test_ga07_modularity_identities(spark, sf_dir):
    out = REGISTRY["ga07_modularity"].spark(spark, sf_dir).toPandas()
    # Σ degree over communities counts every edge twice
    # Σ w_in <= m, every community's w_in <= its degree
    assert (out["w_in"] <= out["degree_w"]).all()
    m2 = out["degree_w"].sum()
    assert m2 % 2 == 0
    m = m2 // 2
    assert out["w_in"].sum() <= m
    # Q = Σ q_c is bounded by (-1, 1) and, with a null-model partition
    # (TPC-H assigns suppliers to orders nation-blind), near zero
    q = out["q_contrib"].sum()
    assert -1.0 < q < 1.0
    assert abs(q) < 0.2
    # identity check against a recompute from the integer columns
    for r in out.itertuples():
        want = r.w_in / m - (r.degree_w / (2 * m)) ** 2
        assert r.q_contrib == pytest.approx(want, abs=1e-6)


# --------------------------------------------------------------------- w18


def test_w18_matches_python_ewma(spark, sf_dir):
    out = REGISTRY["w18_ewma"].spark(spark, sf_dir).toPandas()
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["day"] = (e["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    e["cents"] = (e["value"] * 100).round().astype("int64")
    daily = (
        e.groupby(["event_type", "day"])["cents"].sum().reset_index()
        .sort_values(["event_type", "day"])
    )
    got = {(r.event_type, r.day): r.ewma for r in out.itertuples()}
    for et, g in daily.groupby("event_type"):
        xs = g["cents"].tolist()
        days = g["day"].tolist()
        for t in range(len(xs)):
            lo = max(0, t - 31)
            num = sum(xs[i] / (1 << (t - i)) for i in range(lo, t + 1))
            den = sum(1.0 / (1 << (t - i)) for i in range(lo, t + 1))
            want = round(num / den / 100.0, 4)
            assert got[(et, days[t])] == pytest.approx(want, abs=1e-4)
    assert len(got) == len(daily)


# --------------------------------------------------------------------- u09


def test_u09_compaction_plan_invariants(spark, sf_dir):
    out = REGISTRY["u09_compaction_plan"].spark(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    # file conservation: every manifest file lands in exactly one group
    assert out["n_files"].sum() == len(docs)
    assert out["bytes"].sum() == docs["n_chars"].sum()
    keep = out[out["kind"] == "keep"]
    comp = out[out["kind"] == "compact"]
    # pass-through rows are exactly the healthy files, one group each
    assert (keep["n_files"] == 1).all()
    assert (keep["bytes"] >= 1500).all()
    assert (comp["bytes"] < 1500 * comp["n_files"]).all()
    # first-fit overshoot bound: a planned group never exceeds
    # target + cutoff (the one boundary-spilling small file)
    assert (comp["bytes"] < 4000 + 1500).all()
    # idempotence: re-planning the same manifest yields the same plan
    again = REGISTRY["u09_compaction_plan"].spark(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), again.reset_index(drop=True)
    )


# --------------------------------------------------------------------- mm10


def test_mm10_patch_grid_tiles_the_image(spark, sf_dir):
    out = REGISTRY["mm10_patch_grid"].spark(spark, sf_dir).toPandas()
    meta = REGISTRY["mm02_decode_meta"].spark(spark, sf_dir).toPandas()
    meta = meta[meta["doc_id"] % 29 == 0].set_index("doc_id")
    P = 16
    for doc_id, g in out.groupby("doc_id"):
        w, h, c = (
            int(meta.loc[doc_id, "width"]),
            int(meta.loc[doc_id, "height"]),
            int(meta.loc[doc_id, "channels"]),
        )
        nx, ny = w // P, h // P
        assert len(g) == nx * ny
        assert list(g["patch_id"]) == list(range(nx * ny))
        # origins stay inside the cropped grid, offsets inside the payload
        assert (g["x0"] % P == 0).all() and (g["y0"] % P == 0).all()
        assert (g["x0"] <= w - P).all() and (g["y0"] <= h - P).all()
        assert (g["byte_off"] == (g["y0"] * w + g["x0"]) * c).all()
        assert (g["byte_off"] < w * h * c).all()
    assert set(out["doc_id"]) == set(meta.index)


# --------------------------------------------------------------------- v20


def test_v20_matches_numpy_hamming(spark, sf_dir):
    out = REGISTRY["v20_binary_quant"].spark(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    bits = X >= 0
    qbits = bits[ids == 0][0]
    ham = (bits ^ qbits).sum(axis=1)
    order = sorted(
        [(int(h), int(i)) for h, i in zip(ham, ids) if i != 0]
    )[:10]
    assert list(zip(out["hamming"], out["vec_id"])) == order
    # the rerank column is the true cosine to the query
    qv = X[ids == 0][0]
    byid = {int(i): X[k] for k, i in enumerate(ids)}
    for r in out.itertuples():
        v = byid[r.vec_id]
        want = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        assert r.cos == pytest.approx(want, abs=1e-4)


# --------------------------------------------------------------------- ev19


def test_ev19_km_estimator_invariants(spark, sf_dir):
    out = REGISTRY["ev19_survival_km"].spark(spark, sf_dir).toPandas()
    # duration grid sorted, at-risk strictly decreasing, hazards in [0, 1]
    assert list(out["t"]) == sorted(out["t"])
    assert (out["n_risk"].diff().dropna() < 0).all()
    assert ((out["hazard"] >= 0) & (out["hazard"] <= 1)).all()
    # survival is a non-increasing product-limit curve starting <= 1
    assert (out["survival"].diff().dropna() <= 1e-9).all()
    assert out["survival"].iloc[0] <= 1.0 + 1e-9
    # python recompute of the product-limit estimator
    s = 1.0
    for r in out.itertuples():
        s *= 1.0 - r.d_churn / r.n_risk
        assert r.survival == pytest.approx(round(s, 4), abs=2e-4)
    # censoring really happened: fewer churn events than observations
    assert out["d_churn"].sum() < out["n_risk"].iloc[0]


# --------------------------------------------------------------------- ml12


def test_ml12_auc_matches_numpy_rank_recompute(spark, sf_dir):
    out = REGISTRY["ml12_auc"].spark(spark, sf_dir).toPandas().set_index("class")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    y = emb["label"].to_numpy()
    for c in np.unique(y):
        cent = X[y == c].mean(axis=0)
        cc = np.round(
            X @ cent / (np.linalg.norm(X, axis=1) * np.linalg.norm(cent)), 6
        )
        # tie-averaged ranks (1-based)
        order = np.argsort(cc, kind="mergesort")
        ranks = np.empty(len(cc))
        sorted_cc = cc[order]
        i = 0
        while i < len(cc):
            j = i
            while j + 1 < len(cc) and sorted_cc[j + 1] == sorted_cc[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
            i = j + 1
        pos = y == c
        n_pos, n_neg = int(pos.sum()), int((~pos).sum())
        auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        assert out.loc[c, "n_pos"] == n_pos
        assert out.loc[c, "auc"] == pytest.approx(auc, abs=2e-6), c
        # a trained-on-own-centroid score must separate better than chance
        assert out.loc[c, "auc"] > 0.5


# --------------------------------------------------------------------- s12


def test_s12_bootstrap_distribution_is_sane(spark, sf_dir):
    out = REGISTRY["s12_poisson_bootstrap"].spark(spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    n, mu, sd = len(cents), cents.mean() / 100, cents.std(ddof=1) / 100
    assert len(out) == 32
    # Poisson(1) weights: each replicate's effective n concentrates at n
    assert ((out["n_eff"] - n).abs() < 5 * np.sqrt(n)).all()
    # replicate means scatter around the true mean at ~ the analytic SE
    se = sd / np.sqrt(n)
    assert abs(out["boot_mean"].mean() - mu) < 4 * se
    boot_se = out["boot_mean"].std(ddof=1)
    assert 0.4 * se < boot_se < 2.5 * se
    # determinism: a rerun is bit-identical (no RNG state anywhere)
    again = REGISTRY["s12_poisson_bootstrap"].spark(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(out, again)


# --------------------------------------------------------------------- t32


def test_t32_flesch_matches_python_recompute(spark, sf_dir):
    import re as _re

    out = REGISTRY["t32_flesch"].spark(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")
    tok = _re.compile(r"[^a-z0-9]+")
    for r in out.sample(n=min(60, len(out)), random_state=7).itertuples():
        text = docs.loc[r.doc_id, "text"]
        w = [t for t in tok.split(text.lower()) if t]
        sents = max(len(_re.findall(r"[.!?]+", text)), 1)
        syl = sum(max(len(_re.findall(r"[aeiou]+", x)), 1) for x in w)
        want = round(206.835 - 1.015 * len(w) / sents - 84.6 * syl / len(w), 4)
        assert (r.n_words, r.n_sents, r.n_syl) == (len(w), sents, syl)
        assert r.flesch == pytest.approx(want, abs=1e-4)


# --------------------------------------------------------------------- ml13


def test_ml13_cv_matches_numpy_fold_models(spark, sf_dir):
    import hashlib as _hl

    out = REGISTRY["ml13_ridge_cv"].spark(spark, sf_dir).toPandas().set_index("fold")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    folds = li["l_orderkey"].map(
        lambda k: int(_hl.md5(str(k).encode()).hexdigest()[0], 16) % 5
    ).to_numpy()
    u = li["l_quantity"].astype("int64").to_numpy()
    v = (li["l_discount"] * 100).round().astype("int64").to_numpy()
    y = (li["l_extendedprice"] * 100).round().astype("int64").to_numpy()
    lam = 1000.0
    for f in range(5):
        tr = folds != f
        n = float(tr.sum())
        su, sv, sy = u[tr].sum(), v[tr].sum(), y[tr].sum()
        a = n * (u[tr] * u[tr]).sum() - su * su + lam
        b = n * (v[tr] * v[tr]).sum() - sv * sv + lam
        c = n * (u[tr] * v[tr]).sum() - su * sv
        p = n * (u[tr] * y[tr]).sum() - su * sy
        q = n * (v[tr] * y[tr]).sum() - sv * sy
        det = a * b - c * c
        b1, b2 = (b * p - c * q) / det, (a * q - c * p) / det
        b0 = (sy - b1 * su - b2 * sv) / n
        te = ~tr
        rmse = float(
            np.sqrt(((y[te] - b0 - b1 * u[te] - b2 * v[te]) ** 2).mean()) / 100
        )
        assert out.loc[f, "n_test"] == int(te.sum())
        assert out.loc[f, "beta_qty"] == pytest.approx(b1, abs=2e-6)
        assert out.loc[f, "rmse"] == pytest.approx(rmse, abs=1e-3)
    # honest evaluation: every row is held out exactly once
    assert out["n_test"].sum() == len(li)


# --------------------------------------------------------------------- ml14


def test_ml14_stump_matches_numpy_exact_greedy(spark, sf_dir):
    out = REGISTRY["ml14_decision_stump"].spark(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = li["l_quantity"].astype("int64").to_numpy()
    # Spark ROUND is half-up; numpy/pandas round is half-to-even
    y = np.floor(li["l_extendedprice"].to_numpy() + 0.5).astype("int64")
    best = None
    for v in sorted(set(x))[:-1]:  # nl < n
        l, r = y[x <= v], y[x > v]
        sse = (
            (l * l).sum() - l.sum() ** 2 / len(l)
            + (r * r).sum() - r.sum() ** 2 / len(r)
        )
        if best is None or (sse, v) < best[:2]:
            best = (sse, v, len(l), len(r), l.mean(), r.mean())
    sse0 = (y * y).sum() - y.sum() ** 2 / len(y)
    assert len(out) == 1
    r0 = out.iloc[0]
    assert r0["split_x"] == best[1]
    assert (r0["n_left"], r0["n_right"]) == (best[2], best[3])
    assert r0["mean_left"] == pytest.approx(best[4], abs=1e-3)
    assert r0["mean_right"] == pytest.approx(best[5], abs=1e-3)
    assert r0["sse_gain"] == pytest.approx(sse0 - best[0], rel=1e-9)
    assert r0["sse_gain"] > 0  # quantity genuinely predicts price


# --------------------------------------------------------------------- a19


def test_a19_matches_scipy_free_trimmed_mean(spark, sf_dir):
    out = (
        REGISTRY["a19_trimmed_mean"].spark(spark, sf_dir).toPandas()
        .set_index("grp")
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    for grp, g in orders.assign(v=cents).groupby("o_orderpriority"):
        v = np.sort(g["v"].to_numpy())
        k = len(v) // 10
        want = v[k : len(v) - k].mean() / 100 if len(v) > 2 * k else None
        assert out.loc[grp, "k_trim"] == k
        assert out.loc[grp, "trimmed_mean"] == pytest.approx(want, abs=1e-4)
        assert out.loc[grp, "plain_mean"] == pytest.approx(
            v.mean() / 100, abs=1e-4
        )


# --------------------------------------------------------------------- ev20


def test_ev20_matches_numpy_gini(spark, sf_dir):
    out = (
        REGISTRY["ev20_gini"].spark(spark, sf_dir).toPandas()
        .set_index("event_type")
    )
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["cents"] = np.floor(e["value"].to_numpy() * 100 + 0.5).astype("int64")
    per_user = e.groupby(["event_type", "user_id"])["cents"].sum()
    for et, g in per_user.groupby(level=0):
        x = np.sort(g.to_numpy()).astype("float64")
        n = len(x)
        gini = (2 * np.arange(1, n + 1) @ x - (n + 1) * x.sum()) / (n * x.sum())
        assert out.loc[et, "n_users"] == n
        assert out.loc[et, "gini"] == pytest.approx(gini, abs=2e-6)
        assert 0 <= out.loc[et, "gini"] < 1


# --------------------------------------------------------------------- ml15


def test_ml15_pr_curve_matches_sklearn_free_sweep(spark, sf_dir):
    out = REGISTRY["ml15_pr_curve"].spark(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    y = (emb["label"].to_numpy() == 0)
    cent = X[y].mean(axis=0)
    cc = np.round(
        X @ cent / (np.linalg.norm(X, axis=1) * np.linalg.norm(cent)), 6
    )
    n_pos = int(y.sum())
    got = out.set_index("thr")
    for thr in np.unique(cc):
        pred = cc >= thr
        tp, fp = int((pred & y).sum()), int((pred & ~y).sum())
        assert got.loc[thr, "tp"] == tp
        assert got.loc[thr, "fp"] == fp
        assert got.loc[thr, "precision"] == pytest.approx(tp / (tp + fp), abs=2e-6)
        assert got.loc[thr, "f1"] == pytest.approx(
            2 * tp / (2 * tp + fp + (n_pos - tp)), abs=2e-6
        )
    # curve endpoints: loosest threshold has recall 1; monotone tp growth
    assert got.sort_index().iloc[0]["recall"] == pytest.approx(1.0)
    assert (got.sort_index(ascending=False)["tp"].diff().dropna() >= 0).all()
    # the tuned threshold must beat the trivial accept-all F1
    assert got["f1"].max() >= got.sort_index().iloc[0]["f1"]


# --------------------------------------------------------------------- st10


def test_st10_matches_pandas_lag_audit(spark, sf_dir):
    out = (
        REGISTRY["st10_out_of_order_audit"].spark(spark, sf_dir).toPandas()
        .set_index("event_type")
    )
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_id"]
    )
    e["d_us"] = (
        e.groupby("user_id")["ts"].diff().dt.total_seconds() * 1_000_000
    )
    d = e.dropna(subset=["d_us"])
    for et, g in d.groupby("event_type"):
        assert out.loc[et, "n_arrivals"] == len(g)
        assert out.loc[et, "n_regress"] == int((g["d_us"] < 0).sum())
        assert out.loc[et, "n_beyond_wm"] == int((g["d_us"] < -600e6).sum())
        neg = g.loc[g["d_us"] < 0, "d_us"]
        want_worst = int((-neg.min()) // 1e6) if len(neg) else 0
        assert out.loc[et, "worst_regress_s"] == want_worst
