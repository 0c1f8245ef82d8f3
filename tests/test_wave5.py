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
