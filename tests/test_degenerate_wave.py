"""Degenerate-input hardening for the round-8 wave queries, run END TO END
through the registry against a crafted tiny sf_dir: empty documents,
punctuation-only text, single-word docs (no bigrams), a target language
absent from the corpus, single-purchase users, and an all-duplicate window.
Under Spark 4's ANSI mode a missed guard aborts the whole job — these pin
graceful degradation at the query level, not just the operator level."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mdio_cpp_spark.plans import REGISTRY


@pytest.fixture(scope="module")
def weird_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("weird_sf")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "",                       # empty — zero tokens
                "!!! ??? ...",            # punctuation only — zero tokens
                "one",                    # single word — no bigrams
                "a b. c d! e f?",         # normal, multi-sentence
                "lorem ipsum { dolor sit amet consectetur.",
                "the quick brown fox jumps over the lazy dog.",
            ],
            "lang": ["zh", "zh", "de", "de", "fr", "fr"],  # NO 'en' anywhere
            "source": ["s0", "s0", "s1", "s1", "s2", "s2"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(d / "documents.parquet")
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [10, 10, 20],
            "event_type": ["purchase", "purchase", "purchase"],
            "ts": pd.to_datetime(
                ["2024-01-02 08:00:00", "2024-01-05 09:30:00", "2024-01-01 06:00:00"]
            ),
            "value": [10.0, 20.0, 30.0],
            "props": ['{"k": 1}'] * 3,
        }
    )
    ev.to_parquet(d / "events.parquet")
    return str(d)


def test_text_wave_survives_empty_and_tokenless_docs(spark, weird_sf):
    # t30: empty/punct-only docs must flag as short, never divide by zero
    t30 = REGISTRY["t30_c4_filters"].spark(spark, weird_sf).toPandas()
    assert t30.set_index("source").loc["s0", "n_short"] == 2
    assert t30.set_index("source").loc["s2", "n_lorem"] == 1
    # t32: tokenless docs drop out; the single-word doc still scores
    t32 = REGISTRY["t32_flesch"].spark(spark, weird_sf).toPandas()
    assert set(t32["doc_id"]) == {3, 4, 5, 6}
    assert (t32[t32["doc_id"] == 3]["n_words"] == 1).all()
    # t31/p21: only docs with >= 2 tokens participate; no ANSI abort
    t31 = REGISTRY["t31_kneser_ney"].spark(spark, weird_sf).toPandas()
    assert set(t31["doc_id"]) <= {4, 5, 6}
    assert (t31["avg_kn_surprisal"] >= 0).all()
    p21 = REGISTRY["p21_perplexity_buckets"].spark(spark, weird_sf).toPandas()
    assert (p21["n_docs"] >= 1).all()


def test_p20_dsir_with_absent_target_language(spark, weird_sf):
    """No document matches the target distribution: every bucket's target
    count is 0, Laplace smoothing keeps the model finite, and the ranking
    still returns (uniform-ish weights, ties broken by doc_id)."""
    out = REGISTRY["p20_dsir_resample"].spark(spark, weird_sf).toPandas()
    assert len(out) == 4  # docs with >= 1 token
    assert out["logw"].notna().all()


def test_ev19_km_single_purchase_users(spark, weird_sf):
    """One user's span is 73 hours, the other's is a single instant (t=0)
    99 hours before the horizon — a churn event, not censored; survival
    stays in (0, 1] with no division hazard."""
    out = REGISTRY["ev19_survival_km"].spark(spark, weird_sf).toPandas()
    assert (out["n_risk"] >= 1).all()
    assert ((out["survival"] > 0) & (out["survival"] <= 1)).all()
    t0 = out[out["t"] == 0]
    assert len(t0) == 1 and int(t0["d_churn"].iloc[0]) == 1


def test_w18_ewma_single_day_series(spark, weird_sf):
    """Each type has <= 3 observation days; the banded self-join and the
    shift weights must handle a 1..3-row partition without pow or overflow."""
    out = REGISTRY["w18_ewma"].spark(spark, weird_sf).toPandas()
    assert len(out) == 3  # three distinct purchase days
    # first observation of a series is its own EWMA
    first_day = out.sort_values("day").iloc[0]
    assert first_day["ewma"] == pytest.approx(30.0, abs=1e-4)


def test_u09_all_files_small_or_all_large(spark, weird_sf):
    """Every crafted doc is far below the 1500-byte cutoff: the plan must
    be pure compaction groups (no passthrough), conserving files."""
    out = REGISTRY["u09_compaction_plan"].spark(spark, weird_sf).toPandas()
    assert (out["kind"] == "compact").all()
    assert out["n_files"].sum() == 6


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    """Second crafted dir: full-churn survival tail, one-order lineitem
    (single fold), three-row orders (zero-draw bootstrap replicates are
    plausible at n=3)."""
    d = tmp_path_factory.mktemp("tiny_sf")
    # every user's last purchase sits > 48h before the horizon => at the
    # final duration ALL remaining at-risk users churn (hazard = 1)
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [10, 10, 20],
            "event_type": ["purchase"] * 3,
            "ts": pd.to_datetime(
                ["2024-01-01 00:10:00", "2024-01-02 00:10:00",
                 "2024-01-01 01:00:00"]
            ),
            "value": [10.0, 20.0, 30.0],
            "props": ['{"k": 1}'] * 3,
        }
    )
    # horizon extender: another user's purchase far later, itself censored
    ev = pd.concat(
        [ev, pd.DataFrame({
            "event_id": [4], "user_id": [99], "event_type": ["purchase"],
            "ts": pd.to_datetime(["2024-01-20 00:00:00"]),
            "value": [5.0], "props": ['{"k": 1}'],
        })],
        ignore_index=True,
    )
    ev.to_parquet(d / "events.parquet")
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 2],
            "o_orderstatus": ["F", "O", "F"],
            "o_totalprice": [100.0, 200.0, 300.0],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    orders.to_parquet(d / "orders.parquet")
    li = pd.DataFrame(
        {
            "l_orderkey": [7, 7],  # ONE order -> every row in one fold
            "l_linenumber": [1, 2],
            "l_suppkey": [1, 2],
            "l_quantity": [5.0, 10.0],
            "l_discount": [0.05, 0.1],
            "l_extendedprice": [500.0, 1000.0],
            "l_returnflag": ["N", "N"],
        }
    )
    li.to_parquet(d / "lineitem.parquet")
    return str(d)


def test_ev19_full_churn_tail_snaps_survival_to_zero(spark, tiny_sf):
    """hazard = 1 at the last non-censored duration: Spark's log(0) is
    NULL and DuckDB's is -inf — the shared 1e-12 clamp makes both snap
    survival to 0.0 instead of diverging."""
    out = REGISTRY["ev19_survival_km"].spark(spark, tiny_sf).toPandas()
    full = out[out["hazard"] == 1.0]
    assert len(full) >= 1
    last = out.sort_values("t").iloc[-2]  # t=24h row (churn of user 10)
    assert out.sort_values("t")["survival"].iloc[-2] == 0.0 or (
        full["survival"] == 0.0
    ).all()


def test_ml13_single_fold_corpus_returns_empty_not_div0(spark, tiny_sf):
    out = REGISTRY["ml13_ridge_cv"].spark(spark, tiny_sf).toPandas()
    # one order -> one fold -> training stats would be empty; the fold is
    # dropped instead of dividing by zero
    assert len(out) == 0


def test_s12_bootstrap_tiny_corpus_no_div0(spark, tiny_sf):
    out = REGISTRY["s12_poisson_bootstrap"].spark(spark, tiny_sf).toPandas()
    assert len(out) == 32
    # zero-draw replicates (all three orders at k=0) surface as NULL means,
    # never as an ANSI abort; any non-null mean is a valid resample mean
    nn = out["boot_mean"].dropna()
    assert ((nn >= 100.0 - 1e-6) & (nn <= 300.0 + 1e-6)).all()


@pytest.fixture(scope="module")
def ties_sf(tmp_path_factory):
    """Adversarial tie mass: 40 orders, HALF of them at the exact same
    total, arranged so the trim cut rank k lands INSIDE the tied run —
    the case a percentile-then-filter trimmed mean silently gets wrong
    and a19's (k - below)·v partial-tie correction must get right. The
    same values drive ev20's tie-safe rank sums."""
    d = tmp_path_factory.mktemp("ties_sf")
    vals = [50.0] * 3 + [100.0] * 20 + [150.0] * 14 + [9000.0] * 3
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, len(vals) + 1),
            "o_custkey": [1] * len(vals),
            "o_orderstatus": ["F"] * len(vals),
            "o_totalprice": vals,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * len(vals)),
            "o_orderpriority": ["1-URGENT"] * len(vals),
        }
    )
    orders.to_parquet(d / "orders.parquet")
    ev = pd.DataFrame(
        {
            "event_id": range(1, len(vals) + 1),
            "user_id": range(1, len(vals) + 1),  # one user per value
            "event_type": ["purchase"] * len(vals),
            "ts": pd.to_datetime(["2024-01-05 10:00:00"] * len(vals)),
            "value": vals,
            "props": ['{"k": 1}'] * len(vals),
        }
    )
    ev.to_parquet(d / "events.parquet")
    return str(d)


def test_a19_partial_tie_correction_exact(spark, ties_sf):
    """n=40, k=4: the low cut removes the three 50s plus exactly ONE of
    the twenty tied 100s; the high cut removes the three 9000s plus ONE
    150. Python oracle by literal sort-and-slice."""
    out = REGISTRY["a19_trimmed_mean"].spark(spark, ties_sf).toPandas()
    vals = sorted([50.0] * 3 + [100.0] * 20 + [150.0] * 14 + [9000.0] * 3)
    k = len(vals) // 10
    want = sum(vals[k:-k]) / (len(vals) - 2 * k)
    assert len(out) == 1
    assert out.iloc[0]["k_trim"] == k
    assert out.iloc[0]["trimmed_mean"] == pytest.approx(want, abs=1e-4)
    # the outlier-resistance this operator exists for: the 9000s moved the
    # plain mean far above every typical value; the trimmed mean ignores them
    assert out.iloc[0]["plain_mean"] > 700
    assert out.iloc[0]["trimmed_mean"] < 130


def test_ev20_gini_with_mass_ties(spark, ties_sf):
    out = REGISTRY["ev20_gini"].spark(spark, ties_sf).toPandas()
    x = np.sort(np.array([50.0] * 3 + [100.0] * 20 + [150.0] * 14 + [9000.0] * 3) * 100)
    n = len(x)
    want = (2 * np.arange(1, n + 1) @ x - (n + 1) * x.sum()) / (n * x.sum())
    assert len(out) == 1
    assert out.iloc[0]["n_users"] == n
    assert out.iloc[0]["gini"] == pytest.approx(want, abs=2e-6)


@pytest.fixture(scope="module")
def zero_mass_sf(tmp_path_factory):
    """The ADVICE-r8 degenerate pair: an event type whose per-user revenue
    sums to ZERO (views priced at 0.0 — s = 0, the gini denominator), and
    an embeddings corpus where ONE label owns every vector (n_neg = 0, the
    AUC denominator). Under ANSI mode an unguarded divide aborts the job;
    the contract is NULL for the degenerate group, real values elsewhere."""
    d = tmp_path_factory.mktemp("zero_mass_sf")
    ev = pd.DataFrame(
        {
            "event_id": range(1, 7),
            "user_id": [10, 20, 30, 10, 20, 30],
            "event_type": ["view"] * 3 + ["purchase"] * 3,
            "ts": pd.to_datetime(["2024-01-02 08:00:00"] * 6),
            "value": [0.0, 0.0, 0.0, 10.0, 20.0, 70.0],
            "props": ['{"k": 1}'] * 6,
        }
    )
    ev.to_parquet(d / "events.parquet")
    rng = np.random.default_rng(7)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(1, 9, dtype="int64"),
            "embedding": [rng.normal(size=4).astype("float32") for _ in range(8)],
            "label": np.full(8, 3, dtype="int32"),  # one class owns ALL vectors
        }
    )
    emb.to_parquet(d / "embeddings.parquet")
    return str(d)


def test_ev20_gini_zero_revenue_type_is_null_not_div0(spark, zero_mass_sf):
    out = REGISTRY["ev20_gini"].spark(spark, zero_mass_sf).toPandas()
    byt = out.set_index("event_type")
    assert pd.isna(byt.loc["view", "gini"])          # s = 0 → NULL, no abort
    assert byt.loc["view", "n_users"] == 3
    # the non-degenerate group still computes the exact tie-safe Gini
    x = np.sort(np.array([10.0, 20.0, 70.0]) * 100)
    n = len(x)
    want = (2 * np.arange(1, n + 1) @ x - (n + 1) * x.sum()) / (n * x.sum())
    assert byt.loc["purchase", "gini"] == pytest.approx(want, abs=2e-6)


def test_ml12_auc_single_class_corpus_is_null_not_div0(spark, zero_mass_sf):
    out = REGISTRY["ml12_auc"].spark(spark, zero_mass_sf).toPandas()
    assert len(out) == 1 and out.iloc[0]["class"] == 3
    assert out.iloc[0]["n_pos"] == 8 and out.iloc[0]["n_neg"] == 0
    assert pd.isna(out.iloc[0]["auc"])               # n_neg = 0 → NULL, no abort
