"""Property-based operator tests (hypothesis): grouped_percentiles: for ANY grouped
float data, ANY percentile set, and ANY caller-supplied bounds — tight,
loose, partially covering, or entirely wrong — the operator must equal an
independent numpy model of quantile_cont interpolation (the same formula
Spark's percentile UDAF and DuckDB's quantile_cont implement). The bounds
parameter may only steer bucket balance, never results.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

_spark = None  # filled by the fixture-backed wrapper below


@st.composite
def percentile_case(draw):
    groups = draw(st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30))
    vals = [
        draw(st.floats(-1000, 1000, allow_nan=False, allow_infinity=False, width=32))
        for _ in groups
    ]
    ps = draw(
        st.lists(
            st.floats(0.0, 1.0, allow_nan=False).map(lambda p: round(p, 3)),
            min_size=1, max_size=3, unique=True,
        )
    )
    bounds = draw(
        st.one_of(
            st.none(),
            st.tuples(
                st.floats(-2000, 2000, allow_nan=False),
                st.floats(-2000, 2000, allow_nan=False),
            ).map(lambda t: (min(t), max(t))),  # equal bounds allowed: the
            # operator must fall back to the measured min/max, not shortcut
        )
    )
    return list(zip(groups, vals)), ps, bounds


def _model(rows, ps):
    """quantile_cont per group, independent of Spark/DuckDB: sort, rank
    (n-1)·p, linear interpolation, rounded like the operator (4 dp)."""
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(float(v))
    out = {}
    for g, vs in by_g.items():
        vs.sort()
        res = []
        for p in ps:
            rank = (len(vs) - 1) * p
            lo, hi = math.floor(rank), math.ceil(rank)
            v = vs[lo] + (rank - lo) * (vs[hi] - vs[lo])
            res.append(round(v, 4))
        out[g] = tuple(res)
    return out


@settings(max_examples=10, deadline=None)
@given(percentile_case())
def _check(case):
    from mdio_cpp_spark.operators.stats import grouped_percentiles

    rows, ps, bounds = case
    df = _spark.createDataFrame(rows, "g string, v double")
    names = [(p, f"p{i}") for i, p in enumerate(ps)]
    got = {
        r["g"]: tuple(r[f"p{i}"] for i in range(len(ps)))
        for r in grouped_percentiles(df, "g", "v", names, bounds=bounds).collect()
    }
    expect = _model(rows, ps)
    assert set(got) == set(expect)
    for g in expect:
        for a, b in zip(got[g], expect[g]):
            # both sides round to 4 dp; allow the final-ulp wobble of the
            # interpolation formula evaluated in different engines
            assert a is not None and abs(a - b) <= 1e-4, (g, got[g], expect[g], bounds)


def test_grouped_percentiles_matches_model(spark):
    global _spark
    _spark = spark
    _check()


def test_grouped_mad_fast_path_equals_fallback(spark):
    """grouped_mad's duplicate-collapsing driver walk and its distributed
    two-pass fallback must agree exactly — force the fallback by shrinking
    distinct_bound below the table's distinct count."""
    import random

    from mdio_cpp_spark.operators.stats import grouped_mad

    rng = random.Random(17)
    rows = [(g, float(rng.randint(0, 40)) / 4.0)
            for g in ("a", "b", "c") for _ in range(200)]
    rows += [("d", 7.25)]  # single-row group: med == value, mad == 0
    df = spark.createDataFrame(rows, "g string, v double")
    fast = {r["g"]: (r["med"], r["mad"])
            for r in grouped_mad(df, "g", "v").collect()}
    slow = {r["g"]: (r["med"], r["mad"])
            for r in grouped_mad(df, "g", "v", distinct_bound=5).collect()}
    assert fast == slow
    assert fast["d"] == (7.25, 0.0)
    # independent model for one group
    import statistics

    vs = sorted(v for g, v in rows if g == "a")
    med = statistics.median(vs)
    mad = statistics.median(sorted(abs(v - med) for v in vs))
    assert fast["a"] == (round(med, 4), round(mad, 4))


def test_grouped_percentiles_collapsed_caller_bounds(spark):
    """lo == hi caller bounds over a NON-constant column must not trigger
    the constant-column shortcut (which would return the group MAX as every
    percentile); the operator falls back to the measured min/max scan."""
    from mdio_cpp_spark.operators.stats import grouped_percentiles

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("a", 20.0), ("b", 4.0), ("b", 8.0)],
        "g string, v double",
    )
    for bad in [(5.0, 5.0), (7.0, 3.0)]:  # collapsed; reversed stays valid
        got = {
            r["g"]: (r["p50"], r["p100"])
            for r in grouped_percentiles(
                df, "g", "v", [(0.5, "p50"), (1.0, "p100")], bounds=bad
            ).collect()
        }
        assert got == {"a": (10.0, 20.0), "b": (6.0, 8.0)}, (bad, got)


# ---- sequence_packing vs an independent Python fold -------------------------

from hypothesis import given as _given, settings as _settings, strategies as _st


@_st.composite
def packing_case(draw):
    n = draw(_st.integers(0, 25))
    toks = [draw(_st.integers(0, 40)) for _ in range(n)]  # includes 0-token docs
    budget = draw(_st.sampled_from([1, 7, 32]))
    shards = draw(_st.sampled_from([1, 4]))
    return toks, budget, shards


def _packing_model(ids_toks, budget):
    """Shard-local greedy in id order, independent of Spark: running start
    offset; pack = start // budget (docs spill past boundaries)."""
    out, acc = {}, 0
    for i, t in ids_toks:  # caller pre-sorts by id within one shard
        out[i] = (acc, acc // budget)
        acc += t
    return out


@_settings(max_examples=10, deadline=None)
@_given(packing_case())
def _check_packing(case):
    import hashlib

    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.sampling import sequence_packing

    toks, budget, shards = case
    rows = [(i, t) for i, t in enumerate(toks)]
    df = _spark.createDataFrame(rows or [(None, None)], "doc_id long, n_tok long")
    if not rows:
        df = df.filter("doc_id IS NOT NULL")
    got = {
        r["doc_id"]: (r["shard"], r["start_off"], r["pack_id"])
        for r in sequence_packing(df, "doc_id", F.col("n_tok"), budget=budget,
                                  n_shards=shards).collect()
    }
    # independent shard assignment: first 4 md5 hex digits mod n_shards
    by_shard: dict = {}
    for i, t in rows:
        s = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % shards
        by_shard.setdefault(s, []).append((i, t))
    expect = {}
    for s, items in by_shard.items():
        model = _packing_model(sorted(items), budget)
        for i, (off, pack) in model.items():
            expect[i] = (s, off, pack)
    assert got == expect


def test_sequence_packing_matches_model(spark):
    global _spark
    _spark = spark
    _check_packing()


def test_dft_fixed_point_headroom():
    """The spectral queries' overflow analysis as an executable invariant:
    with cents ≤ 10^8 per cell and the committed quantizations, every
    intermediate stays inside int64 — forward dot products, the rescaled
    coefficients, and the inverse synthesis products."""
    from mdio_cpp_spark.plans.zarr_queries import (
        GRID_C, _BP_BAND, _bp_itrig_rows, _dft_trig_rows,
    )

    max_cents = 10**8
    fwd = _dft_trig_rows()
    assert len(fwd) == 8 * GRID_C
    max_q = max(max(abs(cq), abs(sq)) for _, _, cq, sq in fwd)
    assert max_q <= 1_000_000
    # forward: |Σ c·q| ≤ cells · cents · quant
    fwd_bound = GRID_C * max_cents * max_q
    assert fwd_bound < 2**63 - 1
    # rescale: // 1e6 back to ~cents·cells
    scaled_bound = fwd_bound // 1_000_000
    inv = _bp_itrig_rows()
    assert {k for k, *_ in inv} == set(_BP_BAND)
    max_iq = max(max(abs(c2), abs(s2)) for _, _, c2, s2 in inv)
    assert max_iq <= 1000
    # inverse: |Σ_band (re_s·c2 − im_s·s2)| ≤ |band| · scaled · 2·quant
    inv_bound = len(_BP_BAND) * scaled_bound * 2 * max_iq
    assert inv_bound < 2**63 - 1, inv_bound


@_settings(max_examples=10, deadline=None)
@_given(_st.lists(_st.integers(-10**9, 10**9), unique=True, min_size=1, max_size=40))
def _check_hash_fraction(ids):
    import hashlib

    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.sampling import hash_fraction

    df = _spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r["id"]: r["h"] for r in df.select("id", hash_fraction(F.col("id")).alias("h")).collect()}
    expect = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:3], 16) for i in ids}
    assert got == expect


def test_hash_fraction_matches_hashlib(spark):
    """Every split/sample/shard decision in the engine reduces to
    hash_fraction's md5 prefix — pin it against an independent hashlib
    model (including negative ids, whose string form is what's hashed)."""
    global _spark
    _spark = spark
    _check_hash_fraction()


@_settings(max_examples=10, deadline=None)
@_given(_st.lists(_st.text(
    alphabet=_st.sampled_from(list("abz019 .,!-_ÄéΩ")), max_size=40), min_size=1, max_size=8))
def _check_tokens(texts):
    import re

    from pyspark.sql import functions as F

    from mdio_cpp_spark.functions import text as T

    df = _spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: (r["w"], r["sh"]) for r in df.select(
        "i", T.tokens(F.col("t")).alias("w"),
        T.word_shingles(T.tokens(F.col("t")), 2).alias("sh")).collect()}
    for i, t in enumerate(texts):
        # the engine contract: lowercase, split on [^a-z0-9]+, drop empties
        # (non-latin letters are separators by design — the corpus is ascii)
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        shingles = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        assert got[i][0] == toks, (t, got[i][0], toks)
        assert got[i][1] == shingles, (t, got[i][1], shingles)


def test_tokens_match_re_model(spark):
    """tokens/word_shingles pinned to an independent Python re model —
    every dedup signature and text metric starts from this split."""
    global _spark
    _spark = spark
    _check_tokens()


@_settings(max_examples=10, deadline=None)
@_given(_st.lists(_st.tuples(
    _st.lists(_st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
              min_size=4, max_size=4),
    _st.lists(_st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
              min_size=4, max_size=4)), min_size=1, max_size=12))
def _check_cosine(pairs):
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from mdio_cpp_spark.functions import vectors

    rows = [(i, [float(x) for x in a], [float(x) for x in b])
            for i, (a, b) in enumerate(pairs)]
    df = _spark.createDataFrame(rows, "i long, a array<float>, b array<float>")
    got = {r["i"]: r["c"] for r in df.select(
        "i", vectors.cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    for i, a, b in rows:
        # inputs truncate to float32 (the column type) but ALL arithmetic
        # runs in float64 — norms must not underflow at float32 (subnormal
        # components are still nonzero vectors to the engine)
        a32 = np.asarray(a, np.float32).astype(np.float64)
        b32 = np.asarray(b, np.float32).astype(np.float64)
        na, nb = float(np.linalg.norm(a32)), float(np.linalg.norm(b32))
        if na == 0.0 or nb == 0.0:
            assert got[i] is None or (got[i] != got[i])  # null/NaN, never a crash
        else:
            want = float(np.dot(a32, b32)) / (na * nb)
            assert got[i] is not None and math.isfinite(got[i])
            assert abs(got[i] - want) <= 1e-5, (i, got[i], want)


def test_cosine_matches_numpy(spark):
    """vectors.cosine pinned to a numpy model at float32 input precision —
    zero-norm vectors degrade to null/NaN, never an ANSI divide error."""
    global _spark
    _spark = spark
    _check_cosine()


def test_grouped_mad_fallback_honors_round_to(spark):
    """round_to > 4 must survive the distributed fallback: the inner
    grouped_percentiles calls run at higher internal precision so the outer
    round is the ONLY rounding (ADVICE r6 — the fallback used to round the
    inner median to 4 dp first and disagree with the driver fast path)."""
    from mdio_cpp_spark.operators.stats import grouped_mad

    rows = [("a", i / 64.0) for i in range(33)]  # median 16/64 = 0.25 exactly,
    # but quartile-ish deviations land on 6-dp-relevant values
    rows += [("a", 0.015625)]
    df = spark.createDataFrame(rows, "g string, v double")
    fast = {r["g"]: (r["med"], r["mad"])
            for r in grouped_mad(df, "g", "v", round_to=6).collect()}
    slow = {r["g"]: (r["med"], r["mad"])
            for r in grouped_mad(df, "g", "v", round_to=6, distinct_bound=5).collect()}
    assert fast == slow


def _wmed_model(rows):
    """Brute-force lower weighted median per group: smallest v with
    2*cumweight >= totalweight."""
    by_g: dict = {}
    for g, v, w in rows:
        by_g.setdefault(g, []).append((v, w))
    out = {}
    for g, vw in by_g.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        acc = 0
        for v, w in vw:
            acc += w
            if 2 * acc >= tot:
                out[g] = v
                break
    return out


def test_grouped_weighted_median_lower_matches_model(spark):
    """Bucketized crossing search == brute force on mixed-shape groups:
    ties at the crossing, single-row groups, heavy single-value mass,
    negative values spanning bucket boundaries."""
    import random

    from mdio_cpp_spark.operators.stats import grouped_weighted_median_lower

    rng = random.Random(31)
    rows = [(g, rng.randint(-500, 500), rng.randint(1, 9))
            for g in ("a", "b", "c") for _ in range(400)]
    rows += [("d", 42, 3)]                      # single row
    rows += [("e", 7, 1000), ("e", 8, 1)]       # one value owns the mass
    rows += [("f", 1, 1), ("f", 2, 1)]          # exact 2*cw == tw tie at v=1
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {r["g"]: r["__wmed"]
           for r in grouped_weighted_median_lower(df, "g", "v", "w").collect()}
    assert got == _wmed_model(rows)
    assert got["f"] == 1  # the >= crossing rule takes the LOWER tie


def test_grouped_weighted_median_lower_fast_equals_fallback(spark, monkeypatch):
    """Force the lattice fallback by zeroing the driver bound; both tiers
    must agree exactly."""
    import random

    from mdio_cpp_spark.operators import stats

    rng = random.Random(32)
    rows = [(g, rng.randint(0, 100), rng.randint(1, 4))
            for g in ("a", "b") for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    fast = {r["g"]: r["__wmed"]
            for r in stats.grouped_weighted_median_lower(df, "g", "v", "w").collect()}
    monkeypatch.setattr(stats, "_DRIVER_META_BOUND", 0)
    slow = {r["g"]: r["__wmed"]
            for r in stats.grouped_weighted_median_lower(df, "g", "v", "w").collect()}
    assert fast == slow == _wmed_model(rows)


def _trim_model(rows, num, den):
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = {}
    for g, vs in by_g.items():
        vs.sort()
        n, s = len(vs), sum(vs)
        k = n * num // den
        out[g] = (n, s, k, sum(vs[:k]), sum(vs[n - k:]) if k else 0)
    return out


def test_grouped_trimmed_sums_matches_model(spark):
    """Bucketized tail sums == brute force: tie runs straddling the cut
    rank, k=0 small groups, negative values, duplicate-heavy groups."""
    import random

    from mdio_cpp_spark.operators.stats import grouped_trimmed_sums

    rng = random.Random(33)
    rows = [(g, rng.randint(-50, 50)) for g in ("a", "b") for _ in range(500)]
    rows += [("c", 5)] * 97          # one value only; k=9 trims ties
    rows += [("d", 3), ("d", 9)]     # n=2 -> k=0: nothing trimmed
    rows += [("e", v) for v in (1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: (r["__n"], r["__s"], r["__k"], r["__cut_lo"], r["__cut_hi"])
           for r in grouped_trimmed_sums(df, "g", "v", 1, 10).collect()}
    assert got == _trim_model(rows, 1, 10)


def test_grouped_trimmed_sums_fast_equals_fallback(spark, monkeypatch):
    import random

    from mdio_cpp_spark.operators import stats

    rng = random.Random(34)
    rows = [(g, rng.randint(0, 1000)) for g in ("a", "b", "c") for _ in range(400)]
    rows += [("d", 8)]  # single row, k=0
    df = spark.createDataFrame(rows, "g string, v long")
    fast = {r["g"]: (r["__n"], r["__s"], r["__k"], r["__cut_lo"], r["__cut_hi"])
            for r in stats.grouped_trimmed_sums(df, "g", "v", 1, 10).collect()}
    monkeypatch.setattr(stats, "_DRIVER_META_BOUND", 0)
    slow = {r["g"]: (r["__n"], r["__s"], r["__k"], r["__cut_lo"], r["__cut_hi"])
            for r in stats.grouped_trimmed_sums(df, "g", "v", 1, 10).collect()}
    assert fast == slow == _trim_model(rows, 1, 10)


def test_bucketized_rank_ops_constant_and_empty(spark):
    """The pre-bucket short-circuits: constant column (vmin == vmax) and
    empty input must stay exact without entering the bucket machinery."""
    from mdio_cpp_spark.operators.stats import (
        grouped_trimmed_sums,
        grouped_weighted_median_lower,
    )

    const = spark.createDataFrame(
        [("a", 7, 2)] * 25 + [("b", 7, 1)] * 3, "g string, v long, w long"
    )
    got = {r["g"]: r["__wmed"]
           for r in grouped_weighted_median_lower(const, "g", "v", "w").collect()}
    assert got == {"a": 7, "b": 7}
    gt = {r["g"]: (r["__n"], r["__s"], r["__k"], r["__cut_lo"], r["__cut_hi"])
          for r in grouped_trimmed_sums(const.select("g", "v"), "g", "v", 1, 10).collect()}
    assert gt == {"a": (25, 175, 2, 14, 14), "b": (3, 21, 0, 0, 0)}
    empty = spark.createDataFrame([], "g string, v long, w long")
    assert grouped_weighted_median_lower(empty, "g", "v", "w").collect() == []
    assert grouped_trimmed_sums(empty.select("g", "v"), "g", "v", 1, 10).collect() == []
