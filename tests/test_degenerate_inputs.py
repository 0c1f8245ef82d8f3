"""Degenerate-input hardening: Spark 4 runs ANSI mode by default, where a
bare division by zero aborts the whole job — these pin that zero-norm
vectors, NaN embeddings, empty documents, NULL strata, and non-0-based ids
degrade gracefully instead of crashing or silently corrupting results."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mdio_cpp_spark.functions import text
from mdio_cpp_spark.operators import dedup, sampling, similarity, skew


def test_cosine_zero_and_nan_vectors_rank_last(spark):
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0] * 4),
            (2, [float("nan")] * 4), (3, [0.5, 0.5, 0.0, 0.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(corpus, corpus.limit(2), "vec_id", "embedding", k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    # query 0 (a real vector): the real match ranks first with a real cosine;
    # the zero/NaN vectors produce NULL similarity and sort behind it
    top = min(by_q[0], key=lambda r: r["rk"])
    assert top["vec_id"] == 3 and top["cos"] is not None
    assert all(r["cos"] is None for r in by_q[0] if r["vec_id"] in (1, 2))


def test_quality_score_empty_and_punct_only_docs(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "!!!")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["q"] for r in
           docs.select("doc_id", text.quality_score("text").alias("q")).collect()}
    assert got[1] > 0.0 and got[2] == 0.0 and got[3] == 0.0


def test_ngram_jaccard_empty_sets(spark):
    df = spark.createDataFrame([(1,)], "i long").select(
        dedup.ngram_jaccard(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("j")
    )
    assert df.collect()[0]["j"] == 1.0


def test_ivf_with_non_zero_based_ids(spark):
    # two vectors per direction so every cell holds a real neighbor
    rows = [(1000 + i, [float(i % 4 == j) for j in range(4)]) for i in range(8)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ivf_topk(corpus, corpus.limit(1), "vec_id", "embedding",
                              n_cells=4, k=2).collect()
    assert out and out[0]["vec_id"] == 1004, "non-0-based ids must still yield centroids"


def test_duplicate_clusters_string_ids(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_bilinear_interp_partial_coverage_is_null(spark):
    from mdio_cpp_spark.operators.interp import bilinear_interp

    grid = spark.createDataFrame(
        [(r, c, 10.0 * r + c) for r in range(2) for c in range(2)],
        "row long, col long, v double",
    )
    targets = spark.createDataFrame(
        [(0, 0.5, 0.5),   # interior: all 4 corners
         (1, 0.5, 1.5),   # right corners missing (nonzero weight) -> NULL
         (2, 1.0, 1.0)],  # integer coords on the far corner: weight-0 misses OK
        "t long, ry double, cx double",
    ).select("t", F.col("ry").alias("y"), F.col("cx").alias("x"))
    out = {r["t"]: r["val"] for r in
           bilinear_interp(grid, targets, id_col="t", y_col="y", x_col="x",
                           row_col="row", col_col="col", val_col="v").collect()}
    assert out[0] is not None and math.isclose(out[0], 5.5)
    assert out[1] is None, "missing nonzero-weight corners must null, not partial-sum"
    assert out[2] == 11.0


def test_temperature_resample_null_stratum_passthrough(spark):
    rows = [(i, "big") for i in range(400)] + [(1000 + i, None) for i in range(5)]
    rows += [(2000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, s string")
    rates = {r["s"]: r["rate"] for r in sampling.temperature_rates(df, "s").collect()}
    assert None not in rates, "NULL stratum must not get a rate row"
    assert rates["small"] == 1.0, "n_min comes from the smallest REAL stratum"
    out = sampling.temperature_resample(df, "id", "s")
    null_rows = out.filter(F.col("s").isNull()).count()
    assert null_rows == 5, "untagged rows pass through at rate 1"


def test_salted_join_rejects_outer_hows(spark):
    a = spark.createDataFrame([(1, "x")], "k long, p string")
    b = spark.createDataFrame([(1, "y")], "k long, q string")
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(a, b, on=["k"], how="full")
    with pytest.raises(ValueError, match="at least one column"):
        skew.with_salt(a.select("k"), 8, cols=[])


def test_lsh_pipeline_with_empty_and_short_docs(spark):
    """Empty/one-token docs flow through shingling + MinHash + banding
    without crashing and without producing spurious candidate pairs."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and then ran away quickly home"),
         (2, ""), (3, "one"), (4, "two words"),
         (5, "the cat sat on the mat and then ran away quickly home")],
        "doc_id long, text string",
    )
    pairs = dedup.lsh_candidate_pairs(docs, "doc_id", "text").collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 5)]


def test_radius_join_empty_and_degenerate_vectors(spark):
    corpus = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.radius_join(corpus, "vec_id", "embedding", dim=4, threshold=0.5).count() == 0
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["q_id"], r["vec_id"]) for r in
           similarity.radius_join(corpus, "vec_id", "embedding", dim=4, threshold=0.9).collect()}
    # zero-norm vector yields NULL cosine → never passes the threshold
    assert got == {(0, 2), (2, 0)}


def test_asof_forward_empty_right(spark):
    from mdio_cpp_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100)], "id long, t long").select(
        "id", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame([], "rts timestamp, v double")
    out = asof_join(left, right, "ts", "rts", ["v"], how="left", direction="forward")
    assert [(r["id"], r["v"]) for r in out.collect()] == [(1, None)]
    assert asof_join(left, right, "ts", "rts", ["v"], how="inner",
                     direction="forward").count() == 0


def test_fill_gaps_all_null_and_empty(spark):
    from mdio_cpp_spark.operators.gapfill import fill_gaps

    empty = spark.createDataFrame([], "i long, v double")
    assert fill_gaps(empty, "i", "v").count() == 0
    allnull = spark.createDataFrame([(0, None), (1, None)], "i long, v double")
    got = [r["v"] for r in fill_gaps(allnull, "i", "v").collect()]
    assert got == [None, None]


def test_scan_arrays_empty_selection_and_fill_only(spark, tmp_path):
    import numpy as np

    from mdio_cpp_spark.sources.reader import scan_arrays
    from mdio_cpp_spark.sources.zarr_store import ZarrStore

    root = str(tmp_path / "dg.zarr")
    st = ZarrStore.create(root, version=2)
    st.create_array("a", shape=(100,), chunks=(32,), dtype="float64", dims=("i",), fill=1.5)
    st.create_array("b", shape=(100,), chunks=(32,), dtype="int64", dims=("i",), fill=7)
    st.consolidate()
    # empty selection → schema-correct zero rows
    out = scan_arrays(spark, root, {"a": "a", "b": "b"}, ranges={"i": (50, 50)})
    assert out.columns == ["i", "a", "b"] and out.count() == 0
    # entirely fill-only store → pure fill synthesis, no bytes read
    rows = scan_arrays(spark, root, {"a": "a", "b": "b"}, ranges={"i": (0, 3)}).collect()
    assert sorted((r["i"], r["a"], r["b"]) for r in rows) == [
        (0, 1.5, 7), (1, 1.5, 7), (2, 1.5, 7)
    ]


def test_transcode_empty_and_all_fill_store(spark, tmp_path):
    import numpy as np

    from mdio_cpp_spark.sources.zarr_store import ZarrStore
    from mdio_cpp_spark.utils.transcode import transcode_array

    src = str(tmp_path / "tsrc.zarr")
    st = ZarrStore.create(src, version=2)
    st.create_array("v", shape=(100,), chunks=(10,), dtype="float64", dims=("i",), fill=0.0)
    st.consolidate()  # nothing ever written: all chunks fill-only
    dst = str(tmp_path / "tdst.zarr")
    report = transcode_array(spark, src, dst, "v", {"id": "zlib", "level": 1})
    assert report == {"chunks_total": 10, "chunks_copied": 0}
    got = ZarrStore.open(dst).read_array("v")
    assert (got == 0.0).all()


def test_priority_sample_zero_weight_excluded(spark):
    """s10's u/w key divides by the weight: zero-weight rows must be
    filtered (the declared query guards n_chars > 0), and the helper
    expression itself must not abort under ANSI when the caller filters
    first."""
    rows = [(0, 10), (1, 0), (2, 5)]
    d = spark.createDataFrame(rows, "doc_id long, n_chars long").filter(F.col("n_chars") > 0)
    u = F.conv(F.substring(F.md5(F.concat(F.lit("s"), F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    out = d.select("doc_id", (u.cast("double") / F.col("n_chars")).alias("pk")).collect()
    assert {r["doc_id"] for r in out} == {0, 2}
    assert all(math.isfinite(r["pk"]) for r in out)


def test_pq_assign_zero_subvector_ranks_last(spark):
    """A zero subvector's cosine is NULL (guarded division) — max_by must
    still pick a real centroid for the healthy subspaces and not crash on
    the degenerate one."""
    rows = [(i, [float(i + 1)] * 8) for i in range(4)] + [(9, [0.0] * 8)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from mdio_cpp_spark.functions import vectors

    subs = e.select(
        "vec_id",
        F.explode(F.array(*[F.lit(s).cast("long") for s in range(2)])).alias("s"),
        "embedding",
    ).select("vec_id", "s", F.slice("embedding", F.col("s").cast("int") * 4 + 1, 4).alias("sv"))
    cents = F.broadcast(
        subs.filter(F.col("vec_id") < 2).select("s", F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
    )
    scored = subs.join(cents, "s").select(
        "vec_id", "s", "cid", F.round(vectors.cosine(F.col("sv"), F.col("cv")), 6).alias("cc")
    )
    codes = scored.groupBy("vec_id", "s").agg(
        F.max_by("cid", F.struct(F.col("cc"), F.col("cid"))).alias("code")
    )
    got = {(r["vec_id"], r["s"]): r["code"] for r in codes.collect()}
    # healthy vectors pick a real code on every subspace; the zero vector
    # still yields a row per subspace (NULL cc ranks last, code is whatever
    # max_by resolves — must not be an error)
    assert all((v, s) in got for v in (0, 1, 2, 3, 9) for s in (0, 1))


def test_ewma_isolated_day_self_normalizes(spark):
    """ts02's dyadic ladder: a day with NO preceding activity must get
    ewma == its own value (weight mass renormalizes to the present day
    alone), not a decayed fraction."""
    rows = [("a", 100, 200)]
    d = spark.createDataFrame(rows, "event_type string, day long, x long")
    ladder = F.explode(
        F.array(*[F.struct(F.lit(l).cast("long").alias("lag"), F.lit(1 << (7 - l)).cast("long").alias("w")) for l in range(8)])
    ).alias("lw")
    f = d.select("event_type", "day", "x", ladder).select(
        "event_type", (F.col("day") + F.col("lw.lag")).alias("tday"),
        (F.col("x") * F.col("lw.w")).alias("wx"), F.col("lw.w").alias("w"),
    )
    g = f.groupBy("event_type", "tday").agg(F.sum("wx").alias("num"), F.sum("w").alias("den"))
    got = g.join(d.select("event_type", F.col("day").alias("tday")), ["event_type", "tday"]).collect()
    assert len(got) == 1 and got[0]["num"] / got[0]["den"] == 200.0


def _mini_events(spark, tmp_path, rows):
    """A minimal events.parquet a declared query can read via catalog.table."""
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value",
        F.lit('{"k": 1}').alias("props"),
    )
    d = str(tmp_path / "sf_mini")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_ev16_point_intervals_excluded_and_exact(spark, tmp_path):
    """ev16's sweep: single-event user-days are degenerate POINT intervals —
    excluded on both paths by contract — and the remaining overlap math must
    match a brute-force Python model."""
    from mdio_cpp_spark.plans import REGISTRY

    rows = [
        # day 0: u1 [00:10, 01:10], u2 [00:40, 02:00] -> overlap 30 min
        (0, "2024-01-01 00:10:00", 1, "click", 1.0),
        (1, "2024-01-01 01:10:00", 1, "click", 1.0),
        (2, "2024-01-01 00:40:00", 2, "view", 1.0),
        (3, "2024-01-01 02:00:00", 2, "view", 1.0),
        # u3: ONE event inside u1's interval — a point interval, excluded
        (4, "2024-01-01 00:30:00", 3, "view", 1.0),
        # day 1: two users, intervals touch end-to-start -> NOT an overlap
        (5, "2024-01-02 03:00:00", 1, "click", 1.0),
        (6, "2024-01-02 04:00:00", 1, "click", 1.0),
        (7, "2024-01-02 04:00:01", 2, "view", 1.0),
        (8, "2024-01-02 05:00:00", 2, "view", 1.0),
    ]
    d = _mini_events(spark, tmp_path, rows)
    got = {r["day"]: (r["n_pairs"], r["total_overlap_min"])
           for r in REGISTRY["ev16_concurrency_sweep"].spark(spark, d).collect()}
    assert got == {0: (1, 30.0)}  # day 1 emits nothing: no overlapping pair


def test_ts04_singleton_series_no_interp(spark, tmp_path):
    """ts04: a type with ONE observed day has no lead() successor — it must
    emit its obs row and no interp rows (and not crash on the empty gap
    frame)."""
    from mdio_cpp_spark.plans import REGISTRY

    rows = [(0, "2024-01-01 10:00:00", 1, "solo", 2.0)]
    d = _mini_events(spark, tmp_path, rows)
    out = REGISTRY["ts04_gap_interpolate"].spark(spark, d).collect()
    assert [(r["event_type"], r["day"], r["value"], r["src"]) for r in out] == [
        ("solo", 0, 2.0, "obs")
    ]


def test_w16_ts06_single_day_series(spark, tmp_path):
    """One observed day per type: drawdown must be 0 at the only day (cum
    equals its own peak) and the CUSUM deviation is identically 0 — both
    queries emit exactly one well-defined row instead of crashing on the
    1-row windows."""
    from mdio_cpp_spark.plans import REGISTRY

    rows = [(0, "2024-01-01 10:00:00", 1, "solo", 2.0),
            (1, "2024-01-01 11:00:00", 2, "solo", 4.0)]
    d = _mini_events(spark, tmp_path, rows)
    dd = REGISTRY["w16_max_drawdown"].spark(spark, d).collect()
    assert [(r["event_type"], r["trough_day"], r["max_drawdown"], r["dd_frac"])
            for r in dd] == [("solo", 0, 0.0, 0.0)]
    cu = REGISTRY["ts06_cusum_changepoint"].spark(spark, d).collect()
    assert [(r["event_type"], r["change_day"], r["max_cusum"]) for r in cu] == [
        ("solo", 0, 0.0)
    ]


def test_ts05_no_purchase_days(spark, tmp_path):
    """Cross-correlation when one series is EMPTY: every lag's join matches
    nothing, so the result is empty on both engines — never a divide-by-zero
    from an n=0 correlation."""
    from mdio_cpp_spark.plans import REGISTRY

    rows = [(0, "2024-01-01 10:00:00", 1, "click", 1.0),
            (1, "2024-01-02 10:00:00", 1, "click", 1.0)]
    d = _mini_events(spark, tmp_path, rows)
    assert REGISTRY["ts05_crosscorr_lags"].spark(spark, d).count() == 0


def test_u06_deletes_empty_a_whole_group(spark, tmp_path):
    """u06's delta algebra when the changeset deletes EVERY row of a group:
    the group's maintained count reaches 0 and the row must vanish (the
    recompute-from-scratch semantics), not linger as a (status, 0, 0.0)
    zombie."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.plans import REGISTRY

    # status 'X' rows all have keys ≡ 1 (mod 13) → the fixed changeset
    # deletes all of them; 'Y' keys ≡ 3..5 (mod 13) → untouched
    rows = [(1, "X", 10.0), (14, "X", 20.0), (27, "X", 30.0),
            (3, "Y", 5.0), (4, "Y", 6.0), (5, "Y", 7.0)]
    d = str(tmp_path / "sf_mini2")
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = {(r["o_orderstatus"]): (r["n_orders"], r["total"])
           for r in REGISTRY["u06_incremental_agg"].spark(spark, d).collect()}
    assert "X" not in got          # emptied group vanishes
    assert got["Y"] == (3, 18.0)   # untouched group exact


def test_boilerplate_strip_short_and_empty_docs(spark):
    """p18's strip math on inputs the gate corpus lacks: an empty doc, a
    doc shorter than one block (nothing strippable — all tokens kept), and
    two docs sharing their ONLY full block (both lose exactly 16 tokens,
    tails survive). drop_frac must never divide by zero."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.functions import text
    from mdio_cpp_spark.plans.pipeline import _BLK

    shared = " ".join(f"tok{i}" for i in range(_BLK))
    rows = [
        (1, ""),                            # empty: 0 tokens, frac 0
        (2, "just a few words"),            # < one block: all kept
        (3, shared + " tail1 tail2"),       # shared block + 2-token tail
        (4, shared),                        # shared block, no tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = df.select("doc_id", text.tokens(F.col("text")).alias("w")).select(
        "doc_id", "w", F.size("w").alias("n")
    )
    blocks = toks.filter(F.col("n") >= _BLK).select(
        "doc_id", F.explode(text.token_blocks(F.col("w"), _BLK)).alias("bh")
    )
    sharedb = (
        blocks.groupBy("bh").agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2).select("bh")
    )
    dropped = (
        blocks.join(sharedb, "bh", "left_semi")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("dropped_blocks"))
    )
    db = F.coalesce(F.col("dropped_blocks"), F.lit(0)).cast("long")
    out = {
        r["doc_id"]: (r["n_tok"], r["kept"], r["frac"])
        for r in toks.select("doc_id", "n")
        .join(dropped, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tok"),
            (F.col("n") - _BLK * db).cast("long").alias("kept"),
            (F.round((_BLK * db).cast("double")
                     / F.greatest(F.col("n"), F.lit(1)), 4) + 0.0).alias("frac"),
        ).collect()
    }
    assert out[1] == (0, 0, 0.0)
    assert out[2] == (4, 4, 0.0)
    assert out[3] == (_BLK + 2, 2, round(_BLK / (_BLK + 2), 4))
    assert out[4] == (_BLK, 0, 1.0)
