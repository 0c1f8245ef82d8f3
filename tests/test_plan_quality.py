"""Structural plan-quality gate over the ENTIRE declared-query registry:
no query may plan a single-partition (global) window over data — the
classic silent scale-killer. Global output sorts are fine (range
partitioned); windows must be hash-partitioned.

A Window line in the executed-plan string prints as
``Window [exprs], [partitionSpec], [orderSpec]`` when partitioned and
``Window [exprs], [orderSpec]`` when global — we count the top-level
bracket separators. A partitioned window with NO ordering (e.g. an
unbounded ``SUM OVER (PARTITION BY k)``) also prints two brackets, but
its trailing spec holds partition exprs, not ``ASC``/``DESC`` sort
orders — that shape is hash-partitioned and fine.
"""

from __future__ import annotations

import pytest

from mdio_cpp_spark.plans import REGISTRY

# documented-bounded global windows (tiny-by-construction inputs):
#  - asof01/02/05: the keyless as-of boundary table — |time buckets| rows —
#    is cumulated globally by design (operators/joins.py step 3); the BIG
#    window partitions on the bucket (asof05 runs the machinery twice:
#    backward + forward).
#  - zarr09: row_number over a ≤10,000-row take-ordered sample (documented
#    in plans/zarr_queries.py).
#  - zarr55/zarr57: the gap-fill cross-chunk carry — ONE row per chunk
#    (operators/gapfill.py, zarr24's prefix-sum shape) — cumulates
#    globally; the BIG window partitions on the chunk id.
#  - p11: the epoch-shuffle bucket-offset cumulation — EXACTLY 16 rows
#    (one per hex digit); the corpus-sized rank windows partition on the
#    bucket.
#  - t16/ev07: the rank window runs AFTER an ORDER BY + LIMIT
#    (TakeOrdered) — input is ≤500 (t16) / ≤10 (ev07) rows by
#    construction (plans/pipeline.py t16, plans/analytics.py ev07).
#  - zarr73: the island rank runs over the SPARSE threshold-hit set
#    (pushdown + zone maps already dropped non-matching cells; |hits| ≪
#    |cells| by the query's nature — dense hits would take zarr24's
#    chunk-bucketed two-level rank instead, per the docstring).
#  - p14: the curriculum bucket-offset cumulation — ≤ 4 bands × 16 hex
#    digits = 64 rows (p11's offset idiom, two-level key); the
#    corpus-sized rank windows partition on (band, bucket).
#  - zarr86: the CDF cumulation over the 64-bin HISTOGRAM — constant-size
#    by construction; the data-sized remap is a broadcast join.
#  - mm09: the shard-offset cumulation over per-bucket totals — bucket
#    width scales with the corpus so the window input is ≤4096 rows at
#    any size; the data-sized running sum partitions on the bucket.
#  - s10: the rank runs AFTER TakeOrdered(16) — t16/ev07's bounded shape.
#  - t26/v16: the rk assignment runs AFTER ORDER BY + LIMIT
#    (TakeOrdered 15 / 10 rows; v16's two input lists are themselves
#    ≤50-row TakeOrdered results) — t16/ev07's bounded shape
#    (plans/pipeline.py _bm25_ranked, v16).
#  - ev19: the at-risk prefix and the KM log-product cumulate over the
#    |durations|-row lifetime grid — bounded by the observation window in
#    hours, never by users or events (plans/analytics.py ev19 docstring).
#  - ml15: the PR sweep's suffix sums cumulate over the (6dp-score)
#    COUNT lattice — bounded by the score range, never corpus rows
#    (plans/pipeline.py ml15 docstring; ml12's lattice discipline).
#  - ml14: the split-candidate prefix sums cumulate over the feature
#    VALUE LATTICE (≤ |distinct quantity| ≈ 50 rows by construction —
#    plans/analytics.py ml14 docstring); no data-sized window exists.
#  - w15: the rolling frame runs over the |days|-row per-day aggregate —
#    the asof-boundary allowance (|time buckets|, not data); a multi-
#    series variant partitions per series pair (docstring).
#  - zarr24/zarr59: the cross-chunk prefix offsets — ONE row per chunk —
#    cumulate globally (the zarr55 carry shape, previously a driver
#    collect); the data-sized running window partitions on the chunk id.
#  - a16: _zip_index's bucket-offset cumulation — ONE row per quantile
#    bucket (≤ cluster parallelism, never data; round 12 folded the old
#    per-call driver collect into the plan); the data-sized rank window
#    partitions on the bucket id.
_ALLOW_GLOBAL = {
    "a16_gini",
    "asof01_event_order", "asof02_left", "asof05_nearest", "zarr09_write_roundtrip",
    "zarr24_prefix_sum", "zarr59_cummax",
    "zarr55_ffill", "zarr57_bfill_limit", "p11_epoch_shuffle",
    "t16_zipf_slope", "ev07_top_paths", "zarr73_threshold_runs",
    "p14_curriculum", "zarr86_hist_equalize", "mm09_shard_plan",
    "s10_priority_sample", "w15_rolling_corr",
    "t26_bm25", "v16_hybrid_rrf", "ev19_survival_km", "ml14_decision_stump",
    "ml15_pr_curve",
}


def _global_window_lines(plan: str) -> list[str]:
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ").strip()
        if not s.startswith("Window ") or s.count("], [") >= 2:
            continue
        tail = s.rsplit("], [", 1)[-1] if "], [" in s else ""
        # two-bracket form: global IFF the trailing spec is a sort order
        # (ASC/DESC); partition exprs there mean partitioned-unordered.
        if " ASC" in tail or " DESC" in tail or "], [" not in s:
            bad.append(line.strip())
    return bad


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_global_window(name, spark, sf_dir):
    df = REGISTRY[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a CartesianProduct (both sides data-sized, no key) is never acceptable
    # in a declared plan — broadcast nested loops over bounded sides print
    # as BroadcastNestedLoopJoin and are fine
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    bad = _global_window_lines(plan)
    if name in _ALLOW_GLOBAL:
        return  # bounded by construction; see module docstring
    assert not bad, f"{name} plans a global window:\n" + "\n".join(bad)


# targeted physical-plan contracts: the property each plan exists to
# demonstrate must actually appear in the executed plan, so a regression
# (lost pushdown, join strategy flip, global sort sneaking in) fails CI
# instead of silently degrading
_PLAN_CONTRACTS = {
    "q01_isel_range": ["PushedFilters: [IsNotNull(l_orderkey), GreaterThanOrEqual(l_orderkey,100)"],
    "h01_shipping_priority": ["TakeOrderedAndProject", "BroadcastHashJoin"],
    "h05_revenue_forecast": ["PushedFilters: [IsNotNull(l_shipdate)"],
    "j01_broadcast_join_agg": ["BroadcastHashJoin"],
    "j02_semi_join": ["LeftSemi"],
    "j03_anti_join": ["LeftAnti"],
    "u02_scd2_history": ["BroadcastHashJoin"],
    "h20_sole_returning_supplier": ["HashAggregate"],
    # ts03: tick->bar OHLC must stay a pure aggregate — open/close via
    # min_by/max_by pairs, never a sorted window over ticks
    "ts03_ohlc_downsample": ["min_by", "max_by"],
    "d16_fuzzy_split_leakage": ["BroadcastHashJoin", "LeftSemi"],
    # u08: the merge-on-read probe must stay a broadcast anti join — the
    # base table never shuffles; a flip to SortMergeJoin would mean the
    # 100-TB side started exchanging
    "u08_deletion_vectors": ["BroadcastHashJoin", "LeftAnti"],
    # t27: the winner list is a distributed top-k, never a global sort
    "t27_bpe_merge_step": ["TakeOrderedAndProject"],
    # d18: the delta's band keys broadcast onto the base — the base-side
    # band table must never exchange for the join
    "d18_incremental_minhash": ["BroadcastHashJoin"],
    "ev17_seasonal_anomaly": ["BroadcastHashJoin"],
    # u06: the target must stream through a broadcast semi prune — never be
    # the build side of the old-value fetch
    "u06_incremental_agg": ["LeftSemi, BuildRight"],
    # zarr105: the trig basis must be the broadcast build side of the scan
    # fan-out — the scan never shuffles before the (row, k) reduce
    "zarr105_dft_spectrum": ["BroadcastHashJoin"],
}


@pytest.mark.parametrize("name", sorted(_PLAN_CONTRACTS))
def test_plan_contract(name, spark, sf_dir):
    plan = REGISTRY[name].spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for needle in _PLAN_CONTRACTS[name]:
        assert needle in plan, f"{name}: expected {needle!r} in the executed plan"


def test_zarr40_shift_roll_zero_shuffle(spark, sf_dir):
    """The shift/roll remap must stay shuffle-free: the ONLY exchange in
    the plan is the gate's output range-sort."""
    plan = REGISTRY["zarr40_shift_roll"].spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    # pre-execution AQE plans may elide the output-sort exchange entirely;
    # what must NEVER appear is a hash (data-shuffling) exchange
    assert len(exchanges) <= 1, exchanges
    assert all("hashpartitioning" not in l for l in exchanges), exchanges
