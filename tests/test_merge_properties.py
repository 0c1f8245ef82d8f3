"""Property-based merge test (hypothesis): for ANY target table and ANY
valid changeset (unique keys, U/D/I ops), both physical strategies of
merge_changeset agree with an independent row-by-row Python model of the
WHEN [NOT] MATCHED semantics — and with each other.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mdio_cpp_spark.operators.merge import merge_changeset

_spark = None  # filled by the fixture-backed wrapper below


@st.composite
def merge_case(draw):
    t_keys = draw(st.lists(st.integers(0, 15), unique=True, max_size=8))
    target = [
        (k, draw(st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))),
         draw(st.one_of(st.none(), st.floats(-100, 100, allow_nan=False))))
        for k in t_keys
    ]
    c_keys = draw(st.lists(st.integers(0, 20), unique=True, max_size=8))
    changes = [
        (k, draw(st.sampled_from(["U", "D", "I"])),
         draw(st.sampled_from(["x", "y"])), draw(st.floats(-100, 100, allow_nan=False)))
        for k in c_keys
    ]
    return target, changes


def _model(target, changes):
    """Independent semantics model: dict-based, no Spark."""
    t = {k: (s, p) for k, s, p in target}
    out = dict(t)
    for k, op, s, p in changes:
        if k in t:
            if op == "U":
                out[k] = (s, p)
            elif op == "D":
                out.pop(k, None)
            # matched I: no-op
        else:
            if op == "I":
                out[k] = (s, p)
            # unmatched U/D: no-op
    return out


@settings(max_examples=12, deadline=None)
@given(merge_case())
def _check(case):
    target, changes = case
    tdf = _spark.createDataFrame(target or [(None, None, None)], "k long, s string, p double")
    if not target:
        tdf = tdf.filter("k IS NOT NULL")
    cdf = _spark.createDataFrame(
        changes or [(None, None, None, None)], "k long, op string, s string, p double"
    )
    if not changes:
        cdf = cdf.filter("k IS NOT NULL")
    expect = _model(target, changes)
    for bc in (True, False):
        got = {
            r["k"]: (r["s"], r["p"])
            for r in merge_changeset(tdf, cdf, "k", ["s", "p"], broadcast_changes=bc).collect()
        }
        assert got == expect, f"strategy bc={bc}: {got} != {expect}"


def test_merge_matches_model(spark):
    global _spark
    _spark = spark
    _check()


# ------------------------------------------------ schema evolution


def test_merge_evolve_column_rules(spark):
    from mdio_cpp_spark.operators.merge import merge_changeset_evolve

    tdf = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, p double",
    )
    # changeset carries p (shared) + f (NEW column) but NOT s (target-only)
    cdf = spark.createDataFrame(
        [(1, "U", 11.0, "HI"),      # update: s preserved, f set
         (2, "D", None, None),      # delete
         (9, "I", 90.0, "NEW"),     # insert: s lands NULL
         (3, "I", 99.0, "X")],      # matched insert: no-op
        "k long, op string, p double, f string",
    )
    expect = {
        1: ("a", 11.0, "HI"),
        3: ("c", 30.0, None),
        4: ("d", 40.0, None),
        9: (None, 90.0, "NEW"),
    }
    for bc in (True, False):
        out = merge_changeset_evolve(tdf, cdf, "k", broadcast_changes=bc)
        assert set(out.columns) == {"k", "s", "p", "f"}
        got = {r["k"]: (r["s"], r["p"], r["f"]) for r in out.collect()}
        assert got == expect, f"strategy bc={bc}"


def test_merge_evolve_no_new_columns_matches_merge(spark):
    """With identical schemas the evolve path degenerates to
    merge_changeset — pin the equivalence on a small mixed case."""
    from mdio_cpp_spark.operators.merge import (merge_changeset,
                                                merge_changeset_evolve)

    tdf = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, s string, p double")
    cdf = spark.createDataFrame(
        [(1, "U", "z", 9.0), (2, "D", None, None), (5, "I", "n", 5.0)],
        "k long, op string, s string, p double",
    )
    want = sorted(
        tuple(r) for r in merge_changeset(tdf, cdf, "k", ["s", "p"]).collect())
    got = sorted(tuple(r) for r in merge_changeset_evolve(tdf, cdf, "k").collect())
    assert got == want
