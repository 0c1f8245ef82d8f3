"""Independent numpy cross-validation of the closed-form model queries.

The DuckDB differential proves Spark and the oracle agree — but both sides
share the SAME algebra, so an algebra error (wrong normal-equation
rearrangement, mis-scaled ridge penalty) would pass the hash gate on both
engines. These tests recompute the answers with numpy from the raw parquet
via a DIFFERENT formulation (explicit centered design matrix / population
moments) and require agreement to float tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mdio_cpp_spark.plans import REGISTRY

_LAMBDA = 1000.0  # must match plans/analytics.py _RIDGE_LAMBDA


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_ridge_matches_numpy_normal_equations(spark, sf_dir, lineitem):
    got = (
        REGISTRY["ml02_group_ridge"].spark(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    for flag, g in lineitem.groupby("l_returnflag"):
        u = g["l_quantity"].to_numpy(float)
        v = np.round(g["l_discount"].to_numpy(float) * 100)
        y = np.round(g["l_extendedprice"].to_numpy(float) * 100)
        n = len(g)
        # centered design matrix; the query's λ applies to the n-scaled
        # centered Gram, i.e. λ/n on the plain centered Gram
        Xc = np.column_stack([u - u.mean(), v - v.mean()])
        beta = np.linalg.solve(
            Xc.T @ Xc + (_LAMBDA / n) * np.eye(2), Xc.T @ (y - y.mean())
        )
        intercept = y.mean() - beta[0] * u.mean() - beta[1] * v.mean()
        row = got.loc[flag]
        assert row["beta_qty"] == pytest.approx(beta[0], rel=1e-9)
        assert row["beta_disc"] == pytest.approx(beta[1], rel=1e-9)
        assert row["intercept_e2"] == pytest.approx(intercept, rel=1e-9)


def test_ridge_limits(spark, sf_dir, lineitem):
    """λ pulls betas toward zero: each ridge beta must be strictly smaller
    in magnitude than numpy's unregularized OLS solution (and nonzero —
    quantity genuinely predicts extendedprice)."""
    got = (
        REGISTRY["ml02_group_ridge"].spark(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    for flag, g in lineitem.groupby("l_returnflag"):
        u = g["l_quantity"].to_numpy(float)
        v = np.round(g["l_discount"].to_numpy(float) * 100)
        y = np.round(g["l_extendedprice"].to_numpy(float) * 100)
        Xc = np.column_stack([u - u.mean(), v - v.mean()])
        ols = np.linalg.lstsq(Xc, y - y.mean(), rcond=None)[0]
        row = got.loc[flag]
        assert 0 < abs(row["beta_qty"]) <= abs(ols[0]) + 1e-9
        assert abs(row["beta_disc"]) <= abs(ols[1]) + 1e-9


def test_volume_anomaly_matches_numpy_zscores(spark, sf_dir, events):
    got = REGISTRY["dq02_volume_anomaly"].spark(spark, sf_dir).toPandas()
    daily = (
        events.assign(day=events["ts"].dt.floor("D"))
        .groupby(["event_type", "day"])
        .size()
        .rename("n")
        .reset_index()
    )
    expected = {}
    for et, g in daily.groupby("event_type"):
        n = g["n"].to_numpy(float)
        z = (n - n.mean()) / n.std()  # population std, ddof=0
        for day, nn, zz in zip(g["day"], g["n"], z):
            if abs(zz) > 2.0:
                expected[(et, day)] = (nn, zz)
    got_keys = {(r.event_type, r.day): (r.n, r.z) for r in got.itertuples()}
    assert set(got_keys) == set(expected)
    for k, (nn, zz) in expected.items():
        assert got_keys[k][0] == nn
        assert got_keys[k][1] == pytest.approx(zz, rel=1e-9)
