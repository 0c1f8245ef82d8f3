"""fill_gaps (operators/gapfill.py): LOCF/NOCB with limit — chunk-bucketed,
no global data window; semantics pinned against hand-computed expectations
across bucket boundaries and under the mirrored (backward) axis."""

from __future__ import annotations

import pytest

from mdio_cpp_spark.operators.gapfill import fill_gaps

_ROWS = [(0, None), (1, 10.0), (2, None), (3, None), (4, 40.0), (5, None),
         (6, None), (7, None), (8, 80.0), (9, None)]


def _df(spark):
    return spark.createDataFrame(_ROWS, "i long, v double")


def test_ffill_across_buckets(spark):
    got = {r["i"]: r["v"] for r in fill_gaps(_df(spark), "i", "v", bucket_size=3).collect()}
    assert got == {0: None, 1: 10.0, 2: 10.0, 3: 10.0, 4: 40.0,
                   5: 40.0, 6: 40.0, 7: 40.0, 8: 80.0, 9: 80.0}


def test_ffill_limit_masks_distant_donors(spark):
    got = {r["i"]: r["v"] for r in
           fill_gaps(_df(spark), "i", "v", bucket_size=3, limit=2).collect()}
    assert got[7] is None  # donor at 4 is 3 positions away > limit 2
    assert got[6] == 40.0 and got[5] == 40.0


def test_bfill_mirrors_forward(spark):
    got = {r["i"]: r["v"] for r in
           fill_gaps(_df(spark), "i", "v", bucket_size=3, direction="backward").collect()}
    assert got == {0: 10.0, 1: 10.0, 2: 40.0, 3: 40.0, 4: 40.0,
                   5: 80.0, 6: 80.0, 7: 80.0, 8: 80.0, 9: None}


def test_bfill_limit(spark):
    got = {r["i"]: r["v"] for r in
           fill_gaps(_df(spark), "i", "v", bucket_size=3,
                     direction="backward", limit=1).collect()}
    assert got == {0: 10.0, 1: 10.0, 2: None, 3: 40.0, 4: 40.0,
                   5: None, 6: None, 7: 80.0, 8: 80.0, 9: None}


def test_bad_args(spark):
    with pytest.raises(ValueError, match="direction"):
        fill_gaps(_df(spark), "i", "v", direction="sideways")
    with pytest.raises(ValueError, match="limit"):
        fill_gaps(_df(spark), "i", "v", limit=-1)


def test_extra_columns_preserved_and_out_col(spark):
    from pyspark.sql import functions as F

    base = _df(spark).withColumn("tag", F.col("i") % 2)
    out = fill_gaps(base, "i", "v", bucket_size=4, out_col="filled")
    assert set(out.columns) == {"i", "v", "tag", "filled"}
    row = {r["i"]: r for r in out.collect()}
    assert row[3]["filled"] == 10.0 and row[3]["v"] is None and row[3]["tag"] == 1
