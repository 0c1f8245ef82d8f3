"""Bilinear interpolation (operators/interp.py) against a hand-computed
grid, and SemDeDup (operators/dedup.semantic_dedup) on crafted vectors.

Reference twin for interp: examples/real_data_example/src/interpolation.h:22
(driver-side bilinear over a read-back array) — same math, distributed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_cpp_spark.operators.interp import bilinear_interp
from mdio_cpp_spark.operators.dedup import semantic_dedup


def test_bilinear_exact_values(spark):
    # grid[r][c] = 10*r + c — bilinear interp of a plane reproduces the
    # plane exactly: val(ry, cx) = 10*ry + cx
    cells = spark.createDataFrame(
        [(r, c, float(10 * r + c)) for r in range(4) for c in range(4)],
        "row long, col long, v double",
    )
    targets = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.5, 2.5), (2, 0.25, 3.0), (3, 2.9, 0.1)],
        "t long, ry double, cx double",
    )
    got = {r["t"]: r["val"] for r in bilinear_interp(cells, targets).collect()}
    assert got == {0: 0.0, 1: 17.5, 2: 5.5, 3: 29.1}


def test_bilinear_corner_weights_sum(spark):
    # non-planar grid: check one point against the closed form
    cells = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 5.0), (1, 0, 3.0), (1, 1, 11.0)],
        "row long, col long, v double",
    )
    targets = spark.createDataFrame([(0, 0.5, 0.5)], "t long, ry double, cx double")
    [row] = bilinear_interp(cells, targets).collect()
    assert row["val"] == round((1.0 + 5.0 + 3.0 + 11.0) / 4, 4)


def test_semantic_dedup_keeps_lowest_id(spark):
    # ids 0 and 1 are distinct directions (centroids of their own cells);
    # 5 and 7 duplicate id 0's direction, 6 duplicates id 1's
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (5, [2.0, 0.0]),
        (6, [0.0, 3.0]),
        (7, [1.0, 0.001]),
        (8, [-1.0, 0.2]),  # not near anything with a lower id in its cell? (cos<0)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(
        df, "vec_id", "embedding", n_cells=2, threshold=0.95
    ).collect()}
    assert out[0] and out[1]  # representatives survive
    assert not out[5] and not out[6] and not out[7]  # scaled copies dropped
    assert out[8]  # opposite direction: cosine < threshold, kept
