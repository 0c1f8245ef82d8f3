"""npy export sink (utils/npy.py — the real_data_example's WriteNumpy)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from mdio_cpp_spark.model import MdioDataset
from mdio_cpp_spark.plans.zarr_queries import ensure_stores
from mdio_cpp_spark.utils import npy
from mdio_cpp_spark.utils.npy import export_npy, import_npy


@pytest.fixture(scope="module")
def store_base(spark, sf_dir):
    return ensure_stores(spark, sf_dir)


def test_roundtrip_matches_read(store_base, tmp_path):
    ds = MdioDataset.open(os.path.join(store_base, "orders_v2.zarr"))
    sel = ds.isel(i=(100, 356))
    p = str(tmp_path / "slice.npy")
    shape = export_npy(sel.var("price"), p)
    arr = import_npy(p)
    assert shape == arr.shape == (256,)
    assert arr.dtype == np.float64
    np.testing.assert_array_equal(arr, sel.var("price").read())
    # v1.0 magic per the public format (seismic_numpy.h writes these bytes)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x93NUMPY\x01\x00"


def test_rank3_c_order(store_base, tmp_path):
    ds = MdioDataset.open(os.path.join(store_base, "cube_v2.zarr"))
    sel = ds.isel(il=(1, 3), xl=(2, 6), t=(0, 5))
    p = str(tmp_path / "cube.npy")
    assert export_npy(sel.var("amp"), p) == (2, 4, 5)
    arr = import_npy(p)
    np.testing.assert_array_equal(arr, sel.var("amp").read())
    assert arr.flags["C_CONTIGUOUS"]


def test_size_guard_fires_before_any_read(store_base, monkeypatch, tmp_path):
    ds = MdioDataset.open(os.path.join(store_base, "orders_v2.zarr"))
    var = ds.var("price")
    monkeypatch.setattr(npy, "MAX_EXPORT_BYTES", 64)
    monkeypatch.setattr(
        ds.store, "read_array",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("guard ran late")))
    with pytest.raises(ValueError, match="driver-materialization bound"):
        npy.export_npy(var, str(tmp_path / "big.npy"))
