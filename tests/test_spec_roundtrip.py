"""to_spec round-trip: the emitted MDIO v1 JSON spec validates and re-creates
an equivalent store (reference Dataset::spec / get_spec, dataset.h:927-939 —
spec out must equal spec in). Also pins the small named accessors
(shape / chunk_shape / get_units)."""

from __future__ import annotations

import shutil

import numpy as np

from mdio_cpp_spark.model import MdioDataset
from mdio_cpp_spark.schema.validation import validate_dataset_spec

TMP = "/root/repo/.zarr_cache/_spec_rt"

SPEC = {
    "metadata": {"name": "rt", "apiVersion": "1.0.0", "createdOn": "2024-01-01T00:00:00Z"},
    "variables": [
        {
            "name": "img",
            "dataType": "float32",
            "dimensions": [{"name": "il", "size": 48}, {"name": "xl", "size": 24}],
            "metadata": {
                "chunkGrid": {"name": "regular", "configuration": {"chunkShape": [16, 16]}},
                "unitsV1": {"speed": "m/s"},
            },
            "longName": "toy image",
            "coordinates": ["il", "xl"],
        },
        {
            "name": "hdr",
            "dataType": {"fields": [{"name": "cdp_x", "format": "int32"},
                                    {"name": "cdp_y", "format": "int32"}]},
            "dimensions": [{"name": "il", "size": 48}],
        },
        {"name": "il", "dataType": "int64", "dimensions": [{"name": "il", "size": 48}]},
        {"name": "xl", "dataType": "int64", "dimensions": [{"name": "xl", "size": 24}]},
    ],
}


def _vars_by_name(spec):
    return {v["name"]: v for v in spec["variables"]}


def test_to_spec_roundtrip():
    p1, p2 = f"{TMP}/a.zarr", f"{TMP}/b.zarr"
    shutil.rmtree(TMP, ignore_errors=True)
    ds = MdioDataset.from_json(SPEC, p1)
    ds = MdioDataset.open(p1)

    out = ds.to_spec()
    validate_dataset_spec(out)  # emitted spec must validate as-is

    vs = _vars_by_name(out)
    assert set(vs) == {"img", "hdr", "il", "xl"}
    img = vs["img"]
    assert img["dataType"] == "float32"
    assert img["dimensions"] == [{"name": "il", "size": 48}, {"name": "xl", "size": 24}]
    assert img["metadata"]["chunkGrid"]["configuration"]["chunkShape"] == [16, 16]
    assert img["metadata"]["unitsV1"] == {"speed": "m/s"}
    assert img["longName"] == "toy image"
    assert img["coordinates"] == ["il", "xl"]
    hdr = vs["hdr"]
    assert hdr["dataType"]["fields"] == [
        {"name": "cdp_x", "format": "int32"},
        {"name": "cdp_y", "format": "int32"},
    ]
    assert out["metadata"]["name"] == "rt"

    # the emitted spec re-creates an equivalent store
    ds2 = MdioDataset.from_json(out, p2)
    ds2 = MdioDataset.open(p2)
    for name in ds.list_variables():
        a, b = ds.var(name), ds2.var(name)
        assert a.shape == b.shape
        assert a.chunk_shape == b.chunk_shape
        assert a.dims == b.dims
    assert ds2.var("img").get_units() == {"speed": "m/s"}

    # accessor sanity against the raw meta
    v = ds.var("img")
    assert v.shape == (48, 24) and v.chunk_shape == (16, 16)
    assert v.meta.np_dtype == np.dtype("float32")
    shutil.rmtree(TMP, ignore_errors=True)


def test_from_json_create_modes(tmp_path):
    """kCreate/kCreateClean contract (USER_GUIDE 'Open options'): creating
    over an existing store errors unless create_clean wipes it first."""
    import numpy as np
    import pytest

    from mdio_cpp_spark.model import MdioDataset

    spec = {
        "metadata": {"name": "m", "apiVersion": "1.0.0"},
        "variables": [
            {"name": "i", "dataType": "int64",
             "dimensions": [{"name": "i", "size": 4}]},
        ],
    }
    p = str(tmp_path / "modes.zarr")
    MdioDataset.from_json(spec, p)
    with pytest.raises(FileExistsError, match="create_clean"):
        MdioDataset.from_json(spec, p)
    with pytest.raises(ValueError, match="mode"):
        MdioDataset.from_json(spec, p, mode="clobber")
    ds = MdioDataset.from_json(spec, p, mode="create_clean")
    assert ds.var("i").shape == (4,)
