from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from mdio_cpp_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# streaming tests use this for checkpoint dirs; fresh checkouts lack it
import os  # noqa: E402

os.makedirs("/root/repo/.zarr_cache", exist_ok=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mdio-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
