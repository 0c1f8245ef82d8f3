"""Differential test: every declared query's Spark result must match its
DuckDB oracle at sf0.001 — the reference's own cross-implementation oracle
pattern (SURVEY §5: acceptance_test.cc shells out to Python oracles)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
import pytest

from mdio_cpp_spark.catalog import TABLES
from mdio_cpp_spark.differential import canonical_rows
from mdio_cpp_spark.plans import REGISTRY


def canonical_hash(df: pd.DataFrame) -> tuple[int, str]:
    rows = canonical_rows(df)
    return len(df), hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_declared_query_matches_oracle(name, spark, sf_dir, oracle):
    d = REGISTRY[name]
    sdf = d.spark(spark, sf_dir).toPandas()
    if d.oracle is None:
        # rows-only contract for non-SQL-expressible ops: must produce rows
        # and a non-degenerate schema (an empty result would silently pass
        # the differential suite otherwise)
        assert len(sdf) > 0, f"oracle-less query {name} returned no rows"
        assert len(sdf.columns) > 0
        return
    odf = oracle.execute(d.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns), "column names must match"
    sn, sh = canonical_hash(sdf)
    on, oh = canonical_hash(odf)
    assert sn == on, f"row count: spark {sn} vs oracle {on}"
    assert sh == oh, "value hash mismatch"
    # vacuous-gate guard: an empty result matches an empty oracle trivially
    # (a literal predicate that selects nothing — e.g. a dimension value the
    # synthetic data doesn't contain — would silently pass). Every declared
    # query must exercise real rows at every SF.
    assert sn > 0, f"{name} is a zero-row (vacuous) gate at this SF"
