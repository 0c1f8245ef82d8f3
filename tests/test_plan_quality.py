"""Structural plan-quality gate over the ENTIRE declared-query registry:
no query may plan a single-partition (global) window over data — the
classic silent scale-killer. Global output sorts are fine (range
partitioned); windows must be hash-partitioned.

A Window line in the executed-plan string prints as
``Window [exprs], [partitionSpec], [orderSpec]`` when partitioned and
``Window [exprs], [orderSpec]`` when global — we count the top-level
bracket separators.
"""

from __future__ import annotations

import pytest

from mdio_cpp_spark.plans import REGISTRY

# documented-bounded global windows (tiny-by-construction inputs):
#  - asof01/02: the keyless as-of boundary table — |time buckets| rows — is
#    cumulated globally by design (operators/joins.py step 3); the BIG
#    window partitions on the bucket.
#  - zarr09: row_number over a ≤10,000-row take-ordered sample (documented
#    in plans/zarr_queries.py).
_ALLOW_GLOBAL = {"asof01_event_order", "asof02_left", "zarr09_write_roundtrip"}


def _global_window_lines(plan: str) -> list[str]:
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ").strip()
        if s.startswith("Window ") and s.count("], [") < 2:
            bad.append(line.strip())
    return bad


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_global_window(name, spark, sf_dir):
    df = REGISTRY[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = _global_window_lines(plan)
    if name in _ALLOW_GLOBAL:
        return  # bounded by construction; see module docstring
    assert not bad, f"{name} plans a global window:\n" + "\n".join(bad)
