"""Shared canonicalization for the differential gates.

Both the local gate (tools/check.py) and its pytest twin
(tests/test_declared_queries.py) compare Spark results against DuckDB by an
order-insensitive canonical hash. The canonical FORM lives here, once — a
change to value formatting that landed in only one consumer would make the
two gates disagree on identical data.
"""

from __future__ import annotations

import math

import pandas as pd


def canon_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[str]:
    """Rows as sorted canonical strings over name-sorted columns."""
    cols = sorted(df.columns)
    rows = [
        "\x1f".join(canon_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows
