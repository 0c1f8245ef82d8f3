"""Fluent composed-query API — the CoordinateSelector analog (SURVEY M7).

The reference's ``CoordinateSelector::ReadDataVariables(names, ops...)``
(/root/reference/mdio/coordinate_selector.h:94-288) folds a sequence of
coordinate filters and sort keys over a dataset, maintaining "kept runs" of
matching cells because it lacks a relational executor. In Spark the same
pipeline is literally ``df.filter(p1).filter(p2).orderBy(...).select(...)``
(SURVEY §3.3) — this class keeps the reference's ergonomics while emitting
exactly that declarative plan for Catalyst:

  * ``filter_by(*preds)`` — conjunctive refinement, like successive
    ``ValueDescriptor`` filters (coordinate_selector.h:413-503). No
    run-compression needed: chunk/rowgroup pruning subsumes it.
  * ``sort_by(key)`` — chained calls compose LEAST-significant-first with a
    stable sort (coordinate_selector.h:122-188: each new key re-sorts the
    previous arrangement), so the LAST ``sort_by`` is the primary key.
  * ``read(*cols)`` — column-pruned projection of one or more output
    variables (the multi-output gather, coordinate_selector.h:261-288).

Everything stays lazy until an action; no collect, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


class CoordinateQuery:
    def __init__(self, df: DataFrame, _filters: tuple = (), _sorts: tuple = ()):
        self._df = df
        self._filters = _filters
        self._sorts = _sorts

    def filter_by(self, *preds: Column) -> "CoordinateQuery":
        """AND-composed coordinate predicates (conjunctive refinement)."""
        return CoordinateQuery(self._df, self._filters + tuple(preds), self._sorts)

    def sort_by(self, *keys: str | Column) -> "CoordinateQuery":
        """Stable sort by key(s); chained calls are least-significant-first
        like repeated sortSelectionByKey — the final call's keys dominate."""
        return CoordinateQuery(self._df, self._filters, self._sorts + (tuple(keys),))

    def read(self, *cols: str) -> DataFrame:
        """Materializable plan: filters → sort (accumulated, reversed so the
        last sort_by is primary) → pruned projection."""
        out = self._df
        for p in self._filters:
            out = out.filter(p)
        order: list = []
        for group in reversed(self._sorts):
            order.extend(group)
        if order:
            out = out.orderBy(*order)
        if cols:
            out = out.select(*cols)
        return out
