"""Changeset application (MERGE INTO semantics) over plain columnar tables.

No reference analog (the reference mutates stores in place via
``Variable::Write`` / ``TrimDataset``, variable.h:1127-1134, utils/trim.h) —
this is the relational upsert a lakehouse pipeline runs to apply a CDC batch:
one pass producing the post-merge table from a target and a keyed changeset
tagged with an op column (``U`` update / ``D`` delete / ``I`` insert).

Scale shape: ONE shuffle join on the merge key (broadcast when the changeset
is small — the common CDC case — which this operator requests explicitly via
a hint when ``broadcast_changes=True``). No per-row driver logic, no
collect; semantics are a pure column expression over the joined row:

  * matched  + U → changeset values replace target values
  * matched  + D → row dropped
  * unmatched + I → row inserted from changeset values
  * target rows with no changeset match pass through untouched

Rows whose op does not apply (an ``I`` that actually matched, a ``U``/``D``
that matched nothing) are ignored, mirroring ``WHEN [NOT] MATCHED`` guards.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_UPDATE, OP_DELETE, OP_INSERT = "U", "D", "I"


def merge_changeset(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    value_cols: Sequence[str],
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Return the post-merge table.

    ``changes`` carries ``key``, ``op_col`` and the same ``value_cols`` as
    ``target`` (values are only read for U/I ops). The result keeps the
    target's column set: ``key`` + ``value_cols``.
    """
    c = changes.select(
        F.col(key), F.col(op_col).alias("__op"), *[F.col(v).alias(f"__c_{v}") for v in value_cols]
    )
    if broadcast_changes:
        c = F.broadcast(c)
    t = target.select(key, *value_cols).withColumn("__t", F.lit(True))
    joined = t.join(c, on=key, how="full_outer")

    t_present = F.col("__t").isNotNull()  # sentinel: value cols may be NULL
    op = F.col("__op")
    keep = (
        op.isNull()  # untouched target row
        | (t_present & (op != OP_DELETE))  # U applies; a matched I is a no-op
        | (~t_present & (op == OP_INSERT))  # applied insert
    )
    take_change = (t_present & (op == OP_UPDATE)) | (~t_present & (op == OP_INSERT))
    out_vals = [
        F.when(take_change, F.col(f"__c_{v}")).otherwise(F.col(v)).alias(v)
        for v in value_cols
    ]
    return joined.filter(keep).select(F.col(key), *out_vals)
