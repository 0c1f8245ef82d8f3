"""Changeset application (MERGE INTO semantics) over plain columnar tables.

No reference analog (the reference mutates stores in place via
``Variable::Write`` / ``TrimDataset``, variable.h:1127-1134, utils/trim.h) —
this is the relational upsert a lakehouse pipeline runs to apply a CDC batch:
one pass producing the post-merge table from a target and a keyed changeset
tagged with an op column (``U`` update / ``D`` delete / ``I`` insert).

Per joined row the semantics mirror ``WHEN [NOT] MATCHED`` guards:

  * matched   + U → changeset values replace target values
  * matched   + D → row dropped
  * matched   + I → no-op (the target row passes through untouched)
  * unmatched + I → row inserted from changeset values
  * unmatched + U/D → ignored (nothing to update/delete)
  * target rows with no changeset match pass through untouched

Changeset keys are assumed unique (the CDC contract: one net op per key per
batch).

Two physical strategies, chosen by ``broadcast_changes``:

* ``True`` (the common CDC case — changeset ≪ target): the TARGET NEVER
  SHUFFLES. Spark cannot broadcast a full-outer join (it would plan a
  SortMergeJoin shuffling both sides), so instead U/D/matched-I apply via a
  BroadcastHashJoin LEFT OUTER over the target, and inserts come from a
  broadcast LEFT SEMI probe of the target (matched keys, bounded by
  |changes|) anti-joined back onto the insert rows. Two target scans, zero
  target shuffles — at 100 TB a second columnar scan is far cheaper than a
  full key shuffle.
* ``False`` (changeset comparable to target): the canonical single
  full-outer shuffle join on the key — both sides hash-partition once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_UPDATE, OP_DELETE, OP_INSERT = "U", "D", "I"


def _changes_projected(changes: DataFrame, key: str, value_cols: Sequence[str], op_col: str) -> DataFrame:
    return changes.select(
        F.col(key), F.col(op_col).alias("__op"), *[F.col(v).alias(f"__c_{v}") for v in value_cols]
    )


def merge_changeset(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    value_cols: Sequence[str],
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Return the post-merge table (columns: ``key`` + ``value_cols``)."""
    c = _changes_projected(changes, key, value_cols, op_col)
    if broadcast_changes:
        return _merge_broadcast(target, c, key, value_cols)
    return _merge_full_outer(target, c, key, value_cols)


def _merge_broadcast(target: DataFrame, c: DataFrame, key: str, value_cols: Sequence[str]) -> DataFrame:
    t = target.select(key, *value_cols)
    op = F.col("__op")
    # U/D (and matched-I no-op) — BroadcastHashJoin LeftOuter; target stays
    # in place, no shuffle
    applied = (
        t.join(F.broadcast(c), on=key, how="left")
        .filter(op.isNull() | (op != OP_DELETE))
        .select(
            F.col(key),
            *[
                F.when(op == OP_UPDATE, F.col(f"__c_{v}")).otherwise(F.col(v)).alias(v)
                for v in value_cols
            ],
        )
    )
    # inserts: I-rows whose key is absent from the target. The broadcast
    # LEFT SEMI probe yields the MATCHED keys (≤ |changes| rows, tiny), and
    # the anti join back onto the insert rows is tiny-vs-tiny.
    ins_rows = c.filter(op == OP_INSERT)
    matched_keys = t.select(key).join(F.broadcast(ins_rows.select(key)), on=key, how="left_semi")
    inserts = ins_rows.join(F.broadcast(matched_keys), on=key, how="left_anti").select(
        F.col(key), *[F.col(f"__c_{v}").alias(v) for v in value_cols]
    )
    return applied.unionByName(inserts)


def _merge_full_outer(target: DataFrame, c: DataFrame, key: str, value_cols: Sequence[str]) -> DataFrame:
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


def scd2_apply(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    value_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    change_date_col: str = "change_date",
) -> DataFrame:
    """Apply a CDC batch to a Type-2 slowly-changing dimension.

    ``target`` carries versioned rows ``(key, value, valid_from, valid_to)``
    with ``valid_to IS NULL`` marking the current version; ``changes``
    carries ``(key, value, change_date)``, one net change per key (the CDC
    contract, as in :func:`merge_changeset`). Semantics per key:

      * current row + changed value → current row CLOSES (``valid_to`` =
        change date) and a new current version opens at the change date
      * current row + identical value → no-op (the no-change guard — a
        re-delivered value must not spawn a phantom version); the
        comparison is null-safe, so NULL→x and x→NULL both count as
        changes and NULL→NULL is a no-op
      * key with no CURRENT row (absent entirely, or only closed history
        versions) → new current version inserted
      * history rows (``valid_to`` set) always pass through untouched

    Physical shape mirrors ``_merge_broadcast``: the dimension NEVER
    shuffles. Closing is a BroadcastHashJoin LEFT OUTER + map-side CASE;
    the new-version rows come off that same joined stream (bounded by
    |changes|); inserts probe matched keys via broadcast LEFT SEMI (≤
    |changes| rows) and anti-join back tiny-vs-tiny.
    """
    c = changes.select(
        F.col(key),
        F.col(value_col).alias("__new"),
        F.col(change_date_col).alias("__d"),
    )
    joined = target.join(F.broadcast(c), on=key, how="left")
    is_current = F.col(to_col).isNull()
    # match indicator is the change DATE (required non-null by the CDC
    # contract), so a NULL payload still matches; the value comparison is
    # null-safe so NULL→x / x→NULL version, NULL→NULL no-ops
    changed = (
        is_current
        & F.col("__d").isNotNull()
        & ~F.col("__new").eqNullSafe(F.col(value_col))
    )
    closed = joined.select(
        F.col(key),
        F.col(value_col),
        F.col(from_col),
        F.when(changed, F.col("__d")).otherwise(F.col(to_col)).alias(to_col),
    )
    to_type = target.schema[to_col].dataType
    new_versions = joined.filter(changed).select(
        F.col(key),
        F.col("__new").alias(value_col),
        F.col("__d").alias(from_col),
        F.lit(None).cast(to_type).alias(to_col),
    )
    # "matched" means HAS A CURRENT ROW — a key whose versions are all
    # closed must take the insert path or its change would vanish
    matched_keys = (
        target.filter(is_current)
        .select(key)
        .join(F.broadcast(c.select(key)), on=key, how="left_semi")
    )
    inserts = c.join(F.broadcast(matched_keys), on=key, how="left_anti").select(
        F.col(key),
        F.col("__new").alias(value_col),
        F.col("__d").alias(from_col),
        F.lit(None).cast(to_type).alias(to_col),
    )
    return closed.unionByName(new_versions).unionByName(inserts)


def merge_changeset_evolve(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """MERGE with SCHEMA EVOLUTION (the Delta-Lake ``WITH SCHEMA
    EVOLUTION`` semantics on plain columnar tables): the output schema is
    the UNION of the two sides' value columns, and per-column rules follow
    which side carries the column —

      * changes-only columns are ADDED to the table: untouched/updated-
        but-absent rows read NULL, updates and inserts set them;
      * target-only columns are PRESERVED on update (the changeset cannot
        unset a column it does not carry) and NULL on insert;
      * shared columns behave exactly like merge_changeset.

    Physical strategies mirror merge_changeset: ``broadcast_changes=True``
    never shuffles the target (BroadcastHashJoin LEFT OUTER + broadcast
    semi/anti insert path); ``False`` is one full-outer shuffle."""
    ccols = [c for c in changes.columns if c not in (key, op_col)]
    tcols = [c for c in target.columns if c != key]
    new_cols = [c for c in ccols if c not in tcols]
    out_cols = tcols + new_cols
    ctypes = dict(changes.dtypes)
    t = target.select(key, *tcols)
    for c in new_cols:  # evolution: widen the target with NULLs
        t = t.withColumn(c, F.lit(None).cast(ctypes[c]))
    c_proj = _changes_projected(changes, key, ccols, op_col)
    op = F.col("__op")

    def out_val(v):
        if v in ccols:
            take = (op == OP_UPDATE) | (op == OP_INSERT)
            return F.when(take, F.col(f"__c_{v}")).otherwise(F.col(v)).alias(v)
        return F.col(v).alias(v)

    if broadcast_changes:
        applied = (
            t.join(F.broadcast(c_proj), on=key, how="left")
            .filter(op.isNull() | (op != OP_DELETE))
            .select(
                F.col(key),
                *[
                    (
                        F.when(op == OP_UPDATE, F.col(f"__c_{v}"))
                        .otherwise(F.col(v))
                        .alias(v)
                        if v in ccols
                        else F.col(v).alias(v)
                    )
                    for v in out_cols
                ],
            )
        )
        ins_rows = c_proj.filter(op == OP_INSERT)
        matched_keys = t.select(key).join(
            F.broadcast(ins_rows.select(key)), on=key, how="left_semi")
        inserts = (
            ins_rows.join(F.broadcast(matched_keys), on=key, how="left_anti")
            .select(
                F.col(key),
                *[
                    (
                        F.col(f"__c_{v}").alias(v)
                        if v in ccols
                        else F.lit(None).cast(dict(t.dtypes)[v]).alias(v)
                    )
                    for v in out_cols
                ],
            )
        )
        return applied.unionByName(inserts)

    tj = t.withColumn("__t", F.lit(True))
    joined = tj.join(c_proj, on=key, how="full_outer")
    t_present = F.col("__t").isNotNull()
    keep = (
        op.isNull()
        | (t_present & (op != OP_DELETE))
        | (~t_present & (op == OP_INSERT))
    )
    take_change = (t_present & (op == OP_UPDATE)) | (~t_present & (op == OP_INSERT))
    vals = [
        (
            F.when(take_change, F.col(f"__c_{v}")).otherwise(F.col(v)).alias(v)
            if v in ccols
            else F.col(v).alias(v)
        )
        for v in out_cols
    ]
    return joined.filter(keep).select(F.col(key), *vals)
