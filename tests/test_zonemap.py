"""Zone-map pruning: per-chunk [min,max] manifests must (a) never change a
scan's result and (b) actually prune incompatible chunks, including edge
chunks (valid-extent stats) and fill-only chunks."""

from __future__ import annotations

import numpy as np

from mdio_cpp_spark.sources import zonemap
from mdio_cpp_spark.sources.reader import scan_array
from mdio_cpp_spark.sources.zarr_store import ZarrStore


def _mk_store(tmp_path, n=1000, chunk=100):
    root = str(tmp_path / "zm.zarr")
    st = ZarrStore.create(root, version=2)
    st.create_array("v", shape=(n,), chunks=(chunk,), dtype="float64", dims=("i",))
    st.consolidate()
    # ascending values → each chunk's zone is [100*k, 100*k+99]; leave the
    # last chunk unwritten (fill-only, fill=0.0 default)
    vals = np.arange(n, dtype=np.float64)
    st.write_array_numpy("v", vals[: n - chunk])
    return root, vals


def test_stats_match_chunks(spark, tmp_path):
    root, vals = _mk_store(tmp_path)
    stats = zonemap.compute_chunk_stats(spark, root, "v")
    assert len(stats) == 10
    assert stats["0"] == [0.0, 99.0]
    assert stats["8"] == [800.0, 899.0]
    assert stats["9"] is None  # fill-only


def test_edge_chunk_stats_exclude_padding(spark, tmp_path):
    root = str(tmp_path / "edge.zarr")
    st = ZarrStore.create(root, version=2)
    # shape 250, chunk 100 → last chunk half-valid; padding would carry 0s
    st.create_array("v", shape=(250,), chunks=(100,), dtype="float64", dims=("i",))
    st.consolidate()
    st.write_array_numpy("v", np.arange(1000.0, 1250.0))
    stats = zonemap.compute_chunk_stats(spark, root, "v")
    assert stats["2"] == [1200.0, 1249.0]  # not 0.0 from padding


def test_zonemap_scan_equals_plain_scan(spark, tmp_path):
    root, vals = _mk_store(tmp_path)
    expect = sorted(
        r["i"]
        for r in scan_array(spark, root, "v", value_filter=(">=", 750.0)).collect()
    )
    zonemap.publish_chunk_stats(root, "v", zonemap.compute_chunk_stats(spark, root, "v"))
    got = sorted(
        r["i"]
        for r in scan_array(spark, root, "v", value_filter=(">=", 750.0)).collect()
    )
    assert got == expect == list(range(750, 900))


def test_chunk_compatible_prunes():
    stats = {str(k): [100.0 * k, 100.0 * k + 99.0] for k in range(9)}
    stats["9"] = None  # fill-only, fill = 0.0
    keep = [
        k for k in range(10)
        if zonemap.chunk_compatible(stats[str(k)], ">=", 750.0, 0.0)
    ]
    assert keep == [7, 8]  # 7 partially, 8 fully; fill-only chunk pruned too
    keep_eq = [
        k for k in range(10)
        if zonemap.chunk_compatible(stats[str(k)], "==", 0.0, 0.0)
    ]
    assert keep_eq == [0, 9]  # value 0 lives in chunk 0; fill chunk matches


def test_fill_chunk_survives_when_fill_matches(spark, tmp_path):
    root = str(tmp_path / "fill.zarr")
    st = ZarrStore.create(root, version=2)
    st.create_array(
        "v", shape=(1000,), chunks=(100,), dtype="float64", dims=("i",), fill=0.0
    )
    st.consolidate()
    st.write_array_numpy("v", np.arange(900, dtype=np.float64))
    zonemap.publish_chunk_stats(root, "v", zonemap.compute_chunk_stats(spark, root, "v"))
    # fill is 0.0; '<= 0' must keep the fill-only chunk AND chunk 0
    got = sorted(
        r["i"]
        for r in scan_array(spark, root, "v", value_filter=("<=", 0.0)).collect()
    )
    assert got == [0] + list(range(900, 1000))


def test_write_updates_manifest(spark, tmp_path):
    """A chunk-aligned Spark write into an array with a published manifest
    must fold the touched chunks' new zones back in — a later pruned scan
    sees the new values (no stale-stats wrong pruning)."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.sources.writer import write_array
    from mdio_cpp_spark.sources.zarr_store import ZarrStore as _ZS

    root, vals = _mk_store(tmp_path)
    zonemap.publish_chunk_stats(root, "v", zonemap.compute_chunk_stats(spark, root, "v"))

    # overwrite chunk 2 (i in [200,300)) with huge values
    upd = (
        spark.range(200, 300)
        .select(F.col("id").alias("i"), (F.col("id") + 100000.0).alias("value"))
    )
    write_array(upd, root, "v")

    stats = zonemap.load_stats(_ZS.open(root).array_meta("v"))
    assert stats["2"] == [100200.0, 100299.0]
    assert stats["0"] == [0.0, 99.0]  # untouched chunks keep their zones

    got = sorted(
        r["i"]
        for r in scan_array(spark, root, "v", value_filter=(">=", 100000.0)).collect()
    )
    assert got == list(range(200, 300))


def test_driver_side_write_updates_manifest(spark, tmp_path):
    """write_array_numpy (the driver-side writer) must also refresh the
    manifest — a fill-only chunk that gets real data can no longer be
    evaluated as fill by a pruned scan."""
    root, vals = _mk_store(tmp_path)
    zonemap.publish_chunk_stats(root, "v", zonemap.compute_chunk_stats(spark, root, "v"))

    st = ZarrStore.open(root)
    assert zonemap.load_stats(st.array_meta("v"))["9"] is None  # fill-only
    # write real data into the previously-fill chunk, driver-side
    st.write_array_numpy("v", np.full(100, 7.5), origin=(900,))

    stats = zonemap.load_stats(ZarrStore.open(root).array_meta("v"))
    assert stats["9"] == [7.5, 7.5]
    got = sorted(
        r["i"]
        for r in scan_array(spark, root, "v", value_filter=("==", 7.5)).collect()
    )
    assert got == list(range(900, 1000))


def test_aggregate_from_manifest(spark, tmp_path):
    """Manifest-only aggregate: exact on fully-written arrays, None (fall
    back to scan) when any chunk is fill-only or the manifest is stale."""
    root, vals = _mk_store(tmp_path)  # last chunk fill-only
    zonemap.publish_chunk_stats(root, "v", zonemap.compute_chunk_stats(spark, root, "v"))
    meta = ZarrStore.open(root).array_meta("v")
    assert zonemap.aggregate_from_manifest(meta) is None  # fill-only chunk

    st = ZarrStore.open(root)
    st.write_array_numpy("v", np.arange(900.0, 1000.0), origin=(900,))
    meta = ZarrStore.open(root).array_meta("v")
    assert zonemap.aggregate_from_manifest(meta) == (1000, 0.0, 999.0)


def test_trim_leaves_zone_maps_conservative(spark, tmp_path):
    """Shrinking an array (TrimDataset) can leave stale-WIDE zones for the
    new edge chunk — that is safe (less pruning, never wrong pruning): the
    scan must still return exactly the surviving matching cells."""
    from mdio_cpp_spark.utils.trim import trim_dataset

    root, vals = _mk_store(tmp_path)  # values 0..899 written, chunk=100
    zonemap.publish_chunk_stats(root, "v", zonemap.compute_chunk_stats(spark, root, "v"))

    trim_dataset(root, i=850)  # chunk 8 becomes half-valid; zone stays [800,899]

    got = sorted(
        r["i"]
        for r in scan_array(spark, root, "v", value_filter=(">=", 820.0)).collect()
    )
    assert got == list(range(820, 850))  # 850+ gone, zone over-width harmless


def test_zone_of_is_nan_aware_and_json_safe():
    import math

    import numpy as np

    from mdio_cpp_spark.sources.zarr_store import zone_of

    # NaN padding (the default float fill) must not poison the zone
    assert zone_of(np.array([1.0, np.nan, 3.0])) == [1.0, 3.0]
    # all-NaN / empty extents -> None (fill-only semantics downstream)
    assert zone_of(np.array([np.nan, np.nan])) is None
    assert zone_of(np.array([], dtype="f8")) is None
    # infinities clamp to the finite range so allow_nan=False JSON survives
    z = zone_of(np.array([1.0, np.inf, -np.inf]))
    assert all(math.isfinite(x) for x in z) and z[0] < z[1]
    # ints untouched
    assert zone_of(np.array([5, -2], dtype="i8")) == [-2.0, 5.0]


def test_zonemap_rejects_string_arrays(tmp_path, spark):
    import numpy as np
    import pytest

    from mdio_cpp_spark.sources import zonemap
    from mdio_cpp_spark.sources.zarr_store import ZarrStore

    root = str(tmp_path / "s.zarr")
    st = ZarrStore.create(root, version=2)
    st.create_array("s", shape=(4,), chunks=(2,), dtype=np.dtype("<U4"), dims=("i",))
    st.consolidate()
    with pytest.raises(ValueError, match="numeric/bool"):
        zonemap.compute_chunk_stats(spark, root, "s")


def test_chunk_compatible_soundness_guards():
    import numpy as np

    from mdio_cpp_spark.sources.zarr_store import zone_of
    from mdio_cpp_spark.sources.zonemap import chunk_compatible

    # float '!=' never prunes: the zone masks NaN cells that satisfy any !=
    assert chunk_compatible([5.0, 5.0], "!=", 5.0, 0.0, float_kind=True)
    assert not chunk_compatible([5.0, 5.0], "!=", 5.0, 0.0, float_kind=False)
    # infinite / boundary literals never prune (zones clamp inf for JSON)
    assert chunk_compatible([1.0, 1.0], ">=", float("inf"), 0.0)
    assert chunk_compatible([1.0, 1.0], "==", float("-inf"), 0.0)
    # int zones above 2^53 widen OUTWARD so exact matches are never excluded
    v = np.array([9007199254740995] * 3, dtype="i8")  # 2^53 + 3
    lo, hi = zone_of(v)
    assert lo <= 9007199254740995 <= hi
    assert chunk_compatible([lo, hi], "==", 9007199254740995, 0)
