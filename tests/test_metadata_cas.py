"""Generation guard on the consolidated-metadata read-modify-write.

The consolidated document is patched incrementally on every
create_array/attr-update (zarr_store.py ``_reconsolidate_entry``) under a
single-writer contract; without a guard, two concurrent writers silently
drop each other's entries (the lost-update race of the reference's
CommitMetadata read-modify-write, dataset.h:1269-1416). This suite pins
the guard: every backend with version tracking (memory:// generations,
local content hashes, HTTP ETags + If-Match on the loopback server)
refuses the stale republish with a loud ConsolidatedMetadataConflict, the
winning writer's entry survives, and the loser recovers by re-opening.
"""

from __future__ import annotations

import numpy as np
import pytest

from mdio_cpp_spark.sources.http_loopback import LoopbackHttpServer
from mdio_cpp_spark.sources.kvstore import (
    KVPreconditionFailed,
    open_kvstore,
)
from mdio_cpp_spark.sources.zarr_store import (
    ConsolidatedMetadataConflict,
    ZarrStore,
)


@pytest.fixture(params=["memory", "local", "http"])
def kv(request, tmp_path):
    if request.param == "memory":
        yield open_kvstore(f"memory://cas-{tmp_path.name}")
    elif request.param == "local":
        yield open_kvstore(str(tmp_path))
    else:
        with LoopbackHttpServer(str(tmp_path)) as srv:
            yield open_kvstore(srv.url, retries=0)


def test_kv_cas_semantics(kv):
    assert kv.read_with_tag("doc") == (None, None)
    # create-if-absent (tag None) succeeds once, then conflicts
    kv.write_if_match("doc", b"v1", None)
    with pytest.raises(KVPreconditionFailed):
        kv.write_if_match("doc", b"v1b", None)
    data, tag = kv.read_with_tag("doc")
    assert data == b"v1" and tag is not None
    # matching tag publishes; the tag advances
    kv.write_if_match("doc", b"v2", tag)
    data2, tag2 = kv.read_with_tag("doc")
    assert data2 == b"v2" and tag2 != tag
    # the old tag is now stale — conditional write fails LOUDLY
    with pytest.raises(KVPreconditionFailed):
        kv.write_if_match("doc", b"v3", tag)
    assert kv.read("doc") == b"v2"  # nothing was clobbered


def test_kv_cas_stale_not_retried_over_http(tmp_path):
    """A lost CAS is permanent: the retry wrapper must raise it straight
    through, not replay the same stale payload with backoff."""
    with LoopbackHttpServer(str(tmp_path)) as srv:
        kv = open_kvstore(srv.url)  # default retry wrap
        kv.write("doc", b"v1")
        _, tag = kv.read_with_tag("doc")
        kv.write("doc", b"v2")  # tag is now stale
        srv.clear_log()
        with pytest.raises(KVPreconditionFailed):
            kv.write_if_match("doc", b"v3", tag)
        puts = [r for r in srv.requests if r[0] == "PUT"]
        assert len(puts) == 1 and puts[0][3] == 412


def _frozen_view(store: ZarrStore, key: str) -> None:
    """Pin ``store``'s next reads of ``key`` to its CURRENT content+tag —
    the deterministic stand-in for 'writer B read the doc before writer A
    published' (a real interleaving needs scheduler luck; this forces it)."""
    kv = store._kv
    raw, tag = kv.read_with_tag(key)
    orig = kv.read_with_tag
    kv.read_with_tag = (  # instance-level shadow, this store object only
        lambda k: (raw, tag) if k == key else orig(k))


def _two_writer_race(root_a: str, root_b: str, version: int):
    doc_key = "zarr.json" if version == 3 else ".zmetadata"
    a = ZarrStore.open(root_a)
    b = ZarrStore.open(root_b)
    _frozen_view(b, doc_key)
    a.create_array("from_a", shape=(8,), chunks=(8,), dtype="int32",
                   dims=("i",))
    with pytest.raises(ConsolidatedMetadataConflict):
        b.create_array("from_b", shape=(8,), chunks=(8,), dtype="int32",
                       dims=("i",))
    # A's entry survived; B's partial state never reached the shared doc
    metas = ZarrStore.open(root_a).arrays()
    assert "from_a" in metas
    assert "from_b" not in metas
    # loser recovers: re-open (fresh doc+tag) and re-apply
    b2 = ZarrStore.open(root_b)
    b2.create_array("from_b", shape=(8,), chunks=(8,), dtype="int32",
                    dims=("i",))
    metas2 = ZarrStore.open(root_a).arrays()
    assert {"v0", "from_a", "from_b"} <= set(metas2)


@pytest.mark.parametrize("version", [2, 3])
def test_two_writer_interleaving_memory(version, tmp_path):
    root = f"memory://race-{tmp_path.name}-v{version}/store"
    st = ZarrStore.create(root, version=version)
    st.create_array("v0", shape=(8,), chunks=(8,), dtype="int32", dims=("i",))
    st.consolidate()
    _two_writer_race(root, root, version)


@pytest.mark.parametrize("version", [2, 3])
def test_two_writer_interleaving_http(version, tmp_path):
    """The backend the guard exists for: plain HTTP has no LIST, so the
    walk fallback cannot re-discover a dropped entry — a lost update there
    is permanent. If-Match turns it into this loud conflict instead."""
    local = str(tmp_path / "store")
    st = ZarrStore.create(local, version=version)
    st.create_array("v0", shape=(8,), chunks=(8,), dtype="int32", dims=("i",))
    st.consolidate()
    with LoopbackHttpServer(str(tmp_path)) as srv:
        root = f"{srv.url}/store"
        _two_writer_race(root, root, version)


def test_generation_counter_advances(tmp_path):
    """Every publish of the consolidated doc advances its embedded
    generation — the audit trail a reader can use to order snapshots."""
    root = str(tmp_path / "gen.zarr")
    st = ZarrStore.create(root, version=3)
    st.create_array("a", shape=(4,), chunks=(4,), dtype="int8", dims=("i",))
    st.consolidate()
    cm = st._read_json("zarr.json")["consolidated_metadata"]
    assert cm["generation"] == 1
    st.create_array("b", shape=(4,), chunks=(4,), dtype="int8", dims=("i",))
    cm = st._read_json("zarr.json")["consolidated_metadata"]
    assert cm["generation"] == 2
    st.consolidate()
    cm = st._read_json("zarr.json")["consolidated_metadata"]
    assert cm["generation"] == 3
    assert set(cm["metadata"]) == {"a", "b"}


def test_single_writer_lifecycle_unchanged(tmp_path):
    """The guard is invisible to the normal single-writer flow — create,
    write, consolidate, incremental create, read-back all behave exactly
    as before, now with CAS underneath."""
    root = str(tmp_path / "sw.zarr")
    st = ZarrStore.create(root, version=3)
    st.create_array("x", shape=(64,), chunks=(16,), dtype="float32",
                    dims=("i",))
    vals = np.arange(64, dtype="f4")
    st.write_array_numpy("x", vals)
    st.consolidate()
    st.create_array("y", shape=(8,), chunks=(8,), dtype="int16", dims=("j",))
    st2 = ZarrStore.open(root)
    assert set(st2.arrays()) == {"x", "y"}
    assert np.array_equal(st2.read_array("x"), vals)
