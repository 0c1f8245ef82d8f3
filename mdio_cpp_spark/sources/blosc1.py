"""Pure-Python blosc1 frame codec (``cname=zlib``).

The reference engine accepts ONLY blosc compression
(dataset_factory.h:295-297,344-346), and no blosc wheel is installable in
this container (probe log tests/INTEROP_PROBE.md) — so stores written with
the reference's default codec family were unreadable here. The blosc1
container format is public (c-blosc README_HEADER.rst); its ``zlib`` cname
wraps ordinary zlib streams that the stdlib decompresses, and its
[bit-]shuffle filters are byte/bit transposes that numpy reverses
vectorized. This module implements that subset natively:

  header (16 B, little-endian):
      version u8 | versionlz u8 | flags u8 | typesize u8 |
      nbytes i32 | blocksize i32 | cbytes i32
  flags: bit0 byte-shuffle, bit1 memcpy (raw payload follows the header),
      bit2 bit-shuffle, bits5-7 codec id
      (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)
  non-memcpy payload: i32 bstarts[nblocks] (absolute offsets into the
      frame), then per block ``i32 csize | stream``. A stream whose csize
      equals the block's uncompressed size is STORED RAW (c-blosc's
      incompressible-block fallback). zlib frames never use the legacy
      split-stream layout (c-blosc's BLOSC_FORWARD_COMPAT_SPLIT splits only
      blosclz/lz4), so each block is a single stream.
  shuffle: applied per BLOCK before compression. Byte-shuffle transposes
      the block's (n_items × typesize) byte matrix; trailing bytes that
      don't fill an element ride unshuffled at the block tail. Bit-shuffle
      transposes bit-planes over groups of ``typesize*8`` bytes
      (little-endian bit order, the bitshuffle library's layout), same
      tail rule.

Frames with any other cname raise CodecError — lz4/blosclz/snappy/zstd
payloads genuinely need their wheels and stay honestly gated. Memcpy'd
frames decode regardless of codec id (no decompression is involved).
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np


class BloscFormatError(RuntimeError):
    pass


BLOSC_VERSION_FORMAT = 2
_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_ZLIB_ID = 3
_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPY = 0x2
_FLAG_BITSHUFFLE = 0x4

# encoder default block size: multiples of typesize*8 keep every full block
# shuffle-clean; 256 KiB matches c-blosc's L2-sized defaults
_DEFAULT_BLOCK = 1 << 18


def _byte_shuffle(b: bytes, typesize: int) -> bytes:
    n = len(b) - len(b) % typesize
    if typesize <= 1 or n == 0:
        return b
    arr = np.frombuffer(b, "u1", count=n).reshape(-1, typesize)
    return arr.T.tobytes() + b[n:]


def _byte_unshuffle(b: bytes, typesize: int) -> bytes:
    n = len(b) - len(b) % typesize
    if typesize <= 1 or n == 0:
        return b
    arr = np.frombuffer(b, "u1", count=n).reshape(typesize, -1)
    return arr.T.tobytes() + b[n:]


def _bit_shuffle(b: bytes, typesize: int) -> bytes:
    group = typesize * 8
    n = len(b) - len(b) % group
    if n == 0:
        return b
    elems = np.frombuffer(b, "u1", count=n).reshape(-1, typesize)
    bits = np.unpackbits(elems, axis=1, bitorder="little")  # (nelem, ts*8)
    planes = np.packbits(bits.T, axis=1, bitorder="little")  # (ts*8, nelem/8)
    return planes.tobytes() + b[n:]


def _bit_unshuffle(b: bytes, typesize: int) -> bytes:
    group = typesize * 8
    n = len(b) - len(b) % group
    if n == 0:
        return b
    nelem = n // typesize
    planes = np.frombuffer(b, "u1", count=n).reshape(typesize * 8, nelem // 8)
    bits = np.unpackbits(planes, axis=1, bitorder="little")  # (ts*8, nelem)
    elems = np.packbits(bits.T, axis=1, bitorder="little")  # (nelem, ts)
    return elems.tobytes() + b[n:]


def _apply_shuffle(block: bytes, flags: int, typesize: int) -> bytes:
    if flags & _FLAG_SHUFFLE:
        return _byte_shuffle(block, typesize)
    if flags & _FLAG_BITSHUFFLE:
        return _bit_shuffle(block, typesize)
    return block


def _undo_shuffle(block: bytes, flags: int, typesize: int) -> bytes:
    if flags & _FLAG_SHUFFLE:
        return _byte_unshuffle(block, typesize)
    if flags & _FLAG_BITSHUFFLE:
        return _bit_unshuffle(block, typesize)
    return block


def decompress(frame: bytes) -> bytes:
    """Decode one blosc1 frame. Handles zlib-cname frames (any shuffle) and
    memcpy'd frames of ANY cname; other cnames raise BloscFormatError."""
    if len(frame) < 16:
        raise BloscFormatError(f"blosc frame too short ({len(frame)} bytes)")
    version, _versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    if version > BLOSC_VERSION_FORMAT:
        raise BloscFormatError(f"unsupported blosc format version {version}")
    if nbytes < 0 or cbytes < 16 or cbytes > len(frame):
        raise BloscFormatError("corrupt blosc header (nbytes/cbytes out of range)")
    if typesize == 0:
        typesize = 256  # u8 wrap: c-blosc stores 256 as 0
    if nbytes == 0:
        return b""
    if flags & _FLAG_MEMCPY:
        # incompressible fallback: raw ORIGINAL buffer follows the header
        if len(frame) < 16 + nbytes:
            raise BloscFormatError("memcpy frame shorter than nbytes")
        return bytes(frame[16 : 16 + nbytes])
    codec = (flags >> 5) & 0x7
    if codec != _ZLIB_ID:
        raise BloscFormatError(
            f"pure-python blosc decodes cname=zlib only; this frame is "
            f"cname={_CODEC_NAMES.get(codec, codec)!r} (needs the blosc wheel)"
        )
    if blocksize <= 0:
        raise BloscFormatError("corrupt blosc header (blocksize <= 0)")
    nblocks = math.ceil(nbytes / blocksize)
    if len(frame) < 16 + 4 * nblocks:
        raise BloscFormatError("blosc frame truncated in block index")
    bstarts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    out = bytearray()
    for i in range(nblocks):
        bsize = min(blocksize, nbytes - i * blocksize)
        off = bstarts[i]
        if off < 16 or off + 4 > len(frame):
            raise BloscFormatError(f"block {i} offset {off} out of range")
        (csize,) = struct.unpack_from("<i", frame, off)
        if csize < 0 or off + 4 + csize > len(frame):
            raise BloscFormatError(f"block {i} stream size {csize} out of range")
        raw = frame[off + 4 : off + 4 + csize]
        block = bytes(raw) if csize == bsize else zlib.decompress(raw)
        if len(block) != bsize:
            raise BloscFormatError(
                f"block {i} decoded to {len(block)} bytes, expected {bsize}"
            )
        out += _undo_shuffle(block, flags, typesize)
    return bytes(out)


def compress(
    data: bytes,
    typesize: int = 8,
    clevel: int = 5,
    shuffle: int = 1,
    blocksize: int = 0,
) -> bytes:
    """Encode one blosc1 frame with zlib streams. ``shuffle``: 0 none,
    1 byte-shuffle, 2 bit-shuffle (c-blosc's constants)."""
    nbytes = len(data)
    if not 1 <= typesize <= 255:
        typesize = 1  # c-blosc treats out-of-range typesize as 1 (no shuffle)
    flags = _ZLIB_ID << 5
    if typesize > 1 and nbytes >= typesize:
        if shuffle == 1:
            flags |= _FLAG_SHUFFLE
        elif shuffle == 2:
            flags |= _FLAG_BITSHUFFLE

    def _memcpy_frame() -> bytes:
        head = struct.pack(
            "<BBBB iii",
            BLOSC_VERSION_FORMAT, 1, (_ZLIB_ID << 5) | _FLAG_MEMCPY,
            typesize & 0xFF, nbytes, max(nbytes, 1), nbytes + 16,
        )
        return head + data

    if nbytes == 0:
        return _memcpy_frame()
    if blocksize <= 0:
        blocksize = min(_DEFAULT_BLOCK, nbytes)
    # full blocks stay shuffle-clean: round to a typesize*8 multiple
    group = typesize * 8
    if blocksize % group and blocksize < nbytes:
        blocksize = max(group, blocksize - blocksize % group)
    blocksize = min(blocksize, nbytes)
    nblocks = math.ceil(nbytes / blocksize)
    streams: list[bytes] = []
    for i in range(nblocks):
        lo = i * blocksize
        block = data[lo : lo + blocksize]
        shuffled = _apply_shuffle(block, flags, typesize)
        comp = zlib.compress(shuffled, clevel)
        if len(comp) >= len(block):
            # stored raw; csize == bsize signals no decompression
            streams.append(struct.pack("<i", len(block)) + shuffled)
        else:
            streams.append(struct.pack("<i", len(comp)) + comp)
    total = 16 + 4 * nblocks + sum(len(s) for s in streams)
    if total >= nbytes + 16:
        return _memcpy_frame()  # compression lost: c-blosc's memcpy fallback
    head = struct.pack(
        "<BBBB iii",
        BLOSC_VERSION_FORMAT, 1, flags, typesize & 0xFF, nbytes, blocksize, total,
    )
    bstarts = []
    off = 16 + 4 * nblocks
    for s in streams:
        bstarts.append(off)
        off += len(s)
    return head + struct.pack(f"<{nblocks}i", *bstarts) + b"".join(streams)
