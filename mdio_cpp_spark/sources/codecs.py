"""Per-chunk compression codecs.

The reference accepts only Blosc (dataset_factory.h:295-297,344-346) because
TensorStore ships it. This container has no blosc/numcodecs wheel, so the
engine's own stores default to stdlib codecs (zlib/gzip). Blosc frames are
handled in two tiers: the ``blosc`` wheel when importable, else a pure-Python
blosc1 codec (sources/blosc1.py, public frame format) that covers
ALL FIVE cnames with any shuffle: ``zlib`` (stdlib), ``lz4``
(sources/lz4.py), ``blosclz`` (sources/blosclz.py), ``snappy``
(sources/snappy.py) and ``zstd`` (sources/zstd.py, full RFC 8878
decode) — every blosc configuration the reference accepts is readable
with no wheel.

Zarr v2 compressor JSON: ``null`` | {"id": "zlib"|"gzip"|"blosc", ...}.
Zarr v3 codec chain: [{"name": "bytes", ...}, {"name": "gzip"|"zstd", ...}].
"""

from __future__ import annotations

import gzip
import struct
import zlib
from typing import Any

try:  # optional, not in this container
    import blosc as _blosc  # type: ignore
except ImportError:  # pragma: no cover
    _blosc = None

# pure-Python blosc1 fallback (all five cnames, shuffle 0/1/2) from the
# public frame formats — stores written with ANY of the reference's blosc
# configs are readable with NO wheel
from mdio_cpp_spark.sources import blosc1 as _blosc1

# zstd is the de-facto default codec for externally-written Zarr v3 stores.
# Python 3.14+ ships compression.zstd in the stdlib; earlier interpreters can
# have the `zstandard` wheel. Neither is in this container (probe log in
# tests/INTEROP_PROBE.md) — the pure-Python RFC 8878 decoder
# (sources/zstd.py: full FSE + Huffman) covers DECODE wheel-free, and its
# compressed-block encoder (Huffman literals + predefined-FSE sequences,
# raw-block fallback) covers WRITE for spec-requested zstd chains. The
# stdlib/wheel still takes priority when importable.
_zstd_compress = _zstd_decompress = None
try:  # pragma: no cover - stdlib on 3.14+
    from compression import zstd as _stdlib_zstd  # type: ignore

    def _zstd_compress(data: bytes, level: int) -> bytes:
        return _stdlib_zstd.compress(data, level)

    def _zstd_decompress(data: bytes) -> bytes:
        return _stdlib_zstd.decompress(data)
except ImportError:
    try:  # pragma: no cover - optional wheel
        import zstandard as _zstandard  # type: ignore

        def _zstd_compress(data: bytes, level: int) -> bytes:
            return _zstandard.ZstdCompressor(level=level).compress(data)

        def _zstd_decompress(data: bytes) -> bytes:
            return _zstandard.ZstdDecompressor().decompress(data)
    except ImportError:
        pass

if _zstd_decompress is None:
    from mdio_cpp_spark.sources import zstd as _pyzstd

    def _zstd_compress(data: bytes, level: int) -> bytes:
        return _pyzstd.compress(data, level)

    def _zstd_decompress(data: bytes) -> bytes:
        return _pyzstd.decompress(data)


class CodecError(RuntimeError):
    pass


# CRC-32C (Castagnoli, reflected polynomial 0x82F63B78) — the checksum the
# zarr v3 `crc32c` codec and the sharding_indexed index default to
# (zarr-python writes index_codecs [bytes, crc32c]). The stdlib has only
# CRC-32 (zlib.crc32, polynomial 0xEDB88320), so this is table-driven pure
# Python from the public polynomial.
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _blosc_shuffle(val: Any) -> int:
    """Map a v3 blosc ``shuffle`` config (spec: ``noshuffle``/``shuffle``/
    ``bitshuffle``, or a v2-style int) to the blosc wheel's int constant."""
    if isinstance(val, int):
        return val
    return {"noshuffle": 0, "shuffle": 1, "bitshuffle": 2}.get(str(val), 1)


def compress_v2(data: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return data
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.compress(data, compressor.get("level", 5))
    if cid == "gzip":
        return gzip.compress(data, compresslevel=compressor.get("level", 5))
    if cid == "blosc":
        cname = compressor.get("cname", "lz4")
        if _blosc is not None:
            return _blosc.compress(
                data,
                typesize=compressor.get("typesize", 8) or 8,
                cname=cname,
                clevel=compressor.get("clevel", 5),
                shuffle=compressor.get("shuffle", 1),
            )
        if cname in ("zlib", "lz4", "blosclz", "snappy", "zstd"):
            return _blosc1.compress(
                data,
                typesize=compressor.get("typesize", 8) or 8,
                clevel=compressor.get("clevel", 5),
                shuffle=compressor.get("shuffle", 1),
                cname=cname,
            )
        raise CodecError(f"unknown blosc cname {cname!r}")
    raise CodecError(f"unsupported v2 compressor {cid!r}")


# ---------------------------------------------------------------- v2 filters
#
# numcodecs array-to-array filter chain (zarr v2 `.zarray` "filters"). The
# reference passes the chain straight through to TensorStore
# (/root/reference/mdio/zarr/zarr_v2.h:78); here the two filters that appear
# in externally-written seismic/scientific v2 stores are implemented from the
# numcodecs spec. Wire contract (per numcodecs): ENCODE applies filters in
# declaration order, each stage viewing the previous stage's BYTES as its
# `dtype` and emitting `astype` (default: dtype); the compressor runs last.
# DECODE reverses: decompress, then walk the chain BACKWARDS, each stage
# viewing bytes as `astype` and emitting `dtype`. Unknown filter ids refuse
# loudly at metadata-parse time (zarr_store._meta_from_v2), never here.

V2_FILTER_IDS = ("delta", "fixedscaleoffset", "quantize", "shuffle")


def _filter_dtypes(f: dict) -> tuple[Any, Any]:
    import numpy as np

    dtype = np.dtype(f["dtype"])
    astype = np.dtype(f["astype"]) if f.get("astype") else dtype
    return dtype, astype


def _quantize_scale(digits: int) -> float:
    """numcodecs.Quantize's bit-truncation scale for a decimal precision:
    the smallest power of two that resolves 10**-digits."""
    import math

    exp = math.log10(10.0 ** -int(digits))
    exp = int(math.floor(exp)) if exp < 0 else int(math.ceil(exp))
    bits = math.ceil(math.log(10.0 ** -exp, 2))
    return 2.0 ** bits


def _byte_shuffle(raw: bytes, elementsize: int, forward: bool) -> bytes:
    """numcodecs.Shuffle: regroup bytes by intra-element lane. A trailing
    partial element (len % elementsize) passes through unshuffled — the
    c-blosc shuffle's documented leftover handling (memcpy of the remainder
    after the lane transpose). Zarr v2 chunks from numcodecs always have
    len % elementsize == 0 (chunk bytes are a whole number of elements), so
    the divisible case is the interop surface; the indivisible remainder
    rule is pinned against numcodecs by
    tests/test_zarr.py::test_shuffle_numcodecs_differential (importorskip —
    skipped where the wheel is absent)."""
    import numpy as np

    es = max(1, int(elementsize))
    n = len(raw) // es * es
    body, tail = raw[:n], raw[n:]
    a = np.frombuffer(body, dtype="u1")
    if forward:
        out = a.reshape(-1, es).T.tobytes(order="C")
    else:
        out = a.reshape(es, -1).T.tobytes(order="C")
    return out + tail


def encode_v2_filters(raw: bytes, filters: list[dict] | tuple) -> bytes:
    """Run the filter chain forward over serialized chunk bytes."""
    import numpy as np

    buf = raw
    for f in filters:
        fid = f.get("id")
        if fid == "shuffle":
            buf = _byte_shuffle(buf, f.get("elementsize", 4), forward=True)
            continue
        dtype, astype = _filter_dtypes(f)
        arr = np.frombuffer(buf, dtype=dtype)
        if fid == "delta":
            # numcodecs.Delta: enc[0] = arr[0]; enc[1:] = diff(arr), cast
            enc = np.empty(arr.shape, dtype=astype)
            if len(arr):
                enc[0] = arr[0]
                enc[1:] = np.diff(arr)
        elif fid == "fixedscaleoffset":
            # numcodecs.FixedScaleOffset: round((x - offset) * scale), cast
            enc = np.around((arr - f["offset"]) * f["scale"]).astype(astype)
        elif fid == "quantize":
            # numcodecs.Quantize: LOSSY bit truncation to ~digits decimals —
            # round(scale*x)/scale with a power-of-two scale, then cast
            scale = _quantize_scale(f["digits"])
            enc = (np.around(scale * arr) / scale).astype(astype)
        else:  # pragma: no cover - refused at parse time
            raise CodecError(f"unsupported v2 filter {fid!r}")
        buf = enc.tobytes()
    return buf


def decode_v2_filters(raw: bytes, filters: list[dict] | tuple) -> bytes:
    """Run the filter chain backward over decompressed chunk bytes."""
    import numpy as np

    buf = raw
    for f in reversed(list(filters)):
        fid = f.get("id")
        if fid == "shuffle":
            buf = _byte_shuffle(buf, f.get("elementsize", 4), forward=False)
            continue
        dtype, astype = _filter_dtypes(f)
        enc = np.frombuffer(buf, dtype=astype)
        if fid == "delta":
            dec = np.cumsum(enc, dtype=dtype)
        elif fid in ("fixedscaleoffset", "quantize"):
            # quantize decode is a plain view-and-cast (the loss happened
            # at encode); fso reverses its affine map
            if fid == "fixedscaleoffset":
                dec = (enc / f["scale"] + f["offset"]).astype(dtype)
            else:
                dec = enc.astype(dtype)
        else:  # pragma: no cover - refused at parse time
            raise CodecError(f"unsupported v2 filter {fid!r}")
        buf = dec.tobytes()
    return buf


def decompress_v2(data: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return data
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(data)
    if cid == "gzip":
        return gzip.decompress(data)
    if cid == "blosc":
        if _blosc is not None:
            return _blosc.decompress(data)
        try:
            return _blosc1.decompress(data)
        except _blosc1.BloscFormatError as e:
            raise CodecError(str(e)) from e
    raise CodecError(f"unsupported v2 compressor {cid!r}")


def compress_v3(data: bytes, codecs: list[dict[str, Any]]) -> bytes:
    """Apply a v3 codec chain (bytes→bytes stages only; the array→bytes
    'bytes' codec is handled by the caller's C-order serialization)."""
    for codec in codecs:
        name = codec.get("name")
        conf = codec.get("configuration") or {}
        if name in ("bytes", "transpose"):
            # both are array-level concerns the chunk codec already applied:
            # endianness via stored_dtype (the caller serializes with the
            # declared on-disk byte order — decode mirrors this), transpose
            # via the permuted layout in _raw_from_block
            continue
        if name == "gzip":
            data = gzip.compress(data, compresslevel=conf.get("level", 5))
        elif name == "zlib":
            data = zlib.compress(data, conf.get("level", 5))
        elif name == "zstd":
            data = _zstd_compress(data, conf.get("level", 3))
        elif name == "blosc":
            cname = conf.get("cname", "lz4")
            if _blosc is not None:
                data = _blosc.compress(data, typesize=conf.get("typesize", 8) or 8,
                                       cname=cname,
                                       clevel=conf.get("clevel", 5),
                                       shuffle=_blosc_shuffle(conf.get("shuffle", "shuffle")))
            elif cname in ("zlib", "lz4", "blosclz", "snappy", "zstd"):
                data = _blosc1.compress(data, typesize=conf.get("typesize", 8) or 8,
                                        clevel=conf.get("clevel", 5),
                                        shuffle=_blosc_shuffle(conf.get("shuffle", "shuffle")),
                                        cname=cname)
            else:
                raise CodecError(f"unknown blosc cname {cname!r}")
        elif name == "crc32c":
            data = data + struct.pack("<I", crc32c(data))
        else:
            raise CodecError(f"unsupported v3 codec {name!r}")
    return data


def decompress_v3(data: bytes, codecs: list[dict[str, Any]]) -> bytes:
    for codec in reversed(codecs):
        name = codec.get("name")
        if name in ("bytes", "transpose"):
            continue  # transpose is array-level; applied by the chunk codec
        if name == "gzip":
            data = gzip.decompress(data)
        elif name == "zlib":
            data = zlib.decompress(data)
        elif name == "zstd":
            try:
                data = _zstd_decompress(data)
            except Exception as e:  # wheel and pure paths raise differently
                raise CodecError(f"zstd chunk: {e}") from e
        elif name == "blosc":
            if _blosc is not None:
                data = _blosc.decompress(data)
            else:
                try:
                    data = _blosc1.decompress(data)
                except _blosc1.BloscFormatError as e:
                    raise CodecError(str(e)) from e
        elif name == "crc32c":
            if len(data) < 4:
                raise CodecError("crc32c codec: payload shorter than checksum")
            body, want = data[:-4], struct.unpack("<I", data[-4:])[0]
            got = crc32c(body)
            if got != want:
                raise CodecError(
                    f"crc32c mismatch: stored {want:#010x}, computed {got:#010x}")
            data = body
        else:
            raise CodecError(f"unsupported v3 codec {name!r}")
    return data
