"""MDIO scalar-type system: name ↔ Zarr v2/v3 dtype strings ↔ numpy ↔ Spark,
plus the fill-value table.

Semantics mirrored from the reference (behavior, not code):
  * supported scalar set — /root/reference/mdio/impl.h:163-179 and the schema
    enum (dataset_schema.h:621-643); float128/complex256/V240 appear in the
    schema enum but not in the C++ constants → unsupported here too.
  * fill values — dataset_factory.h:500-545: floats→NaN, complex→[NaN,NaN],
    ints→type max, bool→null (v2) / false (v3), structured→zero bytes.
  * unsigned widening — Spark has no unsigned ints, so each uintN widens to
    the next signed width; uint64 → Decimal(20,0) (SURVEY §1.2).
  * header-only numpy kinds U/S/O/M/m are metadata-only in the reference
    (zarr/zarr_v2.h:139-162); we CAN scan strings/datetimes natively, but we
    still tag them so Dataset.open can reproduce the reference's skip rule.
"""

from __future__ import annotations

import base64
import math
from dataclasses import dataclass
from typing import Any

import numpy as np
from pyspark.sql import types as T

__all__ = [
    "ScalarType",
    "SCALAR_TYPES",
    "parse_v2_dtype",
    "v2_dtype_str",
    "v3_dtype_name",
    "numpy_dtype_for",
    "spark_type_for",
    "fill_value_for",
    "struct_numpy_dtype",
    "HEADER_ONLY_KINDS",
]

# numpy "kind" letters the reference treats as metadata-only (zarr_v2.h:139-162)
HEADER_ONLY_KINDS = frozenset("USOMm")

# Maximum dimension size (impl.h:160-161, checked at dataset_factory.h:682-687)
MAX_DIMENSION_SIZE = 0x3FFFFFFFFFFFFFFF


@dataclass(frozen=True)
class ScalarType:
    name: str          # MDIO dataType name
    v2: str            # Zarr v2 dtype string (little-endian / byte-order-free)
    v3: str            # Zarr v3 data_type name
    numpy: str         # numpy dtype string
    spark: T.DataType  # Spark column type (widened where Spark lacks the type)
    fill: Any          # MDIO fill value (the JSON-spec value; NaN for floats)


def _nan() -> float:
    return float("nan")


SCALAR_TYPES: dict[str, ScalarType] = {
    t.name: t
    for t in [
        ScalarType("bool", "|b1", "bool", "bool", T.BooleanType(), None),
        ScalarType("int8", "|i1", "int8", "int8", T.ByteType(), np.iinfo(np.int8).max),
        ScalarType("int16", "<i2", "int16", "int16", T.ShortType(), np.iinfo(np.int16).max),
        ScalarType("int32", "<i4", "int32", "int32", T.IntegerType(), np.iinfo(np.int32).max),
        ScalarType("int64", "<i8", "int64", "int64", T.LongType(), np.iinfo(np.int64).max),
        ScalarType("uint8", "|u1", "uint8", "uint8", T.ShortType(), np.iinfo(np.uint8).max),
        ScalarType("uint16", "<u2", "uint16", "uint16", T.IntegerType(), np.iinfo(np.uint16).max),
        ScalarType("uint32", "<u4", "uint32", "uint32", T.LongType(), np.iinfo(np.uint32).max),
        ScalarType("uint64", "<u8", "uint64", "uint64", T.DecimalType(20, 0), np.iinfo(np.uint64).max),
        ScalarType("float16", "<f2", "float16", "float16", T.FloatType(), _nan()),
        ScalarType("float32", "<f4", "float32", "float32", T.FloatType(), _nan()),
        ScalarType("float64", "<f8", "float64", "float64", T.DoubleType(), _nan()),
        ScalarType("complex64", "<c8", "complex64", "complex64",
                   T.StructType([T.StructField("re", T.FloatType()), T.StructField("im", T.FloatType())]),
                   [_nan(), _nan()]),
        ScalarType("complex128", "<c16", "complex128", "complex128",
                   T.StructType([T.StructField("re", T.DoubleType()), T.StructField("im", T.DoubleType())]),
                   [_nan(), _nan()]),
    ]
}

_V2_TO_NAME = {t.v2: t.name for t in SCALAR_TYPES.values()}
# accept the alternate byte-order prefixes zarr writers emit for 1-byte types
_V2_TO_NAME.update({"<i1": "int8", "<u1": "uint8", "<b1": "bool"})
_V3_TO_NAME = {t.v3: t.name for t in SCALAR_TYPES.values()}


def parse_v2_dtype(dtype: Any) -> tuple[str | None, np.dtype, bool]:
    """Parse a Zarr v2 ``dtype`` JSON entry.

    Returns ``(mdio_name_or_None, numpy_dtype, header_only)``. Struct dtypes
    (list-of-[name, format] pairs) return ``(None, record_dtype, False)``.
    ``header_only`` is True for the numpy kinds the reference cannot open as
    arrays (zarr_v2.h:139-162) — string/object/datetime/timedelta.
    """
    if isinstance(dtype, (list, tuple)):
        np_dt = np.dtype([(str(n), str(f)) for n, f in dtype])
        return None, np_dt, False
    s = str(dtype)
    np_dt = np.dtype(s)
    header_only = np_dt.kind in HEADER_ONLY_KINDS
    name = _V2_TO_NAME.get(s)
    if name is None and not header_only:
        # big-endian stores (some external zarr writers emit them) keep the
        # stored byte order in np_dtype — the chunk decoder byteswaps to
        # native after frombuffer; the mdio scalar name is order-independent
        name = np_dt.name if np_dt.name in SCALAR_TYPES else None
    return name, np_dt, header_only


def v2_dtype_str(name: str) -> str:
    return SCALAR_TYPES[name].v2


def v3_dtype_name(name: str) -> str:
    return SCALAR_TYPES[name].v3


def numpy_dtype_for(name: str) -> np.dtype:
    return np.dtype(SCALAR_TYPES[name].numpy)


def spark_type_for(name: str) -> T.DataType:
    return SCALAR_TYPES[name].spark


def struct_numpy_dtype(fields: list[dict]) -> np.dtype:
    """Build a numpy record dtype from an MDIO ``dataType.fields`` list
    (entries ``{"name": ..., "format": ...}``; formats are MDIO scalar names
    — dataset_factory.h struct handling)."""
    out = []
    for f in fields:
        fmt = f["format"]
        if fmt not in SCALAR_TYPES:
            raise ValueError(f"unsupported struct field format {fmt!r}")
        out.append((f["name"], SCALAR_TYPES[fmt].numpy))
    return np.dtype(out)


def fill_value_for(name_or_fields: Any, zarr_version: int = 2) -> Any:
    """MDIO fill value for a dataType (dataset_factory.h:500-545 semantics).

    Scalars: ints→type max, floats→NaN, complex→[NaN, NaN], bool→None for v2
    and False for v3. Struct dtypes: zero bytes (length = packed record size),
    returned base64-encoded as the .zarray JSON requires.
    """
    if isinstance(name_or_fields, dict) and "fields" in name_or_fields:
        nbytes = struct_numpy_dtype(name_or_fields["fields"]).itemsize
        return base64.b64encode(b"\x00" * nbytes).decode("ascii")
    t = SCALAR_TYPES[name_or_fields]
    if t.name == "bool":
        return False if zarr_version == 3 else None
    return t.fill


def encode_fill_json(fill: Any) -> Any:
    """Encode a fill value for .zarray JSON (NaN → the string 'NaN' per the
    Zarr v2 spec; complex → [re, im] pair; everything else passes through)."""
    if isinstance(fill, complex):
        return [encode_fill_json(fill.real), encode_fill_json(fill.imag)]
    if isinstance(fill, float) and math.isnan(fill):
        return "NaN"
    if isinstance(fill, list):
        return ["NaN" if isinstance(v, float) and math.isnan(v) else v for v in fill]
    return fill


def decode_fill_json(fill: Any, np_dt: np.dtype) -> Any:
    """Decode a .zarray/zarr.json fill value into a numpy-usable scalar."""
    if fill is None:
        return None
    if np_dt.fields is not None:
        if isinstance(fill, str):
            raw = base64.b64decode(fill)
            return np.frombuffer(raw[: np_dt.itemsize].ljust(np_dt.itemsize, b"\x00"), dtype=np_dt)[0]
        return np.zeros((), dtype=np_dt)[()]
    if isinstance(fill, str):
        if fill == "NaN":
            return np_dt.type(float("nan")) if np_dt.kind in "fc" else np_dt.type(0)
        if fill in ("Infinity", "-Infinity"):
            return np_dt.type(float(fill.replace("Infinity", "inf")))
    if isinstance(fill, list) and np_dt.kind == "c":
        re_ = float("nan") if fill[0] == "NaN" else float(fill[0])
        im_ = float("nan") if fill[1] == "NaN" else float(fill[1])
        return np_dt.type(complex(re_, im_))
    return np_dt.type(fill)
