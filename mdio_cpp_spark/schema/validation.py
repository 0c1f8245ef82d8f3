"""MDIO dataset-spec validation (SURVEY M3).

Re-implements the *semantics* of the reference's two-stage validation
(/root/reference/mdio/dataset_validator.h:101-220) as pure Python:

  1. structural checks standing in for the embedded JSON Schema
     (dataset_schema.h) — required keys, dataType enum, dimension forms,
     chunkGrid shape, compressor allow-list;
  2. semantic checks — every referenced dimension must have a *dimension
     coordinate* (a 1-D variable whose name equals the dimension name,
     validator.h:135-167), every ``coordinates`` entry must name an existing
     variable (validator.h:185-195), dimension sizes must agree across
     variables (dataset_factory.h:676-701), and sizes must not exceed the
     max dimension size (impl.h:160-161).

Also mirrors the legacy-compressor normalization (validator.h:101-105):
``{"name": "blosc", "algorithm": ...}`` → canonical ``cname`` keys.
"""

from __future__ import annotations

from typing import Any

from mdio_cpp_spark.schema.types import MAX_DIMENSION_SIZE, SCALAR_TYPES


class SpecValidationError(ValueError):
    """Raised when a dataset JSON spec fails validation."""


def _err(msg: str) -> None:
    raise SpecValidationError(msg)


def normalize_legacy_compressors(spec: dict) -> dict:
    """Translate legacy compressor keys to canonical ones in-place
    (validator.h:101-105 behavior): ``algorithm`` → ``cname``,
    ``level`` → ``clevel``."""
    for var in spec.get("variables", []):
        comp = var.get("compressor")
        if isinstance(comp, dict):
            if "algorithm" in comp and "cname" not in comp:
                comp["cname"] = comp.pop("algorithm")
            if "level" in comp and "clevel" not in comp:
                comp["clevel"] = comp.pop("level")
            # JSON numbers are untyped: the reference's resolve_blosc_clevel
            # (dataset_factory.h:253-265) compares numerically, so an
            # integral float like 5.0 is a valid level — canonicalize it to
            # int here so every downstream consumer sees an int
            lvl = comp.get("clevel")
            if (isinstance(lvl, float) and not isinstance(lvl, bool)
                    and lvl.is_integer()):
                comp["clevel"] = int(lvl)
    return spec


def _dim_entries(var: dict) -> list[tuple[str, int | None]]:
    """Normalize the two dimension forms: list[{"name","size"}] or list[str]."""
    out: list[tuple[str, int | None]] = []
    for d in var.get("dimensions", []):
        if isinstance(d, dict):
            out.append((str(d["name"]), int(d["size"])))
        else:
            out.append((str(d), None))
    return out


def _check_structure(spec: dict) -> None:
    if not isinstance(spec, dict):
        _err("spec must be a JSON object")
    if "metadata" not in spec or "variables" not in spec:
        _err("spec requires 'metadata' and 'variables'")
    md = spec["metadata"]
    if not isinstance(md.get("name"), str):
        _err("metadata.name must be a string")
    if "apiVersion" not in md:
        _err("metadata.apiVersion is required")
    if not isinstance(spec["variables"], list) or not spec["variables"]:
        _err("variables must be a non-empty list")
    for var in spec["variables"]:
        if "name" not in var:
            _err("every variable requires a name")
        name = var["name"]
        dt = var.get("dataType")
        if isinstance(dt, dict):
            fields = dt.get("fields")
            if not isinstance(fields, list) or not fields:
                _err(f"variable {name!r}: struct dataType requires non-empty fields")
            for f in fields:
                if f.get("format") not in SCALAR_TYPES:
                    _err(f"variable {name!r}: unsupported field format {f.get('format')!r}")
        elif dt not in SCALAR_TYPES:
            _err(f"variable {name!r}: unsupported dataType {dt!r}")
        if "dimensions" not in var or not var["dimensions"]:
            _err(f"variable {name!r}: dimensions required")
        first_is_obj = isinstance(var["dimensions"][0], dict)
        for d in var["dimensions"]:
            if isinstance(d, dict) != first_is_obj:
                _err(f"variable {name!r}: mixed dimension forms")
            if isinstance(d, dict):
                size = int(d.get("size", -1))
                if size <= 0:
                    _err(f"variable {name!r}: dimension {d.get('name')!r} needs size > 0")
                if size > MAX_DIMENSION_SIZE:
                    _err(f"variable {name!r}: dimension {d.get('name')!r} exceeds max size")
        comp = var.get("compressor")
        if comp is not None:
            # the reference accepts only blosc (dataset_factory.h:295-297);
            # we additionally accept the stdlib codecs our chunks use
            if comp.get("name") not in ("blosc", "zlib", "gzip", None):
                _err(f"variable {name!r}: unsupported compressor {comp.get('name')!r}")
            # parameter parity with the reference's compressor matrix
            # (resolve_blosc_clevel, dataset_factory.h:253-265: clevel/legacy
            # 'level' must be in [0,9]; the 1,134-LoC error-path suite is
            # dataset_factory_test.cc:668-902) — refuse BEFORE any store I/O
            clevel = comp.get("clevel", comp.get("level", 5))
            if isinstance(clevel, bool) or not isinstance(clevel, int) or not (0 <= clevel <= 9):
                _err(
                    f"variable {name!r}: compressor level must be between "
                    f"0 and 9 (got {clevel!r})"
                )
            if comp.get("name") == "blosc":
                cname = comp.get("cname", comp.get("algorithm", "lz4"))
                if cname not in ("zlib", "lz4", "blosclz", "snappy", "zstd"):
                    _err(
                        f"variable {name!r}: unsupported blosc cname "
                        f"{cname!r} (supported: zlib/lz4/blosclz/snappy/zstd)"
                    )
                shuffle = comp.get("shuffle", 1)
                if not (
                    (isinstance(shuffle, int) and not isinstance(shuffle, bool)
                     and shuffle in (0, 1, 2))
                    or shuffle in ("noshuffle", "shuffle", "bitshuffle")
                ):
                    _err(
                        f"variable {name!r}: blosc shuffle must be 0/1/2 or "
                        f"noshuffle/shuffle/bitshuffle (got {shuffle!r})"
                    )
                blocksize = comp.get("blocksize", 0)
                if isinstance(blocksize, bool) or not isinstance(blocksize, int) or blocksize < 0:
                    _err(
                        f"variable {name!r}: blosc blocksize must be a "
                        f"non-negative int (got {blocksize!r})"
                    )
        cg = (var.get("metadata") or {}).get("chunkGrid")
        if cg is not None:
            shape = (cg.get("configuration") or {}).get("chunkShape")
            if cg.get("name") != "regular" or not shape:
                _err(f"variable {name!r}: chunkGrid must be regular with chunkShape")
            if len(shape) != len(var["dimensions"]):
                _err(f"variable {name!r}: chunkShape rank != dimensions rank")


def _check_semantics(spec: dict) -> None:
    # dimension coordinates: 1-D variables whose name == their dimension name
    # (validator.h:140-155)
    dim_coords: set[str] = set()
    var_names: set[str] = set()
    dim_sizes: dict[str, int] = {}
    for var in spec["variables"]:
        var_names.add(var["name"])
        dims = _dim_entries(var)
        if len(dims) == 1 and isinstance(var["dimensions"][0], dict) and dims[0][0] == var["name"]:
            dim_coords.add(var["name"])
        for dname, size in dims:
            if size is not None:
                prev = dim_sizes.setdefault(dname, size)
                if prev != size:
                    _err(f"dimension {dname!r} has conflicting sizes {prev} and {size}")
    for var in spec["variables"]:
        if var["name"] not in dim_coords:
            for dname, _ in _dim_entries(var):
                if dname not in dim_coords:
                    _err(
                        f"Variable {var['name']!r} has a dimension {dname!r} "
                        "that is not a dimension coordinate."
                    )
        # the coordinates-must-exist check applies to EVERY variable,
        # dimension coordinates included (validator.h:185-195 — a dangling
        # reference on a dim coord is just as broken)
        for coord in var.get("coordinates", []):
            if coord not in var_names:
                _err(f"Variable {var['name']!r} has a coordinate {coord!r} that is not a Variable.")
    # every name-only dimension reference must have a size known from some
    # NamedDimension form (needed to build the arrays at all)
    for var in spec["variables"]:
        for dname, size in _dim_entries(var):
            if size is None and dname not in dim_sizes:
                _err(f"dimension {dname!r} referenced by {var['name']!r} has no declared size")


def validate_dataset_spec(spec: dict) -> dict:
    """Validate an MDIO dataset JSON spec; returns the (normalized) spec.

    Raises SpecValidationError with a reference-style message on failure
    (validate_dataset, validator.h:208-220).
    """
    normalize_legacy_compressors(spec)
    _check_structure(spec)
    _check_semantics(spec)
    return spec


def dim_sizes(spec: dict) -> dict[str, int]:
    """Collected dimension sizes across all variables (post-validation)."""
    out: dict[str, int] = {}
    for var in spec["variables"]:
        for d in var.get("dimensions", []):
            if isinstance(d, dict):
                out[str(d["name"])] = int(d["size"])
    return out


def variable_specs(spec: dict) -> list[dict[str, Any]]:
    """Normalize each variable entry into a flat dict the store layer uses:
    name, dataType, dims (names), shape, chunks, compressor, attrs blocks."""
    sizes = dim_sizes(spec)
    out = []
    for var in spec["variables"]:
        dims = [d["name"] if isinstance(d, dict) else str(d) for d in var["dimensions"]]
        shape = [sizes[d] for d in dims]
        md = var.get("metadata") or {}
        cg = md.get("chunkGrid")
        chunks = list((cg or {}).get("configuration", {}).get("chunkShape", shape))
        out.append(
            {
                "name": var["name"],
                "dataType": var["dataType"],
                "dims": dims,
                "shape": shape,
                "chunks": chunks,
                "compressor": var.get("compressor"),
                "longName": var.get("longName"),
                "coordinates": var.get("coordinates", []),
                "metadata": {k: v for k, v in md.items() if k != "chunkGrid"},
            }
        )
    return out
