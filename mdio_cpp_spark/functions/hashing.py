"""Portable hashing primitives shared by dedup / LSH operators.

Everything is built on md5-of-string because md5 is the one hash with
identical semantics in Spark (``F.md5`` → lowercase hex) and DuckDB
(``md5(varchar)`` → lowercase hex), which lets every probabilistic operator
(MinHash, SimHash, sign-LSH) have an exact SQL oracle. Seeded families are
derived by prefixing the seed: ``md5('<seed>:' || x)``.

For pure-Spark production paths ``xxhash64`` would be faster; the md5 family
is the *portable* contract and the operators take the hash fn as a knob.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def seeded_md5(col: Column, seed: int) -> Column:
    """md5('<seed>:' || col) — one member of a seeded hash family."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def minhash(shingles: Column, seed: int) -> Column:
    """MinHash for one permutation: lexicographic min of seeded md5 hex over
    the shingle set. Hex strings are ASCII so string-min == numeric-min of
    the underlying 128-bit value — portable across engines/collations."""
    return F.array_min(F.transform(shingles, lambda s: seeded_md5(s, seed)))


def hyperplane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes for sign-LSH, derived from
    md5(p:i) on the *driver* (plain hashlib) and embedded as literals in both
    the Spark plan and the SQL oracle — no runtime hashing per element."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            row.append(1.0 if h[0] >= "8" else -1.0)
        planes.append(row)
    return planes
