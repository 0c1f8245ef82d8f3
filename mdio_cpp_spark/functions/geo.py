"""UTM → geographic conversion (Transverse Mercator inverse series).

The reference's ``seismic_reader`` example geolocates a survey: it reads the
``cdp-x``/``cdp-y`` UTM coordinate grids, computes their extents, converts
the corners to latitude/longitude, and pinpoints the peak/trough amplitude
positions on a map (``examples/seismic_reader/utm.hh:82-148`` ``utm_to_geo``,
``main.cc:31-127``). The constants below are the example's datum — GDA94 /
MGA Zone 51 (EPSG:28351), a public standard projection.

Engine-duplication is the classic failure mode for a formula this long
(fourteen chained transcendental terms): a Spark expression tree and a
hand-written SQL oracle WILL drift. So the formula exists ONCE, as SQL text
(`UTM_STAGES`): the Spark side folds the stages through ``selectExpr`` (each
stage is one deterministic built-in — whole-stage-codegen'd, no Python in
the hot path) and the DuckDB oracle nests the *same text* in subselects.
Every numeric constant is pre-folded in Python and embedded via ``repr``
(shortest round-tripping literal → both engines parse to the identical
double). ``pow(x, 1.5)`` is written ``x * SQRT(x)``: sqrt is IEEE
correctly-rounded in both engines, pow is not.

Remaining cross-engine drift is the libm-vs-java.lang.Math ULP difference of
SIN/COS/TAN — ~1e-13 degrees after the full chain — absorbed by the 6-dp
display rounding (≈ 0.1 m; the a15 rounding-contract rule).

At 100-TB scale the conversion is pure map-side column math over the
coordinate-grid scan: no shuffle, no UDF, prunes with the chunk grid.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame

# ---- GDA94 / MGA Zone 51 datum (utm.hh:84-93) ------------------------------
A = 6378137.0                   # semi-major axis
F_FLAT = 1.0 / 298.257222101    # flattening
K0 = 0.9996                     # scale factor
CENTRAL_MERIDIAN_DEG = 123.0    # zone 51
FALSE_EASTING = 500000.0
FALSE_NORTHING = 10000000.0     # southern hemisphere

# ---- derived constants, folded once in Python (utm.hh:95-112) --------------
E2 = 2.0 * F_FLAT - F_FLAT * F_FLAT
EP2 = E2 / (1.0 - E2)
M_DENOM = A * (1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0)
_SQ = math.sqrt(1.0 - E2)
E1 = (1.0 - _SQ) / (1.0 + _SQ)
J1 = 3.0 * E1 / 2.0 - 27.0 * E1**3 / 32.0
J2 = 21.0 * E1**2 / 16.0 - 55.0 * E1**4 / 32.0
J3 = 151.0 * E1**3 / 96.0
J4 = 1097.0 * E1**4 / 512.0
A1ME2 = A * (1.0 - E2)
CM_RAD = CENTRAL_MERIDIAN_DEG * math.pi / 180.0


def _lit(x: float) -> str:
    """Shortest literal that round-trips to the same IEEE double in both
    engines' SQL parsers."""
    return repr(float(x))


# One stage per intermediate of utm.hh:96-148, over input columns
# ``easting``/``northing``; later stages reference earlier ones by name.
# The ``g_`` prefix keeps the scratch columns collision-free with real ones.
UTM_STAGES: list[tuple[str, str]] = [
    # meridian distance → footprint-latitude series argument (utm.hh:100-104)
    ("g_mu", f"(northing - {_lit(FALSE_NORTHING)}) / {_lit(K0 * M_DENOM)}"),
    # footprint latitude (utm.hh:106-114)
    ("g_fp",
     f"g_mu + {_lit(J1)}*SIN(2.0*g_mu) + {_lit(J2)}*SIN(4.0*g_mu)"
     f" + {_lit(J3)}*SIN(6.0*g_mu) + {_lit(J4)}*SIN(8.0*g_mu)"),
    ("g_sfp", "SIN(g_fp)"),
    ("g_cfp", "COS(g_fp)"),
    ("g_tfp", "TAN(g_fp)"),
    ("g_s1", f"1.0 - {_lit(E2)}*g_sfp*g_sfp"),
    ("g_c1", f"{_lit(EP2)}*g_cfp*g_cfp"),
    ("g_t1", "g_tfp*g_tfp"),
    # radii of curvature; pow(s,1.5) as s*sqrt(s) (utm.hh:121-124)
    ("g_r1", f"{_lit(A1ME2)} / (g_s1 * SQRT(g_s1))"),
    ("g_n1", f"{_lit(A)} / SQRT(g_s1)"),
    ("g_d", f"(easting - {_lit(FALSE_EASTING)}) / (g_n1 * {_lit(K0)})"),
    # latitude series (utm.hh:128-133)
    ("lat",
     "DEGREES(g_fp - (g_tfp/(g_r1*g_n1)) * ("
     "g_d*g_d/2.0"
     f" - (5.0 + 3.0*g_t1 + 10.0*g_c1 - 4.0*g_c1*g_c1 - 9.0*{_lit(EP2)})"
     "*g_d*g_d*g_d*g_d/24.0"
     f" + (61.0 + 90.0*g_t1 + 298.0*g_c1 + 45.0*g_t1*g_t1 - 252.0*{_lit(EP2)}"
     " - 3.0*g_c1*g_c1)*g_d*g_d*g_d*g_d*g_d*g_d/720.0))"),
    # longitude series (utm.hh:135-140)
    ("lon",
     f"DEGREES({_lit(CM_RAD)} + ("
     "g_d - (1.0 + 2.0*g_t1 + g_c1)*g_d*g_d*g_d/6.0"
     f" + (5.0 - 2.0*g_c1 + 28.0*g_t1 - 3.0*g_c1*g_c1 + 8.0*{_lit(EP2)}"
     " + 24.0*g_t1*g_t1)*g_d*g_d*g_d*g_d*g_d/120.0)/g_cfp)"),
]

_SCRATCH = [n for n, _ in UTM_STAGES if n.startswith("g_")]


def apply_utm_stages(df: DataFrame) -> DataFrame:
    """Fold the shared stages over a frame with ``easting``/``northing``
    columns; adds ``lat``/``lon`` (degrees, unrounded) and drops scratch.

    Inputs are cast to double first: Spark parses bare ``123.0`` SQL
    literals as DECIMAL, and a caller who derived the coordinates with such
    literals would otherwise run the early stages in decimal arithmetic —
    numerically different from the double contract the oracle shares."""
    df = df.withColumn("easting", df["easting"].cast("double")).withColumn(
        "northing", df["northing"].cast("double"))
    for name, expr in UTM_STAGES:
        df = df.selectExpr("*", f"({expr}) AS {name}")
    return df.drop(*_SCRATCH)


def oracle_utm_sql(inner: str, final_select: str) -> str:
    """Wrap ``inner`` (any SQL producing easting/northing) in the SAME stage
    text the Spark side folds, then project ``final_select``."""
    q = inner
    for name, expr in UTM_STAGES:
        q = f"SELECT *, ({expr}) AS {name} FROM ({q})"
    return f"SELECT {final_select} FROM ({q})"


EARTH_R_M = 6371008.8  # IUGG mean earth radius, meters


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in meters as SQL text over four degree-valued
    column names — one formula string shared by the Spark ``selectExpr``
    and the DuckDB oracle (the same single-source contract as UTM_STAGES).
    RADIANS/SIN/COS/ASIN/SQRT all exist in both dialects; the remaining
    libm-vs-Math ULP drift is ~1e-10 m over survey-scale distances,
    absorbed by 2-dp rounding at the call sites."""
    dphi = f"RADIANS({lat2} - {lat1}) / 2.0"
    dlam = f"RADIANS({lon2} - {lon1}) / 2.0"
    return (
        f"2.0 * {_lit(EARTH_R_M)} * ASIN(SQRT("
        f"SIN({dphi}) * SIN({dphi})"
        f" + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * SIN({dlam}) * SIN({dlam})))"
    )


def utm_to_geo_np(easting, northing):
    """Independent numpy twin of utm.hh:82-148 for the test oracle — a third
    libm, compared against the Spark/DuckDB results at tolerance (not via
    the shared SQL text, so a transcription error in UTM_STAGES can't hide)."""
    e = np.asarray(easting, dtype=np.float64)
    n = np.asarray(northing, dtype=np.float64)
    x = e - FALSE_EASTING
    y = n - FALSE_NORTHING
    mu = (y / K0) / M_DENOM
    fp = (mu + J1 * np.sin(2 * mu) + J2 * np.sin(4 * mu)
          + J3 * np.sin(6 * mu) + J4 * np.sin(8 * mu))
    sfp, cfp, tfp = np.sin(fp), np.cos(fp), np.tan(fp)
    c1 = EP2 * cfp * cfp
    t1 = tfp * tfp
    s1 = 1.0 - E2 * sfp * sfp
    r1 = A1ME2 / np.power(s1, 1.5)
    n1 = A / np.sqrt(s1)
    d = x / (n1 * K0)
    lat = fp - (tfp / (r1 * n1)) * (
        d**2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * EP2) * d**4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * EP2
           - 3.0 * c1 * c1) * d**6 / 720.0)
    lon = CM_RAD + (
        d - (1.0 + 2.0 * t1 + c1) * d**3 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * EP2
           + 24.0 * t1 * t1) * d**5 / 120.0) / cfp
    return np.degrees(lat), np.degrees(lon)
