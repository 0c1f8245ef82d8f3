"""Declared-query registry: every implemented operator from SURVEY §2 (plus
north-star extensions) exposed as (Spark plan, DuckDB oracle SQL) pairs.

Importing this package populates ``REGISTRY`` from the sub-modules.
"""

from mdio_cpp_spark.plans.base import REGISTRY, Declared, declared  # noqa: F401
from mdio_cpp_spark.plans import analytics as _analytics  # noqa: F401,E402
from mdio_cpp_spark.plans import core as _core  # noqa: F401,E402
from mdio_cpp_spark.plans import geo as _geo  # noqa: F401,E402
from mdio_cpp_spark.plans import pipeline as _pipeline  # noqa: F401,E402
from mdio_cpp_spark.plans import zarr_queries as _zarr  # noqa: F401,E402
