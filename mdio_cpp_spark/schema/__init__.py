"""MDIO schema layer (SURVEY M3): dataset-spec validation, dtype→Spark type
mapping, and the fill-value table.

Pure Python — no Spark internals. Mirrors the semantics of the reference's
validation + factory layer (/root/reference/mdio/dataset_validator.h:101-220,
dataset_factory.h:500-545) without porting its code.
"""

from mdio_cpp_spark.schema.types import (  # noqa: F401
    SCALAR_TYPES,
    ScalarType,
    fill_value_for,
    numpy_dtype_for,
    parse_v2_dtype,
    spark_type_for,
    struct_numpy_dtype,
    v2_dtype_str,
    v3_dtype_name,
)
from mdio_cpp_spark.schema.validation import (  # noqa: F401
    SpecValidationError,
    validate_dataset_spec,
)
