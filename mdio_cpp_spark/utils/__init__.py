"""Destructive dataset lifecycle utilities (IO8/IO9):
trim — shrink the stored domain along dimensions; delete — drop the store.
Mirrors /root/reference/mdio/utils/{trim,delete}.h semantics.
"""

from mdio_cpp_spark.utils.delete import delete_dataset  # noqa: F401
from mdio_cpp_spark.utils.trim import grow_dataset, trim_dataset  # noqa: F401
