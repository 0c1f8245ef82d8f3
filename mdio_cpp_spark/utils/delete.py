"""DeleteDataset analog (IO9, /root/reference/mdio/utils/delete.h:38-81):
validate the path actually holds a Zarr store, then delete the whole tree
(the kvstore::DeleteRange analog). Refuses non-store paths so a bad argument
can never rm -rf arbitrary directories.
"""

from __future__ import annotations

from mdio_cpp_spark.sources.zarr_store import ZarrStore


def delete_dataset(path: str) -> None:
    """Validate-then-delete (raises FileNotFoundError if not a store)."""
    ZarrStore.open(path).delete()
