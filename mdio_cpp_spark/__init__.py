"""mdio_cpp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TGSAI/mdio-cpp (the MDIO v1 multidimensional
array store), re-expressed Spark-first.

The reference (/root/reference) is a C++17 chunked-array store whose "queries"
are xarray-style: open, isel/sel slicing, coordinate filters, multi-key sorts,
summary statistics, chunked parallel I/O.  Here each of those is a declarative
DataFrame plan that Catalyst optimizes; the relational surface (joins, windows,
set ops, dedup, similarity search, text analysis) extends the reference per
the north-star contract in BASELINE.json.

Layout:
  session    — SparkSession factory tuned for the target cluster shape
  catalog    — test-table loaders / temp-view registration
  model      — MdioDataset / MdioVariable: open/from_json, lazy isel/sel,
               staged attrs + commit_metadata (the reference's data model)
  operators/ — selection (isel/sel), sorting, stats, joins, dedup, similarity
  functions/ — column-level helpers (text, hashing, vectors) — all JVM-side
  sources/   — Zarr v2/v3 store + chunk-pruned Spark scan + chunk-aligned
               writer + multimodal binary plumbing
  schema/    — MDIO JSON dataset-spec validation + type/fill-value mapping
  utils/     — trim/delete dataset lifecycle
  plans/     — the declared-query registry (Spark plan + DuckDB oracle SQL)
  streaming/ — Structured Streaming transforms (shared batch/stream logic)
"""

__version__ = "0.1.0"

from mdio_cpp_spark.session import get_spark, tune  # noqa: F401
