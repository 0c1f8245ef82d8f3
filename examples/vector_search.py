"""Vector search: brute-force, IVF, and a store-persisted IVF index.

The similarity family (operators/similarity.py) at a glance:

  1. exact cosine top-k — queries broadcast, corpus partitioned;
  2. IVF — K deterministic centroids broadcast, each vector assigned
     map-side to its nearest cell, a query searches ONLY its own cell;
  3. the same IVF index PERSISTED into an MDIO store (plans/zarr_queries.py
     v09): the K×dim centroid array and the position→cell assignments are
     store arrays, reopened to serve queries while the vector payload stays
     in parquet — index small and store-resident, corpus in the lakehouse.

Run: python examples/vector_search.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.operators.similarity import cosine_topk, ivf_topk
from mdio_cpp_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("vector-search-example", master="local[4]")
    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)

    print("== exact cosine top-5 (brute force) ==")
    cosine_topk(emb, queries, "vec_id", "embedding", k=5).orderBy("q_id", "rk").show()

    print("== IVF top-5 (single probe: each query searches one cell) ==")
    ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_cells=8).orderBy("q_id", "rk").show()

    print("== the same answer served from the STORE-PERSISTED index ==")
    from mdio_cpp_spark.plans import REGISTRY

    REGISTRY["v09_stored_ivf"].spark(spark, SF_DIR).show()

    print("== binary-quantized screen (64-bit signatures, Hamming + exact rerank) ==")
    REGISTRY["v20_binary_quant"].spark(spark, SF_DIR).show()

    print("== int8 scalar-quantization error audit ==")
    REGISTRY["v19_scalar_quant"].spark(spark, SF_DIR).show()


if __name__ == "__main__":
    main()
