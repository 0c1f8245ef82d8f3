"""llm_pipeline — the training-data curation pipeline end-to-end.

Chains the north-star operators over the synthetic documents/embeddings
tables: exact dedup → MinHash-LSH candidates → Jaccard verify → duplicate
clusters → survivor selection → stratified rebalance → quality filter →
sequence packing. Run:

    python examples/llm_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.functions import text
from mdio_cpp_spark.operators.dedup import (
    duplicate_clusters,
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard,
)
from mdio_cpp_spark.operators.sampling import sequence_packing, stratified_hash_sample
from mdio_cpp_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-pipeline")
    docs = table(spark, sf_dir, "documents")
    print(f"input docs: {docs.count()}")

    # 1. exact dedup (hash groupBy — bodies never shuffle)
    docs = exact_dedup(docs, "doc_id", "text")
    print(f"after exact dedup: {docs.count()}")

    # 2. near-dup clusters: LSH candidates → connected components
    pairs = lsh_candidate_pairs(docs, "doc_id", "text", bands=4, rows=4)
    clusters = duplicate_clusters(pairs)
    # keep the cluster representative (min doc id) + everything unclustered
    dupes = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = docs.join(dupes, on="doc_id", how="left_anti")
    print(f"after near-dup clustering: {docs.count()}")

    # 3. quality + language filters (pure column expressions)
    docs = docs.filter(text.quality_score("text") >= 0.1)

    # 4. model-based curation: DSIR target-likeness + CCNet perplexity bands
    #    (the registry queries run these standalone; here we just surface
    #    their headline numbers on the surviving corpus)
    from mdio_cpp_spark.plans import REGISTRY

    print("DSIR top picks (target-distribution resampling):")
    REGISTRY["p20_dsir_resample"].spark(spark, sf_dir).show(5)
    print("per-language perplexity bands (CCNet head/middle/tail):")
    REGISTRY["p21_perplexity_buckets"].spark(spark, sf_dir).show(6)

    # 5. stratified rebalance: downsample English to 50%
    docs = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.5})
    print(f"after quality + rebalance: {docs.count()}")

    # 6. pack into 512-token sequences across 8 shards
    packed = sequence_packing(docs, "doc_id", text.token_count("text"), budget=512, n_shards=8)
    packed.groupBy("shard").agg(
        F.countDistinct("pack_id").alias("packs"), F.sum("n_tok").alias("tokens")
    ).orderBy("shard").show()

    # 7. position spans for the data loader (docs split at pack boundaries)
    REGISTRY["p22_pack_spans"].spark(spark, sf_dir).show(5)


if __name__ == "__main__":
    main()
