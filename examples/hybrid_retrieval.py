"""Hybrid retrieval: BM25 + vector cosine fused by RRF, diversified by MMR.

The round-8 retrieval stack end to end over the synthetic corpus:

  1. BM25 lexical top-k (plans/pipeline._bm25_ranked) — the tf table is
     filtered to the query's terms BEFORE any shuffle, idf and corpus
     stats broadcast back, ranking is a distributed TakeOrdered;
  2. exact-cosine vector top-k (operators/similarity.cosine_topk) — the
     query vector broadcasts, corpus vectors never shuffle;
  3. reciprocal-rank fusion (v16): score = Σ 1/(60+rank) over the lists a
     doc appears in — a full outer join of two 50-row frames;
  4. MMR re-ranking (v17): greedy λ·relevance − (1−λ)·redundancy over the
     fused candidates — diversity for the consumer (a RAG context window,
     a labeling queue) at the cost of bounded-frame joins only.

Run: python examples/hybrid_retrieval.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from mdio_cpp_spark.plans import REGISTRY
    from mdio_cpp_spark.session import get_spark

    spark = get_spark("hybrid-retrieval", master="local[8]")

    print("== BM25 lexical top-15 (t26) ==")
    REGISTRY["t26_bm25"].spark(spark, SF_DIR).show(15, truncate=False)

    print("== hybrid RRF fusion of lexical + vector lists (v16) ==")
    REGISTRY["v16_hybrid_rrf"].spark(spark, SF_DIR).show(10, truncate=False)

    print("== MMR-diversified picks over the vector candidates (v17) ==")
    REGISTRY["v17_mmr_rerank"].spark(spark, SF_DIR).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
