"""Tokenizer training and corpus export: the round-8 third-wave pipeline.

End to end over the synthetic corpus:

  1. BPE merge-rule learning (t28) — three real training iterations; the
     corpus collapses to a persisted vocabulary once, every iteration is a
     vocab-sized pair aggregate + a one-row TakeOrdered winner + a
     literal-replace re-segmentation inside codegen;
  2. fertility report of the LEARNED tokenizer (t29) — per-language
     token/char/BPE-symbol counts and chars-per-symbol, computed off the
     segmented vocab (the corpus is never rescanned);
  3. incremental near-dup screen of a new batch (d18) — the delta's
     MinHash band keys broadcast onto the base band table, so the base
     scans once and no base-vs-base pair ever materializes;
  4. training-export shard manifest (p19) — content-hash shard assignment
     (exact duplicates co-shard), per-shard doc/token/byte totals and an
     order-independent modular checksum a re-reader can verify without
     caring about row order.

Run: python examples/tokenizer_and_export.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from mdio_cpp_spark.plans import REGISTRY
    from mdio_cpp_spark.session import get_spark

    spark = get_spark("tokenizer-export", master="local[8]")

    print("== BPE training: three learned merge rules (t28) ==")
    REGISTRY["t28_bpe_train"].spark(spark, SF_DIR).show(truncate=False)

    print("== fertility of the learned tokenizer, per language (t29) ==")
    REGISTRY["t29_bpe_fertility"].spark(spark, SF_DIR).show(truncate=False)

    print("== incremental near-dup screen: new batch vs base (d18) ==")
    REGISTRY["d18_incremental_minhash"].spark(spark, SF_DIR).show(10)

    print("== export shard manifest (p19) ==")
    REGISTRY["p19_shard_manifest"].spark(spark, SF_DIR).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
