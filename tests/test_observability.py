"""Pipeline observability: the curation gate instrumented with Spark's
Observation API — per-job counters (rows seen, rows kept, mean quality)
collected as a side effect of the SAME action, no second scan. The
production pattern for monitoring a 100 TB curation run without paying for
audit queries."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.functions import text


def test_quality_gate_observation_matches_recompute(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    scored = d.select("doc_id", text.quality_score("text").alias("score"))

    obs = Observation("quality_gate")
    gated = (
        scored.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum((F.col("score") >= 0.5).cast("long")).alias("rows_kept"),
            F.round(F.avg("score"), 4).alias("mean_score"),
        )
        .filter(F.col("score") >= 0.5)
    )
    kept = gated.count()  # the one action; metrics ride along

    m = obs.get
    assert m["rows_kept"] == kept
    ref = scored.agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("score"), 4).alias("avg")
    ).first()
    assert m["rows_seen"] == ref["n"]
    assert abs(m["mean_score"] - ref["avg"]) < 1e-9
    assert 0 < m["rows_kept"] <= m["rows_seen"]
