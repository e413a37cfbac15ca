"""K1/K2/K3 — partitioned, idempotent, resumable triple sink + lineage.

Reference: Turtle writer (GoCAM.java:1873-1886), Blazegraph named-graph
loader keyed by model IRI (Blazer.java:82-108), per-model report maps
(GoMappingReport.java). Here the persistent store IS a partitioned table:
model_id is bucketed into a fixed number of hash buckets (the Iceberg
layout would be `bucket(N, model_id)`; this image has no Iceberg jars so
the same layout is expressed as a parquet partition column).

Resume contract (north rule: "resumable from checkpoint with
per-partition lineage"): every successful bucket write records a lineage
manifest row (bucket, n_models, n_triples, per-rule counts). A re-run
skips buckets already present in the manifest and rewrites only the
missing ones — node ids are content-keyed (vocab.py), so a resumed write
is byte-identical to a one-shot write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_bucket(triples: DataFrame, buckets: int) -> DataFrame:
    return triples.withColumn(
        "bucket", F.pmod(F.xxhash64("model_id"), F.lit(buckets)).cast("int")
    )


def _lineage_path(path: str) -> str:
    return os.path.join(path, "_lineage")


def completed_buckets(spark: SparkSession, path: str) -> set[int]:
    lp = _lineage_path(path)
    if not os.path.exists(lp):
        return set()
    rows = spark.read.json(lp).select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def write_triples(
    spark: SparkSession,
    triples: DataFrame,
    path: str,
    buckets: int = 16,
    resume: bool = True,
) -> dict:
    """Idempotent bucketed write. Returns a summary of what was written
    vs skipped. Data layout: path/data/bucket=N/*.parquet, manifest rows
    at path/_lineage/bucket=N.json."""
    done = completed_buckets(spark, path) if resume else set()
    t = _with_bucket(triples, buckets)
    if done:
        t = t.filter(~F.col("bucket").isin(sorted(done)))
    t = t.cache()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t.write.partitionBy("bucket").mode("overwrite").parquet(os.path.join(path, "data"))

    # per-partition lineage manifest: models, triples, per-rule counts
    lineage = t.groupBy("bucket").agg(
        F.countDistinct("model_id").alias("n_models"),
        F.count("*").alias("n_triples"),
    )
    rule_counts = (
        t.groupBy("bucket", "rule").count()
        .groupBy("bucket")
        .agg(F.map_from_entries(F.collect_list(F.struct("rule", "count"))).alias("rule_counts"))
    )
    manifest = lineage.join(rule_counts, "bucket").collect()
    os.makedirs(_lineage_path(path), exist_ok=True)
    written = []
    for r in manifest:
        rec = {
            "bucket": r["bucket"],
            "n_models": r["n_models"],
            "n_triples": r["n_triples"],
            "rule_counts": dict(r["rule_counts"]),
        }
        with open(os.path.join(_lineage_path(path), f"bucket={r['bucket']}.json"), "w") as f:
            json.dump(rec, f)
        written.append(r["bucket"])
    t.unpersist()
    return {"written_buckets": sorted(written), "skipped_buckets": sorted(done)}


def read_triples(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "data"))
