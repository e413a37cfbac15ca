"""Bucketed co-located joins: the 100 TB technique for repeated joins on
a stable key — both tables pre-hashed into the same bucket layout so the
join needs NO Exchange at read time (the shuffle was paid once, at write
time). This is the batch analogue of the ANN index's partition-pruned
probe (test_ann_index): prove the physical plan, not just the answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(0, 1000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("vb")
    )
    for name, df in (("bkt_a", a), ("bkt_b", b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    # both sides scan their buckets directly into the sort-merge join:
    # no Exchange node anywhere in the physical plan
    assert "Exchange" not in plan, plan
    assert j.count() == 500
    # same join WITHOUT bucketing shuffles both sides — the contrast
    # that proves the bucket layout (not AQE or size) removed them
    pa = spark.read.parquet(str(tmp_path / "bkt_a"))
    pb = spark.read.parquet(str(tmp_path / "bkt_b"))
    plain = pa.join(pb, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain
    for name in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
