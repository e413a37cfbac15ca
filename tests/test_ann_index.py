"""Materialized bucket-partitioned ANN index (similarity.write_*_index)."""
import pyspark.sql.functions as F

from pathways2go_spark import similarity as SIM

DIM = 16
N = 400


def _emb(spark):
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            (F.pmod(F.hash(F.col("vec_id") * DIM + j), F.lit(1000)) / 500.0)
            - 1.0
        ).cast("float"),
    )
    return spark.range(N).select(
        F.col("id").alias("vec_id")).withColumn("embedding", comp)


def test_lsh_index_matches_onthefly_and_prunes(spark, tmp_path):
    emb = _emb(spark)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0)
         .select("embedding").head()[0]]
    path = str(tmp_path / "lsh_idx")
    SIM.write_lsh_index(emb, path, planes=6, dim=DIM)

    got = SIM.ann_topk_lsh_indexed(spark, path, q, k=5, planes=6, dim=DIM)
    want = SIM.ann_topk_lsh(emb, q, k=5, planes=6, dim=DIM)
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in want.collect()]

    # partition pruning: the bucket predicate reaches the scan as a
    # PartitionFilter (directory-level pruning), and the index has more
    # bucket directories than the probe set touches
    import os

    qb = SIM.query_sign_bucket(q, 6, DIM)
    probe = [qb] + [qb ^ (1 << i) for i in range(6)]
    pruned = spark.read.parquet(path).filter(F.col("bkt").isin(probe))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bkt" in plan.split(
        "PartitionFilters", 1)[1][:200]
    n_dirs = len([d for d in os.listdir(path) if d.startswith("bkt=")])
    assert n_dirs > len(probe)


def test_ivf_index_matches_onthefly_and_prunes(spark, tmp_path):
    emb = _emb(spark)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 1)
         .select("embedding").head()[0]]
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    path = str(tmp_path / "ivf_idx")
    SIM.write_ivf_index(emb, path, cents, round_to=6)

    got = SIM.ann_topk_ivf_indexed(spark, path, q, cents, k=5, probe=3,
                                   round_to=6)
    want = SIM.ann_topk_ivf(emb, q, cents, k=5, probe=3, round_to=6)
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in want.collect()]

    import os

    pruned = spark.read.parquet(path).filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1)[1][:200]
    n_dirs = len([d for d in os.listdir(path) if d.startswith("cell=")])
    assert n_dirs > 2


def test_ivfpq_codes_and_adc(spark):
    """PQ codes are deterministic, self-coding (a codebook vector's own
    slice encodes to its own index), and the ADC ranking finds the query
    itself first when the query is in the corpus."""
    import random

    from pathways2go_spark import similarity as SIM

    rng = random.Random(11)
    dim, n = 64, 120
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    first16 = [
        [float(x) for x in r.embedding]
        for r in emb.filter("vec_id < 16").orderBy("vec_id").collect()
    ]
    cbs = SIM.pq_codebooks_from_rows(first16, m=4)
    enc = SIM.pq_encode(emb, cbs).filter("vec_id < 16").orderBy("vec_id")
    for r in enc.collect():
        # vector j's slices ARE codebook entry j in every subspace
        assert [r["code_0"], r["code_1"], r["code_2"], r["code_3"]] == [
            r["vec_id"]] * 4
    # collected-row floats (f32 -> f64) must round-trip identically
    q = [float(x) for x in emb.filter("vec_id = 7").head().embedding]
    top = SIM.ann_topk_ivfpq(emb, q, first16, cbs, k=5, probe=4).collect()
    assert top[0]["vec_id"] == 7 and top[0]["approx_d2"] == 0.0
    # determinism across runs
    again = SIM.ann_topk_ivfpq(emb, q, first16, cbs, k=5, probe=4).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]
