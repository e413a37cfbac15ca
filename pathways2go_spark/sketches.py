"""Distributed mergeable sketches (driver brief: "a novel sketch" as a
first-class custom operator).

KMV (k-minimum-values) distinct-count sketch: hash every value to a
uniform 32-bit integer, keep the k smallest DISTINCT hashes per group;
if fewer than k distinct hashes exist the count is exact, otherwise the
k-th smallest hash h_k estimates the distinct count as
(k-1) * 2^32 / h_k (Bar-Yossef et al. 2002, public method — h_k of n
uniform points concentrates at k/n of the range).

Why this sketch here: it is DETERMINISTIC end to end — md5-top-32 is
the engine-portable hash used throughout this repo's oracles, and the
estimator is computed with INTEGER division, so the whole operator is
bit-reproducible in DuckDB (unlike HLL, whose register layout is
implementation-defined — Spark's approx_count_distinct cannot be
oracle-checked)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmv_distinct(
    df: DataFrame,
    col: str,
    keys: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-`keys` KMV distinct-count sketch over `col`.

    Returns (*keys, n_sketch, kth_hash, distinct_est, is_exact):
    n_sketch = hashes kept (< k means exact), kth_hash = largest kept
    hash, distinct_est = n_sketch when exact else
    ((k-1) << 32) div kth_hash — all integer arithmetic.

    Scale shape — the point of a sketch: the partial pass is ONE
    mapInPandas over the hashed scan holding a bounded (k entries per
    key) state dict per partition and emitting <= partitions * k rows
    per key; the merge is a groupBy over those bounded partials (the
    global k smallest distinct hashes are always a subset of the union
    of per-partition k smallest — the tournament property), so no
    full-cardinality set ever shuffles, unlike countDistinct whose
    per-group state is O(distinct). Arrow-batched, no per-row Python."""
    hashed = df.select(
        *keys,
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10)
        .cast("long")
        .alias("__h"),
    )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in hashed.schema
    )
    kk = int(k)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, list] = {}
        cols = None
        for pdf in batches:
            cols = list(pdf.columns)
            for key_vals, grp in pdf.groupby(keys, sort=False):
                kt = key_vals if isinstance(key_vals, tuple) else (key_vals,)
                merged = state.get(kt)
                new = grp["__h"].unique()
                if merged is None:
                    merged = sorted(set(new.tolist()))
                else:
                    merged = sorted(set(merged).union(new.tolist()))
                state[kt] = merged[:kk]
        if cols is None:
            return
        rows = [
            kt + (h,) for kt, hs in state.items() for h in hs
        ]
        yield pd.DataFrame(rows, columns=cols)

    parts = hashed.mapInPandas(partial, schema=out_schema)
    # merge: distinct (map-side combinable), then the k smallest per key
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("__h")
    kept = (
        parts.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk)
    )
    agg = kept.groupBy(*keys).agg(
        F.count("*").alias("n_sketch"),
        F.max("__h").alias("kth_hash"),
    )
    est = F.when(F.col("n_sketch") < kk, F.col("n_sketch")).otherwise(
        F.expr(f"({kk - 1} * 4294967296L) div greatest(kth_hash, 1L)")
    )
    return agg.select(
        *keys,
        "n_sketch",
        "kth_hash",
        est.alias("distinct_est"),
        (F.col("n_sketch") < kk).alias("is_exact"),
    )
