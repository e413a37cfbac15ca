"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline (one narrow pass +
TakeOrdered — no shuffle of the corpus); the scale path is an LSH/IVF-
style bucket prefilter that probes only matching buckets. Dot products
are sequential folds (F.aggregate / F.zip_with) in float64 — JVM-side,
codegen'd, and deterministic (bit-stable across partitionings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_with_query(vec_col: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x)
    )


def cosine_scores(emb: DataFrame, query: list[float], vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cosine) for every row — exact, single narrow pass."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    v = F.col(vec_col)
    return emb.select(
        "vec_id",
        (_dot_with_query(v, query) / (_norm(v) * F.lit(qn))).alias("cosine"),
    )


def cosine_topk(
    emb: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k: per-partition heap via TakeOrdered (orderBy+limit),
    never a full sort shuffle."""
    return cosine_scores(emb, query, vec_col).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(k)


def sign_bucket(vec_col: Column, planes: int = 8) -> Column:
    """Deterministic sign-LSH bucket id from the first `planes` dims."""
    return sum(
        F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(planes)
    ).cast("int")


def ann_topk_lsh(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: prefilter to buckets within `probe_hamming` of
    the query's sign bucket (multi-probe), exact cosine inside. At corpus
    scale the bucket column is a partition/cluster key, so the probe is a
    partition-pruned scan instead of a full pass."""
    qb = 0
    for i in range(planes):
        if query[i] >= 0:
            qb |= 1 << i
    probe = [qb] + [qb ^ (1 << i) for i in range(planes)] if probe_hamming >= 1 else [qb]
    pre = emb.withColumn("bkt", sign_bucket(F.col(vec_col), planes)).filter(
        F.col("bkt").isin(probe)
    )
    return cosine_topk(pre, query, k, vec_col)


def centroid_scores(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Array of cosine similarities of `vec_col` against each centroid."""
    import math

    cols = []
    for c in centroids:
        cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        cols.append(_dot_with_query(vec_col, c) / (_norm(vec_col) * F.lit(cn)))
    return F.array(*cols)


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding",
               round_to: int | None = None) -> DataFrame:
    """IVF coarse quantization: each vector joins the cell of its nearest
    centroid (argmax cosine; first index wins ties — deterministic).
    Centroids here are caller-provided (a trained k-means codebook in
    production; any deterministic pick for tests) and broadcast into the
    expression — assignment is one narrow codegen'd pass, and at corpus
    scale `cell` is the partition key the probe prunes on."""
    scores = centroid_scores(F.col(vec_col), centroids)
    if round_to is not None:
        # cross-engine determinism: quantize before the argmax so ULP-level
        # float drift between engines cannot flip a cell assignment
        scores = F.transform(scores, lambda x: F.round(x, round_to))
    return emb.withColumn(
        "cell",
        (F.array_position(scores, F.array_max(scores)) - 1).cast("int"),
    )


def ann_topk_ivf(
    emb: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    probe: int = 4,
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """IVF-flat ANN: probe the `probe` cells whose centroids are nearest
    the query, exact cosine inside — the classic inverted-file scale path
    beside the sign-LSH variant (ann_topk_lsh)."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0

    def cos(c: list[float]) -> float:
        cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        dot = 0.0
        for x, y in zip(c, query):
            dot = dot + float(x) * float(y)
        return dot / (cn * qn)

    # `is not None` (not truthiness): round_to=0 must round here exactly as
    # ivf_assign does, or probe ranking and cell assignment disagree
    key = (lambda i: (-round(cos(centroids[i]), round_to), i)) if round_to is not None \
        else (lambda i: (-cos(centroids[i]), i))
    ranked = sorted(range(len(centroids)), key=key)
    cells = ranked[:probe]
    assigned = ivf_assign(emb, centroids, vec_col, round_to)
    return cosine_topk(assigned.filter(F.col("cell").isin(cells)), query, k, vec_col)
