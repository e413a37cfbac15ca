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
from pyspark.sql.window import Window


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


def random_hyperplanes(planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic seeded hyperplane matrix for sign-LSH (`planes` rows
    of `dim` uniform values in [-1, 1)).

    A pure-Python 64-bit LCG (MMIX constants) keeps the matrix identical
    across platforms, Spark versions, and the DuckDB oracle (the values
    are embedded as literals on both sides). Projecting onto random
    hyperplanes — rather than taking signs of the raw leading dims —
    keeps buckets balanced for anisotropic or non-negative encoder
    embeddings, where raw-dim signs collapse every vector into one
    bucket and the within-bucket join degenerates to all-pairs."""
    x = (seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
    out: list[list[float]] = []
    for _ in range(planes):
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            row.append(((x >> 11) / float(1 << 53)) * 2.0 - 1.0)
        out.append(row)
    return out


def sign_bucket(
    vec_col: Column,
    planes: int = 8,
    dim: int | None = None,
    seed: int = 7,
) -> Column:
    """Deterministic sign-LSH bucket id.

    With `dim` given, bit i is the sign of the dot product with seeded
    random hyperplane i (the scale-safe default). Without `dim`, falls
    back to signs of the first `planes` raw dims — only valid for
    zero-centered embeddings."""
    if dim is None:
        return sum(
            F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(planes)
        ).cast("int")
    hp = random_hyperplanes(planes, dim, seed)
    return sum(
        F.when(_dot_with_query(vec_col, hp[i]) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(planes)
    ).cast("int")


def query_sign_bucket(
    query: list[float], planes: int = 8, dim: int | None = None, seed: int = 7
) -> int:
    """Driver-side bucket of a query vector — same fold order (sequential
    left-to-right double adds) as sign_bucket, so the bits agree."""
    if dim is None:
        qb = 0
        for i in range(planes):
            if query[i] >= 0:
                qb |= 1 << i
        return qb
    hp = random_hyperplanes(planes, dim, seed)
    qb = 0
    for i in range(planes):
        acc = 0.0
        for x, y in zip(query, hp[i]):
            acc += float(x) * y
        if acc >= 0:
            qb |= 1 << i
    return qb


def ann_topk_lsh(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: prefilter to buckets within `probe_hamming` of
    the query's sign bucket (multi-probe), exact cosine inside. At corpus
    scale the bucket column is a partition/cluster key, so the probe is a
    partition-pruned scan instead of a full pass. Pass `dim` to bucket on
    seeded random-hyperplane projections (see random_hyperplanes) — the
    scale-safe choice for non-centered embeddings."""
    dim = dim if dim is not None else len(query)
    qb = query_sign_bucket(query, planes, dim, seed)
    probe = [qb] + [qb ^ (1 << i) for i in range(planes)] if probe_hamming >= 1 else [qb]
    pre = emb.withColumn("bkt", sign_bucket(F.col(vec_col), planes, dim, seed)).filter(
        F.col("bkt").isin(probe)
    )
    return cosine_topk(pre, query, k, vec_col)


def ann_recall(exact: DataFrame, ann: DataFrame, method: str, k: int) -> DataFrame:
    """Recall@k of an ANN result set against the exact top-k — the number
    a 100 TB user tunes nprobe/planes/probe_hamming by (an ANN path can be
    value-exact on its chosen candidates yet recall-poor on the corpus).

    Fully relational: inner-join the two k-row id sets and count — no
    collect, and both sides are top-k results so the join broadcasts.
    Returns one row (method, k, hits, recall)."""
    hits = ann.select("vec_id").join(exact.select("vec_id"), "vec_id", "inner")
    return hits.agg(F.count("*").alias("hits")).select(
        F.lit(method).alias("method"),
        F.lit(k).cast("long").alias("k"),
        F.col("hits"),
        (F.col("hits") / float(k)).alias("recall"),
    )


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


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
    exact_mean: bool = False,
) -> list[list[float]]:
    """Distributed Lloyd k-means codebook trainer for IVF ANN.

    Deterministic throughout: init = the k rows with the smallest
    `id_col` (ordered), assignment = ivf_assign's quantized argmax-cosine
    (ties -> lowest cell), update = per-cell per-dimension mean as a
    DataFrame aggregation. Only the k x dim codebook ever reaches the
    driver (one collect per iteration — bounded by the codebook, not the
    corpus), so the trainer scales with executors.

    exact_mean=True computes each mean as a sequential fold over the
    cell's values sorted ascending (sort_array + F.aggregate) instead of
    F.avg: bit-reproducible regardless of partitioning, and identical to
    DuckDB's list_sum(list(val ORDER BY val)) — the mode the value-exact
    oracle uses. F.avg (default) is the faster map-side-combined path for
    production, deterministic up to float addition order.

    Centroid components are rounded to `round_to` decimals after every
    update so ULP-level drift cannot flip later assignments cross-engine.
    Empty cells keep their previous centroid.
    """
    cents = [
        [float(x) for x in r[vec_col]]
        for r in emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    ]
    if not cents:
        raise ValueError("kmeans_fit: input DataFrame has no rows")
    # fewer rows than requested cells -> train the smaller codebook the
    # data supports rather than indexing past the collected init
    k = min(k, len(cents))
    for _ in range(iters):
        assigned = ivf_assign(emb, cents, vec_col, round_to)
        comp = assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("pos", "val")
        ).withColumn("val", F.col("val").cast("double"))
        if exact_mean:
            mean = (F.aggregate(F.sort_array(F.collect_list("val")),
                                F.lit(0.0), lambda a, x: a + x)
                    / F.count("*"))
        else:
            mean = F.avg("val")
        if round_to is not None:
            mean = F.round(mean, round_to)
        rows = (
            comp.groupBy("cell", "pos").agg(mean.alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.col("pm.m").alias("c"))
            .collect()
        )
        new = {r["cell"]: [float(x) for x in r["c"]] for r in rows}
        cents = [new.get(i, cents[i]) for i in range(k)]
    return cents


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


# ----------------------------------------------------------------------
# IVF-PQ: product quantization on top of the IVF coarse cells.
#
# At 100 TB of float32 embeddings the candidate set that survives the
# coarse probe still cannot be ranked by reading full vectors — PQ
# compresses each vector to M small codes (argmin sub-codebook entry per
# subspace) and ranks candidates by an asymmetric-distance (ADC) sum of
# M lookup-table entries. Codes are one narrow codegen'd pass over the
# corpus (computed once, stored beside the cell key); a query builds its
# M x K lookup table driver-side and ranking touches only codes, never
# vectors. Everything is deterministic across engines: distances compose
# from the same sequential-fold dot products the cosine path uses
# (xx - 2xy + yy), rounded before every argmin/sum, first-index tie
# break — the DuckDB oracle reproduces the math bit-for-bit.
# ----------------------------------------------------------------------

def _dot_self(col: Column) -> Column:
    return F.aggregate(col, F.lit(0.0),
                       lambda a, x: a + x.cast("double") * x.cast("double"))


def _pydot(a: list[float], b: list[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s = s + float(x) * float(y)
    return s


def pq_codebooks_from_rows(
    rows: list[list[float]], m: int = 4
) -> list[list[list[float]]]:
    """Deterministic sub-codebooks: the given vectors\' slices per
    subspace (codebooks[m][j] = j-th vector\'s m-th slice). In production
    each subspace codebook is kmeans_fit on the slice columns; any
    deterministic pick works for the contract/oracle pair."""
    dim = len(rows[0])
    sub = dim // m
    return [[[float(x) for x in r[i * sub:(i + 1) * sub]] for r in rows]
            for i in range(m)]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Add code_0..code_{M-1} int columns: per subspace, the index of the
    nearest sub-codebook entry by squared L2 (first index wins ties).
    d2 = round(xx - 2*xy + yy, round_to) — composed from dot products so
    the SQL oracle\'s list_dot_product arithmetic matches exactly."""
    v = F.col(vec_col)
    sub = len(codebooks[0][0])
    out = emb
    for m, cb in enumerate(codebooks):
        s = F.slice(v, m * sub + 1, sub)
        xx = _dot_self(s)
        d2s = F.array(*[
            F.round(
                xx - F.lit(2.0) * _dot_with_query(s, c) + F.lit(_pydot(c, c)),
                round_to,
            )
            for c in cb
        ])
        out = out.withColumn(
            f"code_{m}",
            (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int"),
        )
    return out


def pq_lut(
    query: list[float], codebooks: list[list[list[float]]], round_to: int = 6
) -> list[list[float]]:
    """ADC lookup table: lut[m][j] = round squared L2 between the query\'s
    m-th slice and sub-codebook entry j — same xx-2xy+yy composition as
    pq_encode, computed driver-side (M x K scalars)."""
    sub = len(codebooks[0][0])
    lut = []
    for m, cb in enumerate(codebooks):
        qs = [float(x) for x in query[m * sub:(m + 1) * sub]]
        qq = _pydot(qs, qs)
        lut.append([
            round(qq - 2.0 * _pydot(qs, c) + _pydot(c, c), round_to)
            for c in cb
        ])
    return lut


def ann_topk_ivfpq(
    emb: DataFrame,
    query: list[float],
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    probe: int = 4,
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ ANN: coarse-probe the `probe` nearest cells (same ranking
    as ann_topk_ivf), then rank ONLY the surviving candidates by the ADC
    sum of their PQ codes\' lookup-table entries — ascending approximate
    squared distance, vec_id tie-break. Returns (vec_id, approx_d2)."""
    import math

    qn = math.sqrt(_pydot(query, query)) or 1.0

    def cos(c: list[float]) -> float:
        cn = math.sqrt(_pydot(c, c)) or 1.0
        return _pydot(c, query) / (cn * qn)

    key = (lambda i: (-round(cos(coarse[i]), round_to), i))
    cells = sorted(range(len(coarse)), key=key)[:probe]
    assigned = ivf_assign(emb, coarse, vec_col, round_to)
    cand = assigned.filter(F.col("cell").isin(cells))
    enc = pq_encode(cand, codebooks, vec_col, round_to)
    lut = pq_lut(query, codebooks, round_to)
    approx = None
    for m, row in enumerate(lut):
        term = F.element_at(F.array(*[F.lit(v) for v in row]),
                            F.col(f"code_{m}") + 1)
        approx = term if approx is None else approx + term
    return (
        enc.select("vec_id", F.round(approx, round_to).alias("approx_d2"))
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(k)
    )



# ----------------------------------------------------------------------
# Materialized ANN index: bucket-partitioned parquet layout.
#
# ann_topk_lsh / ann_topk_ivf compute buckets on the fly, so every probe
# still SCANS the whole corpus (the bucket filter prunes rows, not
# files). At 100 TB the index must be a physical layout: write the
# corpus partitioned by bucket, and a probe becomes a partition-pruned
# read of only the matching directories (the scan's PartitionFilters —
# Spark never opens the other buckets' files).
# ----------------------------------------------------------------------

def write_lsh_index(
    emb: DataFrame,
    path: str,
    planes: int = 8,
    dim: int | None = None,
    seed: int = 7,
    vec_col: str = "embedding",
) -> None:
    """Materialize a sign-LSH index: parquet partitioned by bucket id.
    One shuffle-free pass (bucket is a narrow projection); `partitionBy`
    fans rows into 2^planes directories. Rewriting is idempotent
    (mode=overwrite)."""
    dim_eff = dim
    (
        emb.withColumn("bkt", sign_bucket(F.col(vec_col), planes, dim_eff, seed))
        .write.partitionBy("bkt")
        .mode("overwrite")
        .parquet(path)
    )


def ann_topk_lsh_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    planes: int = 8,
    probe_hamming: int = 1,
    dim: int | None = None,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a write_lsh_index layout: the bucket filter is a partition-
    column predicate, so only the probed directories are read (verify
    with .explain — the scan shows `PartitionFilters: [bkt IN (...)]`
    and `inputFiles()` shrinks to the probed buckets). Results are
    identical to ann_topk_lsh on the same corpus/parameters."""
    dim = dim if dim is not None else len(query)
    qb = query_sign_bucket(query, planes, dim, seed)
    probe = [qb] + ([qb ^ (1 << i) for i in range(planes)]
                    if probe_hamming >= 1 else [])
    idx = spark.read.parquet(path).filter(F.col("bkt").isin(probe))
    return cosine_topk(idx, query, k, vec_col)


def write_ivf_index(
    emb: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> None:
    """Materialize an IVF layout: parquet partitioned by coarse cell
    (nearest-centroid assignment, ivf_assign). The codebook itself is
    the caller's (kmeans_fit) and must be kept with the index."""
    (
        ivf_assign(emb, centroids, vec_col, round_to)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def ann_topk_ivf_indexed(
    spark,
    path: str,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    probe: int = 4,
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Probe a write_ivf_index layout: rank cells by centroid-query
    cosine on the driver (codebook-sized), read only the top `probe`
    cell directories. Identical results to ann_topk_ivf."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0

    def cos(c: list[float]) -> float:
        cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        dot = 0.0
        for x, y in zip(c, query):
            dot = dot + float(x) * float(y)
        return dot / (cn * qn)

    key = (lambda i: (-round(cos(centroids[i]), round_to), i)) \
        if round_to is not None else (lambda i: (-cos(centroids[i]), i))
    cells = sorted(range(len(centroids)), key=key)[:probe]
    idx = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return cosine_topk(idx, query, k, vec_col)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int | None = None,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
    exclude_self: bool = False,
) -> DataFrame:
    """Batch kNN JOIN: top-k corpus neighbors for EVERY query vector —
    the many-to-many shape real pipelines run (embed-dedup a crawl
    batch, retrieval eval, hard-negative mining), where the
    single-query cosine_topk would mean one driver round-trip per row.

    Multi-probe sign-LSH: each side buckets once with the seeded
    hyperplanes; every query additionally probes its bucket's `planes`
    hamming-1 neighbors (one posexplode, no extra scan), so a near
    neighbor that disagrees on a single plane bit is still found.
    Candidates meet in ONE (bucket) equi-join — per-query work is
    O((planes+1) * corpus/2^planes), never O(corpus) — and the
    per-query top-k is a row_number window keyed on q_id (k bounded,
    no skew). Cosine is quantized to `round_to` decimals with nbr_id
    tie-break, the same cross-engine contract as the ANN oracles.

    Returns (q_id, nbr_id, cosine, rank), rank 1..k per query."""
    v = F.col(vec_col)
    cb = corpus.select(
        F.col(id_col).alias("nbr_id"),
        v.alias("nvec"),
        _norm(v).alias("nnorm"),
        sign_bucket(v, planes, dim, seed).alias("bkt"),
    )
    qb0 = sign_bucket(v, planes, dim, seed)
    probes = F.array(
        qb0, *[qb0.bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
    )
    qb = queries.select(
        F.col(id_col).alias("q_id"),
        v.alias("qvec"),
        _norm(v).alias("qnorm"),
        F.explode(probes).alias("bkt"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.col("nvec"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = qb.join(cb, "bkt").select(
        "q_id",
        "nbr_id",
        F.round(dot / (F.col("qnorm") * F.col("nnorm")), round_to).alias(
            "cosine"
        ),
    )
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("nbr_id"))
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k0: int = 60,
    id_col: str = "doc",
    rank_col: str = "rank",
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked result lists (hybrid search:
    fuse a lexical BM25 list with a dense kNN list without comparing
    their incommensurable scores — only RANKS cross systems).

    Each list contributes 1/(k0 + rank) per document; the contribution
    is fixed-pointed to integer micro-units per row and int64-summed,
    so the fused score is order-independent and engine-exact (the same
    contract as bm25_topk). Returns (doc, rrf, n_systems) — top `topk`
    by fused score, doc-id tie-break.

    Scale shape: the inputs are already tiny (top-k lists); the fuse is
    one union + one groupBy — nothing here touches the corpus."""
    parts = None
    for df in ranked:
        p = df.select(
            F.col(id_col).alias("doc"),
            F.floor(
                F.lit(1e6) / (F.lit(float(k0)) + F.col(rank_col))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rrf_i"),
        )
        parts = p if parts is None else parts.unionByName(p)
    return (
        parts.groupBy("doc")
        .agg(
            (F.sum("rrf_i") / F.lit(1e6)).alias("rrf"),
            F.count("*").alias("n_systems"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc"))
        .limit(topk)
    )
