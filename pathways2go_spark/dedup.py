"""Deduplication operators for the documents corpus.

Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH (shingle -> minhash ->
band -> bucket-join), SimHash, and embedding-cosine near-dup. All but the
final verify step are native Column expressions; the shapes are the
standard web-scale dedup pipelines:

  exact        one shuffle on the content hash
  minhash-lsh  narrow shingle/minhash pass, shuffle only on (band, hash)
               buckets — candidate pairs are bucket-local, never all-pairs
  simhash      one aggregation pass building a 32-bit signature
  embedding    sign-LSH bucket prefilter, exact cosine within buckets
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (md5, n_docs, doc_ids, keeper)."""
    return (
        df.select(F.col("doc_id"), F.md5(F.col(col)).alias("md5"))
        .groupBy("md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _gram_array(col: str, n: int):
    """Column expression: the DISTINCT word n-grams of `col` as an
    array — shared by _shingles (which explodes it) and narrow per-doc
    counts (size() of it, no explode/shuffle needed)."""
    toks = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    return F.array_distinct(grams)


def _shingles(df: DataFrame, col: str, n: int) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams."""
    return df.select(
        "doc_id", F.explode(_gram_array(col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 256,
) -> DataFrame:
    """N-gram Jaccard >= threshold, blocked by shared shingles (pairs
    with zero shared shingles are never materialized).

    Candidate generation uses only shingles with document frequency
    <= max_df: a hub shingle (a stop-trigram shared by 1M docs) would
    otherwise create a quadratic bucket. Verification then computes the
    EXACT Jaccard over each candidate pair's FULL shingle sets, so the
    cap affects recall only for pairs whose every shared shingle is a
    hub — vanishingly rare in the high-threshold near-dup regime."""
    sh = _shingles(df, col, n).cache()
    block = sh
    if max_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        block = sh.join(
            dfreq.filter(F.col("df") <= max_df), "shingle", "left_semi"
        )
    a = block.withColumnRenamed("doc_id", "a")
    b = block.withColumnRenamed("doc_id", "b")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # Verification stays fully relational: the exact intersection size is
    # a join of the (doc, shingle) table onto the candidate pairs plus a
    # groupBy count — no document's full shingle set is ever collected
    # into a single array row, so per-row memory is bounded regardless of
    # document length.
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    n_inter = (
        cand.join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        n_inter.join(sizes.select(F.col("doc_id").alias("a"),
                                  F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"),
                           F.col("sz").alias("szb")), "b")
        .withColumn("jaccard",
                    F.col("n_inter") / (F.col("sza") + F.col("szb") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, col: str = "text", n: int = 3, k: int = 32
) -> DataFrame:
    """(doc_id, h0..h{k-1}): k minhashes in ONE groupBy pass (k aggregate
    expressions over murmur3 with per-function seed columns)."""
    sh = _shingles(df, col, n)
    aggs = [F.min(F.hash(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(k)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket: int = 256,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: signature -> band hashes -> bucket join
    -> verify with signature agreement (estimated Jaccard).

    Bucket-size guard (the hub cap editdist_pairs/ngram_jaccard_pairs
    already carry): a band bucket of B docs yields B^2/2 candidates
    from the self-join, so a degenerate bucket — a mass-duplicated
    boilerplate template, B=1e6 identical docs hashed into one band —
    would emit 5e11 pairs before verification. Buckets with more than
    max_bucket members therefore skip the all-pairs join and emit a
    doc_id-ordered CHAIN instead (rank i joined to rank i+1): O(B)
    candidates, and — because every member of a mass-duplicate bucket
    is near-identical — the chain pairs all survive verification, so
    downstream duplicate_clusters still sees the bucket as one
    connected component. Recall cost, documented: within an over-cap
    bucket, non-adjacent pairs are not emitted directly, and a chain
    link between two genuinely dissimilar members (false-positive
    co-occupants interleaved in a mixed hub bucket) can fail the
    verify step and split the component; at max_bucket=256 that regime
    only begins where all-pairs would already be intractable.
    max_bucket=None disables the guard."""
    rows = k // bands
    sig = minhash_signatures(df, col, n, k).cache()
    band_cols = [
        F.hash(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    # long format: one (band_idx, band_hash) self-join instead of `bands`
    # separate shuffles — the join key extension keeps buckets disjoint
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("bi", "bh")
    )
    if max_bucket is not None:
        # one shuffle on (bi, bh) computes both the bucket size and the
        # in-bucket rank; the per-bucket work is the O(B) sort, never
        # the O(B^2) pair explosion
        w = Window.partitionBy("bi", "bh")
        banded = banded.select(
            "doc_id",
            "bi",
            "bh",
            F.count("*").over(w).alias("bsz"),
            F.row_number().over(w.orderBy("doc_id")).alias("rk"),
        )
        small = banded.filter(F.col("bsz") <= max_bucket)
        cand_small = (
            small.select(F.col("doc_id").alias("a"), "bi", "bh")
            .join(small.select(F.col("doc_id").alias("b"), "bi", "bh"), ["bi", "bh"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        big = banded.filter(F.col("bsz") > max_bucket)
        cand_big = (
            big.select(F.col("doc_id").alias("a"), "bi", "bh", "rk")
            .join(
                big.select(
                    F.col("doc_id").alias("b"),
                    "bi",
                    "bh",
                    (F.col("rk") - 1).alias("rk"),
                ),
                ["bi", "bh", "rk"],
            )
            .select("a", "b")
        )
        cand = cand_small.unionAll(cand_big).distinct()
    else:
        lhs = banded.select(F.col("doc_id").alias("a"), "bi", "bh")
        rhs = banded.select(F.col("doc_id").alias("b"), "bi", "bh")
        cand = (
            lhs.join(rhs, ["bi", "bh"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
    sa = sig.select(F.col("doc_id").alias("a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(k)])
    sb = sig.select(F.col("doc_id").alias("b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(k)])
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(k)
    )
    return (
        cand.join(sa, "a").join(sb, "b")
        .withColumn("est_jaccard", agree / F.lit(k))
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash(df: DataFrame, col: str = "text", bits: int = 32) -> DataFrame:
    """(doc_id, simhash): classic bitwise-majority token signature, built
    as `bits` aggregate expressions in one pass. bits is 32 or 64.

    The per-token hash is md5 hex slices (one 8-char slice for 32 bits,
    two for 64), not murmur3: md5 is bit-reproducible across engines, so
    the whole signature — and therefore the near-pair output — has an
    exact DuckDB oracle (`('0x' || substr(md5(tok),1,8))::BIGINT`).

    64 bits is the scale default: 32-bit signatures saturate on large
    corpora (at ~1e5 docs per 8-bit block value the birthday bound makes
    block collisions — i.e. false candidates — routine)."""
    if bits not in (32, 64):
        raise ValueError(f"simhash bits must be 32 or 64, got {bits}")
    toks = df.select(
        "doc_id", F.explode(F.split(F.trim(F.lower(F.col(col))), r"\s+")).alias("tok")
    ).withColumn("md5", F.md5("tok")).withColumn(
        "th", F.conv(F.substring("md5", 1, 8), 16, 10).cast("long")
    )
    if bits == 64:
        # second independent 32-bit slice supplies bits 32..63
        toks = toks.withColumn(
            "th_hi", F.conv(F.substring("md5", 9, 8), 16, 10).cast("long")
        )

    def _src(i):
        # bit i of the signature comes from bit (i % 32) of the i//32-th slice
        return F.col("th") if i < 32 else F.col("th_hi")

    bit_aggs = [
        F.sum(
            F.when(
                F.shiftright(_src(i), i % 32).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_aggs)
    # assemble as two 32-bit halves so no single literal exceeds the
    # signed-long range (1 << 63 would); shiftleft wraps in two's
    # complement, matching DuckDB's signed BIGINT arithmetic
    lo = sum(
        F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(min(bits, 32))
    )
    if bits == 32:
        return agg.select("doc_id", lo.cast("long").alias("simhash"))
    hi = sum(
        F.when(F.col(f"b{i}") > 0, F.lit(1 << (i - 32))).otherwise(F.lit(0))
        for i in range(32, bits)
    )
    sig = F.shiftleft(hi.cast("long"), 32).bitwiseOR(lo.cast("long"))
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, col: str = "text", max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on four
    equal-width chunks (8-bit for 32-bit signatures, 16-bit for 64-bit):
    by pigeonhole, any pair within distance <= 3 has at least one
    identical chunk, so candidate generation is 4 equi-joins, never
    all-pairs."""
    s = simhash(df, col, bits=bits)
    w = bits // 4
    mask = (1 << w) - 1
    for i in range(4):
        s = s.withColumn(
            f"c{i}", F.shiftright("simhash", w * i).bitwiseAND(F.lit(mask))
        )
    out = None
    for i in range(4):
        a = s.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"),
                     F.col(f"c{i}").alias("blk"), F.lit(i).alias("blk_id"))
        b = s.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"),
                     F.col(f"c{i}").alias("blk"), F.lit(i).alias("blk_id"))
        p = a.join(b, ["blk", "blk_id"]).filter(F.col("a") < F.col("b")).drop("blk", "blk_id")
        out = p if out is None else out.unionByName(p)
    return (
        out.distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def embedding_near_dupes(
    emb: DataFrame,
    threshold: float = 0.95,
    planes: int = 8,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with a deterministic sign-LSH
    bucket prefilter; exact cosine within buckets only.

    Buckets are signs of dot products with a seeded random-hyperplane
    matrix (similarity.random_hyperplanes): raw-dim signs collapse to a
    single bucket on anisotropic or non-negative encoder embeddings,
    turning the within-bucket join into all-pairs. `dim` is inferred
    from the first row when not given."""
    from pathways2go_spark.similarity import sign_bucket

    if dim is None:
        head = emb.select("embedding").head()
        dim = len(head["embedding"]) if head else 0
    v = F.col("embedding")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x))
    e = emb.select(
        "vec_id", "embedding", norm.alias("norm"),
        sign_bucket(v, planes, dim, seed).alias("bkt"),
    )
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"),
                 F.col("norm").alias("na"), "bkt")
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"),
                 F.col("norm").alias("nb"), "bkt")
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, "bkt").filter(F.col("a") < F.col("b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )


# ----------------------------------------------------------------------
# Duplicate clustering: connected components over a duplicate-pair edge
# list (the north rule's "connected-components-style ID resolution").
# Pair generators above (minhash/simhash/embedding) emit PAIRS; a
# training-data pipeline needs the transitive CLUSTERS (a~b, b~c => one
# group with one canonical survivor). Iterative min-label propagation:
# O(component diameter) rounds, each a single shuffle keyed by node id —
# the classic large-graph CC shape (no driver-side union-find, no
# GraphFrames dependency). Labels only ever decrease, so convergence is
# detected by an exact changed-label count per round (labels are opaque
# ids — often strings — so a numeric sum fingerprint is not an option:
# sum(string) crashes under ANSI and is NULL otherwise).
# ----------------------------------------------------------------------

def duplicate_clusters(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """(a, b) duplicate pairs -> (doc_id, cluster_id) where cluster_id is
    the smallest doc_id in the connected component — the deterministic
    canonical representative (keep cluster_id, drop the rest)."""
    ea = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = ea.unionByName(
        ea.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if checkpoint:
        edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(max_iter):
        prop = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        # Exact convergence test: labels only ever shrink, so count the
        # rows where the new label differs from the old one. Works for
        # any id type (doc ids are strings); only a scalar reaches the
        # driver.
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "old_label"), "node"
            )
            .filter(F.col("label") != F.col("old_label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def paragraph_dedup(
    df: DataFrame, window: int = 10, col: str = "text"
) -> DataFrame:
    """Sub-document (paragraph-level) dedup, the CCNet shape: chunk each
    document into fixed `window`-token paragraphs, hash each chunk, and
    keep only the FIRST occurrence of every distinct chunk corpus-wide
    (first = lowest (doc_id, chunk_idx) — deterministic under any
    partitioning). Returns per document:

        doc_id, n_chunks, n_kept, kept_md5

    where kept_md5 fingerprints the document's surviving text (kept
    chunks re-joined in order), so downstream stages can join the
    deduped content without re-deriving it.

    Scale shape: one narrow chunking projection, ONE shuffle keyed by
    chunk hash (the row_number window), one groupBy back to doc_id.
    Chunk-hash keys are near-uniform, so no hub key; a boilerplate chunk
    shared by millions of pages lands in one partition only for its
    rank-1 selection — AQE skew handling covers the residual."""
    toks = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
    )
    exploded = df.select(
        "doc_id", F.posexplode(chunks).alias("idx", "chunk")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy("doc_id", "idx")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("idx"), F.col("chunk"))
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("rn") == 1).cast("int")).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["chunk"],
                    ),
                )
            ).alias("kept_md5"),
        )
        .select("doc_id", "n_chunks", "n_kept", "kept_md5")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    col: str = "text",
    drop: bool = False,
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one word `n`-gram with the benchmark (eval/test) corpus — the
    standard guard against test-set leakage into pretraining data.

    Returns (doc_id, n_contam, contaminated) for every training doc, or
    the clean training subset when drop=True.

    Scale shape: the benchmark n-gram set is bounded by the eval corpus
    (thousands of documents even for a large suite), so the join against
    the training n-gram stream is a broadcast probe under AQE — the
    100 TB training side is never shuffled on the gram key; its grams
    stream through the probe and collapse back to one count per doc."""
    bench_grams = _shingles(benchmark, col, n).select("shingle").distinct()
    hits = (
        _shingles(train, col, n)
        .join(bench_grams, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contam"))
    )
    out = (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .fillna(0, subset=["n_contam"])
        .withColumn("contaminated", F.col("n_contam") > 0)
    )
    if drop:
        return train.join(
            out.filter("contaminated").select("doc_id"), "doc_id", "left_anti"
        )
    return out


def dedupe_documents(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Corpus minus non-canonical duplicates: cluster the pair list
    (duplicate_clusters) and keep, per component, only the smallest
    doc_id; documents in no pair pass through untouched.

    The drop set is deliberately NOT broadcast: it has one row per
    clustered duplicate, and at web-corpus scale duplicates are
    routinely 20-50% of all documents — billions of rows, far past any
    broadcast threshold. A plain left-anti join lets AQE broadcast it
    when it actually fits and fall back to a shuffle join when it
    doesn't."""
    clusters = duplicate_clusters(pairs, a=a, b=b)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.92,
    round_to: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embedding space, then prune near-duplicates WITHIN each cluster only.

    Shape at 100 TB: the pairwise cosine join carries `cell` as its key,
    so candidate pairs are cluster-local — k grows with the corpus
    (k ~ sqrt(N) in the paper) and keeps cells bounded, so the join
    never degenerates to all-pairs; training is the distributed Lloyd
    trainer (similarity.kmeans_fit — only the k x dim codebook touches
    the driver) and assignment is one narrow codegen'd pass.

    Keep rule (deterministic): within a cell, a document is dropped iff
    an earlier document (lower `id_col`) in the same cell has cosine >=
    threshold — the paper's "keep one per semantic cluster" with
    first-occurrence survivorship. Cosines are quantized to `round_to`
    decimals before the comparison so the decision is reproducible
    cross-engine (same contract as the IVF oracle family).

    Returns (vec_id, cell, kept) for every input row.
    """
    from pathways2go_spark.similarity import ivf_assign, kmeans_fit

    cents = kmeans_fit(emb, k=k, iters=iters, vec_col=vec_col,
                       id_col=id_col, round_to=round_to, exact_mean=True)
    assigned = ivf_assign(emb, cents, vec_col=vec_col, round_to=round_to)
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))
    e = assigned.select(F.col(id_col), v.alias("v"), norm.alias("n"), "cell")
    a = e.select(F.col(id_col).alias("a"), F.col("v").alias("va"),
                 F.col("n").alias("na"), "cell")
    b = e.select(F.col(id_col).alias("b"), F.col("v").alias("vb"),
                 F.col("n").alias("nb"), "cell")
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"),
                   lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")),
                                      round_to))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
        .withColumn("kept", F.lit(False))
    )
    return (
        assigned.select(id_col, "cell")
        .join(dropped, id_col, "left")
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(True)))
    )


def editdist_pairs(
    docs: DataFrame,
    prefix_len: int = 40,
    max_dist: int = 4,
    max_block: int = 64,
) -> DataFrame:
    """Edit-distance-VERIFIED near-duplicate pairs: prefix-hash blocking
    proposes candidates, exact Levenshtein confirms them — the verify
    stage the signature-only detectors (MinHash/SimHash) skip. Catches
    the append/truncate mutation class (shared prefix, edited tail)
    that shingle-Jaccard scores poorly on short docs.

    Returns (doc_a, doc_b, dist), doc_a < doc_b, dist <= max_dist.

    Scale shape: the block key is md5(prefix), so candidate generation
    is ONE equi-join keyed on the hash — never all-pairs. Blocks larger
    than max_block are dropped before the self-join (the same df-cap
    hub guard as ngram_jaccard_pairs: a boilerplate prefix shared by
    1e6 docs must not become a 1e12-pair block; such docs are
    boilerplate-dedup territory, not edit-distance territory).
    Levenshtein runs only on surviving in-block pairs — it is O(len^2)
    per pair, which is exactly why it must sit BEHIND blocking, never
    on the cross product."""
    b = docs.select(
        "doc_id",
        "text",
        F.md5(F.substring("text", 1, prefix_len)).alias("bk"),
    )
    small = (
        b.groupBy("bk")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_block)
        .select("bk")
    )
    b = b.join(small, "bk")
    return (
        b.alias("x")
        .join(b.alias("y"), "bk")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.levenshtein(F.col("x.text"), F.col("y.text")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def _banded_signatures(
    docs: DataFrame, col: str, n: int, k: int, bands: int
) -> DataFrame:
    """(doc_id, bi, bh, sig): one long-format row per (document, band),
    carrying the full k-minhash signature as an array so the verify
    stage never re-reads the text."""
    rows = k // bands
    sig = minhash_signatures(docs, col, n, k)
    band_cols = [
        F.hash(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"),
        F.posexplode(F.array(*band_cols)).alias("bi", "bh"),
    ).select("doc_id", "bi", "bh", "sig")


def write_minhash_index(
    spark,
    docs: DataFrame,
    path: str,
    table: str,
    col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    buckets: int = 32,
) -> None:
    """Materialize the corpus's banded MinHash signature store as a
    BUCKETED table on the probe key (bi, bh).

    This is the incremental-dedup layout for a living corpus: the
    signatures are ~0.3% the bytes of the raw text (k ints per doc vs
    KBs of prose), and bucketing means tomorrow's batch probe pays NO
    shuffle on the corpus side — the store's band-hash partitioning was
    bought once, at write time, exactly like the ANN index's
    partition-pruned probe (similarity.py) and the bucketed-join proof
    (tests/test_bucketing.py). Re-signing the corpus per batch would
    re-read 100 TB of text; re-shuffling even the signatures is
    O(corpus) network per batch — this pays O(batch) instead."""
    (
        _banded_signatures(docs, col, n, k, bands)
        .write.bucketBy(buckets, "bi", "bh")
        .sortBy("bi", "bh")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def dedup_against_index(
    spark,
    batch: DataFrame,
    table: str,
    col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Incremental dedup: match a NEW batch of documents against the
    materialized corpus signature store (write_minhash_index) without
    touching corpus text. Returns (batch_id, corpus_id, est_jaccard)
    for every batch document whose estimated Jaccard against a corpus
    document clears the threshold — the daily new-crawl-vs-corpus job.

    Plan shape: the batch (small) is signed and banded with the same
    (n, k, bands) parameters, then equi-joined to the store on
    (bi, bh). Because the store is bucketed on that key, only the
    batch side shuffles — one Exchange total, asserted in
    tests/test_corpus_ops.py. Band collisions produce up to `bands`
    candidate rows per pair; the verify groupBy collapses them and
    compares the two full signatures it carried along — no second
    probe of the store, no text reads."""
    probe = _banded_signatures(batch, col, n, k, bands).select(
        F.col("doc_id").alias("batch_id"),
        "bi",
        "bh",
        F.col("sig").alias("batch_sig"),
    )
    store = spark.table(table).select(
        F.col("doc_id").alias("corpus_id"),
        "bi",
        "bh",
        F.col("sig").alias("corpus_sig"),
    )
    cand = probe.join(store, ["bi", "bh"]).groupBy(
        "batch_id", "corpus_id"
    ).agg(
        F.first("batch_sig").alias("batch_sig"),
        F.first("corpus_sig").alias("corpus_sig"),
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("batch_sig"),
            F.col("corpus_sig"),
            lambda a, b: (a == b).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("est_jaccard", F.round(agree / F.lit(k), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("batch_id", "corpus_id", "est_jaccard")
    )


def dedupe_documents_by_quality(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Corpus minus duplicates, keeping the HIGHEST-`quality_col` member
    of each duplicate cluster (doc-id tie-break) — the production
    survivor policy: dedup should keep the best copy (longest, cleanest,
    highest classifier score), not the first-crawled one that min-id
    canonicalization (dedupe_documents) keeps.

    Scale shape matches dedupe_documents: cluster the pair list, join
    the quality column for CLUSTERED docs only (the drop-set side — a
    duplicate-sized table, never the corpus), rank inside each cluster
    with one window (clusters are small; a mega-cluster is bounded by
    the pair generator's hub caps upstream), and left-anti join the
    losers — AQE picks broadcast vs shuffle."""
    from pyspark.sql.window import Window

    clusters = duplicate_clusters(pairs, a=a, b=b)
    scored = clusters.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(quality_col)),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(quality_col), F.asc("doc_id")
    )
    drop = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 256,
) -> DataFrame:
    """DIRECTIONAL near-dup detection by shingle containment
    C(A->B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| — catches the
    excerpt/quotation class symmetric Jaccard scores poorly: a 20-token
    excerpt of a 2000-token page has Jaccard ~0.01 but containment 1.0.

    Same scale shape as ngram_jaccard_pairs: one distinct-shingle pass,
    a df-capped shingle equi-join (a boilerplate shingle shared by 1e6
    docs must not fan out 1e12 candidate rows — such shingles carry no
    containment signal anyway), one (a, b) groupBy. The denominator is
    A's FULL shingle count (computed before the cap), so the score's
    meaning doesn't depend on the cap. Returns (a, b, n_inter, n_a,
    containment) with containment = C(a->b) >= threshold; directional,
    so an excerpt scores high toward its source but not back."""
    sh = _shingles(docs, "text", n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_a"))
    keep = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    sh2 = sh.join(keep, "shingle")
    inter = (
        sh2.alias("x")
        .join(sh2.alias("y"), "shingle")
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a"), "a")
        .withColumn(
            "containment",
            F.round(F.col("n_inter") / F.col("n_a").cast("double"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("a", "b", "n_inter", "n_a", "containment")
    )


def md5_minhash_lsh_candidates(
    df: DataFrame,
    col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Engine-portable MinHash-LSH candidate pairs: every hash is
    md5-top-32 (minhash_i = min over shingles of md5(i|shingle)), so an
    external engine can replay the candidate set bit-for-bit — unlike
    minhash_lsh_pairs, whose murmur3 signatures are Spark-internal.

    Same scale shape as the murmur3 path: one narrow shingle pass, k
    minhash aggregates in ONE groupBy, a single (band_idx, band_hash)
    self-join — candidates are bucket-local, never all-pairs. Returns
    distinct (a, b) with a < b; NO estimated-similarity filter, because
    the point of the raw candidate set is to measure the banding's own
    recall (lsh_recall) before trusting it at corpus scale."""
    rows = k // bands
    sh = _shingles(df, col, n)

    def _h(i: int):
        return F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{i}")

    sig = sh.groupBy("doc_id").agg(*[_h(i) for i in range(k)])
    band_cols = [
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"h{b * rows + r}") for r in range(rows)],
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("bi", "bh")
    )
    lhs = banded.select(F.col("doc_id").alias("a"), "bi", "bh")
    rhs = banded.select(F.col("doc_id").alias("b"), "bi", "bh")
    return (
        lhs.join(rhs, ["bi", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def lsh_recall(
    df: DataFrame,
    col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_df: int | None = 256,
) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate set against
    ground-truth n-gram Jaccard >= threshold pairs — the number a
    100 TB user tunes (k, bands) by BEFORE committing to a full corpus
    dedup (LSH can be value-exact on its chosen candidates yet
    recall-poor on the corpus; this measures the banding itself).
    Companion to similarity.ann_recall, which does the same for ANN.

    Fully relational: truth and candidates are two bounded pair sets;
    one full-outer join on (a, b) feeds a single aggregate computing
    |truth|, |candidates| and |intersection| in one pass — no collect,
    no second scan of either side. Ratios are fixed-point-rounded to
    6dp so external engines agree. Returns one row
    (n_truth, n_cand, n_hits, precision, recall)."""
    truth = (
        ngram_jaccard_pairs(df, col, n, threshold, max_df)
        .select("a", "b")
        .withColumn("t", F.lit(1))
    )
    cand = md5_minhash_lsh_candidates(df, col, n, k, bands).withColumn(
        "c", F.lit(1)
    )
    j = truth.join(cand, ["a", "b"], "full_outer").select(
        F.coalesce("t", F.lit(0)).alias("t"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    fp6 = lambda x: F.floor(x * 1e6 + F.lit(0.5)) / F.lit(1e6)
    return (
        j.agg(
            F.sum("t").cast("long").alias("n_truth"),
            F.sum("c").cast("long").alias("n_cand"),
            F.sum(F.col("t") * F.col("c")).cast("long").alias("n_hits"),
        )
        .select(
            "n_truth",
            "n_cand",
            "n_hits",
            F.when(
                F.col("n_cand") > 0,
                fp6(F.col("n_hits") / F.col("n_cand")),
            ).alias("precision"),
            F.when(
                F.col("n_truth") > 0,
                fp6(F.col("n_hits") / F.col("n_truth")),
            ).alias("recall"),
        )
    )


def lsh_band_sweep(
    df: DataFrame,
    col: str = "text",
    n: int = 3,
    k: int = 16,
    bands_list: tuple[int, ...] = (2, 4, 8),
    threshold: float = 0.5,
    max_df: int | None = 256,
) -> DataFrame:
    """The banding TUNING CURVE: lsh_recall at several band counts from
    ONE signature pass — more bands (fewer rows per band) means higher
    recall and more junk candidates; this returns the whole trade-off
    so a 100 TB user picks the operating point before the full run.

    Scale shape: shingles and the k md5-minhashes are computed once
    (the signature frame is persisted — doc-bounded, k ints per doc);
    each band count is just one more projection + posexplode of that
    frame, all unioned into a single (bands, band_idx, band_hash)
    self-join. Truth pairs are computed once. Returns one row per band
    count: (bands, n_truth, n_cand, n_hits, precision, recall)."""
    for b in bands_list:
        if k % b:
            raise ValueError(f"bands {b} must divide k={k}")
    sh = _shingles(df, col, n)

    def _h(i: int):
        return F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{i}")

    sig = sh.groupBy("doc_id").agg(*[_h(i) for i in range(k)]).persist()

    def _banded(b: int) -> DataFrame:
        rows = k // b
        band_cols = [
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"h{bi * rows + r}")
                                for r in range(rows)
                            ],
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias(f"band{bi}")
            for bi in range(b)
        ]
        return sig.select(
            F.lit(b).alias("bands"),
            "doc_id",
            F.posexplode(F.array(*band_cols)).alias("bi", "bh"),
        )
    banded = _banded(bands_list[0])
    for b in bands_list[1:]:
        banded = banded.unionByName(_banded(b))
    lhs = banded.select("bands", F.col("doc_id").alias("a"), "bi", "bh")
    rhs = banded.select("bands", F.col("doc_id").alias("b"), "bi", "bh")
    cand = (
        lhs.join(rhs, ["bands", "bi", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("bands", "a", "b")
        .distinct()
    )
    truth = (
        ngram_jaccard_pairs(df, col, n, threshold, max_df)
        .select("a", "b")
        .withColumn("t", F.lit(1))
        .persist()
    )
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    per_band = (
        cand.join(truth, ["a", "b"], "left")
        .groupBy("bands")
        .agg(
            F.count("*").cast("long").alias("n_cand"),
            F.sum(F.coalesce("t", F.lit(0))).cast("long").alias(
                "n_hits"
            ),
        )
    )
    # a band config with ZERO candidates must still report its row
    dim = df.sparkSession.createDataFrame(
        [(int(b),) for b in bands_list], "bands int"
    )
    per_band = dim.join(per_band, "bands", "left").select(
        "bands",
        F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
    )
    fp6 = lambda x: F.floor(x * 1e6 + F.lit(0.5)) / F.lit(1e6)
    return (
        per_band.join(F.broadcast(n_truth))
        .select(
            "bands",
            "n_truth",
            "n_cand",
            "n_hits",
            F.when(
                F.col("n_cand") > 0,
                fp6(F.col("n_hits") / F.col("n_cand")),
            ).alias("precision"),
            F.when(
                F.col("n_truth") > 0,
                fp6(F.col("n_hits") / F.col("n_truth")),
            ).alias("recall"),
        )
        .orderBy("bands")
    )
