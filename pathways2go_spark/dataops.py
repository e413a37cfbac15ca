"""Training-data pipeline composition ops over the documents corpus:
token-budget shard assignment, deterministic stratified sampling, and
domain-mixture weighting.

Beyond the reference (batch KG engine only), per the driver brief's
large-scale-training-pipeline mandate. Everything here is deterministic
— re-running on the same corpus yields byte-identical assignments, so a
resumed/retried pipeline never reshuffles data between shards — and
value-exact against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import token_count

# fixed-point denominator for deterministic hash sampling: md5 is
# bit-identical across engines (same trick as dedup.simhash), so the
# kept-set has an exact DuckDB oracle
SAMPLE_MOD = 1_000_000


def _hash_bucket(id_col: str) -> F.Column:
    """Uniform bucket in [0, SAMPLE_MOD) from the first 8 md5 hex chars
    of the id — engine-portable (DuckDB:
    ('0x'||substr(md5(id),1,8))::BIGINT % MOD)."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(SAMPLE_MOD))


def shard_assignment(
    df: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, shard): pack the corpus, in deterministic id order,
    into shards of ~`target_tokens` tokens each — the standard layout
    step before tokenize-and-pack for training.

    shard = floor(exclusive-prefix-sum(n_tokens) / target_tokens) over
    the id ordering: every shard except the last holds >= target_tokens
    and each document lands in exactly one shard, deterministically.
    `id_col` values must be unique (they are document ids).

    Scale shape: a naive global window (Window.orderBy(id)) collapses
    into ONE task. This computes the same exclusive prefix sum in two
    phases — the classic distributed scan — with FAILURE-DETERMINISTIC
    group assignment: phase 1 range-partitions by id and collects one
    (range max_id, range token total) row per partition; phase 2 assigns
    every document its range group by a broadcast range lookup on id
    against those frozen boundaries. Nothing downstream depends on
    physical partition identity (no spark_partition_id, no checkpoint
    pinning), so an executor lost after phase 1 recomputes into exactly
    the same groups — documents can never silently shift between shards
    mid-job. Driver traffic is O(partitions)."""
    spark = df.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("id"), token_count(text_col).alias("n_tokens")
    )
    # phase 1: one job — per-range max id (the boundary) + token total.
    # pid is used ONLY inside this single job to name the ranges; the
    # collected (max_id, tot) pairs are what downstream depends on.
    stats = sorted(
        base.repartitionByRange(n_part, "id")
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.max("id").alias("max_id"), F.sum("n_tokens").alias("tot"))
        .collect(),
        key=lambda r: r["pid"],
    )
    if not stats:
        return base.select(
            F.col("id").alias(id_col), "n_tokens",
            F.lit(0).cast("long").alias("shard"),
        )
    offsets, acc = [], 0
    for g, r in enumerate(stats):
        offsets.append((g, acc))
        acc += r["tot"]
    # group g holds ids in (max_id[g-1], max_id[g]]: grp = count of
    # non-final boundaries strictly below id — a pure function of
    # (id, frozen boundaries), identical on any recomputation
    inner_bounds = [r["max_id"] for r in stats[:-1]]
    if inner_bounds:
        grp = F.size(
            F.filter(F.lit(inner_bounds), lambda b: b < F.col("id"))
        )
    else:
        grp = F.lit(0)
    off = spark.createDataFrame(
        [(int(g), int(o)) for g, o in offsets], "grp int, offset long"
    )
    w = Window.partitionBy("grp").orderBy("id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        base.withColumn("grp", grp)
        .join(F.broadcast(off), "grp")
        .withColumn("prefix",
                    F.col("offset") + F.coalesce(F.sum("n_tokens").over(w),
                                                 F.lit(0)))
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.floor(F.col("prefix") / F.lit(target_tokens)).alias("shard"),
        )
    )


def pack_documents(
    df: DataFrame,
    budget: int,
    n_groups: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing (first-fit in id order) into fixed
    token-budget bins — the tokenize-and-pack layout step before
    training. Returns (id, grp, n_tokens, bin_id); bin ids are local to
    their group, so the global bin key is (grp, bin_id).

    Within each group, documents are scanned in id order: a document
    joins the current bin unless that would exceed `budget`, which
    closes the bin and opens a new one; a document longer than `budget`
    gets a bin of its own. Deterministic end to end: the group is a pure
    function of the id (md5 bucket mod n_groups — engine-portable, the
    sampling hash), so retries and different cluster sizes reproduce
    identical bins.

    Scale shape: greedy packing is inherently sequential, so it
    parallelizes ACROSS groups — one shuffle co-locates each group, then
    an Arrow-batched applyInPandas runs the O(group size) scan per
    group. Pick n_groups >> executor count at scale; the only per-group
    state is two scalars (current bin, current fill)."""
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("id"), token_count(text_col).alias("n_tokens")
    ).withColumn("grp", F.pmod(_hash_bucket("id"), F.lit(n_groups)).cast("int"))
    id_type = base.schema["id"].dataType.simpleString()

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bins = np.empty(len(pdf), dtype=np.int64)
        bin_id, fill = 0, 0
        for i, n in enumerate(pdf["n_tokens"].to_numpy()):
            if i > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += n
            bins[i] = bin_id
        pdf["bin_id"] = bins
        return pdf[["id", "grp", "n_tokens", "bin_id"]]

    return (
        base.groupBy("grp")
        .applyInPandas(
            pack, schema=f"id {id_type}, grp int, n_tokens long, bin_id long"
        )
        .withColumnRenamed("id", id_col)
    )


def corpus_funnel(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end training-corpus preparation funnel — the composition a
    100 TB pipeline actually runs, as ONE declarative plan:

        raw -> quality gate -> repetition gate -> exact dedup
            -> benchmark decontamination

    Each stage applies to the previous stage's survivors (true funnel
    semantics: the dedup keeper is ranked among quality+repetition
    survivors, and only deduped docs are probed for contamination).
    Returns the 5-row census (stage_idx, stage, n_docs, n_tokens).

    Scale shape — the reason to compose in one plan instead of five jobs:
    the two cheap narrow gates (quality: one codegen'd projection;
    repetition: two per-doc gram aggs, keys never leave their document)
    run FIRST and shrink the corpus before the only wide ops — the one
    md5-keyed dedup shuffle and the decontamination gram probe — touch
    it. The benchmark gram side is eval-suite-bounded, so that join is a
    broadcast probe under AQE; the final census is five conditional
    aggregates collapsed to scalars, then `stack`ed. No corpus-wide hub
    key, no driver-side loop, no Python in the hot path (the gates are
    Column expressions from textops/dedup, already oracle-EXACT
    individually)."""
    from pyspark.sql import Window

    from .dedup import decontaminate
    from .textops import quality_columns, repetition_signals

    # the quality gate is a pure per-row expression, so it fuses into
    # the base scan (one corpus shuffle-join fewer than computing it as
    # a separate projection and re-attaching on doc_id). The repetition
    # gate stays on its aggregation path: its codegen'd hash aggregates
    # beat the shuffle-free interpreted-lambda variant 2.7x on a
    # CPU-bound host (see repetition_signals(narrow=...))
    qc = quality_columns(text_col)["quality_ok"]
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        token_count(text_col).alias("n_tokens"),
        qc.alias("quality_ok"),
    )
    r = repetition_signals(df, text_col).select("doc_id", "repetition_ok")
    flags = base.join(r, "doc_id").withColumn(
        "pass2", F.col("quality_ok") & F.col("repetition_ok")
    )
    # dedup keeper ranked among pass2 survivors ONLY — the filter lands
    # before the md5 shuffle, so the funnel ordering shrinks the wide op
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    keepers = (
        flags.filter("pass2")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.lit(True).alias("keeper"))
    )
    flags = flags.join(keepers, "doc_id", "left").withColumn(
        "pass3", F.col("pass2") & F.coalesce(F.col("keeper"), F.lit(False))
    )
    contam = decontaminate(
        flags.filter("pass3").select("doc_id", "text"), benchmark, n=n
    ).select("doc_id", "contaminated")
    flags = flags.join(contam, "doc_id", "left").withColumn(
        "pass4",
        F.col("pass3") & ~F.coalesce(F.col("contaminated"), F.lit(False)),
    )

    def _cnt(flag, alias):
        return F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias(alias)

    def _tok(flag, alias):
        return (
            F.sum(F.when(flag, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias(alias)
        )

    agg = flags.agg(
        F.count("*").cast("long").alias("c0"),
        F.sum("n_tokens").cast("long").alias("t0"),
        _cnt(F.col("quality_ok"), "c1"), _tok(F.col("quality_ok"), "t1"),
        _cnt(F.col("pass2"), "c2"), _tok(F.col("pass2"), "t2"),
        _cnt(F.col("pass3"), "c3"), _tok(F.col("pass3"), "t3"),
        _cnt(F.col("pass4"), "c4"), _tok(F.col("pass4"), "t4"),
    )
    return agg.selectExpr(
        """stack(5,
             0, 'raw',            c0, t0,
             1, 'quality',        c1, t1,
             2, 'repetition',     c2, t2,
             3, 'dedup_exact',    c3, t3,
             4, 'decontaminated', c4, t4
           ) as (stage_idx, stage, n_docs, n_tokens)"""
    )


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id-hash
    bucket falls below the stratum's fraction. Unlike df.sample(), the
    kept set is a pure function of (id, fraction) — stable across
    retries, resumes and cluster sizes, and exactly reproducible in SQL.
    One narrow scan, no shuffle."""
    frac = F.lit(default)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return df.withColumn("_bkt", _hash_bucket(id_col)).filter(
        F.col("_bkt") < (frac * SAMPLE_MOD).cast("long")
    ).drop("_bkt")


def mixture_weights(
    df: DataFrame,
    target_props: dict[str, float],
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum token census + the sampling rate that reshapes the
    corpus toward a target mixture (domain-weighting step of a training
    data pipeline): rate_s = (target_s / actual_s), renormalized so the
    largest rate is 1.0 (pure downsampling — no stratum is upsampled).

    Output: (stratum, n_docs, n_tokens, actual_prop, target_prop,
    sample_rate), one shuffle (the groupBy)."""
    census = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    tp = F.lit(0.0)
    for k, v in sorted(target_props.items()):
        tp = F.when(F.col("stratum") == k, F.lit(float(v))).otherwise(tp)
    tot = Window.partitionBy()
    raw = (
        census.withColumn("actual_prop",
                          F.col("n_tokens") / F.sum("n_tokens").over(tot))
        .withColumn("target_prop", tp)
        .withColumn("raw_rate", F.col("target_prop") / F.col("actual_prop"))
    )
    return raw.withColumn(
        "sample_rate",
        F.round(F.col("raw_rate") / F.max("raw_rate").over(tot), 6),
    ).select(
        "stratum", "n_docs", "n_tokens",
        F.round("actual_prop", 6).alias("actual_prop"),
        F.round("target_prop", 6).alias("target_prop"),
        "sample_rate",
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023 — public method): featurize documents as
    hashed uni+bigram counts over a FIXED bucket space, fit two
    bag-of-ngrams distributions (p = target domain, q = the raw corpus
    being selected from, both add-1 smoothed over the bucket space), and
    score every raw document by its importance log-weight

        log w(x) = sum_b count_x[b] * ln(p[b] / q[b]).

    Returns (doc_id, n_feats, log_weight). Callers select by
    thresholding or Gumbel-top-k on log_weight (compose with
    sample_stratified / pack_documents).

    Scale shape — the contrast with bigram_lm_score: the model here is
    NOT corpus-sized. Both fitted distributions live on the fixed
    `buckets`-row space, so the fit is one groupBy per side that
    partial-aggregates down to `buckets` rows, the log-ratio table is a
    `buckets`-row dim, and scoring is a BROADCAST join of per-doc bucket
    counts against that dim followed by one per-doc sum — no shuffle on
    a corpus-sized key anywhere. Bucket hashing is the engine-portable
    md5-top-32 trick, so the whole op has an exact DuckDB oracle; the
    per-doc float sum folds rounded contributions in ascending order
    (sort_array + fold, the classifier_score technique) for cross-engine
    bit-equality."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(toks, bi)
    bucket = lambda g: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )

    def feats(d: DataFrame) -> DataFrame:
        return (
            d.select("doc_id", F.explode(grams).alias("g"))
            .select("doc_id", bucket(F.col("g")).alias("b"))
            .groupBy("doc_id", "b")
            .agg(F.count("*").alias("c"))
        )

    def dist(d: DataFrame, name: str) -> tuple[DataFrame, DataFrame]:
        # bucket census + total, smoothed over the fixed bucket space
        cnt = (
            d.select(F.explode(grams).alias("g"))
            .select(bucket(F.col("g")).alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias(f"c_{name}"))
        )
        tot = cnt.agg(F.sum(f"c_{name}").alias(f"tot_{name}"))
        return cnt, tot

    p_cnt, p_tot = dist(target, "p")
    q_cnt, q_tot = dist(df, "q")
    ratio = (
        p_cnt.join(q_cnt, "b", "full")
        .crossJoin(F.broadcast(p_tot))
        .crossJoin(F.broadcast(q_tot))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("c_p"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tot_p") + F.lit(float(buckets)))
                )
                - F.log(
                    (F.coalesce(F.col("c_q"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tot_q") + F.lit(float(buckets)))
                ),
                6,
            ).alias("lratio"),
        )
    )
    contrib = F.round(F.col("c") * F.col("lratio"), 6)
    per_doc = (
        feats(df)
        .join(F.broadcast(ratio), "b")
        .select("doc_id", F.col("c"), contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(
                F.aggregate(
                    F.sort_array(F.collect_list("contrib")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("log_weight"),
        )
    )
    return df.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
        "log_weight",
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    keys: list[str] | None = None,
    salts: int = 16,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep `k`
    rows per `keys` group with inclusion probability proportional to
    `weight_col` — the quality-weighted document sample of a training
    pipeline (sample 1M docs favoring high quality scores), reproducible
    across retries and cluster sizes.

    Algorithm A-ES (Efraimidis & Spirtes 2006, public method): each row
    draws u in (0, 1] and the k LARGEST u^(1/w) win. Here u is
    derandomized — u = (md5_top32(id) + 1) / 2^32, exact in a double —
    and the selection key is the monotone transform
    samp_key = -ln(u) / w (SMALLEST k win), rounded half-up at 1e-9
    (`floor(x*1e9+0.5)/1e9`, the same IEEE-bit-equal formula both Spark
    and DuckDB evaluate identically — the text_lm trick) with ties
    broken on id, so the survivor set is a pure function of the ids and
    weights: exact SQL oracle, byte-stable resume. Rows with
    weight <= 0 or a null weight are excluded (inclusion probability 0).

    Scale shape — the cap_per_key salted two-phase top-k: phase 1 ranks
    within (keys, salt) so a hub group's rows never sort in one task;
    phase 2 re-ranks the <= salts*k survivors per group. The k smallest
    keys of a group are a subset of the union of each shard's k
    smallest (tournament property). Output: (*keys, id, weight,
    samp_key, rank)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = keys or []
    idc = F.col(id_col).cast("string")
    h = F.conv(F.substring(F.md5(idc), 1, 8), 16, 10).cast("long")
    u = (h + F.lit(1).cast("long")) / F.lit(4294967296.0)
    raw = -F.log(u) / F.col(weight_col).cast("double")
    samp_key = F.floor(raw * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    pick = [F.col("samp_key"), F.col(id_col)]
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*pick)
    w2 = Window.partitionBy(*keys).orderBy(*pick) if keys else (
        Window.orderBy(*pick)
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("samp_key", samp_key)
        .withColumn("__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts)))
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            *keys,
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            "samp_key",
            "rank",
        )
    )


def cap_per_key(
    df: DataFrame,
    cap: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """Frequency cap: keep at most `cap` rows per `key_col`, selected
    deterministically by (md5(id), id) order — the per-domain cap of a
    web-corpus pipeline (no single host may contribute more than N
    documents), with a retry/cluster-size-independent survivor set.

    Scale shape — salted two-phase top-cap: a plain
    row_number() OVER (PARTITION BY key) puts a hub domain's 100M rows
    into ONE sorted partition. Phase 1 ranks within (key, salt) — each
    hub shard is 1/`salts` of the hub — and keeps `cap` per shard;
    phase 2 re-ranks the survivors (<= salts*cap per key, bounded by
    the KEY DOMAIN not the row count) and keeps the true global `cap`.
    Correct because the cap smallest (md5, id) pairs of a key are a
    subset of the union of each shard's cap smallest — the same
    tournament property as the KMV sketch merge. Both windows shuffle,
    but the second input is tiny; under-cap keys flow through both
    ranks unharmed. The survivor set is a pure function of the ids, so
    the oracle is one SQL QUALIFY."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    pick = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w1 = Window.partitionBy(key_col, "__salt").orderBy(*pick)
    w2 = Window.partitionBy(key_col).orderBy(*pick)
    return (
        df.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts))
        )
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= cap)
        .withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= cap)
        .drop("__salt", "__r1", "__r2")
    )


def epoch_order(
    df: DataFrame,
    epochs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global training order (the "shuffle each
    epoch" step of a training-data pipeline) WITHOUT a global sort:
    each epoch e orders the corpus by h = md5(e || ':' || id) — a fresh
    uniform permutation per epoch, reproducible on any cluster size and
    across retries (no RNG state, no partition dependence).

    Output: (epoch, doc_id, bucket, pos, global_pos) where
    bucket = the first byte of h (256 read buckets), pos = rank within
    the bucket, global_pos = the document's position in the epoch's
    total order. Readers stream buckets in index order; because the
    bucket is h's top byte, (bucket, pos) ascending IS h ascending, so
    global_pos = bucket offset + pos without ever totally sorting.

    Scale shape — the two-phase scan again (cf. shard_assignment): a
    window over ORDER BY h collapses into one task at 10^12 rows; here
    the wide op is a 256-bucket hash shuffle + per-bucket local sort,
    the per-(epoch, bucket) counts (<= 256 * epochs rows) come to the
    driver once, and offsets broadcast back. Failure-deterministic: the
    bucket is a pure function of (epoch, id)."""
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    spark = df.sparkSession
    e = F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch")
    base = df.select(F.col(id_col).cast("string").alias("id")).select(
        "id", e
    )
    h = F.md5(F.concat_ws(":", F.col("epoch"), F.col("id")))
    keyed = base.select(
        "epoch",
        "id",
        h.alias("h"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
    )
    counts = sorted(
        keyed.groupBy("epoch", "bucket").count().collect(),
        key=lambda r: (r["epoch"], r["bucket"]),
    )
    offsets, acc = [], {}
    for r in counts:
        ep = r["epoch"]
        offsets.append((ep, r["bucket"], acc.get(ep, 0)))
        acc[ep] = acc.get(ep, 0) + r["count"]
    off = spark.createDataFrame(
        offsets or [(0, 0, 0)], "epoch int, bucket int, offset long"
    )
    w = Window.partitionBy("epoch", "bucket").orderBy("h", "id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .join(F.broadcast(off), ["epoch", "bucket"])
        .select(
            "epoch",
            F.col("id").alias(id_col),
            "bucket",
            "pos",
            (F.col("offset") + F.col("pos")).alias("global_pos"),
        )
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "source",
    round_to: int = 6,
) -> DataFrame:
    """Corpus drift monitor: per-key distribution shift between two
    corpus snapshots — the check a training-data pipeline runs before
    blending a new crawl (did the domain mixture move? by how much,
    where?).

    For each key k: smoothed shares p = (n_old+0.5)/(N_old + 0.5*K),
    q = (n_new+0.5)/(N_new + 0.5*K) over the UNION key set (additive
    smoothing keeps vanished/appeared keys finite), the per-key KL
    contribution p*ln(p/q) and total-variation contribution |p-q|/2,
    both rounded to `round_to`. Emitting per-key terms (not one global
    sum) keeps every row order-independent AND tells the operator
    WHICH domains moved — the actionable output.

    Fully relational: one census groupBy per side, a full outer join
    on the key, and the three scalars (N_old, N_new, K) as unpartitioned
    window aggregates over the K-row joined census — no driver
    collects, no second scan of either corpus."""
    co = old.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_old")
    )
    cn = new.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_new")
    )
    j = (
        co.join(cn, "key", "full_outer")
        .withColumn("n_old", F.coalesce("n_old", F.lit(0)))
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
    )
    # NB: totals must NOT be named "N_old"/"N_new" — Spark column names
    # are case-insensitive by default, so withColumn("N_old") would
    # silently REPLACE the per-key "n_old"
    w = Window.partitionBy()
    j = (
        j.withColumn("tot_old", F.sum("n_old").over(w))
        .withColumn("tot_new", F.sum("n_new").over(w))
        .withColumn("n_keys", F.count("*").over(w))
    )
    p = (F.col("n_old") + F.lit(0.5)) / (
        F.col("tot_old") + F.lit(0.5) * F.col("n_keys")
    )
    q = (F.col("n_new") + F.lit(0.5)) / (
        F.col("tot_new") + F.lit(0.5) * F.col("n_keys")
    )
    return j.select(
        "key",
        "n_old",
        "n_new",
        F.round(p * F.log(p / q), round_to).alias("kl_term"),
        F.round(F.abs(p - q) / F.lit(2.0), round_to).alias("tv_term"),
    )


def budget_allocation(
    df: DataFrame,
    budget_frac_num: int,
    budget_frac_den: int,
    strata_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Water-filling token-budget allocation across strata: given a
    global budget B = floor(total * num/den), find the uniform cap C
    such that every stratum keeps min(tokens, C) — small strata keep
    everything, big strata are clipped to the SAME ceiling — the
    standard fair-allocation rule a mixture scheduler applies before
    downsampling dominant domains.

    Exact integer water-filling: strata sort ascending by token count;
    for the i-th stratum the candidate cap is
    (B - prefix_{i-1}) div (m - i + 1); the first stratum EXCEEDING its
    candidate fixes C (everything before it is uncapped by
    construction). If the budget covers the total, nothing is capped.

    Scale shape: one map-side-combinable groupBy of the corpus to
    per-stratum totals (stratum-bounded rows); the water-fill runs as
    windows over that dim-sized frame — the corpus is scanned once and
    never re-shuffled. All arithmetic is int64 (floor divisions), so
    any engine reproduces the allocation bit-for-bit. Returns
    (strata_col, tokens, alloc, capped)."""
    totals = df.groupBy(strata_col).agg(
        F.sum(tokens_col).cast("long").alias("tokens")
    )
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("tokens", strata_col)
    # true int64 arithmetic throughout (see `cand` note below)
    budget = F.expr(
        f"(total * {int(budget_frac_num)}) div {int(budget_frac_den)}"
    ).cast("long")
    ranked = totals.withColumn(
        "total", F.sum("tokens").over(w_all)
    ).select(
        strata_col,
        "tokens",
        budget.alias("budget"),
        F.row_number().over(w_ord).alias("i"),
        F.count("*").over(w_all).alias("m"),
        F.coalesce(
            F.sum("tokens").over(
                w_ord.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("prefix"),
    )
    # true int64 division (not floor-of-double): token totals at corpus
    # scale exceed 2^53, where double division would drop precision
    cand = F.expr("(budget - prefix) div (m - i + 1)").cast("long")
    marked = ranked.withColumn("cand", cand).withColumn(
        "over", (F.col("tokens") > F.col("cand")).cast("int")
    )
    # the cap is the candidate at the FIRST over-budget stratum; a
    # one-row dim aggregate, broadcast back (null when budget >= total)
    cap = marked.filter(F.col("over") == 1).agg(
        F.min_by("cand", "i").alias("cap")
    )
    return (
        marked.join(F.broadcast(cap))
        .select(
            strata_col,
            "tokens",
            F.when(
                F.col("cap").isNotNull()
                & (F.col("tokens") > F.col("cap")),
                F.col("cap"),
            )
            .otherwise(F.col("tokens"))
            .alias("alloc"),
            (
                F.col("cap").isNotNull()
                & (F.col("tokens") > F.col("cap"))
            ).alias("capped"),
        )
        .orderBy(strata_col)
    )
