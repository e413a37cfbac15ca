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


def exact_quantiles(
    df: DataFrame,
    col: str,
    pcts: list[int],
    keys: list[str] | None = None,
) -> DataFrame:
    """EXACT per-`keys` percentiles of an integer-valued `col` without
    globally sorting the rows: for each integer percent p in `pcts`
    returns the value at 1-indexed rank ceil(n * p / 100) (floored at
    rank 1, so p=0 is the min and p=100 the max) — the discrete
    lower-quantile definition, all-integer so it is bit-reproducible
    in any engine.

    Output: (*keys, pct, value, n).

    Scale shape — rank-select by value-domain compression: a total sort
    of 10^12 rows is a full-table range-shuffle, but percentiles only
    need the CUMULATIVE HISTOGRAM, so the one wide pass is a
    (keys, value)->count groupBy (map-side combinable, output bounded
    by the distinct-value domain, not the row count). The cumulative
    window and the per-pct rank probe then run over that compressed
    frame. The pct list explodes AFTER compression, so the raw table is
    scanned once regardless of len(pcts). Spark's own percentile_approx
    trades exactness for a bounded sketch; this trades a value-domain
    bound (lengths, scores, timestamps-at-fixed-granularity all
    qualify) for exactness — and its oracle is plain SQL."""
    keys = keys or []
    for p in pcts:
        if not (isinstance(p, int) and 0 <= p <= 100):
            raise ValueError(f"pcts must be integers in [0, 100]: {p!r}")
    hist = (
        df.select(*keys, F.col(col).cast("long").alias("__v"))
        .groupBy(*keys, "__v")
        .agg(F.count("*").alias("__c"))
    )
    from pyspark.sql import Window

    wk = Window.partitionBy(*keys) if keys else Window.partitionBy()
    w = wk.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        *keys,
        "__v",
        "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wk.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("n"),
    )
    p = F.explode(F.lit([int(x) for x in pcts])).alias("pct")
    probed = cum.select(*keys, "__v", "__c", "__cum", "n", p)
    rank = F.greatest(
        F.lit(1).cast("long"), F.expr("(n * pct + 99) div 100")
    )
    return probed.filter(
        (F.col("__cum") >= rank) & (F.col("__cum") - F.col("__c") < rank)
    ).select(*keys, "pct", F.col("__v").alias("value"), "n")


def kmv_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    k: int = 64,
) -> DataFrame:
    """KMV/theta-sketch SET ALGEBRA: distinct-count estimates for A, B,
    A ∪ B and A ∩ B from two bounded k-minimum-values sketches — the
    mergeable-sketch operation that makes pre-aggregated sketch tables
    useful (cross-corpus overlap, day-over-day retention) without ever
    co-shuffling the raw sets.

    Deterministic spec (all-integer, replayable in SQL):
      h(v)        = md5-top-32(v), uniform in [0, 2^32)
      S_side      = k smallest DISTINCT h per side (full set if < k)
      theta_side  = max(S_side) when |S_side| == k else 2^32
      theta       = min(theta_a, theta_b)
      R           = {h in S_a ∪ S_b : h < theta}   (strict, the
                    DataSketches convention: the boundary hash is an
                    order statistic, not a sample)
      m, c        = |R|, |{h in R : h in S_a AND h in S_b}|
      unsaturated (theta == 2^32): est_union = m, est_intersect = c
      saturated: est_union = m * 2^32 div theta,
                 est_intersect = c * 2^32 div theta
      (each distinct value survives into [0, theta) with probability
      theta / 2^32 — the inverse-probability estimator of Bar-Yossef et
      al. 2002 / the Apache DataSketches theta union, in integer math)
    Per-side est_a/est_b use the standard KMV formula
    ((k-1) << 32 div kth when saturated else exact).

    Scale shape: each side runs the same bounded mapInPandas partial as
    kmv_distinct (≤ partitions × k rows leave any scan); everything
    after operates on ≤ 2k total rows, so the set algebra costs nothing
    no matter how large A and B are — and because sketches are
    mergeable, a 100 TB deployment stores per-partition/per-day sketch
    rows and answers overlap queries from those alone."""
    tagged = df_a.select(
        F.lit("a").alias("__side"), F.col(col).alias("__val")
    ).unionByName(
        df_b.select(F.lit("b").alias("__side"), F.col(col).alias("__val"))
    )
    hashed = tagged.select(
        "__side",
        F.conv(F.substring(F.md5(F.col("__val")), 1, 8), 16, 10)
        .cast("long")
        .alias("__h"),
    )
    out_schema = "`__side` string, `__h` bigint"
    kk = int(k)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, list] = {}
        for pdf in batches:
            for side, grp in pdf.groupby("__side", sort=False):
                merged = state.get(side)
                new = grp["__h"].unique()
                if merged is None:
                    merged = sorted(set(new.tolist()))
                else:
                    merged = sorted(set(merged).union(new.tolist()))
                state[side] = merged[:kk]
        if not state:
            return
        rows = [(s, h) for s, hs in state.items() for h in hs]
        yield pd.DataFrame(rows, columns=["__side", "__h"])

    parts = hashed.mapInPandas(partial, schema=out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("__side").orderBy("__h")
    kept = (
        parts.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk)
        .select("__side", "__h")
    )
    # ≤ 2k rows from here on — every downstream op is sketch-bounded.
    # Per-side stats are ZERO-KEY aggregates after the side filter (not
    # a groupBy("__side") later refiltered): same one-row-per-side
    # result — including the empty-side case, where n = 0 is filtered
    # out and the cross join stays empty — but the 1-row bound is now
    # structural in the physical plan, so tools/plan_audit.py can prove
    # the downstream nested-loop joins are scalar broadcasts.
    full = F.lit(1 << 32).cast("long")

    def side_stats(side: str, suffix: str) -> DataFrame:
        s = (
            kept.filter(F.col("__side") == side)
            .agg(F.count("*").alias("n"), F.max("__h").alias("kth"))
            .filter(F.col("n") > 0)
        )
        return s.select(
            F.col("n").alias(f"n_{suffix}"),
            F.when(F.col("n") < kk, F.col("n"))
            .otherwise(
                F.expr(f"({kk - 1} * 4294967296L) div greatest(kth, 1L)")
            )
            .alias(f"est_{suffix}"),
            F.when(F.col("n") < kk, full)
            .otherwise(F.col("kth"))
            .alias(f"theta_{suffix}"),
        )

    a = side_stats("a", "a")
    b = side_stats("b", "b")
    thetas = a.crossJoin(b).withColumn(
        "theta", F.least("theta_a", "theta_b")
    )
    membership = kept.groupBy("__h").agg(
        F.max(F.when(F.col("__side") == "a", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("__side") == "b", 1).otherwise(0)).alias("in_b"),
    )
    retained = membership.crossJoin(F.broadcast(thetas)).filter(
        F.col("__h") < F.col("theta")
    )
    agg = retained.groupBy(
        "n_a", "n_b", "est_a", "est_b", "theta"
    ).agg(
        F.count("*").alias("retained"),
        F.sum(F.expr("CAST(in_a = 1 AND in_b = 1 AS INT)")).alias("common"),
    )
    unsat = F.col("theta") == full
    return agg.select(
        "n_a",
        "n_b",
        "est_a",
        "est_b",
        "theta",
        "retained",
        F.when(unsat, F.col("retained"))
        .otherwise(F.expr("(retained * 4294967296L) div theta"))
        .alias("est_union"),
        F.when(unsat, F.col("common"))
        .otherwise(F.expr("(common * 4294967296L) div theta"))
        .alias("est_intersect"),
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-min-sketch heavy hitters: top-`k` values of `col` by CMS
    ESTIMATE (Cormode & Muthukrishnan 2005) — the bounded-memory way to
    find hub keys before they wreck a shuffle. Returns
    (value, est, true_n) ranked by (est DESC, value): est is the CMS
    estimate (min over `depth` bucket rows of the bucket's total
    count), true_n the exact count for calibration; est >= true_n
    always, with overestimate bounded by the collisions in the
    value's least-loaded bucket.

    Determinism: bucket_i(v) = md5(i || v) mod width — the same
    engine-portable hash family as every oracle in this repo — so the
    sketch (not just the answer) is bit-reproducible in SQL.

    Scale shape: the sketch table is depth groupBys folded into ONE
    groupBy over (row, bucket) pairs exploded from each value —
    depth*width cells TOTAL regardless of row count, map-side
    combinable. The candidate set (distinct values joined against the
    broadcast-size cell table) keeps this exact-verifiable at test
    scale; a 100 TB deployment would feed candidates from a sample or
    the stream, never the full distinct domain — the sketch itself
    never grows."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    v = F.col(col).cast("string")

    def bucket(i: int) -> F.Column:
        h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), v)), 1, 8),
                   16, 10)
        return F.pmod(h.cast("long"), F.lit(width))

    pairs = df.select(
        v.alias("__v"),
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("r"), bucket(i).alias("b"))
                for i in range(depth)
            ])
        ).alias("rb"),
    ).select("__v", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    cells = pairs.groupBy("r", "b").agg(F.count("*").alias("c"))

    cand = df.groupBy(v.alias("value")).agg(F.count("*").alias("true_n"))
    probes = cand.select(
        "value", "true_n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("r"),
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{i}|"),
                                               F.col("value"))),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("long"),
                        F.lit(width),
                    ).alias("b"),
                )
            for i in range(depth)])
        ).alias("rb"),
    ).select("value", "true_n", F.col("rb.r").alias("r"),
             F.col("rb.b").alias("b"))
    est = (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("value", "true_n")
        .agg(F.min("c").alias("est"))
    )
    from pyspark.sql import Window

    # TakeOrderedAndProject (per-partition top-k, merged at the driver),
    # NOT a global rank window — a window with no partition key would
    # sort the whole candidate domain in one task; the rank window below
    # only ever sees the k survivors
    top = est.orderBy(F.desc("est"), F.col("value")).limit(k)
    w = Window.orderBy(F.desc("est"), F.col("value"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "value", "est", "true_n", "rank"
    )


def kmv_sample_quantiles(
    df: DataFrame,
    val_col: str,
    id_col: str,
    k: int = 256,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Bounded-memory quantile estimation from a KMV uniform sample: keep
    the k rows with the SMALLEST md5(id) — a deterministic, uniformly
    distributed sample (md5 is a uniform map of the id space) — then read
    each requested quantile off the sample by rank.

    Why this shape and not t-digest/GK: the sample is a pure function of
    the id set, so the sketch is (a) MERGEABLE — the k smallest hashes of
    a union are a subset of the union of each side's k smallest, so
    re-taking the k smallest of two merged sketches reproduces the
    whole-data sketch exactly (unit-tested), and (b) bit-reproducible in
    SQL, unlike any implementation-defined digest layout.

    Scale shape: orderBy(h).limit(k) compiles to TakeOrdered — a
    per-partition top-k heap + driver-side merge of p*k candidate rows,
    never a global sort; the rank windows then run over k rows only.
    Estimate error is the standard sampling bound O(1/sqrt(k)).

    Returns one row per q: (q, est, n_sample).
    """
    if k <= 0:
        raise ValueError("kmv_sample_quantiles: k must be positive")
    s = (
        df.select(
            F.col(val_col).cast("double").alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy("v", "h")
    r = s.select(
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.partitionBy(F.lit(1))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    qdf = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    return (
        qdf.join(
            r,
            F.col("rn")
            == F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n"))),
        )
        .select("q", F.col("v").alias("est"),
                F.col("n").cast("long").alias("n_sample"))
    )


# HyperLogLog constants: alpha_m for m >= 128 (Flajolet et al. 2007,
# public method). The numerator alpha * m^2 * 2^33 is precomputed in
# Python and embedded as ONE double literal in both the Spark plan and
# the SQL oracle, so the estimate is a single IEEE division of exact
# integers by a shared constant — bit-identical cross-engine.
HLL_P = 12
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << 33)


def hll_distinct(
    df: DataFrame,
    col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-`keys` HyperLogLog distinct-count sketch with DETERMINISTIC,
    engine-portable registers (Flajolet-Fuchs-Gandouet-Meunier 2007,
    public method): hash every value with md5, use the first 12 bits as
    the register index (m = 4096 registers) and
    rho = 1 + leading-zeros of the next 32 bits as the register value;
    each register keeps max(rho).

    The classic objection to oracle-checking HLL — register layout is
    implementation-defined (see kmv_distinct's module doc on Spark's
    approx_count_distinct) — does not apply here because the registers
    are DERIVED IN THE QUERY PLAN from md5 bit-slices: DuckDB replays
    the identical slicing. leading-zeros is computed as
    33 - length(bin(w)) — bin() renders without leading zeros in both
    engines, so the whole register table is integer-exact.

    Estimator (all exactly representable values):
      S = sum over registers of 2^(33 - rho_j), absent registers
          contributing 2^33 — an exact int64 (<= m * 2^33 = 2^45);
      raw = HLL_NUM / S (one IEEE division);
      linear counting m * ln(m / zeros) when raw <= 2.5m and zeros > 0,
      rounded by the floor(x*1e6+0.5)/1e6 trick both engines evaluate
      identically (the text_lm / weighted_sample technique).

    Output: (*keys, n_regs, zeros, s_scaled, hll_est).

    Scale shape — why HLL at 100 TB: per-key state is bounded by m
    REGARDLESS of cardinality (KMV keeps k hashes; HLL keeps m 6-bit
    maxima), the partial aggregate is map-side combinable
    (groupBy(keys, reg).max(rho): at most m rows per key leave each
    partition), and sketches merge by register-wise max — the union of
    two corpora is one more groupBy, never a re-scan. Standard error is
    1.04/sqrt(m) ~ 1.6% at m = 4096."""
    keys = keys or []
    return hll_estimate(hll_partials(df, col, keys), keys)


def hll_partials(
    df: DataFrame, col: str, keys: list[str] | None = None
) -> DataFrame:
    """The mergeable HLL register table (*keys, __reg, __mj) — at most
    m rows per key regardless of cardinality. Two partials merge by
    register-wise max (one more groupBy), which is what the streaming
    fold relies on."""
    keys = keys or []
    h = F.md5(F.col(col).cast("string"))
    reg = F.conv(F.substring(h, 1, HLL_P // 4), 16, 10).cast("int")
    w = F.conv(F.substring(h, HLL_P // 4 + 1, 8), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(w))
    ).cast("int")
    return (
        df.select(*keys, reg.alias("__reg"), rho.alias("__rho"))
        .groupBy(*keys, "__reg")
        .agg(F.max("__rho").alias("__mj"))
    )


def hll_estimate(
    regs: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """The FFGM estimator over a register table (hll_partials output or
    any register-wise-max merge of several): identical arithmetic to
    hll_distinct's documented contract — exact int64 S, one IEEE
    division, linear-counting fallback, floor-rounding."""
    keys = keys or []
    per_key = regs.groupBy(*keys).agg(
        F.count("*").alias("n_regs"),
        F.sum(F.expr("shiftleft(1L, 33 - __mj)")).alias("s_present"),
    )
    zeros = (F.lit(HLL_M) - F.col("n_regs")).cast("long")
    s_scaled = (
        F.col("s_present") + zeros * F.lit(1 << 33).cast("long")
    ).alias("s_scaled")
    raw = F.lit(HLL_NUM) / F.col("s_scaled")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("zeros"))
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("zeros") > 0), lc
    ).otherwise(raw)
    est6 = F.floor(est * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        per_key.select(*keys, "n_regs", zeros.alias("zeros"), s_scaled)
        .withColumn("hll_est", est6)
    )


def winsorize(
    df: DataFrame,
    col: str,
    keys: list[str],
    lo_pct: int = 1,
    hi_pct: int = 99,
    scale: int = 100,
) -> DataFrame:
    """Per-key winsorization (robust clipping): clamp `col` to its
    exact per-key [lo_pct, hi_pct] percentile band — the outlier
    treatment metric pipelines apply before averaging anything (one
    fat-finger value otherwise owns the mean).

    Values are fixed-pointed by `scale` (default cents) so the
    percentile probe and every comparison are integer-exact. Bounds
    come from exact_quantiles (value-domain compression — no global
    sort); they are key-bounded (two rows per key), so the join back
    onto the fact broadcasts. Returns the input rows plus
    (__vi, __lo, __hi, __clipped): the raw fixed-point value, both
    bounds, and the clamped value — callers aggregate what they need."""
    vi = F.floor(F.col(col) * scale + F.lit(0.5)).cast("long")
    base = df.withColumn("__vi", vi)
    q = exact_quantiles(base, "__vi", [lo_pct, hi_pct], keys=keys)
    bounds = q.groupBy(*keys).agg(
        F.min(F.when(F.col("pct") == lo_pct, F.col("value"))).alias(
            "__lo"
        ),
        F.min(F.when(F.col("pct") == hi_pct, F.col("value"))).alias(
            "__hi"
        ),
    )
    return base.join(F.broadcast(bounds), keys).withColumn(
        "__clipped",
        F.least(F.greatest(F.col("__vi"), F.col("__lo")), F.col("__hi")),
    )
