"""Relational operators Spark lacks natively, built as compositions of
DataFrame primitives (driver brief: as-of / range joins as first-class
custom operators).

The as-of join here is the MERGE-SCAN formulation, not a range join:
tag both inputs, union them, and let one key-partitioned window carry
the latest right-side values forward onto left rows. That is a single
shuffle on the join key — the same cost as one groupBy — whereas the
naive formulation (left join right on key + ts range, then pick the max
ts per left row) is a skew-prone range join plus a second aggregation
shuffle. DuckDB's native ASOF JOIN provides the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: every `left` row gains the `right_cols`
    values of the most recent `right` row with the same `on` keys and
    `right_ts` <= `left_ts` (ties match), or NULLs when none exists —
    pandas.merge_asof / DuckDB ASOF LEFT JOIN semantics.

    `left_ts` / `right_ts` must be monotone-comparable numeric or
    timestamp columns; `tolerance` (same units as the ts columns)
    NULLs out matches older than `left_ts - tolerance`.

    Plan shape: ONE shuffle — both sides union into a single frame and
    a window partitioned by `on`, ordered by (ts, side), computes
    last(right value, ignorenulls) with rows-unbounded-preceding.
    Right rows sort BEFORE left rows at equal ts (side 0 < 1), which is
    what makes ties match. No join node exists in the plan, so there is
    no range-join explosion and key skew degrades into one big sorted
    partition that AQE can split, exactly like any window op."""
    matched = [f"__asof_{c}" for c in right_cols]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(m) for c, m in zip(right_cols, matched)],
    )
    l = left.select(
        "*", F.col(left_ts).alias("__ts"), F.lit(1).alias("__side")
    )
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[F.last(m, ignorenulls=True).over(w).alias(f"{m}__v") for m in matched],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__asof_ts"),
    ).filter(F.col("__side") == 1)
    if tolerance is not None:
        ok = F.col("__asof_ts") >= (F.col("__ts") - F.lit(tolerance))
        carried = carried.select(
            "*",
            *[F.when(ok, F.col(f"{m}__v")).alias(f"{m}__t") for m in matched],
            F.when(ok, F.col("__asof_ts")).alias("__asof_ts__t"),
        )
        val = lambda m: F.col(f"{m}__t")  # noqa: E731
        ats = F.col("__asof_ts__t")
    else:
        val = lambda m: F.col(f"{m}__v")  # noqa: E731
        ats = F.col("__asof_ts")
    return carried.select(
        *[F.col(c) for c in left.columns],
        *[val(m).alias(c) for c, m in zip(right_cols, matched)],
        ats.alias("asof_ts"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    point: str,
    lo: str,
    hi: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval range join: every `left` row pairs with every
    `right` row sharing the `on` keys whose [lo, hi] interval contains
    `left.point` (closed bounds). Column names must not collide across
    the two inputs apart from `on` (rename before calling).

    Plan shape — the reason this exists: Spark plans a raw inequality
    join as BroadcastNestedLoop (or a per-key cartesian), which is
    quadratic in the hub-key group size. Here both sides map to integer
    buckets of `bucket_width`: intervals explode to every bucket they
    overlap (replication factor = duration/width + 1 — pick the width
    near the median interval length), points map to exactly ONE bucket,
    and the join becomes an equi-join on (keys..., bucket) followed by
    the exact range filter. Each qualifying pair meets in exactly one
    bucket (the point's), so no dedup pass is needed, and the shuffle is
    an ordinary hash exchange AQE can size and skew-split."""
    # integer `div`, not floor(double /): exact at bucket boundaries
    wdiv = lambda c: F.expr(f"`{c}` div {int(bucket_width)}")  # noqa: E731
    r = right.withColumn(
        "__b", F.explode(F.sequence(wdiv(lo), wdiv(hi)))
    )
    l = left.withColumn("__b", wdiv(point))
    return (
        l.join(r, on + ["__b"])
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi)))
        .drop("__b")
    )


def hypertable_rollup(
    df: DataFrame,
    ts: str,
    keys: list[str],
    value: str,
    resolutions: list[int],
) -> DataFrame:
    """Hypertable-style multi-resolution rollup (the TimescaleDB
    continuous-aggregate shape): time-bucketed (count, sum, min, max)
    aggregates at each resolution, where every COARSER level folds the
    next finer level's partials instead of re-reading the raw table.
    `resolutions` must be ascending and each must divide the next.

    Returns one frame with a `resolution` column:
      (resolution, *keys, bucket_start, n, sum_v, min_v, max_v).

    Scale shape — why re-aggregating partials matters: at 10^12 rows the
    1-minute level is the only scan of the fact table; the 1-hour level
    aggregates 60× fewer rows (the minute partials) and the 1-day level
    24× fewer again — each a groupBy whose input is already
    (keys, bucket)-clustered from the previous level's shuffle, so
    Catalyst plans the reuse without a fresh exchange of the raw data.
    count/sum fold exactly (sum-of-sums); min/max fold as min-of-mins /
    max-of-maxes. Bucket arithmetic is integer `div` (exact, no double
    rounding)."""
    if sorted(resolutions) != list(resolutions):
        raise ValueError("resolutions must be ascending")
    for a, b in zip(resolutions, resolutions[1:]):
        if b % a:
            raise ValueError(f"{b} is not a multiple of {a}")

    def bucket(col: str, res: int):
        return F.expr(f"(`{col}` div {int(res)}) * {int(res)}")

    r0 = resolutions[0]
    level = (
        df.select(*keys, bucket(ts, r0).alias("bucket_start"),
                  F.col(value).alias("__v"))
        .groupBy(*keys, "bucket_start")
        .agg(
            F.count("*").alias("n"),
            F.sum("__v").alias("sum_v"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
        )
    )
    out = level.select(F.lit(r0).alias("resolution"), "*")
    for res in resolutions[1:]:
        level = (
            level.select(
                *keys, bucket("bucket_start", res).alias("bucket_start"),
                "n", "sum_v", "min_v", "max_v",
            )
            .groupBy(*keys, "bucket_start")
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        out = out.unionByName(level.select(F.lit(res).alias("resolution"), "*"))
    return out


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Left-semi join with a runtime Bloom-filter prune: rows of `left`
    whose `left_key` appears in `right.right_key`, computed as
    (1) build a Bloom bitmap over the right keys, (2) drop left rows
    that fail the bitmap test BEFORE the shuffle, (3) verify survivors
    with an ordinary left-semi equi-join, so false positives never
    reach the output — the result is EXACTLY the plain semi-join.

    This is the manual form of Spark's InjectRuntimeFilter (which the
    optimizer only applies under its own heuristics and never through a
    Python-composed plan boundary). Scale shape: the bitmap is built by
    one aggregation over the (small) build side — k bit positions per
    key, OR-combined per 64-bit word map-side, so at most
    num_bits/64 rows ever reach the driver (16 KiB of longs at the
    2^17 default) — and is embedded as a LITERAL array in the probe
    predicate: the membership test is pure Column arithmetic
    (xxhash64 -> pmod -> shiftleft -> bitwiseAND) evaluated inside the
    scan's WholeStageCodegen, pushing the prune to the leaf. With an
    fpp-sized bitmap the verifying join shuffles only true matches plus
    ~fpp of `left`, instead of all of `left` — on a 100 TB probe side
    that is the difference between shuffling the table and shuffling
    the answer. No UDF, no driver loop over rows."""
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    nwords = num_bits // 64

    def positions(col):  # k independent positions via seeded xxhash64
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]

    bits = right.select(
        F.explode(F.array(*positions(F.col(right_key)))).alias("__pos")
    )
    words = (
        bits.select(
            F.shiftright(F.col("__pos"), 6).alias("__w"),
            # SQL-expr form: F.shiftleft only takes a literal shift count
            F.expr("shiftleft(1L, cast(pmod(__pos, 64) as int))").alias(
                "__bit"
            ),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__bit)").alias("__word"))
        .collect()
    )
    dense = [0] * nwords
    for r in words:
        dense[int(r["__w"])] = int(r["__word"])
    lit_words = F.lit(dense)

    tmp = left
    pos_cols: list[str] = []
    test = None
    for i, pos in enumerate(positions(F.col(left_key))):
        pc = f"__bloom_pos_{i}"
        pos_cols.append(pc)
        tmp = tmp.withColumn(pc, pos)
        word = F.element_at(
            lit_words, F.shiftright(F.col(pc), 6).cast("int") + 1
        )
        bit = F.expr(f"shiftleft(1L, cast(pmod({pc}, 64) as int))")
        hit = word.bitwiseAND(bit) != 0
        test = hit if test is None else (test & hit)

    survivors = tmp.filter(test).drop(*pos_cols)
    return survivors.join(
        right.select(F.col(right_key).alias(left_key)).distinct(),
        on=left_key,
        how="left_semi",
    )


def scd2_versions(
    df: DataFrame,
    keys: list[str],
    ts: str,
    attrs: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Collapse a changelog into SCD Type-2 effective-dated versions:
    per `keys` entity, order rows by (`ts`, `tie_break`), keep only
    rows where any of `attrs` differs (null-safely) from the previous
    row, and date each kept version [valid_from, valid_to) with
    valid_to = the next version's valid_from (NULL on the current
    version). Returns (*keys, *attrs, valid_from, valid_to,
    is_current, version) with version numbering from 1.

    This is the standard warehouse CDC-to-dimension collapse (Kimball
    SCD2) as ONE window pipeline: a single shuffle on `keys` serves
    both the change detection (lag) and the effective-dating (lead),
    because the second window reuses the first's (keys, ts) clustering
    — Catalyst plans one Exchange and two Window nodes over it. Key
    skew degrades into a large sorted partition exactly like any
    window op; there is no self-join and no second shuffle."""
    order = [F.col(ts)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = None
    cur = df
    for a in attrs:
        prev = F.lag(a).over(w)
        ne = ~F.col(a).eqNullSafe(prev)
        changed = ne if changed is None else (changed | ne)
    first = F.row_number().over(w) == 1
    cur = cur.withColumn("__keep", first | changed)
    kept = cur.filter("__keep")
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return kept.select(
        *keys,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).alias("version"),
    )


def incremental_agg(
    state: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    value: str,
) -> DataFrame:
    """Incremental (append-only) aggregate-state maintenance: fold a
    new batch of raw rows into a running per-`keys` aggregate state
    (n, sum_v, min_v, max_v) WITHOUT re-scanning history — the
    materialized-view-maintenance shape. `state` is a previous return
    value of this function (or None to bootstrap); `delta` is raw rows.
    avg is derivable (sum_v / n) and deliberately not stored: only
    MERGEABLE partials live in the state.

    Scale shape: at 10^12 accumulated rows the running state is the
    only thing ever re-read — one frame bounded by the key domain. The
    delta aggregates map-side into per-key partials (one shuffle of the
    BATCH, not the history), then a union + second groupBy folds state
    and delta partials; Catalyst executes it as one hash-agg over
    (state ∪ delta-partials), both sides already key-shaped. count/sum
    fold as sums, min/max as min-of-mins / max-of-maxes — exact for
    append-only streams (deletions would need retractable sketches,
    out of scope and documented here). Persist the returned frame with
    the bucketed sink to make the next fold's scan key-clustered."""
    parts = delta.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(value).alias("sum_v"),
        F.min(value).alias("min_v"),
        F.max(value).alias("max_v"),
    )
    if state is None:
        return parts
    return (
        state.select(*keys, "n", "sum_v", "min_v", "max_v")
        .unionByName(parts)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval UNION per key — merge overlapping/adjacent [start, end)
    intervals into maximal islands and report per-key coverage: the
    gaps-and-islands operator (sensor uptime, session coverage, genomic
    interval union) that Spark has no native node for.

    Semantics: intervals with start <= running max end of all earlier
    intervals (ordered by start, then end) extend the current island;
    adjacency counts as overlap ([1,5) + [5,9) is ONE island — half-open
    intervals that touch cover a contiguous range). Zero-length and
    inverted intervals (end <= start) are dropped before merging.
    Output per key: (*key_cols, n_intervals, n_islands, covered) where
    covered = sum of merged island lengths — double-counting overlaps
    exactly once.

    Scale shape: ONE shuffle on the keys; the island detection is two
    windows over that same partitioning (running max-end lag, then a
    running sum over the new-island flags) and the final rollup is a
    groupBy on the identical key, so Catalyst reuses the exchange.
    Island numbering is inherently a sequential scan per key — a hub
    key serializes in one task, the honest cost of ordered semantics
    (mitigate upstream by time-bucketing the key if one entity owns
    billions of intervals). Everything is integer arithmetic: exact
    SQL oracle."""
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    iv = df.select(
        *key_cols, s.alias("__s"), e.alias("__e")
    ).filter(F.col("__e") > F.col("__s"))
    wo = Window.partitionBy(*key_cols).orderBy("__s", "__e")
    prev_max_e = F.max("__e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "__new",
        F.when(
            prev_max_e.isNull() | (F.col("__s") > prev_max_e), 1
        ).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(*key_cols, "__island").agg(
        F.min("__s").alias("__is"),
        F.max("__e").alias("__ie"),
        F.count("*").alias("__n"),
    )
    return islands.groupBy(*key_cols).agg(
        F.sum("__n").alias("n_intervals"),
        F.count("*").alias("n_islands"),
        F.sum(F.col("__ie") - F.col("__is")).alias("covered"),
    )


def zorder_key(x: F.Column, y: F.Column, bits: int = 10) -> F.Column:
    """Morton (Z-order) key: interleave the low `bits` bits of two
    non-negative integer dimensions — bit i of x lands at position 2i,
    bit i of y at 2i+1. Pure Column arithmetic (mask/shift/or), so it
    evaluates inside WholeStageCodegen; the same formula is plain SQL,
    so the key itself is oracle-checkable bit-for-bit."""
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """The ANSI-SQL rendering of zorder_key over the same expressions —
    disjoint bit positions, so the interleave is a plain sum."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) & {mask}) >> {i} & 1) * {1 << (2 * i)}")
        terms.append(
            f"((({y_expr}) & {mask}) >> {i} & 1) * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    partitions: int | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Cluster a table for TWO-dimensional scan pruning: compute the
    Morton key of (x_col, y_col), range-partition on it, and sort each
    partition by it — the Delta/Iceberg OPTIMIZE ZORDER layout, which
    vanilla Spark writes lack. Returns the clustered frame with a `z`
    column; write it with partitionBy-free parquet and every file's
    min/max footer stats are tight on BOTH dimensions, so a predicate
    on EITHER column prunes row groups (a lexicographic sort only
    prunes its leading column).

    `normalize=True` (default) first rescales each dimension into the
    full [0, 2^bits) range from its min/max (one aggregate, scalar
    driver traffic — the same role as Delta's per-column range ids):
    without it, a dimension whose domain is narrower than 2^bits
    contributes dead high bits and the interleave degenerates into a
    sort on the wider dimension alone.

    Scale shape: one range shuffle (sampled boundaries) + local sort —
    exactly the cost of any sorted write; the z computation is
    codegen'd column math. At 100 TB this is the difference between
    scanning the corpus and scanning the files a (user, time-range)
    query actually touches."""
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    if normalize:
        top = (1 << bits) - 1
        mnx, mxx, mny, mxy = df.agg(
            F.min(x), F.max(x), F.min(y), F.max(y)
        ).first()

        def scale(c, mn, mx):
            if mn is None or mx is None or mx == mn:
                return F.lit(0).cast("long")
            return ((c - F.lit(mn)) * F.lit(top) / F.lit(mx - mn)).cast(
                "long"
            )

        x, y = scale(x, mnx, mxx), scale(y, mny, mxy)
    out = df.withColumn("z", zorder_key(x, y, bits))
    n = partitions or out.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "z").sortWithinPartitions("z")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    salt_col: str = "__salt",
) -> DataFrame:
    """Skew-defusing salted equi-join (the north rule's "salted
    repartitioning to defuse hub-pathway skew", as a first-class op).

    A shuffle join hashes rows to partitions by join key, so one hot key
    (a hub pathway, a dominant event_type) lands its entire row
    population on ONE reducer. Salting spreads it: every `big` row gets
    a salt in [0, salt) — a deterministic hash of the full row, so
    retries re-derive the same salt — and `small` is replicated once per
    salt value; joining on (key, salt) fans each hot key over `salt`
    partitions at the cost of a `salt`x expansion of the SMALL side
    only.

    When to reach for it: the small side is too big to broadcast (else
    broadcast and no shuffle happens at all) and the big side's key
    histogram is spiky beyond what AQE's skew-join splitting handles
    (AQE splits oversized partitions post-shuffle, but a single
    map-side-hot key still funnels through one fetch stream; salting
    moves the fix before the exchange). Output is identical to the
    plain join — the salt never escapes.

    Supports how in {"inner", "left"}: every (key, salt) replica exists
    on the small side, so left-unmatched rows surface exactly once.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: unsupported how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt_expr = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)
    ).cast("int")
    b = big.withColumn(salt_col, salt_expr)
    s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, keys + [salt_col], how).drop(salt_col)


def ordered_funnel(
    events: DataFrame,
    user: str,
    ts: str,
    step: str,
    steps: list[str],
) -> DataFrame:
    """Strictly-ordered conversion funnel (signup -> click -> purchase)
    in ONE shuffle.

    Semantics: a step[i] event QUALIFIES iff some qualified step[i-1]
    event for the same user has a strictly smaller `ts` (i>0; every
    step[0] event qualifies). Stage i's user count is the number of
    users with at least one qualified step[i] event. Out-of-order
    events (a click before any signup) never count, matching product
    funnel semantics.

    Plan shape (why this scales): qualified times chain through stacked
    window mins over the SAME window spec — partitionBy(user),
    orderBy(ts), RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    (strictly earlier by VALUE, so ts ties never self-qualify) — and
    Catalyst plans one Exchange + one Sort, evaluating all k window
    functions in a single streaming pass with O(1) state per user. The
    per-user groupBy that follows sees a child already hash-partitioned
    on `user`, so EnsureRequirements inserts NO second exchange. The
    naive alternative (k-1 self-joins, one per stage) pays k-1 shuffles
    and re-materializes the event table per stage.

    `ts` must be a numeric column (e.g. unix micros) — RANGE frames
    need value arithmetic.

    Returns one row per stage: (stage int, step string, users bigint,
    conv double) where conv = users / previous stage users (round 6;
    1.0 for stage 0, and 0.0 when the previous stage is empty — conv is
    kept total so downstream float compares never meet NULL/NaN).
    """
    if not steps:
        raise ValueError("ordered_funnel: steps must be non-empty")
    w = (
        Window.partitionBy(user)
        .orderBy(ts)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    q = events.select(user, ts, step).withColumn(
        "q0", F.when(F.col(step) == steps[0], F.col(ts))
    )
    for i, s in enumerate(steps[1:], start=1):
        prev_before = F.min(F.col(f"q{i - 1}")).over(w)
        q = q.withColumn(
            f"q{i}",
            F.when(
                (F.col(step) == s) & prev_before.isNotNull(), F.col(ts)
            ),
        )
    per_user = q.groupBy(user).agg(
        *[F.min(f"q{i}").alias(f"t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[F.count(f"t{i}").alias(f"c{i}") for i in range(len(steps))]
    )
    cells = []
    for i, s in enumerate(steps):
        conv = (
            "CAST(1.0 AS DOUBLE)"
            if i == 0
            else (
                f"coalesce(round(CAST(c{i} AS DOUBLE) "
                f"/ nullif(c{i - 1}, 0), 6), CAST(0.0 AS DOUBLE))"
            )
        )
        cells.append(f"{i}, '{s}', c{i}, {conv}")
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {', '.join(cells)}) "
            "as (stage, step, users, conv)"
        )
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column profile — the lakehouse statistics pass that
    feeds NDV-based join planning and data-quality dashboards:
    per column, (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)
    with min/max rendered as strings so heterogeneous columns share one
    schema.

    Scale shape: ONE full scan computes every column's aggregates in a
    single Aggregate node (count/count-distinct/min/max are all
    map-side partial), then a `stack` pivots the single result row into
    one row per column — the profile never re-scans per column, which
    is the difference between O(cols) passes and one at 100 TB. Exact
    NDV; swap count_distinct for hll_distinct (sketches.py) when the
    approximate answer is acceptable."""
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn{i}"),
            F.count_distinct(F.col(c)).alias(f"__nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx{i}"),
        ]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', __n, __nn{i}, __nd{i}, __mn{i}, __mx{i}"
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
    )


def cohort_retention(
    events: DataFrame, ts: str = "ts", user: str = "user_id"
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-active day
    (the cohort), counted on each later day they return — the product-
    analytics complement of ordered_funnel (which orders steps WITHIN a
    user; this tracks users ACROSS days).

    Returns (cohort_day:string yyyy-MM-dd, day_offset:int, n_users);
    day_offset 0 row is the cohort's size.

    Scale shape: the raw event stream first collapses to distinct
    (user, day) pairs — one map-side-combinable shuffle that removes the
    per-user event fan (a user with 1e6 events contributes <= days
    rows). The min-day cohort agg and the back-join are both keyed on
    user (no new shuffle after the distinct re-keys), and the final agg
    is on the bounded (cohort_day, offset) grid. count(*) not
    count_distinct in the final agg: (user, day) pairs are already
    unique, so the expensive distinct aggregation buffer is avoided."""
    days = (
        events.select(
            F.col(user).alias("u"), F.to_date(F.col(ts)).alias("day")
        )
        .distinct()
    )
    first = days.groupBy("u").agg(F.min("day").alias("cohort"))
    return (
        days.join(first, "u")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
