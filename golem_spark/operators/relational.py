"""Relational operators composed from DataFrame primitives: the common
OLAP patterns a training-data pipeline leans on that have no single
built-in operator.

- top-k per group: window row_number, executes as a partial top-k
  within partitions (no global sort);
- sessionization: lag + cumulative gap-count window — one shuffle on
  the session key;
- as-of join: for each left row, the latest right row at-or-before its
  timestamp per key. Spark has no native as-of join; this is the
  union-merge formulation (one shuffle on the key, one window) which
  beats per-group applyInPandas merge_asof at scale because it never
  leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def topk_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                   k: int, ascending: bool = False,
                   tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Deterministic top-k rows per group (ties broken by tiebreak_cols)."""
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap: float = 1800) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap`` (in the units of ``ts_col``). Adds ``session_id``
    (0-based per key)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_val = F.col(ts_col).cast("double") - prev.cast("double")
    new_sess = F.when(prev.isNull() | (gap_val > gap), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)


def asof_join(left: DataFrame, right: DataFrame, key: str, left_ts: str,
              right_ts: str, right_cols: list[str],
              suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``key`` (NULLs when none).

    Implementation: tag both sides, union, window-sort by (key, ts,
    side), carry the last right value forward with last_value(ignore
    nulls), keep left rows. One shuffle on the key — no Python, no
    cross product.

    Timestamps are ordered in the LEFT column's native type (the right
    side is cast to it) — a double cast would lose integer precision
    above 2^53, mis-ordering epoch-nanos events closer than ~256 ns.
    """
    ts_type = dict(left.dtypes)[left_ts]
    lt = left.withColumn("__ts", F.col(left_ts)) \
             .withColumn("__side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    rt = right.select(
        F.col(key),
        F.col(right_ts).cast(ts_type).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols])
    left_cols = [c for c in lt.columns if not c.startswith("__")]
    rt_full = rt
    for c in left_cols:
        if c not in rt.columns:
            rt_full = rt_full.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    both = lt.select(*left_cols, "__ts", "__side",
                     *[f"__r_{c}" for c in right_cols]) \
        .unionByName(rt_full.select(*left_cols, "__ts", "__side",
                                    *[f"__r_{c}" for c in right_cols]))
    # right rows sort before left rows at the same timestamp -> "<=" semantics
    w = (Window.partitionBy(key).orderBy(F.col("__ts"), F.col("__side"))
         .rowsBetween(Window.unboundedPreceding, 0))
    out = both
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}",
                             F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w))
    return (out.filter(F.col("__side") == 1)
            .drop("__ts", "__side", *[f"__r_{c}" for c in right_cols]))


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    md5int(key || seed) / 2^60 < fraction. Reproducible across runs,
    engines, and partitionings (unlike df.sample, whose outcome depends
    on partition layout), so training subsets are stable under
    repartition/rerun — the property a 100 TB pipeline needs for
    resumable jobs. Pure column expression: the filter runs inside the
    scan's whole-stage-codegen stage (no shuffle, no UDF) — the md5
    itself cannot become a parquet PushedFilter, so every row is read
    once and dropped immediately, which is the floor for content-hash
    sampling."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    h = F.conv(F.substring(F.md5(F.concat_ws("_", F.col(key_col).cast("string"),
                                             F.lit(str(seed)))), 1, 15),
               16, 10).cast("long")
    return df.filter(h < F.lit(int(fraction * (1 << 60))))


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str,
                           fractions: dict, seed: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language-balanced
    subsetting): ``fractions`` maps stratum value -> keep fraction;
    unlisted strata are dropped. Same md5 keep-rule as hash_sample, so
    the union of strata equals running hash_sample per stratum."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    h = F.conv(F.substring(F.md5(F.concat_ws("_", F.col(key_col).cast("string"),
                                             F.lit(str(seed)))), 1, 15),
               16, 10).cast("long")
    thresh = None
    for val, frac in sorted(fractions.items()):
        if not 0.0 <= float(frac) <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
        cond = F.col(stratum_col) == val
        lit = F.lit(int(float(frac) * (1 << 60)))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    # unlisted strata: threshold NULL -> comparison NULL -> row dropped
    return df.filter(h < thresh)


def rollup_agg(df: DataFrame, group_cols: list[str], aggs: list,
               all_label: str = "(all)") -> DataFrame:
    """Hierarchical subtotals (GROUP BY ROLLUP): per-group rows plus
    every prefix-level subtotal and the grand total.

    Spark executes a rollup as ONE shuffle with grouping-set expansion
    (an Expand node feeding a single partial+final HashAggregate) — not
    a union of k separate aggregations — so the map-side combine is
    shared across all levels. Rolled-up slots are relabeled
    ``all_label`` using ``grouping()`` (NOT a null check, which would
    mislabel genuine data NULLs), making the output join- and
    hash-stable.
    """
    rolled = df.rollup(*group_cols).agg(
        *aggs, *[F.grouping(c).alias(f"__g_{c}") for c in group_cols])
    out = rolled
    for c in group_cols:
        out = out.withColumn(
            c, F.when(F.col(f"__g_{c}") == 1, F.lit(all_label))
                .otherwise(F.col(c).cast("string")))
    return out.drop(*[f"__g_{c}" for c in group_cols])


def running_totals(df: DataFrame, key_col: str, order_cols: list[str],
                   value_col: str) -> DataFrame:
    """Per-key running sum/count of ``value_col`` in ``order_cols``
    order (ROWS UNBOUNDED PRECEDING). One shuffle on the key; each key's
    scan is sequential within its task, so the float accumulation order
    is deterministic (same left-to-right order any engine uses).
    ``order_cols`` must be a total order per key (include a unique
    tiebreaker) or the running values are ambiguous."""
    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("run_n", F.count(F.lit(1)).over(w))
            .withColumn("run_sum", F.sum(F.col(value_col)).over(w)))


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    qs: list[float]) -> DataFrame:
    """EXACT per-group quantiles with percentile_disc semantics: for
    each q, the smallest value whose cumulative distribution reaches q —
    i.e. the element at position max(1, ceil(q*n)) in value order.

    Sort-based: one shuffle on the group key, a per-group rank window,
    then a rank-position filter — each group sorts in parallel with the
    others and spills gracefully, so this stays exact at scale (the
    failure mode is a single giant group; reach for an approx sketch
    there). Ties in ``value`` are harmless: whichever duplicate takes
    the selecting rank, the emitted VALUE is identical.

    Returns (group_col, q, value) — one row per group per quantile.
    """
    if not qs or any(not 0.0 < float(q) <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    w = Window.partitionBy(group_col).orderBy(value_col)
    cw = Window.partitionBy(group_col)
    qarr = F.array(*[F.lit(float(q)) for q in sorted(qs)])
    ranked = (df.withColumn("__rn", F.row_number().over(w))
              .withColumn("__n", F.count(F.lit(1)).over(cw)))
    hits = F.filter(
        qarr,
        lambda q: F.greatest(F.ceil(q * F.col("__n")), F.lit(1)) == F.col("__rn"))
    return (ranked.withColumn("q", F.explode(hits))
            .select(group_col, "q", F.col(value_col).alias("value")))


def split_assign(df: DataFrame, key_col: str,
                 splits: list[tuple[str, float]] | None = None,
                 seed: int = 0) -> DataFrame:
    """Deterministic train/val/test assignment: the row's md5 bucket
    u = md5int(key||seed)/2^60 in [0,1) picks the first split whose
    cumulative weight exceeds u. Same content-hash rule as
    ``hash_sample`` — assignment survives reruns, repartitions, and
    engine changes, and new rows never reshuffle old ones (the property
    a 100 TB corpus split must have; df.randomSplit has none of these).
    Pure column expression, no shuffle. Adds a ``split`` column."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    weights = [float(w) for _, w in splits]
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("split weights must be >= 0 and sum to 1")
    h = F.conv(F.substring(F.md5(F.concat_ws("_", F.col(key_col).cast("string"),
                                             F.lit(str(seed)))), 1, 15),
               16, 10).cast("long")
    expr, cum = None, 0.0
    for name, w in splits[:-1]:
        cum += float(w)
        cond = h < F.lit(int(cum * (1 << 60)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def pack_sequences(df: DataFrame, count_col: str, order_col: str,
                   capacity: int, n_buckets: int = 64) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents are laid out
    in ``order_col`` order, token counts accumulate, and each document
    is assigned to the context-window bin
    ``floor(exclusive_prefix_sum / capacity)`` — the standard GPT-style
    pretraining packing (a document may straddle its bin boundary; the
    boundary tokens spill into the next window downstream).

    Adds ``cum_before`` (exclusive prefix sum of ``count_col``) and
    ``bin_id``.

    Scale shape: a naive ``Window.orderBy(order_col)`` global cumsum
    collapses the corpus onto ONE task. Instead this runs the classic
    two-phase distributed prefix sum: (1) bucket rows by range on
    ``order_col`` (one cheap min/max agg to bound the key space), cumsum
    WITHIN each bucket (parallel, partitionBy window); (2) aggregate one
    total per bucket, exclusive-scan the bucket totals on the driver
    (n_buckets values), and broadcast-join the offsets back. Wall-clock
    is one shuffle on the bucket key + one tiny agg, independent of
    corpus size per task.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return (df.withColumn("cum_before", F.lit(0).cast("long"))
                .withColumn("bin_id", F.lit(0).cast("long")))
    span = max((int(hi) - int(lo)) // n_buckets + 1, 1)
    bucket = ((F.col(order_col) - F.lit(int(lo))) / F.lit(span)).cast("long")
    b = df.withColumn("__bkt", bucket)
    w = (Window.partitionBy("__bkt").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    within = b.withColumn(
        "__cum_in",
        F.sum(F.col(count_col)).over(w) - F.col(count_col))
    totals = (b.groupBy("__bkt").agg(F.sum(count_col).alias("__tot"))
              .orderBy("__bkt").collect())
    offset, offsets = 0, {}
    for row in totals:
        offsets[row["__bkt"]] = offset
        offset += int(row["__tot"])
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])[F.col("__bkt")]
    return (within
            .withColumn("cum_before",
                        (F.col("__cum_in") + off_expr).cast("long"))
            .withColumn("bin_id",
                        F.floor(F.col("cum_before") / F.lit(capacity))
                        .cast("long"))
            .drop("__bkt", "__cum_in"))


def ntile_buckets(df: DataFrame, part_col: str, order_cols: list[str],
                  n_tiles: int = 4) -> DataFrame:
    """Equal-frequency bucketing per group (SQL NTILE): adds ``tile``
    in 1..n_tiles. One shuffle on the group key; ties must be resolved
    by ``order_cols`` (include a unique tiebreaker) or bucket edges are
    ambiguous."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    return df.withColumn("tile", F.ntile(n_tiles).over(w))


def winsorize_by_group(df: DataFrame, group_col: str, value_col: str,
                       lo: float = 0.05, hi: float = 0.95) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo, hi] exact quantiles
    (percentile_disc semantics via :func:`group_quantiles`) — the
    standard outlier guard before aggregating heavy-tailed metrics.

    The bounds frame is group-count-sized, so the clip join is a
    broadcast: the data shuffles once (inside group_quantiles' rank
    window); the winsorized pass itself is map-side. Adds
    ``<value_col>_w``."""
    if not 0.0 < lo < hi <= 1.0:
        raise ValueError("need 0 < lo < hi <= 1")
    qs = group_quantiles(df, group_col, value_col, [lo, hi])
    bounds = qs.groupBy(group_col).agg(
        F.min(F.when(F.col("q") == lo, F.col("value"))).alias("__lo"),
        F.max(F.when(F.col("q") == hi, F.col("value"))).alias("__hi"))
    return (df.join(F.broadcast(bounds), group_col)
            .withColumn(f"{value_col}_w",
                        F.least(F.greatest(F.col(value_col), F.col("__lo")),
                                F.col("__hi")))
            .drop("__lo", "__hi"))


def histogram(df: DataFrame, value_col: str, lo: float, width: float,
              n_bins: int) -> DataFrame:
    """Fixed-width histogram: bin = clip(floor((v - lo)/width), 0,
    n_bins-1). ONE combinable groupBy over at most n_bins rows — the
    map-side partial is the whole sketch, so the shuffle is bin-count
    sized at any data size. Returns (bin, bin_lo, n, sum_v)."""
    if width <= 0 or n_bins < 1:
        raise ValueError("width must be > 0 and n_bins >= 1")
    b = F.least(
        F.greatest(F.floor((F.col(value_col) - F.lit(float(lo)))
                           / F.lit(float(width))), F.lit(0)),
        F.lit(n_bins - 1)).cast("long")
    return (df.withColumn("bin", b)
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(value_col)).alias("sum_v"))
            .withColumn("bin_lo",
                        F.round(F.lit(float(lo))
                                + F.col("bin") * F.lit(float(width)), 6))
            .select("bin", "bin_lo", "n", "sum_v"))


def percentile_rank(df: DataFrame, part_col: str, order_cols: list[str],
                    out_col: str = "pct_rank") -> DataFrame:
    """Cumulative-distribution rank within each group (SQL CUME_DIST in
    (0, 1]): the fraction of group rows ordered at or before this one.
    One shuffle on the group key."""
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    return df.withColumn(out_col, F.cume_dist().over(w))


def quota_sample(df: DataFrame, key_col: str, stratum_col: str, k: int,
                 seed: int = 0) -> DataFrame:
    """Exactly min(k, group size) rows per stratum, chosen by md5 order
    of the key — the deterministic fixed-quota companion to
    stratified_hash_sample (which keeps a FRACTION). Reproducible
    across runs/engines/partitionings; one shuffle on the stratum, and
    the row_number window executes as a per-partition partial top-k
    (no global sort)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.conv(F.substring(F.md5(F.concat_ws("_", F.col(key_col).cast("string"),
                                             F.lit(str(seed)))), 1, 15),
               16, 10).cast("long")
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def upsert_snapshot(base: DataFrame, changes: DataFrame, key_col: str,
                    ver_col: str, op_col: str | None = None) -> DataFrame:
    """Latest-wins merge of a change set into a snapshot (the MERGE INTO
    / CDC-apply pattern without a lake format): per key, keep the row
    with the highest ``ver_col`` (changes beat base on ties); rows whose
    winning version has ``op_col == 'delete'`` drop out.

    One shuffle on the key, window row_number — the same shape a lake
    format's merge executes, expressed on plain DataFrames so the
    operator works on any storage. Schemas must match (plus the
    optional ``op_col`` on changes).
    """
    b = base.withColumn("__src", F.lit(0))
    c = changes.withColumn("__src", F.lit(1))
    if op_col is not None:
        if op_col not in changes.columns:
            raise ValueError(f"changes is missing op column {op_col!r}")
        b = b.withColumn(op_col, F.lit("upsert"))
    both = b.unionByName(c)
    w = Window.partitionBy(key_col).orderBy(F.col(ver_col).desc(),
                                            F.col("__src").desc())
    merged = (both.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn", "__src"))
    if op_col is not None:
        merged = merged.filter(F.col(op_col) != "delete").drop(op_col)
    return merged


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, salt_src: str | None = None) -> DataFrame:
    """Skew-safe equi-join: the left side's hot keys are split across
    ``n_salts`` sub-keys by a deterministic md5 salt (derived from
    ``salt_src``, default the left row's whole-key expression), and the
    right side is replicated once per salt — so a key whose rows all
    landed on ONE reducer now spread over n_salts of them. Result is
    row-identical to the plain join (the salt never leaks).

    Use when AQE's skew handling can't kick in (e.g. a non-shuffle
    producer) or a known hot key needs a fixed split; at 100 TB a
    single hot key otherwise serializes the whole stage on one task.
    Right-side replication costs |right| x n_salts — meant for
    dimension-sized right sides (guard accordingly).
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    src = F.col(salt_src) if salt_src else F.col(key)
    salt = (F.conv(F.substring(F.md5(F.concat_ws("_", src.cast("string"),
                                                 F.lit("salt"))), 1, 15),
                   16, 10).cast("long") % n_salts).cast("int")
    lt = left.withColumn("__salt", salt)
    rt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return lt.join(rt, [key, "__salt"]).drop("__salt")


def latest_by_key(df: DataFrame, key_col: str, order_col: str,
                  tiebreak_col: str | None = None) -> DataFrame:
    """The most recent row per key via a combinable max_by aggregate —
    one map-side-combinable groupBy, NO window sort (the window
    formulation shuffles and sorts every row; max_by reduces
    partially). Ties resolved by ``tiebreak_col`` (required for
    determinism when ``order_col`` has duplicates)."""
    order = (F.struct(F.col(order_col), F.col(tiebreak_col))
             if tiebreak_col else F.col(order_col))
    others = [c for c in df.columns if c != key_col]
    agg = F.max_by(F.struct(*[F.col(c) for c in others]), order).alias("__r")
    out = df.groupBy(key_col).agg(agg)
    return out.select(key_col, *[F.col(f"__r.{c}").alias(c) for c in others])


def gapfill_daily(df: DataFrame, ts_col: str, value_col: str,
                  group_col: str | None = None) -> DataFrame:
    """Calendar densification: per (group,) day, aggregate ``value_col``
    and emit a row for EVERY day in the observed [min, max] range,
    zero-filled — the precondition for any rolling-window time series
    (a range window over sparse days silently shortens its frame).

    The day spine is one tiny min/max agg + sequence-explode
    (days-sized), cross-joined with the group list (group-count-sized)
    and left-joined to the daily aggregate — nothing data-sized beyond
    the one groupBy(day) shuffle.

    Returns (group?, day, n, sum_v).
    """
    day = F.to_date(F.col(ts_col))
    gcols = [group_col] if group_col else []
    daily = (df.withColumn("day", day)
             .groupBy(*gcols, "day")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col(value_col)).alias("sum_v")))
    span = df.agg(F.min(day).alias("lo"), F.max(day).alias("hi"))
    spine = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    if gcols:
        groups = df.select(*gcols).distinct()
        spine = spine.crossJoin(F.broadcast(groups))
    return (spine.join(daily, [*gcols, "day"], "left")
            .select(*gcols, "day",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n"),
                    F.coalesce("sum_v", F.lit(0.0)).alias("sum_v")))


def rolling_mean_days(df: DataFrame, day_col: str, value_col: str,
                      n_days: int = 7,
                      group_col: str | None = None) -> DataFrame:
    """Trailing n-day rolling mean via a RANGE window over the day
    number — the frame is defined by VALUE distance (days), not row
    count, so it is correct on sparse days too. One shuffle on the
    group key (or a single partition for the global series — feed
    grouped data at scale). Adds ``roll_avg``."""
    gcols = [group_col] if group_col else []
    daynum = F.datediff(F.col(day_col), F.lit("1970-01-01").cast("date"))
    base = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    w = (base.orderBy(daynum.cast("long"))
         .rangeBetween(-(n_days - 1), 0))
    return df.withColumn("roll_avg", F.avg(F.col(value_col)).over(w))


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton/Z-order interleave of two non-negative integer columns —
    the space-filling-curve clustering key that makes multi-column range
    pruning work on a single sort order (the technique behind
    Delta/Iceberg OPTIMIZE ZORDER). Pure column expression: bit i of
    each input lands at output bits 2i / 2i+1. Sort-by-zorder before
    writing and both columns' min/max file statistics become selective.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (out
               + F.shiftleft(F.shiftright(a.cast("long"), i)
                             .bitwiseAND(1), 2 * i)
               + F.shiftleft(F.shiftright(b.cast("long"), i)
                             .bitwiseAND(1), 2 * i + 1))
    return out


def suggest_range_bounds(df: DataFrame, col: str,
                         n_partitions: int = 8) -> DataFrame:
    """Range-partitioner split points from EXACT quantiles of ``col``
    (percentile_disc at k/n for k = 1..n-1): the bounds that give each
    range partition an equal row share — what repartitionByRange
    estimates by sampling, computed exactly and reproducibly here so a
    writer's file layout is stable across reruns.

    Returns (q, bound) with n_partitions - 1 rows.
    """
    if n_partitions < 2:
        raise ValueError("n_partitions must be >= 2")
    qs = [k / n_partitions for k in range(1, n_partitions)]
    out = global_quantiles(df, col, qs)
    return out.select(F.round("q", 6).alias("q"),
                      F.col("value").alias("bound"))


def global_quantiles(df: DataFrame, col: str, qs: list[float]) -> DataFrame:
    """EXACT whole-dataset quantiles (percentile_disc semantics)
    WITHOUT a single-task global sort: range-partition on the value
    (each partition sorts in parallel), count rows per partition, turn
    the tiny per-partition counts into broadcast rank offsets, and pick
    the rows whose global rank hits ceil(q*n) — the two-phase
    distributed ranking used throughout (pack_sequences, the AUC
    reduction). The element at a global rank is partitioning-invariant,
    so the result is deterministic under any layout.

    Returns (q, value), one row per quantile.
    """
    if not qs or any(not 0.0 < float(q) <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    vals = df.select(F.col(col).alias("__v"))
    ranged = (vals.repartitionByRange("__v")
              .sortWithinPartitions("__v")
              .withColumn("__pid", F.spark_partition_id()))
    ranged = ranged.persist()
    counts = sorted(
        ((r["__pid"], r["cnt"]) for r in
         ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt"))
         .collect()),
        key=lambda t: t[0])
    n = sum(c for _, c in counts)
    if n == 0:
        ranged.unpersist()
        spark = df.sparkSession
        return spark.createDataFrame([], "q double, value double")
    offsets = {}
    acc = 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    import math

    targets = {}
    for q in sorted(set(float(v) for v in qs)):
        targets.setdefault(max(1, math.ceil(q * n)), []).append(q)
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])[F.col("__pid")]
    w = Window.partitionBy("__pid").orderBy("__v")
    hit_ranks = list(targets)
    hits = (ranged
            .withColumn("__rank", F.row_number().over(w) + off_expr)
            .filter(F.col("__rank").isin(hit_ranks))
            .select("__rank", "__v"))
    rows = {r["__rank"]: r["__v"] for r in hits.collect()}
    ranged.unpersist()
    spark = df.sparkSession
    out = [(float(q), float(rows[rk])) for rk, qlist in targets.items()
           for q in qlist]
    out.sort()
    return spark.createDataFrame(out, "q double, value double")


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 n_mads: float = 3.0) -> DataFrame:
    """Robust per-group outlier flags: |v - median| > n_mads * MAD,
    with median and MAD (median absolute deviation) computed EXACTLY
    via :func:`group_quantiles` — the robust replacement for mean/sd
    flags, which heavy tails corrupt. Two quantile passes (median, then
    MAD) + a broadcast join of the group-sized bounds. Adds
    ``is_outlier``."""
    med = (group_quantiles(df, group_col, value_col, [0.5])
           .select(group_col, F.col("value").alias("__med")))
    dev = (df.join(F.broadcast(med), group_col)
           .withColumn("__adev", F.abs(F.col(value_col) - F.col("__med"))))
    mad = (group_quantiles(dev, group_col, "__adev", [0.5])
           .select(group_col, F.col("value").alias("__mad")))
    return (dev.join(F.broadcast(mad), group_col)
            .withColumn("is_outlier",
                        F.col("__adev") > F.lit(float(n_mads)) * F.col("__mad"))
            .drop("__adev"))


def weighted_sample(df: DataFrame, key_col: str, weight_col, k: int,
                    seed: int = 0) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws u = md5-uniform(key, seed) in (0, 1)
    and keeps the k largest u^(1/w) — equivalently the k smallest
    -ln(u)/w. Inclusion probability is proportional to weight, the
    choice is reproducible across runs/engines/partitionings, and the
    selection executes as a TakeOrdered partial top-k (k rows per
    partition cross the shuffle). The standard quality-weighted
    subset-selection pass for training corpora."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(F.substring(F.md5(F.concat_ws("_", F.col(key_col).cast("string"),
                                             F.lit(str(seed)))), 1, 15),
               16, 10).cast("double")
    u = (h + 1.0) / float((1 << 60) + 2)  # strictly inside (0, 1)
    kexp = -F.log(u) / w  # smaller = more likely kept, Exp(w) race
    return (df.withColumn("__k", kexp)
            .orderBy("__k", key_col).limit(k).drop("__k"))


def cube_agg(df: DataFrame, group_cols: list[str], aggs: list,
             all_label: str = "(all)") -> DataFrame:
    """All-subsets subtotals (GROUP BY CUBE): every combination of the
    grouping columns, each rolled-up slot relabeled via ``grouping()``.
    Same single-shuffle Expand + shared partial-aggregate execution as
    :func:`rollup_agg` — 2^k grouping sets share one map-side combine,
    never k separate scans."""
    cubed = df.cube(*group_cols).agg(
        *aggs, *[F.grouping(c).alias(f"__g_{c}") for c in group_cols])
    out = cubed
    for c in group_cols:
        out = out.withColumn(
            c, F.when(F.col(f"__g_{c}") == 1, F.lit(all_label))
                .otherwise(F.col(c).cast("string")))
    return out.drop(*[f"__g_{c}" for c in group_cols])


def stratified_topn_sample(df: DataFrame, key_col: str,
                           stratum_cols: list[str], n: int,
                           seed: int = 0) -> DataFrame:
    """Exact-n per-stratum sample (eval-set carving, class-balanced
    fine-tuning subsets): rank rows within each stratum by the same
    deterministic md5 hash as hash_sample and keep the n smallest —
    exactly min(n, |stratum|) rows per stratum, reproducible across
    runs, engines, and partitionings. Complements
    stratified_hash_sample, whose per-stratum COUNT is binomial, not
    exact.

    Scale shape: Spark plans rank<=n as WindowGroupLimit, so each map
    task pre-trims to its local top-n BEFORE the stratum shuffle — the
    exchange carries at most n rows per stratum per input partition,
    not the stratum. The hash (not an attribute) is the sort key, so
    hot strata cost n, never a data-dependent sort of the whole group.

    Output: input columns + __rk (1-based hash rank within stratum).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    h = F.conv(F.substring(F.md5(F.concat_ws(
        "_", F.col(key_col).cast("string"), F.lit(str(seed)))), 1, 15),
        16, 10).cast("long")
    w = Window.partitionBy(*stratum_cols).orderBy(h.asc(), F.col(key_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n))
