"""Time-series gap-fill: a dense per-key time spine over sparse bucketed
aggregates, with configurable fill (none / zero / LOCF forward-fill) —
the hypertable-rollup companion operator (TimescaleDB's
``time_bucket_gapfill`` + ``locf``, InfluxDB's ``fill(previous)``)
re-expressed as DataFrame primitives. Spark has no native gap-fill;
dashboards and feature pipelines need dense series (a missing hour must
read as 0 events / carried-forward metric, not as an absent row).

Scale shape: the spine is generated per key from that key's own
[min, max] bucket range — one ``sequence()`` + ``explode`` per key, no
driver-side range materialization and no cross join against a global
calendar (a global spine × keys would fabricate |keys| × |buckets| rows
even for keys alive one hour). The left join back to the aggregates is
keyed on (key, bucket) — same shuffle key as the aggregation itself —
and the LOCF pass is one window per key ordered by bucket (
``last_value(ignorenulls=True)``, rows unbounded-preceding → current).
Everything is JVM Column expressions; fully DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET_SECONDS = {
    "1 hour": 3600,
    "1 day": 86400,
    "1 minute": 60,
}


def time_bucket(ts_col: Column | str, bucket: str = "1 hour") -> Column:
    """Truncate a timestamp to its bucket start (epoch-aligned)."""
    secs = _BUCKET_SECONDS[bucket]
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.timestamp_seconds(
        (F.unix_timestamp(c) / secs).cast("bigint") * secs
    )


def gapfill(
    aggregated: DataFrame,
    keys: Sequence[str],
    bucket_col: str = "bucket",
    bucket: str = "1 hour",
    fill_zero: Sequence[str] = (),
    fill_locf: Sequence[str] = (),
) -> DataFrame:
    """Densify a bucketed aggregate: emit one row per key per bucket in
    that key's [min, max] observed range. ``fill_zero`` columns read 0
    in fabricated rows (counts/sums); ``fill_locf`` columns carry the
    last observed value forward (gauges/metrics; leading gaps stay
    NULL); all other non-key columns stay NULL in fabricated rows.

    Input must already be aggregated to one row per (keys, bucket) —
    this operator fabricates rows, it never re-aggregates."""
    secs = _BUCKET_SECONDS[bucket]
    spine = (
        aggregated.groupBy(*keys)
        .agg(
            F.min(bucket_col).alias("_lo"),
            F.max(bucket_col).alias("_hi"),
        )
        .select(
            *keys,
            F.explode(
                F.sequence(
                    "_lo", "_hi", F.expr(f"INTERVAL {secs} SECONDS")
                )
            ).alias(bucket_col),
        )
    )
    joined = spine.join(aggregated, on=[*keys, bucket_col], how="left")
    out_cols: list[Column] = [F.col(c) for c in keys] + [F.col(bucket_col)]
    locf_w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in aggregated.columns:
        if c in keys or c == bucket_col:
            continue
        if c in fill_zero:
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif c in fill_locf:
            out_cols.append(
                F.last(F.col(c), ignorenulls=True).over(locf_w).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def bucketed_agg_gapfill(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    bucket: str = "1 hour",
    aggs: Sequence[Column] = (),
    fill_zero: Sequence[str] = (),
    fill_locf: Sequence[str] = (),
) -> DataFrame:
    """Bucketed aggregation + gap-fill in one call: groupBy (keys,
    time_bucket) with the caller's aggregate expressions, then densify.
    The bucket truncation happens BEFORE the shuffle, so the exchange
    is keyed exactly (keys, bucket) and the spine join reuses that
    partitioning."""
    agged = events.groupBy(
        *keys, time_bucket(ts_col, bucket).alias("bucket")
    ).agg(*aggs)
    return gapfill(
        agged, keys, bucket_col="bucket", bucket=bucket,
        fill_zero=fill_zero, fill_locf=fill_locf,
    )


def interval_point_join_bucketed(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    point_col: str = "ts",
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Scalable interval×point range join. Spark plans a raw
    ``p.ts BETWEEN i.start AND i.end`` join as a BroadcastNestedLoop /
    cartesian — quadratic the moment neither side broadcasts. The
    standard scale route (the chunking trick behind range-join
    optimizations in several engines' public docs): explode each
    interval to the fixed-length time chunks it covers (bounded by
    interval_len/chunk + 1 rows), bucket each point into exactly one
    chunk, EQUI-join on the chunk (shuffle or broadcast hash — never a
    nested loop), then refine with the exact range predicate. Row-set
    identical to the naive join (equality-tested; a point pairs with
    an interval in exactly one chunk — the point's own — so no dedup
    step is needed).

    ``chunk_seconds`` trades fan-out (long intervals explode into
    more chunks) against join selectivity (big chunks pair more
    non-overlapping rows for the refine filter to drop); set it near
    the typical interval length.

    Output: every (interval row ⨯ matching point row), both sides'
    columns preserved. Column names must not collide across the two
    inputs (rename before calling)."""
    overlap = set(intervals.columns) & set(points.columns)
    if overlap:
        raise ValueError(f"column collision across inputs: {sorted(overlap)}")
    iv = intervals.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / chunk_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / chunk_seconds),
            )
        ),
    )
    pt = points.withColumn(
        "_chunk", F.floor(F.unix_timestamp(F.col(point_col)) / chunk_seconds)
    )
    joined = iv.join(pt, on="_chunk").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_chunk")


def interval_interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "start_ts",
    l_end: str = "end_ts",
    r_start: str = "r_start_ts",
    r_end: str = "r_end_ts",
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Interval×interval OVERLAP join by the same chunking rewrite as
    :func:`interval_point_join_bucketed`, generalized: both sides
    explode to their covered chunks, equi-join on the chunk, refine
    with the overlap predicate (``l_start ≤ r_end AND r_start ≤
    l_end``). An overlapping pair shares EVERY chunk its overlap
    spans, so naive chunk-joining duplicates it; instead of a
    distinct (a full extra shuffle of the output), each pair is kept
    only in the single chunk containing its OVERLAP START
    (``greatest(l_start, r_start)``) — a map-side filter, zero extra
    shuffles, exact multiplicity. Row-set identical to the naive
    non-equi join (equality-tested). Column names must not collide."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column collision across inputs: {sorted(overlap)}")

    def chunks(df, s, e):
        return df.withColumn(
            "_chunk",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / chunk_seconds),
                    F.floor(F.unix_timestamp(F.col(e)) / chunk_seconds),
                )
            ),
        )

    lv = chunks(left, l_start, l_end)
    rv = chunks(right, r_start, r_end)
    ov_start = F.greatest(F.col(l_start), F.col(r_start))
    return (
        lv.join(rv, on="_chunk")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (
                F.col("_chunk")
                == F.floor(F.unix_timestamp(ov_start) / chunk_seconds)
            )
        )
        .drop("_chunk")
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: how many users reached step k having
    reached step k-1 STRICTLY EARLIER — the product-analytics staple
    (view → click → purchase). For each user, step 1's time is their
    earliest step-1 event; step k's time is their earliest step-k
    event after their step-(k-1) time. Returns one row per step:
    (step_idx, step, n_users, conversion_from_prev, conversion_from_first),
    rates rounded to 6 dp.

    Scale shape: step 1 is one keyed min; each later step is a keyed
    min over a per-user-filtered slice joined to the (already
    aggregated, one-row-per-user) previous stage — every join keys on
    the user, so a co-partitioned plan shuffles each event subset
    once and the per-user state never exceeds one timestamp per step.
    No windows over the raw event stream, no per-user event sorting.
    All step counts come from ONE action over a lazily unioned plan
    (the corpus_pipeline_funnel pattern): stage k's subplan appears in
    both its own count branch and stage k+1's join branch as the SAME
    exchange, so Catalyst's ReuseExchange dedups it and each step's
    filtered event slice is scanned once — not the per-step `.count()`
    chain that re-executes steps 1..k-1 K times (the r8 verdict's
    recompute finding; plan-guarded in tests/test_analytics.py)."""
    counts_df = funnel_step_counts(events, steps, user_col, type_col, ts_col)
    got = {int(r["step_idx"]): int(r["n"]) for r in counts_df.collect()}
    counts = [got[i] for i in range(1, len(steps) + 1)]
    import decimal

    def _r6(x: float) -> float:
        # HALF_UP to match Spark's round() and DuckDB's round() —
        # Python's builtin round is HALF_EVEN and can diverge on exact
        # .5e-6 integer-ratio boundaries.
        return float(
            decimal.Decimal(x).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    spark = events.sparkSession
    rows = []
    for i, (step, n) in enumerate(zip(steps, counts), start=1):
        prev = counts[i - 2] if i >= 2 else counts[0]
        rows.append(
            (
                i,
                step,
                int(n),
                # step 1 converts from itself: 1.0 by definition, even
                # on an empty funnel (the oracle hardcodes round(1.0, 6)
                # for step 1 — both engines must agree on degenerate
                # corpora); later steps with an empty previous stage are
                # 0/0, emitted as 0.0 in both engines.
                1.0 if i == 1 else (_r6(n / prev) if prev else 0.0),
                1.0 if i == 1 else (_r6(n / counts[0]) if counts[0] else 0.0),
            )
        )
    return spark.createDataFrame(
        rows,
        "step_idx INT, step STRING, n_users BIGINT, "
        "conversion_from_prev DOUBLE, conversion_from_first DOUBLE",
    )


def funnel_step_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """The funnel's per-step user counts as ONE lazily unioned plan —
    (step_idx, n), one row per step, all counts from a single action.
    Stage k is a keyed min over the step-k event slice joined to stage
    k-1's one-row-per-user output; each stage subplan is shared between
    its own count branch and the next stage's join branch, so the
    executed plan holds one filtered events scan PER STEP (ReuseExchange
    dedups the shared aggregations — asserted in tests), not the
    O(K^2) re-execution a per-step `.count()` chain pays.

    Two details make the reuse actually fire (without them the count
    branch's subplan diverges from the join branch's and Catalyst sees
    two different exchanges over the same data):

    * the base relation pre-filters ``user_col IS NOT NULL``, so the
      null-filter the joins INFER on their key is already present in
      the count branches too (null users can't survive any join step,
      so the counts are unchanged);
    * each count keeps the stage's ``min(ts)`` aggregate alive via
      ``greatest(count(1), count(_tk))`` — plain ``count(1)`` lets
      column pruning drop the min, splitting the subplans. The value
      is still the GROUP count (count(1) >= count(_tk) always), so a
      degenerate all-null-ts user stays counted exactly like the
      oracle's count(*)."""
    base = events.filter(F.col(user_col).isNotNull())
    cur = (
        base.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"))
    )
    stages = [cur]
    prev_ts = "_t1"
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            base.filter(F.col(type_col) == step)
            .join(stages[-1].select(user_col, prev_ts), user_col)
            .filter(F.col(ts_col) > F.col(prev_ts))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"_t{i}"))
        )
        stages.append(nxt)
        prev_ts = f"_t{i}"
    out = None
    for i, st in enumerate(stages, start=1):
        c = st.agg(
            F.lit(i).alias("step_idx"),
            F.greatest(F.count(F.lit(1)), F.count(F.col(f"_t{i}")))
            .cast("bigint")
            .alias("n"),
        )
        out = c if out is None else out.unionAll(c)
    return out


def cohort_retention(
    events: DataFrame,
    max_offset_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by FIRST-EVENT day (their
    cohort), counted as retained on day offsets 0..max_offset_days —
    the classic retention triangle. Returns
    (cohort_day, day_offset, n_users) with n_users = distinct cohort
    members active exactly offset days after their first day.

    Scale shape: first-event day is one keyed min (map-side
    combinable); activity days dedupe to one row per (user, day)
    BEFORE the cohort join (the raw event volume never reaches the
    join), and the final count is a keyed agg on
    (cohort_day, offset) — bounded by days × max_offset rows out."""
    first = events.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    active = events.select(
        user_col, F.to_date(ts_col).alias("_day")
    ).distinct()
    return (
        active.join(first, user_col)
        .select(
            user_col,
            "cohort_day",
            F.datediff("_day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= int(max_offset_days))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).cast("bigint").alias("n_users"))
    )


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    window_hours: int = 24,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Marketing-style revenue attribution: credit each conversion's
    value to the touch events (views/clicks) the same user produced in
    the ``window_hours`` before it, under two standard models at once —
    ``last_touch`` (the most recent touch takes the full value; ties
    break on the higher event id) and ``linear`` (the value splits
    evenly across all touches in the window). Conversions with NO
    in-window touch are credited to the synthetic channel ``direct``
    under both models. Returns one row per (model, channel):
    (model, channel, n_touches, revenue) with revenue rounded to 4 dp
    and n_touches = credited touch events (conversions for `direct`).

    Law: for each model, sum(revenue) over channels equals the total
    conversion value — credit is moved, never created (tested), and it
    holds EXACTLY because revenue accumulates in integer 1e-4 units
    (values carry 2 decimals, so ``round(value*1e4)`` is an exact
    bigint — the events_hopping convention): integer sums are
    partial-agg-order independent, so a sum near a 0.00005 display
    boundary can never flip between Spark and an oracle engine. The
    linear model distributes ``val_e4`` with integer division — each
    touch gets ``val_e4 DIV n`` and the LAST touch (the same
    deterministic (ts, id) order last-touch uses) absorbs the
    remainder ``val_e4 % n`` — so even a 3-way split of an odd amount
    conserves credit to the last 1e-4 unit.

    Scale shape: one keyed join (user) between the conversion slice
    and the touch slice — co-partitioned, shuffled once each; the
    window predicate filters in the join; per-conversion state is
    bounded by the user's touch count inside the window (a per-user
    activity bound, not a corpus bound). Last-touch is one
    row_number per conversion (Partial WindowGroupLimit shape);
    linear's per-touch share is one count window per conversion.
    Output is bounded by models × channels. The conversion slice and
    the in-window pair relation are each materialized ONCE
    (localCheckpoint — conv is one row per conversion, pairs are
    bounded by conversions × per-user in-window touches), because
    FIVE branches consume them (two models, the anti-join, twice for
    'direct'): without the checkpoint the final plan re-scans events
    six times (measured; the funnel_step_counts recompute class), with
    it the result plan reads checkpoints only — two events passes
    total, plan-guarded in tests."""
    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_cts"),
            F.col(id_col).alias("_cid"),
            F.round(F.col(value_col) * 1e4).cast("bigint").alias("_val_e4"),
        )
        .localCheckpoint(eager=True)
    )
    tou = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_tts"),
        F.col(id_col).alias("_tid"),
        F.col(type_col).alias("channel"),
    )
    j = (
        conv.join(tou, "_u")
        .filter(
            (F.col("_tts") <= F.col("_cts"))
            & (
                F.col("_tts")
                >= F.col("_cts")
                - F.expr(f"INTERVAL {int(window_hours)} HOURS")
            )
        )
        .localCheckpoint(eager=True)
    )
    w_last = Window.partitionBy("_cid").orderBy(
        F.col("_tts").desc(), F.col("_tid").desc()
    )
    last = (
        j.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("_val_e4").alias("_rev_e4"),
        )
        .select(
            F.lit("last_touch").alias("model"), "channel", "n_touches", "_rev_e4"
        )
    )
    w_n = Window.partitionBy("_cid")
    # integer distribution: each touch gets _val_e4 DIV n; the last
    # touch (rn == 1 in the same desc order last-touch uses) absorbs
    # the remainder, so per-conversion credit sums to _val_e4 exactly
    share_e4 = F.expr("_val_e4 DIV _n") + F.when(
        F.col("_rn") == 1, F.expr("_val_e4 % _n")
    ).otherwise(F.lit(0))
    linear = (
        j.withColumn("_n", F.count(F.lit(1)).over(w_n))
        .withColumn("_rn", F.row_number().over(w_last))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(share_e4).alias("_rev_e4"),
        )
        .select(F.lit("linear").alias("model"), "channel", "n_touches", "_rev_e4")
    )
    direct = (
        conv.join(j.select("_cid").distinct(), "_cid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.coalesce(F.sum("_val_e4"), F.lit(0).cast("bigint")).alias("_rev_e4"),
        )
    )
    directs = None
    for mdl in ("last_touch", "linear"):
        d = direct.select(
            F.lit(mdl).alias("model"),
            F.lit("direct").alias("channel"),
            "n_touches",
            "_rev_e4",
        )
        directs = d if directs is None else directs.unionAll(d)
    return (
        last.unionByName(linear)
        .unionByName(directs)
        .select(
            "model", "channel", "n_touches",
            F.round(F.col("_rev_e4") / 1e4, 4).alias("revenue"),
        )
        .orderBy("model", "channel")
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-type transition counts and probabilities — the
    first-order Markov readout behind "what do users do after a
    click?". Orders each user's events by (ts, event_id) (the id
    breaks timestamp ties deterministically), pairs each event with
    its successor via one lag/lead window, and aggregates
    (from_type, to_type, n, p) where p = n / sum(n) over the from_type
    (rounded to 6 dp).

    Scale shape: ONE window over (user, ts, id) — the shuffle carries
    (user, ts, id, type) only, never payloads; the aggregation output
    is bounded by |event types|²; the per-from normalization is a
    window over that tiny relation, not the events."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.select(user_col, ts_col, id_col, F.col(type_col).alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("p"),
    ).orderBy("from_type", "to_type")


def rfm_segments(
    events: DataFrame,
    purchase_type: str = "purchase",
    n_tiles: int = 4,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing readout: per purchasing user, days since last
    purchase (integer microsecond arithmetic against the corpus-max
    purchase time — no float epoch math), purchase count, and exact
    integer-cents spend; each dimension is then cut into ``n_tiles``
    quantile tiles (ntile, with the user id breaking metric ties so
    the tiling is a total order both engines replay identically —
    recency ascending so tile 1 is the most recent, frequency and
    monetary descending so tile 1 is the most active/valuable).
    Returns segment CELL counts: (r, f, m, n_users) — the |tiles|³
    -bounded matrix a campaign planner reads.

    Scale shape: one keyed aggregation over the purchase slice (the
    shuffle carries user ids, bounded by purchasers, never events);
    the corpus-max is a 1-row broadcast; the three ntiles are global
    windows — and a partitionBy-less Window plans Exchange
    SinglePartition + one sort (every per-user row through ONE task
    per dimension), not a range-partitioned sort. Tolerable because
    the windowed relation is per-USER, 3-5 orders of magnitude
    smaller than the event log; at 100 TB swap each ntile for
    approx-quantile tile bounds + a map-only CASE (the
    rank_ensemble_approx / perplexity_buckets_approx pattern).
    Output is bounded by n_tiles³."""
    p = (
        events.filter(F.col(type_col) == purchase_type)
        .groupBy(F.col(user_col).alias("_u"))
        .agg(
            F.max(F.unix_micros(F.col(ts_col))).alias("_last_us"),
            F.count(F.lit(1)).cast("bigint").alias("_freq"),
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias(
                "_cents"
            ),
        )
    )
    mx = p.agg(F.max("_last_us").alias("_mx"))
    scored = p.crossJoin(F.broadcast(mx)).withColumn(
        # integer floor division (DIV) on exact integer micros — the
        # double-division-then-cast form could truncate differently
        # from an oracle's integer // at a day boundary
        "_r_days",
        F.expr("(_mx - _last_us) DIV 86400000000"),
    )
    t = int(n_tiles)
    r_w = Window.orderBy(F.col("_r_days").asc(), F.col("_u").asc())
    f_w = Window.orderBy(F.col("_freq").desc(), F.col("_u").asc())
    m_w = Window.orderBy(F.col("_cents").desc(), F.col("_u").asc())
    return (
        scored.select(
            F.ntile(t).over(r_w).alias("r"),
            F.ntile(t).over(f_w).alias("f"),
            F.ntile(t).over(m_w).alias("m"),
        )
        .groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("r", "f", "m")
    )


def hourly_anomaly(
    events: DataFrame,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
) -> DataFrame:
    """Volume-anomaly detection over the hourly event counts: hours
    whose count sits more than ``z_threshold`` sample standard
    deviations from the mean — the ops-dashboard "traffic spike/drop"
    readout. The moments are EXACT integers (count, sum, sum of
    squares over the hourly-count relation), so mean/std/z are each
    ONE fixed double expression of three exact integers — identical
    in any engine regardless of partial-aggregation order (the same
    trick as the integer-cents sums; a naive stddev_samp over doubles
    would be order-sensitive at the 6-dp display boundary).

    Scale shape: one hourly groupBy (map-side combinable, output
    bounded by hours), one 1-row moment aggregate over it, broadcast
    back — the events log is scanned ONCE because the hours relation
    is localCheckpointed before its two consumers (the moment branch
    and the z projection — without it each branch re-derives the
    hours from a fresh events scan, the funnel/attribution recompute
    class; plan-guarded); z is map work on the hours relation."""
    h = (
        events.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour_start"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    mom = h.agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"),
        F.sum("n").alias("_s1"),
        F.sum(F.col("n") * F.col("n")).alias("_s2"),
    )
    mean = F.col("_s1") / F.col("_c")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_c")) / (
        F.col("_c") - F.lit(1)
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        h.crossJoin(F.broadcast(mom))
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > float(z_threshold))
        .select("hour_start", "n", "z")
        .orderBy("hour_start")
    )


def journey_trigrams(
    events: DataFrame,
    top: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common 3-step user journeys — the higher-order sibling of
    :func:`transition_matrix` (second-order paths answer "what do
    users do AFTER view→click?" where the first-order matrix cannot):
    each user's (ts, id)-ordered event stream yields one trigram per
    position via two lead windows over the SAME sort, counted and cut
    to the ``top`` paths (ties broken lexicographically).

    Scale shape: ONE window partitioning (both leads share the sort —
    a single Exchange+Sort, plan-checked by the window-suite
    convention); the shuffle carries (user, ts, id, type); output is
    bounded by |types|³ before the cut, top-k by
    TakeOrderedAndProject."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    tri = (
        events.select(user_col, ts_col, id_col, F.col(type_col).alias("s0"))
        .withColumn("s1", F.lead("s0", 1).over(w))
        .withColumn("s2", F.lead("s0", 2).over(w))
        .filter(F.col("s2").isNotNull())
        .groupBy("s0", "s1", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return tri.orderBy(F.desc("n"), "s0", "s1", "s2").limit(int(top))


def inter_event_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event-type cadence profile: exact median and p90 of the gap
    (in seconds) between CONSECUTIVE events of the same (user, type) —
    the ops readout behind rate-anomaly rules ("purchases normally
    arrive hours apart; this user fires one per second"). Ordering
    tie-breaks on the event id so the lag sequence is a total order
    both engines replay identically; gaps are exact integer
    microsecond differences, and the percentiles interpolate linearly
    (Spark ``percentile`` and DuckDB ``quantile_cont`` both implement
    the R-7 rule: lower + frac·(upper−lower) — over exact integers the
    interpolation is one double expression, identical in both).

    Scale shape: one window per (user, type) partition (the same
    partitioning every sessionization op here shuffles on — at 100 TB
    the exchange is reused across the family), then a map-combinable
    groupBy whose output is bounded by the type count. The exact
    percentile aggregate collects each type's gap multiset on one
    reducer — bounded by events-per-type; at the scale where that
    spills, swap in percentile_approx (same row shape, sketch-merged
    map-side) — the documented exact/approx ladder."""
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gaps = (
        events.select(user_col, type_col, ts_col, id_col)
        .withColumn("_prev", F.lag(ts_col, 1).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            type_col,
            (
                F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_prev"))
            ).alias("_gap_us"),
        )
    )
    return (
        gaps.groupBy(type_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(
                F.expr("percentile(_gap_us, 0.5)") / F.lit(1e6), 6
            ).alias("p50_s"),
            F.round(
                F.expr("percentile(_gap_us, 0.9)") / F.lit(1e6), 6
            ).alias("p90_s"),
        )
        .orderBy(type_col)
    )


def audience_overlap(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Pairwise audience OVERLAP between event types: for every
    unordered type pair, the distinct-user intersection and its
    Jaccard similarity — the product-analytics readout for "do the
    people who hit errors also purchase?". Exact integer set sizes;
    Jaccard is the one double division, displayed at 6 dp.

    Scale shape: the input collapses FIRST to distinct (type, user)
    pairs (map-combinable aggregate — the only pass over raw events);
    the pair counts come from a self-join keyed on the user whose
    fan-out is bounded by types²/user (with |types| small and fixed,
    linear in users); per-type audience sizes derive from the SAME
    collapsed relation and broadcast onto the 25-row pair result.
    Nothing quadratic in users anywhere."""
    tu = events.select(type_col, user_col).distinct()
    a = tu.select(
        F.col(type_col).alias("type_a"), F.col(user_col).alias("u")
    )
    b = tu.select(
        F.col(type_col).alias("type_b"), F.col(user_col).alias("u")
    )
    inter = (
        a.join(b, "u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sizes = tu.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    sa = sizes.select(
        F.col(type_col).alias("type_a"), F.col("n_users").alias("n_a")
    )
    sb = sizes.select(
        F.col(type_col).alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_common",
            F.round(
                F.col("n_common")
                / (F.lit(1.0) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def dau_mau_stickiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily active users over monthly active users — the stickiness
    curve. Dates travel as ISO strings (the cross-engine date
    convention); DAU and MAU are exact distinct counts from two
    collapses of the same projection, joined on the day's month
    prefix; stickiness is the one double division at 6 dp.

    Scale shape: both distinct collapses are map-combinable aggregates
    keyed by (period, user) — the classic two-pass distinct — and the
    month relation (≤ months observed) broadcasts onto the day rows.
    No window, no full-history state: at 100 TB this is two shuffles
    of the collapsed (period, user) relation, each far smaller than
    the raw events."""
    base = events.select(
        F.date_format(ts_col, "yyyy-MM-dd").alias("day"),
        F.date_format(ts_col, "yyyy-MM").alias("mon"),
        F.col(user_col).alias("u"),
    )
    dau = (
        base.select("day", "u")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    )
    mau = (
        base.select("mon", "u")
        .distinct()
        .groupBy("mon")
        .agg(F.count(F.lit(1)).cast("bigint").alias("mau"))
    )
    return (
        dau.join(
            F.broadcast(mau), F.substring(F.col("day"), 1, 7) == F.col("mon")
        )
        .select(
            "day", "dau", "mau",
            F.round(
                F.col("dau") / (F.lit(1.0) * F.col("mau")), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


def cusum_drift(
    grain: DataFrame, time_col: str = "h", value_col: str = "x"
) -> DataFrame:
    """Two-sided CUSUM drift statistics over an ordered grain — the
    changepoint primitive. The textbook recursion s_k = max(0,
    s_{k-1} + (x_k - mean)) is not window-expressible as written; the
    prefix-extremum identity s_k = cum_k - min(0, min_{j<=k} cum_j)
    (mirror: running max for downward drift) turns it into two
    ordered cumulative windows. Deviations are scaled by the grain
    count (y = n*x - T, the common-denominator trick), so cum / s_up /
    s_dn are exact bigints: s_up/s_dn are the upward/downward CUSUM
    statistics TIMES n, i.e. s/T is the drift in average-bucket
    units. Input must be the aggregated grain (one row per bucket,
    exact integer value), not raw rows.

    Scale shape: the windows run over the grain (one row per bucket —
    an Exchange SinglePartition over bucket rows, never raw data).
    Overflow: |cum| <= n*T."""
    tot = grain.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(value_col).cast("bigint").alias("t"),
    )
    y = grain.crossJoin(F.broadcast(tot)).select(
        time_col,
        value_col,
        "n",
        "t",
        (F.col("n") * F.col(value_col) - F.col("t")).alias("_y"),
    )
    w_cum = Window.orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = y.select(
        time_col,
        value_col,
        "t",
        F.sum("_y").over(w_cum).cast("bigint").alias("_cum"),
    )
    return c.select(
        time_col,
        value_col,
        "t",
        (F.col("_cum") - F.least(F.lit(0), F.min("_cum").over(w_cum)))
        .alias("s_up"),
        (F.greatest(F.lit(0), F.max("_cum").over(w_cum)) - F.col("_cum"))
        .alias("s_dn"),
    )


def acf_exact(
    grain: DataFrame,
    time_col: str = "h",
    x_col: str = "x",
    max_lag: int = 6,
) -> DataFrame:
    """Per-lag autocorrelation over an ordered grain, exactly: for
    each lag k the (x_t, x_{t+k}) pairs come from a row-number
    self-join against a dense 1..max_lag lag spine, and every
    sufficient statistic per lag (pair count, both margin sums, both
    squared sums, the cross sum) is an exact DECIMAL(38,0) integer —
    r_k = (n_k*Sxy - Sx*Sy) / sqrt((n_k*Sxx - Sx^2) * (n_k*Syy -
    Sy^2)), the Pearson-per-lag cross-correlation convention (each
    lag's pairs standardized by their own moments, the form that is
    exactly computable; the fixed-global-mean textbook ACF differs by
    O(k/n) edge terms). Input must be the aggregated grain (one row
    per bucket, exact integer value); gaps in the grain are treated
    as adjacent rows (lead-by-rows, not lead-by-time) — gapfill first
    if calendar lags are wanted. Returns max_lag rows: lag, n_pairs,
    acf (raw double).

    Scale shape: the row_number window and the self-join run over
    grain rows x max_lag — grain-bounded, never fact-bounded.
    Overflow: n_k*Sxx <= n^2*x_max^2 — 10^5 hourly buckets at 10^9
    events/hour is 10^28, inside DECIMAL(38,0)."""
    spark = grain.sparkSession
    w = Window.orderBy(time_col)
    r = grain.select(
        F.row_number().over(w).alias("_rn"),
        F.col(x_col).cast("decimal(19,0)").alias("_x"),
    ).localCheckpoint(eager=True)
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = r.select(F.col("_rn").alias("_ra"), F.col("_x").alias("_xa"))
    b = r.select(F.col("_rn").alias("_rb"), F.col("_x").alias("_xb"))
    pairs = a.crossJoin(F.broadcast(lags)).join(
        F.broadcast(b), F.col("_rb") == F.col("_ra") + F.col("lag")
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("_n"),
        F.sum("_xa").cast("decimal(38,0)").alias("_sx"),
        F.sum("_xb").cast("decimal(38,0)").alias("_sy"),
        F.sum((F.col("_xa") * F.col("_xa")).cast("decimal(38,0)")).alias(
            "_sxx"
        ),
        F.sum((F.col("_xb") * F.col("_xb")).cast("decimal(38,0)")).alias(
            "_syy"
        ),
        F.sum((F.col("_xa") * F.col("_xb")).cast("decimal(38,0)")).alias(
            "_sxy"
        ),
    )
    return mom.select(
        "lag",
        F.col("_n").cast("bigint").alias("n_pairs"),
        (
            (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
            .cast("double")
            / F.sqrt(
                (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
                .cast("double")
                * (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
                .cast("double")
            )
        ).alias("acf"),
    ).orderBy("lag")


def holt_winters_forecast(
    events: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    season: int = 24,
    horizon: int = 24,
    ts_col: str = "ts",
) -> DataFrame:
    """HOLT-WINTERS additive triple exponential smoothing over the
    dense hourly event-count series, with an h-step forecast — the
    LEARNED forecaster next to the graded seasonal-naive baseline
    (that row answers "what does no-skill look like"; this one fits
    level + trend + a ``season``-slot seasonal profile and
    extrapolates ``horizon`` hours). Standard init: l₀ = mean of the
    first season, b₀ = (mean₂ − mean₁)/m, s_i = x_i − l₀; then per
    step l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1}+b_{t−1}),
    b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},
    s_t = γ(x_t − l_t) + (1−γ)s_{t−m}; forecast
    x̂_{n−1+h} = l + h·b + s_slot((n−1+h) mod m). Returns
    (h, hour_start, forecast) for h = 1..horizon.

    Exactness: counts are exact bigints on a DENSE spine (a missing
    hour is a true 0, not an absent row — the gap-fill module's
    charter); l₀/b₀ are single IEEE divisions of exact integer sums;
    every recurrence step is fixed-order IEEE +,−,× with
    driver-inlined α/β/γ and their complements (no libm at all), so
    the whole trajectory replays bit-for-bit cross-engine — DuckDB
    runs it as a recursive CTE carrying the seasonal LIST as a
    functional column (multi-field struct folds are the seam-#7
    trap; a recursive CTE sidesteps it, the unigram/FFD convention).

    Scale shape: the corpus collapses through ONE map-combinable
    hourly groupBy; everything after lives on the hours grain —
    the series is assembled into a single ordered array row
    (sort_array over (hour, x) structs) and the recurrence runs as
    ONE F.aggregate fold, O(n·m) scalar ops on that row (an
    11-year hourly series is 10⁵ steps — driver-trivial; for
    per-key fleets, run the same fold per key under groupBy). A
    series shorter than two seasons raises (the init needs both
    windows)."""
    m, hz = int(season), int(horizon)
    fin = _holt_winters_state(events, alpha, beta, gamma, m, ts_col)
    return (
        fin.select(
            "h1",
            "n",
            "l",
            "b",
            "seasons",
            "t",
            F.explode(F.sequence(F.lit(1), F.lit(hz))).alias("h"),
        )
        .select(
            F.col("h").cast("bigint").alias("h"),
            F.expr("h1 + make_interval(0, 0, 0, 0, h)").alias("hour_start"),
            F.round(_hw_forecast(F.col("h"), m), 6).alias("forecast"),
        )
        .orderBy("h")
    )


def _hw_forecast(h: Column, m: int) -> Column:
    """The Holt-Winters h-step-ahead forecast expression over the
    state columns (l, b, seasons, t): l + h·b + s_slot((t−1+h) mod
    m) — shared by the forecast and backtest rows so the IEEE op
    sequence is spelled once."""
    return (
        F.col("l")
        + h.cast("double") * F.col("b")
        + F.element_at(
            F.col("seasons"),
            ((F.col("t") - F.lit(1) + h) % F.lit(m)).cast("int") + F.lit(1),
        )
    )


def _dense_hourly(events: DataFrame, ts_col: str) -> DataFrame:
    """The dense hourly count series (hour_start, xi) — one
    map-combinable groupBy (checkpointed) + the spine left join; a
    missing hour is a true 0 (the gap-fill charter). Shared by the
    Holt-Winters state builder and the backtest's test slice.

    Deliberately NOT routed through :func:`bucketed_agg_gapfill`
    (r14 review, adjudicated): the values would match (time_bucket
    == date_trunc on hour grain), but two committed bit-replay
    oracles pin this exact expression chain incl. the eager
    checkpoint placement, and the gapfill operator carries per-key
    spine/LOCF machinery this single-series path doesn't want —
    spine-semantics changes over there must not silently reprice the
    forecast trajectory. Revisit only with a dedicated parity
    re-sweep."""
    hc = (
        events.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("hour_start")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    bounds = hc.agg(
        F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1")
    )
    spine = bounds.select(
        F.explode(
            F.expr("sequence(h0, h1, interval 1 hour)")
        ).alias("hour_start")
    )
    return spine.join(hc, "hour_start", "left").select(
        "hour_start",
        F.coalesce(F.col("c"), F.lit(0).cast("bigint")).alias("xi"),
    )


def _holt_winters_state(
    events: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    season: int,
    ts_col: str,
) -> DataFrame:
    """The fitted Holt-Winters state as ONE row (h1, n, l, b,
    seasons, t) — the recurrence core shared by
    :func:`holt_winters_forecast` and :func:`forecast_backtest_mae`
    (identical expression trees, so the trained trajectory is
    bit-identical whichever surface consumes it)."""
    m = int(season)
    a, b_, g = float(alpha), float(beta), float(gamma)
    na, nb, ng = 1.0 - a, 1.0 - b_, 1.0 - g
    xs = _dense_hourly(events, ts_col)
    one = xs.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("hour_start").alias("hs"),
                    F.col("xi").alias("xi"),
                    F.col("xi").cast("double").alias("x"),
                )
            )
        ).alias("arr"),
        F.max("hour_start").alias("h1"),
    )
    n_raw = F.size("arr").cast("bigint")
    n = F.when(n_raw >= F.lit(2 * m), n_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"holt_winters state: needs >= {2 * m} hours "
                    "(two full seasons) before the forecast/backtest "
                    "start; series has "
                ),
                n_raw.cast("string"),
            )
        )
    )
    sum1 = F.aggregate(
        F.slice("arr", 1, m),
        F.lit(0).cast("bigint"),
        lambda acc, e: acc + e["xi"],
    )
    sum2 = F.aggregate(
        F.slice("arr", m + 1, m),
        F.lit(0).cast("bigint"),
        lambda acc, e: acc + e["xi"],
    )
    l0 = sum1.cast("double") / F.lit(float(m))
    b0 = (sum2 - sum1).cast("double") / F.lit(float(m * m))
    prep = one.select(
        "arr",
        "h1",
        n.alias("n"),
        l0.alias("l0"),
        b0.alias("b0"),
        F.transform(
            F.slice("arr", 1, m), lambda e: e["x"] - l0
        ).alias("s0"),
    ).localCheckpoint(eager=True)

    def step(acc: Column, e: Column) -> Column:
        slot = (acc["t"] % F.lit(m)).cast("int")
        s_old = F.element_at(acc["seasons"], slot + F.lit(1))
        l_new = F.lit(a) * (e["x"] - s_old) + F.lit(na) * (
            acc["l"] + acc["b"]
        )
        b_new = F.lit(b_) * (l_new - acc["l"]) + F.lit(nb) * acc["b"]
        seasons_new = F.transform(
            acc["seasons"],
            lambda v, i: F.when(
                i == slot, F.lit(g) * (e["x"] - l_new) + F.lit(ng) * v
            ).otherwise(v),
        )
        return F.struct(
            (acc["t"] + F.lit(1)).alias("t"),
            l_new.alias("l"),
            b_new.alias("b"),
            seasons_new.alias("seasons"),
        )

    fin = prep.select(
        "h1",
        "n",
        F.aggregate(
            F.slice(
                "arr", m + 1, (F.col("n") - F.lit(m)).cast("int")
            ),
            F.struct(
                F.lit(m).cast("bigint").alias("t"),
                F.col("l0").alias("l"),
                F.col("b0").alias("b"),
                F.col("s0").alias("seasons"),
            ),
            step,
        ).alias("st"),
    )
    return fin.select(
        "h1",
        "n",
        F.col("st")["l"].alias("l"),
        F.col("st")["b"].alias("b"),
        F.col("st")["seasons"].alias("seasons"),
        F.col("st")["t"].alias("t"),
    ).localCheckpoint(eager=True)


def forecast_backtest_mae(
    events: DataFrame,
    split_ts: str = "2024-01-21",
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    season: int = 24,
    ts_col: str = "ts",
) -> DataFrame:
    """FORECAST BACKTEST A/B — Holt-Winters vs the seasonal-naive
    baseline, MAE on a held-out tail (the packer-A/B convention
    applied to forecasting): both models train on events before
    ``split_ts`` and predict every dense hour from the train end to
    the global series end; the readout is one row per model
    (model, n_test, mae), so the claim "the learned forecaster beats
    no-skill" is measured, not asserted. Holt-Winters predicts via
    :func:`_hw_forecast` over the shared fitted state
    (:func:`_holt_winters_state` — the SAME bit-replayed trajectory
    the forecast row grades); the baseline predicts each test hour by
    its hour-of-day's TRAIN mean over the dense train spine (exact
    integer sums, one division).

    Exactness: predictions are pinned doubles (the HW trajectory is
    libm-free; the naive mean is one IEEE division of exact ints);
    |error| terms are doubles, so each model's error sum folds
    through an ORDERED cumulative window over test hours read via
    max_by (double addition is not associative), and MAE is one
    final division by the exact test-hour count. Scale shape: two
    map-combinable hourly groupBys (train via the state builder,
    global via the shared dense series); the test slice is
    span-bounded; both prediction joins are broadcasts (1-row state;
    24-row hod means)."""
    m = int(season)
    split = F.lit(split_ts).cast("timestamp")
    tr = events.filter(F.col(ts_col) < split)
    st = _holt_winters_state(tr, alpha, beta, gamma, m, ts_col)
    dense = _dense_hourly(events, ts_col).localCheckpoint(eager=True)
    te = (
        dense.crossJoin(F.broadcast(st.select("h1")))
        .filter(F.col("hour_start") > F.col("h1"))
        .select(
            "hour_start",
            F.expr("timestampdiff(HOUR, h1, hour_start)")
            .cast("bigint")
            .alias("h"),
            F.col("xi").cast("double").alias("x"),
        )
    )
    hw = te.crossJoin(F.broadcast(st)).select(
        "hour_start",
        F.abs(F.col("x") - _hw_forecast(F.col("h"), m)).alias("err"),
    )
    # hod means come from the GLOBAL dense series sliced at the train
    # end — identical to the train spine (the global spine starts at
    # the same first event) without a third hourly groupBy+checkpoint
    # (r14 review finding; the docstring's "two groupBys" is now true)
    hod = (
        dense.crossJoin(F.broadcast(st.select(F.col("h1").alias("_trh1"))))
        .filter(F.col("hour_start") <= F.col("_trh1"))
        .groupBy(F.hour("hour_start").alias("hod"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_h"),
            F.sum("xi").cast("bigint").alias("sum_h"),
        )
    )
    nv = te.join(
        F.broadcast(hod), F.hour(te["hour_start"]) == hod["hod"]
    ).select(
        "hour_start",
        F.abs(
            F.col("x")
            - F.col("sum_h").cast("double") / F.col("n_h").cast("double")
        ).alias("err"),
    )

    def mae_of(errs: DataFrame, model: str) -> DataFrame:
        w = Window.orderBy("hour_start")
        cum = errs.select(
            F.row_number().over(w).alias("_rn"),
            F.sum("err").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("_cum"),
        )
        return cum.agg(
            F.lit(model).alias("model"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.round(
                F.max_by("_cum", "_rn")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mae"),
        )
    return (
        mae_of(hw, "holt_winters")
        .unionByName(mae_of(nv, "seasonal_naive"))
        .orderBy("model")
    )
