"""Mergeable sketches for 100 TB-scale approximate analytics: a
HyperLogLog distinct counter and a Count-Min frequency sketch, both
built from engine-portable md5 hashing so every register / counter —
and therefore the final estimate — is recomputable by any SQL engine
(the determinization pattern of dedup.minhash_dedup_pairs_portable,
applied to sketch state instead of pair generation).

Not in the reference's surface (its engine delegates all aggregation
to YDB, /root/reference/app.py:124); required by the north-star
extension scope (BASELINE.json): a training-data pipeline counts
distinct users/documents and finds heavy hitters constantly, and at
100 TB a `count(DISTINCT x)` is a full shuffle of x while the HLL is
a map-side-combinable max over (group, register) pairs — the shuffle
carries at most ``groups x m`` rows no matter how many events feed it.

Why not Spark's built-in ``approx_count_distinct``: the built-in is
the right production call, but its HLL++ register state is
engine-private, so a row using it can never be value-checked against
an independent oracle (events_approx_distinct stays rows-only for
exactly that reason). This module trades a few percent of accuracy
for a sketch BOTH engines can replay bit-for-bit:

- register index = first 16 hash bits (mod m; 2**16 % m == 0 keeps it
  uniform), rank = leading-zero count of the next 48 bits + 1,
  computed entirely in hex-string space (regexp strip of leading '0'
  digits + a 4-way CASE on the first nonzero hex digit) — no floats,
  no engine-specific bit intrinsics;
- the harmonic sum is kept INTEGER: sum(2^(49 - rank)) fits in int64
  (m * 2**49 = 2**58), so partial-aggregation order can never change
  a bit; the single float division happens once, at the very end.

Flajolet et al. 2007 (HyperLogLog) for the estimator and the
small-range linear-counting correction; Cormode & Muthukrishnan 2005
for Count-Min's one-sided (never-underestimate) guarantee.

All pure Column expressions — md5 / substring / regexp / CASE inside
whole-stage codegen; no Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers -> rsd ~ 1.04/sqrt(512) ~ 4.6%
_RANK_HEX = 12  # 48-bit rank window; max rank 49
_MAX_RANK = 4 * _RANK_HEX + 1
# Scaled harmonic-sum exponent: term = 2^(_MAX_RANK - rank), an exact
# int64 (max m * 2^49 = 2^58 < 2^63).
_SCALE = float(1 << _MAX_RANK)

# The single float in the whole estimator: alpha_m * m^2 * 2^_MAX_RANK,
# precomputed once and inlined as the SAME literal into the Column code
# and the oracle SQL, so the one double division is bit-identical in
# both engines (integer-in, IEEE-divide, integer divisor).
_EST_NUMERATOR = (0.7213 / (1.0 + 1.079 / HLL_M)) * (HLL_M * HLL_M) * _SCALE

# The first nonzero hex digit pins the leading-zero count within its
# own 4 bits: 8-f -> 0, 4-7 -> 1, 2-3 -> 2, 1 -> 3.
_HEX_LZ = (("8", "9", "a", "b", "c", "d", "e", "f"), ("4", "5", "6", "7"), ("2", "3"))


def hll_register_expr(col: ColumnOrName) -> tuple[Column, Column]:
    """(register index, rank) Columns for one value — the map-side
    half of the sketch. md5 over the value's canonical string form;
    both pieces are pure hex-string arithmetic either engine replays."""
    hx = F.md5(_c(col).cast("string"))
    reg = (F.conv(F.substring(hx, 1, 4), 16, 10).cast("bigint") % HLL_M).cast("int")
    stripped = F.regexp_replace(F.substring(hx, 5, _RANK_HEX), "^0+", "")
    r = F.length(stripped)
    d1 = F.substring(stripped, 1, 1)
    lzd = (
        F.when(d1.isin(*_HEX_LZ[0]), 0)
        .when(d1.isin(*_HEX_LZ[1]), 1)
        .when(d1.isin(*_HEX_LZ[2]), 2)
        .otherwise(3)
    )
    rank = F.when(r == 0, F.lit(_MAX_RANK)).otherwise(
        (F.lit(_RANK_HEX) - r) * 4 + lzd + 1
    )
    return reg, rank.cast("int")


def hll_registers(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Sketch state per key group: max rank per (keys..., register).
    This is the ONLY shuffle — partial max combines map-side, so at
    most ``groups x HLL_M`` rows cross the wire regardless of input
    size. The state is mergeable (max is associative/commutative),
    so shards/streams union then re-max."""
    reg, rank = hll_register_expr(value_col)
    return (
        df.select(*keys, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*keys, "reg")
        .agg(F.max("rank").alias("mrank"))
    )


def hll_estimate(regs: DataFrame, keys: list[str], out: str = "hll_estimate") -> DataFrame:
    """Estimate per key group from register state. Integer internals
    (``raw_sum``, ``n_regs``) are exposed so an oracle can check the
    sketch bit-for-bit, not just the rounded estimate. Small-range
    linear-counting correction per Flajolet et al. 2007 fig. 3."""
    agg = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_regs"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_MAX_RANK} - mrank)"))
        .cast("bigint")
        .alias("raw_sum"),
    )
    # Empty registers contribute 2^-0 = 1 to the harmonic sum — scaled,
    # 2^_MAX_RANK each. full_sum stays int64 (max m * 2^49 = 2^58).
    n_empty = F.lit(HLL_M) - F.col("n_regs")
    full_sum = F.col("raw_sum") + n_empty.cast("bigint") * F.lit(1 << _MAX_RANK)
    est_raw = F.lit(_EST_NUMERATOR) / full_sum
    corrected = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (n_empty > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / n_empty),
    ).otherwise(est_raw)
    return agg.select(
        *keys,
        F.round(corrected, 2).alias(out),
        F.col("raw_sum"),
        F.col("n_regs"),
    )


def hll_oracle_cte(
    table: str, key_sql: str, value_sql: str, out: str = "hll_estimate"
) -> str:
    """DuckDB replay of hll_registers + hll_estimate over ``table``,
    as a SQL fragment ``SELECT {key_sql}, {out}, raw_sum, n_regs``.
    Kept beside the Column code so the two halves of the contract
    cannot drift apart silently."""
    return f"""
    WITH __h AS (
      SELECT {key_sql} AS k, md5(CAST({value_sql} AS VARCHAR)) AS hx
      FROM {table}
    ), __b AS (
      SELECT k,
             CAST(('0x' || substr(hx, 1, 4))::BIGINT % {HLL_M} AS INTEGER) AS reg,
             regexp_replace(substr(hx, 5, {_RANK_HEX}), '^0+', '') AS s
      FROM __h
    ), __r AS (
      SELECT k, reg,
             CASE WHEN length(s) = 0 THEN {_MAX_RANK}
                  ELSE ({_RANK_HEX} - length(s)) * 4
                       + CASE WHEN substr(s, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
                              WHEN substr(s, 1, 1) IN ('4','5','6','7') THEN 1
                              WHEN substr(s, 1, 1) IN ('2','3') THEN 2
                              ELSE 3 END + 1 END AS rank
      FROM __b
    ), __regs AS (
      SELECT k, reg, max(rank) AS mrank FROM __r GROUP BY k, reg
    ), __agg AS (
      SELECT k,
             CAST(count(*) AS BIGINT) AS n_regs,
             CAST(sum(CAST(1 AS BIGINT) << ({_MAX_RANK} - mrank)) AS BIGINT) AS raw_sum
      FROM __regs GROUP BY k
    ), __est AS (
      SELECT k, n_regs, raw_sum,
             CAST({_EST_NUMERATOR!r} AS DOUBLE)
               / (raw_sum + CAST({HLL_M} - n_regs AS BIGINT) * CAST({1 << _MAX_RANK} AS BIGINT)) AS est_raw
      FROM __agg
    )
    SELECT k,
           round(CASE WHEN est_raw <= {2.5 * HLL_M!r} AND ({HLL_M} - n_regs) > 0
                      THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - n_regs))
                      ELSE est_raw END, 2) AS {out},
           raw_sum, n_regs
    FROM __est
    """


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------
# The quantile member of the mergeable-sketch family (HLL = distinct,
# CMS = frequency, histogram = rank): equi-width integer bin counts over
# a declared [lo, hi) domain. One map-side-combinable pass, state
# bounded by nbins per group, merge = bin-wise sum, quantile error
# bounded by one bin width. The production alternative
# (approx_percentile's KLL/GK summary) is engine-private state — like
# HLL++, unverifiable by an independent oracle; this trades adaptivity
# (fixed domain, declared up front or taken from a prior min/max pass)
# for a sketch any engine replays exactly: bin = floor(value/width)
# clamped, every count an integer, the estimate a bin edge.


def hist_bin_expr(col: ColumnOrName, lo: float, hi: float, nbins: int) -> Column:
    """Clamped equi-width bin index in [0, nbins)."""
    width = (hi - lo) / nbins
    raw = F.floor((_c(col) - F.lit(lo)) / F.lit(width)).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw))


def hist_counts(
    df: DataFrame, keys: list[str], value_col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Sketch state: (keys..., bin, cnt) — at most ``groups x nbins``
    rows cross the shuffle regardless of input size."""
    return (
        df.select(*keys, hist_bin_expr(value_col, lo, hi, nbins).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    keys: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Quantile estimates from histogram state: for each q, the upper
    edge of the first bin whose cumulative count reaches ceil(q * N) —
    the percentile_disc rank rule, so the answer is within one bin
    width of the exact quantile (law in tests/test_sketch.py). Pure
    integer cumulative sums; the only floats are the bin edges."""
    from pyspark.sql import Window

    width = (hi - lo) / nbins
    w = Window.partitionBy(*keys).orderBy("bin")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*keys))
    )
    aggs = [F.max("n").cast("bigint").alias("n_rows")]
    for q in qs:
        thresh = F.ceil(F.lit(q) * F.col("n"))
        edge = (F.col("bin") + 1) * F.lit(width) + F.lit(lo)
        aggs.append(
            F.min(F.when(F.col("cum") >= thresh, edge)).alias(
                f"p{int(round(q * 100))}_est"
            )
        )
    return cum.groupBy(*keys).agg(*aggs)


def hist_quantiles_oracle_cte(
    table: str,
    key_sql: str,
    value_sql: str,
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int,
) -> str:
    """DuckDB replay of hist_counts + hist_quantiles: fragment
    ``SELECT k, n_rows, p*_est...``."""
    width = (hi - lo) / nbins
    est_cols = ", ".join(
        f"min(CASE WHEN cum >= ceil({q!r} * n) THEN (bin + 1) * {width!r} + {lo!r} END) AS p{int(round(q * 100))}_est"
        for q in qs
    )
    return f"""
    WITH __hb AS (
      SELECT {key_sql} AS k,
             greatest(0, least({nbins - 1},
               CAST(floor(({value_sql} - {lo!r}) / {width!r}) AS INTEGER))) AS bin
      FROM {table}
    ), __hc AS (
      SELECT k, bin, CAST(count(*) AS BIGINT) AS cnt FROM __hb GROUP BY k, bin
    ), __cum AS (
      SELECT k, bin, cnt,
             sum(cnt) OVER (PARTITION BY k ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY k) AS n
      FROM __hc
    )
    SELECT k, CAST(max(n) AS BIGINT) AS n_rows, {est_cols}
    FROM __cum GROUP BY k
    """


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024  # 2**32 % 1024 == 0 keeps the 32-bit hash slice uniform


def cms_bucket_expr(col: ColumnOrName, depth: int) -> Column:
    """Row ``depth``'s bucket for one value: independent hash family
    member i is md5 prefixed with ``f"{i}:"`` (the minhash family
    convention), first 8 hex digits mod width."""
    hx = F.md5(F.concat(F.lit(f"{depth}:"), _c(col).cast("string")))
    return (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint") % CMS_WIDTH
    ).cast("int")


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """The sketch: (depth, bucket, cnt) with at most DEPTH x WIDTH
    rows — 4096 counters summarizing any number of input events. The
    explode multiplies rows by DEPTH map-side, but partial sums
    combine before the (depth, bucket) shuffle, so the wire cost is
    bounded by the counter table, not the input. Mergeable: union
    two sketches and re-sum."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"), cms_bucket_expr(key_col, i).alias("bucket")
            )
            for i in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(cms: DataFrame, candidates: DataFrame, key_col: str) -> DataFrame:
    """Point-estimate every candidate key: min over the DEPTH row
    counters (Cormode & Muthukrishnan 2005 — one-sided error, the
    estimate NEVER undercounts, so a heavy-hitter scan over
    candidates has no false negatives). The sketch side is <= 4096
    rows — broadcast; candidates never shuffle."""
    probes = candidates.select(
        key_col,
        *[cms_bucket_expr(key_col, i).alias(f"b{i}") for i in range(CMS_DEPTH)],
    )
    out = probes
    for i in range(CMS_DEPTH):
        side = F.broadcast(
            cms.where(F.col("depth") == i).select(
                F.col("bucket").alias(f"b{i}"), F.col("cnt").alias(f"c{i}")
            )
        )
        out = out.join(side, f"b{i}", "left")
    est = F.least(*[F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(CMS_DEPTH)])
    return out.select(key_col, est.cast("bigint").alias("cms_cnt"))


def cms_oracle_cte(table: str, key_sql: str) -> str:
    """DuckDB replay of cms_build + cms_estimate over every distinct
    key of ``table``: fragment ``SELECT k, cms_cnt``."""
    branches = "\nUNION ALL\n".join(
        f"SELECT {i} AS depth, CAST(('0x' || substr(md5('{i}:' || CAST({key_sql} AS VARCHAR)), 1, 8))::BIGINT % {CMS_WIDTH} AS INTEGER) AS bucket FROM {table}"
        for i in range(CMS_DEPTH)
    )
    probe_mins = ", ".join(
        f"(SELECT cnt FROM __cms WHERE depth = {i} AND bucket = CAST(('0x' || substr(md5('{i}:' || CAST(__cand.k AS VARCHAR)), 1, 8))::BIGINT % {CMS_WIDTH} AS INTEGER))"
        for i in range(CMS_DEPTH)
    )
    return f"""
    WITH __pairs AS (
      {branches}
    ), __cms AS (
      SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM __pairs GROUP BY depth, bucket
    ), __cand AS (
      SELECT DISTINCT {key_sql} AS k FROM {table}
    )
    SELECT k, CAST(least({probe_mins}) AS BIGINT) AS cms_cnt
    FROM __cand
    """
