"""As-of (nearest-preceding-event) join — a time-series operator the
reference does not have (its data model is point-query request/response,
SURVEY.md §1.1) but any event-pipeline engine needs; north-star scope.

Spark has no ASOF JOIN operator, so this is the classic scalable
re-expression as a composition of built-ins (SURVEY.md custom-operator
rule (a)): union both sides tagged, one window per key ordered by time,
last-non-null carry-forward of the right side's payload. Exactly ONE
shuffle (hash partition by key), no range-condition join that would
explode to a broadcast-nested-loop, no per-key collect. At 100 TB this
is the same plan a hand-written merge join would want: co-partition by
key, locally sort by time, stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    right_value_cols: list[str],
    inclusive: bool = True,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    timestamp <= the left timestamp (``direction='backward'``, the
    default) or the smallest timestamp >= it (``'forward'``);
    ``inclusive=False`` makes the comparison strict. Right payload
    columns come back null when no match.

    ``tolerance_seconds`` bounds the match window (the pandas
    merge_asof ``tolerance`` semantic): a matched right row farther
    than the tolerance from the left timestamp is treated as NO match
    (payload nulls) — "the next purchase, but only if it happened
    within 30 minutes". Applied as a post-window conditional on the
    single carried struct, so the one-shuffle sweep is unchanged.

    The right side must be unique per (key, ts) — pre-aggregate it if it
    is not, or the carried value is order-dependent.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    tag = "_is_left"
    payload = "_rpayload"
    ts = "_ts"

    l_side = left.select(
        F.col(key_col).alias(key_col),
        F.col(left_ts_col).alias(ts),
        F.lit(1).alias(tag),
        F.lit(None).cast(
            right.select(F.struct(right_ts_col, *right_value_cols)).schema[0].dataType
        ).alias(payload),
        F.struct(*left.columns).alias("_lrow"),
    )
    r_side = right.select(
        F.col(key_col).alias(key_col),
        F.col(right_ts_col).alias(ts),
        F.lit(0).alias(tag),
        F.struct(right_ts_col, *right_value_cols).alias(payload),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns)).schema[0].dataType)
        .alias("_lrow"),
    )

    # At equal timestamps the right row must sort before the left row for
    # inclusive semantics (so the window sees it), after it for strict.
    # 'forward' is the same sweep over time reversed: descending order,
    # so "last right seen" is the earliest right at-or-after the left row.
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    tag_order = F.col(tag).asc() if inclusive else F.col(tag).desc()
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_order, tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_side.unionByName(r_side).withColumn(
        "_matched", F.last(payload, ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        gap_us = F.abs(
            F.unix_micros(F.col(ts))
            - F.unix_micros(F.col("_matched")[right_ts_col])
        )
        merged = merged.withColumn(
            "_matched",
            F.when(
                gap_us <= F.lit(int(tolerance_seconds) * 1_000_000),
                F.col("_matched"),
            ),
        )
    out = merged.filter(F.col(tag) == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        F.col("_matched")[right_ts_col].alias(f"matched_{right_ts_col}"),
        *[F.col("_matched")[c].alias(f"matched_{c}") for c in right_value_cols],
    )
    return out


def gap_seconds(left_ts: Column | str, right_ts: Column | str) -> Column:
    """Whole seconds between a left timestamp and its matched right one
    (exact integer micros arithmetic, no float epoch math)."""
    lt = F.col(left_ts) if isinstance(left_ts, str) else left_ts
    rt = F.col(right_ts) if isinstance(right_ts, str) else right_ts
    return ((F.unix_micros(lt) - F.unix_micros(rt)) / F.lit(1_000_000)).cast("bigint")
