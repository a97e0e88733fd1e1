"""Skew handling for shuffle joins and a skew diagnostic.

Not in the reference's surface (its joins happen inside YDB,
/root/reference/app.py:124); required by the 100 TB posture: a fact
table whose join key is Zipf-distributed sends whole key-populations
to single reduce tasks, and the straggler IS the job's wall clock.

The toolbox, in preference order:

1. ``F.broadcast(dim)`` — when the dim side fits in memory; no shuffle
   of the fact at all. Used throughout this repo (knn batches, CMS
   lookups, decontamination hash sets).
2. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on by
   default in session.get_spark) — runtime splitting of oversized
   partitions; free, but only kicks in past size thresholds and only
   for sort-merge joins.
3. ``salted_join`` (this module) — explicit fan-out when the dim is
   too big to broadcast AND the key histogram is degenerate enough
   (a handful of keys carrying most rows) that even AQE's split still
   leaves one key in one task: the fact side gets a DETERMINISTIC
   salt in [0, n_salt) derived from a per-row column, the dim side is
   replicated n_salt times, and the join key becomes (key, salt) — so
   one hot key spreads over n_salt reduce tasks at the price of
   n_salt x |dim| replicated rows.

``skew_report`` quantifies whether you need any of this: per-key row
share + the p99/median partition-size proxy a planner would look at.

Salt determinism: pmod(xxhash64(salt_by), n_salt) — reproducible
across runs/engines-with-the-same-hash, never a ``rand()`` (which
would break retry idempotence and any oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt_by: str, n_salt: int) -> DataFrame:
    """Deterministic salt in [0, n_salt) from an existing column
    (ideally unique-ish: an id, never the skewed key itself)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salt)).cast("int")
    )


def replicate_for_salt(dim: DataFrame, n_salt: int) -> DataFrame:
    """Dim side of a salted join: one copy per salt value. The explode
    is map-side; the cost is n_salt x |dim| rows through the dim's
    (much smaller) shuffle."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias(SALT_COL)
    return dim.select("*", salts).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_by: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant shuffle join: equal row-for-row to
    ``fact.join(dim, on, how)`` (the equality law in
    tests/test_skew.py), but the shuffle key is (on..., salt), so a
    hot key's rows land on n_salt reduce tasks instead of one.

    ``how`` supports 'inner' and 'left' (a left row's salt always has
    a dim replica, so null-extension semantics are unchanged)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f = with_salt(fact, salt_by, n_salt)
    d = replicate_for_salt(dim, n_salt)
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)


def skew_report(df: DataFrame, key: str, top: int = 5) -> DataFrame:
    """Per-key skew diagnostic: the ``top`` heaviest keys as
    ``(key, n_rows, row_share)``. Under an unsalted shuffle a key's
    whole group lands on one reduce task, so ``row_share`` IS the
    straggler signal (share x shuffle-partition-count = how many
    task-equivalents that key monopolizes). One keyed count —
    map-side combinable, output bounded by ``top``."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "n_rows",
            F.round(F.col("n_rows") / F.col("t"), 6).alias("row_share"),
        )
        .orderBy(F.desc("n_rows"), key)
        .limit(top)
    )
