"""Skew-mitigation helpers.

AQE's skew-join handling (on by default in session.get_spark) splits
oversized shuffle partitions at runtime, which covers sort-merge joins.
Explicit salting remains the tool for the cases AQE can't fix: a
shuffle-join or aggregation where one key dominates so heavily that a
single task would still own it after splitting — the classic hot-user /
hot-shingle problem in event and dedup pipelines at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    salt_src: Column | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the fact side's hot keys are spread over
    ``n_salts`` sub-keys and the (small) dim side is replicated once per
    salt, so no single reducer owns a hot key.

    ``salt_src`` must be a column that varies within a key (an event id,
    a line number …) — the salt is a deterministic hash of it, keeping
    the operator reproducible. Result set is identical to
    ``fact.join(dim, key_col, how)``; cost is ``n_salts``× the dim size
    (choose a dim small enough that replication is cheap — that is the
    regime where salting beats AQE splitting).
    """
    src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    salted_fact = fact.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(n_salts)))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")
    ).alias("_salt")
    salted_dim = dim.select("*", salts)
    return (
        salted_fact.join(salted_dim, [key_col, "_salt"], how).drop("_salt")
    )
