"""Z-order (Morton-curve) file layout for multi-dimensional scan pruning.

Partition pruning handles ONE dimension well (the directory key); real
100 TB tables are probed on several (tenant AND time AND value band).
Sorting the file layout by an interleaved-bit z-value makes files
locality-preserving in EVERY interleaved dimension at once, so parquet
min/max footer stats prune a box predicate's scan set in all of them —
the same lever as Delta/Iceberg ``OPTIMIZE ZORDER BY`` (public docs;
Morton 1966), re-expressed as plain Spark: a pure-Column z-value +
``repartitionByRange`` + ``sortWithinPartitions``.

Everything here is JVM-side bit arithmetic (shift/and/or Column
expressions) — no UDFs; the write is one range shuffle, the same cost
any clustered rewrite pays, and reads need NO library support (plain
``spark.read.parquet`` + pushed filters benefit from the tighter
footers).

Scale shape: ``bits`` bounds the interleave depth (8 bits/dim × 2 dims
→ 16-bit z-values), values are first clamped into [lo, hi] fixed
ranges supplied by the caller (data-independent, so incremental
appends z-sort identically without a global rescan; pair with
stores.publish_store for atomic relayout)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "zvalue_expr",
    "write_zordered",
    "file_skip_report",
    "zvalue_py",
]


def _bucket_expr(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp to [lo, hi] and scale to an unsigned ``bits``-bit integer.
    Fixed data-independent ranges keep the mapping stable under
    appends; NULLs map to bucket 0 (the canonical 'lowest' cell)."""
    cells = (1 << bits) - 1
    frac = (F.coalesce(col.cast("double"), F.lit(float(lo))) - F.lit(float(lo))) / F.lit(
        float(hi) - float(lo)
    )
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * cells).cast("bigint")


def zvalue_expr(
    cols: Sequence[tuple[Column | str, float, float]],
    bits: int = 8,
) -> Column:
    """Morton z-value of n ``(column, lo, hi)`` dimensions as ONE
    BIGINT Column: bit i of dimension d lands at position
    ``i * n + d``. Pure shift/and/or arithmetic — whole-stage codegen,
    no Python. ``bits * len(cols)`` must fit a signed 64-bit value."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 dimensions")
    if bits * n > 62:
        raise ValueError(f"{bits} bits × {n} dims overflows BIGINT")
    bucketed = [
        _bucket_expr(F.col(c) if isinstance(c, str) else c, lo, hi, bits)
        for (c, lo, hi) in cols
    ]
    z = F.lit(0).cast("bigint")
    for d, b in enumerate(bucketed):
        for i in range(bits):
            z = z.bitwiseOR(
                b.bitwiseAND(F.lit(1 << i).cast("bigint"))
                .cast("bigint")
                * F.lit(1 << (i * (n - 1) + d)).cast("bigint")
            )
    return z


def zvalue_py(values: Sequence[float], ranges: Sequence[tuple[float, float]], bits: int = 8) -> int:
    """Driver-side reference implementation (tests pin the Column
    expression against this)."""
    n = len(values)
    cells = (1 << bits) - 1
    z = 0
    for d, (v, (lo, hi)) in enumerate(zip(values, ranges)):
        frac = 0.0 if v is None else (float(v) - lo) / (hi - lo)
        frac = min(max(frac, 0.0), 1.0)
        b = int(frac * cells)
        for i in range(bits):
            z |= ((b >> i) & 1) << (i * n + d)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, float, float]],
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Cluster ``df`` along the z-curve of ``cols`` and write parquet:
    one range shuffle on the z-value (``repartitionByRange`` samples
    the distribution, so files get ~equal rows, skew-proof) + an
    in-partition sort to tighten per-ROW-GROUP footers too. The
    z-value itself is dropped before writing — it is a layout key,
    not data."""
    z = zvalue_expr([(c, lo, hi) for (c, lo, hi) in cols], bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(int(num_files), F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_report(
    spark: SparkSession,
    path: str,
    box: dict[str, tuple[float, float]],
) -> dict:
    """Metadata-only pruning audit: read each parquet footer's per-file
    min/max for the box columns and count the files whose stats
    OVERLAP the box — the files any stats-aware reader (Spark's parquet
    filter pushdown, Delta/Iceberg data skipping) must scan; the rest
    are skipped without touching data pages. Returns
    ``{files_total, files_scanned, skip_fraction}``. Driver-side
    footer reads only (the same class of metadata op as
    tables.fs_file_bytes)."""
    import pyarrow.parquet as pq_meta

    from ydb_vector_search_demo_spark.sources.tables import fs_file_bytes

    files = [
        p.removeprefix("file:")
        for p, _ in fs_file_bytes(spark, path)
        if p.endswith(".parquet")
    ]
    total, scanned = 0, 0
    for f in files:
        meta = pq_meta.read_metadata(f)
        total += 1
        names = {c: i for i, c in enumerate(meta.schema.names)}
        overlap = True
        for col, (lo, hi) in box.items():
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = None, None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins is None:
                continue  # no stats → must scan; stay conservative
            if min(mins) > hi or max(maxs) < lo:
                overlap = False
                break
        scanned += 1 if overlap else 0
    return {
        "files_total": total,
        "files_scanned": scanned,
        "skip_fraction": round(1.0 - scanned / total, 4) if total else 0.0,
    }
