"""Parquet table sources (SURVEY.md §2.1 S2).

The reference's single source is a named vector-store table reached over
the network (/root/reference/app.py:29-42, table at :36). Our engine's
store is columnar Parquet: one directory per scale factor, one file per
table (TESTDATA.md / FIXTURES.md). ``spark.read.parquet`` gives us the
vectorized reader, column pruning and predicate pushdown for free; at
100 TB each "file" becomes a partitioned dataset and nothing here
changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that are always broadcast-join candidates.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        # events.parquet has shipped in two layouts: ts as
        # TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
        # read the raw int64 nanos under nanosAsLong and divide down to
        # micros) and ts as a plain TIMESTAMP(MICROS). Branch on the
        # actual on-disk type so both generations of testdata load to
        # the same TimestampType column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Coerce the events ``ts`` column to session-local TimestampType.

    * int64 (nanos read under ``nanosAsLong``) → ``timestamp_micros(ts
      div 1000)``. ``div`` is exact integer division; ``floor(ts/1000)``
      would go through DOUBLE and round the low microsecond digit at
      2^60-size nanos values.
    * TIMESTAMP_NTZ (micros parquet, isAdjustedToUTC=false) → cast to
      TimestampType. The harness runs UTC so the wall clock is
      preserved; downstream code (windows, watermarks, oracles) keeps
      seeing the same LTZ type it always has.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _size_bytes(conf_value: str) -> int:
    """Parse a Spark byte-size conf value ("134217728", "128m", "4MB")."""
    v = conf_value.strip().lower().removesuffix("b")
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(suffix):
            return int(float(v[:-1]) * mult)
    return int(v)


def estimate_scan_partitions(df: DataFrame) -> int | None:
    """Estimate how many partitions the file scan under ``df`` produces,
    from file sizes and the session's split confs — the same formula
    Spark's FilePartition packing uses (maxSplitBytes = min(
    maxPartitionBytes, max(openCostInBytes, bytesPerCore))). Pure
    metadata: ``inputFiles()`` + local stat, no RDD conversion, no job.
    Returns None for non-file relations or unstat-able files."""
    import os
    from urllib.parse import urlparse

    files = df.inputFiles()
    if not files:
        return None
    try:
        sizes = [os.path.getsize(urlparse(f).path or f) for f in files]
    except OSError:
        return None
    conf = df.sparkSession.conf
    max_bytes = _size_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    open_cost = _size_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    total = sum(sizes) + open_cost * len(sizes)
    bytes_per_core = total / max(parallelism, 1)
    max_split = max(1, min(max_bytes, max(open_cost, bytes_per_core)))
    # replay FilePartition's packing: split each file at max_split, sort
    # splits descending, pack greedily with open_cost padding per split
    chunks: list[int] = []
    for s in sizes:
        while s > max_split:
            chunks.append(max_split)
            s -= max_split
        chunks.append(s)
    chunks.sort(reverse=True)
    parts, current = 0, max_split + 1  # force-open on first chunk
    for c in chunks:
        if current + c > max_split:
            parts += 1
            current = 0
        current += c + open_cost
    return max(1, parts)


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition UP to the cluster's default parallelism
    when the underlying FILE SCAN arrives in fewer partitions.

    For compute-heavy per-row operators (minhash/simhash signatures,
    shingling, quality scoring) a small file count otherwise serializes
    the work: a 5 MB corpus sample reads as ONE partition → one core
    does all the hashing. The inserted shuffle moves only the raw input
    rows — orders of magnitude cheaper than the per-row work it
    parallelizes. At real scale the input already splits into >=
    defaultParallelism partitions and this is a no-op, so the big-data
    plan shape is unchanged.

    The width check is metadata-only (file sizes vs the session's split
    confs, :func:`estimate_scan_partitions`) — no ``df.rdd`` conversion,
    which would force full physical planning per call. Non-file
    relations (in-memory test frames, post-shuffle stages) pass through
    untouched: anything downstream of a shuffle already has
    ``spark.sql.shuffle.partitions`` partitions."""
    est = estimate_scan_partitions(df)
    if est is None:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if est < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used
    interchangeably with the DataFrame API (same names as the DuckDB
    oracle views)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def fs_file_bytes(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursive (file path, bytes) listing via the Hadoop FileSystem
    API — a pure metadata operation that works on ANY Hadoop FS (local,
    HDFS, S3A). ``os.walk`` silently totals 0 bytes for non-local
    paths, which would collapse a compaction's shuffle width to 1 and
    rewrite a whole store through a single task — the failure mode this
    helper exists to prevent (shared by ann.tree_leaf_stats /
    ann.ivf_leaf_stats and the compactors below)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    out = []
    while it.hasNext():
        f = it.next()
        out.append((f.getPath().toString(), int(f.getLen())))
    return out


def _parquet_bytes(spark: SparkSession, path: str) -> int:
    return sum(b for p, b in fs_file_bytes(spark, path) if p.endswith(".parquet"))


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the table-maintenance job every
    long-running ingest needs: rewrite a parquet dataset into
    ceil(total_bytes / target) files of roughly target size. Streaming
    sinks and incremental appends (e.g. ivf_append) accumulate small
    files; scan cost then becomes file-open-bound rather than
    byte-bound. Returns the output file count. Writes to ``out_path``
    (never in place — publish with ``stores.publish_store`` or the
    caller's metastore swap, exactly like a production compactor)."""
    import math

    total = _parquet_bytes(spark, path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(
        out_path
    )
    return n_files


def compact_partitioned_store(
    spark: SparkSession,
    path: str,
    out_path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Partition-preserving small-file compaction for the index-store
    layouts (IVF's ``centroid_id=``, the tree's ``cell_top=/cell_sub=``
    directories): streaming ingest and incremental appends leave one
    file per micro-batch per touched leaf, and probe cost becomes
    file-open-bound. Rewrite with one shuffle keyed by the partition
    columns so each leaf lands in few, right-sized files, keeping the
    directory layout (and therefore partition pruning) intact.
    Writes to ``out_path`` — publish with ``stores.publish_store`` or
    the caller's metastore swap, same contract as
    :func:`compact_parquet`. Returns the shuffle width used. Sizing
    uses the Hadoop FS listing (:func:`fs_file_bytes`), so the width
    is right on HDFS/S3 stores too, not only local paths."""
    import math

    total = _parquet_bytes(spark, path)
    width = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    (
        df.repartition(width, *[df[c] for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(out_path)
    )
    return width
