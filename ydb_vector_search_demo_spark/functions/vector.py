"""Dense-vector distance/similarity expressions (SURVEY.md §2.2 V3).

The reference delegates distance computation to the store's server-side
``Knn::*`` functions behind ``similarity_search_by_vector_with_score``
(/root/reference/app.py:124); its public strategy surface offers cosine
similarity/distance, inner product, Euclidean and Manhattan. Here each
metric is a pure Column expression built from Spark's higher-order array
functions (``zip_with``/``aggregate``/``transform``) — JVM-side, no UDF,
fully inside whole-stage codegen, so a distance scan over 100 TB of
``ARRAY<FLOAT>`` never leaves Tungsten.

All math is done in DOUBLE regardless of the storage element type
(float32 on disk) so results are reproducible against the DuckDB oracle
(SURVEY.md §7.4): elements are cast to double *before* any arithmetic,
and folds run sequentially left-to-right, matching DuckDB's list
functions to the last ulp in practice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(col: ColumnOrName) -> Column:
    """Cast array<float> → array<double> element-wise (no-op on doubles)."""
    return _c(col).cast("array<double>")


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Inner product ⟨a,b⟩ as a sequential left-to-right double fold."""
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def l1_norm(a: ColumnOrName) -> Column:
    arr = F.transform(to_double_array(a), lambda x: F.abs(x))
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """NULL when either vector has zero norm — a plain division would be
    an ANSI DIVIDE_BY_ZERO *error* under Spark 4, so one degenerate
    embedding in a 100 TB corpus would kill the whole scan. Top-k code
    sorts nulls last (knn_scores), matching DuckDB where 0/0 → NaN
    sorts last ascending."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """1 - cosine similarity. Lower is better — the reference's score
    convention (lower = more relevant, /root/reference/static/js/script.js:222)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def euclidean_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    diffs = F.zip_with(
        to_double_array(a), to_double_array(b), lambda x, y: (x - y) * (x - y)
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def manhattan_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    diffs = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: F.abs(x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def inner_product_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Negated inner product, so that for every metric 'lower is better'
    holds and top-k code can uniformly sort ascending."""
    return -dot(a, b)


# Metric registry: name -> (distance_expr, lower_is_better is always True)
METRICS = {
    "cosine": cosine_distance,
    "euclidean": euclidean_distance,
    "manhattan": manhattan_distance,
    "inner_product": inner_product_distance,
}


def distance(a: ColumnOrName, b: ColumnOrName, metric: str = "cosine") -> Column:
    """Distance under the named metric; ascending order == most similar first.

    Mirrors the pluggable-strategy requirement of SURVEY.md §7.4 (the
    reference deployment yields a distance — lower is better)."""
    try:
        return METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(METRICS)}") from None


def portable_embed_expr(col: ColumnOrName, dim: int = 8) -> Column:
    """Engine-portable text embedding (determinization harness, the
    md5-family pattern of dedup.minhash_dedup_pairs_portable applied to
    dense vectors): dimension ``i`` is md5(f"{i}:" + text)'s leading 8
    hex digits scaled to [-1, 1) — ``conv`` here, ``('0x'||hex)::BIGINT``
    in DuckDB, bit-identical — so a chunk → embed → score → reduce
    dataflow can run under a FULL SQL oracle. NOT a semantic model: the
    pandas-UDF model seam (pipeline.rag.embed_texts_udf) stays the
    production path; this exercises the distributed plumbing with an
    embedding both engines recompute independently. Pure Columns —
    ``dim`` md5 calls per row inside whole-stage codegen, no Python."""
    c = _c(col)
    dims = [
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), c)), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
        * F.lit(2.0)
        - F.lit(1.0)
        for i in range(dim)
    ]
    return F.array(*dims)


def portable_embed(text: str, dim: int = 8) -> list[float]:
    """Driver-side twin of :func:`portable_embed_expr` (hashlib md5,
    same scale arithmetic in the same order) for inlining query vectors
    as plan/SQL literals."""
    import hashlib

    return [
        int(hashlib.md5(f"{i}:{text}".encode("utf-8")).hexdigest()[:8], 16)
        / 4294967296.0
        * 2.0
        - 1.0
        for i in range(dim)
    ]
