"""Every catalog query must execute and return a stable schema at the
smoke scale factor — including the rows-only entries (MLlib, xxhash64
signatures, mapInPandas, Structured Streaming) that the oracle-parity
test can't cover."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.plans.catalog import ORACLES, QUERIES

ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))
# queries whose result may legitimately be empty at sf0.001
MAY_BE_EMPTY = {
    "dedup_jaccard_pairs", "dedup_cosine_pairs", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_cosine_bucketed",
    # the two-nation pair filter finds no trade at the 150-order smoke
    # SF (oracle-verified 0 == 0 there; 14 rows at sf0.01 and sf0.1,
    # where the driver actually grades)
    "tpch_q7_nation_volume",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    rows = df.collect()
    assert df.schema.fields, f"{name}: empty schema"
    if name not in MAY_BE_EMPTY:
        assert len(rows) > 0, f"{name}: no rows at smoke sf"


def test_rows_only_set_is_intentional():
    assert ROWS_ONLY == [
        "ann_batch_recall",
        "ann_filtered_recall",
        "ann_graph_search_recall",
        "ann_ivf_build",
        "ann_ivf_recall",
        "ann_ivf_recall_sweep",
        "ann_ivfpq_recall",
        "ann_knn_graph_recall",
        "ann_knn_graph_refined",
        "ann_mutual_knn_multiprobe",
        "ann_opq_recall",
        "ann_pca_recall",
        "ann_pq_recall",
        "ann_quantized_recall",
        "ann_tree_recall",
        "dedup_clusters_lsh",
        "dedup_minhash_lsh",
        "dedup_semantic_stats",
        "dedup_simhash",
        "events_zorder_skip_report",
        "ingest_embed_roundtrip",
        "multimodal_embedding",
        "multimodal_union_search",
        "pq_codebook_drift",
        "pq_refit_lifecycle",
        "rag_chunk_maxp",
        "text_compression_quality",
        "text_tfidf_top_terms",
    ], f"unexpected rows-only queries: {ROWS_ONLY}"


def test_every_rows_only_row_documents_why():
    """r9 verdict task #5: each rows-only registration must carry its
    why-no-oracle reason ON the row (inspect.getdoc mentions
    'rows-only'/'rows only'), not only in a sibling's docstring or a
    section comment."""
    import inspect
    import re

    pat = re.compile(r"rows[- ]only", re.I)
    missing = [
        n for n in ROWS_ONLY
        if not pat.search(inspect.getdoc(QUERIES[n]) or "")
    ]
    assert not missing, f"rows-only rows without an on-row reason: {missing}"
