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
    # r11 (r10 verdict task #5): ingest_embed_roundtrip converted to a
    # full oracle (its readout is closed-form in the input — see the
    # registration comment). The remaining tail is DECLARED CLOSED:
    # every row below is rows-only by design, not by omission —
    # the ann_*_recall family REPORTS carry their own exact
    # brute-force ground truth inside the query (an oracle would
    # re-derive what the row already computes and compares);
    # dedup_minhash_lsh / dedup_simhash / dedup_clusters_lsh /
    # dedup_semantic_stats expose xxhash64/partition-order surfaces
    # whose deterministic cores are graded via the *_fixed twins;
    # text_tfidf_top_terms is the MLlib integration surface
    # (CountVectorizer's vocabulary order under frequency ties is
    # partition-order-dependent; its deterministic twin
    # text_tfidf_argmax is oracle-backed); multimodal_embedding /
    # multimodal_union_search exercise the library-gated codec seam
    # (their closed-form twins *_fixed are oracle-backed);
    # pq_codebook_drift / pq_refit_lifecycle / ann_ivf_build are
    # maintenance/report rows over trained state;
    # events_zorder_skip_report reads physical file-skip metrics;
    # rag_chunk_maxp / text_compression_quality wrap zlib/chunker
    # outputs whose pinned cores are graded via rag_chunk_maxp_fixed
    # and the quality oracles. Each row restates its own reason
    # on-row (guarded by test_every_rows_only_row_documents_why).
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


def test_r12_eligibility_ranking_names_are_registered():
    """The consolidated r12 rotation ranking at the catalog tail must
    name only registered, oracle-backed queries — a stale name in the
    rotation plan is exactly the docstring rot the eligibility notes
    exist to prevent."""
    import re

    import ydb_vector_search_demo_spark.plans.catalog as cat

    src = open(cat.__file__).read()
    block = src.split("r12 rotation-eligibility ranking")[1].split(
        "r11 wave 16"
    )[0]
    named = set(re.findall(r"\b([a-z0-9_]{6,})\b", block)) & set(
        cat.QUERIES
    )
    # every explicitly ranked in-candidate must be oracle-backed
    ranked = [
        "graph_pagerank_label", "bucketed_join_revenue",
        "multimodal_image_ahash_pairs", "events_ab_test_cuped",
        "streaming_cusum_monitor", "store_compaction",
        "lineitem_kendall_tau", "events_mann_kendall",
        "dedup_keep_best", "retrieval_rbo_bm25_qld",
        "corpus_neyman_sample",
    ]
    for n in ranked:
        assert n in cat.QUERIES, n
        assert n in cat.ORACLES, f"{n} ranked for rotation but rows-only"
        assert n in named, f"{n} missing from the ranking text"
    # out-candidates must exist too (they rotate OUT, not away)
    for n in ["ann_tree_fixed", "events_hll_users", "text_langid",
              "rotation_store_serve", "events_gapfill_hourly"]:
        assert n in cat.QUERIES, n


def test_r14_eligibility_ranking_names_are_registered():
    """The consolidated r14 rotation ranking at the catalog tail must
    name only registered, oracle-backed queries (the r12/r13 guards'
    convention, carried forward)."""
    import ydb_vector_search_demo_spark.plans.catalog as cat

    src = open(cat.__file__).read()
    block = src.split("r14 rotation-eligibility ranking")[1].split(
        "r13 rotation-eligibility ranking"
    )[0]
    ranked = [
        "corpus_unigram_lm",
        "store_scd2_incremental", "multimodal_interleaved_pack",
        "corpus_doremi_weights", "graph_kcore_peel",
        "corpus_pack_ffd",
        "part_skyline_brand", "dedup_minhash_accuracy",
        "corpus_span_corruption", "ann_power_iteration_fixed",
        "lineitem_kendall_tau", "events_mann_kendall",
        "dedup_keep_best", "retrieval_rbo_bm25_qld",
        "corpus_neyman_sample", "corpus_bpe_fertility",
    ]
    for n in ranked:
        assert n in cat.QUERIES, n
        assert n in cat.ORACLES, f"{n} ranked for rotation but rows-only"
        assert n in block, f"{n} missing from the r14 ranking text"
    for n in ["store_scd2_stream", "corpus_pack_sequences",
              "text_token_stats", "datetime_order_stats"]:
        assert n in cat.QUERIES, n
        assert n in block, f"out-candidate {n} missing from r14 text"


def test_r13_eligibility_ranking_names_are_registered():
    """The consolidated r13 rotation ranking at the catalog tail must
    name only registered, oracle-backed queries (the r12 guard's
    convention, carried forward)."""
    import ydb_vector_search_demo_spark.plans.catalog as cat

    src = open(cat.__file__).read()
    block = src.split("r13 rotation-eligibility ranking")[1].split(
        "r12 rotation EXECUTED"
    )[0]
    ranked = [
        "corpus_bpe_merges", "corpus_dsir_weights",
        "ann_kmeans_step_fixed", "graph_triangle_stats",
        "store_compaction", "corpus_span_corruption",
        "ann_power_iteration_fixed", "lineitem_kendall_tau",
        "events_mann_kendall", "dedup_keep_best",
        "retrieval_rbo_bm25_qld", "corpus_neyman_sample",
        "corpus_bpe_fertility",
    ]
    for n in ranked:
        assert n in cat.QUERIES, n
        assert n in cat.ORACLES, f"{n} ranked for rotation but rows-only"
        assert n in block, f"{n} missing from the r13 ranking text"
    for n in ["part_like_filter", "contrastive_triplets",
              "ivfpq_fixed", "retrieval_reranked_top5"]:
        assert n in cat.QUERIES, n
        assert n in block, f"out-candidate {n} missing from the text"


def test_r15_eligibility_ranking_names_are_registered():
    """The consolidated r15 rotation ranking at the catalog tail must
    name only registered, oracle-backed queries (the r12-r14 guards'
    convention, carried forward)."""
    import ydb_vector_search_demo_spark.plans.catalog as cat

    src = open(cat.__file__).read()
    block = src.split("r15 rotation-eligibility ranking")[1].split(
        "r14 rotation EXECUTED"
    )[0]
    ranked = [
        "dedup_cross_shard_fixed", "corpus_bitext_margin",
        "corpus_repetition_plan", "corpus_wordpiece_merges",
        "graph_kcore_peel", "corpus_pack_ffd",
        "events_hourly_anomaly_fdr", "corpus_wordpiece_fertility",
        "corpus_ks_drift", "corpus_pair_bleu", "corpus_lang_source_mi",
        "corpus_detector_ap", "events_holt_winters",
        "events_forecast_backtest",
        "part_skyline_brand", "dedup_minhash_accuracy",
        "corpus_span_corruption", "ann_power_iteration_fixed",
        "lineitem_kendall_tau", "events_mann_kendall",
        "dedup_keep_best", "retrieval_rbo_bm25_qld",
        "corpus_neyman_sample", "corpus_bpe_fertility",
    ]
    for n in ranked:
        assert n in cat.QUERIES, n
        assert n in cat.ORACLES, f"{n} ranked for rotation but rows-only"
        assert n in block, f"{n} missing from the r15 ranking text"
    for n in ["corpus_bpe_merges", "graph_pagerank_label",
              "text_quality", "rag_envelope_json",
              "events_hourly_anomaly", "corpus_bpe_fertility",
              "events_seasonal_naive_mae"]:
        assert n in cat.QUERIES, n
        assert n in block, f"out-candidate {n} missing from r15 text"
