"""Laws for the r8 analytics/lifecycle operators: store time travel +
CDC, funnel conversion, cohort retention."""

from __future__ import annotations

from datetime import datetime as DT

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.operators import timeseries as TS
from ydb_vector_search_demo_spark.pipeline import rag
from ydb_vector_search_demo_spark.sources.tables import load_table


def _store_logs(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id INT, text STRING"
    )
    ups = spark.createDataFrame(
        [(2, "b2", 1), (5, "e", 1), (3, "c3", 2)],
        "doc_id INT, text STRING, _v INT",
    )
    dels = spark.createDataFrame([(4, 1), (5, 2)], "doc_id INT, _v INT")
    return base, ups, dels


def test_time_travel_snapshots(spark):
    base, ups, dels = _store_logs(spark)
    snap = lambda v: {
        r["doc_id"]: r["text"]
        for r in rag.read_store_at(base, ups, dels, v).collect()
    }
    assert snap(0) == {1: "a", 2: "b", 3: "c", 4: "d"}
    # v1: 2->b2, 5 inserted, 4 deleted
    assert snap(1) == {1: "a", 2: "b2", 3: "c", 5: "e"}
    # v2: 3->c3, 5 tombstoned
    assert snap(2) == {1: "a", 2: "b2", 3: "c3"}
    # current view == read_store
    cur = {
        r["doc_id"]: r["text"]
        for r in rag.read_store(base, ups, dels).collect()
    }
    assert snap(2) == cur


def test_cdc_tags_churn_only(spark):
    base, ups, dels = _store_logs(spark)
    changes = {
        r["doc_id"]: (r["change_type"], r["before"], r["after"])
        for r in rag.store_changes_between(base, ups, dels, 0, 2).collect()
    }
    assert changes == {
        2: ("update", "b", "b2"),
        3: ("update", "c", "c3"),
        4: ("delete", "d", None),
    }, changes
    # v1 -> v2: 3 updated, 5 deleted
    changes12 = {
        r["doc_id"]: r["change_type"]
        for r in rag.store_changes_between(base, ups, dels, 1, 2).collect()
    }
    assert changes12 == {3: "update", 5: "delete"}
    # v0 -> v1 has the insert
    changes01 = {
        r["doc_id"]: r["change_type"]
        for r in rag.store_changes_between(base, ups, dels, 0, 1).collect()
    }
    assert changes01 == {2: "update", 4: "delete", 5: "insert"}


def test_funnel_counts_monotone_and_exact(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes the funnel in order
            (1, 1, "view", DT(2024, 1, 1, 10)),
            (2, 1, "click", DT(2024, 1, 1, 11)),
            (3, 1, "purchase", DT(2024, 1, 1, 12)),
            # u2 clicks BEFORE viewing -> stops at view
            (4, 2, "click", DT(2024, 1, 1, 9)),
            (5, 2, "view", DT(2024, 1, 1, 10)),
            # u3 views and clicks, never purchases
            (6, 3, "view", DT(2024, 1, 1, 8)),
            (7, 3, "click", DT(2024, 1, 1, 9)),
        ],
        "event_id INT, user_id INT, event_type STRING, ts TIMESTAMP",
    )
    out = {
        r["step"]: (r["n_users"], r["conversion_from_first"])
        for r in TS.funnel_conversion(ev, ["view", "click", "purchase"]).collect()
    }
    assert out["view"] == (3, 1.0)
    assert out["click"] == (2, round(2 / 3, 6))
    assert out["purchase"] == (1, round(1 / 3, 6))


def test_funnel_monotone_on_fixture(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    rows = TS.funnel_conversion(ev, ["view", "click", "purchase"]).collect()
    ns = [r["n_users"] for r in sorted(rows, key=lambda r: r["step_idx"])]
    assert ns[0] >= ns[1] >= ns[2] >= 0


def test_funnel_empty_corpus_rates_match_oracle_convention(spark):
    """Degenerate funnel (no step-1 events): step 1 converts from
    itself — 1.0 by definition in BOTH engines (the oracle hardcodes
    round(1.0, 6)); later steps are 0/0, emitted as 0.0."""
    ev = spark.createDataFrame(
        [(1, 1, "click", DT(2024, 1, 1, 9))],
        "event_id INT, user_id INT, event_type STRING, ts TIMESTAMP",
    )
    rows = {
        r["step_idx"]: (r["n_users"], r["conversion_from_prev"],
                        r["conversion_from_first"])
        for r in TS.funnel_conversion(ev, ["view", "click"]).collect()
    }
    assert rows[1] == (0, 1.0, 1.0)
    assert rows[2] == (0, 0.0, 0.0)


def test_funnel_counts_single_action_one_scan_per_step(spark):
    """Plan-shape guard for the r8 verdict's recompute finding
    (timeseries.py funnel_conversion rebinding `cur = nxt` lazily with
    a `.count()` per step — step k re-executed steps 1..k-1). The
    unioned single-action plan must hold at most ONE filtered events
    scan per step: stage k's aggregation subplan is shared between its
    own count branch and stage k+1's join branch, and ReuseExchange
    dedups it (the test_beam_search_plan guard pattern)."""
    ev = load_table(spark, SF_SMOKE, "events")
    steps = ["view", "click", "purchase"]
    counts_df = TS.funnel_step_counts(ev, steps)
    assert len(counts_df.collect()) == len(steps)  # THIS execution's plan
    plan = counts_df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-runtime "Initial Plan" section,
    # which double-counts every node — measure the Final Plan only.
    final = plan.split("Initial Plan")[0]
    n_scan = final.count("Scan parquet")
    assert n_scan <= len(steps), (
        f"{n_scan} parquet scans for {len(steps)} steps — per-step "
        f"recompute is back"
    )
    assert final.count("ReusedExchange") >= len(steps) - 1, final[:2000]


def test_cohort_offset_zero_equals_cohort_size(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    ret = TS.cohort_retention(ev, max_offset_days=7)
    zero = {
        r["cohort_day"]: r["n_users"]
        for r in ret.filter(F.col("day_offset") == 0).collect()
    }
    sizes = {
        r["cohort_day"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert zero == sizes


def test_attribution_credit_conservation_and_models(spark):
    """Crafted funnel: credit is moved, never created — per model the
    channel revenues sum to the total conversion value; last-touch
    picks the latest in-window touch (ties on higher event id); linear
    splits evenly; out-of-window or touchless conversions go to
    'direct'."""
    ev = spark.createDataFrame(
        [
            # u1: view(1h before) + click(30m before) -> purchase 10.0
            (1, 1, "view", DT(2024, 1, 2, 9), 0.0),
            (2, 1, "click", DT(2024, 1, 2, 9, 30), 0.0),
            (3, 1, "purchase", DT(2024, 1, 2, 10), 10.0),
            # u2: only touch is 25h before -> direct
            (4, 2, "view", DT(2024, 1, 1, 8), 0.0),
            (5, 2, "purchase", DT(2024, 1, 2, 10), 4.0),
            # u3: two views, later one ties with a click at same ts ->
            # the higher event_id wins last-touch
            (6, 3, "view", DT(2024, 1, 2, 8), 0.0),
            (7, 3, "click", DT(2024, 1, 2, 9), 0.0),
            (8, 3, "view", DT(2024, 1, 2, 9), 0.0),
            (9, 3, "purchase", DT(2024, 1, 2, 10), 6.0),
        ],
        "event_id INT, user_id INT, event_type STRING, ts TIMESTAMP,"
        " value DOUBLE",
    )
    rows = {
        (r["model"], r["channel"]): (r["n_touches"], r["revenue"])
        for r in TS.attribution(ev).collect()
    }
    # last-touch: u1 -> click, u3 -> view (event 8 beats 7 at same ts)
    assert rows[("last_touch", "click")] == (1, 10.0)
    assert rows[("last_touch", "view")] == (1, 6.0)
    assert rows[("last_touch", "direct")] == (1, 4.0)
    # linear: u1 10/2 each; u3 6/3 each
    assert rows[("linear", "click")] == (2, round(10 / 2 + 6 / 3, 4))
    assert rows[("linear", "view")] == (3, round(10 / 2 + 2 * 6 / 3, 4))
    assert rows[("linear", "direct")] == (1, 4.0)
    for model in ("last_touch", "linear"):
        total = sum(v[1] for (m, _), v in rows.items() if m == model)
        assert abs(total - 20.0) < 1e-6, (model, total)


def test_transition_matrix_rows_and_probabilities(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    rows = TS.transition_matrix(ev).collect()
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users
    from collections import defaultdict

    per_from = defaultdict(float)
    for r in rows:
        per_from[r["from_type"]] += r["p"]
    for ft, s in per_from.items():
        assert abs(s - 1.0) < 1e-4, (ft, s)


def test_priority_sample_laws(spark):
    """A-ES laws: scaling every weight by a constant leaves the
    selected set (and order) unchanged; equal weights degrade to pure
    hash order; non-positive weights are never sampled."""
    from pyspark.sql import functions as F

    from ydb_vector_search_demo_spark.operators import curation

    docs = load_table(spark, SF_SMOKE, "documents")
    base = [
        r["doc_id"]
        for r in curation.priority_sample(docs, "n_chars", k=15).collect()
    ]
    scaled = [
        r["doc_id"]
        for r in curation.priority_sample(
            docs.withColumn("n_chars", F.col("n_chars") * 7), "n_chars", k=15
        ).collect()
    ]
    assert base == scaled, "weight scaling must not change the sample"
    eq = docs.withColumn("w", F.lit(1.0))
    got = [r["doc_id"] for r in curation.priority_sample(eq, "w", k=10).collect()]
    # equal weights: priority = u -> top-10 by the pinned md5-uniform
    by_u = [
        r["doc_id"]
        for r in eq.select(
            "doc_id",
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit("psample-v1:"),
                                           F.col("doc_id").cast("string"))),
                            1, 13,
                        ), 16, 10,
                    ).cast("double")
                    + F.lit(0.5)
                ) / F.lit(float(2**52))
            ).alias("u"),
        )
        .orderBy(F.col("u").desc(), F.col("doc_id"))
        .limit(10)
        .collect()
    ]
    assert got == by_u
    zeroed = docs.withColumn(
        "n_chars", F.when(F.col("doc_id") < 100, F.lit(0)).otherwise(F.col("n_chars"))
    )
    z = curation.priority_sample(zeroed, "n_chars", k=500).collect()
    assert all(r["doc_id"] >= 100 for r in z)


def test_attribution_result_plan_reads_checkpoints_only(spark):
    """Plan guard (the funnel_step_counts recompute class): five
    branches consume the conversion slice and the in-window pair
    relation, so both are localCheckpointed — the RESULT plan must
    contain zero parquet scans (events is passed exactly twice, in the
    checkpoint-building jobs)."""
    ev = load_table(spark, SF_SMOKE, "events")
    out = TS.attribution(ev)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Scan parquet") == 0, final[:1500]


def test_scd2_history_consistent_with_time_travel(spark):
    """SCD2 laws: filtering the history to any version v reproduces
    read_store_at(v) exactly (same keys, same payloads), and the
    is_current rows equal the live store view."""
    base, ups, dels = _store_logs(spark)
    hist = rag.scd2_history(base, ups, dels).collect()
    by_version = lambda v: {
        (r["doc_id"], r["text"])
        for r in hist
        if r["valid_from"] <= v and (r["valid_to"] == -1 or v < r["valid_to"])
    }
    for v in (0, 1, 2):
        snap = {
            (r["doc_id"], r["text"])
            for r in rag.read_store_at(base, ups, dels, v).collect()
        }
        assert by_version(v) == snap, v
    current = {(r["doc_id"], r["text"]) for r in hist if r["is_current"]}
    live = {
        (r["doc_id"], r["text"]) for r in rag.read_store(base, ups, dels).collect()
    }
    assert current == live
    # intervals are disjoint and ordered per key
    from collections import defaultdict

    per_key = defaultdict(list)
    for r in hist:
        per_key[r["doc_id"]].append((r["valid_from"], r["valid_to"]))
    for k, spans in per_key.items():
        spans.sort()
        for (f1, t1), (f2, _) in zip(spans, spans[1:]):
            assert t1 != -1 and t1 <= f2, (k, spans)


def test_priority_sample_per_group_laws(spark):
    from pyspark.sql import functions as F

    from ydb_vector_search_demo_spark.operators import curation

    docs = load_table(spark, SF_SMOKE, "documents")
    out = curation.priority_sample_per_group(
        docs, "n_chars", k=5, group_col="source"
    )
    rows = out.collect()
    from collections import Counter

    per_group = Counter(r["source"] for r in rows)
    assert all(c <= 5 for c in per_group.values())
    # weight scaling leaves every group's selection unchanged
    scaled = curation.priority_sample_per_group(
        docs.withColumn("n_chars", F.col("n_chars") * 3),
        "n_chars", k=5, group_col="source",
    ).collect()
    assert sorted((r["source"], r["rank"], r["doc_id"]) for r in rows) == sorted(
        (r["source"], r["rank"], r["doc_id"]) for r in scaled
    )
    # the rank<=k cut runs as a WindowGroupLimit (map-side pre-trim)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_remove_duplicate_spans_laws(spark):
    """Span-removal laws: a corpus with no repeated 8-gram keeps every
    token (clean text == space-joined tokens); a span planted in two
    documents is stripped from BOTH, and only tokens covered by the
    repeated windows go."""
    from ydb_vector_search_demo_spark.operators import dedup as DD

    span = " ".join(f"dup{i}" for i in range(8))
    rows = [
        (1, "alpha beta " + span + " gamma delta"),
        (2, "zeta " + span + " eta theta iota"),
        (3, "only unique words live here to stay forever untouched"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["clean_md5"])
        for r in DD.remove_duplicate_spans(docs, n=8).collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 3: nothing repeated -> everything kept, text reassembles
    assert out[3] == (9, 9, md5(rows[2][1]))
    # docs 1-2: exactly the planted 8 tokens stripped
    assert out[1] == (12, 4, md5("alpha beta gamma delta"))
    assert out[2] == (12, 4, md5("zeta eta theta iota"))


def test_remove_duplicate_spans_salted_valve_equality(spark):
    """Hot-hash valve law (r9 verdict task #4): on a corpus where ONE
    8-gram dominates (planted in most documents — the boilerplate
    straggler shape), the salted groupBy+join path (n_salt>0) must be
    row-for-row equal to the window-count path (n_salt=0), and its
    plan must contain NO Window over the hash (the single-task skew
    the valve exists to remove) while carrying the salted join."""
    from ydb_vector_search_demo_spark.operators import dedup as DD

    hot = " ".join(f"boiler{i}" for i in range(8))
    rows = [
        (i, f"lead{i} start{i} " + hot + f" tail{i} end{i}")
        for i in range(40)
    ] + [
        (100, "a corpus row with no repeated window at all here now"),
        (101, "another fully unique document that keeps every token"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    base = sorted(
        tuple(r) for r in DD.remove_duplicate_spans(docs, n=8).collect()
    )
    salted_df = DD.remove_duplicate_spans(docs, n=8, n_salt=4)
    salted = sorted(tuple(r) for r in salted_df.collect())
    assert salted == base
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Window" not in final, final[:1500]
    # the hot window really was stripped from every planted doc
    kept = {r[0]: r[2] for r in base}
    assert all(kept[i] == 4 for i in range(40))


def test_rank_ensemble_degenerates_to_single_signal(spark):
    """With one signal at weight 1.0 the ensemble ordering IS the
    signal's ordering (ties on id); weights scale linearly."""
    from ydb_vector_search_demo_spark.operators import curation

    df = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 30)], "doc_id INT, s LONG"
    )
    out = curation.rank_ensemble(df, [("s", 1.0)]).orderBy(
        F.desc("ensemble"), "doc_id"
    )
    order = [r["doc_id"] for r in out.collect()]
    # s desc with id tie-break: 2 (30), 4 (30), 3 (20), 1 (10)
    assert order == [2, 4, 3, 1]
    top = out.first()
    assert top["ensemble"] == 1.0  # best rank -> percent_rank 0 -> 1.0


def test_pair_lift_heavy_basket_valve(spark):
    """pair_lift's heavy-basket valve (r10 verdict task #4 — the
    span-removal valve template): (1) below the cap the valve is
    result-INVISIBLE (row-for-row equal to the unvalved form);
    (2) a planted degenerate basket (many distinct items — the
    items²/basket blowup) is excluded before every count, so no pair
    it exclusively produced survives and the statistics stay
    self-consistent on the post-valve relation; (3) the plan carries
    the over-cap list as a BROADCAST left-anti probe — no Window, no
    sort over the basket key."""
    from ydb_vector_search_demo_spark.operators import stats as ST

    normal = [
        (b, f"item{i}") for b in range(30) for i in range(4)
    ]  # every 4-item basket shares items -> stable pairs
    df = spark.createDataFrame(normal, "bk INT, it STRING")
    base = sorted(
        tuple(r)
        for r in ST.pair_lift(df, "bk", "it", min_support=2, top=50).collect()
    )
    valved = sorted(
        tuple(r)
        for r in ST.pair_lift(
            df, "bk", "it", min_support=2, top=50, max_basket=10
        ).collect()
    )
    assert valved == base  # result-invisible below the cap

    heavy = [(999, f"bot{i}") for i in range(60)]
    df2 = spark.createDataFrame(normal + heavy, "bk INT, it STRING")
    out_df = ST.pair_lift(
        df2, "bk", "it", min_support=2, top=500, max_basket=10
    )
    out = sorted(tuple(r) for r in out_df.collect())
    # the degenerate basket is gone: no bot-item pair, and the
    # remaining statistics equal the heavy-free corpus exactly
    assert not any("bot" in r[0] or "bot" in r[1] for r in out)
    assert out == base
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Window" not in final, final[:1500]
    import re

    anti = [
        l for l in final.splitlines() if "LeftAnti" in l
    ]
    assert anti and all("Broadcast" in l for l in anti), anti


def test_rank_ensemble_approx_agrees_within_bucket_width(spark):
    """The approx twin's band-agreement law (the
    perplexity_buckets_approx precedent): on a skewed two-signal
    relation with ties, the sketch-bucket ensemble agrees with the
    exact percent-rank ensemble within ~2 bucket widths on >=90% of
    rows — and its plan has NO Window (the exact form's Exchange
    SinglePartition sort is gone; the only single-partition exchange
    moves the percentile sketches, one row per task)."""
    from ydb_vector_search_demo_spark.operators import curation

    rows = [
        (i, (i * 7919) % 400, ((i * i) % 97) // 3)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id INT, s1 LONG, s2 LONG")
    sig = [("s1", 0.6), ("s2", 0.4)]
    exact = {
        r["doc_id"]: r["ensemble"]
        for r in curation.rank_ensemble(df, sig, id_col="doc_id").collect()
    }
    approx_df = curation.rank_ensemble_approx(df, sig, n_buckets=100)
    approx = {r["doc_id"]: r["ensemble"] for r in approx_df.collect()}
    diffs = [abs(exact[k] - approx[k]) for k in exact]
    agree = sum(d <= 2.0 / 100 for d in diffs) / len(diffs)
    assert agree >= 0.9, (agree, sorted(diffs)[-5:])
    assert max(diffs) <= 0.1, max(diffs)

    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1500]
    assert "percentile_approx" in plan
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange SinglePartition") <= 1, final[:2000]


def test_stats_operators_laws(spark):
    """chi2: a perfectly independent 2x2 table contributes ~0; a
    perfectly dependent one contributes n. pearson: exact +1 on a
    linear relation, ~0 on a constant-free checkerboard; scale
    invariance (the scales cancel)."""
    from ydb_vector_search_demo_spark.operators import stats as ST

    indep = spark.createDataFrame(
        [("a", "x")] * 10 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 10,
        "u STRING, v STRING",
    )
    cells = ST.chi2_independence(indep, "u", "v").collect()
    assert all(abs(r["chi2_contrib"]) < 1e-9 for r in cells)
    dep = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", "y")] * 10, "u STRING, v STRING"
    )
    chi2 = sum(r["chi2_contrib"] for r in ST.chi2_independence(dep, "u", "v").collect())
    assert abs(chi2 - 20.0) < 1e-6  # phi=1 -> chi2 = n

    lin = spark.createDataFrame(
        [(float(i), 2.0 * i + 1) for i in range(50)], "x DOUBLE, y DOUBLE"
    )
    r = ST.pearson_corr_exact(lin, "x", "y", x_scale=1, y_scale=1).first()
    assert r["n"] == 50 and abs(r["r"] - 1.0) < 1e-9
    r2 = ST.pearson_corr_exact(lin, "x", "y", x_scale=10, y_scale=100).first()
    assert r2["r"] == r["r"]  # scales cancel


def test_sample_mixture_laws(spark):
    """Cap law: a group smaller than its per-group target keeps every
    row (rate 1). Determinism: two runs keep the identical set. Budget
    law: a budget covering every group keeps the whole corpus."""
    from ydb_vector_search_demo_spark.operators import curation as CU

    rows = [(i, "big") for i in range(20)] + [(100, "small"), (101, "small")]
    df = spark.createDataFrame(rows, "doc_id INT, grp STRING")
    kept = CU.sample_mixture(df, "grp", budget=10).collect()
    small = [r for r in kept if r["grp"] == "small"]
    assert len(small) == 2 and all(r["keep_rate"] == 1.0 for r in small)
    big = [r for r in kept if r["grp"] == "big"]
    assert 0 < len(big) < 20  # rate 0.25 — strictly downsampled
    kept2 = CU.sample_mixture(df, "grp", budget=10).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in kept2
    )
    everything = CU.sample_mixture(df, "grp", budget=1000).collect()
    assert len(everything) == 22


def test_embedding_diversity_laws(spark):
    """Identical vectors → zero diversity; a small cloud matches the
    naive O(n²) pairwise mean computed in Python on the same grid."""
    from ydb_vector_search_demo_spark.operators import curation as CU

    same = [(i, 0, [0.25, -0.5, 0.125]) for i in range(5)]
    cloud = [
        (10 + j, 1, v)
        for j, v in enumerate(
            [[0.1, 0.2, 0.3], [0.4, -0.1, 0.0], [-0.3, 0.3, 0.25],
             [0.05, 0.05, -0.45]]
        )
    ]
    df = spark.createDataFrame(
        same + cloud, "vec_id INT, label INT, embedding ARRAY<FLOAT>"
    )
    out = {r["label"]: r for r in CU.embedding_diversity(df).collect()}
    assert out[0]["mean_pairwise_l2sq"] == 0.0

    qs = [[round(x * 10**4) for x in v] for _, _, v in cloud]
    n = len(qs)
    tot = sum(
        sum((a - b) ** 2 for a, b in zip(qs[i], qs[j]))
        for i in range(n)
        for j in range(n)
        if i != j
    )
    naive = tot / (1.0 * n * (n - 1)) / 1e8
    assert abs(out[1]["mean_pairwise_l2sq"] - naive) < 1e-6


def test_moment_stats_laws(spark):
    """Shift invariance: adding a constant moves the mean only; a
    symmetric distribution has zero skewness; the two-point ±1
    distribution has excess kurtosis −2."""
    from ydb_vector_search_demo_spark.operators import stats as ST

    sym = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 2, 3, 3, 3, 4, 4, 5)],
        "grp STRING, x DOUBLE",
    )
    base = ST.moment_stats(sym, "x", "grp").first()
    assert base["skewness"] == 0.0
    shifted = sym.select("grp", (F.col("x") + 1000).alias("x"))
    sh = ST.moment_stats(shifted, "x", "grp").first()
    assert sh["mean"] == base["mean"] + 1000
    assert sh["variance"] == base["variance"]
    assert sh["skewness"] == base["skewness"]
    assert sh["kurtosis_excess"] == base["kurtosis_excess"]

    two_point = spark.createDataFrame(
        [("g", -1.0)] * 10 + [("g", 1.0)] * 10, "grp STRING, x DOUBLE"
    )
    tp = ST.moment_stats(two_point, "x", "grp").first()
    assert tp["variance"] == 1.0 and tp["kurtosis_excess"] == -2.0


def test_inter_event_gaps_exact(spark):
    """Planted gaps 10/20/70 s: median 20, p90 via R-7 interpolation
    (rank 1.8 → 20 + 0.8·(70−20) = 60)."""
    from ydb_vector_search_demo_spark.operators import timeseries as T

    rows = [
        (1, "u1", "click", DT(2024, 1, 1, 0, 0, 0)),
        (2, "u1", "click", DT(2024, 1, 1, 0, 0, 10)),
        (3, "u1", "click", DT(2024, 1, 1, 0, 0, 30)),
        (4, "u1", "click", DT(2024, 1, 1, 0, 1, 40)),
        (5, "u2", "view", DT(2024, 1, 1, 0, 0, 0)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id INT, user_id STRING, event_type STRING, ts TIMESTAMP"
    )
    out = {r["event_type"]: r for r in T.inter_event_gaps(ev).collect()}
    assert out["click"]["n_gaps"] == 3
    assert out["click"]["p50_s"] == 20.0
    assert out["click"]["p90_s"] == 60.0
    assert "view" not in out  # a single event has no gap


def test_audience_overlap_exact(spark):
    """Planted audiences {1,2,3} and {2,3,4}: intersection 2, union 4,
    Jaccard 0.5; a type never co-occurring yields no pair row."""
    from ydb_vector_search_demo_spark.operators import timeseries as T

    rows = (
        [(i, "x", f"u{i}") for i in (1, 2, 3)]
        + [(10 + i, "y", f"u{i}") for i in (2, 3, 4)]
        + [(20, "z", "u99")]
    )
    ev = spark.createDataFrame(
        rows, "event_id INT, event_type STRING, user_id STRING"
    )
    out = T.audience_overlap(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("x", "y")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard"] == 0.5


def test_pair_lift_exact(spark):
    """Planted baskets: {A,B} in 2 of 4 baskets with n_A=n_B=2 →
    lift = 2·4/(2·2) = 2; an anti-correlated pair never co-occurs and
    emits no row; min_support filters singleton pairs."""
    from ydb_vector_search_demo_spark.operators import stats as ST

    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "C"), (4, "C"),
    ]
    df = spark.createDataFrame(rows, "bk INT, item STRING")
    out = ST.pair_lift(df, "bk", "item", min_support=2, top=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_ab"]) == ("A", "B", 2)
    assert r["lift"] == 2.0


def test_dau_mau_stickiness_exact(spark):
    """Planted month: 3 distinct users in the month; day 1 sees 2 of
    them → stickiness 2/3; duplicate same-day events collapse."""
    from ydb_vector_search_demo_spark.operators import timeseries as T

    rows = [
        (1, "u1", DT(2024, 5, 1, 9)),
        (2, "u1", DT(2024, 5, 1, 10)),  # same user+day → one DAU
        (3, "u2", DT(2024, 5, 1, 11)),
        (4, "u3", DT(2024, 5, 2, 9)),
    ]
    ev = spark.createDataFrame(rows, "event_id INT, user_id STRING, ts TIMESTAMP")
    out = {r["day"]: r for r in T.dau_mau_stickiness(ev).collect()}
    assert out["2024-05-01"]["dau"] == 2 and out["2024-05-01"]["mau"] == 3
    assert out["2024-05-01"]["stickiness"] == round(2 / 3.0, 6)
    assert out["2024-05-02"]["dau"] == 1


def test_ngram_novelty_laws(spark):
    """A doc repeated verbatim later contributes zero novel shingles;
    the first doc of a group is 100% novel; docs shorter than n are
    excluded."""
    from ydb_vector_search_demo_spark.operators import curation as CU

    rows = [
        (1, "en", "the quick brown fox jumps"),
        (2, "en", "the quick brown fox jumps"),  # exact dup → 0 novel
        (3, "en", "an entirely different sentence here"),
        (4, "en", "too short"),  # < 3 tokens → no shingles
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, lang STRING, text STRING")
    out = CU.ngram_novelty(docs, n=3).collect()
    assert len(out) == 1
    r = out[0]
    # doc1: 3 shingles all novel; doc2: 3 shingles, 0 novel; doc3: 3 novel
    assert r["n_docs"] == 3 and r["n_shingles"] == 9 and r["n_novel"] == 6
    assert r["novelty"] == round(6 / 9.0, 6)


def test_gini_concentration_laws(spark):
    """Equal values → G = 0; a single owner of all mass → (n−1)/n;
    ties never move the aggregate (shuffled input, same G)."""
    from ydb_vector_search_demo_spark.operators import stats as ST

    eq = spark.createDataFrame(
        [("s", 7.0)] * 8, "grp STRING, x DOUBLE"
    )
    assert ST.gini_concentration(eq, "x", "grp").first()["gini"] == 0.0
    one = spark.createDataFrame(
        [("s", 0.0)] * 9 + [("s", 100.0)], "grp STRING, x DOUBLE"
    )
    assert ST.gini_concentration(one, "x", "grp").first()["gini"] == round(
        9 / 10.0, 6
    )
    tied = spark.createDataFrame(
        [("s", 1.0), ("s", 1.0), ("s", 2.0), ("s", 2.0)],
        "grp STRING, x DOUBLE",
    )
    g1 = ST.gini_concentration(tied, "x", "grp").first()["gini"]
    g2 = ST.gini_concentration(
        tied.orderBy(F.rand(seed=7)), "x", "grp"
    ).first()["gini"]
    assert g1 == g2


def test_pareto_8020_exact(spark):
    """Planted revenue 80/10/10: the first supplier alone covers 80%,
    so n_top80 = 1 (coverage before it is 0 < 80; before the second it
    is exactly 80 — NOT below — so the second is excluded: the
    boundary is integer-exact)."""
    from ydb_vector_search_demo_spark.plans.catalog import QUERIES  # noqa: F401
    from pyspark.sql import Window as W

    rev = spark.createDataFrame(
        [("N", 1, 8000), ("N", 2, 1000), ("N", 3, 1000)],
        "n_name STRING, s_suppkey INT, cents BIGINT",
    )
    wcum = (
        W.partitionBy("n_name")
        .orderBy(F.desc("cents"), "s_suppkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = rev.select(
        "n_name", "cents",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(W.partitionBy("n_name")).alias("tot"),
    )
    needed = F.when(
        (F.col("cum") - F.col("cents")) * 10 < F.col("tot") * 8, 1
    ).otherwise(0)
    out = ranked.agg(F.sum(needed).alias("n_top80")).first()
    assert out["n_top80"] == 1


# ---------------------------------------------------------------------------
# r11 wave 5: ROC-AUC, ranking metrics, LM examples, token entropy
# ---------------------------------------------------------------------------


def test_roc_auc_laws(spark):
    """Pair-count AUC laws on planted scores: perfect separation -> 1,
    inverted separation -> 0, a single all-tied score -> exactly 0.5
    (the factor-2 numerator keeps the tie half-credit integral), and a
    known mixed case -> the hand-counted pair fraction."""
    from ydb_vector_search_demo_spark.operators.stats import roc_auc

    def auc_of(rows):
        df = spark.createDataFrame(rows, "score BIGINT, is_pos BOOLEAN")
        return roc_auc(df).first()

    perfect = auc_of([(1, False), (2, False), (3, True), (4, True)])
    assert perfect["auc"] == 1.0
    assert (perfect["n_pos"], perfect["n_neg"]) == (2, 2)
    inverted = auc_of([(9, False), (8, False), (1, True), (2, True)])
    assert inverted["auc"] == 0.0
    tied = auc_of([(5, True), (5, False), (5, True), (5, False)])
    assert tied["auc"] == 0.5 and tied["n_scores"] == 1
    # mixed: pos scores {3, 1}, neg scores {2, 2}. Pairs: (3 beats 2)
    # x2 wins, (1 vs 2) x2 losses -> U = 2 of 4 -> 0.5; shift one neg
    # below both: pos {3,1} neg {2,0} -> wins 2 + 1 = 3 of 4 -> 0.75.
    mixed = auc_of([(3, True), (1, True), (2, False), (0, False)])
    assert mixed["auc"] == 0.75


def test_roc_auc_grouped_matches_ungrouped(spark):
    """group_col partitions independently: each group's AUC equals the
    ungrouped AUC of that group's rows alone."""
    from ydb_vector_search_demo_spark.operators.stats import roc_auc

    rows = [
        ("a", 3, True), ("a", 1, True), ("a", 2, False), ("a", 0, False),
        ("b", 1, False), ("b", 2, True),
    ]
    df = spark.createDataFrame(rows, "g STRING, score BIGINT, is_pos BOOLEAN")
    got = {
        r["g"]: r["auc"]
        for r in roc_auc(df, group_col="g").collect()
    }
    for g in ("a", "b"):
        solo = roc_auc(df.filter(F.col("g") == g).drop("g")).first()["auc"]
        assert got[g] == solo
    assert got["b"] == 1.0


def test_ranking_metrics_laws(spark):
    """Ranking-metrics laws: (1) retrieving the qrels in ideal order
    -> P@p = MRR = NDCG = 1; (2) retrieving only irrelevant docs -> all
    zero; (3) retrieving a relevant doc at pos 2 sets MRR = 1/2; and
    (4) IDCG uses the FULL qrels — retrieving only the gain-1 doc while
    the gain-2 doc exists caps NDCG strictly below 1."""
    from ydb_vector_search_demo_spark.operators.retrieval import (
        ndcg_discounts,
        ranking_metrics,
    )

    qrels = spark.createDataFrame(
        [("q", 10, 2), ("q", 20, 1)],
        "query_id STRING, doc_id BIGINT, gain INT",
    )

    def run(ranked_rows):
        ranked = spark.createDataFrame(
            ranked_rows, "query_id STRING, doc_id BIGINT, pos INT"
        )
        return ranking_metrics(ranked, qrels, k=10, p=5).first()

    ideal = run([("q", 10, 1), ("q", 20, 2)])
    assert ideal["ndcg_k"] == 1.0
    assert ideal["mrr"] == 1.0
    assert ideal["p_at_p"] == 2 / 5.0
    assert ideal["n_rel"] == 2

    miss = run([("q", 99, 1), ("q", 98, 2)])
    assert miss["ndcg_k"] == 0.0 and miss["mrr"] == 0.0
    assert miss["p_at_p"] == 0.0

    second = run([("q", 99, 1), ("q", 10, 2)])
    assert second["mrr"] == 0.5

    partial = run([("q", 20, 1)])
    d = ndcg_discounts(10)
    expected = (1 * d[0]) / (2 * d[0] + 1 * d[1])
    assert abs(partial["ndcg_k"] - expected) < 1e-12
    assert partial["ndcg_k"] < 1.0


def test_lm_examples_window_arithmetic(spark):
    """Example generation on the smoke corpus: every context is exactly
    8 tokens, every (context, target) pair matches a direct slice of
    the re-tokenized document, and the per-doc example count is
    (n - 9) // 4 + 1."""
    from ydb_vector_search_demo_spark.functions.textstats import tokens
    from ydb_vector_search_demo_spark.plans.catalog import QUERIES

    out = QUERIES["corpus_lm_examples"](spark, SF_SMOKE).collect()
    assert out, "smoke corpus yields no examples"
    docs = {
        r["doc_id"]: r["t"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter((F.col("doc_id") % 37) == 0)
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .collect()
    }
    per_doc: dict[int, int] = {}
    for r in out:
        t = docs[r["doc_id"]]
        i = r["ex_idx"]
        ctx = t[i * 4 : i * 4 + 8]
        assert len(ctx) == 8
        assert r["context"] == " ".join(ctx)
        assert r["target"] == t[i * 4 + 8]
        per_doc[r["doc_id"]] = max(per_doc.get(r["doc_id"], 0), i + 1)
    for doc_id, n_ex in per_doc.items():
        n = len(docs[doc_id])
        assert n_ex == (n - 9) // 4 + 1


def test_token_entropy_laws(spark):
    """Entropy laws via the catalog shape on planted corpora: a
    single-token language has H = 0 (perplexity 1); a language using V
    equally-frequent tokens has H = ln(V) (perplexity V)."""
    import math

    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [("mono", "x x x x"), ("quad", "a b c d a b c d")],
        "lang STRING, text STRING",
    )
    from ydb_vector_search_demo_spark.functions.textstats import tokens

    tok = df.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
    cnt = tok.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_cum = (
        W.partitionBy("lang")
        .orderBy("tok")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = cnt.select(
        "lang", "n",
        F.sum(F.col("n") * F.log(F.col("n").cast("double")))
        .over(w_cum)
        .alias("s"),
    )
    agg = cum.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.max("s").alias("s"),
    )
    h = F.log(F.col("n_tokens").cast("double")) - F.col("s") / F.col(
        "n_tokens"
    )
    got = {
        r["lang"]: (r["vocab_size"], r["h"])
        for r in agg.select("lang", "vocab_size", h.alias("h")).collect()
    }
    assert got["mono"][0] == 1 and abs(got["mono"][1]) < 1e-12
    assert got["quad"][0] == 4
    assert abs(got["quad"][1] - math.log(4)) < 1e-12


# ---------------------------------------------------------------------------
# r11 wave 6: CUSUM drift, Poisson bootstrap, exact Spearman
# ---------------------------------------------------------------------------


def test_cusum_drift_matches_recursion(spark):
    """The window form equals the textbook recursion s_k = max(0,
    s_{k-1} + (n*x_k - T)) replayed driver-side on a planted series,
    for both directions; and a planted upward step change accumulates
    drift strictly after the shift."""
    from ydb_vector_search_demo_spark.operators.timeseries import cusum_drift

    xs = [10, 10, 10, 10, 10, 20, 20, 20, 20, 20]
    grain = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "h INT, x BIGINT"
    )
    got = {
        r["h"]: (r["s_up"], r["s_dn"])
        for r in cusum_drift(grain, "h", "x").collect()
    }
    n, t = len(xs), sum(xs)
    s_up = s_dn = 0
    for i, x in enumerate(xs):
        y = n * x - t
        s_up = max(0, s_up + y)
        s_dn = max(0, s_dn - y)
        assert got[i] == (s_up, s_dn), i
    # before the shift the upward statistic is 0; after, it grows
    assert got[4][0] == 0
    assert got[9][0] > got[6][0] > 0


def test_poisson_bootstrap_laws(spark):
    """b=0 is the exact point estimate (weight 1 everywhere); weights
    are deterministic (two invocations agree bit-for-bit); and on a
    constant-valued corpus every replicate mean collapses to the
    constant (sum_b == c * n_b)."""
    from ydb_vector_search_demo_spark.operators.stats import poisson_bootstrap

    df = spark.createDataFrame(
        [(i, 700) for i in range(200)], "id BIGINT, v BIGINT"
    )
    rep1 = poisson_bootstrap(df, "id", "v", b=8).collect()
    rep2 = poisson_bootstrap(df, "id", "v", b=8).collect()
    assert sorted(map(tuple, rep1)) == sorted(map(tuple, rep2))
    by_b = {r["b"]: r for r in rep1}
    assert by_b[0]["n_b"] == 200 and by_b[0]["sum_b"] == 200 * 700
    assert len(by_b) == 9
    for b, r in by_b.items():
        assert r["sum_b"] == 700 * r["n_b"], b
        if b >= 1:
            # a Poisson(1) resample of 200 rows never returns exactly 0
            assert r["n_b"] > 0


def test_spearman_exact_laws(spark):
    """Spearman laws: any strictly increasing map of x -> rho = 1;
    strictly decreasing -> rho = -1 (exactly — the moments are exact
    integers, so the ratio is literally ±1.0); an exactly symmetric
    2x2 grid -> 0; and heavy ties are handled (constant margin ->
    NaN-free denominator requires variation, so a 2-value margin with
    balanced ties against itself still gives 1)."""
    from ydb_vector_search_demo_spark.operators.stats import spearman_exact

    inc = spark.createDataFrame(
        [(i, 3 * i + 7) for i in range(20)], "x BIGINT, y BIGINT"
    )
    r = spearman_exact(inc).first()
    assert r["spearman_rho"] == 1.0 and r["n_rows"] == 20

    dec = spark.createDataFrame(
        [(i, -i) for i in range(20)], "x BIGINT, y BIGINT"
    )
    assert spearman_exact(dec).first()["spearman_rho"] == -1.0

    sym = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2)], "x BIGINT, y BIGINT"
    )
    assert spearman_exact(sym).first()["spearman_rho"] == 0.0

    ties = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 2), (2, 2)], "x BIGINT, y BIGINT"
    )
    t = spearman_exact(ties).first()
    assert t["spearman_rho"] == 1.0
    assert t["n_x_values"] == 2 and t["n_y_values"] == 2


# ---------------------------------------------------------------------------
# r11 wave 7: ACF, Mann-Kendall + Sen, Benford, Kendall tau-b
# ---------------------------------------------------------------------------


def test_acf_exact_laws(spark):
    """A perfectly linear series correlates exactly 1.0 at every lag
    (the moments are exact integers, so the ratio is literally 1.0);
    an alternating series gives acf(1) = -1, acf(2) = +1; and each
    lag k sees exactly L - k pairs."""
    from ydb_vector_search_demo_spark.operators.timeseries import acf_exact

    lin = spark.createDataFrame(
        [(i, 5 + 2 * i) for i in range(12)], "h INT, x BIGINT"
    )
    got = acf_exact(lin, "h", "x", max_lag=3).collect()
    assert [(r["lag"], r["n_pairs"], r["acf"]) for r in got] == [
        (1, 11, 1.0), (2, 10, 1.0), (3, 9, 1.0),
    ]

    alt = spark.createDataFrame(
        [(i, 1 if i % 2 == 0 else 2) for i in range(12)], "h INT, x BIGINT"
    )
    a = {r["lag"]: r["acf"] for r in acf_exact(alt, "h", "x", 2).collect()}
    assert a[1] == -1.0 and a[2] == 1.0


def test_mann_kendall_sen_laws(spark):
    """Strictly increasing -> S = n(n-1)/2, tie term vanishes, Sen's
    slope is exactly the step; strictly decreasing mirrors S; a
    constant series has S = 0 AND var18 = 0 (one tie group absorbs
    the full variance term); and S is invariant under any strictly
    monotone transform of the values (rank statistic) while Sen's
    slope is not."""
    from ydb_vector_search_demo_spark.operators.stats import mann_kendall_sen

    n = 10
    inc = spark.createDataFrame(
        [(i, 100 + 7 * i) for i in range(n)], "h INT, x BIGINT"
    )
    r = mann_kendall_sen(inc, "h", "x").first()
    assert r["s_stat"] == n * (n - 1) // 2
    assert r["var18"] == n * (n - 1) * (2 * n + 5)
    assert r["sen_slope"] == 7.0
    import math

    assert abs(
        r["z_mk"]
        - (r["s_stat"] - 1) / math.sqrt(r["var18"] / 18.0)
    ) < 1e-12

    dec = spark.createDataFrame(
        [(i, -5 * i) for i in range(n)], "h INT, x BIGINT"
    )
    rd = mann_kendall_sen(dec, "h", "x").first()
    assert rd["s_stat"] == -(n * (n - 1) // 2) and rd["sen_slope"] == -5.0

    const = spark.createDataFrame(
        [(i, 42) for i in range(n)], "h INT, x BIGINT"
    )
    rc = mann_kendall_sen(const, "h", "x").first()
    assert rc["s_stat"] == 0 and rc["var18"] == 0
    assert rc["z_mk"] is None  # degenerate variance -> test undefined

    cubed = spark.createDataFrame(
        [(i, (100 + 7 * i) ** 3) for i in range(n)], "h INT, x BIGINT"
    )
    r3 = mann_kendall_sen(cubed, "h", "x").first()
    assert r3["s_stat"] == r["s_stat"] and r3["var18"] == r["var18"]


def test_benford_digits_laws(spark):
    """The spine is dense (a single-digit corpus still yields 9 rows
    with zero counts elsewhere); digit extraction is pure integer
    string arithmetic across magnitudes; counts conserve the input;
    chi2_cum is nondecreasing; and a corpus drawn EXACTLY at the
    expected proportions has a zero chi-square."""
    from ydb_vector_search_demo_spark.operators.stats import benford_digits

    probs = [0.5, 0.2, 0.1, 0.05, 0.05, 0.04, 0.03, 0.02, 0.01]
    vals = spark.createDataFrame(
        [(7,), (42,), (90210,), (777,)], "v BIGINT"
    )
    rows = benford_digits(vals, "v", probs).orderBy("digit").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    by_d = {r["digit"]: r["n"] for r in rows}
    assert by_d[7] == 2 and by_d[4] == 1 and by_d[9] == 1 and by_d[1] == 0
    assert sum(by_d.values()) == 4
    cums = [r["chi2_cum"] for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(cums, cums[1:]))

    # 100 rows drawn exactly at the expected proportions -> chi2 == 0
    exact = spark.createDataFrame(
        [(d,) for d in range(1, 10) for _ in range(int(probs[d - 1] * 100))],
        "v BIGINT",
    )
    out = benford_digits(exact, "v", probs).orderBy("digit").collect()
    assert out[-1]["chi2_cum"] == 0.0
    assert all(r["share"] == r["expected_share"] for r in out)


def test_kendall_tau_exact_laws(spark):
    """Strictly monotone -> tau = +/-1 exactly; a hand-counted tied
    grid matches the closed form; swapping the two margins leaves
    tau invariant (symmetry); and tau is invariant under strictly
    monotone transforms of either margin (rank statistic)."""
    from ydb_vector_search_demo_spark.operators.stats import kendall_tau_exact

    inc = spark.createDataFrame(
        [(i, 2 * i) for i in range(10)], "x BIGINT, y BIGINT"
    )
    r = kendall_tau_exact(inc).first()
    assert r["tau_b"] == 1.0 and r["concordant"] == 45 and r["discordant"] == 0

    dec = spark.createDataFrame(
        [(i, -i) for i in range(10)], "x BIGINT, y BIGINT"
    )
    assert kendall_tau_exact(dec).first()["tau_b"] == -1.0

    # hand-counted: C=7, D=1, n=6, 2n1=2n2=8 -> tau = 12/22
    data = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (3, 3)]
    t = kendall_tau_exact(
        spark.createDataFrame(data, "x BIGINT, y BIGINT")
    ).first()
    assert (t["concordant"], t["discordant"]) == (7, 1)
    assert abs(t["tau_b"] - 12 / 22) < 1e-15

    swapped = kendall_tau_exact(
        spark.createDataFrame([(y, x) for x, y in data], "x BIGINT, y BIGINT")
    ).first()
    assert swapped["tau_b"] == t["tau_b"]

    cubed = kendall_tau_exact(
        spark.createDataFrame(
            [(x ** 3, y * 100 + 7) for x, y in data], "x BIGINT, y BIGINT"
        )
    ).first()
    assert cubed["tau_b"] == t["tau_b"]


# ---------------------------------------------------------------------------
# r11 wave 8: RBO, Zipf OLS, classifier calibration
# ---------------------------------------------------------------------------


def test_rbo_overlap_laws(spark):
    """Identical lists -> RBO@K = 1 - p^K exactly (binary weights);
    disjoint lists -> 0 at every depth; and a hand-computed partial
    overlap matches the definition term for term."""
    from ydb_vector_search_demo_spark.operators.retrieval import rbo_overlap

    w5 = [0.5 ** d for d in range(1, 6)]
    a = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "doc_id BIGINT, r INT"
    )
    same = {r["depth"]: r["rbo_cum"] for r in rbo_overlap(a, a, w5).collect()}
    assert abs(same[5] - (1 - 0.5 ** 5)) < 1e-15
    assert abs(same[1] - 0.5) < 1e-15

    b = spark.createDataFrame(
        [(100 + i, i) for i in range(1, 6)], "doc_id BIGINT, r INT"
    )
    disj = rbo_overlap(a, b, w5).collect()
    assert all(r["overlap"] == 0 and r["rbo_cum"] == 0.0 for r in disj)

    # lists [1,2,3] vs [2,1,4]: overlaps 0, 2, 2 -> rbo = 1/4 + 1/12
    w3 = [0.5, 0.25, 0.125]
    la = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id BIGINT, r INT"
    )
    lb = spark.createDataFrame(
        [(2, 1), (1, 2), (4, 3)], "doc_id BIGINT, r INT"
    )
    got = rbo_overlap(la, lb, w3).orderBy("depth").collect()
    assert [r["overlap"] for r in got] == [0, 2, 2]
    assert abs(got[-1]["rbo_cum"] - (0.25 + 1 / 12)) < 1e-15


def test_zipf_ols_laws(spark):
    """An exact power-law corpus (n_r = C/r) regresses to slope -1 and
    intercept ln(C) up to ulp noise; a flat distribution regresses to
    slope 0 exactly; the single-rank group yields NULL slope; ranks
    past ``top`` are excluded."""
    from ydb_vector_search_demo_spark.operators.stats import zipf_ols

    import math

    c = 27720  # divisible by 1..8 -> exact integer counts
    pl = spark.createDataFrame(
        [("a", f"t{r:02d}", c // r) for r in range(1, 9)],
        "lang STRING, tok STRING, n BIGINT",
    )
    r1 = zipf_ols(pl).first()
    assert r1["n_ranks"] == 8
    assert abs(r1["zipf_slope"] + 1.0) < 1e-9
    assert abs(r1["zipf_intercept"] - math.log(c)) < 1e-9

    flat = spark.createDataFrame(
        [("a", f"t{r}", 500) for r in range(1, 6)],
        "lang STRING, tok STRING, n BIGINT",
    )
    # constant y: the numerator cancels only up to ulp noise in the
    # ln sums, not to an exact binary zero
    assert abs(zipf_ols(flat).first()["zipf_slope"]) < 1e-12

    single = spark.createDataFrame(
        [("a", "only", 9)], "lang STRING, tok STRING, n BIGINT"
    )
    assert zipf_ols(single).first()["zipf_slope"] is None

    capped = zipf_ols(pl, top=4).first()
    assert capped["n_ranks"] == 4


def test_calibration_bins_laws(spark):
    """A perfectly calibrated corpus (per-bin positive fraction equals
    the constant bin score) has ECE = 0 with acc == conf exactly; a
    maximally miscalibrated bin contributes its full |acc-conf| mass;
    the spine is dense (10 rows always, empty bins n=0 and zero ECE
    contribution); and score 1.0 lands in the top bin."""
    from ydb_vector_search_demo_spark.operators.stats import calibration_bins

    rows = []
    # bin 2: 4 rows at score 0.25, exactly 1 positive -> acc=conf=0.25
    rows += [(0.25, True)] + [(0.25, False)] * 3
    # bin 7: 4 rows at score 0.75, exactly 3 positive
    rows += [(0.75, True)] * 3 + [(0.75, False)]
    cal = calibration_bins(
        spark.createDataFrame(rows, "score DOUBLE, label BOOLEAN"),
        "score", "label",
    ).orderBy("bin").collect()
    assert len(cal) == 10
    by = {r["bin"]: r for r in cal}
    assert by[2]["acc"] == by[2]["conf"] == 0.25
    assert by[7]["acc"] == by[7]["conf"] == 0.75
    assert cal[-1]["ece_cum"] == 0.0
    assert by[0]["n"] == 0 and by[0]["acc"] is None

    # two rows at 0.95, both negative -> ECE = |0 - 0.95| * 2/2
    bad = calibration_bins(
        spark.createDataFrame(
            [(0.95, False), (0.95, False)], "score DOUBLE, label BOOLEAN"
        ),
        "score", "label",
    ).orderBy("bin").collect()
    assert abs(bad[-1]["ece_cum"] - 0.95) < 1e-12
    assert bad[9]["n"] == 2

    top = calibration_bins(
        spark.createDataFrame([(1.0, True)], "score DOUBLE, label BOOLEAN"),
        "score", "label",
    ).orderBy("bin").collect()
    assert top[9]["n"] == 1 and top[9]["conf"] == 1.0


# ---------------------------------------------------------------------------
# r11 wave 12: A/B + CUPED, Neyman allocation
# ---------------------------------------------------------------------------


def test_ab_test_cuped_laws(spark):
    """Identical arms -> delta = 0 and z = 0 exactly; y == x (binary)
    -> theta = 1 exactly and the CUPED delta equals delta minus the
    raw covariate imbalance; one empty arm -> z is NULL; degenerate
    pooled rate (all converted) -> z is NULL."""
    from ydb_vector_search_demo_spark.operators.stats import ab_test_cuped

    same = spark.createDataFrame(
        [("A", 1, 5), ("A", 0, 3), ("B", 1, 5), ("B", 0, 3)],
        "arm STRING, y BIGINT, x BIGINT",
    )
    r = ab_test_cuped(same).first()
    assert r["delta"] == 0.0 and r["z"] == 0.0
    assert r["n_a"] == 2 and r["conv_b"] == 1

    yx = spark.createDataFrame(
        [("A", 0, 0), ("A", 1, 1), ("B", 1, 1), ("B", 1, 1)],
        "arm STRING, y BIGINT, x BIGINT",
    )
    t = ab_test_cuped(yx).first()
    assert t["theta"] == 1.0
    # cuped removes exactly the covariate imbalance when y == x
    assert abs(t["cuped_delta"] - (t["delta"] - (1.0 - 0.5))) < 1e-15
    assert abs(t["cuped_delta"]) < 1e-15

    empty_arm = spark.createDataFrame(
        [("A", 1, 2), ("A", 0, 1)], "arm STRING, y BIGINT, x BIGINT"
    )
    # no B rows at all -> the B side is an empty relation; the cross
    # join yields zero rows, which is the operator's contract there
    assert ab_test_cuped(empty_arm).count() == 0

    degenerate = spark.createDataFrame(
        [("A", 1, 1), ("B", 1, 2)], "arm STRING, y BIGINT, x BIGINT"
    )
    assert ab_test_cuped(degenerate).first()["z"] is None


def test_neyman_allocation_laws(spark):
    """Zero-variance strata get zero allocation however large; the
    allocation is proportional to N_h*S_h (two strata with equal
    N*S split the budget evenly, up to the floor); kept counts never
    exceed the stratum size; and allocations never exceed the
    budget."""
    from ydb_vector_search_demo_spark.operators.curation import (
        neyman_allocation,
    )

    rows = []
    # stratum u: 100 rows, all value 50 (zero variance)
    rows += [("u", i, 50) for i in range(100)]
    # strata a, b: same size, same spread -> equal N*S
    rows += [("a", 1000 + i, 10 + (i % 2) * 20) for i in range(50)]
    rows += [("b", 2000 + i, 10 + (i % 2) * 20) for i in range(50)]
    df = spark.createDataFrame(rows, "s STRING, id BIGINT, v BIGINT")
    out = {
        r["s"]: r.asDict()
        for r in neyman_allocation(df, "s", "v", "id", budget=100).collect()
    }
    assert out["u"]["alloc"] == 0 and out["u"]["n_kept"] == 0
    assert out["u"]["sd"] == 0.0
    assert out["a"]["alloc"] == out["b"]["alloc"] == 50
    for s in out.values():
        assert s["n_kept"] <= s["n_h"]
    assert sum(s["alloc"] for s in out.values()) <= 100


def test_neyman_allocation_degenerate_fallback(spark):
    """When EVERY stratum is zero-variance the Neyman weights are
    0/0-undefined; the documented fallback allocates proportional to
    stratum size (the limit of the rule as all sd_h tend to a common
    value) instead of emitting NULLs."""
    from ydb_vector_search_demo_spark.operators.curation import (
        neyman_allocation,
    )

    rows = [("a", i, 7) for i in range(30)]
    rows += [("b", 100 + i, 9) for i in range(10)]
    df = spark.createDataFrame(rows, "s STRING, id BIGINT, v BIGINT")
    out = {
        r["s"]: r.asDict()
        for r in neyman_allocation(df, "s", "v", "id", budget=20).collect()
    }
    assert out["a"]["sd"] == 0.0 and out["b"]["sd"] == 0.0
    # proportional to N_h: floor(20*30/40)=15, floor(20*10/40)=5
    assert out["a"]["alloc"] == 15
    assert out["b"]["alloc"] == 5
    for s in out.values():
        # the keep decision is Bernoulli(alloc/n_h) per row, so
        # n_kept has binomial noise around alloc — only the hard
        # bound n_kept <= n_h is a law
        assert s["n_kept"] <= s["n_h"]


def test_rake_keywords_laws(spark):
    """Hand corpus: phrases split at stopwords, degree/freq match the
    hand count, multi-word phrases outscore their constituent words,
    and the over-length run is dropped."""
    from ydb_vector_search_demo_spark.operators.curation import rake_keywords

    docs = spark.createDataFrame(
        [
            (1, "deep learning models for deep learning"),
            (2, "one two three four five six"),  # 6-word run -> dropped
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {
        r["phrase"]: (r["n_occurrences"], r["n_words"], r["score"])
        for r in rake_keywords(docs, ("for",), max_phrase_len=4).collect()
    }
    # freq(deep)=2 degree(deep)=3+2=5; same for learning; models 1/3
    # score("deep learning") = 5/2 + 5/2 = 5
    # score("deep learning models") = 5/2 + 5/2 + 3/1 = 8
    assert rows["deep learning"] == (1, 2, 5.0)
    assert rows["deep learning models"] == (1, 3, 8.0)
    assert "one two three four five six" not in rows
    assert len(rows) == 2


def test_bpe_merge_steps_matches_reference(spark):
    """curation.bpe_merge_steps against an independent line-by-line
    Sennrich-2016 reference implementation (word-frequency table,
    pair counts, (count desc, lhs, rhs) winner, leftmost-greedy
    non-overlapping merge application) on a hand corpus — five full
    steps, including the run-merge law ('a a a a' + (a,a) -> two
    merged symbols, odd runs keep the tail)."""
    from collections import Counter

    from ydb_vector_search_demo_spark.operators.curation import (
        bpe_merge_steps,
    )

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "widest widest widest",
        "aaaa aaaa aa",  # run-merge law: (a,a) applied greedily
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"], r["merged"])
        for r in bpe_merge_steps(docs, steps=5).orderBy("step").collect()
    ]

    wc = Counter(w for t in texts for w in t.split())
    syms = {w: list(w) for w in wc}
    want = []
    for step in range(1, 6):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        mx = max(pc.values())
        a, b = sorted(k for k, v in pc.items() if v == mx)[0]
        want.append((step, a, b, mx, a + b))
        for w, s in syms.items():
            out, prev = [], None
            for x in s:
                if prev is None:
                    prev = x
                elif prev == a and x == b:
                    out.append(a + b)
                    prev = None
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            syms[w] = out
    assert got == want


def test_dsir_importance_weights_matches_reference(spark):
    """curation.dsir_importance_weights against an independent
    hand-rolled DSIR reference (hashlib md5 buckets, add-1 smoothed
    target/raw hashed-ngram models, per-doc signed sum in bucket
    order) on a hand corpus — and the monotonicity law: a doc made of
    target-typical text outweighs one made of off-target text."""
    import hashlib
    import math
    from collections import Counter

    from ydb_vector_search_demo_spark.operators.curation import (
        dsir_importance_weights,
    )

    rows = [
        (1, "the quick brown fox jumps", "src1"),
        (2, "the quick brown fox sleeps", "src1"),
        (3, "stock market prices fall fast", "src2"),
        (4, "stock market prices rise fast", "src2"),
        (5, "the quick brown fox returns", "src3"),   # target-like
        (6, "stock market crash deepens fast", "src3"),  # off-target
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, source STRING"
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], round(r["log_weight"], 6))
        for r in dsir_importance_weights(
            docs, target_source="src1", n_buckets=512
        ).collect()
    }

    B = 512

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % B

    def grams(text):
        t = text.split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    db = {}
    for did, text, src in rows:
        c = Counter(bucket(g) for g in grams(text))
        db[did] = (src, c)
    qm, pm = Counter(), Counter()
    for did, (src, c) in db.items():
        qm.update(c)
        if src == "src1":
            pm.update(c)
    tq, tp = sum(qm.values()), sum(pm.values())
    want = {}
    for did, (src, c) in db.items():
        part = 0.0
        for b in sorted(c):  # the ordered-cumulative sequence
            part += c[b] * (
                math.log(pm.get(b, 0) + 1) - math.log(qm.get(b, 0) + 1)
            )
        n = sum(c.values())
        lw = part + n * (math.log(tq + B) - math.log(tp + B))
        want[did] = (n, round(lw, 6))
    assert got == want
    # n_ngrams = 2*tokens - 1 (unigrams + bigrams)
    assert got[1][0] == 2 * 5 - 1
    # monotonicity: target-like doc 5 outweighs off-target doc 6
    assert got[5][1] > got[6][1]


def test_dsir_importance_weights_excludes_zero_token_docs(spark):
    """r12 ADVICE (medium): a zero-token document (empty/whitespace/
    punctuation-only text) used to crash the whole job — tokens()
    yields an empty array, so the bigram slice length size-1 = -1
    raised INVALID_PARAMETER_VALUE.LENGTH. The docstring contract (and
    the DuckDB oracle) EXCLUDE such docs; the Spark side must too."""
    from ydb_vector_search_demo_spark.operators.curation import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "src1"),
            (2, "", "src2"),            # empty
            (3, "   ", "src2"),         # whitespace-only
            (4, "    ", "src2"),        # spaces-only (trim -> empty)
            (5, "stock market fall", "src2"),
        ],
        "doc_id BIGINT, text STRING, source STRING",
    )
    got = dsir_importance_weights(docs, target_source="src1").collect()
    assert sorted(r["doc_id"] for r in got) == [1, 5]
    # single-token docs (no bigrams) must still survive the slice
    one = spark.createDataFrame(
        [(1, "hello", "src1"), (2, "world", "src2")],
        "doc_id BIGINT, text STRING, source STRING",
    )
    rows = dsir_importance_weights(one, target_source="src1").collect()
    assert sorted((r["doc_id"], r["n_ngrams"]) for r in rows) == [(1, 1), (2, 1)]


def _unigram_reference(texts, L=4, seed_keep=64, final_keep=32):
    """Independent hand-rolled unigram-LM trainer (Kudo 2018 hard-EM,
    the test-side twin of curation.unigram_lm_train): substring
    seeding, integer micro-nat scores, Viterbi with the
    shortest-piece tie-break, usage-count M-step, keep-all-chars
    prune, second EM round. Pure Python — shares no code with the
    operator."""
    import decimal
    import math
    from collections import Counter

    SENT = -(2**62)
    wc = Counter(w for t in texts for w in t.split())
    subs = Counter()
    for w, n in wc.items():
        for i in range(len(w)):
            for l in range(1, min(L, len(w) - i) + 1):
                subs[w[i:i + l]] += n
    seed = {p: c for p, c in subs.items() if len(p) == 1}
    seed.update(
        dict(
            sorted(
                ((p, c) for p, c in subs.items() if len(p) >= 2),
                key=lambda x: (-x[1], x[0]),
            )[:seed_keep]
        )
    )

    def scores(vocab):
        T, V = sum(vocab.values()), len(vocab)
        return {
            p: int(
                decimal.Decimal(
                    (math.log(c + 1) - math.log(T + V)) * 1e6
                ).quantize(0, rounding=decimal.ROUND_HALF_UP)
            )
            for p, c in vocab.items()
        }

    def viterbi(w, sc):
        dp, seg = [0] + [None] * len(w), [""] * (len(w) + 1)
        for j in range(1, len(w) + 1):
            cands = []
            for l in range(1, L + 1):
                p = w[j - l:j] if j - l >= 0 else None
                cands.append(
                    dp[j - l] + sc[p]
                    if p is not None and p in sc
                    else SENT
                )
            best = max(cands)
            dp[j] = best
            l = cands.index(best) + 1  # smallest l among the argmax set
            seg[j] = seg[j - l] + " " + w[j - l:j]
        return dp[len(w)], seg[len(w)].strip()

    def em(vocab):
        sc = scores(vocab)
        used, segs = Counter(), {}
        for w, n in wc.items():
            d, s = viterbi(w, sc)
            segs[w] = (d, s)
            for p in s.split(" "):
                used[p] += n
        return {p: used.get(p, 0) for p in vocab}, segs

    c1, _ = em(seed)
    pruned = {p: c for p, c in c1.items() if len(p) == 1}
    pruned.update(
        dict(
            sorted(
                ((p, c) for p, c in c1.items() if len(p) >= 2),
                key=lambda x: (-x[1], x[0]),
            )[:final_keep]
        )
    )
    c2, segs2 = em(pruned)
    return c2, scores(c2), segs2, wc


_UNIGRAM_TEXTS = [
    "lowering lowered lower low",
    "newest newer new news",
    "widest wider wide",
    "low lower newest wide widest lowering",
    "the news is new the newest is newer",
]


def test_unigram_lm_train_matches_reference(spark):
    """curation.unigram_lm_train against the independent hand-rolled
    trainer on a hand corpus — seed counts, both EM rounds, the
    prune, and the final integer micro-nat scores all index-for-index
    equal (the BPE-reference test convention applied to the unigram
    family)."""
    from ydb_vector_search_demo_spark.operators.curation import (
        unigram_lm_train,
    )

    c2, sc2, _, _ = _unigram_reference(_UNIGRAM_TEXTS)
    want = {p: (len(p), c2[p], sc2[p]) for p in c2}
    docs = spark.createDataFrame(
        list(enumerate(_UNIGRAM_TEXTS)), "doc_id BIGINT, text STRING"
    )
    got = {
        r["piece"]: (r["piece_len"], r["n_uses"], r["score_micro"])
        for r in unigram_lm_train(docs).collect()
    }
    assert got == want
    # sanity on the corpus itself: multi-char merges actually won
    assert any(len(p) >= 2 and c > 0 for p, (_, c, _) in got.items())


def test_unigram_lm_segment_laws(spark):
    """unigram_lm_segment invariants: every word's pieces concatenate
    back to the word exactly (full coverage, no overlap), every piece
    is in the trained vocabulary, dp_micro equals the sum of the
    pieces' final-model... (NOT final: the DP ran under the ROUND-1
    pruned scores — so instead check dp_micro equals the reference
    segmentation score), and segmentation matches the independent
    reference word-for-word."""
    from ydb_vector_search_demo_spark.operators.curation import (
        unigram_lm_segment,
        unigram_lm_train,
    )

    _, _, segs2, wcnt = _unigram_reference(_UNIGRAM_TEXTS)
    docs = spark.createDataFrame(
        list(enumerate(_UNIGRAM_TEXTS)), "doc_id BIGINT, text STRING"
    )
    got = {
        r["w"]: (r["dp_micro"], list(r["pieces"]), r["n_pieces"], r["n_w"])
        for r in unigram_lm_segment(docs).collect()
    }
    assert set(got) == set(wcnt)
    vocab = {
        r["piece"] for r in unigram_lm_train(docs).collect()
    }
    for w, (dp, pieces, n_pieces, n_w) in got.items():
        assert "".join(pieces) == w          # exact coverage
        assert n_pieces == len(pieces)
        assert n_w == wcnt[w]
        assert all(p in vocab for p in pieces)
        ref_dp, ref_seg = segs2[w]
        assert (dp, " ".join(pieces)) == (ref_dp, ref_seg)
    # fertility seam (the bpe_train_segment readout convention):
    # corpus fertility = sum n_w * n_pieces / sum n_w, bounded by
    # [1, max word length]
    tot_pieces = sum(n_w * n for _, (_, _, n, n_w) in got.items())
    tot_words = sum(wcnt.values())
    fert = tot_pieces / tot_words
    assert 1.0 <= fert <= max(len(w) for w in wcnt)


def test_bpe_fertility_matches_reference(spark):
    """curation.bpe_train_segment fertility readout against the same
    independent BPE reference: train on the GLOBAL word table, apply
    every merge, and check per-language tokens-per-word — including
    that a language whose words resist the learned merges shows
    higher fertility."""
    from collections import Counter

    from pyspark.sql import functions as F

    from ydb_vector_search_demo_spark.operators.curation import (
        bpe_train_segment,
    )

    rows = [
        (1, "low low low lowest", "aa"),
        (2, "lowest low lower", "aa"),
        (3, "xyz qrs xyz", "bb"),  # shares no pairs with the merges
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING"
    )
    seg = bpe_train_segment(docs, steps=2)
    lc = (
        docs.select("lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {
        r["lang"]: (r["nw"], r["ns"])
        for r in lc.join(seg.select("w", F.size("syms").alias("_l")), "w")
        .groupBy("lang")
        .agg(
            F.sum("n").alias("nw"),
            F.sum(F.col("n") * F.col("_l")).alias("ns"),
        )
        .collect()
    }

    wc = Counter(w for _, t, _l in rows for w in t.split())
    syms = {w: list(w) for w in wc}
    for _ in range(2):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        mx = max(pc.values())
        a, b = sorted(k for k, v in pc.items() if v == mx)[0]
        for w, s in syms.items():
            out, prev = [], None
            for x in s:
                if prev is None:
                    prev = x
                elif prev == a and x == b:
                    out.append(a + b)
                    prev = None
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            syms[w] = out
    want = {}
    for _, t, lang in rows:
        for w in t.split():
            nw, ns = want.get(lang, (0, 0))
            want[lang] = (nw + 1, ns + len(syms[w]))
    assert got == want
    # the merge-resistant language fragments more per word
    assert got["bb"][1] / got["bb"][0] > got["aa"][1] / got["aa"][0]


def test_span_corruption_matches_reference(spark):
    """curation.span_corruption_examples against an independent
    Python construction (hashlib md5 phase, 20-stride grid, length-3
    spans, sentinel assembly) — plus the short-doc passthrough law
    (no span fits -> n_spans 0 and the text survives verbatim) and
    the round-trip law (splicing each target span back over its
    sentinel reconstructs the original token stream)."""
    import hashlib

    from ydb_vector_search_demo_spark.operators.curation import (
        span_corruption_examples,
    )

    texts = {
        1: " ".join(f"tok{i}" for i in range(45)),
        2: "only two",
        3: " ".join(f"w{i}" for i in range(23)),
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in sorted(texts.items())],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_spans"], r["input"], r["target"]
        )
        for r in span_corruption_examples(
            docs, span_len=3, stride=20
        ).collect()
    }

    def ref(doc_id, text):
        t = text.split()
        n = len(t)
        k = int(
            hashlib.md5(f"span-v1:{doc_id}".encode()).hexdigest()[:13],
            16,
        ) % 20
        starts = list(range(k, n - 3 + 1, 20)) if n - 3 >= k else []
        inp, tgt, prev = [], [], 0
        for idx, s in enumerate(starts):
            inp += t[prev:s] + [f"<extra_id_{idx}>"]
            tgt += [f"<extra_id_{idx}>"] + t[s:s + 3]
            prev = s + 3
        inp += t[prev:]
        return (n, len(starts), " ".join(inp), " ".join(tgt))

    want = {d: ref(d, txt) for d, txt in texts.items()}
    assert got == want
    # short-doc passthrough
    assert got[2][1] == 0 and got[2][2] == texts[2] and got[2][3] == ""
    # round-trip: splice targets back over sentinels
    for d, txt in texts.items():
        n, ns, inp, tgt = got[d]
        toks = inp.split()
        tgt_toks = tgt.split()
        spans = {}
        cur = None
        for x in tgt_toks:
            if x.startswith("<extra_id_"):
                cur = x
                spans[cur] = []
            else:
                spans[cur].append(x)
        out = []
        for x in toks:
            out += spans[x] if x in spans else [x]
        assert out == txt.split(), d


def test_skyline_2d_laws(spark):
    """stats.skyline_2d on hand points: dominated points drop, the
    frontier survives, equal-(cost,gain) duplicates BOTH survive (one
    strict required for dominance), a same-cost lower-gain point
    drops, groups are independent — checked against the definition by
    brute force."""
    from ydb_vector_search_demo_spark.operators.stats import skyline_2d

    pts = [
        # group A: frontier is (1,5), (3,8), (7,9); (3,8) duplicated
        ("A", 1, 1, 5), ("A", 2, 3, 8), ("A", 3, 3, 8),
        ("A", 4, 3, 7),          # same cost, lower gain -> dominated
        ("A", 5, 5, 8),          # costlier, no more gain -> dominated
        ("A", 6, 7, 9),
        ("A", 7, 8, 1),          # dominated by everything cheap+high
        # group B: single point always survives
        ("B", 8, 100, 1),
    ]
    df = spark.createDataFrame(
        pts, "grp STRING, id BIGINT, cost BIGINT, gain BIGINT"
    )
    got = {
        r["id"] for r in skyline_2d(df, "cost", "gain", "grp").collect()
    }

    def dominated(a, b):  # b dominates a (same group)
        return (
            b[0] == a[0] and b[2] <= a[2] and b[3] >= a[3]
            and (b[2] < a[2] or b[3] > a[3])
        )

    want = {
        a[1]
        for a in pts
        if not any(dominated((a[0], a[1], a[2], a[3]), b) for b in pts)
    }
    assert got == want == {1, 2, 3, 6, 8}


def test_skyline_2d_rejects_non_integer_criteria(spark):
    """r12 ADVICE (low): fractional costs would silently corrupt the
    frontier (10.2 lands in neither the strict-less bigint frame of
    10.7 nor its equal-cost partition), so the documented exact-integer
    mandate is now enforced — non-integral cost OR gain raises
    TypeError naming the column; cast-to-cents input passes."""
    import pytest as _pytest

    from pyspark.sql import functions as F
    from ydb_vector_search_demo_spark.operators.stats import skyline_2d

    df = spark.createDataFrame(
        [(1, 10.2, 5), (2, 10.7, 4)], "id BIGINT, cost DOUBLE, gain BIGINT"
    )
    with _pytest.raises(TypeError, match="'cost' is double"):
        skyline_2d(df, "cost", "gain")
    with _pytest.raises(TypeError, match="'gain' is double"):
        skyline_2d(df.select("id", F.col("gain").cast("double").alias("gain"),
                             F.col("cost").cast("bigint").alias("cost")),
                   "cost", "gain")
    # cents conversion makes the same data legal, frontier correct:
    # (1020, 5) and (1070, 4) are mutually non-dominating
    cents = df.select(
        "id", (F.col("cost") * 100).cast("bigint").alias("cost"), "gain"
    )
    assert {r["id"] for r in skyline_2d(cents, "cost", "gain").collect()} == {1}
    # int (not just bigint) criteria are fine
    small = spark.createDataFrame(
        [(1, 10, 5), (2, 11, 4)], "id BIGINT, cost INT, gain INT"
    )
    assert {r["id"] for r in skyline_2d(small, "cost", "gain").collect()} == {1}


def test_doremi_domain_weights_matches_reference(spark):
    """curation.doremi_domain_weights against an independent
    hand-rolled replay (Counter LMs, decimal-rounded micro-bits, the
    same 30-term Horner softmax) on a hand corpus — plus the
    qualitative DoReMi laws: weights sum to ~1, every weight is at
    least the smoothing floor s/K, and the domain whose own LM beats
    the global LM by the most bits/token gets the largest weight."""
    import decimal
    import math
    from collections import Counter

    from ydb_vector_search_demo_spark.operators.curation import (
        doremi_domain_weights,
    )

    rows = [
        (1, "alpha beta gamma alpha beta", "specialized"),
        (2, "alpha beta gamma gamma beta", "specialized"),
        (3, "one two three four five six", "generic"),
        (4, "seven eight nine ten one two", "generic"),
        (5, "alpha one beta two gamma three", "mixed"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, source STRING"
    )
    got = {
        r["source"]: (
            r["n_tokens"], r["excess_micro"], r["excess_bits"], r["weight"]
        )
        for r in doremi_domain_weights(
            docs, eta=1.0, smoothing=0.2
        ).collect()
    }

    # independent reference
    def rnd(x):
        return int(
            decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )

    dom_tok = {}
    for _, t, s in rows:
        dom_tok.setdefault(s, []).extend(t.split())
    gc = Counter(t for ts in dom_tok.values() for t in ts)
    tg, v = sum(gc.values()), len(gc)

    def ubits(c, t):
        return rnd(-math.log2((c + 0.5) / (t + 0.5 * v)) * 1e6)

    per = {}
    for s, ts in dom_tok.items():
        dc = Counter(ts)
        td = sum(dc.values())
        ex = sum(
            (ubits(gc[t], tg) - ubits(dc[t], td)) * n for t, n in dc.items()
        )
        per[s] = (td, ex)

    def horner(x, terms=30):
        p = 1.0
        for k in range(terms, 0, -1):
            p = 1.0 + x / k * p
        return p

    xs = {s: 1.0 * ex / (1e6 * n) for s, (n, ex) in per.items()}
    m = max(xs.values())
    es = {s: horner(x - m) for s, x in xs.items()}
    den = 0.0
    for s in sorted(es):  # the ordered-cumulative sequence
        den += es[s]
    def rnd6(x):
        # Spark's F.round = BigDecimal.valueOf(double) + HALF_UP, i.e.
        # HALF_UP on the SHORTEST decimal repr (Double.toString), which
        # DuckDB's round agrees with at the half boundary (checked on
        # 8110182/12e6) — NOT Python's banker's round(), and NOT
        # HALF_UP on the exact binary expansion (Decimal(x) directly)
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    want = {}
    for s, (n, ex) in per.items():
        want[s] = (
            n,
            ex,
            rnd6(ex / (1e6 * n)),
            rnd6(0.8 * es[s] / den + 0.2 / len(per)),
        )
    assert got == want
    # laws
    total = sum(w for *_, w in got.values())
    assert abs(total - 1.0) < 1e-5
    assert all(w >= 0.2 / len(got) - 1e-9 for *_, w in got.values())
    best = max(got, key=lambda s: got[s][2])
    assert got[best][3] == max(w for *_, w in got.values())
    # 'specialized' has the most domain-specific token distribution
    assert best == "specialized"


def test_pinned_exp_is_exact_horner_and_close_to_exp(spark):
    """pinned_exp must equal the hand Horner evaluation bitwise (the
    determinism contract) and track math.exp to ~1e-12 on the shifted
    domain x <= 0 it is used on."""
    import math

    from pyspark.sql import functions as F
    from ydb_vector_search_demo_spark.operators.curation import pinned_exp

    vals = [0.0, -0.01, -0.5, -1.0, -2.5, -4.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i INT, x DOUBLE"
    ).select("i", "x", pinned_exp(F.col("x")).alias("e"))

    def horner(x, terms=30):
        p = 1.0
        for k in range(terms, 0, -1):
            p = 1.0 + x / k * p
        return p

    for r in df.collect():
        assert r["e"] == horner(r["x"])  # bitwise (same IEEE op sequence)
        assert abs(r["e"] - math.exp(r["x"])) <= 1e-12 * math.exp(r["x"]) + 1e-15


def test_kcore_peel_matches_brute_force(spark):
    """ann.kcore_peel against a brute-force Python peel on a hand
    graph with a known 3-core (a K4 clique survives; a pendant chain
    cascades away round by round), including the isolated-node case
    (degree 0 counts as < k) and the fixpoint rows (n_removed 0)."""
    from ydb_vector_search_demo_spark.operators.ann import kcore_peel

    # K4 on {1,2,3,4} (3-core) + chain 4-5-6 + pendant 7 off 5
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (5, 7),
    ]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = sorted(
        tuple(r) for r in kcore_peel(df, k=3, rounds=4).collect()
    )

    # brute force
    und = {tuple(sorted(e)) for e in edges}
    nodes = {n for e in und for n in e}
    want = []
    for t in range(1, 5):
        deg = {n: 0 for n in nodes}
        for u, v in und:
            deg[u] += 1
            deg[v] += 1
        removed = {n for n in nodes if deg[n] < 3}
        nodes -= removed
        und = {e for e in und if e[0] in nodes and e[1] in nodes}
        want.append((t, len(removed), len(nodes), len(und)))
    assert got == sorted(want)
    # the K4 clique is the 3-core and survives every round
    assert got[-1][2] == 4 and got[-1][3] == 6
    assert got[-1][1] == 0  # fixpoint reached
    # round 1 peels the fringe {6, 7}; round 2 cascades 5; round 3: 4
    # stays (its K4 degree is 3 even after 5 leaves)
    assert got[0][1] == 2 and got[1][1] == 1 and got[2][1] == 0


def test_pack_sequences_ffd_matches_brute_force(spark):
    """curation.pack_sequences_ffd against a brute-force FFD replay on
    hand data: largest-first order with the doc-id tie-break, each
    item in the lowest-numbered fitting pack, oversized items open
    their own (overfull) pack, capacity law holds, and on this corpus
    FFD uses strictly fewer packs than the next-fit walk (the
    padding-waste claim)."""
    from ydb_vector_search_demo_spark.operators.curation import (
        pack_sequences,
        pack_sequences_ffd,
    )

    rows = [
        # bucket 0: sizes desc = 7,5,4,3,2 at budget 8
        (0, 1, 7), (0, 2, 5), (0, 3, 4), (0, 4, 3), (0, 5, 2),
        # bucket 1: an oversized item + a tie on size (doc order breaks)
        (1, 6, 9), (1, 7, 4), (1, 8, 4), (1, 9, 4),
    ]
    df = spark.createDataFrame(rows, "bucket INT, doc_id BIGINT, n_tokens BIGINT")
    got = {
        (r["bucket"], r["doc_id"]): r["pack_id"]
        for r in pack_sequences_ffd(df, budget=8).collect()
    }

    def ffd(items, budget=8):
        caps, out = [], {}
        for did, t in sorted(items, key=lambda x: (-x[1], x[0])):
            for i, c in enumerate(caps):
                if c >= t:
                    caps[i] = c - t
                    out[did] = i
                    break
            else:
                caps.append(budget - t)
                out[did] = len(caps) - 1
        return out, caps

    want = {}
    n_packs = {}
    for b in (0, 1):
        assign, caps = ffd([(d, t) for bb, d, t in rows if bb == b])
        n_packs[b] = len(caps)
        for d, p in assign.items():
            want[(b, d)] = p
    assert got == want
    # capacity law: no pack over budget unless it is one oversized item
    from collections import defaultdict

    totals = defaultdict(list)
    for (b, d), p in got.items():
        t = next(t for bb, dd, t in rows if bb == b and dd == d)
        totals[(b, p)].append(t)
    for (b, p), ts in totals.items():
        assert sum(ts) <= 8 or (len(ts) == 1 and ts[0] > 8), (b, p, ts)
    # bucket 0: FFD packs {7}, {5,3}, {4,2} = 3 packs; next-fit walks
    # doc order 7|5|4,3|2 = 4 packs — the offline walk strictly wins
    nf = pack_sequences(df, budget=8).collect()
    nf_packs = len({(r["bucket"], r["pack_id"]) for r in nf if r["bucket"] == 0})
    assert n_packs[0] == 3 and nf_packs == 4


def test_wordpiece_merge_steps_matches_reference(spark):
    """curation.wordpiece_merge_steps against an independent
    line-by-line Schuster-Nakajima reference (word-frequency table,
    '##'-prefixed continuation symbols, unary + pair counts, winner
    by pair/(lhs·rhs) likelihood score with (score desc, count desc,
    lhs, rhs) order, '##'-stripping merge, leftmost-greedy
    application) on a hand corpus — five full steps. Also the
    criterion-divergence law: on this corpus WordPiece's first merge
    differs from BPE's (likelihood prefers rare-apart parts over raw
    frequency)."""
    from collections import Counter

    from ydb_vector_search_demo_spark.operators.curation import (
        bpe_merge_steps,
        wordpiece_merge_steps,
    )

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "widest widest widest",
        "quiz quiz",  # rare symbols pair up early under likelihood
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"], r["lhs_count"],
         r["rhs_count"], r["score"], r["merged"])
        for r in wordpiece_merge_steps(docs, steps=5).orderBy("step").collect()
    ]

    wc = Counter(w for t in texts for w in t.split())
    syms = {w: [c if i == 0 else "##" + c for i, c in enumerate(w)]
            for w in wc}
    want = []
    for step in range(1, 6):
        uc, pc = Counter(), Counter()
        for w, s in syms.items():
            for x in s:
                uc[x] += wc[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        # winner: score desc, count desc, lhs, rhs — one IEEE division
        # of exact ints, the operator's own comparison
        best = min(
            pc.items(),
            key=lambda kv: (-(kv[1] / float(uc[kv[0][0]] * uc[kv[0][1]])),
                            -kv[1], kv[0][0], kv[0][1]),
        )
        (a, b), cnt = best
        merged = a + b.removeprefix("##")
        want.append((step, a, b, cnt, uc[a], uc[b],
                     round(cnt / float(uc[a] * uc[b]), 6), merged))
        for w, s in syms.items():
            out, prev = [], None
            for x in s:
                if prev is None:
                    prev = x
                elif prev == a and x == b:
                    out.append(merged)
                    prev = None
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            syms[w] = out
    assert got == want

    # criterion divergence: BPE's frequency argmax picks a different
    # first merge than WordPiece's likelihood argmax on this corpus
    bpe1 = bpe_merge_steps(docs, steps=1).collect()[0]
    assert (bpe1["lhs"], bpe1["rhs"]) != (got[0][1], got[0][2])


def test_repetition_budget_plan_matches_reference(spark):
    """curation.repetition_budget_plan against an independent
    hand-rolled Muennighoff-2023 reference (exact floor-division
    allocation, one-division epochs, the U*(1 + R**(1-e^(-R/R*)))
    decay with an independently coded 30-term Horner exp) on a hand
    corpus spanning both regimes — plus the laws: a sub-1-epoch
    source keeps its allocation verbatim (continuity at 1 epoch), a
    repeated source's effective tokens fall strictly between U and
    its allocation, utilization decreases with epochs, and
    repeat_excess fires exactly above 4 epochs."""
    from pyspark.sql import functions as F

    from ydb_vector_search_demo_spark.operators.curation import (
        repetition_budget_plan,
    )

    # src0 -> share 1, src1 -> share 2, src4 -> share 5 (den = 8)
    docs = spark.createDataFrame(
        [(0, "w " * 100, "src0"), (1, "w " * 40, "src1"),
         (2, "w " * 10, "src4")],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {
        r["source"]: r.asDict()
        for r in repetition_budget_plan(
            docs,
            share_num=(
                F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int")
                % 5 + 1
            ),
            budget_epochs=3,
        ).collect()
    }

    def horner_exp(x: float, terms: int = 30) -> float:
        acc = 1.0
        for k in range(terms, 0, -1):
            acc = 1.0 + x / k * acc
        return acc

    T, den, budget = 150, 8, 3 * 150
    for src, u, num in [("src0", 100, 1), ("src1", 40, 2), ("src4", 10, 5)]:
        alloc = budget * num // den
        epochs = alloc / float(u)
        if epochs <= 1.0:
            eff = float(alloc)
        else:
            r = epochs - 1.0
            eff = float(u) * (1.0 + 15.4 * (1.0 - horner_exp(-r / 15.4)))
        row = got[src]
        assert row["n_tokens"] == u and row["share_num"] == num
        assert row["allocated_tokens"] == alloc
        assert row["epochs"] == round(epochs, 6)
        assert row["effective_tokens"] == round(eff, 3)
        assert row["utilization"] == round(eff / alloc, 6)
        assert row["repeat_excess"] is (epochs > 4.0)
    # regime laws: src0 under one epoch (alloc 56 < 100 tokens);
    # src1 repeated (alloc 112 over 40 tokens = 2.8 epochs, no flag);
    # src4 pushed to 28 epochs (flagged, value capped near U*(1+R*))
    assert got["src0"]["epochs"] < 1.0 and not got["src0"]["repeat_excess"]
    assert got["src0"]["effective_tokens"] == got["src0"]["allocated_tokens"]
    assert 1.0 < got["src1"]["epochs"] < 4.0
    assert got["src1"]["n_tokens"] < got["src1"]["effective_tokens"] \
        < got["src1"]["allocated_tokens"]
    assert got["src4"]["repeat_excess"] is True
    assert got["src4"]["effective_tokens"] < 10 * (1 + 15.4)
    assert got["src4"]["utilization"] < got["src1"]["utilization"] \
        < got["src0"]["utilization"]


def test_bitext_margin_mine_matches_reference(spark):
    """curation.bitext_margin_mine against an independent brute-force
    Artetxe-Schwenk reference (sequential-fold cosines, rank-ordered
    k-sums, ratio margin, margin-argmax both ways with id tie-breaks,
    intersection, threshold) on a planted corpus — plus the semantic
    laws: the two planted translation pairs are mined, and the HUB
    vector (close to everything) is suppressed by the ratio margin
    even though its raw cosines are high."""
    import math

    from ydb_vector_search_demo_spark.operators.curation import (
        bitext_margin_mine,
    )

    X = {1: [1.0, 0.05, 0.0], 2: [0.0, 1.0, 0.05], 3: [0.6, 0.55, 0.05]}
    Y = {11: [0.99, 0.06, 0.01],   # planted pair of x1
         12: [0.01, 0.99, 0.06],   # planted pair of x2
         13: [0.577, 0.577, 0.577],  # hub: close to every x
         14: [0.0, 0.05, 1.0]}     # orphan direction
    k, thresh = 2, 1.15

    def cos(a, b):
        d = 0.0
        for p, q in zip(a, b):
            d += p * q
        na = math.sqrt(sum(p * p for p in a))
        nb = math.sqrt(sum(q * q for q in b))
        return d / (na * nb)

    sc = {(x, y): cos(X[x], Y[y]) for x in X for y in Y}

    def ksum(side_ids, other_ids, key):
        out = {}
        for s in side_ids:
            ranked = sorted(other_ids, key=lambda o: (-sc[key(s, o)], o))[:k]
            acc = 0.0
            for o in ranked:
                acc += sc[key(s, o)]
            out[s] = acc
        return out

    sx = ksum(X, Y, lambda s, o: (s, o))
    sy = ksum(Y, X, lambda s, o: (o, s))
    mg = {
        (x, y): sc[(x, y)] / (sx[x] / (2.0 * k) + sy[y] / (2.0 * k))
        for x in X for y in Y
    }
    fwd = {x: min(Y, key=lambda y: (-mg[(x, y)], y)) for x in X}
    bwd = {y: min(X, key=lambda x: (-mg[(x, y)], x)) for y in Y}
    want = sorted(
        (x, y, round(sc[(x, y)], 6), round(mg[(x, y)], 6))
        for x, y in fwd.items()
        if bwd[y] == x and mg[(x, y)] >= thresh
    )

    xdf = spark.createDataFrame(
        [(0, i, v) for i, v in X.items()],
        "label INT, vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    ydf = spark.createDataFrame(
        [(0, i, v) for i, v in Y.items()],
        "label INT, vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = sorted(
        tuple(r)
        for r in bitext_margin_mine(
            xdf, ydf, k=k, threshold=thresh, bucket_col="label"
        ).collect()
    )
    assert got == want
    mined = {(a, b) for a, b, _, _ in got}
    assert (1, 11) in mined and (2, 12) in mined  # planted pairs
    assert 13 not in {b for _, b in mined}        # hub suppressed
    # hub raw cosine IS competitive — the ratio margin did the work
    assert sc[(3, 13)] > sc[(3, 14)]


def test_pinned_normal_two_sided_p_laws(spark):
    """stats.pinned_normal_two_sided_p: within the documented A&S
    1.5e-7 absolute bound of libm erfc on a z grid, symmetric in the
    sign of z, monotone decreasing in |z|, and bit-identical to the
    independently-written Python replay of the pinned chain (the
    cross-engine contract is the SAME double, not closeness)."""
    import math

    from ydb_vector_search_demo_spark.operators.stats import (
        _AS_ERFC_A,
        _AS_ERFC_P,
        _INV_SQRT2_DEN,
        pinned_normal_two_sided_p,
    )

    def py_pinned(z):
        x = abs(z) / _INV_SQRT2_DEN
        t = 1.0 / (1.0 + _AS_ERFC_P * x)
        e = 1.0
        y = (-(x * x)) / 64.0
        for k in range(30, 0, -1):
            e = 1.0 + y / float(k) * e
        for _ in range(6):
            e = e * e
        a1, a2, a3, a4, a5 = _AS_ERFC_A
        return ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * e

    zs = [0.0, 0.3, -0.3, 1.0, 2.0, -2.0, 3.5, 4.43, -4.43, 5.22, 7.0]
    df = spark.createDataFrame([(z,) for z in zs], "z DOUBLE")
    got = {
        r["z"]: r["p"]
        for r in df.withColumn(
            "p", pinned_normal_two_sided_p(F.col("z"))
        ).collect()
    }
    for z in zs:
        ref = math.erfc(abs(z) / math.sqrt(2.0))
        assert abs(got[z] - ref) <= 1.5e-7, (z, got[z], ref)
        assert got[z] == py_pinned(z), (z, got[z], py_pinned(z))
    assert got[2.0] == got[-2.0] and got[4.43] == got[-4.43]
    mags = sorted({abs(z) for z in zs})
    ps = [got[m] if m in got else got[-m] for m in mags]
    assert all(a > b for a, b in zip(ps, ps[1:])), ps


def test_hourly_anomaly_fdr_matches_reference(spark):
    """stats.hourly_anomaly_fdr on the sf0.001 events table against an
    independent plain-Python replay: Counter the (type, hour) grain,
    exact integer moments per type, the rounded z, the pinned p, and
    the BH step-up (sort, k* = max{i : p <= i*q/m}, keep 1..k) — exact
    row/tuple equality. Plus the shape laws: ranks are contiguous from
    1, every kept row clears its own BH threshold, and the output is
    p-ascending."""
    import math
    from collections import Counter, defaultdict

    from ydb_vector_search_demo_spark.operators.stats import (
        hourly_anomaly_fdr,
    )

    events = load_table(spark, SF_SMOKE, "events")
    got = hourly_anomaly_fdr(events, q_fdr=0.1).collect()

    raw = events.select("event_type", "ts").collect()
    cnt = Counter(
        (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        for r in raw
    )
    per_type = defaultdict(list)
    for (et, hs), n in cnt.items():
        per_type[et].append((hs, n))

    def py_pinned(z):
        x = abs(z) / 1.4142135623730951
        t = 1.0 / (1.0 + 0.3275911 * x)
        e = 1.0
        y = (-(x * x)) / 64.0
        for k in range(30, 0, -1):
            e = 1.0 + y / float(k) * e
        for _ in range(6):
            e = e * e
        return (
            (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592
        ) * t * e

    scored = []
    for et, hours in per_type.items():
        c = len(hours)
        s1 = sum(n for _, n in hours)
        s2 = sum(n * n for _, n in hours)
        if c <= 1 or (s2 - s1 * s1 / (1.0 * c)) / (c - 1) <= 0:
            continue
        for hs, n in hours:
            z = round(
                (n - s1 / (1.0 * c))
                / math.sqrt((s2 - s1 * s1 / (1.0 * c)) / (c - 1)),
                6,
            )
            scored.append((py_pinned(z), et, hs, n, z))
    scored.sort(key=lambda r: (r[0], r[1], r[2]))
    m = len(scored)
    kstar = max(
        (i + 1 for i, (p, *_) in enumerate(scored) if p <= (i + 1) * 0.1 / m),
        default=0,
    )
    want = [
        (et, hs, n, z, round(p, 12), i + 1)
        for i, (p, et, hs, n, z) in enumerate(scored[:kstar])
    ]
    got_t = [
        (r["event_type"], r["hour_start"], r["n"], r["z"], r["p_value"],
         r["p_rank"])
        for r in got
    ]
    assert got_t == want
    assert len(got_t) > 0  # fixture is live at sf0.001
    assert [r[5] for r in got_t] == list(range(1, len(got_t) + 1))
    for et, hs, n, z, p, rank in got_t:
        assert p <= rank * 0.1 / m + 1e-15
    ps = [r[4] for r in got_t]
    assert ps == sorted(ps)


def test_wordpiece_apply_fertility_matches_reference(spark):
    """curation.wordpiece_apply_fertility against an independent
    plain-Python replay of the whole chain on a hand corpus: the
    Schuster-Nakajima trainer (as in the merges test), vocab =
    alphabet-in-symbol-form + merges, greedy longest-match (MaxMatch)
    with head/continuation split, per-language fertility rollup —
    exact tuple equality. Shape laws: n_unk is 0 on a corpus-derived
    vocabulary (every (char, position-class) occurring in the corpus
    is in the vocab, so the single-char fallback always matches) and
    fertility is the rounded subword/word ratio. Plus the guard law:
    a max_piece_len smaller than a trained merge raises instead of
    silently never matching it."""
    from collections import Counter, defaultdict

    import pytest as _pytest

    from ydb_vector_search_demo_spark.operators.curation import (
        wordpiece_apply_fertility,
    )

    rows = [
        ("en", "low low low lower lowest"),
        ("en", "newest newest wide widest"),
        ("de", "quiz quiz lower low"),
        ("de", "widest wide wide"),
    ]
    docs = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in enumerate(rows)],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    steps, L = 6, 8
    got = [
        (r["lang"], r["n_words"], r["n_subwords"], r["n_unk"],
         r["fertility"])
        for r in wordpiece_apply_fertility(docs, steps=steps).collect()
    ]

    # --- independent replay: trainer ---
    wc = Counter(w for _, t in rows for w in t.split())
    syms = {w: [c if i == 0 else "##" + c for i, c in enumerate(w)]
            for w in wc}
    merges = []
    for _ in range(steps):
        uc, pc = Counter(), Counter()
        for w, s in syms.items():
            for x in s:
                uc[x] += wc[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        (a, b), cnt = min(
            pc.items(),
            key=lambda kv: (-(kv[1] / float(uc[kv[0][0]] * uc[kv[0][1]])),
                            -kv[1], kv[0][0], kv[0][1]),
        )
        merged = a + b.removeprefix("##")
        merges.append(merged)
        for w, s in syms.items():
            out, prev = [], None
            for x in s:
                if prev is None:
                    prev = x
                elif prev == a and x == b:
                    out.append(merged)
                    prev = None
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            syms[w] = out
    # --- vocab + MaxMatch ---
    hv, cv = set(), set()
    for w in wc:
        hv.add(w[0])
        for ch in w[1:]:
            cv.add(ch)
    for mt in merges:
        if mt.startswith("##"):
            cv.add(mt[2:])
        else:
            hv.add(mt)

    def maxmatch_len(w):
        pos, n_tok = 0, 0
        while pos < len(w):
            bl = 0
            for piece_len in range(1, L + 1):
                if pos + piece_len <= len(w):
                    piece = w[pos:pos + piece_len]
                    if (pos == 0 and piece in hv) or (pos > 0 and piece in cv):
                        bl = piece_len
            if bl == 0:
                return None
            n_tok += 1
            pos += bl
        return n_tok

    lcnt = Counter((lang, w) for lang, t in rows for w in t.split())
    agg = defaultdict(lambda: [0, 0, 0])
    for (lang, w), n in lcnt.items():
        ns = maxmatch_len(w)
        agg[lang][0] += n
        agg[lang][1] += n * (1 if ns is None else ns)
        if ns is None:
            agg[lang][2] += n
    want = sorted(
        (lang, a[0], a[1], a[2], round(a[1] / a[0], 6))
        for lang, a in agg.items()
    )
    assert got == want
    assert all(r[3] == 0 for r in got)  # corpus-derived vocab: no UNK
    for lang, n_words, n_subwords, n_unk, fert in got:
        assert fert == round(n_subwords / n_words, 6)
        assert n_subwords >= n_words

    # guard: a trained merge longer than max_piece_len raises loudly
    longest = max(len(m.removeprefix("##")) for m in merges)
    assert longest >= 3  # fixture sanity: the guard below is live
    with _pytest.raises(Exception, match="vocab token longer"):
        wordpiece_apply_fertility(docs, steps=steps, max_piece_len=2).collect()


def test_ks_drift_by_group_matches_brute_force(spark):
    """stats.ks_drift_by_group against the textbook definition by
    brute force on hand groups: D = max over the pooled value grid of
    |F_g(v) - F_rest(v)|, evaluated exactly via the integer
    common-denominator gap; at_value is the smallest grid point
    attaining the sup. Planted geometry: group B lives on a disjoint
    (shifted) support, so D(B) = 1.0 and it must flag drift; A and C
    share a distribution, so their D stays under the critical value."""
    from fractions import Fraction

    from ydb_vector_search_demo_spark.operators.stats import (
        ks_drift_by_group,
    )

    data = (
        [("A", v) for v in [1, 2, 2, 3, 4, 5, 5, 6, 7, 8]]
        + [("C", v) for v in [1, 2, 2, 3, 4, 5, 5, 6, 7, 8]]
        + [("B", v) for v in [101, 102, 103, 104, 105, 106, 107, 108, 109,
                              110]]
    )
    df = spark.createDataFrame(data, "grp STRING, val BIGINT")
    got = {
        r["grp"]: (r["n1"], r["n2"], r["at_value"], r["d_num"], r["d"],
                   r["crit"], r["drift"])
        for r in ks_drift_by_group(df, "val", "grp", alpha_c=1.224).collect()
    }

    import math
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for g, v in data:
        per[g][v] += 1
    allv = sorted({v for _, v in data})
    nt = len(data)
    for g in per:
        n1 = sum(per[g].values())
        n2 = nt - n1
        best, atv = -1, None
        C1 = C2 = 0
        for v in allv:
            c1 = per[g].get(v, 0)
            cv = sum(per[x].get(v, 0) for x in per)
            C1 += c1
            C2 += cv - c1
            gap = abs(n2 * C1 - n1 * C2)
            if gap > best:
                best, atv = gap, v
        D = best / float(n1 * n2)
        crit = 1.224 * math.sqrt(float(nt) / float(n1 * n2))
        assert got[g] == (n1, n2, atv, best, round(D, 6), round(crit, 6),
                          D > crit), g
        # exact-arithmetic law: the double D equals the exact rational
        # within one rounding
        assert abs(D - float(Fraction(best, n1 * n2))) == 0.0
    assert got["B"][4] == 1.0 and got["B"][6] is True
    # the test is group-vs-REST: A's rest CONTAINS B's shifted support,
    # so A (and identically C) genuinely drift too — but strictly less
    # than the disjoint group, and with identical readouts
    assert got["A"] == got["C"]
    assert got["A"][4] < got["B"][4]
    # B's sup is attained before its own support starts: the rest's
    # CDF saturates while B's is still flat — at the largest rest value
    assert got["B"][2] == 8


def test_pair_bleu_matches_reference(spark):
    """curation.pair_bleu against a textbook Papineni reference on
    hand pairs (clipped modified n-gram precision, brevity penalty,
    geometric mean through the same pinned /64+squarings exp): exact
    tuple equality, plus the definitional laws — an identical pair
    scores exactly 1.0 through the pinned chain; clipping caps a
    repeated candidate word at the reference count; any zero pₙ or a
    candidate shorter than max_n zeroes BLEU; a short candidate pays
    BP < 1 while a longer one does not."""
    from ydb_vector_search_demo_spark.operators.curation import pair_bleu

    texts = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "the quick brown fox jumps over the lazy dog tonight",  # == 1
        3: "the quick brown fox jumps over a lazy dog",            # near
        4: "the the the the the the",                              # clip
        5: "quick brown fox leaps over the lazy red dog tonight ok",
        6: "colorless green ideas sleep furiously every night ok",  # no 4g
        7: "fox jumps over",                                       # short
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id BIGINT, text STRING"
    )
    pair_list = [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 7)]
    pairs = spark.createDataFrame(pair_list, "a BIGINT, b BIGINT")
    got = {
        (r["a"], r["b"]): (r["len_a"], r["len_b"], r["p1"], r["p2"],
                           r["p3"], r["p4"], r["bleu"])
        for r in pair_bleu(docs, pairs, max_n=4).collect()
    }

    from collections import Counter

    def pinned_exp_red(x):
        e, y = 1.0, x / 64.0
        for k in range(30, 0, -1):
            e = 1.0 + y / float(k) * e
        for _ in range(6):
            e = e * e
        return e

    def ref_bleu(a, b):
        ta, tb = texts[a].split(), texts[b].split()
        ps, cs = [], []
        for n in range(1, 5):
            ca = Counter(tuple(ta[i:i + n]) for i in range(len(ta) - n + 1))
            cb = Counter(tuple(tb[i:i + n]) for i in range(len(tb) - n + 1))
            clip = sum(min(c, ca.get(g, 0)) for g, c in cb.items())
            denom = len(tb) - n + 1
            cs.append(clip)
            ps.append(clip / float(denom) if denom >= 1 else 0.0)
        ok = len(tb) >= 4 and all(c > 0 for c in cs)
        import math
        p_out = tuple(
            round(ps[n - 1], 6) if len(tb) >= n else 0.0 for n in range(1, 5)
        )
        if not ok:
            return (len(ta), len(tb), *p_out, 0.0)
        y = min(0.0, 1.0 - len(ta) / float(len(tb))) + (
            math.log(ps[0]) + math.log(ps[1]) + math.log(ps[2])
            + math.log(ps[3])
        ) / 4.0
        return (len(ta), len(tb), *p_out, round(pinned_exp_red(y), 6))

    for ab in pair_list:
        assert got[ab] == ref_bleu(*ab), (ab, got[ab], ref_bleu(*ab))
    assert got[(1, 2)][6] == 1.0          # identical pair, exact unity
    # clipping: candidate 4 repeats 'the' 6x, reference holds 2 -> p1=2/6
    assert got[(1, 4)][2] == round(2 / 6, 6) and got[(1, 4)][6] == 0.0
    assert got[(1, 6)][6] == 0.0          # no shared 4-gram
    assert got[(1, 7)][6] == 0.0          # candidate shorter than max_n
    assert 0.0 < got[(1, 3)][6] < 1.0     # near-dup scores in between
    # brevity: candidate 3 (9 toks) vs reference (10) pays BP < 1 — its
    # bleu is strictly below the pure geometric mean of its precisions
    import math
    g13 = got[(1, 3)]
    geo = pinned_exp_red(sum(math.log(p) for p in g13[2:6]) / 4.0)
    assert g13[6] < round(geo, 6)


def test_r14_review_guard_fixes(spark):
    """The r14 self-review findings, pinned: (1) wordpiece guard
    measures the BARE matchable key — single-char continuation
    symbols ('##x', bare length 1) must not trip max_piece_len=2,
    so a 1-step train (merge bare length 2) runs clean where the old
    full-symbol-length check raised on every corpus; (2) KS rejects
    non-integral value columns; (3) KS excludes NULL values/groups
    from totals AND CDFs consistently (identical non-null
    distributions read D=0 despite planted NULLs); (4) a single-group
    input emits no row instead of dividing by zero."""
    import pytest as _pytest

    from ydb_vector_search_demo_spark.operators.curation import (
        wordpiece_apply_fertility,
    )
    from ydb_vector_search_demo_spark.operators.stats import (
        ks_drift_by_group,
    )

    docs = spark.createDataFrame(
        [(1, "en", "low low lower"), (2, "de", "low slow glow")],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    # (1) bare-key guard: steps=1 merges 'lo'-style pairs (bare len 2)
    out = wordpiece_apply_fertility(docs, steps=1, max_piece_len=2).collect()
    assert len(out) == 2 and all(r["n_unk"] == 0 for r in out)

    # (2) non-integral value column raises loudly
    dbl = spark.createDataFrame(
        [("A", 0.31), ("B", 0.72)], "grp STRING, score DOUBLE"
    )
    with _pytest.raises(TypeError, match="exact integer value column"):
        ks_drift_by_group(dbl, "score", "grp")

    # (3) NULLs excluded consistently: A and B share the same non-null
    # distribution; A additionally holds NULL values and there is a
    # NULL group — both excluded, so neither A nor B shows drift
    rows = (
        [("A", v) for v in [1, 2, 3, 4]] + [("A", None)] * 4
        + [("B", v) for v in [1, 2, 3, 4]] + [(None, 9)] * 3
    )
    df = spark.createDataFrame(rows, "grp STRING, val BIGINT")
    got = {r["grp"]: r for r in ks_drift_by_group(df, "val", "grp").collect()}
    assert set(got) == {"A", "B"}
    assert got["A"]["d_num"] == 0 and got["B"]["d_num"] == 0
    assert got["A"]["n1"] == 4 and got["A"]["n2"] == 4

    # (4) single group: no rest to test against -> empty, no ANSI /0
    one = spark.createDataFrame([("A", 1), ("A", 2)], "grp STRING, val BIGINT")
    assert ks_drift_by_group(one, "val", "grp").collect() == []


def test_mi_dependence_laws(spark):
    """stats.mi_dependence on hand contingency tables against the
    definition: a perfectly dependent 2x2 diagonal gives MI = ln 2
    and NMI = 1.0 exactly (H_a = H_b = ln 2); an independent uniform
    2x2 gives MI = 0.0 exactly (every cell ratio is 1, ln 1 = 0 with
    no float residue); a degenerate single-category column yields
    NULL NMI (no information to normalize by) instead of dividing by
    zero; NULL keys are excluded from every count."""
    import math

    from ydb_vector_search_demo_spark.operators.stats import mi_dependence

    dep = spark.createDataFrame(
        [("x", "p")] * 5 + [("y", "q")] * 5, "a STRING, b STRING"
    )
    r = mi_dependence(dep, "a", "b").collect()[0]
    assert r["n"] == 10
    assert r["mi_nats"] == round(math.log(2), 6)
    assert r["h_a_nats"] == r["h_b_nats"] == round(math.log(2), 6)
    assert r["nmi"] == 1.0

    ind = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3,
        "a STRING, b STRING",
    )
    r = mi_dependence(ind, "a", "b").collect()[0]
    assert r["mi_nats"] == 0.0 and r["nmi"] == 0.0

    deg = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("x", "p")], "a STRING, b STRING"
    )
    r = mi_dependence(deg, "a", "b").collect()[0]
    assert r["h_a_nats"] == 0.0 and r["nmi"] is None and r["mi_nats"] == 0.0

    nul = spark.createDataFrame(
        [("x", "p"), ("x", None), (None, "q"), ("y", "q")],
        "a STRING, b STRING",
    )
    r = mi_dependence(nul, "a", "b").collect()[0]
    assert r["n"] == 2  # only fully-keyed rows count


def test_average_precision_laws(spark):
    """stats.average_precision against the step-function definition
    by hand: a perfect separator scores AP = 1.0 exactly; a
    single-block constant score collapses AP to the prevalence
    exactly (the no-skill identity); a group with no positives reads
    NULL; and a hand table with ties matches the block-exact
    reference (each distinct score enters atomically — the per-row
    P@k sum would depend on tie order)."""
    from ydb_vector_search_demo_spark.operators.stats import (
        average_precision,
    )

    rows = (
        # perfect: positives at scores 9,8 above negatives 2,1
        [("perfect", 9, True), ("perfect", 8, True),
         ("perfect", 2, False), ("perfect", 1, False)]
        # constant: one block, 3 pos / 7 neg -> AP = prevalence = 0.3
        + [("const", 5, True)] * 3 + [("const", 5, False)] * 7
        # nopos: no positives at all
        + [("nopos", 3, False), ("nopos", 1, False)]
        # ties: blocks desc: s=3 (1P,1N), s=2 (2P), s=1 (3N)
        + [("ties", 3, True), ("ties", 3, False), ("ties", 2, True),
           ("ties", 2, True), ("ties", 1, False), ("ties", 1, False),
           ("ties", 1, False)]
    )
    df = spark.createDataFrame(rows, "det STRING, score BIGINT, is_pos BOOLEAN")
    got = {
        r["det"]: r
        for r in average_precision(df, "score", "is_pos", "det").collect()
    }
    assert got["perfect"]["ap"] == 1.0
    assert got["const"]["ap"] == got["const"]["prevalence"] == 0.3
    assert got["nopos"]["ap"] is None and got["nopos"]["n_pos"] == 0
    # ties reference: blocks (p,ctp,cn) = (1,1,2), (2,3,4); P=3
    want = round((1 / 3) * (1 / 2) + (2 / 3) * (3 / 4), 6)
    assert got["ties"]["ap"] == want
    assert got["ties"]["n_scores"] == 3


def test_holt_winters_matches_reference(spark):
    """timeseries.holt_winters_forecast against an independent
    plain-Python replay on a planted 3-day hourly series (count =
    4 + hod%3 + day — trend plus a period-3-in-24 profile): exact
    tuple equality including the dense-spine zero-fill (two hours
    are left empty on purpose). Fixed-point law: a CONSTANT series
    is a fixed point of the recurrence (l stays c, b and every
    seasonal stay 0), so every forecast equals the constant exactly.
    Guard: fewer than two full seasons raises."""
    import datetime

    import pytest as _pytest

    from ydb_vector_search_demo_spark.operators.timeseries import (
        holt_winters_forecast,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = []
    counts = {}
    for day in range(3):
        for hod in range(24):
            ts = base + datetime.timedelta(days=day, hours=hod)
            c = 4 + (hod % 3) + day
            if (day, hod) in {(1, 5), (2, 17)}:  # planted gaps
                c = 0
            counts[ts] = c
            for k in range(c):
                rows.append((ts + datetime.timedelta(seconds=k),))
    ev = spark.createDataFrame(rows, "ts TIMESTAMP")
    got = [
        (r["h"], r["hour_start"], r["forecast"])
        for r in holt_winters_forecast(
            ev, alpha=0.3, beta=0.1, gamma=0.2, season=24, horizon=24
        ).collect()
    ]

    A, B, G, M = 0.3, 0.1, 0.2, 24
    NA, NB, NG = 0.7, 0.9, 0.8
    h0, h1 = min(counts), max(counts)
    xs = []
    t = h0
    while t <= h1:
        xs.append(float(counts.get(t, 0)))
        t += datetime.timedelta(hours=1)
    n = len(xs)
    l = sum(int(v) for v in xs[:M]) / float(M)
    b = (sum(int(v) for v in xs[M:2 * M]) - sum(int(v) for v in xs[:M])) / float(M * M)
    seasons = [x - l for x in xs[:M]]
    for t in range(M, n):
        s_old = seasons[t % M]
        l_new = A * (xs[t] - s_old) + NA * (l + b)
        b_new = B * (l_new - l) + NB * b
        seasons[t % M] = G * (xs[t] - l_new) + NG * s_old
        l, b = l_new, b_new
    want = [
        (h, h1 + datetime.timedelta(hours=h),
         round(l + float(h) * b + seasons[(n - 1 + h) % M], 6))
        for h in range(1, 25)
    ]
    assert got == want

    const = spark.createDataFrame(
        [(base + datetime.timedelta(hours=i, seconds=k),)
         for i in range(60) for k in range(7)],
        "ts TIMESTAMP",
    )
    cg = holt_winters_forecast(const).collect()
    assert all(r["forecast"] == 7.0 for r in cg)

    short = spark.createDataFrame(
        [(base + datetime.timedelta(hours=i),) for i in range(30)],
        "ts TIMESTAMP",
    )
    with _pytest.raises(Exception, match="two full seasons"):
        holt_winters_forecast(short).collect()


def test_forecast_backtest_mae_matches_reference(spark):
    """timeseries.forecast_backtest_mae against a full independent
    Python replay (HW recurrence + hod-mean baseline + ordered error
    sums) on a planted 4-day series split at day 2 — exact tuple
    equality for both models. Fixed-point law: on an exactly periodic
    zero-trend series both models predict perfectly, so both MAEs
    are exactly 0.0 (HW's b0 is 0 from two identical seasons and the
    recurrence holds the profile)."""
    import datetime

    from ydb_vector_search_demo_spark.operators.timeseries import (
        forecast_backtest_mae,
    )

    base = datetime.datetime(2024, 3, 1)

    def mk_events(count_fn, days):
        rows, counts = [], {}
        for day in range(days):
            for hod in range(24):
                ts = base + datetime.timedelta(days=day, hours=hod)
                c = count_fn(day, hod)
                counts[ts] = c
                rows.extend(
                    (ts + datetime.timedelta(seconds=k),) for k in range(c)
                )
        return spark.createDataFrame(rows, "ts TIMESTAMP"), counts

    split = (base + datetime.timedelta(days=2)).strftime("%Y-%m-%d %H:%M:%S")

    # planted: drifting train (day-dependent) + profile; noisy test
    ev, counts = mk_events(
        lambda d, h: 3 + (h % 5) + d + (1 if (d, h) == (3, 7) else 0), 4
    )
    got = {
        r["model"]: (r["n_test"], r["mae"])
        for r in forecast_backtest_mae(ev, split_ts=split).collect()
    }

    A, B, G, M = 0.3, 0.1, 0.2, 24
    NA, NB, NG = 0.7, 0.9, 0.8
    train = {t: c for t, c in counts.items()
             if t < base + datetime.timedelta(days=2)}
    h0, h1 = min(train), max(train)
    xs = []
    t = h0
    while t <= h1:
        xs.append(float(train.get(t, 0)))
        t += datetime.timedelta(hours=1)
    n = len(xs)
    l = sum(int(v) for v in xs[:M]) / float(M)
    b = (sum(int(v) for v in xs[M:2 * M]) - sum(int(v) for v in xs[:M])) / float(M * M)
    seasons = [x - l for x in xs[:M]]
    for t_ in range(M, n):
        s_old = seasons[t_ % M]
        l_new = A * (xs[t_] - s_old) + NA * (l + b)
        b_new = B * (l_new - l) + NB * b
        seasons[t_ % M] = G * (xs[t_] - l_new) + NG * s_old
        l, b = l_new, b_new
    test_hours = sorted(t for t in counts if t > h1)
    hw_sum = 0.0
    for th in test_hours:
        h = int((th - h1).total_seconds() // 3600)
        pred = l + float(h) * b + seasons[(n - 1 + h) % M]
        hw_sum += abs(float(counts[th]) - pred)
    from collections import defaultdict
    hod_n, hod_s = defaultdict(int), defaultdict(int)
    th = h0
    while th <= h1:
        hod_n[th.hour] += 1
        hod_s[th.hour] += int(train.get(th, 0))
        th += datetime.timedelta(hours=1)
    nv_sum = 0.0
    for th in test_hours:
        pred = hod_s[th.hour] / float(hod_n[th.hour])
        nv_sum += abs(float(counts[th]) - pred)
    nt = len(test_hours)
    assert got["holt_winters"] == (nt, round(hw_sum / float(nt), 6))
    assert got["seasonal_naive"] == (nt, round(nv_sum / float(nt), 6))

    # exactly periodic, zero trend: both models are perfect
    ev2, _ = mk_events(lambda d, h: 2 + (h % 4), 4)
    got2 = {
        r["model"]: r["mae"]
        for r in forecast_backtest_mae(ev2, split_ts=split).collect()
    }
    assert got2 == {"holt_winters": 0.0, "seasonal_naive": 0.0}
