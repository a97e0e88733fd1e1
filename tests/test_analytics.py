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
