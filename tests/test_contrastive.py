"""Contrastive mining (operators.curation): hard negatives, positives,
triplets — label-aware per-anchor top-k over one broadcast corpus scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.operators import curation
from ydb_vector_search_demo_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def anchors(embs):
    return embs.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
        F.col("label").alias("query_label"),
    )


def test_negatives_never_share_label_or_self(embs, anchors):
    labels = {r["vec_id"]: r["label"] for r in embs.select("vec_id", "label").collect()}
    neg = curation.mine_hard_negatives(embs, anchors, k=5).collect()
    assert len(neg) == 15
    for r in neg:
        assert labels[r["vec_id"]] != labels[r["query_id"]]
        assert r["vec_id"] != r["query_id"]


def test_positives_share_label_and_exclude_self(embs, anchors):
    labels = {r["vec_id"]: r["label"] for r in embs.select("vec_id", "label").collect()}
    pos = curation.mine_positives(embs, anchors, k=3).collect()
    for r in pos:
        assert labels[r["vec_id"]] == labels[r["query_id"]]
        assert r["vec_id"] != r["query_id"]


def test_negatives_are_the_nearest_other_label(embs, anchors):
    """Driver-side recomputation: rank-1 negative must be the true
    nearest other-label item by cosine distance."""
    import math

    rows = embs.select("vec_id", "embedding", "label").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}

    def cos_d(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 1.0 - dot / (na * nb) if na and nb else 1.0

    neg = curation.mine_hard_negatives(embs, anchors, k=1).collect()
    for r in neg:
        qv, ql = vecs[r["query_id"]], labels[r["query_id"]]
        best = min(
            ((cos_d(qv, v), i) for i, v in vecs.items()
             if labels[i] != ql and i != r["query_id"]),
        )
        assert r["vec_id"] == best[1]
        assert abs(r["score"] - best[0]) < 1e-9


def test_triplets_join_positive_with_negatives(embs, anchors):
    t = curation.build_triplets(embs, anchors, n_negatives=3).collect()
    assert len(t) == 9  # 3 anchors x 1 positive x 3 negatives
    by_q = {}
    for r in t:
        by_q.setdefault(r["query_id"], set()).add(r["pos_id"])
    assert all(len(p) == 1 for p in by_q.values())  # one positive per anchor


def test_plan_no_python_and_group_limit(embs, anchors):
    df = curation.mine_hard_negatives(embs, anchors, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "WindowGroupLimit" in plan


def test_stratified_sample_exact_and_deterministic(spark):
    """Exactly n per stratum (or the whole stratum when smaller),
    identical across physical orderings, different across seeds."""
    from ydb_vector_search_demo_spark.operators import curation
    from ydb_vector_search_demo_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("lang", "doc_id")
    out = curation.stratified_sample(docs, ["lang"], 5, seed=42)
    per = {}
    for r in out.collect():
        per.setdefault(r["lang"], []).append((r["sample_rank"], r["doc_id"]))
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, rows in per.items():
        assert len(rows) == min(5, sizes[lang])
        assert sorted(r for r, _ in rows) == list(range(1, len(rows) + 1))
    # physical order independence: repartitioned input -> same selection
    out2 = curation.stratified_sample(
        docs.repartition(7, "doc_id"), ["lang"], 5, seed=42
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))
    # a different seed draws a different sample
    out3 = curation.stratified_sample(docs, ["lang"], 5, seed=43)
    assert sorted(map(tuple, out.collect())) != sorted(map(tuple, out3.collect()))
