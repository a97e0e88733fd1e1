"""Matryoshka prefix-dimension coarse search + exact rescore
(operators.quant.mrl_search): the dimension axis of the bytes-for-recall
ladder.

Contracts under test:
* full-width prefix (dims = d) + rescore ≥ 1 equals exact KNN exactly;
* the persisted prefix store returns the same rows as the inline slice;
* recall is monotone-ish in dims and hits 1.0 at full width;
* the coarse plan is a TakeOrderedAndProject (no shuffle of scored
  rows) with zero Python nodes;
* predicate applies inside the coarse scan (filtered search stays
  exact over the filtered set).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.operators import quant
from ydb_vector_search_demo_spark.operators.knn import knn_scores
from ydb_vector_search_demo_spark.pipeline import rag
from ydb_vector_search_demo_spark.sources.tables import load_table

QV = rag.embed_query_stub("fast scan table row value")


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_full_width_equals_exact(embs):
    exact = knn_scores(embs, QV, k=10).collect()
    mrl = quant.mrl_search(embs, QV, dims=len(QV), k=10, rescore=1).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in exact] == [
        (r["vec_id"], round(r["score"], 9)) for r in mrl
    ]


def test_parquet_prefix_store_equals_inline(embs, tmp_path):
    path = str(tmp_path / "mrl_prefix")
    quant.write_mrl_store(embs, path, dims=16)
    spark = embs.sparkSession
    inline = quant.mrl_search(embs, QV, dims=16, k=5, rescore=4).collect()
    stored = quant.mrl_search_parquet(spark, path, embs, QV, dims=16, k=5,
                                      rescore=4).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in stored]
    # the prefix store physically holds 16-wide arrays
    pref = spark.read.parquet(path)
    assert pref.selectExpr("max(size(prefix)) m").first()["m"] == 16


def test_recall_report_full_width_is_one(spark, embs):
    rep = {
        r["dims"]: r
        for r in quant.mrl_recall(
            spark, embs, QV, dims_list=(8, 64), k=10, rescore=4
        ).collect()
    }
    assert rep[64]["recall_coarse"] == 1.0
    assert rep[64]["recall_rescored"] == 1.0
    assert 0.0 <= rep[8]["recall_coarse"] <= 1.0
    # rescore can only help: rescored recall >= coarse recall at any width
    assert rep[8]["recall_rescored"] >= rep[8]["recall_coarse"]


def test_coarse_plan_shape(embs):
    df = quant.mrl_search(embs, QV, dims=16, k=5, rescore=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_predicate_filters_inside_coarse(embs):
    out = quant.mrl_search(
        embs, QV, dims=16, k=5, rescore=4, predicate="vec_id % 2 = 0"
    ).collect()
    assert len(out) == 5
    assert all(r["vec_id"] % 2 == 0 for r in out)
    # exact over the filtered set: equals exact KNN on the filtered corpus
    # at full probe width
    from pyspark.sql import functions as F

    filtered = embs.filter(F.expr("vec_id % 2 = 0"))
    exact = quant.mrl_search(
        filtered, QV, dims=len(QV), k=5, rescore=1
    ).collect()
    got_ids = [r["vec_id"] for r in out]
    # rescore=4 at dims=16 may differ from exact in pathological corpora;
    # assert the guaranteed part: both are subsets of the filtered corpus
    # and the full-width run is exactly the filtered exact top-5
    assert [r["vec_id"] for r in exact] == _ids(
        knn_scores(filtered, QV, k=5)
    )
    assert set(got_ids) <= {r["vec_id"] for r in filtered.select("vec_id").collect()}
