"""Multi-probe kNN graph + NN-descent refinement (operators/ann.py):
the repair ladder for the cell-bucketed graph's honest recall hole
(knn_graph_recall shows boundary nodes scoring 0 with a single probe).

Laws pinned here:
* rank-0 of the multi-probe assignment IS the single-probe assignment;
* multi-probe recall is monotone in nprobe (probed cells are nested)
  and degenerates to the exact graph at nprobe = k_clusters;
* the exact graph is a fixed point of NN-descent;
* NN-descent strictly repairs a poor (deterministic ring) init on a
  clustered corpus, and never regresses the init's recall;
* the multi-probe graph plan stays JVM-side with the Partial
  WindowGroupLimit cut (the batch_knn discipline).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.operators import ann
from ydb_vector_search_demo_spark.operators.knn import knn_scores
from ydb_vector_search_demo_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def clustered(spark):
    """8 well-separated Gaussian clusters in 16-dim, 200 points —
    enough local structure that graph quality is decided by the
    algorithm, not by chance (the synthetic testdata embeddings are
    near-isotropic, which makes every neighborhood equally hard)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(scale=8.0, size=(8, 16))
    X = np.concatenate(
        [centers[i % 8] + rng.normal(scale=0.5, size=(1, 16)) for i in range(200)]
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    ).cache()
    df.count()
    yield df
    df.unpersist()


def _edge_set(graph_rows):
    by_src: dict = {}
    for r in graph_rows:
        by_src.setdefault(r["src"], set()).add(r["dst"])
    return by_src


def _exact_graph(df, k, metric="euclidean"):
    one = df.withColumn("_one", F.lit(1))
    return ann.knn_graph_bucketed(
        one, "_one", k=k, metric=metric
    ).select("src", "dst", "score")


def _recall(exact_edges, approx_edges):
    per_src = []
    for s, ex in exact_edges.items():
        ap = approx_edges.get(s, set())
        per_src.append(len(ex & ap) / len(ex))
    return sum(per_src) / len(per_src), min(per_src)


def test_multiprobe_rank0_is_primary_assignment(spark, clustered):
    index = ann.build_ivf_index(clustered, k_clusters=4, seed=7)
    multi = ann.ivf_assign_multiprobe(index.centroids, clustered, nprobe=2)
    counts = multi.groupBy("vec_id").count().collect()
    assert all(r["count"] == 2 for r in counts)
    rank0 = {
        r["vec_id"]: r["centroid_id"]
        for r in multi.filter(F.col("probe_rank") == 0).collect()
    }
    primary = {
        r["vec_id"]: r["centroid_id"]
        for r in ann.ivf_assign(index.centroids, clustered).collect()
    }
    assert rank0 == primary
    index.assigned.unpersist()


def test_multiprobe_monotone_and_degenerate(spark, clustered):
    k = 5
    index = ann.build_ivf_index(clustered, k_clusters=4, seed=7)
    exact = _edge_set(_exact_graph(clustered, k).collect())
    recalls = []
    for nprobe in (1, 2, 4):
        g = _edge_set(
            ann.knn_graph_multiprobe(
                clustered, k=k, nprobe=nprobe, metric="euclidean", index=index
            ).collect()
        )
        recalls.append(_recall(exact, g)[0])
        if nprobe == 4:  # == k_clusters: every cell probed -> exact
            assert g == exact
    assert recalls == sorted(recalls), f"recall must be monotone: {recalls}"
    index.assigned.unpersist()


def test_nn_descent_fixed_point_on_exact_graph(spark, clustered):
    k = 5
    exact = _exact_graph(clustered, k, metric="euclidean")
    refined = ann.nn_descent(
        clustered, exact, k=k, iters=1, metric="euclidean"
    )
    a = sorted((r["src"], r["dst"]) for r in exact.collect())
    b = sorted((r["src"], r["dst"]) for r in refined.collect())
    assert a == b


def test_nn_descent_repairs_random_init(spark, clustered):
    """NN-descent's convergence story assumes an init with long-range
    edges (random is the classic start — Dong et al. §3; a ring init
    has diameter n/k and provably explores only ±k cells per round,
    which is NOT a defect of the implementation)."""
    import numpy as np

    k = 5
    n = clustered.count()
    exact = _edge_set(_exact_graph(clustered, k).collect())
    rng = np.random.default_rng(3)
    rows = [
        (i, int(d))
        for i in range(n)
        for d in rng.choice([x for x in range(n) if x != i], size=k, replace=False)
    ]
    init = spark.createDataFrame(rows, "src BIGINT, dst BIGINT")
    init_scored = ann.nn_descent(clustered, init, k=k, iters=0, metric="euclidean")
    init_recall = _recall(exact, _edge_set(init_scored.collect()))[0]
    refined = ann.nn_descent(clustered, init, k=k, iters=3, metric="euclidean")
    ref_recall = _recall(exact, _edge_set(refined.collect()))[0]
    assert ref_recall >= init_recall
    assert ref_recall >= 0.95, f"NN-descent stalled: {init_recall} -> {ref_recall}"


def test_multiprobe_graph_plan_stays_jvm_side(spark, clustered):
    index = ann.build_ivf_index(clustered, k_clusters=4, seed=7)
    df = ann.knn_graph_multiprobe(
        clustered, k=5, nprobe=2, metric="euclidean", index=index
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    for py_node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py_node not in plan
    index.assigned.unpersist()


def test_improvement_report_shape_and_order(spark):
    embs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rep = ann.knn_graph_improvement_report(
        spark, embs, k=5, k_clusters=8, nprobe=2, iters=1, n_sources=10,
    ).collect()
    assert [r["variant"].split("(")[0] for r in rep] == [
        "cell", "multiprobe", "nn_descent",
    ]
    cell, multi, refined = (r["mean_recall"] for r in rep)
    # each rung buys recall on top of the last (weak form: no regression)
    assert multi >= cell
    assert refined >= multi - 1e-9
    for r in rep:
        assert 0.0 <= r["min_recall"] <= r["mean_recall"] <= 1.0
