"""Laws for the r8 serving-side result shaping operators:

1. Keyset pagination — pages chain: walking 3 pages with cursors
   reproduces exactly the global top-15, in order, no gaps/overlaps.
2. Faceted KNN — per-group top-k equals running exact KNN on each
   group's slice separately.
3. MMR — with lmb=1 the re-ranker degenerates to the plain top-k;
   with lmb<1 on a corpus with planted near-duplicates of the top hit,
   the duplicates are pushed out of the selection (the whole point);
   ranks are 1..k with distinct ids.
4. MaxSim — a document containing a query token verbatim achieves
   per-token max similarity 1.0 (its own token embedding IS the query
   token embedding); a document sharing no tokens scores strictly
   lower than one containing all of them.
5. budget_fill — row-identical to the naive global-window cumulative
   fill (that equality is also the catalog row's oracle), empty at
   budget 0, total at budget = infinity.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.operators import curation as CUR
from ydb_vector_search_demo_spark.operators import retrieval as R
from ydb_vector_search_demo_spark.operators.knn import (
    knn_page_after,
    knn_scores,
    knn_topk_per_group,
)
from ydb_vector_search_demo_spark.pipeline import rag
from ydb_vector_search_demo_spark.sources.tables import load_table

QV = rag.embed_query_stub("pagination law query")


def test_keyset_pages_chain_to_global_topk(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    want = [
        (r["vec_id"], r["score"])
        for r in knn_scores(embs, QV, k=15).collect()
    ]
    pages = [want[0:5]]
    for _ in range(2):
        last = pages[-1][-1]
        page = [
            (r["vec_id"], r["score"])
            for r in knn_page_after(
                embs, QV, float(last[1]), int(last[0]), k=5
            ).collect()
        ]
        pages.append(page)
    got = [row for p in pages for row in p]
    assert got == want
    ids = [i for i, _ in got]
    assert len(set(ids)) == 15, "pages must not overlap"


def test_faceted_topk_equals_per_group_exact(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        (r["label"], r["rank"]): r["vec_id"]
        for r in knn_topk_per_group(embs, QV, "label", k=3).collect()
    }
    labels = [r["label"] for r in embs.select("label").distinct().collect()]
    for lab in labels:
        sl = embs.filter(F.col("label") == lab)
        want = [r["vec_id"] for r in knn_scores(sl, QV, k=3).collect()]
        for i, vid in enumerate(want, 1):
            assert got[(lab, i)] == vid, (lab, i)


def test_mmr_lambda_one_is_plain_topk(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    plain = [r["vec_id"] for r in knn_scores(embs, QV, k=5).collect()]
    mmr = R.mmr_rerank(embs, QV, k=5, n_candidates=12, lmb=1.0).collect()
    assert [r["vec_id"] for r in sorted(mmr, key=lambda r: r["mmr_rank"])] == plain


def test_mmr_pushes_out_planted_near_duplicates(spark):
    base = load_table(spark, SF_SMOKE, "embeddings")
    top = knn_scores(base, QV, k=1).collect()[0]
    best_vec = [
        list(r["embedding"])
        for r in base.filter(F.col("vec_id") == top["vec_id"]).collect()
    ][0]
    max_id = base.agg(F.max("vec_id")).first()[0]
    # plant 4 near-copies of the best hit: they dominate the plain top-5
    dups = spark.createDataFrame(
        [
            (int(max_id) + i + 1,
             [float(x) + 1e-4 * (i + 1) for x in best_vec], 0)
            for i in range(4)
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    )
    corpus = base.unionByName(dups)
    plain = {r["vec_id"] for r in knn_scores(corpus, QV, k=5).collect()}
    planted = {int(max_id) + i + 1 for i in range(4)}
    assert len(plain & planted) >= 3, "plant failed to dominate top-5"
    sel = R.mmr_rerank(corpus, QV, k=5, n_candidates=12, lmb=0.5).collect()
    ids = [r["vec_id"] for r in sel]
    assert len(ids) == len(set(ids)) == 5
    assert [r["mmr_rank"] for r in sorted(sel, key=lambda r: r["mmr_rank"])] == [1, 2, 3, 4, 5]
    assert len(set(ids) & planted) <= 1, (
        f"MMR kept {set(ids) & planted} near-copies; diversity term dead"
    )


def test_maxsim_verbatim_token_scores_unity(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "delta epsilon zeta"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = R.maxsim_topk(docs, ["alpha", "beta"], k=2).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert abs(by_id[1]["m0"] - 1.0) < 1e-9
    assert abs(by_id[1]["m1"] - 1.0) < 1e-9
    assert by_id[1]["maxsim"] > by_id[2]["maxsim"]


def test_budget_fill_equals_naive_global_window(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    from ydb_vector_search_demo_spark.functions import textstats as T

    staged = docs.select(
        "doc_id", T.tokens("text").alias("toks"), "text"
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        T.quality_score_of(F.col("toks"), "text", "en").alias("quality"),
    )
    budget = 2000
    w = Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        staged.withColumn("cum_cost", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_cost") <= budget)
    )
    got = sorted(
        tuple(r)
        for r in CUR.budget_fill(
            staged, "quality", "n_tokens", budget
        ).collect()
    )
    want = sorted(tuple(r) for r in naive.collect())
    assert got == want and len(got) > 0
    assert (
        CUR.budget_fill(staged, "quality", "n_tokens", 0).count() == 0
    )
    total = staged.count()
    assert (
        CUR.budget_fill(staged, "quality", "n_tokens", 10**12).count()
        == total
    )


def test_normalized_store_matches_exact_cosine(spark, tmp_path):
    """The normalized store is a physical-strategy twin of exact
    cosine: same top-k ids in the same order (rank-on-rounded), and
    the stored units really are unit-norm."""
    from ydb_vector_search_demo_spark.operators import knn as K

    embs = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "normstore")
    K.write_normalized_store(embs, path)
    got = [
        (r["vec_id"], r["score"])
        for r in K.knn_cosine_normalized_parquet(spark, path, QV, k=5).collect()
    ]
    want = [
        (r["vec_id"], round(r["score"], 6))
        for r in K.knn_scores(embs, QV, k=5, metric="cosine").collect()
    ]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 2e-6, (a, b)
    store = spark.read.parquet(path)
    from ydb_vector_search_demo_spark.functions.vector import l2_norm

    norms = store.select(l2_norm("unit").alias("n")).collect()
    assert all(abs(r["n"] - 1.0) < 1e-12 for r in norms)
