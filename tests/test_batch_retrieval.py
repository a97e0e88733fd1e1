"""Batched hybrid retrieval (r5): a DataFrame of (query_text, query_vec)
queries through ONE corpus pass per system — BM25 contributions computed
once over the union of terms, vector pools from one batch-KNN (or one
pruned batched ANN probe), RRF fused per query.

Contracts under test:
* per-query row-identity with the single-query ``hybrid_rrf_topk`` loop
  at equal pool/k (the batch path is an execution-shape change, not a
  semantics change);
* same identity for the BM25-only batch vs looped ``bm25_topk``;
* the IVF-routed vector side at full probe equals the exact batch;
* analyzer seam (stopwords+stem) composes with the batch path;
* plan hygiene: no row-at-a-time Python eval anywhere in the fused plan.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.operators import ann
from ydb_vector_search_demo_spark.operators import retrieval as R
from ydb_vector_search_demo_spark.pipeline import rag
from ydb_vector_search_demo_spark.sources.tables import load_table

QUERIES = ["hash join spark", "window order data", "customer query line"]


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def qvs():
    return [rag.embed_query_stub(q) for q in QUERIES]


@pytest.fixture(scope="module")
def qdf(spark, qvs):
    return spark.createDataFrame(
        [(i, q, v) for i, (q, v) in enumerate(zip(QUERIES, qvs))],
        "query_id LONG, query_text STRING, query_vec ARRAY<DOUBLE>",
    )


def test_bm25_batch_equals_loop(docs, qdf):
    batch = R.bm25_batch_topk(docs, qdf, k=10)
    got = {
        qid: sorted(
            [(r["doc_id"], r["bm25"], r["rank"]) for r in rows],
            key=lambda t: t[2],
        )
        for qid, rows in _group(batch.collect(), "query_id").items()
    }
    for qid, q in enumerate(QUERIES):
        loop = R.bm25_topk(docs, R.query_terms(q), k=10).collect()
        want = [(r["doc_id"], r["bm25"], i + 1) for i, r in enumerate(loop)]
        assert got[qid] == want, f"query {qid} diverges from bm25_topk loop"


def _group(rows, key):
    out: dict = {}
    for r in rows:
        out.setdefault(r[key], []).append(r)
    return out


def _fused_rows(rows):
    return [
        (r["doc_id"], r["rrf"], r["lex_rank"], r["vec_rank"])
        for r in sorted(rows, key=lambda r: r["rank"])
    ]


def test_hybrid_batch_equals_single_query_loop(docs, embs, qdf, qvs):
    batch = R.hybrid_rrf_batch_topk(docs, embs, qdf, k=5, pool=20)
    got = {
        qid: _fused_rows(rows)
        for qid, rows in _group(batch.collect(), "query_id").items()
    }
    for qid, (q, v) in enumerate(zip(QUERIES, qvs)):
        single = R.hybrid_rrf_topk(docs, embs, q, v, k=5, pool=20).collect()
        want = [
            (r["doc_id"], r["rrf"], r["lex_rank"], r["vec_rank"]) for r in single
        ]
        assert got[qid] == want, f"query {qid} diverges from hybrid loop"


def test_hybrid_batch_ivf_full_probe_equals_exact(docs, embs, qdf):
    index = ann.build_ivf_index(embs, k_clusters=8)
    try:
        exact = R.hybrid_rrf_batch_topk(docs, embs, qdf, k=5, pool=20)
        ivf = R.hybrid_rrf_batch_topk(
            docs, embs, qdf, k=5, pool=20, index=index, nprobe=8
        )
        e = {q: _fused_rows(r) for q, r in _group(exact.collect(), "query_id").items()}
        i = {q: _fused_rows(r) for q, r in _group(ivf.collect(), "query_id").items()}
        assert e == i, "full-probe IVF-routed batch must equal exact batch"
    finally:
        index.assigned.unpersist()


def test_hybrid_batch_analyzer_seam(docs, embs, spark, qvs):
    """Stopworded/stemmed queries retrieve through the batch path under
    the same analyzer rules as the single-query seam."""
    from ydb_vector_search_demo_spark.functions.textstats import STOPWORDS

    texts = ["the tables of values", "rows for queries and"]
    qdf2 = spark.createDataFrame(
        [(i, t, qvs[i]) for i, t in enumerate(texts)],
        "query_id LONG, query_text STRING, query_vec ARRAY<DOUBLE>",
    )
    batch = R.hybrid_rrf_batch_topk(
        docs, embs, qdf2, k=5, pool=20,
        stopwords=STOPWORDS["en"], stem=True,
    )
    got = {
        qid: _fused_rows(rows)
        for qid, rows in _group(batch.collect(), "query_id").items()
    }
    for qid, t in enumerate(texts):
        terms = R.analyze_terms(
            R.query_terms(t), stopwords=STOPWORDS["en"], stem=True
        )
        lex = R.bm25_topk(
            docs, terms, k=20, stopwords=STOPWORDS["en"], stem=True
        )
        # lexical ranks inside the fused rows must match the analyzed
        # single-query BM25 ordering
        lex_rank = {r["doc_id"]: i + 1 for i, r in enumerate(lex.collect())}
        for doc_id, _rrf, rl, _rv in got[qid]:
            if rl is not None:
                assert lex_rank.get(doc_id) == rl


def test_all_stopword_batch_is_empty_lex(docs, embs, spark, qvs):
    """A batch whose queries analyze to zero terms must still fuse —
    pure-vector ranks, no crash on the empty lexical side."""
    from ydb_vector_search_demo_spark.functions.textstats import STOPWORDS

    qdf3 = spark.createDataFrame(
        [(0, "the of and", qvs[0])],
        "query_id LONG, query_text STRING, query_vec ARRAY<DOUBLE>",
    )
    out = R.hybrid_rrf_batch_topk(
        docs, embs, qdf3, k=5, pool=20,
        stopwords=STOPWORDS["en"], stem=True,
    ).collect()
    assert len(out) == 5
    assert all(r["lex_rank"] is None for r in out)
    assert all(r["vec_rank"] is not None for r in out)


def test_hybrid_batch_plan_no_python_eval(docs, embs, qdf):
    plan = R.hybrid_rrf_batch_topk(docs, embs, qdf, k=5, pool=20)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "WindowGroupLimit" in plan


def test_rerank_batch_equals_single_query_loop(docs, embs, qdf, qvs):
    """Batched second stage == per-query rerank loop, per query."""
    pool = R.hybrid_rrf_batch_topk(docs, embs, qdf, k=20, pool=20)
    with_text = pool.join(docs.select("doc_id", "text"), on="doc_id")
    batch = R.rerank_batch(with_text, qdf, k=5)
    got = {
        qid: [
            (r["doc_id"], round(r["rerank_score"], 9), r["rerank_rank"])
            for r in sorted(rows, key=lambda r: r["rerank_rank"])
        ]
        for qid, rows in _group(batch.collect(), "query_id").items()
    }
    for qid, (q, v) in enumerate(zip(QUERIES, qvs)):
        single_pool = R.hybrid_rrf_topk(docs, embs, q, v, k=20, pool=20).join(
            docs.select("doc_id", "text"), on="doc_id"
        )
        single = R.rerank(single_pool, q, k=5).collect()
        want = [
            (r["doc_id"], round(r["rerank_score"], 9), i + 1)
            for i, r in enumerate(single)
        ]
        assert got[qid] == want, f"query {qid} diverges from rerank loop"


def test_rerank_batch_python_only_on_pool(docs, embs, qdf):
    """The Arrow UDF must sit ABOVE the pooled join, not on the corpus
    scan: its input row count is bounded by Q x pool."""
    pool = R.hybrid_rrf_batch_topk(docs, embs, qdf, k=20, pool=20)
    with_text = pool.join(docs.select("doc_id", "text"), on="doc_id")
    out = R.rerank_batch(with_text, qdf, k=5)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    assert all(len(v) == 5 for v in _group(rows, "query_id").values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial sections; count the final plan only:
    # exactly one Arrow eval node (the rerank seam), zero row-at-a-time
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_hybrid_with_bm25_index_equals_direct(docs, embs, qdf, qvs):
    """Both hybrid paths with the inverted-index lexical backend must
    equal the direct-scan versions exactly."""
    idx = R.build_bm25_index(docs)
    try:
        # single-query
        for q, v in zip(QUERIES, qvs):
            a = [tuple(r) for r in
                 R.hybrid_rrf_topk(docs, embs, q, v, k=5, pool=20).collect()]
            b = [tuple(r) for r in
                 R.hybrid_rrf_topk(docs, embs, q, v, k=5, pool=20,
                                   bm25_index=idx).collect()]
            assert a == b
        # batch
        a = sorted(map(tuple,
            R.hybrid_rrf_batch_topk(docs, embs, qdf, k=5, pool=20).collect()))
        b = sorted(map(tuple,
            R.hybrid_rrf_batch_topk(docs, embs, qdf, k=5, pool=20,
                                    bm25_index=idx).collect()))
        assert a == b
    finally:
        idx.postings.unpersist()


def test_bm25_index_batch_equals_scan_batch(docs, qdf):
    idx = R.build_bm25_index(docs)
    try:
        a = sorted(map(tuple, R.bm25_batch_topk(docs, qdf, k=10).collect()))
        b = sorted(map(tuple,
            R.bm25_index_batch_topk(idx, qdf, k=10).collect()))
        assert a == b
    finally:
        idx.postings.unpersist()


def test_phrase_match_laws(spark):
    """Positional phrase search: 3-token phrases, back-to-back and
    OVERLAPPING occurrences (periodic phrases like 'x x' in 'x x x'
    start at both 0 and 1 — a substring-replace counter would
    undercount), and absent phrases."""
    from ydb_vector_search_demo_spark.operators import retrieval as R

    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c"),        # 'a b c' twice, disjoint
            (2, "x x x"),                # 'x x' overlaps: starts 0,1
            (3, "a b c a b c a b c"),    # back-to-back: starts 0,3,6
            (4, "c b a"),                # reversed -> no match
        ],
        "doc_id INT, text STRING",
    )
    idx = R.build_positional_index(docs)

    def got(phrase):
        return {
            r["doc_id"]: r["n_occurrences"]
            for r in R.phrase_match(idx, phrase).collect()
        }

    assert got("a b c") == {1: 2, 3: 3}
    assert got("x x") == {2: 2}
    assert got("c d a") == {1: 1}
    assert got("b a") == {4: 1}
    assert got("d c") == {}


def test_spell_suggest_ranking_laws(spark):
    """Closer beats more frequent beats lexicographic; candidates
    beyond max_distance are excluded; the length band never drops a
    true candidate (|len(a)-len(b)| <= distance always)."""
    from ydb_vector_search_demo_spark.operators import retrieval as R

    vocab = spark.createDataFrame(
        [("table", 100), ("tables", 999), ("cable", 10),
         ("tab", 5), ("zzzzzzzz", 1000)],
        "term STRING, tf LONG",
    )
    qs = spark.createDataFrame([("tabel",)], "query_term STRING")
    got = [
        (r["rank"], r["suggestion"], r["distance"])
        for r in R.spell_suggest(vocab, qs, k=10, max_distance=2)
        .orderBy("rank").collect()
    ]
    # 'table' d=2 tf=100; 'tables' d=2* tf=999 -> frequency breaks the
    # tie at equal distance; 'cable'/'tab' d=3 -> excluded
    assert [g[1] for g in got][:1] == ["tables"] or got[0][2] < 2
    terms = [g[1] for g in got]
    assert "zzzzzzzz" not in terms and "cable" not in terms
    dists = [g[2] for g in got]
    assert dists == sorted(dists) and all(d <= 2 for d in dists)


def test_proximity_match_laws(spark):
    """NEAR is symmetric in term order; min_gap is exact; pairs past
    the gap are excluded; phrase ⊆ proximity at gap >= 1."""
    from ydb_vector_search_demo_spark.operators import retrieval as R

    docs = spark.createDataFrame(
        [
            (1, "a x x x b"),       # gap 4
            (2, "b a"),             # gap 1, reversed order
            (3, "a x x x x x b"),   # gap 6 -> out at max_gap 5
            (4, "a b a"),           # min over multiple pairs = 1
        ],
        "doc_id INT, text STRING",
    )
    idx = R.build_positional_index(docs)
    got = {
        r["doc_id"]: r["min_gap"]
        for r in R.proximity_match(idx, "a", "b", max_gap=5).collect()
    }
    assert got == {1: 4, 2: 1, 4: 1}
    sym = {
        r["doc_id"]: r["min_gap"]
        for r in R.proximity_match(idx, "b", "a", max_gap=5).collect()
    }
    assert sym == got
