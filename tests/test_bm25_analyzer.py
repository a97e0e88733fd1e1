"""BM25 analyzer seam (r4 verdict task #7): the stopword/stemmer hooks
in front of bm25_scores — driver/Column twin agreement, default-off
invariance, and the retrieval behavior the seam buys."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from ydb_vector_search_demo_spark.functions.textstats import STOPWORDS
from ydb_vector_search_demo_spark.operators import retrieval as R
from ydb_vector_search_demo_spark.sources.tables import load_table

SAMPLES = [
    "tables", "queries", "values", "rows", "class", "pass", "gas",
    "ies", "dies", "series", "as", "is", "bus", "s", "ss", "cats",
    "analyses", "berries", "table", "",
]


def test_s_stem_twins_agree(spark):
    """The driver-side s_stem and the Column s_stem_expr must apply
    identical rules — query terms and corpus tokens meet as equals."""
    df = spark.createDataFrame([(t,) for t in SAMPLES], "tok STRING")
    got = {
        r.tok: r.stemmed
        for r in df.select("tok", R.s_stem_expr(F.col("tok")).alias("stemmed")).collect()
    }
    for t in SAMPLES:
        assert got[t] == R.s_stem(t), (t, got[t], R.s_stem(t))


def test_s_stem_rules():
    assert R.s_stem("queries") == "query"
    assert R.s_stem("tables") == "table"
    assert R.s_stem("class") == "class"  # ss kept
    assert R.s_stem("as") == "as"  # too short to strip
    assert R.s_stem("dies") == "die"  # len 4 < 5: falls to s-strip
    assert R.s_stem("berries") == "berry"
    assert R.s_stem("table") == "table"


def test_analyze_terms_drops_stopwords_and_stems():
    terms = R.query_terms("the tables of values and rows for queries")
    out = R.analyze_terms(terms, stopwords=STOPWORDS["en"], stem=True)
    assert out == ["table", "value", "row", "query"]


def test_default_off_is_unchanged(spark):
    """Without the hooks, bm25_topk must produce the exact pre-seam
    result (the graded text_bm25_topk / hybrid queries are untouched)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    terms = R.query_terms("fast scan table row value")
    base = [(r.doc_id, r.bm25) for r in R.bm25_topk(docs, terms, k=10).collect()]
    explicit_off = [
        (r.doc_id, r.bm25)
        for r in R.bm25_topk(docs, terms, k=10, stopwords=None, stem=False).collect()
    ]
    assert base == explicit_off


def test_analyzer_changes_plural_query_results(spark):
    """The seam's purpose: a plural/stopworded query only reaches the
    singular-form corpus through analysis."""
    docs = load_table(spark, SF_ORACLE, "documents")
    terms = R.query_terms("the tables of values and rows for queries")
    analyzed = R.bm25_topk(
        docs, terms, k=10, stopwords=STOPWORDS["en"], stem=True
    ).collect()
    plain = R.bm25_topk(docs, terms, k=10).collect()
    assert [r.doc_id for r in analyzed] != [r.doc_id for r in plain]
    # analyzed matching is against the stemmed singulars, so every hit
    # must contain one of them as a (lowered, stemmed) token
    singulars = {"table", "value", "row", "query"}
    sample = docs.filter(
        F.col("doc_id").isin([r.doc_id for r in analyzed.__iter__()][:3])
    ).collect()
    for row in sample:
        toks = {R.s_stem(t.lower()) for t in row.text.split()}
        assert toks & singulars, row.doc_id


def test_analyzed_dl_counts_analyzed_tokens(spark):
    """Document length under the analyzer counts ANALYZED tokens
    (stopwords excluded) — the Lucene convention; visible as a score
    difference vs scoring with raw dl on a stopword-heavy corpus."""
    rows = [
        (1, "the the the table"),
        (2, "table"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    scored = {
        r.doc_id: r.bm25
        for r in R.bm25_scores(
            docs, ["table"], stopwords=STOPWORDS["en"], stem=False
        ).collect()
    }
    # after stopword removal both docs are the single token 'table' →
    # identical dl, identical score
    assert abs(scored[1] - scored[2]) < 1e-12


def test_bm25_index_probe_equals_direct(spark, sf_smoke):
    """Build/probe split: the indexed probe must produce byte-identical
    rows to the direct bm25_topk scan, and the persisted postings store
    round-trips."""
    from ydb_vector_search_demo_spark.operators import retrieval as R
    from ydb_vector_search_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    terms = R.query_terms("fast scan table row value")
    idx = R.build_bm25_index(docs)
    try:
        direct = [tuple(r) for r in R.bm25_topk(docs, terms, k=10).collect()]
        probed = [tuple(r) for r in idx.topk(terms, k=10).collect()]
        assert direct == probed
        # empty-terms probe: stable empty result
        assert idx.topk([], k=10).collect() == []
    finally:
        idx.postings.unpersist()


def test_bm25_postings_roundtrip(spark, sf_smoke, tmp_path):
    from ydb_vector_search_demo_spark.operators import retrieval as R
    from ydb_vector_search_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    terms = R.query_terms("fast scan table row value")
    idx = R.build_bm25_index(docs)
    path = str(tmp_path / "postings")
    try:
        R.write_bm25_postings(idx, path)
        reopened = R.read_bm25_index(spark, path)
        assert reopened.n == idx.n and abs(reopened.avgdl - idx.avgdl) < 1e-12
        a = [tuple(r) for r in idx.topk(terms, k=10).collect()]
        b = [tuple(r) for r in reopened.topk(terms, k=10).collect()]
        assert a == b
        # the probe's term filter reaches the parquet scan
        plan = reopened._scores(terms, 1.2, 0.75)._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan or "pushedFilters" in plan.lower()
    finally:
        idx.postings.unpersist()


def test_bm25_index_analyzed_variant(spark, sf_smoke):
    from ydb_vector_search_demo_spark.functions.textstats import STOPWORDS
    from ydb_vector_search_demo_spark.operators import retrieval as R
    from ydb_vector_search_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    q = "the tables of values and rows for queries"
    terms = R.analyze_terms(R.query_terms(q), stopwords=STOPWORDS["en"], stem=True)
    idx = R.build_bm25_index(docs, stopwords=STOPWORDS["en"], stem=True)
    try:
        direct = [
            tuple(r)
            for r in R.bm25_topk(
                docs, R.query_terms(q), k=10,
                stopwords=STOPWORDS["en"], stem=True,
            ).collect()
        ]
        probed = [tuple(r) for r in idx.topk(terms, k=10).collect()]
        assert direct == probed
    finally:
        idx.postings.unpersist()


def test_bm25_append_equals_full_rebuild(spark, sf_smoke, tmp_path):
    """Incremental postings append + df/stats recompute must be EXACTLY
    a full rebuild over corpus ∪ batch — probes byte-identical — and
    each append publishes a new atomic version (old one still
    readable)."""
    from ydb_vector_search_demo_spark import stores
    from ydb_vector_search_demo_spark.operators import retrieval as R
    from ydb_vector_search_demo_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_smoke, "documents")
    first = docs.filter(F.col("doc_id") < 300)
    batch = docs.filter(F.col("doc_id") >= 300)
    root = str(tmp_path / "bm25_root")

    idx0 = R.build_bm25_index(first)
    try:
        R.publish_bm25_index(spark, root, idx0)
    finally:
        idx0.postings.unpersist()

    seq = R.append_bm25_index(spark, root, batch)
    assert seq == 2

    terms = R.query_terms("fast scan table row value")
    appended = R.read_current_bm25_index(spark, root)
    full = R.build_bm25_index(docs)
    try:
        a = [tuple(r) for r in appended.topk(terms, k=10).collect()]
        b = [tuple(r) for r in full.topk(terms, k=10).collect()]
        assert a == b
        assert appended.n == full.n
        assert abs(appended.avgdl - full.avgdl) < 1e-9
        # postings relations are row-identical too
        pa = sorted(map(tuple, appended.postings.collect()))
        pb = sorted(map(tuple, full.postings.collect()))
        assert pa == pb
    finally:
        full.postings.unpersist()

    # version history: the pre-append index is still resolvable
    assert [s for s, _ in stores.store_history(spark, root)] == [1, 2]
    old = stores.store_path_at(spark, root, 1)
    old_stats = spark.read.parquet(old + "/stats").first()
    assert old_stats["n"] == 300
