"""Golden end-to-end tests (SURVEY.md §5.2 items 3-5): exact prompt
string and envelope shape on a controlled fixture store, table-driven
scalar-function semantics mirrored from the reference JS, and KNN
properties (top-k nesting, determinism, metric sanity)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_demo_spark.functions import strings as S
from ydb_vector_search_demo_spark.functions.vector import cosine_distance
from ydb_vector_search_demo_spark.operators.knn import knn_scores
from ydb_vector_search_demo_spark.pipeline import rag

QUERY = "как оформить возврат"


@pytest.fixture(scope="module")
def store_dir(spark, tmp_path_factory):
    """A 5-doc store whose KNN order under the stubbed query embedding is
    fully determined: doc i's embedding interpolates between the query
    vector and a fixed orthogonal-ish direction, so distances are
    strictly increasing in i."""
    d = str(tmp_path_factory.mktemp("golden_store"))
    qv = rag.embed_query_stub(QUERY)
    other = rag.embed_query_stub("совершенно другая тема про еду")

    def mix(w: float) -> list[float]:
        v = [w * a + (1 - w) * b for a, b in zip(qv, other)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    texts = [
        "Возврат товара оформляется в личном кабинете.",
        "Срок возврата — 14 дней с момента покупки.",
        "Деньги вернутся на карту в течение 5 дней.",
        "Доставка осуществляется по всей стране.",
        "Оплата возможна картой или наличными.",
    ]
    docs = spark.createDataFrame(
        [(i, t, "ru", f"doc_{i}", len(t)) for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    embs = spark.createDataFrame(
        [(i, mix(1.0 - 0.2 * i), 0) for i in range(5)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    )
    docs.write.parquet(f"{d}/documents.parquet")
    embs.write.parquet(f"{d}/embeddings.parquet")
    return d, texts


def test_prompt_is_byte_exact(spark, store_dir):
    d, texts = store_dir
    row = rag.search_with_summary(spark, d, QUERY).collect()[0]
    expected_context = "\n\n".join(texts[:3])  # top-3, \n\n join (app.py:82)
    expected_prompt = rag.PROMPT_TEMPLATE % (QUERY, expected_context)
    assert row["prompt"] == expected_prompt
    # the exact Russian template framing (app.py:86-91)
    assert row["prompt"].startswith(
        'На основе следующих документов ответь на вопрос: "как оформить возврат"\n\nДокументы:\n'
    )
    assert row["prompt"].endswith("укажи это.")
    assert row["summary"] == rag.summarize_stub(expected_prompt)
    assert row["n_docs"] == 3


def test_envelope_shape_and_rounding(spark, store_dir):
    d, texts = store_dir
    formatted = rag.search(spark, d, QUERY)
    summary_df = rag.search_with_summary(spark, d, QUERY)
    env = rag.response_envelope(
        QUERY,
        formatted,
        summary_df,
        timings={"embedding_time": 0.12345, "search_time": 0.2, "gpt_time": 0.0019},
    )
    row = env.collect()[0]
    assert row["success"] is True
    assert row["query"] == QUERY
    assert row["count"] == 5
    assert [r["content"] for r in row["results"]] == texts  # ordered by id
    assert [r["id"] for r in row["results"]] == [1, 2, 3, 4, 5]
    perf = row["performance"]
    assert perf["embedding_time"] == 0.123  # 3-dp rounding (app.py:162-165)
    assert perf["gpt_time"] == 0.002
    assert perf["total_time"] == round(0.12345 + 0.2 + 0.0019, 3)
    # JSON edge: all envelope keys present in the serialized form
    js = env.select(F.to_json(F.struct(*env.columns)).alias("j")).collect()[0]["j"]
    for key in ("success", "query", "results", "count", "summary", "performance"):
        assert f'"{key}"' in js


def _js_truncate(text: str, max_length: int) -> str:
    """Literal mirror of script.js:294-308."""
    if len(text) <= max_length:
        return text
    truncated = text[:max_length]
    last_space = truncated.rfind(" ")
    if last_space > max_length * 0.8:
        return truncated[:last_space] + "..."
    return truncated + "..."


@pytest.mark.parametrize(
    "text",
    [
        "short",
        "exactly-twenty-chars",
        "a" * 25,  # no space in the cut → hard cut
        "word " * 10,  # space right at the end → word-boundary cut
        "aaaaaaaaaaaaaaaa bbbbbbbbbbbb",  # space at 16 = 80% edge
        "aaaaaaaaaaaaaaaaa bbbbbbbbbbb",  # space at 17 > 80% → cut there
        "aaa " + "b" * 30,  # early space only → hard cut
        "многа букф про возврат товара и денег",  # non-ASCII
    ],
)
def test_truncate_matches_js(spark, text):
    got = (
        spark.range(1)
        .select(S.truncate_text(F.lit(text), 20).alias("t"))
        .collect()[0]["t"]
    )
    assert got == _js_truncate(text, 20)


def test_scalar_fn_goldens(spark):
    rows = spark.range(1).select(
        S.escape_html(F.lit('&lt; <b>"x"</b> & \'y\'')).alias("esc"),
        S.strip_markdown_headers(
            F.lit("# Head {#h}\nbody\n\n\n## Sub\ntail")
        ).alias("md"),
        S.breadcrumb(F.lit("Главная {#home}"), F.lit(None), F.lit("Тема")).alias("crumb"),
        S.last_anchor(F.lit("A {#a1}"), F.lit("B {#b2}"), F.lit("C")).alias("anchor"),
        S.source_link(F.lit("path/page"), F.lit("frag")).alias("link"),
        S.source_link(F.lit(None), F.lit("frag")).alias("null_link"),
        S.format_score(F.lit(0.0001234)).alias("exp"),
        S.format_score(F.lit(0.5)).alias("fix3"),
        S.format_score(F.lit(12.345)).alias("fix2"),
        S.newlines_to_html(F.lit("a\n\nb\nc")).alias("html"),
    ).collect()[0]
    # '&' escaped first: '&lt;' double-escapes exactly like the JS chain
    assert rows["esc"] == "&amp;lt; &lt;b&gt;&quot;x&quot;&lt;/b&gt; &amp; &#039;y&#039;"
    assert rows["md"] == "body\n\ntail"
    assert rows["crumb"] == "Главная > Тема"
    assert rows["anchor"] == "b2"  # deepest header with an anchor wins
    assert rows["link"] == "https://yandex.ru/support/market/ru/path/page#frag"
    assert rows["null_link"] is None
    assert rows["exp"] == "1.23e-4"  # JS toExponential(2), unpadded exponent
    assert rows["fix3"] == "0.500"
    assert rows["fix2"] == "12.35"
    assert rows["html"] == "<p>a</p><p>b<br>c</p>"


def test_topk_nesting_and_determinism(spark, store_dir):
    d, _ = store_dir
    embs = spark.read.parquet(f"{d}/embeddings.parquet")
    qv = rag.embed_query_stub(QUERY)
    top3 = [r["vec_id"] for r in knn_scores(embs, qv, k=3).collect()]
    top5 = [r["vec_id"] for r in knn_scores(embs, qv, k=5).collect()]
    assert top5[:3] == top3  # top-k is a prefix of top-(k+1)
    assert top3 == [0, 1, 2]  # the constructed interpolation order
    again = [r["vec_id"] for r in knn_scores(embs, qv, k=5).collect()]
    assert again == top5  # deterministic under re-execution


def test_cosine_distance_properties(spark):
    import random

    rng = random.Random(7)
    pairs = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(16)],
            [rng.uniform(-1, 1) for _ in range(16)],
        )
        for i in range(64)
    ]
    df = spark.createDataFrame(
        pairs, "id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    rows = df.select(
        cosine_distance("a", "b").alias("ab"),
        cosine_distance("b", "a").alias("ba"),
        cosine_distance("a", "a").alias("aa"),
    ).collect()
    for r in rows:
        assert abs(r["ab"] - r["ba"]) < 1e-12  # symmetry
        assert -1e-12 <= r["ab"] <= 2 + 1e-12  # range [0, 2]
        assert abs(r["aa"]) < 1e-12  # identity
