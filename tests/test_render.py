"""Chat rendering (operators/render) + filtered kNN (similarity)."""

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import render, similarity


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        ("c1", 0, "user", "hello"),
        ("c1", 1, "assistant", "hi there"),
        ("c1", 2, "user", "bye"),
        ("c2", 0, "system", "rules"),
        ("c2", 1, "assistant", "ok"),
        ("c3", 0, "user", "solo"),
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")


def test_chat_render_matches_python(convs):
    out = {r.conv_id: r for r in render.chat_render_stats(convs).collect()}
    docs = {
        "c1": "<|user|> hello\n<|assistant|> hi there\n<|user|> bye\n",
        "c2": "<|system|> rules\n<|assistant|> ok\n",
        "c3": "<|user|> solo\n",
    }
    masks = {"c1": len("<|assistant|> hi there\n"), "c2": len("<|assistant|> ok\n"), "c3": 0}
    for c, doc in docs.items():
        r = out[c]
        assert r.n_chars == len(doc), c
        assert r.mask_chars == masks[c], c
        assert r.doc_md5 == hashlib.md5(doc.encode()).hexdigest(), c
    assert out["c1"].n_turns == 3


def test_chat_render_order_is_turn_idx_not_arrival(spark):
    # shuffle arrival order: render must still follow turn_idx
    rows = [("c", 2, "user", "third"), ("c", 0, "user", "first"), ("c", 1, "user", "second")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string").repartition(4)
    r = render.chat_render_stats(df).collect()[0]
    doc = "<|user|> first\n<|user|> second\n<|user|> third\n"
    assert r.doc_md5 == hashlib.md5(doc.encode()).hexdigest()


def test_chat_render_sql_matches(convs, tmp_path):
    p = str(tmp_path / "t.parquet")
    convs.toPandas().to_parquet(p)
    got = [tuple(map(str, r)) for r in render.chat_render_stats(convs).collect()]
    exp = [tuple(map(str, r)) for r in duckdb.sql(render.chat_render_sql(p)).fetchall()]
    assert got == exp


def test_filtered_knn_prefilter_semantics(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.rand(30, 8).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(30), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    out = similarity.filtered_cosine_topk(
        emb, [1], F.col("vec_id") % 2 == 0, k=5
    ).collect()
    ids = [r.vec_id for r in out]
    assert len(ids) == 5 and all(i % 2 == 0 for i in ids)
    # pre-filter: equals brute-force top-k computed over the even subset
    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    ref = sorted(
        ((round(cos(vecs[1], vecs[i]), 6), -i) for i in range(30) if i % 2 == 0 and i != 1),
        reverse=True,
    )[:5]
    assert ids == [-i for _, i in ref]
    # the query (vec 1, odd) is allowed even though it fails the filter


def test_c4_arrow_equals_column(spark):
    from siem_on_amazon_opensearch_service_spark.operators.textstats import (
        c4_pipeline_stats,
    )

    texts = []
    base_words = ("the of and to in for is that have with word data table "
                  "row line value item alpha beta gamma delta").split()
    for i in range(60):
        words = [base_words[(i * 7 + j) % len(base_words)] for j in range(i % 130)]
        t = " ".join(words)
        if i % 5 == 0:
            t += " ### ... ..."
        if i % 7 == 0:
            t = "- bullet one\n- bullet two\n" + t + "\nend..."
        if i % 11 == 0:
            t = t + "\n" + t  # duplicate lines
        texts.append((i, t))
    texts += [(200, ""), (201, "der die das und von zu ist " * 12),
              (202, "el la los y de en es un " * 12), (203, "12345 67 89 " * 30)]
    # exact duplicates to exercise dedup
    texts += [(300, texts[10][1]), (301, texts[10][1])]
    df = spark.createDataFrame(texts, "doc_id long, text string").repartition(4)
    a = c4_pipeline_stats(df, impl="arrow").collect()[0]
    c = c4_pipeline_stats(df, impl="column").collect()[0]
    assert tuple(a) == tuple(c), (tuple(a), tuple(c))
    with pytest.raises(ValueError):
        c4_pipeline_stats(df, impl="nope")
