"""Sliding-window chunking (operators/chunking) vs a pure-Python replay."""

import math
import re

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import chunking


def py_chunks(text, window, stride):
    toks = [t.lower() for t in re.split(r"[^A-Za-z0-9_]+", text or "") if t]
    n = len(toks)
    nc = 1 + max(0, math.ceil((n - window) / stride))
    return [
        (" ".join(toks[c * stride : c * stride + window]),
         len(toks[c * stride : c * stride + window]))
        for c in range(nc)
    ]


CASES = [
    ("", 8, 4),                       # empty -> one empty chunk
    ("one two three", 8, 4),          # shorter than window -> one chunk
    (" ".join(f"t{i}" for i in range(8)), 8, 4),    # exactly window
    (" ".join(f"t{i}" for i in range(9)), 8, 4),    # one past window
    (" ".join(f"t{i}" for i in range(100)), 8, 4),  # overlapping windows
    (" ".join(f"t{i}" for i in range(100)), 8, 8),  # non-overlapping
    ("Hello, WORLD!! foo_bar 42; x", 3, 2),         # punctuation splits
]


@pytest.mark.parametrize("impl", ["arrow", "column"])
@pytest.mark.parametrize("text,window,stride", CASES)
def test_chunks_match_python(spark, text, window, stride, impl):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = (
        chunking.chunk_documents(df, "doc_id", F.col("text"), window, stride, impl=impl)
        .orderBy("chunk_idx")
        .collect()
    )
    exp = py_chunks(text, window, stride)
    assert [(r.chunk_text, r.n_tokens) for r in got] == exp
    assert [r.chunk_idx for r in got] == list(range(len(exp)))


def test_arrow_equals_column(spark):
    texts = [
        (i, f"Word{i} " * (i * 7 % 90) + ("x, y! z;" if i % 3 == 0 else ""))
        for i in range(40)
    ] + [(100, ""), (101, "   "), (102, "one")]
    df = spark.createDataFrame(texts, "doc_id long, text string").repartition(4)
    a = chunking.chunk_documents(df, "doc_id", F.col("text"), 8, 5, impl="arrow")
    c = chunking.chunk_documents(df, "doc_id", F.col("text"), 8, 5, impl="column")
    ka = sorted(map(tuple, a.collect()))
    kc = sorted(map(tuple, c.collect()))
    assert ka == kc
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, "doc_id", F.col("text"), 8, 5, impl="nope")


def test_coverage_no_gaps(spark):
    """With stride <= window every token index is covered by some chunk."""
    text = " ".join(f"t{i}" for i in range(57))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunking.chunk_documents(df, "doc_id", F.col("text"), 10, 7).collect()
    covered = set()
    for r in rows:
        start = r.chunk_idx * 7
        covered.update(range(start, start + r.n_tokens))
    assert covered == set(range(57))
    # every token of the original stream appears in order in chunk 0
    assert rows[0].chunk_text.split(" ")[:3] == ["t0", "t1", "t2"]


def test_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, "doc_id", F.col("text"), 8, 9)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, "doc_id", F.col("text"), 8, 0)


def test_chunk_stats(spark):
    texts = [
        (1, " ".join(f"a{i}" for i in range(10))),
        (2, "b"),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    ch = chunking.chunk_documents(df, "doc_id", F.col("text"), 4, 3)
    out = chunking.chunk_stats(ch, "doc_id").collect()[0]
    # doc1: n=10 -> 1+ceil(6/3)=3 chunks (4,4,4 tokens... starts 0,3,6 ->
    # sizes 4,4,4), doc2: 1 chunk 1 token, doc3: 1 empty chunk
    assert out.n_docs == 3
    assert out.n_chunks == 5
    assert out.total_tokens == 4 + 4 + 4 + 1 + 0
    assert out.max_chunks_per_doc == 3


def test_tokenize_once_in_plan(spark):
    """The generator boundary keeps tokenization single-evaluation: the
    split() expression appears exactly once in the optimized plan."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    ch = chunking.chunk_documents(df, "doc_id", F.col("text"), 4, 3, impl="column")
    plan = ch._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan


def test_bpe_token_estimate(spark):
    from siem_on_amazon_opensearch_service_spark.operators.textstats import (
        bpe_token_estimate,
        token_estimates,
    )

    rows = [
        (1, "hello world"),        # 2 + 2 = 4 units, 0 punct
        (2, "internationalization"),  # ceil(20/4) = 5
        (3, "a, b!"),              # 1 + 1 words + ', !' = 2 punct -> 4
        (4, ""),                   # 0
        (5, "x" * 9),              # ceil(9/4) = 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.nb
        for r in df.select("doc_id", bpe_token_estimate(F.col("text")).alias("nb")).collect()
    }
    assert got == {1: 4, 2: 5, 3: 4, 4: 0, 5: 3}
    agg = token_estimates(df).collect()[0]
    assert agg.n_docs == 5 and agg.bpe_tokens == 16
