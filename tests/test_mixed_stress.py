"""Mixed-leaf stress battery: random boolean trees whose leaves draw from
terms, exact phrases, sloppy phrases, and phrase prefixes (with random
boosts), validated exhaustive-vs-frozen-oracle — the shape-interaction
hardening pass for the r4c leaf types (slop inside NOT, prefixes under
OR, boosts on phrase-likes, ...)."""

import random

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex, search_df

HOT = ["error", "timeout", "refused", "denied", "connection", "reset",
       "assistant", "file", "request", "network", "permission"]
PAIRS = [("connection", "reset"), ("permission", "denied"),
         ("error", "timeout"), ("network", "connection")]
PREFIX = ["re", "con", "time", "den", "w000", "perm"]


def _leaf(rng: random.Random) -> str:
    r = rng.random()
    boost = "^" + rng.choice(["2", "0.5", "3"]) if rng.random() < 0.3 else ""
    if r < 0.35:
        t = rng.choice(HOT) if rng.random() < 0.7 else f"w{rng.randrange(2000):05d}"
        return t + boost
    a, b = rng.choice(PAIRS)
    if r < 0.5:
        return f'"{a} {b}"' + boost
    if r < 0.62:
        return f'"{a} {b}"~{rng.randrange(1, 5)}' + boost
    if r < 0.72:
        return f'"{rng.choice(HOT)} {rng.choice(PREFIX)}"*' + boost
    # r4f span family
    if r < 0.8:
        order = "in_order=true " if rng.random() < 0.5 else ""
        return f"span_near(slop={rng.randrange(0, 5)} {order}{a} {b})" + boost
    if r < 0.87:
        return f"span_first(end={rng.randrange(1, 12)} {rng.choice(HOT)})" + boost
    if r < 0.94:
        return f"span_not(dist={rng.randrange(0, 6)} {a} {b})" + boost
    ts = rng.sample(HOT, rng.choice([2, 3]))
    return f"span_or({' '.join(ts)})" + boost


def _tree(rng: random.Random, depth: int) -> str:
    if depth == 0 or rng.random() < 0.4:
        return _leaf(rng)
    op = rng.choice(["AND", "OR"])
    parts = [_tree(rng, depth - 1) for _ in range(rng.choice([2, 3]))]
    if op == "AND" and rng.random() < 0.3:
        parts.append("NOT " + _leaf(rng))
    return "(" + f" {op} ".join(parts) + ")"


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


class TestMixedLeafStress:
    def test_local_equals_oracle_random_mixed_trees(self, local, oracle):
        rng = random.Random(97)
        nonempty = 0
        for trial in range(40):
            q = _tree(rng, 2)
            k = rng.choice([1, 5, 10])
            got = [(int(d), np.float32(s)) for d, s in local.search(q, k=k)]
            exp = [(h.docid, h.score) for h in oracle.search(q, k=k)]
            assert got == exp, (q, k)
            nonempty += bool(got)
        assert nonempty >= 20, f"only {nonempty} non-empty results — battery too weak"

    def test_cold_distributed_sample(self, spark, tiny_index, oracle):
        """A sample of the same trees through the full distributed plan
        (decode + phrase resolution + pruning interplay)."""
        rng = random.Random(131)
        ran = 0
        while ran < 6:
            q = _tree(rng, 2)
            exp = [(h.docid, h.score) for h in oracle.search(q, k=10)]
            try:
                rows = search_df(spark, tiny_index[0], q, k=10).collect()
            except ValueError:
                continue  # coverage-invalid shape (e.g. pure-negative OR branch)
            got = [(r["docid"], np.float32(r["score"])) for r in rows]
            assert got == exp, q
            ran += 1

    def test_filters_over_mixed_trees(self, local, oracle):
        rng = random.Random(151)
        for trial in range(10):
            q = _tree(rng, 1)
            kw = rng.choice([
                {"role": "assistant"}, {"tool": "bash"},
                {"ts_min": "2025-06-05 00:00:00"},
            ])
            got = [(int(d), np.float32(s)) for d, s in local.search(q, k=10, **kw)]
            exp = [(h.docid, h.score) for h in oracle.search(q, k=10, **kw)]
            assert got == exp, (q, kw)
