"""intervals (Lucene/OpenSearch minimal-interval algebra) — frozen
semantics identical across every execution path:

- functions/intervals.interval_list: the frozen per-doc kernel (greedy
  ordered chain / merge-path unordered sweep / union, each followed by
  antichain minimalization; filters as existentials over minimal
  reference intervals) — proved equal to a DEFINITIONAL brute force
  (product enumeration over child minimal lists + minimalization) on
  random specs x random layouts, including per-interval content (the
  max_gaps carrier);
- intervals_freqs_flat: the flat-array batch shape every engine path
  uses, with OPTIONAL slots (any_of branches, negated filter
  references) — docs lacking an optional term still match;
- sql_intervals_freq: the DuckDB definitional rendering (driver SQL
  oracle) — bit-identical freqs on random renderable specs;
- LocalIndex (exhaustive), cold search_df, warm + sharded QuerySession,
  match_count_df — all rank/score-identical to LuceneOracle;
- parse-time validation of the intervals(...) atom;
- divergence from the span family (minimal-interval vs span-iterator
  enumeration) asserted non-vacuously;
- percolation refuses intervals loudly.
"""

import itertools
import random

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions.intervals import (
    IAnyOf,
    ICombine,
    IFilter,
    ITerm,
    _minimalize,
    interval_list,
    intervals_freq,
    intervals_freqs_flat,
    sql_intervals_freq,
    spec_required_terms,
)
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    match_count_df,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import Intervals, parse


def brute(spec, pos_of):
    """Definitional minimal intervals: FULL product enumeration over the
    children's (recursively brute) minimal lists + minimalization —
    independent of the kernel's greedy/sweep mechanics."""
    if isinstance(spec, ITerm):
        return [(int(p), int(p), 1) for p in pos_of.get(spec.term, [])]
    if isinstance(spec, IAnyOf):
        m = []
        for c in spec.children:
            m.extend(brute(c, pos_of))
        return _minimalize(m)
    if isinstance(spec, ICombine):
        lists = [brute(c, pos_of) for c in spec.children]
        if any(not l for l in lists):
            return []
        cands = []
        for combo in itertools.product(*lists):
            if spec.kind == "ordered":
                if not all(combo[j + 1][0] > combo[j][1] for j in range(len(combo) - 1)):
                    continue
                s, e = combo[0][0], combo[-1][1]
            else:
                s = min(iv[0] for iv in combo)
                e = max(iv[1] for iv in combo)
            cands.append((s, e, sum(iv[2] for iv in combo)))
        out = _minimalize(cands)
        if spec.max_gaps >= 0:
            out = [t for t in out if (t[1] - t[0] + 1) - t[2] <= spec.max_gaps]
        return out
    src = brute(spec.source, pos_of)
    ref = brute(spec.reference, pos_of)
    k = spec.kind
    if k == "containing":
        return [i for i in src if any(j[0] >= i[0] and j[1] <= i[1] for j in ref)]
    if k == "not_containing":
        return [i for i in src if not any(j[0] >= i[0] and j[1] <= i[1] for j in ref)]
    if k == "contained_by":
        return [i for i in src if any(i[0] >= j[0] and i[1] <= j[1] for j in ref)]
    if k == "not_contained_by":
        return [i for i in src if not any(i[0] >= j[0] and i[1] <= j[1] for j in ref)]
    if k == "not_overlapping":
        return [i for i in src if not any(j[1] >= i[0] and j[0] <= i[1] for j in ref)]
    if k == "before":
        return [i for i in src if any(i[1] < j[0] for j in ref)]
    if k == "after":
        return [i for i in src if any(i[0] > j[1] for j in ref)]
    raise ValueError(k)


TERMS = list("abcdef")


def rand_spec(rng, depth, used):
    r = rng.random()
    if depth >= 3 or r < 0.35:
        avail = [t for t in TERMS if t not in used]
        if not avail:
            return None
        t = rng.choice(avail)
        used.add(t)
        return ITerm(t)
    if r < 0.6:
        ch = []
        for _ in range(rng.randint(2, 3)):
            c = rand_spec(rng, depth + 1, used)
            if c is None:
                return None
            ch.append(c)
        return ICombine(
            rng.choice(["ordered", "unordered"]), tuple(ch),
            rng.choice([-1, -1, 0, 1, 2, 5]),
        )
    if r < 0.75:
        ch = []
        for _ in range(rng.randint(2, 3)):
            c = rand_spec(rng, depth + 1, used)
            if c is None:
                return None
            ch.append(c)
        return IAnyOf(tuple(ch))
    s = rand_spec(rng, depth + 1, used)
    ref = rand_spec(rng, depth + 1, used)
    if s is None or ref is None:
        return None
    kind = rng.choice([
        "containing", "contained_by", "not_containing", "not_contained_by",
        "not_overlapping", "before", "after",
    ])
    return IFilter(kind, s, ref)


def rand_layout(rng, used, span=20, max_occ=5):
    """One-term-per-position layouts (the analyzer invariant)."""
    pool = list(range(span))
    rng.shuffle(pool)
    pos_of, off = {}, 0
    for t in used:
        n = rng.randint(0, max_occ)
        if n:
            pos_of[t] = np.array(sorted(pool[off : off + n]), dtype=np.int64)
            off += n
    return pos_of


class TestKernelUnit:
    @pytest.mark.parametrize(
        "spec,pos,expect",
        [
            # ordered: greedy minimal pair only — (1,2), not (0,2)
            (ICombine("ordered", (ITerm("a"), ITerm("b"))),
             {"a": [0, 1], "b": [2]}, [(1, 2, 2)]),
            # unordered minimalizes the sweep's wider window away
            (ICombine("unordered", (ITerm("a"), ITerm("b"))),
             {"a": [1, 2], "b": [3]}, [(2, 3, 2)]),
            # max_gaps filters AFTER minimalization: the surviving
            # minimal interval (gap 1) is dropped at max_gaps=0
            (ICombine("ordered", (ITerm("a"), ITerm("b")), 0),
             {"a": [0], "b": [2]}, []),
            (ICombine("ordered", (ITerm("a"), ITerm("b")), 1),
             {"a": [0], "b": [2]}, [(0, 2, 2)]),
            # any_of union is minimalized across branches
            (IAnyOf((ICombine("ordered", (ITerm("a"), ITerm("b"))), ITerm("c"))),
             {"a": [0], "b": [2], "c": [1]}, [(1, 1, 1)]),
            # not_containing over MINIMAL source intervals only
            (IFilter("not_containing",
                     ICombine("unordered", (ITerm("a"), ITerm("b"))), ITerm("c")),
             {"a": [0, 4], "b": [2], "c": [3]}, [(0, 2, 2)]),
            # before: source intervals ending before SOME ref start
            (IFilter("before", ITerm("a"), ITerm("b")),
             {"a": [1, 5, 9], "b": [6]}, [(1, 1, 1), (5, 5, 1)]),
            # missing required term -> empty
            (ICombine("ordered", (ITerm("a"), ITerm("b"))), {"a": [0]}, []),
        ],
    )
    def test_hand_cases(self, spec, pos, expect):
        pos_of = {k: np.asarray(v, dtype=np.int64) for k, v in pos.items()}
        assert interval_list(spec, pos_of) == expect

    def test_freq_fold_is_float32(self):
        spec = ICombine("unordered", (ITerm("a"), ITerm("b")))
        pos_of = {"a": np.array([1, 5]), "b": np.array([3, 9])}
        ivs = interval_list(spec, pos_of)
        acc = np.float32(0.0)
        for s, e, _ in ivs:
            acc = np.float32(acc + np.float32(1.0 / (1.0 + (e - s))))
        assert intervals_freq(spec, pos_of) == acc

    def test_random_battery_vs_bruteforce(self):
        """kernel == definitional brute force on random specs x layouts,
        INCLUDING the content carried per interval (the max_gaps
        semantics)."""
        rng = random.Random(42)
        n = 0
        for _ in range(1500):
            used = set()
            spec = rand_spec(rng, 0, used)
            if spec is None:
                continue
            pos_of = rand_layout(rng, used)
            assert interval_list(spec, pos_of) == brute(spec, pos_of), (
                spec, {k: list(v) for k, v in pos_of.items()})
            n += 1
        assert n > 800

    def test_max_gaps_monotone(self):
        rng = random.Random(3)
        for _ in range(300):
            used = set()
            a, b = rng.sample(TERMS, 2)
            used |= {a, b}
            pos_of = rand_layout(rng, used)
            kind = rng.choice(["ordered", "unordered"])
            prev = None
            for g in (0, 1, 3, -1):
                cur = {
                    (s, e)
                    for s, e, _ in interval_list(
                        ICombine(kind, (ITerm(a), ITerm(b)), g), pos_of)
                }
                if prev is not None and g != -1:
                    assert prev <= cur
                if g == -1:
                    assert prev <= cur
                prev = cur

    def test_flat_matches_per_doc(self):
        rng = random.Random(11)
        spec = IFilter(
            "not_containing",
            ICombine("unordered", (ITerm("a"), ITerm("b"))),
            ITerm("c"),
        )
        node = Intervals(spec)
        terms = node.terms
        req = node.required_slots
        per_doc = {}
        slot_docs = [[] for _ in terms]
        slot_pos = [[] for _ in terms]
        for d in range(30):
            pos_of = rand_layout(rng, set(terms), span=15, max_occ=4)
            per_doc[d] = intervals_freq(spec, pos_of)
            for i, t in enumerate(terms):
                for p in pos_of.get(t, []):
                    slot_docs[i].append(d)
                    slot_pos[i].append(int(p))
        docs, freqs = intervals_freqs_flat(
            [np.asarray(x, dtype=np.int64) for x in slot_docs],
            [np.asarray(x, dtype=np.int64) for x in slot_pos],
            spec, terms, req,
        )
        exp = {d: float(f) for d, f in per_doc.items() if f > 0}
        assert dict(zip(docs.tolist(), freqs.tolist())) == exp

    def test_required_terms_algebra(self):
        spec = IFilter(
            "not_containing",
            IAnyOf((ITerm("a"), ICombine("ordered", (ITerm("b"), ITerm("c"))))),
            ITerm("d"),
        )
        # any_of intersection is empty; negated reference optional
        assert spec_required_terms(spec) == set()
        spec2 = IFilter("before", ICombine("unordered", (ITerm("a"), ITerm("b"))),
                        ITerm("c"))
        assert spec_required_terms(spec2) == {"a", "b", "c"}


class TestSqlKernelEquivalence:
    def test_random_renderable_specs(self):
        rng = random.Random(99)
        con = duckdb.connect()
        n = 0
        for _ in range(250):
            used = set()

            def base():
                r = rng.random()
                avail = [t for t in TERMS if t not in used]
                if r < 0.25 and avail:
                    t = rng.choice(avail)
                    used.add(t)
                    return ITerm(t)
                if r < 0.5 and len(avail) >= 2:
                    ts = rng.sample(avail, 2)
                    used.update(ts)
                    return IAnyOf((ITerm(ts[0]), ITerm(ts[1])))
                if len(avail) >= 2:
                    ts = rng.sample(avail, 2)
                    used.update(ts)
                    return ICombine(
                        rng.choice(["ordered", "unordered"]),
                        (ITerm(ts[0]), ITerm(ts[1])),
                        rng.choice([-1, -1, 0, 1, 3]),
                    )
                return None

            spec = base()
            if spec is None:
                continue
            if rng.random() < 0.6:
                ref = base()
                if ref is not None:
                    spec = IFilter(
                        rng.choice([
                            "containing", "contained_by", "not_containing",
                            "not_contained_by", "not_overlapping", "before",
                            "after",
                        ]),
                        spec, ref,
                    )
            rows, expect = [], {}
            for docid in range(3):
                pos_of = rand_layout(rng, used, span=15, max_occ=4)
                for t, ps in pos_of.items():
                    rows.extend((docid, t, int(p)) for p in ps)
                f = intervals_freq(spec, pos_of)
                if f > 0:
                    expect[docid] = np.float32(f)
            if not rows:
                continue
            con.execute(
                "CREATE OR REPLACE TABLE tok AS SELECT * FROM (VALUES "
                + ",".join(f"({d},'{t}',{p})" for d, t, p in rows)
                + ") v(docid, term, pos)"
            )
            sql = ("WITH " + sql_intervals_freq(spec, "ivf", "iv0")
                   + " SELECT docid, freq FROM ivf WHERE freq > 0")
            got = {d: np.float32(v) for d, v in con.execute(sql).fetchall()}
            assert got == expect, spec
            n += 1
        assert n > 150

    def test_wide_specs_refused(self):
        with pytest.raises(NotImplementedError):
            sql_intervals_freq(
                ICombine("ordered", (ITerm("a"), ITerm("b"), ITerm("c"))),
                "x", "p")
        with pytest.raises(NotImplementedError):
            sql_intervals_freq(
                IAnyOf((ITerm("a"), ICombine("ordered", (ITerm("b"), ITerm("c"))))),
                "x", "p")


class TestParse:
    def test_shapes(self):
        n = parse("intervals(ordered(max_gaps=3 connection reset))")
        assert isinstance(n, Intervals)
        assert n.spec == ICombine(
            "ordered", (ITerm("connection"), ITerm("reset")), 3)
        n2 = parse("intervals(not_containing(unordered(error timeout) refused))^2")
        assert n2.boost == 2.0
        assert n2.spec.kind == "not_containing"
        assert n2.terms == ("error", "timeout", "refused")
        # optional slot: the negated reference's term
        assert sorted(n2.required_slots) == [0, 1]
        n3 = parse("intervals(any_of(ordered(alpha beta) gamma))")
        assert n3.required_slots == frozenset()

    @pytest.mark.parametrize("bad", [
        "intervals(ordered(alpha))",
        "intervals(alpha beta)",
        "intervals(ordered(alpha beta) extra)",
        "intervals(before(alpha))",
        "intervals(ordered(alpha alpha))",
        "intervals(ordered(max_gaps=-2 alpha beta))",
        "intervals(contained_by(alpha beta gamma))",
        "intervals(ordered(max_gaps=x alpha beta))",
        "intervals()",
    ])
    def test_rejections(self, bad):
        with pytest.raises(ValueError):
            parse(bad)


IV_QUERIES = [
    "intervals(ordered(connection reset))",
    "intervals(ordered(max_gaps=2 connection reset))",
    "intervals(unordered(error timeout))",
    "intervals(unordered(max_gaps=3 connection reset))",
    "intervals(any_of(refused timeout))",
    "intervals(not_containing(unordered(connection reset) error))",
    "intervals(contained_by(error unordered(connection timeout)))",
    "intervals(before(ordered(connection reset) timeout))",
    "intervals(after(refused any_of(denied failed)))",
    "intervals(ordered(connection any_of(reset timeout)))",
    "intervals(unordered(error timeout)) AND refused",
    "intervals(ordered(connection reset)) OR denied",
    # absent-term resilience: any_of matches through the present branch,
    # a negated reference that never occurs excludes nothing
    "intervals(any_of(error zzzmissingterm))",
    "intervals(not_containing(unordered(connection reset) zzzmissingterm))",
]


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


def _hits(rows):
    return [(int(r["docid"]), np.float32(r["score"])) for r in rows]


def _expect(oracle, q, k=10):
    return [(h.docid, np.float32(h.score)) for h in oracle.search(q, k=k)]


class TestEnginePaths:
    @pytest.mark.parametrize("q", IV_QUERIES)
    def test_local_vs_oracle(self, local, oracle, q):
        got = [(int(d), np.float32(s)) for d, s in local.search(q, k=10)]
        assert got == _expect(oracle, q), q

    @pytest.mark.parametrize("q", IV_QUERIES)
    def test_cold_search_df_vs_oracle(self, spark, tiny_index, oracle, q):
        got = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
        assert got == _expect(oracle, q), q

    @pytest.mark.parametrize("q", IV_QUERIES[:8])
    def test_warm_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0])
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    @pytest.mark.parametrize("q", IV_QUERIES[:4])
    def test_sharded_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0], broadcast_cap=0)
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    def test_with_filters(self, spark, tiny_index, oracle):
        q = "intervals(unordered(connection reset))"
        got = _hits(search_df(spark, tiny_index[0], q, k=10, role="assistant").collect())
        exp = [(h.docid, np.float32(h.score)) for h in oracle.search(q, k=10, role="assistant")]
        assert got == exp

    def test_match_count(self, spark, tiny_index, oracle):
        q = "intervals(unordered(error timeout)) AND refused"
        n = match_count_df(spark, tiny_index[0], q).collect()[0]["n_matches"]
        assert n == len(oracle.search(q, k=10**9))

    def test_explain_totals(self, local):
        q = "intervals(ordered(connection reset)) OR error"
        for d, s in local.search(q, k=5):
            ex = local.explain(q, int(d))
            assert np.float32(ex["total"]) == s

    def test_differs_from_span_family(self, oracle):
        """Minimal-interval semantics is NOT the span-iterator
        enumeration: both modes must diverge somewhere on this corpus
        (e.g. the span sweep's non-minimal configurations score extra
        1/(1+w) contributions that minimalization removes)."""
        a = {(h.docid, h.score)
             for h in oracle.search("intervals(unordered(connection reset))", k=10**6)}
        b = {(h.docid, h.score)
             for h in oracle.search("span_near(slop=100000 connection reset)", k=10**6)}
        assert a != b
        ao = {(h.docid, h.score)
              for h in oracle.search("intervals(ordered(connection error))", k=10**6)}
        bo = {(h.docid, h.score)
              for h in oracle.search(
                  "span_near(slop=100000 in_order=true connection error)", k=10**6)}
        assert ao != bo

    def test_modes_nonvacuous(self, oracle):
        o = {h.docid for h in oracle.search(
            "intervals(ordered(max_gaps=3 connection reset))", k=10**6)}
        u = {h.docid for h in oracle.search(
            "intervals(unordered(max_gaps=3 connection reset))", k=10**6)}
        assert o and u and o <= u and o != u


class TestSqlOracle:
    def test_bm25_sql_intervals(self, tmp_path, tiny_corpus_pdf, oracle):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        for q in IV_QUERIES[:9]:
            got = duckdb.sql(bm25_sql(p, q, k=10)).fetchall()
            exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
            assert [(int(d), float(s)) for d, s in got] == exp, q

    def test_wide_sql_refused(self, tmp_path, tiny_corpus_pdf):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        with pytest.raises(NotImplementedError):
            bm25_sql(p, "intervals(ordered(connection any_of(reset timeout)))", k=10)


class TestPercolate:
    def test_refused(self, spark, tiny_corpus_pdf):
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
        )

        with pytest.raises(NotImplementedError, match="intervals"):
            compile_predicate("intervals(ordered(connection reset))")
