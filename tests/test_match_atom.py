"""``match(...)`` free-text atom: OpenSearch's ``match`` query — analyze
arbitrary input at query time into a bool of term queries (operator=or/and,
optional fuzziness).  Rewrites at parse time into the existing Term/Fuzzy
leaf machinery, so every execution path and the SQL oracle apply unchanged;
these tests pin the rewrite and the end-to-end parity."""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators import sqloracle as so
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import (
    And,
    Fuzzy,
    Or,
    Term,
    parse,
)


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


class TestParseRewrite:
    def test_or_default(self):
        assert parse("match(connection reset)") == parse("connection OR reset")

    def test_operator_and(self):
        assert parse("match(operator=and connection reset)") == parse(
            "connection AND reset"
        )

    def test_single_term_collapses(self):
        assert parse("match(error)") == Term("error")

    def test_analyzer_applied(self):
        # punctuation/case fall out through the frozen analyzer — the
        # paste-a-log-line flow
        assert parse("match(Connection RESET!)") == Or(
            (Term("connection"), Term("reset"))
        )

    def test_duplicates_kept_as_clauses(self):
        # Lucene keeps duplicate analyzed tokens as separate clauses
        assert parse("match(error error)") == Or((Term("error"), Term("error")))

    def test_fuzziness_auto_ladder(self):
        # length>=6 -> 2 edits; length<3 -> exact (Term)
        assert parse("match(fuzziness=auto conection)") == Fuzzy("conection", 2)
        assert parse("match(fuzziness=AUTO ab)") == Term("ab")

    def test_fuzziness_fixed(self):
        assert parse("match(operator=and fuzziness=1 reset conection)") == And(
            (Fuzzy("reset", 1), Fuzzy("conection", 1))
        )

    def test_composes_with_bool(self):
        assert parse("error AND match(timeout refused)") == And(
            (Term("error"), Or((Term("timeout"), Term("refused"))))
        )

    @pytest.mark.parametrize(
        "bad,msg",
        [
            ("match()", "no terms"),
            ("match(!!!)", "no terms"),
            ("match(operator=xor a)", "and|or"),
            ("match(fuzziness=9 a)", "AUTO|0|1|2"),
            ("match(fuzziness=x a)", "AUTO|0|1|2"),
            ("match((a))", "free text"),
            ("match(a", "missing"),
        ],
    )
    def test_loud_errors(self, bad, msg):
        with pytest.raises(ValueError, match=msg):
            parse(bad)

    def test_params_only_before_text(self):
        # mid-text 'operator=and' is text, not a param (ES puts params
        # outside the query string; ours lead the argument)
        node = parse("match(reset operator=and)")
        assert node == Or((Term("reset"), Term("operator"), Term("and")))


class TestRankParity:
    @pytest.mark.parametrize(
        "mq,eq",
        [
            ("match(timeout refused denied)", "timeout OR refused OR denied"),
            ("match(operator=and error timeout)", "error AND timeout"),
            ("match(error error)", "error OR error"),
            ("match(ERROR, timeout!)", "error OR timeout"),
        ],
    )
    def test_local_equals_rewritten(self, local, oracle, mq, eq):
        got = local.search(mq, k=15)
        assert got == local.search(eq, k=15)
        exp = [(h.docid, h.score) for h in oracle.search(eq, k=15)]
        assert [(int(d), np.float32(s)) for d, s in got] == exp

    def test_fuzzy_matches_tilde_form(self, local):
        assert local.search("match(fuzziness=1 w00042)", k=10) == local.search(
            "w00042~1", k=10
        )

    def test_distributed_and_sql_oracle(self, spark, tiny_index, tmp_path, tiny_corpus_pdf):
        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        for q in ["match(timeout refused)", "match(operator=and error connection)"]:
            rows = search_df(spark, tiny_index[0], q, k=10).collect()
            got = [(int(r["docid"]), round(float(np.float32(r["score"])), 3))
                   for r in rows]
            exp = [(int(d), float(s))
                   for d, s in duckdb.sql(so.bm25_sql(p, q, k=10)).fetchall()]
            assert got == exp, q
