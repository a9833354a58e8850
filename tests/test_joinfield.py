"""Join-field queries (operators/joinfield): has_child / has_parent over
the conversation->turns parent/child model.  Every score mode is checked
against an independent pandas brute force (same float32/float64 fold
recipe) and the DuckDB oracle; has_parent against the membership
definition (every turn of each matching conversation)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators import sqloracle
from siem_on_amazon_opensearch_service_spark.operators.joinfield import (
    has_child_df,
    has_parent_df,
)
from siem_on_amazon_opensearch_service_spark.operators.search import search_df

Q = "error AND timeout"
MODES = ["none", "min", "max", "sum", "avg"]


@pytest.fixture(scope="module")
def convmap(tiny_corpus_pdf):
    """docid -> conv_id under the index's stable (conv_id, turn_idx)
    ordering."""
    d = tiny_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return d["conv_id"].to_dict()


def _brute(spark, idx, convmap, q, mode):
    """Per-conversation (n_children, float32 score) from the child match
    set, replicating the engine's fold: float32 child scores -> float64,
    sum/avg folded in docid order, one final float32 cast."""
    rows = search_df(spark, idx, q, k=None).collect()
    groups: dict[str, list[tuple[int, float]]] = {}
    for r in rows:
        groups.setdefault(convmap[r["docid"]], []).append(
            (r["docid"], float(np.float32(r["score"])))
        )
    out = {}
    for cid, hits in groups.items():
        hits.sort()
        ss = [s for _, s in hits]
        if mode == "none":
            v = 0.0
        elif mode == "max":
            v = max(ss)
        elif mode == "min":
            v = min(ss)
        else:
            acc = np.float64(0.0)
            for s in ss:
                acc = acc + np.float64(s)
            v = float(acc) if mode == "sum" else float(acc) / len(ss)
        out[cid] = (len(ss), np.float32(v))
    return out


class TestHasChild:
    @pytest.mark.parametrize("mode", MODES)
    def test_all_modes_vs_brute(self, spark, tiny_index, convmap, mode):
        idx, _ = tiny_index
        exp = _brute(spark, idx, convmap, Q, mode)
        got = {
            r["conv_id"]: (r["n_children"], np.float32(r["score"]))
            for r in has_child_df(spark, idx, Q, k=None, score_mode=mode).collect()
        }
        assert got == exp, mode

    def test_topk_ordering(self, spark, tiny_index, convmap):
        idx, _ = tiny_index
        exp = _brute(spark, idx, convmap, Q, "sum")
        order = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))[:5]
        got = [
            (r["conv_id"], r["n_children"], np.float32(r["score"]))
            for r in has_child_df(spark, idx, Q, k=5, score_mode="sum").collect()
        ]
        assert got == [(c, n, s) for c, (n, s) in order]

    def test_children_bounds(self, spark, tiny_index, convmap):
        idx, _ = tiny_index
        exp = _brute(spark, idx, convmap, "error", "max")
        got = {
            r["conv_id"]: r["n_children"]
            for r in has_child_df(
                spark, idx, "error", k=None, min_children=2, max_children=3
            ).collect()
        }
        assert got == {c: n for c, (n, _) in exp.items() if 2 <= n <= 3}
        assert any(n < 2 or n > 3 for n, _ in exp.values()), "bounds not exercised"

    def test_bad_mode(self, spark, tiny_index):
        idx, _ = tiny_index
        with pytest.raises(ValueError, match="score_mode"):
            has_child_df(spark, idx, "error", score_mode="median").collect()

    @pytest.mark.parametrize("mode", ["sum", "max"])
    def test_sql_oracle(self, spark, tiny_index, tiny_corpus_pdf, tmp_path, mode):
        idx, _ = tiny_index
        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        got = sorted(
            (r["conv_id"], int(r["n_children"]),
             round(float(np.float32(r["score"])), 3))
            for r in has_child_df(
                spark, idx, Q, k=10, score_mode=mode, min_children=1
            ).collect()
        )
        exp = sorted(
            (c, int(n), float(s))
            for c, n, s in duckdb.sql(
                sqloracle.has_child_sql(p, Q, k=10, score_mode=mode)
            ).fetchall()
        )
        assert got == exp, mode


class TestHasParent:
    def test_membership_and_propagation(self, spark, tiny_index, convmap):
        idx, _ = tiny_index
        exp = _brute(spark, idx, convmap, Q, "max")
        rows = has_parent_df(spark, idx, Q, k=None, score_mode="max").collect()
        # every turn of each matching conversation, nothing else
        want = {d for d, c in convmap.items() if c in exp}
        assert {r["docid"] for r in rows} == want
        for r in rows:
            assert np.float32(r["score"]) == exp[r["conv_id"]][1]

    def test_score_false_constant(self, spark, tiny_index):
        idx, _ = tiny_index
        rows = has_parent_df(spark, idx, Q, k=None, score=False).collect()
        assert rows and all(r["score"] == 0.0 for r in rows)

    def test_sql_oracle(self, spark, tiny_index, tiny_corpus_pdf, tmp_path):
        idx, _ = tiny_index
        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        got = [
            (int(r["docid"]), r["conv_id"], round(float(np.float32(r["score"])), 3))
            for r in has_parent_df(spark, idx, Q, k=15, score_mode="sum").collect()
        ]
        exp = [
            (int(d), c, float(s))
            for d, c, s in duckdb.sql(
                sqloracle.has_parent_sql(p, Q, k=15, score_mode="sum")
            ).fetchall()
        ]
        assert got == exp

    def test_filters_flow_through(self, spark, tiny_index, convmap):
        """Child-side keyword filters restrict the match set BEFORE the
        conversation aggregation (the has_child filter context)."""
        idx, _ = tiny_index
        rows_all = has_child_df(spark, idx, "error", k=None).collect()
        rows_f = has_child_df(
            spark, idx, "error AND role:assistant", k=None
        ).collect()
        n_all = {r["conv_id"]: r["n_children"] for r in rows_all}
        n_f = {r["conv_id"]: r["n_children"] for r in rows_f}
        assert set(n_f) <= set(n_all)
        assert all(n_f[c] <= n_all[c] for c in n_f)
        assert n_f != n_all, "filter not exercised"
