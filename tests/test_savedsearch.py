"""Saved-search compiler gates: the reference's searchSourceJSON filter
shapes (phrase / phrases / exists / negate / disabled / custom) must
compile to the engine's DQL, the whole reference saved-object corpus must
compile except the declared-custom blobs, and a compiled search must
score identically to its hand-written DQL."""

import json

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.plans.savedsearch import (
    compile_ndjson_line,
    compile_search_source,
)

REF_GLOB = "/root/reference/source/saved_objects/**/*.ndjson"


def _ss(query="", filters=()):
    return {"query": {"query": query, "language": "kuery"}, "filter": list(filters)}


def _f(ftype, key, params=None, negate=False, disabled=False):
    return {"meta": {"type": ftype, "key": key, "params": params,
                     "negate": negate, "disabled": disabled}}


class TestCompileShapes:
    def test_phrase(self):
        assert compile_search_source(
            _ss("error", [_f("phrase", "role", {"query": "assistant"})])
        ) == "(error) AND role:assistant"

    def test_phrase_negated(self):
        # clientvpn.ndjson: negate:true phrase on event.outcome
        assert compile_search_source(
            _ss("error", [_f("phrase", "role", {"query": "assistant"}, negate=True)])
        ) == "(error) AND NOT role:assistant"

    def test_phrases_is_one_of(self):
        # securityhub.ndjson: Workflow.Status NEW|NOTIFIED
        assert compile_search_source(
            _ss("error", [_f("phrases", "role", ["user", "assistant"])])
        ) == "(error) AND role:(assistant OR user)"

    def test_exists_and_disabled(self):
        out = compile_search_source(
            _ss("error", [_f("exists", "tool"),
                          _f("phrase", "role", {"query": "x"}, disabled=True)])
        )
        assert out == "(error) AND tool:*"

    def test_spacey_value_quotes(self):
        # ocsf dashboards: class_name 'DNS Activity' etc.
        assert compile_search_source(
            _ss("error", [_f("phrase", "role", {"query": "security hub"})])
        ) == '(error) AND role:"security hub"'

    def test_custom_raises(self):
        with pytest.raises(ValueError, match="unsupported filter type"):
            compile_search_source(_ss("error", [_f("custom", "query", {})]))

    def test_field_map(self):
        out = compile_search_source(
            _ss("error", [_f("phrase", "event.outcome", {"query": "assistant"})]),
            field_map={"event.outcome": "role"},
        )
        assert out == "(error) AND role:assistant"

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="no query and no enabled filters"):
            compile_search_source(_ss("", []))

    def test_ndjson_line(self):
        line = json.dumps({
            "attributes": {"kibanaSavedObjectMeta": {"searchSourceJSON": json.dumps(
                _ss("timeout", [_f("exists", "tool")])
            )}}
        })
        assert compile_ndjson_line(line) == "(timeout) AND tool:*"


class TestReferenceCorpusCompiles:
    @pytest.mark.skipif(
        not __import__("glob").glob(REF_GLOB, recursive=True),
        reason="reference saved objects not present",
    )
    def test_all_reference_saved_searches_compile_except_custom(self):
        """75 of the reference's 78 filtered/queried searchSourceJSONs
        compile; the 3 refusals are 'custom' raw-DSL filters (declared
        unsupported — they must raise, not silently drop)."""
        import glob

        ok = custom = other = 0
        for p in glob.glob(REF_GLOB, recursive=True):
            for line in open(p):
                try:
                    o = json.loads(line)
                except json.JSONDecodeError:
                    continue
                meta = o.get("attributes", {}).get("kibanaSavedObjectMeta", {})
                raw = meta.get("searchSourceJSON")
                if not raw:
                    continue
                ss = json.loads(raw)
                if not ss.get("filter") and not (ss.get("query") or {}).get("query"):
                    continue
                try:
                    compile_search_source(ss)
                    ok += 1
                except ValueError as e:
                    if "unsupported filter type 'custom'" in str(e):
                        custom += 1
                    else:
                        other += 1
        assert ok >= 75, (ok, custom, other)
        assert other == 0, "every non-custom reference filter shape must compile"


class TestCompiledSearchRuns:
    def test_compiled_equals_handwritten(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import search_df

        ss = _ss("error OR timeout", [
            _f("phrases", "role", ["user", "assistant"]),
            _f("phrase", "tool", {"query": "bash"}, negate=True),
        ])
        compiled = compile_search_source(ss)
        assert compiled == (
            "(error OR timeout) AND role:(assistant OR user) AND NOT tool:bash"
        )
        got = search_df(spark, tiny_index[0], compiled, k=10).collect()
        exp = search_df(
            spark, tiny_index[0], "error OR timeout", k=10,
            role=("user", "assistant"), tool_not=("bash",),
        ).collect()
        key = lambda rows: [(r["docid"], np.float32(r["score"])) for r in rows]
        assert key(got) == key(exp)
