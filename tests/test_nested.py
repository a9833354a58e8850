"""Nested docs (reference mapping type "nested", deploy_es/data.ini:
280-302): per-element query semantics, nested agg + reverse_nested, and
the scored-search composition."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import nested as nn
from siem_on_amazon_opensearch_service_spark.operators.search import search_df


@pytest.fixture(scope="module")
def parents(spark):
    rows = [
        # id, enrichments
        (1, [("p1", 10, False), ("p2", 90, True)]),   # cross-element only
        (2, [("p1", 60, True)]),                      # same-element match
        (3, []),                                      # empty array
        (4, None),                                    # missing field
        (5, [("p2", 70, False), ("p1", 50, False)]),  # boundary >= 50
    ]
    return spark.createDataFrame(
        rows,
        "id long, enr array<struct<provider:string, score_v:long, matched:boolean>>",
    )


PRED = lambda e: (e["provider"] == "p1") & (e["score_v"] >= 50)  # noqa: E731


class TestNestedFilter:
    def test_same_element_semantics(self, parents):
        """THE nested-vs-flattened divergence: doc 1 has provider=p1 (el 0)
        and score>=50 (el 1) but on DIFFERENT elements — a flattened
        mapping would match it, nested must not."""
        got = sorted(r["id"] for r in nn.nested_filter(parents, "enr", PRED).collect())
        assert got == [2, 5]

    def test_flattened_would_overmatch(self, parents):
        """Pin the divergence explicitly: the flattened (cross-element)
        evaluation matches doc 1 too — proving the exists-per-element
        form is not vacuously equal to it."""
        flat = parents.filter(
            F.exists(F.col("enr"), lambda e: e["provider"] == "p1")
            & F.exists(F.col("enr"), lambda e: e["score_v"] >= 50)
        )
        assert sorted(r["id"] for r in flat.collect()) == [1, 2, 5]

    def test_null_and_empty_match_nothing(self, parents):
        ids = {r["id"] for r in nn.nested_filter(
            parents, "enr", lambda e: F.lit(True)).collect()}
        assert 3 not in ids and 4 not in ids


class TestNestedAgg:
    def test_doc_count_is_elements_reverse_nested_is_parents(self, spark):
        rows = [
            (1, [("a",), ("a",), ("b",)]),
            (2, [("a",)]),
            (3, [("b",)]),
        ]
        df = spark.createDataFrame(
            rows, "docid long, enr array<struct<provider:string>>"
        )
        got = {
            r["provider"]: (r["doc_count"], r["parent_docs"])
            for r in nn.nested_terms_agg(df, "enr", "provider").collect()
        }
        # 'a': 3 elements across 2 parents — the two counts MUST differ
        assert got == {"a": (3, 2), "b": (2, 2)}

    def test_element_pred_filters_inside_nested_context(self, parents):
        got = {
            r["provider"]: (r["doc_count"], r["parent_docs"])
            for r in nn.nested_terms_agg(
                parents, "enr", "provider", parent_key="id",
                pred=lambda e: e["score_v"] >= 50,
            ).collect()
        }
        assert got == {"p1": (2, 2), "p2": (2, 2)}


def _with_enr(df):
    """Deterministic enrichment synthesis from docid (shared with the
    driver row): docid % 4 elements; element i has provider
    p((docid+i)%5), score_v (docid*7+i*13)%100, matched (docid+i)%3==0."""
    full = F.transform(
        F.sequence(F.lit(0), F.lit(2)),
        lambda i: F.struct(
            F.concat(F.lit("p"), ((F.col("docid") + i) % 5).cast("string")).alias("provider"),
            ((F.col("docid") * 7 + i * 13) % 100).alias("score_v"),
            (((F.col("docid") + i) % 3) == 0).alias("matched"),
        ),
    )
    return df.withColumn("enr", F.slice(full, 1, (F.col("docid") % 4).cast("int")))


class TestNestedSearch:
    def test_scored_search_with_nested_filter(self, spark, tiny_index):
        idx, _ = tiny_index
        got = [
            (r["docid"], np.float32(r["score"]))
            for r in nn.nested_search_df(
                spark, idx, "error", 10, _with_enr, "enr", PRED
            ).collect()
        ]
        # reference: python-filter the full scored match set by the same
        # per-element arithmetic
        full = search_df(spark, idx, "error", k=None).collect()

        def hits(docid):
            return any(
                (docid + i) % 5 == 1 and (docid * 7 + i * 13) % 100 >= 50
                for i in range(docid % 4)
            )

        exp = sorted(
            ((r["docid"], np.float32(r["score"])) for r in full if hits(r["docid"])),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        assert got == exp
        assert got  # non-degenerate

    def test_duckdb_exists_oracle_same_membership(self, spark, tiny_index):
        idx, _ = tiny_index
        docs = spark.read.parquet(idx + "/docs").select("docid")
        eng = sorted(
            r["docid"]
            for r in nn.nested_filter(_with_enr(docs), "enr", PRED).collect()
        )
        mx = max(eng) + 50 if eng else 200
        ora = [
            int(d)
            for (d,) in duckdb.sql(
                f"""SELECT docid FROM (SELECT unnest(range(0, {mx})) AS docid)
                WHERE len(list_filter(range(0, docid % 4), i ->
                    ('p' || CAST((docid+i)%5 AS VARCHAR)) = 'p1'
                    AND (docid*7+i*13)%100 >= 50)) > 0
                ORDER BY docid"""
            ).fetchall()
        ]
        all_ids = {r["docid"] for r in docs.collect()}
        assert eng == [d for d in ora if d in all_ids]
