"""ISM lifecycle: retention/rollover planning over rotated indexes."""

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import ism
from siem_on_amazon_opensearch_service_spark.operators.build import build_index

AS_OF = "2025-06-20T00:00:00"


@pytest.fixture(scope="module")
def rotated(spark, tiny_corpus_pdf, tmp_path_factory):
    """Weekly-rotated indexes over the tiny corpus (same shape as
    entry.ensure_rotated_indexes, but in tmp dirs)."""
    root = tmp_path_factory.mktemp("ismrot")
    df = spark.createDataFrame(tiny_corpus_pdf)
    keys = sorted(
        r["b"]
        for r in df.select(F.date_trunc("week", "ts").alias("b")).distinct().collect()
    )
    dirs = []
    for kts in keys:
        out = str(root / f"tiny_week{kts.strftime('%Y%m%d')}")
        sub = df.filter(F.date_trunc("week", F.col("ts")) == F.lit(kts))
        build_index(spark, sub, out, n_salts=4, validate_dense=False)
        dirs.append(out)
    p = str(root / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    yield dirs, p
    shutil.rmtree(str(root), ignore_errors=True)


def _canon(df_or_pdf):
    import pandas as pd

    pdf = df_or_pdf if isinstance(df_or_pdf, pd.DataFrame) else df_or_pdf.toPandas()
    pdf = pdf.sort_values("index").reset_index(drop=True)
    return [tuple(map(str, r)) for r in pdf.itertuples(index=False)]


class TestLifecyclePlan:
    def test_matches_oracle(self, spark, rotated):
        dirs, p = rotated
        got = _canon(ism.lifecycle_plan(spark, dirs, AS_OF, 14.0, 500))
        exp = _canon(
            duckdb.sql(
                ism.lifecycle_plan_sql(p, "week", "tiny_week", AS_OF, 14.0, 500)
            ).df()
        )
        assert got == exp

    def test_actions_cover_policy(self, spark, rotated):
        dirs, _ = rotated
        # far-future as_of: everything ages out
        plan = ism.lifecycle_plan(spark, dirs, "2030-01-01T00:00:00", 14.0, 10)
        assert {r["action"] for r in plan.collect()} == {"delete"}
        # generous retention + tiny max_docs: active bucket rolls over
        plan2 = ism.lifecycle_plan(spark, dirs, AS_OF, 10_000.0, 1)
        acts = {r["index"]: r["action"] for r in plan2.collect()}
        newest = ism.lifecycle_plan(spark, dirs, AS_OF, 10_000.0, 1).orderBy(
            F.col("newest_ts").desc()
        ).first()["index"]
        assert acts[newest] == "rollover"
        assert all(a == "retain" for n, a in acts.items() if n != newest)

    def test_apply_retention(self, spark, rotated, tmp_path):
        dirs, _ = rotated
        # copy the rotated dirs so apply doesn't destroy the fixture
        copies = []
        for d in dirs:
            c = str(tmp_path / os.path.basename(d))
            shutil.copytree(d, c)
            copies.append(c)
        plan = ism.lifecycle_plan(spark, copies, AS_OF, 14.0, 10**9)
        doomed = {r["index"] for r in plan.collect() if r["action"] == "delete"}
        res = ism.apply_retention(spark, copies, plan)
        assert set(res["deleted"]) == doomed
        for c in copies:
            assert os.path.isdir(c) != (os.path.basename(c) in doomed)

    def test_empty_rejected(self, spark):
        with pytest.raises(ValueError):
            ism.lifecycle_plan(spark, [], AS_OF, 1.0, 1)

    def test_empty_index_rejected_loudly(self, spark, rotated, tmp_path):
        """REGRESSION (r4 advice): an index whose docs store has NULL
        max(ts) used to raise a bare TypeError (None vs datetime) from
        the active-index max(); now it's a named ValueError."""
        dirs, _ = rotated
        import pandas as pd

        empty = str(tmp_path / "tiny_week_empty")
        os.makedirs(os.path.join(empty, "docs"))
        os.makedirs(os.path.join(empty, "stats"))
        pd.DataFrame({"n_docs": [0]}).to_parquet(
            os.path.join(empty, "stats", "s.parquet")
        )
        pd.DataFrame(
            {"docid": pd.Series([], dtype="int64"),
             "ts": pd.Series([], dtype="datetime64[us]")}
        ).to_parquet(os.path.join(empty, "docs", "d.parquet"))
        with pytest.raises(ValueError, match="max\\(ts\\) is NULL"):
            ism.lifecycle_plan(spark, dirs + [empty], AS_OF, 14.0, 500)

    def test_tied_newest_all_rollover_eligible(self, spark, rotated, tmp_path):
        """REGRESSION (r4 advice): two indexes tying on newest ts — the
        engine marked only one active while the oracle's 'newest = max'
        predicate marks every tied index.  Both now roll over."""
        dirs, _ = rotated
        # duplicate the newest bucket under a different name: exact tie
        plan0 = ism.lifecycle_plan(spark, dirs, AS_OF, 10_000.0, 1)
        newest_name = plan0.orderBy(F.col("newest_ts").desc()).first()["index"]
        src = next(d for d in dirs if os.path.basename(d) == newest_name)
        twin = str(tmp_path / (newest_name + "b"))
        shutil.copytree(src, twin)
        plan = ism.lifecycle_plan(spark, dirs + [twin], AS_OF, 10_000.0, 1)
        acts = {r["index"]: r["action"] for r in plan.collect()}
        assert acts[newest_name] == "rollover"
        assert acts[newest_name + "b"] == "rollover"
