"""Sequence packing (operators/packing): per-doc bin assignment equality
vs the recursive-CTE DuckDB oracle, next-fit invariants, and
parallelism-stability."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators.packing import (
    pack_sequences,
    pack_sql,
    packing_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def packed_pdf(spark):
    return (
        pack_sequences(
            spark.read.parquet(f"{SF}/documents.parquet"), 128, n_buckets=4
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestPacking:
    def test_per_doc_assignment_equals_sql(self, packed_pdf):
        sql = (
            "WITH RECURSIVE "
            + pack_sql(f"{SF}/documents.parquet", 128, n_buckets=4)[1:]
            + "\nSELECT docid AS doc_id, n_tokens, bucket, bin_id "
            "FROM packed ORDER BY doc_id"
        )
        exp = duckdb.sql(sql).df()
        pd.testing.assert_frame_equal(packed_pdf, exp, check_dtype=False)

    def test_next_fit_invariants(self, packed_pdf, spark):
        cap = 128
        for _, grp in packed_pdf.sort_values("doc_id").groupby("bucket"):
            bins = grp["bin_id"].to_numpy()
            # bins are contiguous, non-decreasing in doc order, start at 0
            assert bins[0] == 0
            assert ((np.diff(bins) == 0) | (np.diff(bins) == 1)).all()
            fills = grp.groupby("bin_id")["n_tokens"].sum()
            docs = grp.groupby("bin_id")["n_tokens"].count()
            # a bin overflows capacity ONLY when it holds one oversized doc
            over = fills[fills > cap]
            assert (docs[over.index] == 1).all()
            # next-fit tightness: consecutive bins couldn't have merged —
            # each bin's first doc did not fit the previous bin
            firsts = grp.drop_duplicates("bin_id").set_index("bin_id")["n_tokens"]
            for b in range(1, int(bins.max()) + 1):
                assert fills[b - 1] + firsts[b] > cap

    def test_stable_under_parallelism(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = (
            pack_sequences(docs.repartition(1), 128, n_buckets=4)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            pack_sequences(docs.repartition(17), 128, n_buckets=4)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_length_col_variant(self, spark):
        pdf = pd.DataFrame({"doc_id": [0, 1, 2, 3], "n": [60, 60, 60, 200]})
        df = spark.createDataFrame(pdf)
        out = (
            pack_sequences(df, 100, n_buckets=1, length_col="n")
            .toPandas().sort_values("doc_id")
        )
        # doc0 -> bin0, doc1 doesn't fit (120 > 100) -> bin1, doc2 -> bin1?
        # 60+60=120 > 100 so doc2 -> bin2; oversized doc3 -> bin3 alone
        assert out["bin_id"].tolist() == [0, 1, 2, 3]

    def test_stats(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        packed = pack_sequences(docs, 128, n_buckets=4)
        row = packing_stats(packed, 128).collect()[0]
        assert row["n_docs"] == docs.count()
        assert 0 < row["avg_fill"] <= 1.5
        assert row["n_bins"] > 0

    def test_bad_capacity(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        with pytest.raises(ValueError, match="capacity"):
            pack_sequences(docs, 0)


class TestTemperatureSampling:
    def test_rates_flatten_toward_tail(self):
        from siem_on_amazon_opensearch_service_spark.operators.sampling import (
            temperature_rates,
        )

        counts = {"en": 800, "fr": 100, "zh": 100}
        th = temperature_rates(counts, alpha=0.5, target_frac=0.5)
        # temperature sampling keeps a LARGER fraction of small groups
        assert th["fr"] == th["zh"] > th["en"]
        # alpha=1 is proportional: every group keeps ~target_frac
        th1 = temperature_rates(counts, alpha=1.0, target_frac=0.5)
        assert len({th1[g] for g in counts}) == 1

    def test_kept_set_equals_sql(self, spark):
        import duckdb

        from siem_on_amazon_opensearch_service_spark.operators.sampling import (
            temperature_sample,
            temperature_sample_sql,
        )

        path = f"{SF}/documents.parquet"
        got = sorted(
            r["doc_id"]
            for r in temperature_sample(
                spark.read.parquet(path), group_col="lang", target_frac=0.5
            ).collect()
        )
        sql = (
            "WITH "
            + temperature_sample_sql(path, target_frac=0.5)[1:]
            + "\nSELECT doc_id FROM tsample ORDER BY doc_id"
        )
        exp = [int(d) for (d,) in duckdb.sql(sql).fetchall()]
        assert got == exp and len(got) > 0

    def test_nested_in_plain_sample(self, spark):
        """A group already below its mixture share is taken whole
        (rate caps at 1)."""
        from siem_on_amazon_opensearch_service_spark.operators.sampling import (
            temperature_rates,
        )

        th = temperature_rates({"big": 10_000, "tiny": 4}, alpha=0.5,
                               target_frac=0.5)
        assert th["tiny"] == 10_000  # whole group

    def test_bad_frac(self):
        from siem_on_amazon_opensearch_service_spark.operators.sampling import (
            temperature_rates,
        )

        import pytest as _pytest

        with _pytest.raises(ValueError, match="target_frac"):
            temperature_rates({"a": 1}, target_frac=0.0)


class TestDenoisingPairs:
    def test_invariants_and_determinism(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators.packing import (
            denoising_pairs,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = denoising_pairs(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
        b = (
            denoising_pairs(docs.repartition(13))
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)  # parallelism-stable
        assert (a["n_spans"] > 0).any() and (a["n_spans"] == 0).any()
        for _, r in a.iterrows():
            inp, tgt = r["input_text"].split(), r["target_text"].split()
            sent = [t for t in inp if t.startswith("<extra_id_")]
            # sentinels appear in order 0..n_spans-1 in BOTH strings
            assert sent == [f"<extra_id_{i}>" for i in range(int(r["n_spans"]))]
            assert [t for t in tgt if t.startswith("<extra_id_")] == sent
            # token conservation: non-sentinel tokens split between sides
            n_keep = len([t for t in inp if not t.startswith("<extra_id_")])
            n_mask = len([t for t in tgt if not t.startswith("<extra_id_")])
            assert n_mask == int(r["n_masked"])
            assert n_keep + n_mask > 0

    def test_mask_rate_in_range(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators.packing import (
            denoising_pairs,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = denoising_pairs(docs, mask_rate=0.15, mean_span=3).toPandas()
        frac = a["n_masked"].sum() / (
            a["n_masked"].sum()
            + sum(len([t for t in s.split() if not t.startswith("<extra_id_")])
                  for s in a["input_text"])
        )
        assert 0.08 < frac < 0.25  # ~mask_rate modulo overlap merging

    def test_bad_params(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators.packing import (
            denoising_pairs,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        with pytest.raises(ValueError, match="mask_rate"):
            denoising_pairs(docs, mask_rate=0.0)
        with pytest.raises(ValueError, match="mean_span"):
            denoising_pairs(docs, mean_span=0)
