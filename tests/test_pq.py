"""PQ (product quantization) — the third ANN compression next to IVF and
int8 (r4e).  Invariants:

- the Forgy seed vectors are their own nearest codebook entries, so they
  reconstruct EXACTLY (codes are the identity, cosine to self = 1);
- codes are m values in [0, K) for every vector;
- both codebook constructors are parallelism-independent (sorted-limit
  sample / collect);
- Lloyd training starts FROM the Forgy codebooks over the same sample, so
  trained sample distortion never exceeds Forgy's (k-means monotonicity);
- encoding is a literal-codebook projection: zero Exchange in the plan;
- asymmetric search returns k candidates per query with usable recall.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


class TestPqEncode:
    def test_seed_vectors_reconstruct_exactly(self, spark, emb):
        cbs = sim.pq_codebooks(emb)
        seeds = emb.filter(F.col("vec_id") < sim.PQ_K)
        got = seeds.select(
            "vec_id",
            "embedding",
            sim.pq_encode_col(F.col("embedding"), cbs).alias("codes"),
            sim.pq_reconstruct_col(
                sim.pq_encode_col(F.col("embedding"), cbs), cbs
            ).alias("rvec"),
        ).collect()
        assert len(got) == sim.PQ_K
        for r in got:
            # distance 0 to its own entry -> code = own index everywhere
            assert list(r.codes) == [r.vec_id] * sim.PQ_M
            assert [float(x) for x in r.embedding] == list(r.rvec)

    def test_codes_shape_and_range(self, emb):
        cdf = sim.pq_encode(emb)
        stats = cdf.select(
            F.size("codes").alias("m"),
            F.array_min("codes").alias("lo"),
            F.array_max("codes").alias("hi"),
        ).agg(
            F.min("m"), F.max("m"), F.min("lo"), F.max("hi"), F.count("*")
        ).collect()[0]
        assert stats[0] == stats[1] == sim.PQ_M
        assert stats[2] >= 0 and stats[3] < sim.PQ_K
        assert stats[4] == emb.count()

    def test_encode_plan_has_no_exchange(self, emb):
        plan = sim.pq_encode(emb)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # literal codebooks: pure projection

    def test_codebooks_parallelism_invariant(self, emb):
        assert sim.pq_codebooks(emb) == sim.pq_codebooks(emb.repartition(7))
        t1 = sim.train_pq_codebooks(emb, sample_cap=128)
        t2 = sim.train_pq_codebooks(emb.repartition(7), sample_cap=128)
        assert t1 == t2

    def test_trained_distortion_not_worse_on_sample(self, emb):
        cap = 256
        forgy = np.asarray(sim.pq_codebooks(emb), dtype=np.float64)
        trained = np.asarray(
            sim.train_pq_codebooks(emb, sample_cap=cap), dtype=np.float64
        )
        rows = emb.orderBy("vec_id").limit(cap).collect()
        X = np.asarray([r.embedding for r in rows], dtype=np.float64)
        dsub = X.shape[1] // sim.PQ_M

        def distortion(books):
            tot = 0.0
            for mi in range(sim.PQ_M):
                S = X[:, mi * dsub:(mi + 1) * dsub]
                d2 = ((S[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
                tot += d2.min(axis=1).sum()
            return tot

        assert distortion(trained) <= distortion(forgy) + 1e-9


class TestPqSearch:
    def test_topk_shape_and_recall(self, emb):
        exact = sim.cosine_topk(emb, [0, 1, 2], k=5).toPandas()
        got = sim.pq_topk(emb, [0, 1, 2], k=5).toPandas()
        assert got.groupby("query_id").size().tolist() == [5, 5, 5]
        assert ((got.cos <= 1.0) & (got.cos >= -1.0)).all()
        ex = set(zip(exact.query_id, exact.vec_id))
        recall = len(ex & set(zip(got.query_id, got.vec_id))) / len(ex)
        assert recall >= 0.2  # 32x compression on near-random synthetic vectors

    def test_trained_codebooks_searchable(self, emb):
        cb = sim.train_pq_codebooks(emb, sample_cap=128)
        got = sim.pq_topk(emb, [0, 1], k=3, codebooks=cb).toPandas()
        assert got.groupby("query_id").size().tolist() == [3, 3]

    def test_self_match_excluded(self, emb):
        got = sim.pq_topk(emb, [0, 1, 2], k=5).toPandas()
        assert not ((got.query_id == got.vec_id).any())

    def test_ivfpq_full_probe_equals_pq(self, emb):
        """IVFPQ with nprobe=nlist is exhaustive over the PQ index, so it
        must equal plain PQ search exactly."""
        pq = sim.pq_topk(emb, [0, 1, 2], k=5).toPandas()
        full = sim.ivfpq_topk(emb, [0, 1, 2], k=5, nlist=8, nprobe=8).toPandas()
        assert list(zip(pq.query_id, pq.vec_id, pq.cos)) == list(
            zip(full.query_id, full.vec_id, full.cos)
        )

    def test_ivfpq_candidates_are_cell_bounded(self, emb):
        """Every IVFPQ hit must live in one of the query's probed cells."""
        cents = sim.seed_centroids(emb, nlist=8)
        asgn = {
            r.vec_id: r.list_id
            for r in emb.select(
                "vec_id", sim.ivf_list_id(F.col("embedding"), cents).alias("list_id")
            ).collect()
        }
        probes = {
            r.vec_id: list(r.p)
            for r in emb.filter(F.col("vec_id").isin([0, 1, 2]))
            .select("vec_id", sim.ivf_probe_lists(F.col("embedding"), cents, 3).alias("p"))
            .collect()
        }
        got = sim.ivfpq_topk(
            emb, [0, 1, 2], k=5, nlist=8, nprobe=3, centroids=cents
        ).toPandas()
        for q, v in zip(got.query_id, got.vec_id):
            assert asgn[v] in probes[q]

    def test_dim_not_divisible_rejected(self, spark):
        bad = spark.createDataFrame(
            [(0, [0.0] * 10), (1, [1.0] * 10)], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="not divisible"):
            sim.pq_codebooks(bad, m=8, k=2)
