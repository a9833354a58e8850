"""Dedup operator gates: banded SimHash must equal the all-pairs baseline
(pigeonhole banding is lossless for the hamming predicate), and the
ngram-Jaccard shingle-DF cap must be a no-op below the cap."""

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import dedup

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).select("doc_id", "text")


class TestSimhashBanding:
    def test_band_layout(self):
        for h in (0, 3, 6, 8, 12):
            bands = dedup._simhash_bands(h, 48)
            assert len(bands) == h + 1
            assert all(w > 0 for _, w in bands)
            covered = [(off, off + w) for off, w in bands]
            assert covered[0][0] == 0 and covered[-1][1] == 48
            for (a0, a1), (b0, _) in zip(covered, covered[1:]):
                assert a1 == b0  # contiguous, disjoint

    def test_too_many_bands_rejected(self):
        with pytest.raises(ValueError):
            dedup._simhash_bands(48, 48)

    @pytest.mark.parametrize("h", [4, 8])
    def test_banded_equals_allpairs(self, spark, docs, h):
        banded = dedup.simhash_pairs(docs, max_hamming=h).toPandas()
        allp = dedup.simhash_pairs_allpairs(docs, max_hamming=h).toPandas()
        assert banded.values.tolist() == allp.values.tolist()
        assert len(banded) > 0  # corpus has near-dups; the test is non-vacuous


class TestJaccardCap:
    def test_cap_noop_below_threshold(self, spark, docs):
        exact = dedup.ngram_jaccard_pairs(docs, k=2, jaccard_min=0.6).toPandas()
        capped = dedup.ngram_jaccard_pairs(
            docs, k=2, jaccard_min=0.6, max_shingle_df=10**6
        ).toPandas()
        assert exact.values.tolist() == capped.values.tolist()
        assert len(exact) > 0

    def test_small_cap_restricts_universe(self, spark, docs):
        out = dedup.ngram_jaccard_pairs(docs, k=2, jaccard_min=0.0, max_shingle_df=2)
        pdf = out.limit(50).toPandas()
        assert list(pdf.columns) == ["id_a", "id_b", "jaccard"]
        assert (pdf["jaccard"] <= 1.0).all()

    def test_default_cap_is_finite_and_drops_stop_shingles(self, spark):
        """VERDICT r2 item 5: the production wrapper must not go quadratic
        by default.  A corpus where every doc shares one shingle with
        df > DEFAULT_MAX_SHINGLE_DF would build d^2/2 join rows uncapped
        (~6*10^7 here — this test would not finish); with the default cap
        the stop-shingle is dropped pre-join and the result is empty."""
        from pyspark.sql import functions as F

        n = dedup.DEFAULT_MAX_SHINGLE_DF + 500
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit("aa bb").alias("text")
        )
        out = dedup.ngram_jaccard_pairs(docs, k=2, jaccard_min=0.0)
        assert out.count() == 0
        # explicit opt-out still exists (oracle baseline), checked on a
        # slice small enough to join
        tiny = docs.limit(5)
        assert dedup.ngram_jaccard_pairs(tiny, k=2, jaccard_min=0.0, max_shingle_df=None).count() == 10


class TestMultiTableLsh:
    def test_multi_table_beats_single_table_recall(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import similarity as sim

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        ids = [0, 1, 2]
        exact = sim.cosine_topk(emb, ids, k=5).toPandas()
        ex = set(zip(exact.query_id, exact.vec_id))
        single = sim.lsh_bucket_topk(emb, ids, k=5, dim=64).toPandas()
        multi = sim.lsh_multi_topk(emb, ids, k=5, dim=64, n_bits=4, n_tables=16).toPandas()
        r1 = len(ex & set(zip(single.query_id, single.vec_id))) / len(ex)
        rm = len(ex & set(zip(multi.query_id, multi.vec_id))) / len(ex)
        assert rm >= r1
        assert rm >= 0.5  # recall amplification must actually bite


class TestIvfAnn:
    """IVF coarse quantizer (r4b): seed-centroid assignment must be
    deterministic and candidate-bounded; the k-means quantizer must be
    parallelism-independent and give usable recall; probing every cell
    must equal the exact top-k (IVF with nprobe=nlist is exhaustive)."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_full_probe_equals_exact(self, emb):
        from siem_on_amazon_opensearch_service_spark.operators import similarity as sim

        exact = sim.cosine_topk(emb, [0, 1, 2], k=5).toPandas()
        full = sim.ivf_topk(emb, [0, 1, 2], k=5, nlist=8, nprobe=8).toPandas()
        assert list(zip(exact.query_id, exact.vec_id, exact.cos)) == list(
            zip(full.query_id, full.vec_id, full.cos)
        )

    def test_assignment_partitions_corpus(self, emb):
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators import similarity as sim

        cents = sim.seed_centroids(emb, nlist=8)
        withl = emb.select(
            "vec_id", sim.ivf_list_id(F.col("embedding"), cents).alias("list_id")
        )
        sizes = {r.list_id: r.n for r in withl.groupBy("list_id").agg(F.count("*").alias("n")).collect()}
        assert sum(sizes.values()) == emb.count()  # every vector in exactly one cell
        assert all(0 <= c < 8 for c in sizes)

    def test_kmeans_deterministic_and_recall(self, emb):
        from siem_on_amazon_opensearch_service_spark.operators import similarity as sim

        c1 = sim.train_ivf_centroids(emb, nlist=8, iters=5, sample_cap=256)
        c2 = sim.train_ivf_centroids(emb.repartition(7), nlist=8, iters=5, sample_cap=256)
        assert c1 == c2  # sorted-limit sample -> parallelism-independent

        exact = sim.cosine_topk(emb, [0, 1, 2], k=5).toPandas()
        ex = set(zip(exact.query_id, exact.vec_id))
        got = sim.ivf_topk(emb, [0, 1, 2], k=5, nlist=8, nprobe=3, centroids=c1).toPandas()
        recall = len(ex & set(zip(got.query_id, got.vec_id))) / len(ex)
        assert recall >= 0.5  # 3/8 cells probed must still find most true neighbors

    def test_probe_lists_are_distinct_best_first(self, emb):
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators import similarity as sim

        cents = sim.seed_centroids(emb, nlist=8)
        rows = (
            emb.limit(20)
            .select("vec_id", sim.ivf_probe_lists(F.col("embedding"), cents, 4).alias("p"))
            .collect()
        )
        for r in rows:
            assert len(r.p) == 4 and len(set(r.p)) == 4


class TestSamplingAndQuantization:
    """r4b: deterministic hash sampling/splits and int8 embedding
    quantization."""

    @pytest.fixture(scope="class")
    def d(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")

    def test_sample_nested_and_parallelism_invariant(self, spark, d):
        from siem_on_amazon_opensearch_service_spark.operators import sampling

        s05 = {r.doc_id for r in sampling.sample_by_hash(d, "doc_id", 0.05).collect()}
        s20 = {r.doc_id for r in sampling.sample_by_hash(d, "doc_id", 0.20).collect()}
        assert s05 <= s20  # nested samples
        s05b = {r.doc_id for r in sampling.sample_by_hash(d.repartition(7), "doc_id", 0.05).collect()}
        assert s05 == s05b  # parallelism-invariant
        n = d.count()
        assert abs(len(s20) / n - 0.20) < 0.05  # ~rate

    def test_split_covers_disjointly_and_is_stable(self, spark, d):
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators import sampling

        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        s1 = sampling.split_by_hash(d, "doc_id", w)
        assert s1.filter(F.col("split").isNull()).count() == 0
        counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == d.count()  # partition (each row exactly one split)
        m1 = {r.doc_id: r.split for r in s1.collect()}
        m2 = {r.doc_id: r.split for r in sampling.split_by_hash(d.repartition(5), "doc_id", w).collect()}
        assert m1 == m2

    def test_split_validation(self, spark, d):
        from siem_on_amazon_opensearch_service_spark.operators import sampling

        with pytest.raises(ValueError, match="sum to"):
            sampling.split_by_hash(d, "doc_id", {"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError, match="outside"):
            sampling.sample_by_hash(d, "doc_id", 1.5)

    def test_int8_recall_near_exact(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import similarity as sim

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = sim.cosine_topk(emb, [0, 1, 2], k=5).toPandas()
        q = sim.int8_cosine_topk(emb, [0, 1, 2], k=5).toPandas()
        ex = set(zip(exact.query_id, exact.vec_id))
        recall = len(ex & set(zip(q.query_id, q.vec_id))) / len(ex)
        assert recall >= 0.8  # 8-bit symmetric quantization barely moves cosines

    def test_quantization_bounds(self, spark):
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators import similarity as sim

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
        qd = sim.quantize_embeddings(emb)
        rows = qd.select(
            F.array_max("qvec").alias("hi"), F.array_min("qvec").alias("lo")
        ).collect()
        assert all(-127 <= r.lo and r.hi <= 127 for r in rows)
        # round-trip error bounded by s/2 per component
        err = (
            emb.join(qd, "vec_id")
            .select(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        sim.dequantized_vec(F.col("qvec"), F.col("qscale")),
                        lambda a, b: F.abs(a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: F.greatest(acc, x),
                ).alias("maxerr"),
                (F.col("qscale") / 2 + 1e-12).alias("bound"),
            )
            .collect()
        )
        assert all(r.maxerr <= r.bound for r in err)


class TestShingleHashes:
    """r4: polynomial (Karp-Rabin) shingle hashing — the production
    shingle domain.  Engine arithmetic must match the DuckDB rendering
    bit-for-bit, and the hash-domain jaccard must equal the string-domain
    jaccard when no 48-bit collisions occur (always, at test scale)."""

    def test_engine_matches_duckdb_arithmetic(self, spark):
        import duckdb

        from pyspark.sql import functions as F
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        texts = [
            "alpha beta gamma delta", "one two", "single", "",
            "alpha beta alpha beta gamma", "x " * 300,
        ]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
        for k in (2, 3):
            got = {
                r["id"]: list(r["sh"])
                for r in df.select("id", dedup.shingle_hashes_col(F.col("text"), k).alias("sh")).collect()
            }
            horner = "hs[i]"
            for j in range(1, k):
                horner = f"(({horner}) * {dedup.SHINGLE_A} + hs[i+{j}]) % {dedup.SHINGLE_MOD}"
            h48 = "CAST(concat('0x', substr(md5(x), 1, 12)) AS BIGINT)"
            sql = f"""
WITH t AS (SELECT * FROM (VALUES {', '.join(f"({i}, '{t}')" for i, t in enumerate(texts))}) v(id, text)),
tok AS (SELECT id, list_filter(string_split_regex(lower(text), '[^A-Za-z0-9_]+'), x -> x <> '') AS toks FROM t),
h AS (SELECT id, list_transform(toks, x -> {h48}) AS hs FROM tok)
SELECT id, CASE WHEN len(hs) >= {k} THEN
  list_transform(generate_series(1, len(hs)-{k}+1), i -> {horner})
ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                  (a, b) -> (a * {dedup.SHINGLE_A} + b) % {dedup.SHINGLE_MOD})] END AS sh
FROM h ORDER BY id"""
            exp = {int(r[0]): list(r[1]) for r in duckdb.sql(sql).fetchall()}
            assert got == exp, f"k={k}"

    def test_hash_jaccard_equals_string_jaccard(self, spark):
        from pyspark.sql import functions as F
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over a lazy dog"),
            (2, "completely different text entirely here now"),
            (3, "the quick brown fox jumps over the lazy dog"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        hashed = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard(df, k=2).collect()
        }
        # string-domain reference: same pipeline over string shingles
        sh = df.select(
            F.col("doc_id").alias("id"),
            F.explode(dedup.shingles_col(F.col("text"), 2)).alias("s"),
        ).distinct()
        sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
        ref = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
            .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .select("id_a", "id_b", "jaccard")
            .collect()
        }
        assert hashed == ref
        assert hashed[(0, 3)] == 1.0


class TestContamination:
    """Benchmark decontamination (r4e): shingle-overlap fraction of train
    docs vs a benchmark corpus."""

    def test_self_contamination_is_total(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        r = dedup.contamination_stats(docs, docs).toPandas()
        assert (r.contam_frac_r == 1.0).all() and r.contaminated.all()

    def test_disjoint_vocab_is_clean(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        train = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(9, "one two three four")], "doc_id long, text string"
        )
        r = dedup.contamination_stats(train, bench).toPandas()
        assert r.n_hits.tolist() == [0] and not r.contaminated.any()

    def test_partial_overlap_fraction(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        # train doc shingles (k=2): {a b, b c, c d}; bench contains "a b"
        # and "b c" but not "c d" -> 2/3
        train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
        r = dedup.contamination_stats(train, bench, threshold=0.5).toPandas()
        assert r.n_shingles.tolist() == [3] and r.n_hits.tolist() == [2]
        assert abs(r.contam_frac_r[0] - round(2 / 3, 6)) < 1e-9
        assert bool(r.contaminated[0])

    def test_short_doc_uses_whole_stream_fold(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        # one-token docs hash the whole stream as a single shingle: a
        # one-token train doc is contaminated iff the same single token
        # appears as a whole-stream shingle in the benchmark
        train = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
        hit = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
        miss = spark.createDataFrame([(9, "solo extra")], "doc_id long, text string")
        assert dedup.contamination_stats(train, hit).toPandas().n_hits.tolist() == [1]
        assert dedup.contamination_stats(train, miss).toPandas().n_hits.tolist() == [0]


class TestDedupClusters:
    """Connected components over near-dup pairs (r4e): min-label
    propagation, diameter-bounded rounds, loud non-convergence."""

    def _run(self, spark, n_nodes, edges, **kw):
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
        pairs = spark.createDataFrame(
            edges or [(0, 0)], "id_a long, id_b long"
        )
        if not edges:
            pairs = pairs.limit(0)
        out = dedup.dedup_clusters(nodes, pairs, **kw).toPandas()
        return dict(zip(out.doc_id, out.cluster_id))

    def test_chain_clique_singleton(self, spark):
        # chain 0-1-2, clique {3,4,5}, singleton 6, pair (7,8)
        edges = [(0, 1), (1, 2), (3, 4), (4, 5), (3, 5), (7, 8)]
        got = self._run(spark, 9, edges)
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6, 7: 7, 8: 7}

    def test_no_edges_all_singletons(self, spark):
        got = self._run(spark, 4, [])
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_long_chain_converges(self, spark):
        # a 12-node path needs multiple propagation rounds
        edges = [(i, i + 1) for i in range(11)]
        got = self._run(spark, 12, edges)
        assert set(got.values()) == {0}

    def test_parallelism_invariant(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import dedup

        edges = [(0, 5), (5, 9), (2, 7), (1, 3)]
        nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        a = dedup.dedup_clusters(nodes, pairs).toPandas()
        b = dedup.dedup_clusters(nodes.repartition(7), pairs.repartition(5)).toPandas()
        assert a.values.tolist() == b.values.tolist()

    def test_unconverged_raises(self, spark):
        import pytest as _pt

        edges = [(i, i + 1) for i in range(11)]
        with _pt.raises(RuntimeError, match="not converged"):
            self._run(spark, 12, edges, max_iters=2)


class TestDuplicateSpans:
    """Exact-substring dedup (Lee et al. 2022 shape): window-hash
    multiplicity against a hand recount and the doubling property."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_hand_recount(self, spark):
        # A: tokens a1..a12; B repeats A's tokens a3..a8 inside noise;
        # C fully unique.  window=4.
        a = " ".join(f"a{i}" for i in range(1, 13))
        shared = " ".join(f"a{i}" for i in range(3, 9))  # 6 tokens: a3..a8
        b = "b1 b2 " + shared + " b3 b4"
        c = " ".join(f"c{i}" for i in range(1, 11))
        out = {
            r["id"]: (r["n_windows"], r["n_dup_windows"])
            for r in dedup.duplicate_span_stats(
                self._mk(spark, [(1, a), (2, b), (3, c)]), window=4
            ).collect()
        }
        # A: 9 windows; duplicated ones start at a3,a4,a5 (fully inside
        # a3..a8) -> 3.  B: 7 windows; the 3 pure-shared windows dup.
        assert out[1] == (9, 3)
        assert out[2] == (7, 3)
        assert out[3] == (10 - 4 + 1, 0)

    def test_doubling_marks_everything(self, spark, docs):
        sub = docs.limit(20)
        doubled = sub.unionByName(
            sub.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        )
        st = dedup.duplicate_span_stats(doubled, window=10).toPandas()
        assert (st["n_dup_windows"] == st["n_windows"]).all()
        assert (st["dup_frac_r"] == 1.0).all()

    def test_unique_corpus_all_zero(self, spark):
        rows = [(i, " ".join(f"t{i}_{j}" for j in range(30))) for i in range(10)]
        st = dedup.duplicate_span_stats(self._mk(spark, rows), window=5).toPandas()
        assert (st["n_dup_windows"] == 0).all()

    def test_short_doc_whole_stream_window(self, spark):
        # docs shorter than the window hash their whole stream: two
        # identical 3-token docs are caught even at window=50
        rows = [(1, "x y z"), (2, "x y z"), (3, "p q r")]
        st = {
            r["id"]: (r["n_windows"], r["n_dup_windows"])
            for r in dedup.duplicate_span_stats(
                self._mk(spark, rows), window=50
            ).collect()
        }
        assert st[1] == (1, 1) and st[2] == (1, 1) and st[3] == (1, 0)

    def test_within_doc_repeats_count(self, spark):
        # occurrence semantics: a doc repeating its own 4-token run is
        # self-duplicated (suffix-array multiplicity, not distinct-doc df)
        run = "r1 r2 r3 r4"
        rows = [(1, run + " m1 m2 " + run), (2, "u1 u2 u3 u4 u5")]
        st = {
            r["id"]: r["n_dup_windows"]
            for r in dedup.duplicate_span_stats(
                self._mk(spark, rows), window=4
            ).collect()
        }
        assert st[1] >= 2  # both copies of the run marked
        assert st[2] == 0


class TestArrowImplEquality:
    """r6: the Arrow minhash/simhash reimplementations (numpy tokenize +
    md5-per-distinct-token) must produce IDENTICAL rows to the column-
    expression reference shapes, including the edge docs: null text,
    punctuation-only text (empty token stream -> fold shingle 0 for
    minhash, absent for simhash), and docs shorter than k tokens."""

    @pytest.fixture(scope="class")
    def edge_docs(self, spark):
        rows = [
            (0, "alpha beta gamma delta epsilon"),
            (1, None),
            (2, "!!! ??? ..."),          # zero tokens after analysis
            (3, "one two"),              # < k tokens
            (4, "x"),                    # single token
            (5, ""),                     # empty string (zero tokens)
            (6, "alpha beta gamma"),     # exactly k tokens
            (7, "Dup dup DUP dup"),      # case folding + repeats
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _sorted(self, df):
        pdf = df.toPandas().sort_values("doc_id").reset_index(drop=True)
        return pdf

    def test_minhash_equality_edge(self, edge_docs):
        a = self._sorted(dedup.minhash_signatures(edge_docs, k=3, impl="arrow"))
        c = self._sorted(dedup.minhash_signatures(edge_docs, k=3, impl="column"))
        assert a.equals(c), (a, c)

    def test_simhash_equality_edge(self, edge_docs):
        a = self._sorted(dedup.simhash(edge_docs, impl="arrow"))
        c = self._sorted(dedup.simhash(edge_docs, impl="column"))
        assert a.equals(c), (a, c)

    def test_minhash_equality_corpus(self, docs):
        a = self._sorted(dedup.minhash_signatures(docs, k=3, impl="arrow"))
        c = self._sorted(dedup.minhash_signatures(docs, k=3, impl="column"))
        assert a.equals(c)

    def test_simhash_equality_corpus(self, docs):
        a = self._sorted(dedup.simhash(docs, impl="arrow"))
        c = self._sorted(dedup.simhash(docs, impl="column"))
        assert a.equals(c)
