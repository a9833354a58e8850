"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k per query vector — the exact
  baseline.  The dot product stays JVM-side (zip_with + aggregate in
  float64); queries are a broadcast-joined tiny dimension, so the plan is
  scan -> broadcast nested-loop -> per-query window top-k: one shuffle of
  only (n_queries x k) survivors at scale.

- ``lsh_bucket_topk``: the scale path — sign-random-projection LSH.
  Hyperplane weights are a *deterministic arithmetic formula* of
  (bit, dim) (Knuth multiplicative hash), so executors regenerate them for
  free (no broadcast of weight matrices) and results are reproducible at
  any parallelism.  Candidates = same-bucket rows; exact cosine re-rank
  inside buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_BITS = 8
_KNUTH = 2654435761
_M32 = 4294967296


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, vec_id, cos) — exact top-k by cosine per query vector,
    tie-break ascending vec_id, self-match excluded."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = emb.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select("query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )


def hyperplane_weight(bit: Column, dim: Column) -> Column:
    """Deterministic pseudo-random weight in [-0.5, 0.5): Knuth hash of
    (bit * 1009 + dim) scaled — identical on any executor, no state."""
    h = ((bit * 1009 + dim) * _KNUTH) % _M32
    return h / F.lit(float(_M32)) - 0.5


def lsh_bucket(vec: Column, dim: int, n_bits: int = N_BITS, table: int = 0) -> Column:
    """Sign-random-projection bucket id (n_bits-bit integer).  ``table``
    selects an independent hyperplane set (bit indices offset by
    table*n_bits) for multi-table LSH."""
    def mul(bit: int):
        # closure factory: a default-arg lambda would change the arity
        # PySpark infers for the higher-order function
        return lambda v, d: v.cast("double") * hyperplane_weight(F.lit(bit), d)

    bits = []
    for b in range(n_bits):
        dot = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), mul(b + table * n_bits)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out


def lsh_multi_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = N_BITS,
    n_tables: int = 4,
) -> DataFrame:
    """Multi-table LSH ANN: candidates = union over ``n_tables``
    independent hyperplane sets of same-bucket rows (classic recall
    amplification: miss probability decays exponentially in tables),
    deduped, then exact cosine re-rank.  The scale shape is unchanged —
    n_tables bucket equi-joins instead of one, still never all-pairs."""
    buckets = F.array(
        *[lsh_bucket(F.col(vec_col), dim, n_bits, table=t) for t in range(n_tables)]
    )
    withb = emb.withColumn("bks", buckets).select(
        id_col, vec_col, F.posexplode("bks").alias("tbl", "bucket")
    )
    q = withb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("tbl").alias("qtbl"),
        F.col("bucket").alias("qbucket"),
    )
    joined = withb.join(
        F.broadcast(q),
        (F.col("tbl") == F.col("qtbl"))
        & (F.col("bucket") == F.col("qbucket"))
        & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cos")
    ).distinct()  # same pair found by several tables -> identical cos row
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = N_BITS,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the dedup-shaped variant of
    the ANN path: candidates are same-bucket pairs in any of ``n_tables``
    LSH tables (never all-pairs; sign-random-projection collision
    probability rises with cosine, so high-threshold pairs are the ones
    banding is best at catching), then exact cosine verification keeps
    pairs >= threshold.  (id_a, id_b, cos), id_a < id_b."""
    buckets = F.array(
        *[lsh_bucket(F.col(vec_col), dim, n_bits, table=t) for t in range(n_tables)]
    )
    withb = emb.withColumn("bks", buckets).select(
        id_col, vec_col, F.posexplode("bks").alias("tbl", "bucket")
    )
    l, r = withb.alias("l"), withb.alias("r")
    cand = l.join(
        r,
        (F.col("l.tbl") == F.col("r.tbl"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cos"),
    ).distinct()  # same pair from several tables -> identical row
    return cand.filter(F.col("cos") >= threshold).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# int8 scalar quantization — the 4x-storage-cut path for embedding columns
#
# Per-vector symmetric quantization (the FAISS SQ8 / ONNX-style scheme):
# scale s = max|x| / 127, codes q_i = round(x_i / s) in [-127, 127].
# Every step is order-independent arithmetic (max, round), so the DuckDB
# oracle reproduces codes bit-for-bit and quantized search is value-match
# testable, not just recall-bounded.

def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qvec array<tinyint>, qscale double): symmetric per-vector int8
    codes.  A zero vector gets scale 0 and all-zero codes.  Pure column
    expressions — at 100 TB this is a projection over the scan, and the
    parquet written from it is ~4x smaller than float32."""
    v = F.col(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    s = (amax / F.lit(127.0)).alias("qscale")
    q = F.when(
        amax == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    ).otherwise(
        F.transform(v, lambda x: F.round(x.cast("double") / (amax / 127.0)).cast("tinyint"))
    )
    return emb.select(F.col(id_col), q.alias("qvec"), s)


def dequantized_vec(qvec: Column, qscale: Column) -> Column:
    return F.transform(qvec, lambda x: x.cast("double") * qscale)


def int8_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors (queries
    quantized too — the symmetric search setting).  Same plan shape as
    ``cosine_topk``; the quantization error is measured by the recall row
    rather than assumed."""
    qd = quantize_embeddings(emb, id_col, vec_col).select(
        id_col, dequantized_vec(F.col("qvec"), F.col("qscale")).alias("dq")
    )
    q = qd.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("dq").alias("qvec")
    )
    joined = qd.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id", id_col, cosine(F.col("qvec"), F.col("dq")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
#
# The corpus is partitioned into nlist Voronoi cells around centroid
# vectors (spherical: nearest by cosine); a query probes only its nprobe
# nearest cells and re-ranks those candidates exactly.  Candidate volume
# ~ n * nprobe / nlist instead of n — the FAISS IndexIVFFlat shape.
#
# Scale design: cell assignment is a PURE PROJECTION — the centroids are
# literal arrays folded into whole-stage codegen (no shuffle, no
# broadcast variable, no Python); the probe-list join is a broadcast
# equi-join on list_id (queries x nprobe rows).  At 100 TB the only
# shuffle is the per-query top-k window over candidates, exactly like the
# LSH path above.  Centroid TRAINING follows the standard large-scale
# recipe (train on a bounded sample, assign the full corpus
# distributed): ``train_ivf_centroids`` runs deterministic spherical
# Lloyd iterations on the ``sample_cap`` smallest ids driver-side.
# ``seed_centroids`` (Forgy init: the nlist smallest ids as-is) is the
# arithmetic-reproducible variant the DuckDB value-match oracle mirrors.

IVF_NLIST = 16
IVF_NPROBE = 4


def _lit_vec(c: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def seed_centroids(
    emb: DataFrame, nlist: int = IVF_NLIST, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Forgy seed centroids: the embeddings of the ``nlist`` smallest ids
    (deterministic at any parallelism; a metadata-scale collect)."""
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(nlist).collect()
    return [[float(x) for x in r[vec_col]] for r in rows]


def train_ivf_centroids(
    emb: DataFrame,
    nlist: int = IVF_NLIST,
    iters: int = 10,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic spherical k-means: Lloyd iterations over the
    ``sample_cap`` smallest-id vectors (sorted-limit sample -> identical
    at any parallelism), Forgy init, unit-normalized means, empty cells
    keep their previous centroid.  Training on a bounded sample is the
    standard IVF recipe at corpus scale — only assignment touches the
    full data, and that is distributed."""
    import numpy as np

    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(sample_cap).collect()
    X = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(nlist):
            members = Xn[assign == j]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[j] = v / nv
    return [[float(x) for x in c] for c in C]


def _ivf_cos_entries(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct(cos, ncid)> of the vector's cosine to every centroid;
    ncid = -cid so ascending struct order is (cos asc, cid desc) and both
    max and sort+reverse yield the (cos DESC, cid ASC) ranking the SQL
    oracle's window uses."""
    entries = []
    for cid, c in enumerate(centroids):
        lc = _lit_vec(c)
        entries.append(
            F.struct(cosine(vec, lc).alias("cos"), F.lit(-cid).alias("ncid"))
        )
    return F.array(*entries)


def ivf_list_id(vec: Column, centroids: list[list[float]]) -> Column:
    """Voronoi cell id: argmax-cosine centroid (ties -> smallest cid).
    A literal-centroid codegen projection — zero shuffle at any scale."""
    return (-F.array_max(_ivf_cos_entries(vec, centroids))["ncid"]).cast("int")


def ivf_probe_lists(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """The nprobe nearest cell ids, best-first (cos desc, cid asc)."""
    ranked = F.slice(F.reverse(F.array_sort(_ivf_cos_entries(vec, centroids))), 1, nprobe)
    return F.transform(ranked, lambda s: (-s["ncid"]).cast("int"))


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos) — IVF ANN top-k: probe the nprobe nearest
    cells, exact cosine re-rank inside them, tie-break ascending vec_id,
    self-match excluded.  ``centroids=None`` uses the Forgy seed set (the
    oracle-reproducible quantizer); pass ``train_ivf_centroids(...)`` for
    the k-means quantizer."""
    if centroids is None:
        centroids = seed_centroids(emb, nlist, id_col, vec_col)
    withl = emb.select(
        id_col, vec_col, ivf_list_id(F.col(vec_col), centroids).alias("list_id")
    )
    probes = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(ivf_probe_lists(F.col(vec_col), centroids, nprobe)).alias("probe_cid"),
        )
    )
    joined = withl.join(
        F.broadcast(probes),
        (F.col("list_id") == F.col("probe_cid")) & (F.col(id_col) != F.col("query_id")),
    )
    # a candidate matches at most one probe of a query (probe cids are
    # distinct), so no dedup is needed before the re-rank
    scored = joined.select(
        "query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )


def lsh_bucket_topk(emb: DataFrame, query_ids: list[int], k: int = 5, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding", n_bits: int = N_BITS) -> DataFrame:
    """ANN: candidates share the query's LSH bucket; exact cosine re-rank.
    At scale the bucket equi-join replaces the all-pairs nested loop."""
    withb = emb.withColumn("bucket", lsh_bucket(F.col(vec_col), dim, n_bits))
    q = withb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket").alias("qbucket")
    )
    joined = withb.join(
        F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("query_id"))
    )
    scored = joined.select("query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )


# ---------------------------------------------------------------------------
# PQ (product quantization) — the memory-compression scale path
#
# The D-dim vector is split into PQ_M contiguous subspaces; each subspace
# has its own K-entry codebook, and a vector is stored as M small codes
# (M bytes at K<=256 vs 4*D float32 — 32x for D=64, M=8).  Search is
# asymmetric (ADC): the query stays float32, database vectors are
# reconstructed from their codes — the FAISS IndexPQ shape.
#
# Scale design mirrors the IVF path: codebooks are LITERAL arrays folded
# into whole-stage codegen, so encoding and reconstruction are pure
# projections over the scan (zero shuffle, zero broadcast state, no
# Python); the only shuffle in pq_topk is the per-query top-k window.
# Codebook training follows the same bounded-sample recipe; the
# Forgy-seeded variant (codebooks = subvector slices of the PQ_K
# smallest ids) is arithmetic-reproducible and mirrored exactly by the
# DuckDB value oracle.  Subspace distances are rounded to 6 dp before
# the argmin on BOTH engines so assignment never flips on a last-ulp
# summation difference.

PQ_M = 8
PQ_K = 16


def pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Forgy codebooks: per subspace, the subvector slices of the ``k``
    smallest-id embeddings (deterministic at any parallelism; a
    metadata-scale collect).  Returns [m][k][d/m]."""
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    d = len(vecs[0])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [[v[mi * dsub:(mi + 1) * dsub] for v in vecs] for mi in range(m)]


def train_pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 10,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic per-subspace L2 k-means codebooks: Lloyd iterations
    over the ``sample_cap`` smallest-id vectors (sorted-limit sample ->
    identical at any parallelism), Forgy init, empty cells keep their
    previous entry.  The same bounded-sample recipe as
    ``train_ivf_centroids`` — training is driver-side over a capped
    sample; only encoding touches the full corpus, and that is a
    literal-codebook codegen projection."""
    import numpy as np

    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(sample_cap).collect()
    X = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = []
    for mi in range(m):
        S = X[:, mi * dsub:(mi + 1) * dsub]
        C = S[:k].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties -> smallest code (argmin)
            for j in range(k):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def _sq_l2(a: Column, b: Column) -> Column:
    """round-6 squared L2 between two same-length array columns
    (sequential double fold — the oracle's list_sum mirrors it; round-6
    keeps the argmin engine-independent)."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def _pq_sub_code(sub: Column, codebook: list[list[float]]) -> Column:
    """argmin-L2 code for one subspace (ties -> smallest code): ascending
    struct order on (dist, code) makes array_min exactly that."""
    entries = [
        F.struct(_sq_l2(sub, _lit_vec(c)).alias("d"), F.lit(ci).alias("code"))
        for ci, c in enumerate(codebook)
    ]
    return F.array_min(F.array(*entries))["code"]


def pq_encode_col(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace codes — a literal-codebook codegen
    projection (zero shuffle at any scale)."""
    dsub = len(codebooks[0][0])
    return F.array(*[
        _pq_sub_code(F.slice(vec, mi * dsub + 1, dsub), cb)
        for mi, cb in enumerate(codebooks)
    ])


def pq_reconstruct_col(codes: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<double> reconstruction: concatenated codebook entries."""
    parts = []
    for mi, cb in enumerate(codebooks):
        table = F.array(*[_lit_vec(c) for c in cb])
        parts.append(F.element_at(table, F.element_at(codes, mi + 1) + 1))
    return F.flatten(F.array(*parts))


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): the stored PQ representation (M bytes per
    vector at K<=256)."""
    if codebooks is None:
        codebooks = pq_codebooks(emb, id_col=id_col, vec_col=vec_col)
    return emb.select(
        F.col(id_col), pq_encode_col(F.col(vec_col), codebooks).alias("codes")
    )


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos) — asymmetric PQ search: float queries
    against PQ-reconstructed database vectors, round-6 cosine, tie-break
    ascending id, self-match excluded.  ``codebooks=None`` uses the Forgy
    seed codebooks (the oracle-reproducible quantizer)."""
    if codebooks is None:
        codebooks = pq_codebooks(emb, m, n_codes, id_col, vec_col)
    recon = emb.select(
        id_col,
        pq_reconstruct_col(pq_encode_col(F.col(vec_col), codebooks), codebooks).alias("rvec"),
    )
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = recon.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id", id_col, cosine(F.col("qvec"), F.col("rvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos) — the FAISS IndexIVFPQ shape, the real
    10^12-scale ANN path: the coarse quantizer prunes candidates to the
    query's ``nprobe`` nearest Voronoi cells (compute bound), and each
    candidate is scored against its PQ reconstruction, never its float
    vector (memory bound — the stored entry is (list_id, M codes), 32x
    smaller at 64-dim).  Both quantizers are literal-array codegen
    projections, so the only shuffle is the per-query top-k window; the
    probe join is a broadcast of (n_queries x nprobe) rows."""
    if centroids is None:
        centroids = seed_centroids(emb, nlist, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_codebooks(emb, m, n_codes, id_col, vec_col)
    withl = emb.select(
        id_col,
        ivf_list_id(F.col(vec_col), centroids).alias("list_id"),
        pq_reconstruct_col(
            pq_encode_col(F.col(vec_col), codebooks), codebooks
        ).alias("rvec"),
    )
    probes = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(ivf_probe_lists(F.col(vec_col), centroids, nprobe)).alias("probe_cid"),
    )
    joined = withl.join(
        F.broadcast(probes),
        (F.col("list_id") == F.col("probe_cid")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id", id_col, cosine(F.col("qvec"), F.col("rvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )


def filtered_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OpenSearch k-NN search with a filter — PRE-filter semantics (the
    OpenSearch `filter` clause on a knn query, and the exact-search
    fallback path): the predicate restricts the CANDIDATE set before
    top-k, so exactly k passing neighbors return (post-filtering an
    unfiltered top-k would under-fill).  Query vectors are looked up in
    the unfiltered table (a query need not pass its own filter).

    Scale: the predicate lands in the candidate scan (pushdown), the
    query side broadcasts — same shape as cosine_topk."""
    q = emb.filter(F.col(id_col).isin([int(i) for i in query_ids])).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = emb.filter(pred)
    joined = cand.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos")
        .orderBy("query_id", F.col("cos").desc(), id_col)
    )
