"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash (hamming pairs via xor + bit_count), and n-gram Jaccard
near-dup.  All are pure DataFrame/SQL compositions (no Python UDFs) so they
scale the way any Spark groupBy/join does; hot work is the shingle
explosion, which partial-aggregates map-side before the shuffle.

Portable hashing contract (engine == DuckDB oracle): a string hashes to the
first 12 hex chars of its md5 read as an int (48 bits, exact in int64 and
in SQL `CAST('0x'||substr(md5(s),1,12) AS BIGINT)`).  MinHash permutations
are h_i(x) = (a_i * x + b_i) mod (2^61 - 1) with small fixed a_i so the
product stays in int64.
"""

from __future__ import annotations

import re as _re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import SQL_SPLIT_RE

MERSENNE61 = (1 << 61) - 1
# fixed, public-knowledge-style permutation constants (a < 2^12 keeps
# a*x < 2^60 for x < 2^48 — no int64 overflow engine- or oracle-side)
MINHASH_A = [1223, 2741, 919, 3469, 1597, 2063, 3907, 1151]
MINHASH_B = [101, 20249, 4099, 900001, 7333, 31337, 65447, 271]
N_HASHES = 8
N_BANDS = 4  # 2 rows per band


def h48(col: Column) -> Column:
    """48-bit integer hash of a string (md5-prefix; portable to DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    """Frozen-analyzer tokens as an array column (split + lowercase +
    drop-empties) — same token stream as the index tokenizer for ASCII."""
    return F.filter(F.split(F.lower(text), SQL_SPLIT_RE), lambda x: x != "")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles (space-joined STRINGS) of the token stream.

    Formulated as arrays_zip of k top-level shifted slices + one transform
    over the zipped structs.  The obvious `transform(sequence(0, n-k),
    i -> concat_ws(' ', slice(toks, i+1, k)))` re-evaluates every
    non-lambda subexpression (including the split()) PER ELEMENT —
    measured 75s for 20k docs vs seconds for this shape.

    r4 NOTE: building shingle STRINGS at all is the dominant cost of the
    minhash pipeline (measured ~90% of signature time on the transcript
    bench shape); the production operators below use
    :func:`shingle_hashes_col` instead.  This string form remains for
    callers that need human-readable shingles."""
    toks = tokens_col(text)
    n = F.size(toks)
    parts = [F.slice(toks, j + 1, n - F.lit(k) + 1).alias(f"p{j}") for j in range(k)]
    zipped = F.arrays_zip(*parts)
    sh = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f"p{j}"] for j in range(k)]))
    return F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", toks)))


#: polynomial (Karp-Rabin) shingle-hash constants — int64-overflow-safe:
#: token hashes are < 2^48, so acc*A + t < 2^48*4099 + 2^48 < 2^61 and the
#: running value re-reduces below 2^48 every step.  2^48 - 59 is the
#: largest prime below 2^48; outputs stay in the < 2^48 domain the MinHash
#: permutation constants were chosen for.
SHINGLE_MOD = (1 << 48) - 59
SHINGLE_A = 4099


def shingle_hashes_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles as 48-bit polynomial hashes — NO shingle strings.

    Each token is md5-hashed once (h48), then every k-window combines by
    Horner's rule ``h = (h*A + t) mod M`` — order-sensitive, collision
    rate ~n^2/2^48, and reproduced exactly by the DuckDB oracles (same
    md5-prefix token hash, same arithmetic), so jaccard/minhash results
    value-match the oracle bit-for-bit.

    Shape notes (both measured, not guessed):
    - the token-hash array is bound as a LAMBDA VARIABLE via a
      single-element ``transform`` (a let-binding): referencing it
      directly from the window ``transform`` would inline the whole
      md5 map into every window element (O(n^2) hashing — minutes at
      100k docs);
    - replacing string-shingle construction (arrays_zip + concat_ws +
      md5 per ~60-char shingle) with one md5 per ~6-char token plus int
      arithmetic measured ~12x faster on the 100k-turn bench shape.

    Documents with fewer than k tokens hash their whole token stream as
    one shingle (mirroring shingles_col's single joined-string shingle);
    null text yields null (callers filter)."""
    toks = tokens_col(text)
    th = F.transform(toks, lambda x: h48(x))

    def body(a):
        n = F.size(a)

        def win_hash(i):
            h = F.element_at(a, i)
            for j in range(1, k):
                h = (h * F.lit(SHINGLE_A) + F.element_at(a, i + F.lit(j))) % F.lit(SHINGLE_MOD)
            return h

        windows = F.transform(F.sequence(F.lit(1), n - F.lit(k) + 1), win_hash)
        all_fold = F.aggregate(
            a, F.lit(0).cast("long"),
            lambda acc, x: (acc * F.lit(SHINGLE_A) + x) % F.lit(SHINGLE_MOD),
        )
        return F.when(n >= k, windows).otherwise(F.array(all_fold))

    return F.element_at(F.transform(F.array(th), body), 1)


#: Python mirror of tokens_col (JVM split semantics for ASCII — the same
#: equivalence chunking's Arrow path and every dedup oracle already rely on)
_PY_SPLIT = _re.compile(SQL_SPLIT_RE)


def _h48_batch(tokens: np.ndarray, lens: np.ndarray):
    """(flat int64 h48 per token instance, row offsets) for a batch.

    md5 runs once per DISTINCT token of the batch (pd.factorize — the
    Zipf head repeats constantly, so distincts are a small fraction),
    then codes map back; identical values to ``h48`` (md5-prefix of the
    UTF-8 bytes, 12 hex chars as int)."""
    import hashlib

    if tokens.size:
        codes, uniques = pd.factorize(tokens, use_na_sentinel=False)
        uh = np.fromiter(
            (int(hashlib.md5(u.encode("utf-8")).hexdigest()[:12], 16) for u in uniques),
            dtype=np.int64,
            count=len(uniques),
        )
        flat = uh[codes]
    else:
        flat = np.empty(0, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    return flat, offsets


def _tokenize_batch(texts: pd.Series):
    """(token lists or None per row, notnull mask) — tokens_col mirror."""
    rows = [
        [t for t in _PY_SPLIT.split(x.lower()) if t] if isinstance(x, str) else None
        for x in texts
    ]
    mask = np.array([r is not None for r in rows], dtype=bool)
    return rows, mask


def _shingle_flat(kept: list, k: int):
    """Token lists -> (sh_flat int64, row offsets, row shingle counts):
    the numpy mirror of ``shingle_hashes_col`` — Horner windows for rows
    with >= k tokens, one whole-stream fold otherwise (including the
    empty stream, whose fold is 0 — the column impl's `otherwise`
    branch).  Exact int64 arithmetic in the same overflow-safe domains."""
    MOD = np.int64(SHINGLE_MOD)
    A = np.int64(SHINGLE_A)
    lens = np.fromiter((len(r) for r in kept), dtype=np.int64, count=len(kept))
    total = int(lens.sum())
    flat_tok = (
        np.concatenate([np.asarray(r, dtype=object) for r in kept if r])
        if total
        else np.empty(0, dtype=object)
    )
    th, offsets = _h48_batch(flat_tok, lens)
    wide = lens >= k
    wlens = np.where(wide, lens - k + 1, 0)
    sh_lens = np.where(wide, wlens, 1)
    sh_off = np.concatenate(([0], np.cumsum(sh_lens)))[:-1]
    sh_flat = np.zeros(int(sh_lens.sum()), dtype=np.int64)
    tw = int(wlens.sum())
    if tw:
        base = np.repeat(offsets[wide], wlens[wide])
        intra = np.arange(tw, dtype=np.int64) - np.repeat(
            np.cumsum(wlens[wide]) - wlens[wide], wlens[wide]
        )
        starts = base + intra
        acc = th[starts].copy()
        for j in range(1, k):
            acc = (acc * A + th[starts + j]) % MOD
        tgt = np.repeat(sh_off[wide], wlens[wide]) + intra
        sh_flat[tgt] = acc
    for i in np.nonzero(~wide)[0]:
        a = np.int64(0)
        for t in th[offsets[i] : offsets[i] + lens[i]]:
            a = (a * A + t) % MOD
        sh_flat[sh_off[i]] = a
    return sh_flat, sh_off, sh_lens


def _shingle_rows_arrow(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Exploded (id, s) shingle-hash rows in one Arrow pass — the same
    rows ``explode(shingle_hashes_col(text, k))`` produces (null text
    drops; callers keep their own ``.distinct()``), without the JVM
    tokenizer's per-token String allocation (r6: 4.2 s of the 5.5 s
    minhash bench bar)."""
    id_type = df.select(F.col(id_col)).schema[0].dataType
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("id", id_type), StructField("s", LongType())]
    )
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows, mask = _tokenize_batch(pdf["__text"])
            if not mask.any():
                continue
            kept = [r for r in rows if r is not None]
            sh_flat, _, sh_lens = _shingle_flat(kept, k)
            ids = np.repeat(pdf["__id"].to_numpy()[mask], sh_lens)
            yield pd.DataFrame({"id": ids, "s": sh_flat})

    return src.mapInPandas(gen, schema)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: md5(text) -> (hash, n_dups, keeper=min id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("text_md5")
    )


def _minhash_signatures_arrow(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Arrow-batched mirror of the column minhash (r6).

    Measured at the bench shape (100k transcript turns): the JVM
    ``split(lower(text))`` alone costs 4.2 s of the column path's 5.5 s —
    the per-token java.lang.String allocation stream that chunking's r4g
    notes showed saturating DRAM on this host.  Here tokenize is one
    vectorized regex pass, md5 runs per DISTINCT batch token, and the
    Horner windows / 8 permutation minima are exact int64 numpy (same
    overflow-safe domains as the column expressions).  Values are
    IDENTICAL: equality-tested against the column impl, and the LSH/
    jaccard oracles replay the same arithmetic."""
    id_type = df.select(F.col(id_col)).schema[0].dataType
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(id_col, id_type)]
        + [StructField(f"mh{i}", LongType()) for i in range(N_HASHES)]
    )
    src = df.select(F.col(id_col), F.col(text_col).alias("__text"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows, mask = _tokenize_batch(pdf["__text"])
            if not mask.any():
                # all-null batch: still emit the null-identity rows below
                yield pd.DataFrame(
                    {id_col: pdf[id_col].to_numpy(),
                     **{f"mh{i}": np.int64(MERSENNE61) for i in range(N_HASHES)}}
                )
                continue
            kept = [r for r in rows if r is not None]
            sh_flat, sh_off, _ = _shingle_flat(kept, k)
            out = {id_col: pdf[id_col].to_numpy()[mask]}
            for i, (pa, pb) in enumerate(zip(MINHASH_A, MINHASH_B)):
                v = (np.int64(pa) * sh_flat + np.int64(pb)) % np.int64(MERSENNE61)
                out[f"mh{i}"] = np.minimum.reduceat(v, sh_off)
            frame = pd.DataFrame(out)
            if not mask.all():
                # null text: the column impl KEEPS these rows — the null
                # shingle array folds through least() untouched, leaving
                # every permutation at its MERSENNE61 identity (matched
                # here so impl="arrow" is row-identical on any input)
                nulls = pd.DataFrame(
                    {id_col: pdf[id_col].to_numpy()[~mask],
                     **{f"mh{i}": np.int64(MERSENNE61) for i in range(N_HASHES)}}
                )
                frame = pd.concat([frame, nulls], ignore_index=True)
            yield frame

    return src.mapInPandas(gen, schema)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """Per-doc MinHash signature — fully per-row, NO shuffle (r3), single
    array pass (r4).

    The r3 shape (8 independent ``array_min(transform(hs, ...))`` columns
    over a hashed-shingle column) re-traversed — and, after Catalyst's
    projection collapse inlined the alias, re-HASHED — the shingle array
    once per permutation (VERDICT r3: the lsh-pairs bench regression).
    This formulation folds everything into ONE ``F.aggregate`` over the
    polynomial shingle-hash array (:func:`shingle_hashes_col` — no
    shingle strings are ever built) with an 8-field struct accumulator:
    each token is md5-hashed exactly once and all 8 permutation minima
    update in the same traversal.  Measured ~12x faster than the
    string-shingle formulation on the 100k-turn bench shape.  Docs whose
    text is null are dropped (null shingle array), as before.

    ``impl="arrow"`` (default, r6) computes the identical signature in an
    Arrow batch stage (see :func:`_minhash_signatures_arrow` — the JVM
    tokenizer's per-token String allocation dominated the column path);
    ``impl="column"`` keeps the pure-expression reference shape."""
    if impl == "arrow":
        return _minhash_signatures_arrow(df, id_col, text_col, k)
    if impl != "column":
        raise ValueError(f"minhash_signatures: unknown impl {impl!r}")
    sh = df.select(F.col(id_col), shingle_hashes_col(F.col(text_col), k).alias("sh")).filter(
        F.size("sh") > 0
    )
    hs_col = F.col("sh")
    zero = F.struct(
        *[F.lit(MERSENNE61).cast("long").alias(f"m{i}") for i in range(N_HASHES)]
    )

    def merge(acc, x):
        return F.struct(
            *[
                F.least(acc[f"m{i}"], (F.lit(a) * x + F.lit(b)) % F.lit(MERSENNE61)).alias(f"m{i}")
                for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
            ]
        )

    agg = F.aggregate(hs_col, zero, merge)
    return sh.select(id_col, *[agg[f"m{i}"].alias(f"mh{i}") for i in range(N_HASHES)])


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    jaccard_min: float = 0.5,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding (2 rows/band, 4 bands) with
    exact shingle-Jaccard verification: (id_a, id_b, jaccard) with
    jaccard >= jaccard_min, id_a < id_b.

    ``persist_intermediates`` (r4, VERDICT r3 item 3): the banded
    signatures feed both sides of the candidate self-join and the distinct
    shingle relation feeds three consumers (a-side, b-side, sizes); Spark
    plans each consumer independently (AQE's self-join dedup defeats
    exchange reuse here — measured, not assumed), so without caching the
    signature pipeline runs twice and the shingle explode three times.
    With the flag the two shared PER-DOC frames (4 band rows/doc; the
    distinct shingle-hash table) materialize once via eager
    localCheckpoint — every consumer then reads the stored blocks, the
    pair-sized result stays LAZY (it can be huge on near-dup-heavy
    corpora), and the checkpoint blocks are reclaimed by Spark's
    ContextCleaner when the returned DataFrame is garbage collected.
    Trade-offs of the flag (deliberate): construction becomes EAGER
    (the signature/shingle jobs run at call time), and localCheckpoint
    truncates lineage — on executor loss the checkpointed blocks cannot
    recompute and downstream stages fail instead of recovering.  At
    extreme scale, or when lazy construction / fault recovery matters
    more than the 2-3x recompute, pass False for the stateless plan."""
    sig = minhash_signatures(df, id_col, text_col, k)
    # one-pass banding: explode an inline array of (band, key) structs —
    # a per-band select+union would re-run the whole signature pipeline
    # N_BANDS times (no implicit caching of a reused DataFrame)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("_", F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}")).alias("key"),
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # verification intersects 8-byte shingle HASHES, not strings — same
    # jaccard modulo 48-bit collisions, mirrored exactly in the oracle,
    # and the verify shuffle carries ints instead of ~60-char strings
    # (shingle rows from the Arrow pass, r6 — same rows as the exploded
    # column expression, minus the JVM tokenizer).
    # r6b: shingles roll up to ONE sorted distinct-hash array per doc
    # (collect_set == the old global (id, s) distinct, since id is in the
    # key), so verification is two doc-volume joins + a JVM
    # array_intersect per candidate pair instead of an explode to
    # shingle-row volume, a pair×shingle equi-join, a count groupBy and
    # two size joins — |sa ∩ sb| and the sizes are the same numbers by
    # construction, and the jaccard arithmetic below is untouched.
    doc_sh = (
        _shingle_rows_arrow(df, id_col, text_col, k)
        .groupBy("id")
        .agg(F.array_sort(F.collect_set("s")).alias("arr"))
    )
    if persist_intermediates:
        banded = banded.localCheckpoint(eager=True)
        doc_sh = doc_sh.localCheckpoint(eager=True)
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    # exact-Jaccard verification on CANDIDATE pairs only (never all-pairs:
    # at scale the shared-shingle self-join explodes quadratically on
    # common shingles; LSH exists precisely to avoid it).  The inner joins
    # drop ids with no shingles (empty/null text), like the old explode
    # path did; the inter > 0 filter reproduces the old INNER
    # shingle-equality join, which never emitted zero-overlap pairs (it
    # only matters for jaccard_min <= 0).
    a_arr = doc_sh.select(F.col("id").alias("id_a"), F.col("arr").alias("aa"))
    b_arr = doc_sh.select(F.col("id").alias("id_b"), F.col("arr").alias("ab"))
    verified = (
        cand.join(a_arr, "id_a")
        .join(b_arr, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("aa", "ab")).alias("inter"),
            F.size("aa").alias("na"),
            F.size("ab").alias("nb"),
        )
        .filter(F.col("inter") > 0)
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .select("id_a", "id_b", "jaccard")
    )
    return verified.filter(F.col("jaccard") >= jaccard_min).orderBy("id_a", "id_b")


def ngram_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing >=1 shingle:
    (id_a, id_b, jaccard).  |A∩B| from a self-join on distinct shingles,
    |A∪B| = |A| + |B| - |A∩B|.

    This is the exact ORACLE BASELINE — the self-join is quadratic in the
    document frequency of shared shingles, so at scale it must never be
    the production path (that's minhash_lsh_pairs).  ``max_shingle_df``
    bounds the blowup: shingles appearing in more than that many docs are
    dropped from the shingle universe BEFORE the join (self-consistently —
    both the intersection and the set sizes use the filtered universe, so
    results are identical to exact whenever no shingle exceeds the cap,
    and a well-defined restricted-universe Jaccard otherwise).

    r4: the shingle universe is the polynomial HASH domain
    (:func:`shingle_hashes_col`), not strings — set sizes and
    intersections are identical modulo 48-bit collisions and the DuckDB
    oracle reproduces the same hashing, so engine == oracle exactly."""
    sh = _shingle_rows_arrow(df, id_col, text_col, k).distinct()
    if max_shingle_df is not None:
        rare = sh.groupBy("s").agg(F.count("*").alias("sdf")).filter(
            F.col("sdf") <= max_shingle_df
        ).select("s")
        sh = sh.join(rare, "s", "left_semi")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .select("id_a", "id_b", "jaccard")
    )


# Production default for the shingle-DF cap (VERDICT r2 item 5): a shingle
# shared by d docs contributes d^2/2 join rows, so ONE stop-shingle at
# d=10^7 is 5*10^13 rows — an uncapped default lets a caller go quadratic
# by accident.  10_000 bounds any single shingle's join contribution to
# 5*10^7 rows while staying far above real shingle DFs at test scales
# (measured max 46 at sf0.01, 338 at sf0.1), so capped == exact there.
DEFAULT_MAX_SHINGLE_DF = 10_000

_UNCAPPED = object()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    jaccard_min: float = 0.5,
    max_shingle_df: int | None | object = _UNCAPPED,
) -> DataFrame:
    """Production wrapper: defaults to a finite ``max_shingle_df``
    (DEFAULT_MAX_SHINGLE_DF); pass ``max_shingle_df=None`` explicitly to
    get the unbounded exact-oracle behavior of :func:`ngram_jaccard`."""
    cap = DEFAULT_MAX_SHINGLE_DF if max_shingle_df is _UNCAPPED else max_shingle_df
    return (
        ngram_jaccard(df, id_col, text_col, k, cap)
        .filter(F.col("jaccard") >= jaccard_min)
        .orderBy("id_a", "id_b")
    )


def _simhash_arrow(df: DataFrame, id_col: str, text_col: str, bits: int) -> DataFrame:
    """Arrow-batched mirror of the column simhash (r6): tokenize + h48 in
    numpy (md5 per distinct batch token), per-bit ±1 sums via
    np.add.reduceat — identical values, no shuffle at all (the column
    path's groupBy moved per-doc partials; here every doc's tokens are
    already in its batch row).  Docs with zero tokens are absent from the
    output, matching the explode-based shape."""
    id_type = df.select(F.col(id_col)).schema[0].dataType
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(id_col, id_type), StructField("simhash", LongType())]
    )
    src = df.select(F.col(id_col), F.col(text_col).alias("__text"))

    def gen(batches):
        for pdf in batches:
            rows, _ = _tokenize_batch(pdf["__text"])
            keep = np.array(
                [r is not None and len(r) > 0 for r in rows], dtype=bool
            )
            if not keep.any():
                continue
            kept = [r for r in rows if r]
            lens = np.fromiter((len(r) for r in kept), dtype=np.int64, count=len(kept))
            flat_tok = np.concatenate([np.asarray(r, dtype=object) for r in kept])
            th, offsets = _h48_batch(flat_tok, lens)
            sh = np.zeros(len(kept), dtype=np.int64)
            for b in range(bits):
                contrib = ((th >> np.int64(b)) & np.int64(1)) * np.int64(2) - np.int64(1)
                s_b = np.add.reduceat(contrib, offsets)
                sh |= np.where(s_b > 0, np.int64(1) << np.int64(b), np.int64(0))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[keep], "simhash": sh}
            )

    return src.mapInPandas(gen, schema)


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 48,
    impl: str = "arrow",
) -> DataFrame:
    """Per-doc SimHash over token hashes: bit b set iff more (distinct-kept,
    frequency-weighted) tokens have bit b set than not.

    Formulation (r3, VERDICT r2 item 9): one token-hash row per token and
    ``bits`` conditional sums in a SINGLE groupBy pass —
    ``sum((hash>>b & 1)*2 - 1)`` per bit as independent agg columns, all
    whole-stage-codegen JVM expressions with map-side partial aggregation.
    The previous shape exploded 48 (id, bit) rows per token hash and
    shuffled all of them; this shuffles only the per-doc partial sums.

    ``impl="arrow"`` (default, r6) computes the identical hash in an Arrow
    batch stage with NO shuffle (see :func:`_simhash_arrow`);
    ``impl="column"`` keeps the pure-expression reference shape."""
    if impl == "arrow":
        return _simhash_arrow(df, id_col, text_col, bits)
    if impl != "column":
        raise ValueError(f"simhash: unknown impl {impl!r}")
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("t"))
    hashed = toks.select("id", h48(F.col("t")).alias("x"))
    bit_sums = [
        F.sum(F.expr(f"(shiftright(x, {b}) & 1) * 2 - 1")).alias(f"s{b}") for b in range(bits)
    ]
    per_doc = hashed.groupBy("id").agg(*bit_sums)
    sh = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sh = term if sh is None else sh + term
    return per_doc.select(F.col("id").alias(id_col), sh.alias("simhash"))


def _simhash_bands(max_hamming: int, bits: int = 48) -> list[tuple[int, int]]:
    """(offset, width) of the max_hamming+1 pigeonhole bands: a pair with
    hamming <= max_hamming differs in <= max_hamming bits, so with
    max_hamming+1 disjoint bands at least ONE band is bit-identical —
    candidate generation by band equi-join has guaranteed recall 1.0."""
    nb = max_hamming + 1
    if nb > bits:
        raise ValueError(f"max_hamming+1={nb} bands need <= {bits} bits")
    w, rem = divmod(bits, nb)
    out, off = [], 0
    for i in range(nb):
        width = w + (1 if i < rem else 0)
        out.append((off, width))
        off += width
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bits: int = 48,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming —
    (id_a, id_b, hamming).

    Banded candidate generation (no all-pairs join anywhere): the
    ``bits``-bit simhash splits into max_hamming+1 disjoint bands; by
    pigeonhole every qualifying pair shares >=1 exact band, so candidates
    come from a band-key equi-join (same shape as the MinHash banding
    above) and only candidates pay the exact xor+bit_count verification.
    Verified equal to the all-pairs formulation on the oracle corpus
    (tests) — banding is lossless for the hamming predicate.

    ``persist_intermediates``: the banded simhash frame feeds both sides
    of the self-join; without caching the token explode + 48-bit groupBy
    runs twice (same mechanism as minhash_lsh_pairs — measured, AQE plans
    the two sides independently).  The small per-doc banded frame
    (max_hamming+1 rows/doc) materializes once via eager localCheckpoint;
    the pair-sized result stays lazy (it can be huge — 6.6M pairs on the
    10k-turn bench sample)."""
    s = simhash(df, id_col, text_col, bits)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"shiftright(simhash, {off}) & {(1 << width) - 1}").alias("key"),
            )
            for i, (off, width) in enumerate(_simhash_bands(max_hamming, bits))
        ]
    )
    banded = s.select(F.col(id_col), F.col("simhash"), F.explode(band_structs).alias("bk")).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    if persist_intermediates:
        banded = banded.localCheckpoint(eager=True)
    l, r = banded.alias("l"), banded.alias("r")
    # the hamming predicate rides IN the join condition (r6b): candidates
    # failing it are dropped inside the join instead of surviving into the
    # dedup shuffle — filter/distinct commute (hamming is a deterministic
    # function of the pair), so the result set is identical while the
    # distinct exchange carries only qualifying pairs (the band join emits
    # every same-band collision; on the Zipf-heavy bench sample most fail
    # the <= max_hamming cut)
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            & (
                F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
                <= F.lit(max_hamming)
            ),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.orderBy("id_a", "id_b")


def simhash_pairs_allpairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 6, bits: int = 48) -> DataFrame:
    """All-pairs xor formulation — O(n^2) TEST BASELINE for simhash_pairs;
    never the scale path."""
    s = simhash(df, id_col, text_col, bits)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def contamination_stats(
    train: DataFrame,
    bench: DataFrame,
    k: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Llama training-data hygiene
    step re-expressed relationally): per train document, the fraction of
    its DISTINCT word k-shingles that appear anywhere in the benchmark
    corpus, and a ``contaminated`` flag at ``threshold``.

    Columns: (id, n_shingles, n_hits, contam_frac_r, contaminated).

    Scale shape: the benchmark shingle set is deduplicated once
    (benchmarks are ~10^5 docs vs 10^12 train rows, so this side is
    broadcast-sized; with AQE the semi join is map-side — no shuffle of
    the exploded train shingles), and shingles are the 48-bit polynomial
    hashes (no shingle strings, same arithmetic as the minhash/jaccard
    family, mirrored exactly by the DuckDB oracle).  Per-doc distinctness
    comes from array_distinct BEFORE the explode, so the join input is
    already minimal."""
    sh = lambda c: F.array_distinct(shingle_hashes_col(c, k))  # noqa: E731
    bench_sh = (
        bench.select(F.explode(shingle_hashes_col(F.col(text_col), k)).alias("sh"))
        .distinct()
    )
    tr = train.select(F.col(id_col).alias("id"), sh(F.col(text_col)).alias("shs"))
    tr_sh = tr.select("id", F.explode("shs").alias("sh"))
    hits = (
        tr_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    frac = F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_shingles")
    return (
        tr.select("id", F.size("shs").alias("n_shingles"))
        .join(hits, "id", "left")
        .select(
            "id",
            "n_shingles",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(frac, 6).alias("contam_frac_r"),
            (frac >= F.lit(threshold)).alias("contaminated"),
        )
        .orderBy("id")
    )


def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every node
    gets ``cluster_id`` = the smallest id reachable from it (singletons
    label themselves) — the step that turns pairwise near-dup evidence
    into "keep one representative per cluster" at corpus scale.

    Algorithm: distributed min-label propagation.  Each round joins the
    symmetrized edge list to the current labels and takes
    ``min(own, min(neighbor labels))``; converged when no label changes.
    Rounds = graph diameter; near-dup graphs are overwhelmingly tiny
    cliques/short chains (diameter 1-3), so the loop runs 2-4 rounds of
    one join + one groupBy each, label state is localCheckpoint'ed every
    round to cut lineage, and the loop raises loudly at ``max_iters``
    rather than silently returning partial components.  (For adversarial
    long-chain graphs the O(log n) alternating-star algorithm is the
    published upgrade path; the per-round primitive here is the same
    join+min shuffle shape.)

    Input ``pairs`` needs columns (id_a, id_b); ``nodes`` supplies the
    full id universe so singletons appear in the output."""
    lab = nodes.select(F.col(id_col).alias("id")).distinct().withColumn(
        "lab", F.col("id")
    )
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = lab.localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr = (
            edges.join(lab.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("lab").alias("nbr_min"))
        )
        new = (
            lab.join(nbr, "id", "left")
            .select("id", F.least(F.col("lab"), F.coalesce("nbr_min", "lab")).alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.withColumnRenamed("lab", "new_lab")
            .join(lab, "id")
            .filter(F.col("new_lab") != F.col("lab"))
            .count()
        )
        lab = new
        if changed == 0:
            return lab.select(F.col("id").alias(id_col), F.col("lab").alias("cluster_id")).orderBy(id_col)
    raise RuntimeError(
        f"dedup_clusters: not converged after {max_iters} rounds "
        f"(pathological chain graph? raise max_iters or switch to alternating-star)"
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplication stats (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a token window of length
    ``window`` is DUPLICATED when its exact content occurs at least
    ``min_count`` times corpus-wide (occurrences, not distinct docs —
    within-doc repeats count, matching the paper's suffix-array
    multiplicity; their production setting is 50-token spans).

    Spark-first re-expression of the suffix-array scan: the rolling
    48-bit Karp-Rabin window hashes (:func:`shingle_hashes_col` — one md5
    per token, Horner windows, no window strings) stand in for suffixes;
    a hash seen >= min_count times marks every covering occurrence
    duplicated.  Collision rate ~n^2/2^48 overcounts one window pair per
    ~2.8e14 — at training-pipeline scale that noise is far below the
    dedup decision threshold, and the arithmetic is reproduced exactly by
    the DuckDB oracle.

    Scale shape: explode at window volume (~1 row per corpus token);
    ``groupBy(h)`` partial-aggregates map-side and the 48-bit hash keys
    are uniform (no skew salting needed); the counts join is the one real
    shuffle-join — both sides window-volume, so AQE plans a sort-merge;
    nothing is driver-side.  Docs shorter than ``window`` tokens hash
    their whole stream as one window (short exact dups still surface).

    Returns (id, n_windows, n_dup_windows, dup_frac_r) per doc.
    """
    sh = _shingle_rows_arrow(df, id_col, text_col, window).withColumnRenamed(
        "s", "h"
    )
    counts = sh.groupBy("h").agg(F.count("*").alias("c"))
    return (
        sh.join(counts, "h")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(
                F.when(F.col("c") >= min_count, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac_r",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
    )
