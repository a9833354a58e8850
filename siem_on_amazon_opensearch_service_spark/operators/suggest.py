"""OpenSearch phrase suggester (did-you-mean), Spark-first.

The reference's dashboards sit on OpenSearch, whose phrase suggester
re-ranks spelling-candidate sequences with a Stupid Backoff n-gram model
over the index's own term statistics.  Re-expression here:

* **model build** (offline, per index): one distributed pass over the docs
  store tokenizes with the frozen analyzer and partial-counts unigram
  ``ttf`` (total term frequency) and adjacent-bigram counts inside each
  Arrow batch (map-side combine in numpy), then a groupBy-sum — the
  shuffle carries distinct (bi)gram keys, not token instances.  Persisted
  as ``<index>/suggest/{unigrams,bigrams}`` parquet + ``_model.json``.
* **query time** (k-row-sized): candidates per input word come from the
  term dictionary (levenshtein <= max_edits, ranked df desc / term asc,
  top ``num_candidates`` — the ES direct-generator defaults), sequences
  are the cross product (bounded), and each sequence scores

      P(w1) * prod_i P(w_i | w_{i-1})

  with Stupid Backoff: ``bigram/ttf_prev`` when the bigram was seen, else
  ``0.4 * ttf_i / total_tokens``.  All counts are integers and the
  divisions/multiplications run left-to-right in float64, so the DuckDB
  oracle (same arithmetic textually) is bit-identical.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokenize
from . import segments

BACKOFF = 0.4
MAX_SEQUENCES = 10_000


# ---------------------------------------------------------------------------
# model build

def _partial_gram_counts(docs: DataFrame) -> DataFrame:
    """Per-map-task partial (w1, w2, cnt) gram counts: unigram rows carry
    w2 = NULL.  numpy partial counts per Arrow batch (map-side combine);
    rows are distinct within each flush but NOT globally — callers must
    sum per gram (groupBy in :func:`_count_grams`, or the bucket-aligned
    per-partition fold in :func:`build_suggest_model`)."""

    # r6 measured rework (sf0.1 sample, 19k docs / 560k tokens): np.unique
    # over OBJECT strings (0.56 s) + pandas string-pair groupby (0.17 s)
    # replaced by ONE factorize + integer-code bincount/unique (0.085 s for
    # both tables, ~9x) — counts proven identical.  Batches additionally
    # accumulate up to _FLUSH_TOKENS before counting, so the map-side
    # combine spans ~a dozen Arrow batches and the shuffle carries
    # correspondingly fewer duplicate gram rows; totals are unchanged
    # (counts are additive and the groupBy sums them).
    _FLUSH_TOKENS = 4_000_000

    def count_batches(batches):
        flats: list[np.ndarray] = []
        lens_parts: list[np.ndarray] = []
        pending = 0

        def flush():
            flat = flats[0] if len(flats) == 1 else np.concatenate(flats)
            lens = (
                lens_parts[0]
                if len(lens_parts) == 1
                else np.concatenate(lens_parts)
            )
            codes, uniques = pd.factorize(flat, use_na_sentinel=False)
            uc = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
            uni = pd.DataFrame({"w1": uniques, "w2": None, "cnt": uc})
            if flat.size >= 2:
                # adjacent pairs, masking the seam between consecutive docs
                # (batch boundaries are doc boundaries, so the concatenated
                # per-doc lens cover them too)
                keep = np.ones(flat.size - 1, dtype=bool)
                keep[np.cumsum(lens)[:-1] - 1] = False
                a = codes[:-1][keep].astype(np.int64)
                if a.size:
                    key = a * np.int64(len(uniques)) + codes[1:][keep]
                    uk, kc = np.unique(key, return_counts=True)
                    bi = pd.DataFrame(
                        {
                            "w1": uniques[uk // len(uniques)],
                            "w2": uniques[uk % len(uniques)],
                            "cnt": kc.astype(np.int64),
                        }
                    )
                    return pd.concat([uni, bi], ignore_index=True)
            return uni

        for pdf in batches:
            toks = segments.tokenize_series(pdf["text"])
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
            total = int(lens.sum())
            if total == 0:
                continue
            flats.append(np.concatenate([np.asarray(t, dtype=object) for t in toks if t]))
            lens_parts.append(lens[lens > 0])
            pending += total
            if pending >= _FLUSH_TOKENS:
                yield flush()
                flats, lens_parts, pending = [], [], 0
        if flats:
            yield flush()

    return docs.select("text").mapInPandas(
        count_batches, schema="w1 string, w2 string, cnt long"
    )


def _count_grams(docs: DataFrame) -> DataFrame:
    """(w1, w2, cnt) global gram counts (generic layout-agnostic shape,
    used by the streaming append path)."""
    return (
        _partial_gram_counts(docs)
        .groupBy("w1", "w2")
        .agg({"cnt": "sum"})
        .withColumnRenamed("sum(cnt)", "cnt")
    )


def _bucketed_gram_counts(docs: DataFrame, nb: int) -> DataFrame:
    """(w1, w2, cnt, bucket) final gram counts clustered so partition ==
    repartition(nb, bucket) — TWO exchanges for the whole model build
    (r6b).  The old pipeline shuffled the distinct grams THREE times:
    groupBy(w1, w2), then repartition(nb, bucket) once per table write.
    The JVM groupBy stays (its map-side partial aggregation combines the
    per-flush partial rows across a whole task — a raw bucket
    repartition of the partials measured SLOWER at sf1 because it ships
    every per-flush duplicate), but both bucketed writes now share ONE
    bucket-clustering exchange: bucket is a pure function of w1, so the
    clustered frame feeds both partitionBy("bucket") writes with no
    further shuffle and the same one-file-per-bucket geometry."""
    counted = _count_grams(docs).withColumn(
        "bucket",
        F.pmod(F.crc32(F.encode(F.col("w1"), "UTF-8")), F.lit(nb)).cast("int"),
    )
    return counted.repartition(nb, "bucket")


def _index_buckets(index_dir: str) -> int:
    """The index's postings bucket count (0 = legacy flat layouts)."""
    p = os.path.join(index_dir, "_build.json")
    if os.path.exists(p):
        with open(p) as f:
            return int(json.load(f).get("postings_buckets", 0) or 0)
    return 0


def _gram_sources(model_dir: str, sub: str) -> str:
    """DuckDB source expression over a flat or w1-hash-bucketed gram
    store (detection by directory layout, like the dict/postings)."""
    base = os.path.join(model_dir, sub)
    bucketed = any(
        e.startswith("bucket=") for e in (os.listdir(base) if os.path.isdir(base) else ())
    )
    return (
        f"read_parquet('{base}/bucket=*/*.parquet')"
        if bucketed
        else f"read_parquet('{base}/*.parquet')"
    )


def _write_grams(uni: DataFrame, bi: DataFrame, uni_p: str, bi_p: str, nb: int) -> None:
    """Write the two gram tables; with ``nb`` buckets, partitioned by
    crc32(first word) % nb — the SAME hash family as the postings/dict, so
    an append swaps only touched bucket dirs.  Every bigram's w1 is also a
    unigram of the same batch, so one touched-bucket set covers both."""
    from . import build as b

    if nb:
        (
            uni.withColumn("bucket", b.postings_bucket_col(nb))
            .repartition(nb, "bucket")
            .sortWithinPartitions("bucket", "term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(uni_p)
        )
        (
            bi.withColumn(
                "bucket",
                F.pmod(F.crc32(F.encode(F.col("w1"), "UTF-8")), F.lit(nb)).cast("int"),
            )
            .repartition(nb, "bucket")
            .sortWithinPartitions("bucket", "w1", "w2")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(bi_p)
        )
    else:
        uni.write.mode("overwrite").parquet(uni_p)
        bi.write.mode("overwrite").parquet(bi_p)


def build_suggest_model(spark: SparkSession, index_dir: str) -> str:
    """Build (or reuse) the Stupid Backoff model for an index.  Idempotent:
    returns the model dir if both tables already exist.  On bucketed
    indexes the gram stores are bucketed by crc32(w1) so streaming appends
    are O(touched-bucket bytes) (see append_suggest_grams)."""
    out = os.path.join(index_dir, "suggest")
    uni_p, bi_p = os.path.join(out, "unigrams"), os.path.join(out, "bigrams")
    meta_p = os.path.join(out, "_model.json")
    if (
        os.path.exists(os.path.join(uni_p, "_SUCCESS"))
        and os.path.exists(os.path.join(bi_p, "_SUCCESS"))
        and os.path.exists(meta_p)
    ):
        return out

    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    nb = _index_buckets(index_dir)
    if nb:
        # shared-exchange build (r6b): bucket-clustered final counts feed
        # both table writes with NO further shuffle, and the meta total
        # sums the same cached rows instead of re-reading the written
        # parquet through DuckDB.  Values are identical: same gram
        # counts, same bucket hash, same in-file sort order.  persist()
        # (lazy) rather than an eager checkpoint: the first write both
        # computes and caches, like the old pipeline.
        final = _bucketed_gram_counts(docs, nb).persist()
        (
            final.filter("w2 IS NULL")
            .selectExpr("w1 AS term", "cnt AS ttf", "bucket")
            .sortWithinPartitions("bucket", "term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(uni_p)
        )
        (
            final.filter("w2 IS NOT NULL")
            .select("w1", "w2", "cnt", "bucket")
            .sortWithinPartitions("bucket", "w1", "w2")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(bi_p)
        )
        total = (
            final.filter("w2 IS NULL").agg(F.sum("cnt")).collect()[0][0] or 0
        )
        final.unpersist()
    else:
        counted = _count_grams(docs)
        counted.persist()
        _write_grams(
            counted.filter("w2 IS NULL").selectExpr("w1 AS term", "cnt AS ttf"),
            counted.filter("w2 IS NOT NULL"),
            uni_p,
            bi_p,
            0,
        )
        total = (
            counted.filter("w2 IS NULL").agg(F.sum("cnt")).collect()[0][0] or 0
        )
        counted.unpersist()
    with open(meta_p, "w") as f:
        json.dump({"total_tokens": int(total)}, f)
    open(os.path.join(uni_p, "_SUCCESS"), "a").close()
    open(os.path.join(bi_p, "_SUCCESS"), "a").close()
    return out


def append_suggest_grams(spark: SparkSession, index_dir: str, new_docs: DataFrame) -> dict:
    """Fold one micro-batch's gram counts into an EXISTING suggest model
    (no-op when the model hasn't been built — it stays build-on-demand).

    Counts are additive over batches, so the update is an arithmetic
    upsert like the term dictionary's: on the bucketed layout only the
    bucket dirs containing the batch's first-words are read back and
    swapped — IO per batch is O(touched-bucket bytes), not O(vocabulary).
    Crash safety: the caller (append_batch) runs this BEFORE its commit
    point, and recover_orphans drops the whole model on rollback, so a
    torn update is rebuilt on demand rather than read."""
    from . import build as b

    out = os.path.join(index_dir, "suggest")
    uni_p, bi_p = os.path.join(out, "unigrams"), os.path.join(out, "bigrams")
    meta_p = os.path.join(out, "_model.json")
    if not os.path.exists(meta_p):
        return {"updated": False}

    counted = _count_grams(new_docs)
    counted.persist()
    uni_delta = counted.filter("w2 IS NULL").selectExpr("w1 AS term", "cnt AS d")
    bi_delta = counted.filter("w2 IS NOT NULL").selectExpr("w1", "w2", "cnt AS d")
    batch_tokens = uni_delta.agg(F.sum("d")).collect()[0][0] or 0
    if batch_tokens == 0:
        counted.unpersist()
        return {"updated": False}

    nb = _index_buckets(index_dir)
    bucketed = nb and any(
        e.startswith("bucket=") for e in (os.listdir(uni_p) if os.path.isdir(uni_p) else ())
    )

    def _swap(df: DataFrame, path: str) -> None:
        tmp = path + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)

    if bucketed:
        tb = sorted(
            r["b"]
            for r in uni_delta.select(b.postings_bucket_col(nb).alias("b")).distinct().collect()
        )
        old_uni = (
            spark.read.parquet(uni_p).filter(F.col("bucket").isin(tb)).drop("bucket")
        )
        new_uni = old_uni.join(uni_delta, "term", "full_outer").select(
            "term",
            (F.coalesce(F.col("ttf"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0))).alias("ttf"),
        )
        old_bi = spark.read.parquet(bi_p).filter(F.col("bucket").isin(tb)).drop("bucket")
        new_bi = old_bi.join(bi_delta, ["w1", "w2"], "full_outer").select(
            "w1",
            "w2",
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0))).alias("cnt"),
        )
        for df, path in ((new_uni, uni_p), (new_bi, bi_p)):
            # write only the touched buckets, then swap those dirs
            tmp = path + "_tmpb"
            shutil.rmtree(tmp, ignore_errors=True)
            col = "term" if path is uni_p else "w1"
            (
                df.withColumn(
                    "bucket",
                    F.pmod(F.crc32(F.encode(F.col(col), "UTF-8")), F.lit(nb)).cast("int"),
                )
                .repartition(len(tb) or 1, "bucket")
                .sortWithinPartitions("bucket", col)
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(tmp)
            )
            for kbucket in tb:
                src = os.path.join(tmp, f"bucket={kbucket}")
                dst = os.path.join(path, f"bucket={kbucket}")
                if os.path.exists(src):
                    shutil.rmtree(dst, ignore_errors=True)
                    os.replace(src, dst)
            shutil.rmtree(tmp, ignore_errors=True)
        touched = len(tb)
    else:
        old_uni = spark.read.parquet(uni_p)
        _swap(
            old_uni.join(uni_delta, "term", "full_outer").select(
                "term",
                (F.coalesce(F.col("ttf"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0))).alias("ttf"),
            ),
            uni_p,
        )
        old_bi = spark.read.parquet(bi_p)
        _swap(
            old_bi.join(bi_delta, ["w1", "w2"], "full_outer").select(
                "w1",
                "w2",
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0))).alias("cnt"),
            ),
            bi_p,
        )
        touched = -1
    counted.unpersist()

    with open(meta_p) as f:
        meta = json.load(f)
    meta["total_tokens"] = int(meta["total_tokens"]) + int(batch_tokens)
    tmpm = meta_p + ".tmp"
    with open(tmpm, "w") as f:
        json.dump(meta, f)
    os.replace(tmpm, meta_p)
    open(os.path.join(uni_p, "_SUCCESS"), "a").close()
    open(os.path.join(bi_p, "_SUCCESS"), "a").close()
    return {"updated": True, "touched_buckets": touched, "batch_tokens": int(batch_tokens)}


# ---------------------------------------------------------------------------
# query time

def _candidates(index_dir: str, word: str, max_edits: int, num: int) -> list[str]:
    import duckdb

    from .search import _dict_sources

    q = word.replace("'", "''")
    rows = duckdb.sql(
        f"SELECT term FROM {_dict_sources(index_dir)} "
        f"WHERE abs(length(term) - {len(word)}) <= {max_edits} "
        f"AND levenshtein(term, '{q}') <= {max_edits} "
        f"ORDER BY df DESC, term ASC LIMIT {num}"
    ).fetchall()
    return [r[0] for r in rows]


def phrase_suggest(
    spark: SparkSession,
    index_dir: str,
    text: str,
    max_edits: int = 1,
    num_candidates: int = 5,
    n: int = 5,
) -> list[tuple[str, float]]:
    """Top-``n`` (suggestion, score) corrections for ``text``.  Driver-side
    after the candidate/count lookups: the model and dictionary reads are
    pushed-down IN/levenshtein scans; sequence enumeration is bounded by
    num_candidates^words (MAX_SEQUENCES guard)."""
    import duckdb

    words = tokenize(text)
    if not words:
        raise ValueError("phrase_suggest: empty input after analysis")
    model = build_suggest_model(spark, index_dir)
    cands = [_candidates(index_dir, w, max_edits, num_candidates) for w in words]
    if any(not c for c in cands):
        return []
    n_seq = 1
    for c in cands:
        n_seq *= len(c)
    if n_seq > MAX_SEQUENCES:
        raise ValueError(
            f"phrase_suggest: {n_seq} candidate sequences exceeds {MAX_SEQUENCES}; "
            f"lower num_candidates or shorten the input"
        )
    with open(os.path.join(model, "_model.json")) as f:
        total = float(json.load(f)["total_tokens"])
    all_terms = sorted({t for c in cands for t in c})
    tl = ",".join("'" + t.replace("'", "''") + "'" for t in all_terms)
    uni = dict(
        duckdb.sql(
            f"SELECT term, ttf FROM {_gram_sources(model, 'unigrams')} "
            f"WHERE term IN ({tl})"
        ).fetchall()
    )
    pairs = [
        (a, b)
        for i in range(len(cands) - 1)
        for a in cands[i]
        for b in cands[i + 1]
    ]
    bi: dict[tuple[str, str], int] = {}
    if pairs:
        pl = ",".join(
            "('" + a.replace("'", "''") + "','" + b.replace("'", "''") + "')"
            for a, b in sorted(set(pairs))
        )
        bi = {
            (a, b): c
            for a, b, c in duckdb.sql(
                f"SELECT w1, w2, cnt FROM {_gram_sources(model, 'bigrams')} "
                f"WHERE (w1, w2) IN ({pl})"
            ).fetchall()
        }
    scored = []
    for seq in itertools.product(*cands):
        p = float(uni.get(seq[0], 0)) / total
        for prev, cur in zip(seq, seq[1:]):
            c = bi.get((prev, cur), 0)
            if c > 0:
                p = p * (float(c) / float(uni[prev]))
            else:
                p = p * (BACKOFF * float(uni.get(cur, 0)) / total)
        scored.append((" ".join(seq), p))
    # page on the ROUNDED score (the display contract) so the top-n cut
    # is identical to the oracle's ORDER BY score_r
    scored.sort(key=lambda t: (-round(t[1], 8), t[0]))
    return scored[:n]


def phrase_suggest_df(
    spark: SparkSession,
    index_dir: str,
    text: str,
    max_edits: int = 1,
    num_candidates: int = 5,
    n: int = 5,
) -> DataFrame:
    rows = [
        (s, round(p, 8))
        for s, p in phrase_suggest(
            spark, index_dir, text, max_edits, num_candidates, n
        )
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["suggestion", "score_r"]).astype(
            {"suggestion": "string", "score_r": "float64"}
        )
    )


# ---------------------------------------------------------------------------
# SQL oracle (2-word form; wider inputs are pytest-verified engine-side)

def phrase_suggest_sql(
    path: str,
    text: str,
    max_edits: int = 1,
    num_candidates: int = 5,
    n: int = 5,
) -> str:
    """DuckDB oracle deriving the WHOLE pipeline independently from the
    corpus parquet: analyzer CTEs -> df-ranked levenshtein candidates per
    position -> bigram/unigram counts -> Stupid Backoff product.  Returns
    (suggestion VARCHAR, score_r DOUBLE)."""
    from .sqloracle import _base_ctes

    words = tokenize(text)
    if len(words) != 2:
        raise NotImplementedError("SQL oracle renders the 2-word form")
    w0 = words[0].replace("'", "''")
    w1 = words[1].replace("'", "''")
    return f"""WITH RECURSIVE {_base_ctes(path)},
uni AS (SELECT term, count(*) AS ttf FROM tok GROUP BY term),
total AS (SELECT CAST(sum(ttf) AS DOUBLE) AS t FROM uni),
vocab AS (SELECT term, count(DISTINCT docid) AS df FROM tok GROUP BY term),
big AS (
  SELECT a.term AS w1, b.term AS w2, count(*) AS cnt
  FROM tok a JOIN tok b ON a.docid = b.docid AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
c0 AS (SELECT term FROM vocab
       WHERE abs(length(term) - {len(words[0])}) <= {max_edits}
         AND levenshtein(term, '{w0}') <= {max_edits}
       ORDER BY df DESC, term ASC LIMIT {num_candidates}),
c1 AS (SELECT term FROM vocab
       WHERE abs(length(term) - {len(words[1])}) <= {max_edits}
         AND levenshtein(term, '{w1}') <= {max_edits}
       ORDER BY df DESC, term ASC LIMIT {num_candidates}),
seqs AS (
  SELECT c0.term AS t0, c1.term AS t1,
         (SELECT CAST(ttf AS DOUBLE) FROM uni WHERE term = c0.term) AS ttf0,
         (SELECT CAST(ttf AS DOUBLE) FROM uni WHERE term = c1.term) AS ttf1,
         (SELECT CAST(cnt AS DOUBLE) FROM big
           WHERE w1 = c0.term AND w2 = c1.term) AS bg
  FROM c0 CROSS JOIN c1
)
SELECT suggestion, score_r FROM (
  SELECT t0 || ' ' || t1 AS suggestion,
         round(CAST(
           (ttf0 / (SELECT t FROM total)) *
           (CASE WHEN bg IS NOT NULL AND bg > 0 THEN bg / ttf0
                 ELSE {BACKOFF!r} * ttf1 / (SELECT t FROM total) END)
         AS DOUBLE), 8) AS score_r
  FROM seqs
  ORDER BY score_r DESC, suggestion ASC
  LIMIT {n}
)"""
