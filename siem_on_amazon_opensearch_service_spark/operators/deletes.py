"""Lucene-style soft deletes: _delete_by_query tombstones, live search,
and merge-time expunge.

The reference manages retention through OpenSearch — ISM policies and
index deletion (`/root/reference/source/lambda/deploy_es/index.py:397`,
`:506-508`) — and delegates the document-level delete machinery to
Lucene: a delete marks liveDocs bits, matches vanish from results
immediately, but postings/doc-values stay on disk and **term statistics
still include deleted docs** until a segment merge physically expunges
them.  This module re-expresses that lifecycle over the bucketed
parquet store:

* ``delete_by_query`` resolves the match set with the percolator's
  index-free column predicate — ONE scan of the docs store, no search
  plan — and appends ``(docid)`` tombstones to ``deletes/``.  The log is
  append-only: a delete costs O(matches) IO no matter how large the
  index is (the liveDocs-bits analogue; postings are never rewritten on
  delete).  Re-deleting the same docs appends nothing.
* ``search_live_df`` answers queries with Lucene PRE-MERGE semantics:
  tombstoned docs drop from results, survivors keep their exact
  undeleted scores because df/idf/avgdl are untouched.  The cold path
  stays PRUNED: a tombstone-blind theta would overshoot the live k-th
  total (the search_after-cursor failure mode), so theta seeds drop
  tombstoned candidates first — a driver-side DuckDB IN-probe of the
  tombstone parquet, O(seed-pool) work at any tombstone volume — after
  which the block sweep's superset argument holds for the live ranking
  unchanged.  The result-set exclusion itself is a distributed
  anti-join placed before collapsing/paging; AQE broadcasts the
  tombstone side while it fits and shuffles past that.
* ``expunge_deletes`` is the physical merge: docs/postings/dict/stats/
  manifest rebuilt from survivors via the same partials->salted-merge
  stages as a fresh build, then swapped in atomically per directory
  and the tombstone log cleared.  Stats drop to survivor counts, so
  BM25 scores shift exactly as a Lucene merge shifts them.  docids are
  NOT renumbered: the stable (conv_id, turn_idx)-rank docid is this
  engine's cross-build contract, so merged stores leave docid HOLES
  (Lucene renumbers per segment; our docid is a logical key, which
  keeps post-merge results join-compatible with every pre-merge
  artifact).  Readers scatter-load docid-indexed arrays
  (``search._docid_indexed``), so holes cost max(docid)+1 filler bytes
  and are never consulted — an expunged docid appears in no postings
  row.

Scale shape: delete is one column-predicate scan + an append; live
search adds one anti-join to the cold plan; expunge is a full rebuild
by design (the explicit off-ingest-path maintenance knob, like
``_forcemerge``) and inherits the build's skew-salted shuffle and
adaptive bucket sizing.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import numpy as np
import pandas as pd

from . import build as _build
from . import segments
from .build import _merge_stage, _partials_stage
from .percolate import compile_predicate, filter_fields, with_tokens
from .search import search_df
from . import sqloracle as _so
from ..plans.query import Or, Term, parse

DELETES_SUBDIR = "deletes"
SWAP_MARKER = "_xp_swap.json"

#: gates for the decode-side partials rebuild (expunge): tombstones ship
#: as a broadcast sorted int64 array (8 B each — same cap as the warm
#: live-search tombstone broadcast) and norms as a docid-indexed uint8
#: array (1 B per docid-space slot).  Past either cap expunge falls back
#: to the tokenize-from-survivors rebuild, which has no broadcast at all.
EXPUNGE_DECODE_DELS_CAP = 10_000_000
EXPUNGE_DECODE_NORMS_CAP = 200_000_000

# swap order matters for the marker-less window: partials BEFORE docs,
# so "new docs + stale partials" — the state where a later
# _refresh_postings_dict_full would rebuild postings from pre-expunge
# partials and resurrect deleted docs — cannot occur.  The inverse
# intermediate (new survivor-only partials + old docs) is benign: the
# tombstone log is cleared last, so live search still excludes the
# deleted docs, and a postings refresh from survivor partials simply
# completes the expunge early.
_SWAP_ORDER = ("partials", "postings", "dict", "stats", "manifest", "docs")


def _deletes_path(index_dir: str) -> str:
    return os.path.join(index_dir, DELETES_SUBDIR)


def complete_expunge_swap(index_dir: str) -> bool:
    """Finish (roll forward) an expunge whose swap was interrupted.

    ``expunge_deletes`` writes every rebuilt store to ``<name>_xp``
    BEFORE creating the ``_xp_swap.json`` marker, so once the marker
    exists the swap can always complete: any store whose ``_xp`` sibling
    still exists is swapped in, the tombstone log is cleared, and the
    marker is removed.  Idempotent; returns True if a swap was pending.
    Called from the tombstone read path (``has_deletes``), from
    ``expunge_deletes`` itself, and from streaming crash recovery —
    so no reader ever observes a half-swapped index across the stores
    it consults together."""
    marker = os.path.join(index_dir, SWAP_MARKER)
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        pending = json.load(f)["stores"]
    for name in pending:
        tp = os.path.join(index_dir, name + "_xp")
        if os.path.isdir(tp):
            live = os.path.join(index_dir, name)
            shutil.rmtree(live, ignore_errors=True)
            os.replace(tp, live)
            open(os.path.join(live, "_SUCCESS"), "a").close()
    shutil.rmtree(_deletes_path(index_dir), ignore_errors=True)
    os.remove(marker)
    return True


def has_deletes(index_dir: str) -> bool:
    # roll an interrupted expunge swap forward before trusting the log:
    # a pre-crash tombstone file must not be read against post-swap stores
    complete_expunge_swap(index_dir)
    p = _deletes_path(index_dir)
    if not os.path.isdir(p):
        return False
    return any(f.endswith(".parquet") for f in os.listdir(p))


def deleted_docids(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The tombstone set as DataFrame(docid), deduplicated; None when the
    index has no tombstones."""
    if not has_deletes(index_dir):
        return None
    return spark.read.parquet(_deletes_path(index_dir)).select("docid").distinct()


def delete_by_query(spark: SparkSession, index_dir: str, query: str) -> dict:
    """OpenSearch ``_delete_by_query``: append tombstones for every doc
    matching the DQL ``query``.

    Match semantics are the percolator's index-free column predicate
    (``percolate.compile_predicate`` — match-set-identical to the index
    path for every supported shape; spans/intervals refuse loudly
    there), evaluated in ONE scan of the docs store.  Pure-negative
    queries (``NOT error``) are VALID here, unlike ``search_df``:
    deletion is filter context over a scan, so the complement needs no
    postings lookup — the same reason OpenSearch accepts bool/must_not
    in ``_delete_by_query``.  Only docids not already tombstoned are
    appended, so repeated deletes are byte-level no-ops.  Returns
    ``{"deleted": new, "total_tombstones": all}``.

    r6 EXECUTION change (semantics unchanged): the match set resolves
    from the POSTINGS (``match_docids_df`` — O(Σ df) postings decode)
    instead of tokenizing the whole docs text, for every shape the
    posting algebra covers; docs text and postings cannot diverge (text
    updates are refused — ``updates.py``), so the sets are identical
    (tested per shape).  ``compile_predicate`` still runs FIRST so the
    percolator's loud refusals (spans/intervals) refuse exactly as
    before, and shapes the algebra rejects (pure-negative, NOT outside
    AND) keep the one-scan predicate path."""
    pred = compile_predicate(query, index_dir)
    matches = None
    try:
        from .search import match_docids_df

        matches = match_docids_df(spark, index_dir, query).select("docid")
    except (ValueError, TypeError, NotImplementedError):
        matches = None
    if matches is None:
        fields = filter_fields(query)
        cols = ["docid"] + [f for f in ("role", "tool", "ts") if f in fields] + ["text"]
        docs = with_tokens(
            spark.read.parquet(os.path.join(index_dir, "docs")).select(*cols)
        )
        matches = docs.filter(
            pred(F.col("__toks"), F.col("role"), F.col("tool"), F.col("ts"))
        ).select("docid")
    existing = deleted_docids(spark, index_dir)
    # count BEFORE the append: the tombstone relation is a lazy dir scan,
    # so counting it after the write would see the new files too
    n_existing = 0 if existing is None else existing.count()
    new = matches if existing is None else matches.join(existing, "docid", "left_anti")
    new = new.persist()
    try:
        n_new = new.count()
        if n_new:
            new.write.mode("append").parquet(_deletes_path(index_dir))
    finally:
        new.unpersist()
    return {"deleted": n_new, "total_tombstones": n_existing + n_new}


def search_live_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int | None = 10,
    session=None,
    **filt,
) -> DataFrame:
    """Tombstone-aware BM25 top-k (Lucene pre-merge semantics): deleted
    docs are excluded from results, surviving docs keep their exact
    undeleted scores (stats untouched until ``expunge_deletes``).

    With no tombstones this IS ``search_df``.  With tombstones the cold
    path STAYS PRUNED: theta seeds drop tombstoned candidates (a
    driver-side IN-probe of the tombstone parquet, O(seed-pool) work),
    so theta lower-bounds the LIVE k-th total and the block sweep stays
    exact; the tombstone anti-join runs before paging inside the plan.
    ``session`` routes through a warm QuerySession: the same pruned +
    anti-join plan over the session's pinned postings/stats (the
    shard-local warm plan gates itself off under exclusions — its
    per-partition top-k would run before the anti-join — and falls back
    to the decode+join shape, still warm).

    r6: the COLD path now ships the tombstone log as the same broadcast
    sorted int64 array the warm session builds (r5), so multi-clause
    live queries keep the fused shard-local plan — the generator drops
    tombstoned candidates before its per-partition top-k instead of
    falling back to the decode+join+anti-join shape.  Past
    EXCLUDE_BROADCAST_CAP the broadcast is skipped and the anti-join
    plan engages exactly as before."""
    dels = deleted_docids(spark, index_dir)
    if dels is None:
        if session is not None:
            return session.search(query, k=k, **filt)
        return search_df(spark, index_dir, query, k=k, **filt)
    if session is not None:
        return session.search(
            query, k=k, _exclude_dir=_deletes_path(index_dir), **filt
        )
    from .search import EXCLUDE_BROADCAST_CAP, _load_tombstone_array

    arr = _load_tombstone_array(_deletes_path(index_dir))
    bc = (
        spark.sparkContext.broadcast(arr)
        if arr.size <= EXCLUDE_BROADCAST_CAP
        else None
    )
    return search_df(
        spark, index_dir, query, k=k, _exclude_dir=_deletes_path(index_dir),
        _exclude_bc=bc, **filt,
    )


def _survivor_partials(
    spark: SparkSession,
    index_dir: str,
    dels: DataFrame,
    params: dict,
    survivors: DataFrame,
    positions: bool,
    n_salts: int,
) -> DataFrame:
    """Survivor-only partials for expunge, WITHOUT re-tokenizing.

    The live partials already hold every surviving posting in encoded
    form, so the rebuild decodes each per-(term, shard) row, drops the
    tombstoned docids, and re-assembles the surviving entry streams with
    the same ``segments.assemble_segment_rows`` the tokenize path uses —
    byte-identical rows (identity-tested), one pass over compressed
    postings instead of a docs-text shuffle + tokenize + explode +
    factorize over the whole corpus (guide §2.3: move keys and encoded
    bytes, not payloads).  Rows of shards with NO deletions pass through
    untouched.  Norms come from a broadcast docid-indexed uint8 array
    (norms are dl-only, unchanged for survivors); tombstones from a
    broadcast sorted int64 array.  Past either broadcast cap, or on a
    pre-r2 index without a partials store, falls back to the tokenize
    rebuild from the survivor docs."""
    import duckdb

    partials_path = os.path.join(index_dir, "partials")
    del_arr = np.sort(
        np.array([r["docid"] for r in dels.collect()], dtype=np.int64)
    ) if dels is not None else np.empty(0, dtype=np.int64)
    total_docs = int(params["total_docs"])
    if (
        not os.path.isdir(partials_path)
        or del_arr.size > EXPUNGE_DECODE_DELS_CAP
        or total_docs > EXPUNGE_DECODE_NORMS_CAP
    ):
        return _partials_stage(survivors, positions, n_salts), False
    nd = duckdb.sql(
        f"SELECT docid, norm FROM read_parquet('{index_dir}/docs/*.parquet')"
    ).df()
    norms = np.zeros(total_docs, dtype=np.uint8)
    norms[nd["docid"].to_numpy()] = nd["norm"].to_numpy().astype(np.uint8)
    sc = spark.sparkContext
    dels_bc = sc.broadcast(del_arr)
    norms_bc = sc.broadcast(norms)
    shard_size = int(params["shard_size"])
    seg_cols = [c.split()[0] for c in segments.SEGMENT_SCHEMA.split(", ")]

    from ..functions import varint

    def filt(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf[seg_cols]
            sdels = dels_bc.value
            frames = []
            shards = pdf["shard_min"].to_numpy()
            terms_col_v = pdf["term"].to_numpy(dtype=object)
            docs_col = pdf["docs_bytes"].to_numpy(dtype=object)
            tfs_col = pdf["tfs_bytes"].to_numpy(dtype=object)
            pos_col = pdf["pos_bytes"].to_numpy(dtype=object) if positions else None
            blkn_col = pdf["blk_n"].to_numpy(dtype=object)
            df_col = pdf["df"].to_numpy(dtype=np.int64)
            for shard in np.unique(shards):
                lo = int(shard) * shard_size
                hi = lo + shard_size - 1
                a = np.searchsorted(sdels, lo)
                b = np.searchsorted(sdels, hi, side="right")
                sdel = sdels[a:b]
                rows_idx = np.nonzero(shards == shard)[0]
                if sdel.size == 0:
                    frames.append(pdf.iloc[rows_idx])
                    continue
                # whole-shard batch decode: ONE varint pass per stream
                # (a per-row decode loop measured ~1.5x SLOWER than the
                # tokenize rebuild it was meant to replace — the per-row
                # numpy overhead over a 500k-row sf1 vocabulary)
                dbuf = b"".join(bytes(x) for x in docs_col[rows_idx])
                tbuf = b"".join(bytes(x) for x in tfs_col[rows_idx])
                blkn = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in blkn_col[rows_idx]]
                )
                gaps = varint.decode(dbuf).astype(np.int64)
                e_doc_all = segments._segmented_cumsum(gaps, blkn)
                e_tf_all = varint.decode(tbuf).astype(np.int64)
                row_sizes = df_col[rows_idx]
                row_off = np.concatenate(([0], np.cumsum(row_sizes)))
                idx = np.searchsorted(sdel, e_doc_all)
                hit = (idx < sdel.size) & (
                    sdel[np.minimum(idx, sdel.size - 1)] == e_doc_all
                )
                hits_per_row = np.add.reduceat(
                    hit.astype(np.int64), row_off[:-1]
                )
                untouched = rows_idx[hits_per_row == 0]
                if untouched.size:
                    frames.append(pdf.iloc[untouched])
                touched = np.nonzero(hits_per_row > 0)[0]
                if not touched.size:
                    continue
                kept_sizes = (row_sizes - hits_per_row)[touched]
                live = kept_sizes > 0
                row_is_touched = np.zeros(rows_idx.size, dtype=bool)
                row_is_touched[touched] = True
                ent_row = np.repeat(
                    np.arange(rows_idx.size, dtype=np.int64), row_sizes
                )
                m = (~hit) & row_is_touched[ent_row]
                if not m.any():
                    continue  # every touched term vanished from this shard
                e_doc = e_doc_all[m]
                e_tf = e_tf_all[m]
                pos_flat = None
                if positions:
                    pbuf = b"".join(bytes(x) for x in pos_col[rows_idx])
                    pgaps = varint.decode(pbuf).astype(np.int64)
                    pos_all = segments._segmented_cumsum(pgaps, e_tf_all)
                    pos_flat = pos_all[np.repeat(m, e_tf_all)]
                frames.append(
                    segments.assemble_segment_rows(
                        int(shard), n_salts,
                        terms_col_v[rows_idx][touched][live],
                        kept_sizes[live].astype(np.int64),
                        e_doc,
                        e_tf,
                        norms_bc.value[e_doc],
                        pos_flat,
                        positions,
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)[seg_cols]

    # True: the caller can skip its (term, salt) repartition — a full
    # shuffle of the partials bytes that buys nothing on this path (no
    # partials consumer needs term clustering: the postings merge always
    # re-shuffles by (bucket, salt), and this decode streams row-at-a-time
    # whatever the file clustering — since r6b the build writes partials
    # shard-clustered for the same reason)
    src = spark.read.parquet(partials_path)
    # scale-adaptive spread: the direct partials write emits ~one file per
    # encode task (= shard group), so at small scale the scan has fewer
    # splits than cores and would cap this decode's parallelism (measured
    # +~1 s on the sf0.1 expunge bar).  The keyless spread costs one
    # exchange of the partials bytes exactly when they are small, and
    # never fires at scale, where row groups >> cores.
    par = sc.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(filt, schema=segments.SEGMENT_SCHEMA), True


def expunge_deletes(spark: SparkSession, index_dir: str) -> dict:
    """The physical merge (``_forcemerge`` with ``only_expunge_deletes``):
    rebuild docs/postings/dict/stats/manifest from surviving docs,
    swap each store atomically, clear the tombstone log.

    docids survive unchanged (stable-logical-key contract; see module
    docstring), so the docs store keeps its docid->shard map
    (``shard = docid // shard_size``) and every shard-ranged reader
    works untouched.  Returns survivor/expunged counts and the
    recomputed stats."""
    complete_expunge_swap(index_dir)  # roll forward an interrupted swap
    with open(os.path.join(index_dir, "_build.json")) as f:
        params = json.load(f)
    dels = deleted_docids(spark, index_dir)
    if dels is None:
        st = spark.read.parquet(os.path.join(index_dir, "stats")).collect()[0]
        return {"expunged": 0, "n_docs": st["n_docs"], "doc_count": st["doc_count"]}
    n_salts = params["n_salts"]
    positions = params["positions"]
    nb = params.get("postings_buckets", 0)
    # the pre-expunge LIVE count comes from the stats store: a second
    # delete->expunge cycle would otherwise re-count the first cycle's
    # holes (total_docs never shrinks) and over-report 'expunged'
    n_before = int(
        spark.read.parquet(os.path.join(index_dir, "stats")).collect()[0]["n_docs"]
    )

    docs_path = os.path.join(index_dir, "docs")
    docs = spark.read.parquet(docs_path)
    survivors = docs.join(dels, "docid", "left_anti")

    # every derived store is written to a tmp sibling BEFORE any swap, so
    # a crash mid-compute leaves the live index untouched (the swap
    # window itself is the same per-dir exposure force_merge has).
    # partials are REWRITTEN from survivors, not dropped: they are the
    # canonical re-derivation source — streaming crash recovery
    # (incremental.recover_orphans -> _refresh_postings_dict_full) and
    # build resume both rebuild postings from ALL partials, so stale or
    # missing partials after an expunge would resurrect deleted docs or
    # silently drop the corpus on the next recovery.
    tmp = {name: os.path.join(index_dir, name + "_xp") for name in _SWAP_ORDER}
    for p in tmp.values():
        shutil.rmtree(p, ignore_errors=True)

    # r6: NO repartitionByRange here — the live docs store is already
    # docid-range-partitioned and sorted (build writes it that way;
    # appends add disjoint higher ranges), and dropping rows preserves
    # that layout.  The range shuffle moved the whole text payload AND
    # ran the anti-join subtree twice (repartitionByRange samples its
    # input).  sortWithinPartitions keeps in-file docid order when the
    # scan packs multiple small files into one task.
    (
        survivors.sortWithinPartitions("docid")
        .write.mode("overwrite")
        .parquet(tmp["docs"])
    )
    survivors = spark.read.parquet(tmp["docs"])

    seg, prepartitioned = _survivor_partials(
        spark, index_dir, dels, params, survivors, positions, n_salts
    )
    wp = max(8, spark.sparkContext.defaultParallelism)
    if not prepartitioned:
        seg = seg.repartition(wp, "term", "salt")
    seg.write.mode("overwrite").parquet(tmp["partials"])
    merged = _merge_stage(spark.read.parquet(tmp["partials"]), wp, n_buckets=nb or None,
                          max_bytes=params.get("max_segment_bytes"))
    if nb:
        _build.write_postings_bucketed(merged, tmp["postings"], nb)
    else:
        (
            merged.sortWithinPartitions("term", "salt", "shard_min")
            .write.mode("overwrite")
            .parquet(tmp["postings"])
        )
    post = spark.read.parquet(tmp["postings"])
    agg = post.groupBy("term").agg(F.sum("df").alias("df"), F.sum("cttf").alias("cttf"))
    if nb:
        _build.write_dict_bucketed(agg, tmp["dict"], nb)
    else:
        ndp = max(1, spark.sparkContext.defaultParallelism // 4)
        (
            agg.repartitionByRange(ndp, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(tmp["dict"])
        )
    manifest = (
        survivors.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("n_tokens"),
            F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_nonempty"),
            F.min("docid").alias("min_docid"),
            F.max("docid").alias("max_docid"),
        )
        .withColumn("status", F.lit("complete"))
    )
    manifest.write.mode("overwrite").parquet(tmp["manifest"])
    (
        spark.read.parquet(tmp["manifest"])
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_nonempty").alias("doc_count"),
            F.sum("n_tokens").alias("sum_dl"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp["stats"])
    )

    st = spark.read.parquet(tmp["stats"]).collect()[0]
    # every _xp store is fully written: the marker makes the swap
    # roll-forward-able from any crash point (complete_expunge_swap);
    # _SWAP_ORDER (partials before docs) keeps even the marker-less
    # window free of the stale-partials-with-new-docs hazard
    marker = os.path.join(index_dir, SWAP_MARKER)
    with open(marker + ".tmp", "w") as f:
        json.dump({"stores": list(_SWAP_ORDER)}, f)
    os.replace(marker + ".tmp", marker)
    for name in _SWAP_ORDER:
        live = os.path.join(index_dir, name)
        shutil.rmtree(live, ignore_errors=True)
        os.replace(tmp[name], live)
        open(os.path.join(live, "_SUCCESS"), "a").close()
    shutil.rmtree(_deletes_path(index_dir), ignore_errors=True)
    os.remove(marker)
    return {
        "expunged": n_before - int(st["n_docs"]),
        "n_docs": int(st["n_docs"]),
        "doc_count": int(st["doc_count"]),
        "sum_dl": int(st["sum_dl"]),
    }


# ---------------------------------------------------------------------------
# DuckDB oracles


def _delete_terms(delete_query: str) -> list[str]:
    """The SQL-renderable delete shapes: a single term or a flat OR of
    terms (token-membership semantics — exactly the percolator predicate
    for those shapes).  Richer delete queries work engine-side; their
    oracles would need the full leaf-CTE machinery."""
    ast = parse(delete_query)
    if isinstance(ast, Term):
        return [ast.term]
    if isinstance(ast, Or) and all(isinstance(c, Term) for c in ast.children):
        return [c.term for c in ast.children]
    raise ValueError(
        "oracle supports delete queries that are a term or a flat OR of "
        f"terms, got {delete_query!r}"
    )


def live_bm25_sql(path: str, query: str, delete_query: str, k: int = 10) -> str:
    """Oracle for ``search_live_df`` PRE-merge: full-corpus stats (deleted
    docs still count in df/idf/avgdl), tombstoned docids filtered from
    the final page."""
    ast, dqlf = _so.extract_filters(_so.parse(query), query)
    filt = _so.merge_filters(query, {}, dqlf)
    leaves: list = []

    def collect(n) -> None:
        if isinstance(n, _so.LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (_so.And, _so.Or, _so.AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, _so.Not):
            collect(n.child)

    collect(ast)
    fsql = _so._filters_sql(filt)
    inlist = ", ".join(_so._q(t) for t in _delete_terms(delete_query))
    anti = (
        f"{' AND' if fsql else ' WHERE'} "
        f"c.docid NOT IN (SELECT docid FROM delset)"
    )
    return f"""WITH RECURSIVE {_so._base_ctes(path)},
delset AS (SELECT DISTINCT docid FROM tok WHERE term IN ({inlist})),
{_so._leaf_ctes(leaves)},
combined AS ({_so._combine_sql(ast, leaves)})
SELECT docid, round(CAST(s AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid, c.s
  FROM combined c JOIN d USING (docid){fsql}{anti}
  ORDER BY c.s DESC, c.docid ASC
  LIMIT {k}
)"""


def expunged_bm25_sql(path: str, query: str, delete_query: str, k: int = 10) -> str:
    """Oracle for a search on the EXPUNGED index: docids keep their
    full-corpus rank, but tok0/dl/stats/dln/tok — everything scoring
    reads — are survivor-scoped, so df/idf/avgdl drop exactly as the
    merge drops them.  Mirrors ``sqloracle._base_ctes`` with the corpus
    CTEs forked before/after the delete set."""
    ast, dqlf = _so.extract_filters(_so.parse(query), query)
    filt = _so.merge_filters(query, {}, dqlf)
    leaves: list = []

    def collect(n) -> None:
        if isinstance(n, _so.LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (_so.And, _so.Or, _so.AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, _so.Not):
            collect(n.child)

    collect(ast)
    fsql = _so._filters_sql(filt)
    inlist = ", ".join(_so._q(t) for t in _delete_terms(delete_query))
    trunc = _so.sql_truncate_expr("text")
    base = f"""
raw AS (
  SELECT conv_id, turn_idx, role, tool, ts, {trunc} AS text
  FROM read_parquet('{path}')
),
dfull AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS docid,
         conv_id, turn_idx, role, tool, ts, text
  FROM raw
),
tok0f AS (
  SELECT docid,
         list_filter(string_split_regex(lower(coalesce(text, '')), '{_so.SQL_SPLIT_RE}'),
                     x -> x <> '') AS toks
  FROM dfull
),
delset AS (
  SELECT DISTINCT docid
  FROM (SELECT docid, unnest(toks) AS term FROM tok0f)
  WHERE term IN ({inlist})
),
d AS (SELECT * FROM dfull WHERE docid NOT IN (SELECT docid FROM delset)),
tok0 AS (SELECT * FROM tok0f WHERE docid NOT IN (SELECT docid FROM delset)),
dl AS (SELECT docid, len(toks) AS dl FROM tok0),
stats AS (
  SELECT count(*) FILTER (WHERE dl > 0) AS doc_count,
         CAST(sum(dl) AS DOUBLE) / count(*) FILTER (WHERE dl > 0) AS avgdl
  FROM dl
),
dln AS (SELECT docid, {_so.sql_decode_case('dl')} AS dl_dec FROM dl),
tok AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY pre_pos) - 1 AS pos
  FROM (
    SELECT docid, unnest(toks) AS term, generate_subscripts(toks, 1) AS pre_pos
    FROM tok0
  )
)"""
    return f"""WITH RECURSIVE {base},
{_so._leaf_ctes(leaves)},
combined AS ({_so._combine_sql(ast, leaves)})
SELECT docid, round(CAST(s AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid, c.s
  FROM combined c JOIN d USING (docid){fsql}
  ORDER BY c.s DESC, c.docid ASC
  LIMIT {k}
)"""
