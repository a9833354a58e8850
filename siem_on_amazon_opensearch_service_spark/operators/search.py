"""BM25 query execution over the segment index.

Queries are full DQL (plans/query.py): boolean/phrase plus role:/tool:
keyword filters, field:* exists, ts>=/ts<= ranges, and */? wildcard terms
expanded against the term dictionary.  Three execution paths, all rank-
and score-identical to the frozen oracle (operators/oracle.py — the
Lucene stand-in):

- ``search_df``: distributed, DataFrame-first.  Postings rows for the query
  terms are pruned at the parquet scan (predicate pushdown on the sorted
  ``term`` column), then two driver-side EXACT pruning planners (both
  metadata-only) can restrict the decode to surviving docid ranges:
  theta/block-max for Term/OR queries and required-term coverage
  intersection for conjunctions (rare terms decoded driver-side — the
  drive-by-rarest plan).  On r2-format indexes (a ``_build.json``
  shard_size) cold queries run the SAME fused generators as warm
  sessions (r5 unification): single terms score inside the decode stage
  with per-shard ranged norm reads (zero exchanges), every other shape
  runs ``_shard_local_topk`` over a compressed-bytes repartition — so
  the corpus-sized docs table is never joined, only the matched docids'
  norm slices are read.  The legacy join plan (decode -> docs join for
  norms/filters -> pivot -> boolean column algebra -> global top-k)
  remains for search_after cursors, collapse, k=0, cold live search
  under tombstones, and pre-r2 indexes.  This mirrors the reference's
  scatter/gather across shards (SURVEY.md §3.3) with Spark partitions
  as the shards.

- ``LocalIndex``: driver-side numpy reader (DuckDB parquet scan, no Spark
  job) for query-latency benchmarking, with an exhaustive vectorized
  scorer and block-max WAND top-k over arbitrary And/Or/Not term trees
  (block bounds = max over the stored pareto (tf, norm) impact pairs).

- ``QuerySession`` (warm): pinned per-index state; single terms score in
  a zero-exchange fused decode stage (broadcast norms), every other
  shape runs ``_shard_local_topk`` — one Python stage over a
  compressed-bytes repartition on shard_min, with norms either broadcast
  or (past the broadcast cap) read per shard from the docid-sorted docs
  parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import analysis as _analysis
from ..functions import bm25, varint
from ..plans.query import (
    MAX_CLAUSE_COUNT,
    MULTITERM,
    And,
    AtLeast,
    Fuzzy,
    Intervals,
    MultiPhrase,
    Node,
    Not,
    Or,
    Phrase,
    PhrasePrefix,
    Regexp,
    SpanContaining,
    SpanFirst,
    SpanMulti,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanWithin,
    Term,
    Wildcard,
    apply_minimum_should_match,
    phrase_slots as _slots_of,
    expand_multiterm,
    extract_filters,
    filter_mask,
    filters_active,
    merge_filters,
    parse,
    query_terms,
    regexp_prefix,
    wildcard_regex,
    wildcard_to_like,
)
from ..functions.intervals import (
    EXISTENTIAL_FILTERS as _IV_EXISTENTIAL,
    IAnyOf as _IAnyOf,
    ICombine as _ICombine,
    IFilter as _IFilter,
    ITerm as _ITerm,
    intervals_freqs_flat,
    spec_required_terms as _iv_required_terms,
)
from ..functions.sloppy import sloppy_freqs_flat
from ..functions.spans import (
    span_contain_freqs_flat,
    span_first_freqs_flat,
    span_freqs_flat,
    span_not_freqs_flat,
)
from . import build as _build
from . import segments

#: scoring leaf node types; phrase-like = positional (Phrase, MultiPhrase)
_LEAF = (Term, Phrase, MultiPhrase, SpanNear, SpanOr, SpanFirst, SpanNot,
         SpanContaining, SpanWithin, Intervals)
_PHRASELIKE = (Phrase, MultiPhrase, SpanNear, SpanOr, SpanFirst, SpanNot,
               SpanContaining, SpanWithin, Intervals)

#: elementary intervals per chunk in the chunked WAND walkers (r6b): the
#: running k-th score refreshes once per chunk, so larger chunks trade a
#: slightly staler (always conservative) skip threshold for fewer Python
#: iterations — 128 intervals ≈ one chunk per 16k docs per term.
_WAND_CHUNK = 128


def _leaf_terms(leaf: Node) -> list[str]:
    """Flat term list of a scoring leaf (MultiPhrase slots flattened)."""
    if isinstance(leaf, Term):
        return [leaf.term]
    if isinstance(leaf, (Phrase, SpanNear, SpanOr, SpanContaining, SpanWithin,
                         Intervals)):
        return list(leaf.terms)
    if isinstance(leaf, SpanFirst):
        return [leaf.term]
    if isinstance(leaf, SpanNot):
        return [leaf.include, leaf.exclude]
    return [t for s in leaf.slots for t in s]


def _leaf_slop(leaf: Node) -> int:
    """Phrase slop; MultiPhrase (match_phrase_prefix) is exact-only.
    SpanNear deliberately reports 0 here — its slop drives the span
    kernel (functions/spans.py), dispatched explicitly BEFORE any
    sloppy/adjacency branch reads this value."""
    return leaf.slop if isinstance(leaf, Phrase) else 0


def _postings_buckets(index_dir: str) -> int:
    """postings_buckets from _build.json (0 = legacy flat layout)."""
    import json

    try:
        with open(os.path.join(index_dir, "_build.json")) as f:
            return json.load(f).get("postings_buckets", 0)
    except (OSError, ValueError):
        return 0


def _bucketed_sources(base: str, bucketed: bool, nb: int, terms=None) -> str:
    """DuckDB ``read_parquet(...)`` source expression over a flat or
    term-hash-bucketed parquet directory.  With known terms on the
    bucketed layout, only their crc32 bucket subdirectories are listed —
    the driver-side analogue of the Spark read's partition pruning."""
    if not bucketed:
        return f"read_parquet('{base}/*.parquet')"
    if terms and nb:
        bs = sorted({_build.postings_bucket_py(t, nb) for t in terms})
        bs = [k for k in bs if os.path.isdir(os.path.join(base, f"bucket={k}"))]
        if bs:
            lst = ", ".join(f"'{base}/bucket={k}/*.parquet'" for k in bs)
            return f"read_parquet([{lst}])"
    return f"read_parquet('{base}/bucket=*/*.parquet')"


def _postings_sources(index_dir: str, terms=None) -> str:
    nb = _postings_buckets(index_dir)
    return _bucketed_sources(f"{index_dir}/postings", bool(nb), nb, terms)


def _read_postings_spark(spark, index_dir: str, terms: list[str]) -> DataFrame:
    """Spark-side postings scan for a term set: term predicate pushdown plus
    bucket partition pruning on the bucketed layout (only the terms' crc32
    bucket directories are listed/scanned)."""
    df = spark.read.parquet(os.path.join(index_dir, "postings"))
    nb = _postings_buckets(index_dir)
    if nb and "bucket" in df.columns:
        bs = sorted({_build.postings_bucket_py(t, nb) for t in terms})
        df = df.filter(F.col("bucket").isin(bs))
    return df.filter(F.col("term").isin(terms))


# ---------------------------------------------------------------------------
# shared: flatten the AST into scoring leaves


def _leaves(node: Node) -> list[Node]:
    out: list[Node] = []

    def walk(n: Node) -> None:
        if isinstance(n, _LEAF):
            if n not in out:
                out.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return out


def _positive_leaves(node: Node) -> list[Node]:
    """Leaves reachable through at least one Not-free path.  Only these
    contribute score: the frozen oracle's ``Not`` evaluates to zero
    accumulation (oracle.py _eval), so a term that appears exclusively
    under NOT must not add its BM25 score even when the doc matches via
    another branch (e.g. '(a AND NOT b) OR c' on a doc matching b and c)."""
    out: list[Node] = []

    def walk(n: Node) -> None:
        if isinstance(n, _LEAF):
            if n not in out:
                out.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c)
        # Not: do not descend — its subtree never contributes score

    walk(node)
    return out


def _positive_multiplicity(node: Node) -> dict[Node, float]:
    """Not-free score weight per leaf.  Lucene scores each bool clause
    independently, so a leaf appearing twice on positive paths contributes
    its score TWICE (the frozen oracle's per-occurrence _eval reproduces
    this), and a query-time boost multiplies the clause's contribution —
    each occurrence adds its ``boost``.  Deduped execution paths must
    weight by this value."""
    counts: dict[Node, float] = {}

    def walk(n: Node) -> None:
        if isinstance(n, _LEAF):
            counts[n] = counts.get(n, 0.0) + n.boost
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c)

    walk(node)
    return counts


def _covered_by_positive(node: Node) -> bool:
    """True iff every matching doc must match >=1 positive-path leaf.
    The distributed path builds candidates from postings rows only, so
    queries whose match set includes docs matching NO positive clause
    (pure 'NOT a', 'a OR NOT b') cannot be answered from postings alone."""
    if isinstance(node, _LEAF):
        return True
    if isinstance(node, And):
        return any(_covered_by_positive(c) for c in node.children)
    if isinstance(node, (Or, AtLeast)):
        return all(_covered_by_positive(c) for c in node.children)
    if isinstance(node, Not):
        return False
    raise TypeError(node)


def _require_positive_coverage(ast: Node, where: str) -> None:
    if not _covered_by_positive(ast):
        raise ValueError(
            f"{where} supports NOT only where every match still requires a "
            "positive term (e.g. 'a AND NOT b'); pure-negative / OR-NOT "
            "queries need a full docs scan — use LocalIndex.search"
        )


def _load_stats(index_dir: str) -> dict:
    import duckdb

    row = duckdb.sql(
        f"SELECT * FROM read_parquet('{index_dir}/stats/*.parquet')"
    ).fetchone()
    n_docs, doc_count, sum_dl = int(row[0]), int(row[1]), int(row[2])
    return {
        "n_docs": n_docs,
        "doc_count": doc_count,
        "sum_dl": sum_dl,
        "avgdl": sum_dl / doc_count if doc_count else 0.0,
    }


def _dict_sources(index_dir: str, terms=None) -> str:
    """Term-dictionary source (flat legacy, or dict/bucket=K/ sharing the
    postings' crc32 bucket) — bucket detection is by directory layout
    because legacy indexes carry postings_buckets without a bucketed
    dict."""
    base = f"{index_dir}/dict"
    bucketed = any(
        e.startswith("bucket=") for e in (os.listdir(base) if os.path.isdir(base) else ())
    )
    return _bucketed_sources(base, bucketed, _postings_buckets(index_dir), terms)


def _load_dfs(index_dir: str, terms: list[str]) -> dict[str, int]:
    import duckdb

    if not terms:
        return {}
    tl = ",".join("'" + t.replace("'", "''") + "'" for t in terms)
    rows = duckdb.sql(
        f"SELECT term, df FROM {_dict_sources(index_dir, terms)} WHERE term IN ({tl})"
    ).fetchall()
    return {t: int(d) for t, d in rows}


def _expand_leaf(index_dir: str, leaf) -> list[str]:
    """Dictionary expansion of a multi-term leaf: matching terms, sorted
    ascending.

    Wildcard: a literal prefix adds a range predicate so the parquet
    zonemaps prune row groups (the dict is term-sorted within files) — the
    scan reads O(matching dictionary region), the Lucene terms-enum seek
    analogue, not O(vocabulary).

    Fuzzy: ``levenshtein(term, q) <= e`` with a length-band prefilter
    (``abs(len - len(q)) <= e``) so the quadratic distance only runs on
    length-plausible terms.  Prefix-free fuzzy reads the whole dictionary
    — exactly Lucene's prefixLength=0 default, where the Levenshtein
    automaton walks the full term FST; the dictionary is tiny relative to
    postings (distinct terms, bucketed parquet) and expansions are
    memoized per session, so this is a per-novel-pattern cost, not a
    per-query one."""
    import duckdb

    if isinstance(leaf, PhrasePrefix):
        # match_phrase_prefix: the LAST word's prefix range scan, first
        # max_expansions terms in dictionary order (Lucene truncates —
        # no maxClauseCount error).  The SQL oracle mirrors this exact
        # predicate + ORDER BY term LIMIT over the corpus term set.
        pfx = leaf.terms[-1]
        lo = pfx.replace("'", "''")
        hi = (pfx[:-1] + chr(ord(pfx[-1]) + 1)).replace("'", "''")
        rows = duckdb.sql(
            f"SELECT term FROM {_dict_sources(index_dir)} "
            f"WHERE term >= '{lo}' AND term < '{hi}' "
            f"ORDER BY term LIMIT {int(leaf.max_expansions)}"
        ).fetchall()
        return [r[0] for r in rows]
    if isinstance(leaf, Fuzzy):
        q = leaf.term.replace("'", "''")
        e = int(leaf.max_edits)
        rows = duckdb.sql(
            f"SELECT term FROM {_dict_sources(index_dir)} "
            f"WHERE abs(length(term) - {len(leaf.term)}) <= {e} "
            f"AND levenshtein(term, '{q}') <= {e} ORDER BY term"
        ).fetchall()
        return [r[0] for r in rows]
    if isinstance(leaf, Regexp):
        # anchored full-term match (Lucene RegexpQuery semantics); the
        # grammar restricts patterns to the RE2/Python-re common core so
        # this DuckDB (RE2) scan and the oracle's Python re agree.  A
        # literal pattern prefix adds the same zonemap range predicate
        # wildcards get.
        pat_sql = leaf.pattern.replace("'", "''")
        conds_r = [f"regexp_full_match(term, '{pat_sql}')"]
        pre = regexp_prefix(leaf.pattern)
        if pre:
            p = pre.replace("'", "''")
            hi = (pre[:-1] + chr(ord(pre[-1]) + 1)).replace("'", "''")
            conds_r.append(f"term >= '{p}' AND term < '{hi}'")
        rows = duckdb.sql(
            f"SELECT term FROM {_dict_sources(index_dir)} "
            f"WHERE {' AND '.join(conds_r)} ORDER BY term"
        ).fetchall()
        return [r[0] for r in rows]
    like, prefix = wildcard_to_like(leaf.pattern)
    like_sql = like.replace("'", "''")
    conds = [f"term LIKE '{like_sql}' ESCAPE '\\'"]
    if prefix:
        p = prefix.replace("'", "''")
        # upper bound: prefix with last char bumped (ASCII token alphabet)
        hi = (prefix[:-1] + chr(ord(prefix[-1]) + 1)).replace("'", "''")
        conds.append(f"term >= '{p}' AND term < '{hi}'")
    rows = duckdb.sql(
        f"SELECT term FROM {_dict_sources(index_dir)} WHERE {' AND '.join(conds)} ORDER BY term"
    ).fetchall()
    return [r[0] for r in rows]


def _order_page(df: DataFrame, k: int | None, search_after: tuple | None) -> DataFrame:
    """Final (score desc, docid asc) page: with a ``search_after`` cursor
    (the OpenSearch deep-pagination API — (score, docid) of the previous
    page's last hit) only strictly-later rows survive, so concatenated
    pages tile the full ranking without a growing offset.

    ``k=None`` returns the ENTIRE scored match set, unordered — the
    building block for score-rewriting wrappers (function_score decay,
    rescore) that re-rank downstream and would waste a full sort here."""
    if search_after is not None:
        s, d = float(search_after[0]), int(search_after[1])
        df = df.filter(
            (F.col("score") < F.lit(s))
            | ((F.col("score") == F.lit(s)) & (F.col("docid") > F.lit(d)))
        )
    if k is None:
        return df
    return df.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def _docs_filter_conditions(filt: dict) -> list:
    """Spark Column predicates for the keyword/time filter dict — the
    DataFrame rendering of plans.query.filter_mask (same Lucene
    filter/must_not semantics: exclusion keeps missing-field docs, so the
    NOT-IN condition ORs an isNull; is-one-of renders as isin)."""
    conds = []
    for fld in ("role", "tool"):
        v = filt.get(fld)
        if v is not None:
            if isinstance(v, (tuple, list)):
                conds.append(F.col(fld).isin(list(v)))
            else:
                conds.append(F.col(fld) == v)
        nv = filt.get(f"{fld}_not")
        if nv:
            conds.append(F.col(fld).isNull() | ~F.col(fld).isin(list(nv)))
        if filt.get(f"{fld}_exists"):
            conds.append(F.col(fld).isNotNull())
        if filt.get(f"{fld}_not_exists"):
            conds.append(F.col(fld).isNull())
    if filt.get("ts_min") is not None:
        conds.append(F.col("ts") >= filt["ts_min"])
    if filt.get("ts_max") is not None:
        conds.append(F.col("ts") <= filt["ts_max"])
    return conds


def _has_multiterm(node: Node) -> bool:
    if isinstance(node, (SpanMulti,) + MULTITERM):
        return True
    if isinstance(node, (And, Or, AtLeast)):
        return any(_has_multiterm(c) for c in node.children)
    if isinstance(node, Not):
        return _has_multiterm(node.child)
    return False


def _check_positions(index_dir: str, leaves: list[Node]) -> None:
    """Phrase queries need positional postings; fail loudly (not silently
    empty) on an index built with positions=False (positions are optional
    per SURVEY.md §7 — they cost ~2-3x index size)."""
    if not any(isinstance(lf, _PHRASELIKE) for lf in leaves):
        return
    import json

    try:
        with open(os.path.join(index_dir, "_build.json")) as f:
            params = json.load(f)
    except OSError:
        return
    if not params.get("positions", True):
        raise ValueError(
            "phrase query requires positional postings; this index was built "
            "with positions=False"
        )


def _clause_weights(leaves: list[Node], dfs: dict[str, int], doc_count: int) -> list[np.float32]:
    out = []
    for leaf in leaves:
        if isinstance(leaf, (MultiPhrase, SpanOr)):
            # match_phrase_prefix / span_or: grouped per-slot association
            # (see bm25.grouped_weight / the SQL oracle's ordered fold)
            out.append(bm25.grouped_weight(
                [[dfs.get(t, 0) for t in s] for s in leaf.slots], doc_count))
            continue
        if isinstance(leaf, SpanFirst):
            # SpanWeight uses the term's FULL collection df, not the
            # position-filtered match count
            ts = [leaf.term]
        elif isinstance(leaf, SpanNot):
            # the exclude term contributes no idf (SpanNotQuery weights
            # only the include span)
            ts = [leaf.include]
        else:
            ts = [leaf.term] if isinstance(leaf, Term) else list(leaf.terms)
        out.append(bm25.clause_weight([dfs.get(t, 0) for t in ts], doc_count))
    return out


# ---------------------------------------------------------------------------
# distributed path

_DECODE_SCHEMA = "clause int, slot int, docid long, tf long, pos array<long>"

_PRUNE_MAX_BLOCKS = 200_000  # driver metadata budget for prune planning
_PRUNE_MIN_DROP = 0.10  # skip pruning unless >=10% of the doc space drops
_RARE_DECODE_BUDGET = 100_000  # max SUMMED df the planner may decode driver-side

# conjunction ('hot AND hot') theta-seeding budgets: bounded driver work
_CONJ_MAX_CAND = 4096         # candidate docids verified per plan
_CONJ_SEED_BLOCKS = 64        # blocks of the rarest required term decoded
_CONJ_MAX_VERIFY_BLOCKS = 4096  # membership blocks across all other terms


def _eval_membership(node: Node, has: dict) -> bool:
    """Boolean ast evaluation from exact term-membership facts."""
    if isinstance(node, Term):
        return bool(has.get(node.term))
    if isinstance(node, And):
        return all(_eval_membership(c, has) for c in node.children)
    if isinstance(node, Or):
        return any(_eval_membership(c, has) for c in node.children)
    if isinstance(node, AtLeast):
        return sum(_eval_membership(c, has) for c in node.children) >= node.m
    if isinstance(node, Not):
        return not _eval_membership(node.child, has)
    raise TypeError(node)


def _fetch_row_bytes(index_dir: str, r: dict):
    import duckdb

    term_sql = str(r["term"]).replace("'", "''")
    return duckdb.sql(
        f"SELECT docs_bytes, tfs_bytes FROM {_postings_sources(index_dir, [r['term']])} "
        f"WHERE term = '{term_sql}' AND salt = {int(r['salt'])} AND shard_min = {int(r['shard_min'])}"
    ).fetchone()


def _tombstoned_among(exclude_dir: str, docids: np.ndarray) -> set:
    """Tombstoned members of a candidate docid pool: a driver-side DuckDB
    IN-probe of the tombstone parquet — O(pool) work however large the
    tombstone log grows (the pool is seed-sized, a few thousand ids)."""
    import duckdb

    if not docids.size:
        return set()
    idl = ",".join(str(int(d)) for d in np.unique(docids))
    rows = duckdb.sql(
        f"SELECT DISTINCT docid FROM read_parquet('{exclude_dir}/*.parquet') "
        f"WHERE docid IN ({idl})"
    ).fetchall()
    return {int(r[0]) for r in rows}


def _conj_seed_totals(index_dir, ast, leaves, rows, rare_maps, weights, mult, dfs, cache, k, filters,
                      exclude_dir=None):
    """EXACT theta seeds for trees with no sufficient term (the 'hot AND
    hot' conjunction the suff-seed path cannot serve): candidates are the
    rarest REQUIRED term's entries (its full rare decode, or its
    highest-max-tf blocks), every leaf term's tf at the candidates is
    resolved exactly — rare terms from their full driver decode, hot
    terms by decoding ONLY the blocks whose [first, last] covers a
    candidate (ranged fetches) — the boolean ast is then evaluated per
    candidate from real membership, and matching, filter-passing
    candidates yield their EXACT engine totals.  Every returned total
    belongs to a true match, so the k-th best is a valid theta lower
    bound.  Driver work is budgeted (_CONJ_* constants); any overrun
    returns None (no pruning, never wrong answers)."""
    import duckdb

    req = sorted(_required_terms(ast))
    r_term = min(req, key=lambda t: dfs.get(t, 1 << 60))
    if r_term in rare_maps:
        items = rare_maps[r_term]
        cand = np.fromiter(items.keys(), dtype=np.int64, count=len(items))
        ctf = np.fromiter(items.values(), dtype=np.int64, count=len(items))
    else:
        picks = []
        for ri, r in enumerate(rows):
            if r["term"] != r_term:
                continue
            mt = np.asarray(r["blk_max_tf"], dtype=np.int64)
            picks.extend((int(mt[bi]), ri, bi) for bi in range(mt.size))
        if not picks:
            return None
        picks.sort(key=lambda x: -x[0])
        chosen: dict[int, list[int]] = {}
        for _, ri, bi in picks[:_CONJ_SEED_BLOCKS]:
            chosen.setdefault(ri, []).append(bi)
        ds, ts = [], []
        for ri, bis in chosen.items():
            r = rows[ri]
            sl = _fetch_row_bytes(index_dir, r)
            row_b = dict(r)
            row_b["docs_bytes"], row_b["tfs_bytes"] = bytes(sl[0]), bytes(sl[1])
            keep = np.zeros(len(r["blk_n"]), dtype=bool)
            keep[bis] = True
            d, tf = segments.decode_docs_tfs_blocks(row_b, keep)
            ds.append(d)
            ts.append(tf)
        cand = np.concatenate(ds)
        ctf = np.concatenate(ts)
    if cand.size < k:
        return None
    if cand.size > _CONJ_MAX_CAND:
        top = np.argsort(-ctf, kind="mergesort")[:_CONJ_MAX_CAND]
        cand, ctf = cand[top], ctf[top]
    order = np.argsort(cand, kind="mergesort")
    cand, ctf = cand[order], ctf[order]

    leaf_terms = sorted({lf.term for lf in leaves})
    tf_maps: dict[str, dict] = {
        r_term: dict(zip(cand.astype(int).tolist(), ctf.astype(int).tolist()))
    }
    verify_budget = _CONJ_MAX_VERIFY_BLOCKS
    for t in leaf_terms:
        if t == r_term:
            continue
        if t in rare_maps:
            tf_maps[t] = rare_maps[t]
            continue
        got: dict[int, int] = {}
        for r in rows:
            if r["term"] != t:
                continue
            firsts = np.asarray(r["blk_first"], dtype=np.int64)
            lasts = np.asarray(r["blk_last"], dtype=np.int64)
            if not firsts.size:
                continue
            pos = np.searchsorted(cand, firsts, side="left")
            hit = (pos < cand.size) & (cand[np.minimum(pos, cand.size - 1)] <= lasts)
            bis = np.nonzero(hit)[0]
            if not bis.size:
                continue
            verify_budget -= int(bis.size)
            if verify_budget < 0:
                return None
            sl = _fetch_row_bytes(index_dir, r)
            row_b = dict(r)
            row_b["docs_bytes"], row_b["tfs_bytes"] = bytes(sl[0]), bytes(sl[1])
            keep = np.zeros(firsts.size, dtype=bool)
            keep[bis] = True
            d, tf = segments.decode_docs_tfs_blocks(row_b, keep)
            m = np.isin(d, cand)
            for dd, tt in zip(d[m].astype(int).tolist(), tf[m].astype(int).tolist()):
                got[dd] = tt
        tf_maps[t] = got

    idl = ",".join(str(int(d)) for d in cand)
    nd = duckdb.sql(
        f"SELECT docid, norm, role, tool, ts FROM read_parquet('{index_dir}/docs/*.parquet') "
        f"WHERE docid IN ({idl})"
    ).df().set_index("docid")
    if filters:
        ok = filter_mask(nd["role"], nd["tool"], nd["ts"], filters)
        passing = set(int(x) for x in nd.index[ok])
    else:
        passing = None
    # tombstoned candidates can't seed theta: live search ranks only
    # survivors, so theta must lower-bound the LIVE k-th total
    dead = _tombstoned_among(exclude_dir, cand) if exclude_dir else set()

    norm_map = nd["norm"].to_dict()
    totals = []
    for d in cand.astype(int).tolist():
        if passing is not None and d not in passing:
            continue
        if d in dead:
            continue
        has = {t: (tf_maps[t].get(d, 0) > 0) for t in leaf_terms}
        if not _eval_membership(ast, has):
            continue
        norm = int(norm_map[d])
        tot = 0.0
        for t, m in mult.items():
            tfv = tf_maps[t].get(d, 0)
            if tfv > 0:
                tot += (
                    float(bm25.score_tf(np.array([tfv]), np.array([norm]), weights[t], cache)[0]) * m
                )
        totals.append(tot)
    if len(totals) < k:
        return None
    return np.asarray(totals, dtype=np.float64)


def _plan_block_prune(
    index_dir: str,
    ast: Node,
    leaves: list[Node],
    dfs: dict,
    stats: dict,
    k: int,
    filters: dict | None = None,
    exclude_dir: str | None = None,
):
    """Distributed block-max pruning plan (Term / OR-of-Terms).

    The scale problem (VERDICT r1): a hot-term query decodes and shuffles
    every posting.  This planner reads only the per-block METADATA of the
    query terms (small: df/128 rows' arrays), seeds an exact score
    threshold theta by fully scoring the single best-upper-bound block
    (its <=128 entries fetched as byte slices + a docid-pruned norms
    lookup), then sweeps the block intervals to find the docid ranges
    where the summed block upper bounds can still reach theta.  Executors
    decode only blocks overlapping surviving ranges and drop entries
    outside them.

    Exactness: theta is the k-th best ACHIEVED total among docs of the
    seed blocks (every one matches a term/OR query — and passes the
    keyword/time filters when given — and a doc's total >= its seeded
    single-clause score), so the final k-th total >= theta;
    a doc outside every surviving range has total < theta (sum of
    covering upper bounds, conservative firsts) and per-doc scores are
    independent, so dropping it cannot change surviving docs' scores.
    Survival uses >= (plus a 1e-9 conservative margin) so equal-score
    docid tie-breaks stay exact.  Returns None when pruning is invalid
    or not worth it."""
    import json

    import duckdb

    if not all(isinstance(lf, Term) for lf in leaves):
        return None
    # r3 (VERDICT r2 item 4): any positive And/Or/Not tree of Term leaves
    # qualifies, as long as it has >=1 SUFFICIENT term — a term whose
    # presence alone proves the doc matches (the ast itself, or any
    # Or-reachable Term child, e.g. c in '(a AND b) OR c').  Seeds come
    # only from sufficient terms' blocks (provable matches with provable
    # achieved-score lower bounds); the upper-bound envelope still sums
    # over ALL positive leaves, so theta-vs-envelope stays exact for
    # arbitrary tree shapes.
    suff = _sufficient_terms(ast)
    conj_req = sorted(_required_terms(ast)) if not suff else []
    if not suff and not conj_req:
        return None
    try:
        with open(os.path.join(index_dir, "_build.json")) as f:
            shard_size = json.load(f)["shard_size"]
    except (OSError, KeyError):
        return None
    mult: dict[str, float] = {}
    for lf, m in _positive_multiplicity(ast).items():
        # accumulate: boost-distinct leaves of the same term are separate
        # clauses whose weights sum (Term('x',1) and Term('x',2) -> 3.0)
        mult[lf.term] = mult.get(lf.term, 0.0) + m
    terms = sorted(mult)
    # fetch metadata for ALL leaf terms: NOT-subtree terms contribute no
    # envelope/weight, but the conjunction seeder needs their rows for
    # exact membership evaluation
    terms_meta = sorted({lf.term for lf in leaves})
    tl = ",".join("'" + t.replace("'", "''") + "'" for t in terms_meta)
    meta = duckdb.sql(
        f"SELECT * EXCLUDE (docs_bytes, tfs_bytes, pos_bytes), "
        f"octet_length(docs_bytes) AS dlen, octet_length(tfs_bytes) AS tlen "
        f"FROM {_postings_sources(index_dir, terms_meta)} WHERE term IN ({tl})"
    ).df()
    if not len(meta):
        return None
    rows = meta.to_dict("records")
    if sum(len(r["blk_last"]) for r in rows) > _PRUNE_MAX_BLOCKS:
        return None
    cache = bm25.norm_inverse_cache(stats["avgdl"])
    weights = {t: bm25.clause_weight([dfs.get(t, 0)], stats["doc_count"]) for t in terms}

    # Rare terms (df <= _RARE_DECODE_MAX) poison the block envelope: their
    # ONE block per salt row spans nearly the whole docid space while their
    # high idf makes the block bound large — added everywhere, it defeats
    # theta for every mixed tree like '(rare AND rare) OR hot'.  Decode
    # them exactly driver-side (cheap by definition) and contribute
    # singleton [docid, docid] intervals with per-entry exact-tf bounds
    # (norm bounded by the best norm byte) instead.
    # corpus-relative threshold: a term whose df is a few percent of the
    # corpus has near-full block SPAN but tiny mass — singleton-decode it.
    # (The absolute _RARE_DECODE_MAX alone would class every term of a
    # small corpus as rare and leave no hot blocks to seed theta from.)
    rare_thr = min(_RARE_DECODE_MAX, max(256, int(0.05 * stats["doc_count"])))
    rare_set = {t for t in terms if dfs.get(t, 0) <= rare_thr}
    rare_maps: dict[str, dict] = {}
    per_term: dict[str, list[tuple[np.ndarray, np.ndarray, np.ndarray]]] = {}
    blocks: list[tuple[float, int, int]] = []  # (ub, row_idx, block_idx)
    for ri, r in enumerate(rows):
        if r["term"] in rare_set or r["term"] not in mult:
            continue
        lasts = np.asarray(r["blk_last"], dtype=np.int64)
        if lasts.size == 0:
            continue
        ubs = _row_block_ubs(r, weights[r["term"]], cache) * mult[r["term"]]
        firsts = np.asarray(r["blk_first"], dtype=np.int64)  # exact (r2 format)
        per_term.setdefault(r["term"], []).append((firsts, lasts, ubs))
        if r["term"] in suff:
            blocks.extend((float(ubs[bi]), ri, bi) for bi in range(lasts.size))
    if not blocks and not conj_req:
        # pure OR-of-rares (every sufficient term rare): no seed blocks
        # can exist, so the sweep below could never run — exit BEFORE
        # paying the driver-side rare decode (a 500-term fuzzy expansion
        # was spending ~2 s decoding postings only to return None)
        return None
    if sum(dfs.get(t, 0) for t in rare_set) > _RARE_DECODE_BUDGET:
        # planning-cost budget: "rare terms decode cheaply" is a
        # PER-TERM argument — a wide expansion can class hundreds of
        # mid-frequency terms as rare and the driver would read+decode
        # megabytes of postings for an envelope that (measured) never
        # prunes such queries anyway.  Past the budget, skip planning
        # and let the fused executor plan run unpruned.
        return None
    if rare_set:
        max_ninv = float(cache.max())
        tl_r = ",".join("'" + t.replace("'", "''") + "'" for t in sorted(rare_set))
        rrows = duckdb.sql(
            f"SELECT term, docs_bytes, tfs_bytes, blk_n "
            f"FROM {_postings_sources(index_dir, sorted(rare_set))} WHERE term IN ({tl_r})"
        ).df().to_dict("records")
        rgroups: dict[str, list] = {}
        for r in rrows:
            d, tf = segments.decode_docs_tfs(r)
            if d.size:
                rgroups.setdefault(r["term"], []).append((d, tf))
        for t, parts in rgroups.items():
            d = np.concatenate([x for x, _ in parts])
            tf = np.concatenate([x for _, x in parts]).astype(np.float64)
            order = np.argsort(d, kind="mergesort")
            d, tf = d[order], tf[order]
            rare_maps[t] = dict(zip(d.astype(int).tolist(), tf.astype(int).tolist()))
            w = np.float64(weights[t])
            ub = (w - w / (1.0 + tf * max_ninv)) * mult[t]
            per_term.setdefault(t, []).append((d, d, ub))
        # a rare term absent from rgroups has no postings: contributes no
        # score anywhere — correctly absent from the envelope
    if not blocks and not conj_req:
        return None

    if conj_req:
        # no sufficient term ('hot AND hot' and friends): exact verified
        # seeds from the rarest required term (see _conj_seed_totals)
        tot = _conj_seed_totals(
            index_dir, ast, leaves, rows, rare_maps, weights, mult, dfs, cache, k, filters,
            exclude_dir=exclude_dir,
        )
        if tot is None or tot.size < k:
            return None
        theta = float(np.sort(tot)[-k])
        return _theta_sweep(per_term, theta, shard_size)

    # seed theta: pool the exact scores of the top-B blocks by upper bound
    # (one block is a poor k-th estimate; ~4k entries pooled lands theta
    # near the true k-th total).  Each involved row's bytes are fetched
    # once and block-sliced (at object-store scale: ranged reads of a few
    # hundred bytes per block).
    n_seed = max(4, -(-4 * k // 128))
    blocks.sort(key=lambda x: -x[0])
    chosen: dict[int, list[int]] = {}
    for _, ri, bi in blocks[:n_seed]:
        chosen.setdefault(ri, []).append(bi)
    pool_doc, pool_tf, pool_w = [], [], []
    for ri, bis in chosen.items():
        r = rows[ri]
        doff = np.append(np.asarray(r["blk_doc_off"], dtype=np.int64), r["dlen"])
        toff = np.append(np.asarray(r["blk_tf_off"], dtype=np.int64), r["tlen"])
        term_sql = str(r["term"]).replace("'", "''")
        cands = duckdb.sql(
            f"SELECT docs_bytes, tfs_bytes FROM {_postings_sources(index_dir, [r['term']])} "
            f"WHERE term = '{term_sql}' AND salt = {int(r['salt'])} AND shard_min = {int(r['shard_min'])}"
        ).fetchall()
        # (term, salt, shard_min) is unique for classic merged rows but
        # NOT under max_segment_bytes (capped runs can share a boundary
        # shard) — pick the candidate whose first docid matches this
        # metadata row's first block, so the byte offsets line up
        want = (
            int(np.asarray(r["blk_first"], dtype=np.int64)[0])
            if len(r["blk_first"])
            else None
        )
        sl = None
        for cand in cands:
            if len(cand[0]) == r["dlen"] and (
                want is None or segments.first_docid(bytes(cand[0])) == want
            ):
                sl = cand
                break
        if sl is None:
            continue  # seed unavailable: smaller pool only lowers theta
        for bi in bis:
            dsl = bytes(sl[0])[int(doff[bi]) : int(doff[bi + 1])]
            tsl = bytes(sl[1])[int(toff[bi]) : int(toff[bi + 1])]
            d = np.cumsum(varint.decode(dsl).astype(np.int64))
            t = varint.decode(tsl).astype(np.int64)
            pool_doc.append(d)
            pool_tf.append(t)
            pool_w.append((r["term"], d.size))
    if not pool_doc:
        # every chosen seed row was disambiguated away (sl None for all):
        # no pool means no theta bound — fall back gracefully (ADVICE r5)
        return None
    docids = np.concatenate(pool_doc)
    tfs = np.concatenate(pool_tf)
    if docids.size < k:
        return None
    idl = ",".join(str(int(d)) for d in np.unique(docids))
    nd = duckdb.sql(
        f"SELECT docid, norm, role, tool, ts FROM read_parquet('{index_dir}/docs/*.parquet') "
        f"WHERE docid IN ({idl})"
    ).df().set_index("docid")
    if filters or exclude_dir:
        # keyword/time-filtered queries: theta must come from docs that
        # PASS the filters (an unfiltered seed could overshoot the
        # filtered k-th total).  Same argument for tombstones (live
        # search ranks survivors only).  Dropped seeds only lower theta
        # — it stays a valid bound.
        if filters:
            ok = filter_mask(nd["role"], nd["tool"], nd["ts"], filters)
            passing = set(int(x) for x in nd.index[ok])
        else:
            passing = set(int(x) for x in nd.index)
        if exclude_dir:
            passing -= _tombstoned_among(exclude_dir, docids)
        keep_ent = np.fromiter((int(d) in passing for d in docids), dtype=bool, count=docids.size)
        # rebuild the pooled streams with only passing docs
        new_pool_w = []
        off = 0
        for t, n in pool_w:
            seg = keep_ent[off : off + n]
            new_pool_w.append((t, int(seg.sum())))
            off += n
        docids = docids[keep_ent]
        tfs = tfs[keep_ent]
        pool_w = new_pool_w
        if docids.size < k:
            return None
    norm_by_doc = nd["norm"]
    norms = norm_by_doc.loc[docids].to_numpy().astype(np.int64)
    # per-entry single-clause achieved totals (a doc's full total >= this);
    # a doc seen via several terms gets its per-term contributions summed
    raw = np.empty(docids.size, dtype=np.float64)
    for i0, (t, n) in zip(np.cumsum([0] + [n for _, n in pool_w])[:-1], pool_w):
        seg = slice(int(i0), int(i0) + n)
        raw[seg] = bm25.score_tf(tfs[seg], norms[seg], weights[t], cache).astype(np.float64) * mult[t]
    ud, inv = np.unique(docids, return_inverse=True)
    tot = np.zeros(ud.size, dtype=np.float64)
    np.add.at(tot, inv, raw)
    if tot.size < k:
        return None
    theta = float(np.sort(tot)[-k])
    return _theta_sweep(per_term, theta, shard_size)


def _theta_sweep(per_term: dict, theta: float, shard_size: int):
    """Sweep: docid ranges where the summed per-term upper-bound ENVELOPES
    can still reach theta.  Within a term, the salted rows interleave in
    docid space but each doc lives in exactly ONE row, so the term's
    bound at a docid is the MAX over covering blocks (summing same-term
    rows would overcount ~n_salts x and kill all pruning); across terms
    the envelopes add."""
    if not per_term:
        return None
    all_first = np.concatenate([f for blks in per_term.values() for f, _, _ in blks])
    all_last = np.concatenate([l for blks in per_term.values() for _, l, _ in blks])
    bps = np.unique(np.concatenate([all_first, all_last + 1]))
    cov = np.zeros(bps.size - 1, dtype=np.float64)
    for blks in per_term.values():
        firsts = np.concatenate([f for f, _, _ in blks])
        lasts = np.concatenate([l for _, l, _ in blks])
        ubs = np.concatenate([u for _, _, u in blks])
        cov += _term_envelope(firsts, lasts, ubs, bps)
    alive = cov + 1e-9 >= theta
    lo_list, hi_list = [], []
    for i in range(alive.size):
        if alive[i] and (i == 0 or not alive[i - 1]):
            lo_list.append(int(bps[i]))
        if not alive[i] and i > 0 and alive[i - 1]:
            hi_list.append(int(bps[i]) - 1)
    if lo_list and len(hi_list) < len(lo_list):
        hi_list.append(int(bps[-1]) - 1)
    if not lo_list:
        return None
    lo = np.asarray(lo_list, dtype=np.int64)
    hi = np.asarray(hi_list, dtype=np.int64)
    covered = int((hi - lo + 1).sum())
    span = int(all_last.max()) + 1
    if covered > (1.0 - _PRUNE_MIN_DROP) * span:
        return None  # not worth shipping the plan
    return {"lo": lo, "hi": hi, "shard_size": shard_size}


def _term_envelope(firsts: np.ndarray, lasts: np.ndarray, ubs: np.ndarray, bps: np.ndarray) -> np.ndarray:
    """Piecewise max of block upper bounds over breakpoint intervals
    [bps[i], bps[i+1]): env[i] = max ub among blocks with
    first <= bps[i] <= last.  Every block first/last+1 is a breakpoint,
    so no block starts or ends mid-interval.

    Vectorized (r5): the original per-breakpoint heap sweep was
    O(terms x breakpoints) PYTHON-loop work — 8 s of driver time on a
    100-term wildcard expansion whose rare-decoded terms contribute one
    SINGLETON interval per posting (~500k intervals).  Singletons cover
    exactly one breakpoint slot (their last+1 is the next breakpoint),
    so they reduce to one np.maximum.at scatter; real multi-entry blocks
    are bounded by _PRUNE_MAX_BLOCKS and take one slice-max each."""
    env = np.zeros(bps.size - 1, dtype=np.float64)
    single = lasts == firsts
    if single.any():
        idx = np.searchsorted(bps, firsts[single], side="left")
        np.maximum.at(env, idx, ubs[single])
    if not single.all():
        f, l, u = firsts[~single], lasts[~single], ubs[~single]
        i0s = np.searchsorted(bps, f, side="left")
        i1s = np.searchsorted(bps, l, side="right")  # exclusive
        for a, b, ub in zip(i0s, i1s, u):
            seg = env[a:b]
            np.maximum(seg, ub, out=seg)
    return env


def _required_terms(node: Node) -> set[str]:
    """Terms every matching doc MUST contain: And = union of children,
    Or = intersection (only terms required by ALL branches), Not = none,
    Phrase = all its words."""
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, (Phrase, SpanNear, SpanContaining, SpanWithin)):
        return set(node.terms)
    if isinstance(node, SpanFirst):
        return {node.term}
    if isinstance(node, SpanNot):
        # only the include term is required; the exclude term's ABSENCE
        # is fine (and its presence doesn't preclude a match)
        return {node.include}
    if isinstance(node, Intervals):
        # the spec's own required-term algebra (any_of = intersection,
        # negated filter references optional)
        return _iv_required_terms(node.spec)
    if isinstance(node, (MultiPhrase, SpanOr)):
        # only SINGLETON slots pin a specific term; a multi-alternative
        # slot requires one-of, which no single term expresses
        return {s[0] for s in node.slots if len(s) == 1}
    if isinstance(node, And):
        out: set[str] = set()
        for c in node.children:
            out |= _required_terms(c)
        return out
    if isinstance(node, (Or, AtLeast)):
        sets = [_required_terms(c) for c in node.children]
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return out
    if isinstance(node, Not):
        return set()
    raise TypeError(node)


def _sufficient_terms(node: Node) -> set[str]:
    """Terms whose presence in a doc PROVES the doc matches the query:
    the ast itself when it is a Term, else Term children reachable
    through Or nodes only (Or matches if any child matches).  And /
    Not / Phrase contribute none (conservative)."""
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, Or):
        out: set[str] = set()
        for c in node.children:
            out |= _sufficient_terms(c)
        return out
    return set()


def _union_ranges(a, b) -> tuple[np.ndarray, np.ndarray]:
    """Union of two disjoint sorted range lists (lo, hi)."""
    (alo, ahi), (blo, bhi) = a, b
    if not alo.size:
        return blo, bhi
    if not blo.size:
        return alo, ahi
    lo = np.concatenate([alo, blo])
    hi = np.concatenate([ahi, bhi])
    return _merge_intervals(lo, hi)


def _merge_intervals(firsts: np.ndarray, lasts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.argsort(firsts, kind="mergesort")
    f, l = firsts[order], lasts[order]
    lo, hi = [], []
    for a, b in zip(f, l):
        if hi and a <= hi[-1] + 1:
            hi[-1] = max(hi[-1], int(b))
        else:
            lo.append(int(a))
            hi.append(int(b))
    return np.asarray(lo, dtype=np.int64), np.asarray(hi, dtype=np.int64)


def _intersect_ranges(a, b) -> tuple[np.ndarray, np.ndarray]:
    """Intersection of two disjoint sorted range lists (lo, hi)."""
    (alo, ahi), (blo, bhi) = a, b
    lo, hi = [], []
    i = j = 0
    while i < alo.size and j < blo.size:
        s = max(alo[i], blo[j])
        e = min(ahi[i], bhi[j])
        if s <= e:
            lo.append(int(s))
            hi.append(int(e))
        if ahi[i] < bhi[j]:
            i += 1
        else:
            j += 1
    return np.asarray(lo, dtype=np.int64), np.asarray(hi, dtype=np.int64)


_RARE_DECODE_MAX = 65_536  # df below this: decode the term driver-side


def _iv_spec_coverage(spec, per_term: dict) -> tuple[np.ndarray, np.ndarray]:
    """Docid-range coverage of an intervals spec — the same superset
    argument as the boolean tree: term -> its coverage; ordered/
    unordered -> intersection over children (every child must emit an
    interval); any_of -> union; existential filters -> source AND
    reference intersected (both sides must emit); negated filters ->
    source only (the reference can only SHRINK the match set)."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if isinstance(spec, _ITerm):
        return per_term.get(spec.term, empty)
    if isinstance(spec, _ICombine):
        r = None
        for c in spec.children:
            cc = _iv_spec_coverage(c, per_term)
            r = cc if r is None else _intersect_ranges(r, cc)
            if r[0].size == 0:
                break
        return r
    if isinstance(spec, _IAnyOf):
        r = empty
        for c in spec.children:
            r = _union_ranges(r, _iv_spec_coverage(c, per_term))
        return r
    if isinstance(spec, _IFilter):
        r = _iv_spec_coverage(spec.source, per_term)
        if spec.kind in _IV_EXISTENTIAL:
            r = _intersect_ranges(r, _iv_spec_coverage(spec.reference, per_term))
        return r
    raise TypeError(spec)


def _coverage_ranges(node: Node, per_term: dict) -> tuple[np.ndarray, np.ndarray] | None:
    """Recursive docid-range coverage of a boolean tree: ranges outside
    which NO match of ``node`` can live.  Term -> its block (or exact,
    for driver-decoded rare terms) coverage, EMPTY when absent from the
    index; Phrase -> intersection of its words; And -> intersection over
    positive children; Or -> union over children; Not -> None (no
    restriction — a NOT can only widen the match set).  A None child
    inside Or makes the whole Or unrestricted.  Pure superset argument:
    exact under filters, phrases, NOT, and scoring."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if isinstance(node, Term):
        return per_term.get(node.term, empty)
    if isinstance(node, SpanFirst):
        # position filtering only narrows the term's match set
        return per_term.get(node.term, empty)
    if isinstance(node, SpanNot):
        # exclusion only narrows the include term's match set
        return per_term.get(node.include, empty)
    if isinstance(node, (MultiPhrase, SpanOr)):
        # every slot must match SOME alternative: intersection over
        # slots of the union of each slot's term coverages (an empty
        # slot -> empty coverage -> the node provably matches nothing)
        r = None
        for ts in node.slots:
            u = empty
            for t in ts:
                u = _union_ranges(u, per_term.get(t, empty))
            r = u if r is None else _intersect_ranges(r, u)
            if r[0].size == 0:
                break
        return r
    if isinstance(node, Intervals):
        return _iv_spec_coverage(node.spec, per_term)
    if isinstance(node, (Phrase, SpanNear, SpanContaining, SpanWithin)):
        # every term is required (a span_near match needs all clauses;
        # containing/within need every big clause AND the little term),
        # so the intersection argument is mode- and slop-independent
        r = None
        for t in node.terms:
            c = per_term.get(t, empty)
            r = c if r is None else _intersect_ranges(r, c)
            if r[0].size == 0:
                break
        return r
    if isinstance(node, And):
        r = None
        for ch in node.children:
            c = _coverage_ranges(ch, per_term)
            if c is None:
                continue
            r = c if r is None else _intersect_ranges(r, c)
            if r[0].size == 0:
                break
        return r
    if isinstance(node, (Or, AtLeast)):
        # AtLeast(m, ...) matches a SUBSET of the Or of its children, so
        # the union stays a valid superset coverage
        r = empty
        for ch in node.children:
            c = _coverage_ranges(ch, per_term)
            if c is None:
                return None
            r = _union_ranges(r, c)
        return r
    if isinstance(node, Not):
        return None
    raise TypeError(node)


def _plan_intersection_prune(index_dir: str, ast: Node, stats: dict, dfs: dict | None = None):
    """Structural pruning for boolean trees (r3, VERDICT r2 item 4 —
    generalized from required-term-only): the recursive coverage
    (And = intersection, Or = union, Not = unrestricted) restricts the
    decode to docid ranges where a match can exist, so
    '(a AND b) OR (c AND d)' prunes per OR branch instead of falling
    back to the usually-empty global required-term set.  Hot terms
    contribute block-interval coverage from METADATA only; rare terms
    (df <= 65k) are DECODED driver-side — a rare term's one block per
    salt row spans nearly the whole docid space, so block granularity
    alone can't prune it, while its exact docids collapse the hot
    term's decode to the rare term's rows (the drive-by-rarest plan).
    Returns a plan dict, or None when the shape can't restrict / no
    win; an absent required term yields an EMPTY plan (provably no
    matches) — inside an OR, an absent term merely empties its branch."""
    import json

    import duckdb

    # single terms and flat ORs of terms: coverage == the decode's own
    # term filter — nothing to prune (the theta planner's domain)
    if isinstance(ast, Term) or (
        isinstance(ast, Or) and all(isinstance(c, Term) for c in ast.children)
    ):
        return None
    try:
        with open(os.path.join(index_dir, "_build.json")) as f:
            shard_size = json.load(f)["shard_size"]
    except (OSError, KeyError):
        return None
    dfs = dfs or {}
    need = sorted({t for lf in _positive_leaves(ast)
                   for t in _leaf_terms(lf)})
    if not need:
        return None
    rare = [t for t in need if dfs.get(t, 0) <= _RARE_DECODE_MAX]
    hot = [t for t in need if t not in rare]
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    if hot:
        tl = ",".join("'" + t.replace("'", "''") + "'" for t in hot)
        meta = duckdb.sql(
            f"SELECT term, blk_first, blk_last FROM {_postings_sources(index_dir, hot)} "
            f"WHERE term IN ({tl})"
        ).df()
        rows = meta.to_dict("records")
        if sum(len(r["blk_last"]) for r in rows) > _PRUNE_MAX_BLOCKS:
            return None
        groups: dict[str, list] = {}
        for r in rows:
            if len(r["blk_last"]):
                groups.setdefault(r["term"], []).append(r)
        for t, rs in groups.items():
            per_term[t] = _merge_intervals(
                np.concatenate([np.asarray(r["blk_first"], dtype=np.int64) for r in rs]),
                np.concatenate([np.asarray(r["blk_last"], dtype=np.int64) for r in rs]),
            )
    if rare:
        tl = ",".join("'" + t.replace("'", "''") + "'" for t in rare)
        rrows = duckdb.sql(
            f"SELECT term, docs_bytes, tfs_bytes, blk_n "
            f"FROM {_postings_sources(index_dir, rare)} WHERE term IN ({tl})"
        ).df().to_dict("records")
        rgroups: dict[str, list[np.ndarray]] = {}
        for r in rrows:
            d, _ = segments.decode_docs_tfs(r)
            if d.size:
                rgroups.setdefault(r["term"], []).append(d)
        for t, ds in rgroups.items():
            docids = np.sort(np.concatenate(ds))
            per_term[t] = _merge_intervals(docids, docids)
    ranges = _coverage_ranges(ast, per_term)
    if ranges is None:
        return None
    lo, hi = ranges
    if lo.size:
        covered = int((hi - lo + 1).sum())
        if covered > (1.0 - _PRUNE_MIN_DROP) * stats["n_docs"]:
            return None
    return {"lo": lo, "hi": hi, "shard_size": shard_size}


def _ranges_overlap(firsts: np.ndarray, lasts: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Boolean per block: does [first, last] intersect any [lo, hi] range?
    Ranges are disjoint + sorted."""
    pos = np.searchsorted(hi, firsts, side="left")
    ok = pos < lo.size
    out = np.zeros(firsts.shape, dtype=bool)
    out[ok] = lo[pos[ok]] <= lasts[ok]
    return out


def _in_ranges(docids: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(hi, docids, side="left")
    ok = pos < lo.size
    out = np.zeros(docids.shape, dtype=bool)
    out[ok] = lo[pos[ok]] <= docids[ok]
    return out


def _build_params(index_dir: str) -> dict:
    import json

    try:
        with open(os.path.join(index_dir, "_build.json")) as f:
            return json.load(f)
    except OSError:
        return {}


def _shard_size_of(index_dir: str) -> int | None:
    try:
        return int(_build_params(index_dir)["shard_size"])
    except (KeyError, ValueError):
        return None


def _ranged_norms(
    docs_dir: str, shard_size: int, d: np.ndarray, filters: dict | None = None
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """norm bytes aligned to docid array ``d`` via per-shard ranged reads
    of the docid-sorted docs parquet (row-group pruned — the executor-side
    norm-slice fetch shared by the sharded warm paths).  Relies on the
    dense-docid invariant (every docid present in docs).  With ``filters``
    the SAME read also evaluates the keyword/time filter dict and a
    (norms, pass_mask) pair returns — filtered sharded queries pay no
    second fetch."""
    import duckdb

    sel = "docid, norm, role, tool, ts" if filters else "docid, norm"
    out = np.zeros(d.size, dtype=np.uint8)
    passing = np.ones(d.size, dtype=bool) if filters else None
    for s in np.unique(d // shard_size):
        lo, hi = int(s) * shard_size, (int(s) + 1) * shard_size - 1
        nd = duckdb.sql(
            f"SELECT {sel} FROM read_parquet('{docs_dir}/*.parquet') "
            f"WHERE docid >= {lo} AND docid <= {hi} ORDER BY docid"
        ).df()
        fd = nd["docid"].to_numpy()
        m = (d >= lo) & (d <= hi)
        idx = np.searchsorted(fd, d[m])
        out[m] = nd["norm"].to_numpy()[idx].astype(np.uint8)
        if filters:
            passing[m] = filter_mask(nd["role"], nd["tool"], nd["ts"], filters)[idx]
    return (out, passing) if filters else out


def _decode_postings_df(
    postings: DataFrame,
    leaves: list[Node],
    prune: dict | None = None,
    score_ctx: dict | None = None,
) -> DataFrame:
    """Decode pruned postings rows -> flat (clause, slot, docid, tf[, pos]).

    Term leaves need (docid, tf); phrase leaves additionally carry each
    slot's in-doc positions so phrase frequency can be resolved after a
    docid shuffle.

    ``score_ctx`` (warm fast path, Term leaves only): fuse BM25 scoring
    into the SAME Python stage — the decoded arrays are scored against
    the broadcast norms (and optionally masked by the broadcast filter)
    before they ever cross Arrow, emitting (clause, docid, score)
    directly.  One Python runner instead of two chained mapInPandas."""
    term_clauses: dict[str, list[tuple[int, int, bool]]] = {}
    for ci, leaf in enumerate(leaves):
        if isinstance(leaf, Term):
            term_clauses.setdefault(leaf.term, []).append((ci, 0, False))
        else:
            # phrase-like: one entry per (slot, alternative term) — a
            # MultiPhrase slot's alternatives all land on the same slot,
            # so the union-of-positions frequency falls out of the
            # existing per-slot accumulation
            for slot, ts in enumerate(_slots_of(leaf)):
                for t in ts:
                    term_clauses.setdefault(t, []).append((ci, slot, True))

    any_phrase = any(isinstance(lf, _PHRASELIKE) for lf in leaves)
    cols = ["term", "docs_bytes", "tfs_bytes", "blk_n"] + (["pos_bytes", "blk_pos_off"] if any_phrase else [])
    if prune is not None:
        cols += ["blk_first", "blk_last", "blk_doc_off", "blk_tf_off"]
        p_lo, p_hi = prune["lo"], prune["hi"]
    postings = postings.select(*cols)  # column-prune the parquet scan

    def decode(batches):
        for pdf in batches:
            outs = {k: [] for k in ("clause", "slot", "docid", "tf", "pos")}
            # dict records, not iterrows(): one row per (term, salt) segment
            # (bounded by query terms x n_salts after the merge), but hot
            # terms x many shards pre-merge make Series-per-cell cost real
            for row in pdf.to_dict("records"):
                needs_pos = any(p for _, _, p in term_clauses.get(row["term"], ()))
                pos_lists = None
                if prune is not None:
                    lasts = np.asarray(row["blk_last"], dtype=np.int64)
                    firsts = np.asarray(row["blk_first"], dtype=np.int64)
                    keep = _ranges_overlap(firsts, lasts, p_lo, p_hi)
                    docids, tfs = segments.decode_docs_tfs_blocks(row, keep)
                    if not docids.size:
                        continue
                    if needs_pos and len(row["pos_bytes"]):
                        pos, off = segments.decode_positions_blocks(row, keep, tfs)
                        pos_lists = [pos[off[i] : off[i + 1]] for i in range(len(docids))]
                    m = _in_ranges(docids, p_lo, p_hi)
                    if not m.all():
                        docids, tfs = docids[m], tfs[m]
                        if pos_lists is not None:
                            pos_lists = [pl for pl, ok in zip(pos_lists, m) if ok]
                    if not docids.size:
                        continue
                else:
                    docids, tfs = segments.decode_docs_tfs(row)
                    if needs_pos and len(row["pos_bytes"]):
                        pos, off = segments.decode_positions(row, tfs)
                        pos_lists = [pos[off[i] : off[i + 1]] for i in range(len(docids))]
                for ci, slot, want_pos in term_clauses.get(row["term"], ()):
                    n = len(docids)
                    outs["clause"].append(np.full(n, ci, dtype=np.int32))
                    outs["slot"].append(np.full(n, slot, dtype=np.int32))
                    outs["docid"].append(docids)
                    outs["tf"].append(tfs)
                    if any_phrase:
                        outs["pos"].append(
                            pos_lists if (want_pos and pos_lists is not None) else [None] * n
                        )
            if outs["clause"]:
                data = {
                    "clause": np.concatenate(outs["clause"]),
                    "slot": np.concatenate(outs["slot"]),
                    "docid": np.concatenate(outs["docid"]),
                    "tf": np.concatenate(outs["tf"]),
                }
                if any_phrase:
                    data["pos"] = [p for lst in outs["pos"] for p in lst]
                yield data

    def as_frames(batches):
        for data in decode(batches):
            yield pd.DataFrame(data)

    if score_ctx is not None:
        assert not any_phrase, "score fusion requires Term-only leaves"
        w64, cache = score_ctx["w64"], score_ctx["cache"]
        norms_bc, mask_bc = score_ctx["norms_bc"], score_ctx["mask_bc"]
        docs_dir = score_ctx.get("docs_dir")
        shard_size = score_ctx.get("shard_size")

        filters_d = score_ctx.get("filters")

        def decode_score(batches):
            norms = norms_bc.value if norms_bc is not None else None
            fmask = mask_bc.value if mask_bc is not None else None
            for data in decode(batches):
                d = data["docid"].astype(np.int64)
                ci = data["clause"].astype(np.int64)
                tf = data["tf"].astype(np.float64)
                if fmask is not None:
                    keep = fmask[d]
                    if not keep.all():
                        d, ci, tf = d[keep], ci[keep], tf[keep]
                    if not d.size:
                        continue
                # sharded mode: norm slices fetched per shard range (the
                # decoded rows of a batch cluster into few shards); with
                # filters the same ranged read evaluates the filter mask
                if norms is not None:
                    nvals = norms[d]
                elif filters_d:
                    nvals, keep = _ranged_norms(docs_dir, shard_size, d, filters_d)
                    if not keep.all():
                        d, ci, tf, nvals = d[keep], ci[keep], tf[keep], nvals[keep]
                    if not d.size:
                        continue
                else:
                    nvals = _ranged_norms(docs_dir, shard_size, d)
                w = w64[ci]
                sc = (w - w / (1.0 + tf * cache[nvals])).astype(np.float32)
                yield pd.DataFrame({"clause": ci.astype(np.int32), "docid": d, "score": sc})

        return postings.mapInPandas(decode_score, schema="clause int, docid long, score float"), False

    # phrase-free queries skip the pos column entirely: serializing
    # hot-term-sized all-null arrays through Arrow costs real seconds
    schema = _DECODE_SCHEMA if any_phrase else "clause int, slot int, docid long, tf long"
    return postings.mapInPandas(as_frames, schema=schema), any_phrase


def _leaf_eval_kinds(leaves: list[Node]) -> dict:
    """Per-leaf dispatch tables shared by the fused shard-local generators
    (single-query ``_shard_local_topk`` and the r6 msearch batch form)."""
    term_clauses: dict[str, list[tuple[int, int, bool]]] = {}
    for ci, leaf in enumerate(leaves):
        if isinstance(leaf, Term):
            term_clauses.setdefault(leaf.term, []).append((ci, 0, False))
        else:
            # phrase-like: one entry per (slot, alternative term) — a
            # MultiPhrase slot's alternatives all land on the same slot,
            # so the union-of-positions frequency falls out of the
            # existing per-slot accumulation
            for slot, ts in enumerate(_slots_of(leaf)):
                for t in ts:
                    term_clauses.setdefault(t, []).append((ci, slot, True))
    return {
        "term_clauses": term_clauses,
        "phrase_slots": {
            ci: len(_slots_of(lf))
            for ci, lf in enumerate(leaves)
            if isinstance(lf, _PHRASELIKE)
        },
        "phrase_slop": {
            ci: _leaf_slop(lf)
            for ci, lf in enumerate(leaves)
            if isinstance(lf, _PHRASELIKE)
        },
        "span_kind": {
            ci: (lf.slop, lf.in_order)
            for ci, lf in enumerate(leaves)
            if isinstance(lf, SpanNear)
        },
        "span_first_kind": {
            ci: lf.end for ci, lf in enumerate(leaves) if isinstance(lf, SpanFirst)
        },
        "span_not_kind": {
            ci: lf.dist for ci, lf in enumerate(leaves) if isinstance(lf, SpanNot)
        },
        "span_contain_kind": {
            ci: (lf.slop, lf.in_order,
                 "big" if isinstance(lf, SpanContaining) else "little")
            for ci, lf in enumerate(leaves)
            if isinstance(lf, (SpanContaining, SpanWithin))
        },
        "intervals_kind": {
            ci: (lf.spec, lf.terms, lf.required_slots)
            for ci, lf in enumerate(leaves)
            if isinstance(lf, Intervals)
        },
    }


def _accumulate_partition(batches, term_clauses, prune):
    """The fused generators' decode loop: per postings row, block-pruned
    decode, fan-out to (clause, slot) accumulators.  Returns (acc,
    pos_acc) keyed on (clause, slot) with (docids, tfs) / (doc_flat,
    pos_flat) parts."""
    acc: dict[tuple[int, int], list] = {}
    pos_acc: dict[tuple[int, int], list] = {}
    if prune is not None:
        p_lo, p_hi = prune["lo"], prune["hi"]
    for pdf in batches:
        for row in pdf.to_dict("records"):
            hits = term_clauses.get(row["term"], ())
            if not hits:
                continue
            needs_pos = any(p for _, _, p in hits)
            pos_flat = off = None
            if prune is not None:
                lasts = np.asarray(row["blk_last"], dtype=np.int64)
                firsts = np.asarray(row["blk_first"], dtype=np.int64)
                keep = _ranges_overlap(firsts, lasts, p_lo, p_hi)
                docids, tfs = segments.decode_docs_tfs_blocks(row, keep)
                if not docids.size:
                    continue
                if needs_pos and len(row["pos_bytes"]):
                    pos_flat, off = segments.decode_positions_blocks(row, keep, tfs)
                m = _in_ranges(docids, p_lo, p_hi)
                if not m.all():
                    if pos_flat is not None:
                        pos_flat = pos_flat[np.repeat(m, tfs)]
                    docids, tfs = docids[m], tfs[m]
                if not docids.size:
                    continue
            else:
                docids, tfs = segments.decode_docs_tfs(row)
                if not docids.size:
                    continue
                if needs_pos and len(row["pos_bytes"]):
                    pos_flat, off = segments.decode_positions(row, tfs)
            for ci, slot, want_pos in hits:
                acc.setdefault((ci, slot), []).append((docids, tfs))
                if want_pos and pos_flat is not None:
                    pos_acc.setdefault((ci, slot), []).append(
                        (np.repeat(docids, tfs), pos_flat)
                    )
    return acc, pos_acc


def _resolve_leaf_posts(acc, pos_acc, leaves, kinds) -> dict:
    """(clause, slot) accumulators -> per-leaf (docids sorted, freqs):
    terms by concat+sort, phrase-likes through their position kernels."""
    phrase_slots = kinds["phrase_slots"]
    phrase_slop = kinds["phrase_slop"]
    span_kind = kinds["span_kind"]
    span_first_kind = kinds["span_first_kind"]
    span_not_kind = kinds["span_not_kind"]
    span_contain_kind = kinds["span_contain_kind"]
    intervals_kind = kinds["intervals_kind"]
    leaf_posts: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for ci, leaf in enumerate(leaves):
        if isinstance(leaf, Term):
            parts_ = acc.get((ci, 0))
            if not parts_:
                continue
            d = np.concatenate([x for x, _ in parts_])
            t = np.concatenate([x for _, x in parts_])
            order = np.argsort(d, kind="mergesort")
            leaf_posts[ci] = (d[order], t[order])
        else:  # Phrase: resolve frequency from slot positions locally
            slot_flat = []
            ok = True
            for slot in range(phrase_slots[ci]):
                pp = pos_acc.get((ci, slot))
                if not pp:
                    if (ci in span_not_kind and slot == 1) or (
                        ci in intervals_kind
                        and slot not in intervals_kind[ci][2]
                    ):
                        # span_not's exclude slot / a non-required
                        # intervals slot (any_of branch, negated
                        # filter reference) is OPTIONAL: absence
                        # here = that term simply doesn't occur
                        slot_flat.append((
                            np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.int64),
                        ))
                        continue
                    ok = False
                    break
                slot_flat.append((
                    np.concatenate([x for x, _ in pp]),
                    np.concatenate([x for _, x in pp]),
                ))
            if not ok:
                continue
            if ci in intervals_kind:
                # intervals: minimal-interval kernel, float freq
                spec_, terms_, req_ = intervals_kind[ci]
                docs_, freqs = intervals_freqs_flat(
                    [d for d, _ in slot_flat], [p for _, p in slot_flat],
                    spec_, terms_, req_,
                )
                if docs_.size:
                    leaf_posts[ci] = (docs_, freqs)
                continue
            if ci in span_first_kind:
                # span_first: count of positions < end
                docs_, freqs = span_first_freqs_flat(
                    slot_flat[0][0], slot_flat[0][1], span_first_kind[ci]
                )
                if docs_.size:
                    leaf_posts[ci] = (docs_, freqs)
                continue
            if ci in span_not_kind:
                # span_not: include positions with no exclude within dist
                docs_, freqs = span_not_freqs_flat(
                    slot_flat[0][0], slot_flat[0][1],
                    slot_flat[1][0], slot_flat[1][1],
                    span_not_kind[ci],
                )
                if docs_.size:
                    leaf_posts[ci] = (docs_, freqs)
                continue
            if ci in span_kind:
                # span_near: raw-position kernel, float freq
                sl_, io_ = span_kind[ci]
                docs_, freqs = span_freqs_flat(
                    [d for d, _ in slot_flat], [p for _, p in slot_flat],
                    sl_, io_,
                )
                if docs_.size:
                    leaf_posts[ci] = (docs_, freqs)
                continue
            if ci in span_contain_kind:
                # span_containing/within: big slots first, little last
                sl_, io_, em_ = span_contain_kind[ci]
                docs_, freqs = span_contain_freqs_flat(
                    [d for d, _ in slot_flat[:-1]],
                    [p for _, p in slot_flat[:-1]],
                    slot_flat[-1][0], slot_flat[-1][1],
                    sl_, io_, em_,
                )
                if docs_.size:
                    leaf_posts[ci] = (docs_, freqs)
                continue
            if phrase_slop[ci] > 0:
                # sloppy phrase: per-doc greedy sweep, float freq
                docs_, freqs = sloppy_freqs_flat(
                    [d for d, _ in slot_flat], [p for _, p in slot_flat],
                    phrase_slop[ci],
                )
                if docs_.size:
                    leaf_posts[ci] = (docs_, freqs)
                continue
            keys = None
            for slot, (doc_flat, pos_flat) in enumerate(slot_flat):
                kk = doc_flat * _POS_SHIFT + (pos_flat - slot)
                keys = kk if keys is None else keys[np.isin(keys, kk)]
                if keys.size == 0:
                    ok = False
                    break
            if ok and keys is not None and keys.size:
                docs_, counts = np.unique(keys // _POS_SHIFT, return_counts=True)
                leaf_posts[ci] = (docs_, counts)
    return leaf_posts


def _ranged_fields(
    docs_dir: str,
    shard_size: int,
    docids: np.ndarray,
    fields: list[str],
    types: list[str],
) -> dict:
    """Per-shard ranged reads of docs columns for a SORTED docid set —
    the generic-field sibling of the ranged norms/filter fetch.  Returns
    {field: column} aligned to ``docids``; timestamp fields come back as
    datetime64[us] (NaT == NULL), numeric fields as float64 (the callers
    restrict emission to integral/timestamp docs columns, so NaN in the
    duckdb frame unambiguously means NULL and is re-emitted as None)."""
    import duckdb

    n = docids.size
    out: dict = {}
    for f, t in zip(fields, types):
        out[f] = (
            np.full(n, np.datetime64("NaT", "us"))
            if t == "timestamp"
            else np.full(n, np.nan, dtype=np.float64)
        )
    sel = ", ".join(["docid"] + [f'"{f}"' for f in fields])
    for s in np.unique(docids // shard_size):
        lo_d, hi_d = int(s) * shard_size, (int(s) + 1) * shard_size - 1
        nd = duckdb.sql(
            f"SELECT {sel} FROM read_parquet('{docs_dir}/*.parquet') "
            f"WHERE docid >= {lo_d} AND docid <= {hi_d} ORDER BY docid"
        ).df()
        fd = nd["docid"].to_numpy()
        idx = np.searchsorted(docids, fd)
        okm = (idx < n) & (docids[np.minimum(idx, n - 1)] == fd)
        for f, t in zip(fields, types):
            v = nd[f].to_numpy()
            out[f][idx[okm]] = (
                v[okm] if t == "timestamp" else v[okm].astype(np.float64)
            )
    for f, t in zip(fields, types):
        if t != "timestamp":
            nanm = np.isnan(out[f])
            if nanm.any():
                o = out[f].astype(object)
                o[nanm] = None
                out[f] = o
    return out


def _shard_local_topk(
    spark: SparkSession,
    index_dir: str,
    ast: Node,
    leaves: list[Node],
    weights: list[np.float32],
    stats: dict,
    k: int,
    postings: DataFrame,
    prune: dict | None,
    filters: dict | None,
    norms_bc,
    mask_bc,
    exclude_bc=None,
    presplit: bool = False,
    emit_fields: list[str] | None = None,
    emit_types: list[str] | None = None,
) -> DataFrame:
    """Warm-session evaluation in ONE Python stage (VERDICT r3 items 2/7/8).

    Plan shape: the (compressed) postings rows of the query terms are
    hash-repartitioned on ``shard_min`` — every term's rows for a docid
    shard land in the same task, because shard ranges are global docid
    ranges shared by all terms — then a single mapInPandas decodes,
    resolves phrase frequencies locally (all slots of a docid are
    co-located), fetches norms, scores, evaluates the boolean tree
    vectorized, and emits its partition's top-k.  The global step is a
    TakeOrdered over <= k x partitions rows.  Compared to the cold plan
    this shuffles COMPRESSED SEGMENT BYTES instead of decoded per-doc
    rows, and replaces decode + phrase-groupBy + docs-join + aggregation
    (3-4 exchanges, 2+ Python stages) with one exchange + one Python
    stage.

    Norms come from the broadcast array when the session holds one
    (corpora under the broadcast cap); past the cap ``norms_bc`` is None
    and each task reads ONLY its shards' docid ranges from the
    docid-sorted docs parquet (row-group pruned ranged reads — the
    per-partition norm slices co-partitioned with postings shards that
    the r3 session only documented).  Keyword/time filters evaluate from
    the broadcast mask or from the same ranged fetch.  Scoring arithmetic
    is the frozen recipe: float32 per-clause scores via bm25.score_tf,
    float64 sum of mult-weighted positive clauses, one final float32
    round — rank/score-identical to the cold path (tested).

    ``emit_fields``/``emit_types`` (r6, k=None only): append docs columns
    to the match-set output, fetched inside the generator by per-shard
    ranged reads — the relevance wrappers (function_score) then rewrite
    scores WITHOUT a docs join; field values are byte-identical to the
    join's (same parquet, same docids)."""
    any_phrase = any(isinstance(lf, _PHRASELIKE) for lf in leaves)
    kinds = _leaf_eval_kinds(leaves)
    term_clauses = kinds["term_clauses"]
    mult = _positive_multiplicity(ast)
    mult_arr = np.array([float(mult.get(lf, 0)) for lf in leaves], dtype=np.float64)
    w64 = np.array([np.float64(w) for w in weights], dtype=np.float64)
    cache = bm25.norm_inverse_cache(stats["avgdl"])
    shard_size = _shard_size_of(index_dir)
    docs_dir = os.path.join(index_dir, "docs")
    if norms_bc is None and shard_size is None:
        # sharded norm fetches group candidates by docid shard; without
        # _build.json's shard_size the executor generator would die with
        # an opaque TypeError — fail at plan time instead
        raise ValueError(
            f"sharded warm query needs shard_size from {index_dir}/_build.json; "
            "missing or unreadable — use the cold path or broadcast mode"
        )
    if emit_fields and (k is not None or shard_size is None):
        raise ValueError(
            "emit_fields needs k=None and the r2 shard geometry "
            "(ranged field reads group by docid shard)"
        )
    need_fetch_filters = filters is not None and mask_bc is None
    if need_fetch_filters and norms_bc is not None:
        # broadcast mode must ship filters as a broadcast mask — silently
        # ignoring them would return unfiltered results (QuerySession
        # always builds the mask; this guards direct callers)
        raise ValueError(
            "filtered shard-local query in broadcast mode requires a "
            "_filter_mask_bc; QuerySession builds it automatically"
        )

    _COL_TYPES = {
        "term": "string", "shard_min": "int",
        "docs_bytes": "binary", "tfs_bytes": "binary", "pos_bytes": "binary",
        "blk_n": "array<int>", "blk_first": "array<long>",
        "blk_last": "array<long>", "blk_doc_off": "array<long>",
        "blk_tf_off": "array<long>", "blk_pos_off": "array<long>",
    }
    # the split pass needs the block tables regardless of pruning
    cols = ["term", "shard_min", "docs_bytes", "tfs_bytes", "blk_n",
            "blk_first", "blk_last", "blk_doc_off", "blk_tf_off"]
    if any_phrase:
        cols += ["pos_bytes", "blk_pos_off"]
    # partition count bounded by the SHARD count: hashing ~7 distinct
    # shard_min values into 32 partitions launches 32 tasks for <=7
    # non-empty ones (pure scheduling overhead on small corpora; at
    # 10^5+ shards the parallelism bound applies instead)
    n_shards = max(1, -(-stats["n_docs"] // shard_size)) if shard_size else 1 << 30
    pre = postings.select(*cols)
    if shard_size is not None and n_shards > 1 and not presplit:
        # r5 CORRECTNESS FIX: a merged (term, salt) row concatenates that
        # term's encodings for EVERY shard ≡ salt (mod n_salts), and its
        # shard_min is only the first covered shard — two terms sharing a
        # shard can carry different shard_min values (a rare term starts
        # at its first shard; a hot term at the residue itself), so
        # hashing merged rows on shard_min splits a docid's evidence
        # across partitions and the per-partition top-k under-scores or
        # drops it.  Slice rows into per-shard sub-rows first (byte
        # slicing at block boundaries — segments.split_rows_by_shard);
        # after the split shard_min IS the shard id and the invariant the
        # plan relies on ("all terms' rows for a docid shard land in the
        # same task") holds by construction.
        _split_schema = ", ".join(f"{c} {_COL_TYPES[c]}" for c in cols)

        def _split(batches):
            for pdf in batches:
                got = segments.split_rows_by_shard(pdf, shard_size, any_phrase)
                if len(got):
                    yield got

        pre = pre.mapInPandas(_split, schema=_split_schema)
    parts = pre.repartition(
        min(max(8, spark.sparkContext.defaultParallelism), n_shards), "shard_min"
    )
    ast_b, leaves_b, filters_b = ast, leaves, filters
    # leaf -> clause index, precomputed: leaves_b.index(n) inside ev()
    # is a linear dataclass-equality scan — O(clauses^2) per partition
    # for a wide wildcard expansion
    leaf_index = {lf: ci for ci, lf in enumerate(leaves)}
    out_schema = "docid long, score float"
    empty_cols = {"docid": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")}
    if emit_fields:
        out_schema += ", " + ", ".join(
            f"{f} {t}" for f, t in zip(emit_fields, emit_types)
        )
        for f, t in zip(emit_fields, emit_types):
            empty_cols[f] = pd.Series(
                dtype="datetime64[us]" if t == "timestamp" else "float64"
            )
    empty = pd.DataFrame(empty_cols)

    def gen(batches):
        import duckdb

        # accumulate decoded rows per (clause, slot) across the partition,
        # then resolve per-leaf postings (shared with the msearch batch
        # generator — see _accumulate_partition / _resolve_leaf_posts)
        acc, pos_acc = _accumulate_partition(batches, term_clauses, prune)
        if not acc:
            yield empty
            return
        leaf_posts = _resolve_leaf_posts(acc, pos_acc, leaves_b, kinds)
        pos_ci = [ci for ci, lf in enumerate(leaves_b) if mult.get(lf, 0)]
        cand_parts = [leaf_posts[ci][0] for ci in pos_ci if ci in leaf_posts]
        if not cand_parts:
            yield empty
            return
        cand = np.unique(np.concatenate(cand_parts))
        if exclude_bc is not None:
            # warm live search: drop tombstoned candidates BEFORE the
            # per-partition top-k, so a deleted doc can never evict a
            # live replacement from the partition's cut (the reason the
            # plan used to gate off under _exclude_dir).  dels is the
            # session's broadcast sorted docid array; scores of the
            # survivors are untouched (pre-merge Lucene semantics).
            dels = exclude_bc.value
            if dels.size:
                idx = np.searchsorted(dels, cand)
                hit = (idx < dels.size) & (
                    dels[np.minimum(idx, dels.size - 1)] == cand
                )
                cand = cand[~hit]
            if not cand.size:
                yield empty
                return

        # norms (+ filter columns) for the candidate set
        if norms_bc is not None:
            norms = norms_bc.value[cand]
            fmask = mask_bc.value[cand] if mask_bc is not None else None
        elif not need_fetch_filters:
            norms = _ranged_norms(docs_dir, shard_size, cand)
            fmask = None
        else:
            norms = np.zeros(cand.size, dtype=np.uint8)
            fmask = np.ones(cand.size, dtype=bool)
            sel = "docid, norm, role, tool, ts"
            for s in np.unique(cand // shard_size):
                lo_d, hi_d = int(s) * shard_size, (int(s) + 1) * shard_size - 1
                nd = duckdb.sql(
                    f"SELECT {sel} FROM read_parquet('{docs_dir}/*.parquet') "
                    f"WHERE docid >= {lo_d} AND docid <= {hi_d} ORDER BY docid"
                ).df()
                fd = nd["docid"].to_numpy()
                idx = np.searchsorted(cand, fd)
                okm = (idx < cand.size) & (cand[np.minimum(idx, cand.size - 1)] == fd)
                norms[idx[okm]] = nd["norm"].to_numpy()[okm].astype(np.uint8)
                if need_fetch_filters:
                    fm = filter_mask(nd["role"], nd["tool"], nd["ts"], filters_b)
                    fmask[idx[okm]] = fm[okm]

        # Sparse per-clause scoring (r6, VERDICT r5 item 5): score each
        # clause only at ITS matching candidates instead of over the full
        # dense (leaves x cand) matrix — a ~500-leaf fuzzy expansion paid
        # O(leaves * cand) in score_tf calls and zero-filled scratch.
        # Bit-identical to the dense form: absent docs scored exact 0.0
        # there (w - w/(1+0) == 0.0), +0.0 is an IEEE no-op, and per-docid
        # additions happen in the same ascending-clause order.  A pure
        # disjunction (the wildcard/fuzzy expansion shape) also skips the
        # presence masks and the boolean tree walk outright: every
        # candidate matches some OR term by construction of `cand`.
        flat_or = isinstance(ast_b, Term) or (
            isinstance(ast_b, Or)
            and all(isinstance(c, Term) for c in ast_b.children)
        )
        present: dict[int, np.ndarray] = {}
        tot = np.zeros(cand.size, dtype=np.float64)
        for ci, (d, t) in leaf_posts.items():
            idx = np.searchsorted(cand, d)
            okm = (idx < cand.size) & (cand[np.minimum(idx, cand.size - 1)] == d)
            pos = idx[okm]
            if not flat_or:
                m = np.zeros(cand.size, dtype=bool)
                m[pos] = True
                present[ci] = m
            if mult_arr[ci]:
                sc = bm25.score_tf(t[okm], norms[pos], weights[ci], cache).astype(np.float64)
                tot[pos] += mult_arr[ci] * sc

        def ev(n: Node) -> np.ndarray:
            if isinstance(n, _LEAF):
                return present.get(leaf_index[n], np.zeros(cand.size, dtype=bool))
            if isinstance(n, And):
                return np.logical_and.reduce([ev(c) for c in n.children])
            if isinstance(n, Or):
                return np.logical_or.reduce([ev(c) for c in n.children])
            if isinstance(n, AtLeast):
                return np.sum([ev(c) for c in n.children], axis=0) >= n.m
            if isinstance(n, Not):
                return ~ev(n.child)
            raise TypeError(n)

        sel_m = np.ones(cand.size, dtype=bool) if flat_or else ev(ast_b)
        if fmask is not None:
            sel_m = sel_m & fmask
        if not sel_m.any():
            yield empty
            return
        d_sel = cand[sel_m]
        s_sel = tot[sel_m].astype(np.float32)
        if k is None:
            # full match set: no per-partition cut, no global order
            cols_out = {"docid": d_sel, "score": s_sel}
            if emit_fields:
                cols_out.update(_ranged_fields(
                    docs_dir, shard_size, d_sel, emit_fields, emit_types
                ))
            yield pd.DataFrame(cols_out)
            return
        order = np.lexsort((d_sel, -s_sel.astype(np.float64)))[:k]
        yield pd.DataFrame({"docid": d_sel[order], "score": s_sel[order]})

    out = parts.mapInPandas(gen, schema=out_schema)
    if k is None:
        return out
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


_POS_SHIFT = np.int64(1) << np.int64(21)  # positions < 2^15 (dl <= 32,766
# bytes), slots <= 255, so per-doc keys span [d*2^21 - 255, d*2^21 + 2^15]
# and can never collide across docids


def _msearch_shard_local(
    spark: SparkSession,
    index_dir: str,
    qids: list[str],
    asts: list[Node],
    filts: list[dict],
    leaves: list[Node],
    weights: list[np.float32],
    stats: dict,
    k: int,
    postings: DataFrame,
    prune: dict | None,
    norms_bc=None,
    mask_bcs: list | None = None,
    presplit: bool = False,
) -> DataFrame:
    """msearch over the fused shard-local plan (r6, VERDICT r5 item 6).

    The pivot-based ``msearch_df`` plan shares the scan but still pays
    decode -> docs join -> (qid, docid) aggregation -> window: 2 data
    exchanges plus a docs-table join per refresh — at sf1 the warm batch
    cost the same ~5 s as cold.  This form extends
    ``_shard_local_topk``'s one-Python-stage evaluation to N queries:
    the union clause space is decoded ONCE per shard partition
    (`_accumulate_partition` / `_resolve_leaf_posts` — shared helpers),
    norms are fetched once for the union candidate set, and each query
    then scores its own candidates sparsely and emits its partition
    top-k.  Global step: one row_number window over <= k x partitions x
    N rows.  Scoring arithmetic matches ``msearch_df`` exactly: per-
    clause float32 scores, float64 sum in ascending GLOBAL clause order
    (absent clauses contribute exact +0.0 there), one final float32
    round — the same order the oracle renders.

    Per-query filters evaluate from the session's broadcast masks when
    given (``mask_bcs``), else from the same ranged docs fetch that
    brings the norms (cold/sharded mode)."""
    any_phrase = any(isinstance(lf, _PHRASELIKE) for lf in leaves)
    kinds = _leaf_eval_kinds(leaves)
    term_clauses = kinds["term_clauses"]
    cache = bm25.norm_inverse_cache(stats["avgdl"])
    shard_size = _shard_size_of(index_dir)
    docs_dir = os.path.join(index_dir, "docs")
    if shard_size is None and norms_bc is None:
        raise ValueError(
            f"_msearch_shard_local needs shard_size from {index_dir}/_build.json "
            "or broadcast norms"
        )
    nq = len(asts)
    leaf_index = {lf: ci for ci, lf in enumerate(leaves)}
    mult_arrs = []
    for ast in asts:
        m = _positive_multiplicity(ast)
        mult_arrs.append(
            np.array([float(m.get(lf, 0.0)) for lf in leaves], dtype=np.float64)
        )
    q_leaf_cis = [sorted({leaf_index[lf] for lf in _leaves(a)}) for a in asts]
    flat_ors = [
        isinstance(a, Term)
        or (isinstance(a, Or) and all(isinstance(c, Term) for c in a.children))
        for a in asts
    ]
    filters_list = [f if filters_active(f) else None for f in filts]
    need_fetch = any(
        f is not None and (mask_bcs is None or mask_bcs[qi] is None)
        for qi, f in enumerate(filters_list)
    )
    if need_fetch and norms_bc is not None:
        # broadcast mode must ship filters as broadcast masks (the ranged
        # fetch below is the SHARDED norms path) — same guard as the
        # single-query plan
        raise ValueError(
            "filtered msearch in broadcast mode requires per-query "
            "filter masks; QuerySession builds them automatically"
        )

    _COL_TYPES = {
        "term": "string", "shard_min": "int",
        "docs_bytes": "binary", "tfs_bytes": "binary", "pos_bytes": "binary",
        "blk_n": "array<int>", "blk_first": "array<long>",
        "blk_last": "array<long>", "blk_doc_off": "array<long>",
        "blk_tf_off": "array<long>", "blk_pos_off": "array<long>",
    }
    cols = ["term", "shard_min", "docs_bytes", "tfs_bytes", "blk_n",
            "blk_first", "blk_last", "blk_doc_off", "blk_tf_off"]
    if any_phrase:
        cols += ["pos_bytes", "blk_pos_off"]
    n_shards = max(1, -(-stats["n_docs"] // shard_size)) if shard_size else 1 << 30
    pre = postings.select(*cols)
    if shard_size is not None and n_shards > 1 and not presplit:
        _split_schema = ", ".join(f"{c} {_COL_TYPES[c]}" for c in cols)

        def _split(batches):
            for pdf in batches:
                got = segments.split_rows_by_shard(pdf, shard_size, any_phrase)
                if len(got):
                    yield got

        pre = pre.mapInPandas(_split, schema=_split_schema)
    parts = pre.repartition(
        min(max(8, spark.sparkContext.defaultParallelism), n_shards), "shard_min"
    )
    asts_b, leaves_b = asts, leaves
    empty = pd.DataFrame(
        {"qn": pd.Series(dtype="int32"), "docid": pd.Series(dtype="int64"),
         "score": pd.Series(dtype="float32")}
    )

    def gen(batches):
        import duckdb

        acc, pos_acc = _accumulate_partition(batches, term_clauses, prune)
        if not acc:
            yield empty
            return
        leaf_posts = _resolve_leaf_posts(acc, pos_acc, leaves_b, kinds)
        if not leaf_posts:
            yield empty
            return
        # one norms (+filter columns) fetch for the union candidate set
        cand_u = np.unique(np.concatenate([d for d, _ in leaf_posts.values()]))
        role_u = tool_u = ts_u = None
        if norms_bc is not None:
            norms_u = norms_bc.value[cand_u]
        elif not need_fetch:
            norms_u = _ranged_norms(docs_dir, shard_size, cand_u)
        else:
            norms_u = np.zeros(cand_u.size, dtype=np.uint8)
            role_u = np.full(cand_u.size, None, dtype=object)
            tool_u = np.full(cand_u.size, None, dtype=object)
            ts_u = np.full(cand_u.size, np.datetime64("NaT", "us"))
            for s in np.unique(cand_u // shard_size):
                lo_d, hi_d = int(s) * shard_size, (int(s) + 1) * shard_size - 1
                nd = duckdb.sql(
                    f"SELECT docid, norm, role, tool, ts "
                    f"FROM read_parquet('{docs_dir}/*.parquet') "
                    f"WHERE docid >= {lo_d} AND docid <= {hi_d} ORDER BY docid"
                ).df()
                fd = nd["docid"].to_numpy()
                idx = np.searchsorted(cand_u, fd)
                okm = (idx < cand_u.size) & (
                    cand_u[np.minimum(idx, cand_u.size - 1)] == fd
                )
                norms_u[idx[okm]] = nd["norm"].to_numpy()[okm].astype(np.uint8)
                role_u[idx[okm]] = nd["role"].to_numpy(dtype=object)[okm]
                tool_u[idx[okm]] = nd["tool"].to_numpy(dtype=object)[okm]
                ts_u[idx[okm]] = nd["ts"].to_numpy()[okm]
        fmask_u_memo: dict[int, np.ndarray] = {}

        out_frames = []
        for qi, ast in enumerate(asts_b):
            marr = mult_arrs[qi]
            pos_parts = [
                leaf_posts[ci][0]
                for ci in q_leaf_cis[qi]
                if marr[ci] and ci in leaf_posts
            ]
            if not pos_parts:
                continue
            cand = np.unique(np.concatenate(pos_parts))
            posu = np.searchsorted(cand_u, cand)  # cand is a subset of cand_u
            norms = norms_u[posu]
            flat = flat_ors[qi]
            present: dict[int, np.ndarray] = {}
            tot = np.zeros(cand.size, dtype=np.float64)
            # ascending GLOBAL clause order — the order msearch_df's
            # float64 score fold adds clauses in
            for ci in q_leaf_cis[qi]:
                if ci not in leaf_posts:
                    continue
                d, t = leaf_posts[ci]
                idx = np.searchsorted(cand, d)
                okm = (idx < cand.size) & (
                    cand[np.minimum(idx, cand.size - 1)] == d
                )
                pos = idx[okm]
                if not flat:
                    m = np.zeros(cand.size, dtype=bool)
                    m[pos] = True
                    present[ci] = m
                if marr[ci]:
                    sc = bm25.score_tf(
                        t[okm], norms[pos], weights[ci], cache
                    ).astype(np.float64)
                    tot[pos] += marr[ci] * sc

            if flat:
                sel_m = np.ones(cand.size, dtype=bool)
            else:
                def ev(n: Node) -> np.ndarray:
                    if isinstance(n, _LEAF):
                        return present.get(
                            leaf_index[n], np.zeros(cand.size, dtype=bool)
                        )
                    if isinstance(n, And):
                        return np.logical_and.reduce([ev(c) for c in n.children])
                    if isinstance(n, Or):
                        return np.logical_or.reduce([ev(c) for c in n.children])
                    if isinstance(n, AtLeast):
                        return np.sum([ev(c) for c in n.children], axis=0) >= n.m
                    if isinstance(n, Not):
                        return ~ev(n.child)
                    raise TypeError(n)

                sel_m = ev(ast)
            f = filters_list[qi]
            if f is not None:
                if mask_bcs is not None and mask_bcs[qi] is not None:
                    sel_m = sel_m & mask_bcs[qi].value[cand]
                else:
                    if qi not in fmask_u_memo:
                        fmask_u_memo[qi] = filter_mask(role_u, tool_u, ts_u, f)
                    sel_m = sel_m & fmask_u_memo[qi][posu]
            if not sel_m.any():
                continue
            d_sel = cand[sel_m]
            s_sel = tot[sel_m].astype(np.float32)
            order = np.lexsort((d_sel, -s_sel.astype(np.float64)))[:k]
            out_frames.append(
                pd.DataFrame(
                    {
                        "qn": np.full(order.size, qi, dtype=np.int32),
                        "docid": d_sel[order],
                        "score": s_sel[order],
                    }
                )
            )
        if not out_frames:
            yield empty
            return
        yield pd.concat(out_frames, ignore_index=True)

    out = parts.mapInPandas(gen, schema="qn int, docid long, score float")
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("qn").orderBy(F.col("score").desc(), F.col("docid").asc())
    out = out.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= int(k)
    )
    qid_arr = F.array(*[F.lit(q) for q in qids])
    return out.select(
        F.element_at(qid_arr, F.col("qn").cast("int") + 1).alias("qid"),
        "docid",
        "score",
    ).orderBy("qid", F.col("score").desc(), F.col("docid").asc())


def _phrase_freq_df(decoded: DataFrame, leaves: list[Node]) -> DataFrame:
    """Resolve phrase clauses: (clause, docid, tf=phrase_freq).

    Vectorized key-intersection (same formulation as
    LocalIndex._phrase_postings): per slot, flatten (docid, position) to
    docid*2^21 + (pos - slot) keys, intersect across slots with np.isin —
    no per-docid Python loop inside the applyInPandas.

    Grouped by (clause, docid-hash bucket), NOT clause alone: a
    single-phrase query would otherwise shuffle every phrase posting into
    ONE task (per-clause serialization point — fatal for a hot phrase at
    scale).  All slots of a docid share the docid, so hash-bucketing by
    docid keeps each doc's slots together and the per-bucket resolution
    independent."""
    n_slots = {ci: len(_slots_of(leaf)) for ci, leaf in enumerate(leaves) if isinstance(leaf, _PHRASELIKE)}
    if not n_slots:
        return None
    b_n = n_slots
    slops = {ci: _leaf_slop(leaf) for ci, leaf in enumerate(leaves) if isinstance(leaf, _PHRASELIKE)}
    spans = {
        ci: (leaf.slop, leaf.in_order)
        for ci, leaf in enumerate(leaves)
        if isinstance(leaf, SpanNear)
    }
    spans_first = {
        ci: leaf.end for ci, leaf in enumerate(leaves) if isinstance(leaf, SpanFirst)
    }
    spans_not = {
        ci: leaf.dist for ci, leaf in enumerate(leaves) if isinstance(leaf, SpanNot)
    }
    spans_contain = {
        ci: (leaf.slop, leaf.in_order,
             "big" if isinstance(leaf, SpanContaining) else "little")
        for ci, leaf in enumerate(leaves)
        if isinstance(leaf, (SpanContaining, SpanWithin))
    }
    intervals_k = {
        ci: (leaf.spec, leaf.terms, leaf.required_slots)
        for ci, leaf in enumerate(leaves)
        if isinstance(leaf, Intervals)
    }
    empty = pd.DataFrame({"clause": [], "docid": [], "tf": []}).astype(
        {"clause": "int32", "docid": "int64", "tf": "float64"}
    )

    def pf(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ci = int(key[0])
        slot_flat = []
        for slot in range(b_n[ci]):
            g = pdf[pdf["slot"] == slot]
            if not len(g):
                if (ci in spans_not and slot == 1) or (
                    ci in intervals_k and slot not in intervals_k[ci][2]
                ):
                    # span_not's exclude slot / a non-required intervals
                    # slot (any_of branch, negated filter reference) is
                    # OPTIONAL: absence = the term simply doesn't occur
                    slot_flat.append((
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.int64),
                    ))
                    continue
                return empty
            pos_arrs = [np.asarray(p, dtype=np.int64) for p in g["pos"]]
            lens = np.fromiter((a.size for a in pos_arrs), dtype=np.int64, count=len(pos_arrs))
            doc_flat = np.repeat(g["docid"].to_numpy(dtype=np.int64), lens)
            pos_flat = (
                np.concatenate(pos_arrs) if pos_arrs else np.empty(0, dtype=np.int64)
            )
            slot_flat.append((doc_flat, pos_flat))
        if ci in intervals_k:
            spec_, terms_, req_ = intervals_k[ci]
            docs, freqs = intervals_freqs_flat(
                [d for d, _ in slot_flat], [p for _, p in slot_flat],
                spec_, terms_, req_,
            )
            return pd.DataFrame({"clause": ci, "docid": docs, "tf": freqs})
        if ci in spans_first:
            docs, freqs = span_first_freqs_flat(
                slot_flat[0][0], slot_flat[0][1], spans_first[ci]
            )
            return pd.DataFrame({"clause": ci, "docid": docs, "tf": freqs})
        if ci in spans_not:
            docs, freqs = span_not_freqs_flat(
                slot_flat[0][0], slot_flat[0][1],
                slot_flat[1][0], slot_flat[1][1],
                spans_not[ci],
            )
            return pd.DataFrame({"clause": ci, "docid": docs, "tf": freqs})
        if ci in spans:
            # span_near: raw-position kernel (functions/spans.py)
            sl, io = spans[ci]
            docs, freqs = span_freqs_flat(
                [d for d, _ in slot_flat], [p for _, p in slot_flat], sl, io
            )
            return pd.DataFrame({"clause": ci, "docid": docs, "tf": freqs})
        if ci in spans_contain:
            sl, io, em = spans_contain[ci]
            docs, freqs = span_contain_freqs_flat(
                [d for d, _ in slot_flat[:-1]], [p for _, p in slot_flat[:-1]],
                slot_flat[-1][0], slot_flat[-1][1], sl, io, em,
            )
            return pd.DataFrame({"clause": ci, "docid": docs, "tf": freqs})
        if slops[ci] > 0:
            # sloppy phrase: per-doc greedy sweep (functions/sloppy.py);
            # freq is the float Lucene sloppy frequency
            docs, freqs = sloppy_freqs_flat(
                [d for d, _ in slot_flat], [p for _, p in slot_flat], slops[ci]
            )
            return pd.DataFrame({"clause": ci, "docid": docs, "tf": freqs})
        keys = None
        for slot, (doc_flat, pos_flat) in enumerate(slot_flat):
            kk = doc_flat * _POS_SHIFT + (pos_flat - slot)
            keys = kk if keys is None else keys[np.isin(keys, kk)]
            if keys.size == 0:
                return empty
        docs, counts = np.unique(keys // _POS_SHIFT, return_counts=True)
        return pd.DataFrame({"clause": ci, "docid": docs, "tf": counts.astype(np.float64)})

    phrase_rows = decoded.filter(F.col("pos").isNotNull())
    nb = max(8, decoded.sparkSession.sparkContext.defaultParallelism)
    return phrase_rows.groupBy(
        "clause", F.pmod(F.col("docid"), F.lit(nb)).alias("_db")
    ).applyInPandas(pf, schema="clause int, docid long, tf double")


def _sql_double_array(vals) -> "F.Column":
    """Array-of-doubles literal as ONE parsed SQL expression: building it
    as N F.lit() calls costs N py4j round trips (measured ~0.7 s of
    driver time per query for the 256-entry norm cache).  repr(float)
    round-trips IEEE754 doubles exactly."""
    return F.expr("array(" + ",".join(repr(float(x)) + "D" for x in vals) + ")")


def _score_expr(weights: list[np.float32], avgdl: float, clause, tf, norm):
    """Clause score as a pure JVM column expression (whole-stage codegen;
    no Python in the scoring path).  The 256-entry norm-inverse cache and
    the per-clause float32 weights become array literals; IEEE754 double
    arithmetic matches the numpy/oracle computation bit-for-bit."""
    cache = bm25.norm_inverse_cache(avgdl)
    cache_arr = _sql_double_array(cache)
    w_arr = _sql_double_array([np.float64(x) for x in weights])
    ninv = F.element_at(cache_arr, norm.cast("int") + 1)
    w = F.element_at(w_arr, clause.cast("int") + 1)
    return (w - w / (F.lit(1.0) + tf.cast("double") * ninv)).cast("float")


def _mask_expr(node: Node, leaves: list[Node]):
    if isinstance(node, _LEAF):
        return F.col(f"c{leaves.index(node)}").isNotNull()
    if isinstance(node, And):
        e = _mask_expr(node.children[0], leaves)
        for c in node.children[1:]:
            e = e & _mask_expr(c, leaves)
        return e
    if isinstance(node, Or):
        e = _mask_expr(node.children[0], leaves)
        for c in node.children[1:]:
            e = e | _mask_expr(c, leaves)
        return e
    if isinstance(node, AtLeast):
        cnt = None
        for c in node.children:
            piece = F.when(_mask_expr(c, leaves), 1).otherwise(0)
            cnt = piece if cnt is None else cnt + piece
        return cnt >= node.m
    if isinstance(node, Not):
        return ~_mask_expr(node.child, leaves)
    raise TypeError(node)


#: warm live search ships the tombstone docid set into the shard-local
#: generator as a broadcast SORTED int64 array (8 B/docid — 80 MB at the
#: cap); past the cap the multi-clause warm path falls back to the cold
#: join plan whose anti-join streams the tombstones instead
EXCLUDE_BROADCAST_CAP = 10_000_000


def _load_tombstone_array(exclude_dir: str) -> np.ndarray:
    """The tombstone log as a sorted, deduplicated int64 docid array —
    driver-side DuckDB scan of the deletes/ parquet (O(log) once per
    distinct tombstone fingerprint; QuerySession memoizes)."""
    import duckdb

    d = duckdb.sql(
        f"SELECT DISTINCT docid FROM read_parquet('{exclude_dir}/*.parquet') "
        "ORDER BY docid"
    ).df()
    return d["docid"].to_numpy().astype(np.int64)


def _tombstone_fingerprint(exclude_dir: str | None):
    """Identity of a tombstone log's CURRENT contents, for memo keys.

    The deletes/ dir is append-only (delete_by_query writes new parquet
    files) and expunge may clear it, so a path string does not identify
    a tombstone SET.  The fingerprint is the sorted (basename, size)
    listing — O(#files) driver-side metadata, no data read.  A missing
    or empty dir fingerprints distinctly from ``None`` (no live-search).
    """
    if exclude_dir is None:
        return None
    try:
        names = sorted(
            (n, os.path.getsize(os.path.join(exclude_dir, n)))
            for n in os.listdir(exclude_dir)
            if n.endswith(".parquet")
        )
    except FileNotFoundError:
        names = []
    return (exclude_dir, tuple(names))


def search_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int | None = 10,
    role: str | None = None,
    tool: str | None = None,
    ts_min=None,
    ts_max=None,
    role_exists: bool = False,
    tool_exists: bool = False,
    role_not: tuple = (),
    tool_not: tuple = (),
    role_not_exists: bool = False,
    tool_not_exists: bool = False,
    search_after: tuple | None = None,
    minimum_should_match: int | None = None,
    collapse: str | None = None,
    *,
    _exclude_dir: str | None = None,
    _exclude_bc=None,
    _stats: dict | None = None,
    _dfs: dict | None = None,
    _docs: DataFrame | None = None,
    _postings: DataFrame | None = None,
    _presplit: bool = False,
    _prune_memo: dict | None = None,
    _norms_bc=None,
    _filter_mask_bc=None,
    _expand_memo: dict | None = None,
    _emit_fields: list[str] | None = None,
    _emit_types: list[str] | None = None,
) -> DataFrame:
    """Distributed BM25 top-k; returns DataFrame(docid long, score float).

    ``_emit_fields``/``_emit_types`` (k=None + r2 format only): append the
    named docs columns to the match-set output from inside the fused
    generator (per-shard ranged reads) so relevance wrappers skip their
    docs join; when the fused branch is not taken the columns are simply
    absent and the caller joins as before.

    ``k=None`` skips the final sort+limit and returns every matching
    doc's score (unordered) — used by function_score / rescore, which
    re-rank on a rewritten score downstream.

    The query string is full DQL: boolean/phrase plus ``role:``/``tool:``
    keyword filters (single value or ``role:(a OR b)`` is-one-of),
    negated filters (``NOT role:x``, ``NOT tool:*``), ``field:*`` exists
    filters, and ``*``/``?``/``~N`` wildcard/fuzzy terms (expanded
    against the term dictionary, SCORING_BOOLEAN_REWRITE, capped at
    MAX_CLAUSE_COUNT).  Field filters merge with the explicit kwargs;
    conflicts raise.

    ``_stats`` / ``_dfs`` / ``_docs`` are warm-session injection points
    (QuerySession): pre-loaded corpus stats, term dfs superset, and a
    persisted docs projection replace the per-query stats/dict reads and
    the docs parquet scan.

    ``_exclude_dir`` is the liveDocs hook (operators/deletes.py): a
    tombstone parquet dir whose docids are anti-joined out before
    collapsing/paging, with theta seeds dropping tombstoned candidates
    so pruning stays exact for the live ranking."""
    ast, dqlf = extract_filters(parse(query), query)
    ast = apply_minimum_should_match(ast, minimum_should_match, query)
    filt = merge_filters(
        query,
        {"role": role, "tool": tool, "ts_min": ts_min, "ts_max": ts_max,
         "role_exists": role_exists, "tool_exists": tool_exists,
         "role_not": tuple(role_not), "tool_not": tuple(tool_not),
         "role_not_exists": role_not_exists, "tool_not_exists": tool_not_exists},
        dqlf,
    )
    role, tool = filt.get("role"), filt.get("tool")
    ts_min, ts_max = filt.get("ts_min"), filt.get("ts_max")
    role_exists = bool(filt.get("role_exists"))
    tool_exists = bool(filt.get("tool_exists"))
    role_not = tuple(filt.get("role_not") or ())
    tool_not = tuple(filt.get("tool_not") or ())
    role_not_exists = bool(filt.get("role_not_exists"))
    tool_not_exists = bool(filt.get("tool_not_exists"))
    if _has_multiterm(ast):
        def _exp(leaf) -> list[str]:
            if _expand_memo is not None and leaf in _expand_memo:
                return _expand_memo[leaf]
            out = _expand_leaf(index_dir, leaf)
            if _expand_memo is not None:
                _expand_memo[leaf] = out
            return out

        ast = expand_multiterm(ast, _exp, MAX_CLAUSE_COUNT)
    _require_positive_coverage(ast, "search_df")
    leaves = _leaves(ast)
    _check_positions(index_dir, leaves)
    terms = sorted({t for lf in leaves for t in _leaf_terms(lf)})
    stats = _stats if _stats is not None else _load_stats(index_dir)
    if _dfs is not None:
        # session df cache; absent terms are cached as 0 so they are not
        # re-fetched per query
        missing = [t for t in terms if t not in _dfs]
        if missing:
            got = _load_dfs(index_dir, missing)
            for t in missing:
                _dfs[t] = got.get(t, 0)
        dfs = {t: _dfs[t] for t in terms if _dfs[t] > 0}
    else:
        dfs = _load_dfs(index_dir, terms)
    weights = _clause_weights(leaves, dfs, stats["doc_count"])

    if _postings is not None:
        # warm session: the postings DataFrame (file listing + schema) is
        # pinned once; per-query work is just the bucket/term filters
        nb = _postings_buckets(index_dir)
        postings = _postings
        if nb and "bucket" in postings.columns:
            bs = sorted({_build.postings_bucket_py(t, nb) for t in terms})
            postings = postings.filter(F.col("bucket").isin(bs))
        postings = postings.filter(F.col("term").isin(terms))
    else:
        postings = _read_postings_spark(spark, index_dir, terms)
    # distributed pruning, two independent exact plans intersected:
    # - theta/block-max (Term/OR-of-Terms; under keyword/time filters the
    #   seed pool is filtered by the same predicates so theta stays a
    #   valid lower bound of the filtered k-th total),
    # - required-term block-coverage intersection (any query shape with
    #   >=2 required terms; a pure superset argument, filter-safe)
    prune = None
    # search_after disables score pruning: the cursor asks for docs BELOW
    # the top-k score frontier, exactly what theta pruning cuts
    if k is not None and k > 0 and search_after is None and "blk_first" in postings.columns:  # r2 format only
        # the tombstone log is append-only and mutable: keying on the
        # path alone would replay a theta seeded against an OLDER
        # (smaller) tombstone set after delete_by_query appends more —
        # the stale theta can exceed the new live k-th total and the
        # block sweep would cut docs that now belong in the live top-k
        # (the _finalize anti-join drops deleted docs but cannot restore
        # pruned replacements).  Fingerprint the log's file listing.
        memo_key = (query, k, role, tool, str(ts_min), str(ts_max), role_exists,
                    tool_exists, role_not, tool_not, role_not_exists,
                    tool_not_exists, minimum_should_match, collapse,
                    _tombstone_fingerprint(_exclude_dir))
        if _prune_memo is not None and memo_key in _prune_memo:
            prune = _prune_memo[memo_key]
        else:
            plans = []
            filters = {"role": role, "tool": tool, "ts_min": ts_min, "ts_max": ts_max,
                       "role_exists": role_exists, "tool_exists": tool_exists,
                       "role_not": role_not, "tool_not": tool_not,
                       "role_not_exists": role_not_exists, "tool_not_exists": tool_not_exists}
            # gate via filters_active ('is not None' for values: role="" /
            # tool="" are legitimate equality filters and must constrain
            # theta seeding)
            f_active = filters_active(filters)
            # theta pruning cuts docs strictly below the raw top-k score
            # frontier — under collapse a group's best hit can live
            # exactly there, so only the match-set-exact coverage prune
            # applies (same reasoning as the search_after cursor gate)
            if collapse is None:
                p = _plan_block_prune(
                    index_dir, ast, leaves, dfs, stats, k,
                    filters=filters if f_active else None,
                    exclude_dir=_exclude_dir,
                )
                if p is not None:
                    plans.append(p)
            p = _plan_intersection_prune(index_dir, ast, stats, dfs)
            if p is not None:
                plans.append(p)
            if plans:
                lo, hi = plans[0]["lo"], plans[0]["hi"]
                for q in plans[1:]:
                    lo, hi = _intersect_ranges((lo, hi), (q["lo"], q["hi"]))
                prune = {"lo": lo, "hi": hi, "shard_size": plans[0]["shard_size"]}
            if _prune_memo is not None:
                _prune_memo[memo_key] = prune
    any_phrase_q = any(isinstance(lf, _PHRASELIKE) for lf in leaves)
    has_filters = filters_active(filt)
    # r5 norms unification (VERDICT r4 plan audit): ANY query without
    # broadcast norms — cold calls and past-the-cap sharded sessions
    # alike — can run the fused generators with per-shard ranged norm
    # reads, so the cold docs-norms join (broadcast under AQE, a full
    # docs-table SMJ at 100x scale) stops being load-bearing.  shard_sz
    # doubles as the format gate: only the r2 builder writes
    # _build.json's shard_size (and the shard_min postings column the
    # fused paths repartition on).
    shard_sz = _shard_size_of(index_dir) if _norms_bc is None else None
    filters_d = (
        {"role": role, "tool": tool, "ts_min": ts_min, "ts_max": ts_max,
         "role_exists": role_exists, "tool_exists": tool_exists,
         "role_not": role_not, "tool_not": tool_not,
         "role_not_exists": role_not_exists, "tool_not_exists": tool_not_exists}
        if has_filters
        else None
    )
    if collapse is not None and collapse not in ("conv_id", "role", "tool"):
        raise ValueError(
            f"collapse supports conv_id/role/tool, got {collapse!r}"
        )

    def _finalize(scored_all: DataFrame) -> DataFrame:
        """Optional field collapsing (OpenSearch ``collapse``: ONE best
        hit per field value — best = (score desc, docid asc) inside the
        group), then the (score desc, docid asc) page.  The window
        shuffles on the collapse key; group sizes are conversation-sized,
        so no skew concern at scale."""
        if _exclude_dir is not None:
            # live search (soft deletes): tombstoned docids drop BEFORE
            # collapsing/paging — a distributed anti-join, never a driver
            # materialization; AQE broadcasts the tombstone side while it
            # fits.  Scores of survivors are untouched (pre-merge Lucene
            # semantics: stats still count deleted docs).
            # no distinct: anti-join semantics ignore duplicate tombstones,
            # and the dedup would cost an extra exchange
            dels = spark.read.parquet(_exclude_dir).select("docid")
            scored_all = scored_all.join(dels, "docid", "left_anti")
        if collapse is not None:
            from pyspark.sql.window import Window as _W

            dc = (
                _docs
                if _docs is not None and collapse in _docs.columns
                else spark.read.parquet(os.path.join(index_dir, "docs"))
            ).select("docid", collapse)
            w = _W.partitionBy(collapse).orderBy(
                F.col("score").desc(), F.col("docid").asc()
            )
            scored_all = (
                scored_all.join(dc, "docid")
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("docid", "score", collapse)
            )
        return _order_page(scored_all, k, search_after)

    if (
        collapse is None
        and not _emit_fields
        and isinstance(ast, Term)
        and len(leaves) == 1
        and (
            (_norms_bc is not None and (not has_filters or _filter_mask_bc is not None))
            or shard_sz is not None
        )
    ):
        # Warm single-term fast path (QuerySession): scoring is FUSED into
        # the decode generator — one Python runner, ZERO exchanges (top-k
        # is a TakeOrdered).  Norms come from the broadcast uint8 array
        # (broadcast mode — the Lucene norms-in-RAM analogue, 1 byte/doc)
        # or, past the broadcast cap, from per-shard ranged reads inside
        # the generator (r4: the sharded mode keeps the zero-exchange
        # plan too).  Arithmetic is the identical float64-then-float32
        # recipe as _score_expr.
        ctx = {
            "w64": np.array([np.float64(w) for w in weights], dtype=np.float64),
            "cache": bm25.norm_inverse_cache(stats["avgdl"]),
            "norms_bc": _norms_bc,
            "mask_bc": _filter_mask_bc,
            "docs_dir": os.path.join(index_dir, "docs"),
            "shard_size": shard_sz,
            # sharded + filtered single terms stay zero-exchange: the
            # filter evaluates inside the generator's ranged norm fetch
            "filters": filters_d if (_norms_bc is None and _filter_mask_bc is None) else None,
        }
        scored, _ = _decode_postings_df(postings, leaves, prune=prune, score_ctx=ctx)
    elif ((_postings is not None or shard_sz is not None)
          and (k is None or k > 0) and search_after is None
          and collapse is None
          and (_exclude_dir is None or _exclude_bc is not None)):
        # (_exclude_dir gate: the shard-local plan takes its per-partition
        # top-k INSIDE the generator, before _finalize's tombstone
        # anti-join could run — a tombstoned doc would evict a live one.
        # r5: with the session's tombstone BROADCAST the generator drops
        # tombstoned candidates itself, before its top-k, so warm live
        # multi-clause/phrase queries keep the fused one-exchange plan;
        # only a tombstone set past EXCLUDE_BROADCAST_CAP falls back to
        # the cold join plan's anti-join)
        # Warm multi-clause / phrase path (r4): shard-local fused
        # evaluation — ONE Python stage after a compressed-bytes
        # repartition on shard_min; handles every query shape including
        # phrases and works both with broadcast norms and with the
        # sharded ranged-fetch fallback past the broadcast cap.
        # r4e: k=None (the relevance wrappers' full-match-set clause
        # shape) runs the same single Python stage emitting every match
        # unordered — strictly less movement than the cold join plan.
        return _shard_local_topk(
            spark, index_dir, ast, leaves, weights, stats, k,
            postings, prune, filters_d, _norms_bc, _filter_mask_bc,
            exclude_bc=_exclude_bc if _exclude_dir is not None else None,
            presplit=_presplit,
            emit_fields=_emit_fields if k is None else None,
            emit_types=_emit_types if k is None else None,
        )
    else:
        decoded, has_phrase = _decode_postings_df(postings, leaves, prune=prune)

        term_rows = (
            decoded.filter(F.col("pos").isNull()) if has_phrase else decoded
        ).select("clause", "docid", F.col("tf").cast("double").alias("tf"))
        parts = [term_rows]
        ph = _phrase_freq_df(decoded, leaves)
        if ph is not None:
            parts.append(ph)
        cand = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

        docs = _docs if _docs is not None else spark.read.parquet(os.path.join(index_dir, "docs"))
        for cond in _docs_filter_conditions(filt):
            docs = docs.filter(cond)
        docs = docs.select("docid", "norm")

        scored = cand.join(docs, "docid").withColumn(
            "score", _score_expr(weights, stats["avgdl"], F.col("clause"), F.col("tf"), F.col("norm"))
        )

    if len(leaves) == 1 and isinstance(ast, _LEAF):
        # single-clause queries (most dashboard searches): one row per
        # docid already — skip the pivot shuffle entirely.  A boost scales
        # the float64 clause score before the final float32 cast, the
        # same arithmetic as the multi-clause paths.
        s = F.col("score").cast("double")
        if ast.boost != 1.0:
            s = s * F.lit(float(ast.boost))
        return _finalize(
            scored.select("docid", s.cast("float").alias("score"))
        )

    if isinstance(ast, Or) and all(isinstance(c, _LEAF) for c in ast.children):
        # flat disjunction (user-written OR and every wildcard expansion):
        # any scored row proves the doc matches, so the boolean mask is
        # free and the total is a single float64 SUM per docid — one
        # narrow aggregation regardless of clause count, instead of a
        # conditional-max column per clause (a 1000-term prefix expansion
        # would otherwise build a 1000-column plan)
        mult_or = _positive_multiplicity(ast)
        mw = [float(mult_or.get(lf, 0)) for lf in leaves]
        s = F.col("score").cast("double")
        if any(m != 1.0 for m in mw):
            s = s * F.element_at(_sql_double_array(mw), F.col("clause").cast("int") + 1)
        return _finalize(
            scored.groupBy("docid")
            .agg(F.sum(s).alias("_t"))
            .select("docid", F.col("_t").cast("float").alias("score"))
        )

    # one conditional max per clause instead of pivot(): pivotfirst plans
    # TWO aggregates/exchanges ((docid, clause) first, then the docid
    # pivot); (docid, clause) rows are unique after decode/phrase
    # resolution, so max-of-one is the value and a single docid
    # aggregation (partial + final, ONE exchange) is equivalent
    pivoted = scored.groupBy("docid").agg(
        *[
            F.max(F.when(F.col("clause") == ci, F.col("score"))).alias(f"c{ci}")
            for ci in range(len(leaves))
        ]
    )

    # float64 sum of float32 clause scores (POSITIVE-path leaves only,
    # weighted by occurrence count: Lucene scores each bool clause
    # independently), rounded once to float32
    mult = _positive_multiplicity(ast)
    total = F.lit(0.0)
    for ci, leaf in enumerate(leaves):
        m = mult.get(leaf, 0)
        if m:
            piece = F.coalesce(F.col(f"c{ci}").cast("double"), F.lit(0.0))
            total = total + (piece if m == 1 else F.lit(float(m)) * piece)
    return _finalize(
        pivoted.filter(_mask_expr(ast, leaves))
        .withColumn("score", total.cast("float"))
        .select("docid", "score")
    )


def msearch_df(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, str],
    k: int | None = 10,
    *,
    _stats: dict | None = None,
    _dfs: dict | None = None,
    _docs: DataFrame | None = None,
    _postings: DataFrame | None = None,
    _prune_memo: dict | None = None,
    _expand_memo: dict | None = None,
    _presplit: bool = False,
    _norms_bc=None,
    _mask_for=None,
) -> DataFrame:
    """Multi-search (the ``_msearch`` API shape): N DQL queries answered
    from ONE postings scan, returning DataFrame(qid string, docid long,
    score float) — each query's (score desc, docid asc) top-k, scores
    identical to per-query ``search_df``.

    A dashboard refresh fires one query per panel against the same index;
    run separately each pays its own postings scan + decode + docs join +
    aggregation.  At 10^12 docs that is N full scans for one refresh.
    Here the batch shares everything shareable:

    - the UNIQUE leaves across all queries form one global clause space —
      a leaf used by five panels is scanned, decoded, phrase-resolved and
      BM25-scored ONCE (clause weights depend only on the leaf and corpus
      stats, never on which query asked);
    - one postings scan covers the union term set (term pushdown + bucket
      partition pruning), pruned to the UNION of per-query coverage
      ranges (each is a match-set superset, so the union covers every
      query's matches);
    - a tiny literal clause->queries fan-out (explode) hands each scored
      row to its queries, and ONE (qid, docid) aggregation pivots every
      query's clauses in a single exchange;
    - per-query boolean masks / keyword+time filters / boost-weighted
      score folds are qid-dispatched column expressions over the shared
      pivot; per-query top-k is one window over the qid partitioning.

    Total: 2 exchanges for the whole batch (aggregation + window) vs
    2N for separate queries — plus one scan instead of N.

    Per-query filters come from DQL atoms only (``role:``/``tool:``/
    ``ts>=`` inside each query string).  ``collapse`` / ``search_after``
    / ``minimum_should_match`` are per-query request options outside the
    query string — not supported here; route those via ``search_df``."""
    if not queries:
        raise ValueError("msearch_df needs at least one query")
    if k is not None and k <= 0:
        raise ValueError(f"msearch_df: k must be a positive int or None, got {k}")
    qids = list(queries)
    none_kwargs = {
        "role": None, "tool": None, "ts_min": None, "ts_max": None,
        "role_exists": False, "tool_exists": False,
        "role_not": (), "tool_not": (),
        "role_not_exists": False, "tool_not_exists": False,
    }

    def _exp(leaf) -> list[str]:
        if _expand_memo is not None and leaf in _expand_memo:
            return _expand_memo[leaf]
        out = _expand_leaf(index_dir, leaf)
        if _expand_memo is not None:
            _expand_memo[leaf] = out
        return out

    asts: list[Node] = []
    filts: list[dict] = []
    for qid in qids:
        q = queries[qid]
        ast, dqlf = extract_filters(parse(q), q)
        filt = merge_filters(q, dict(none_kwargs), dqlf)
        if _has_multiterm(ast):
            ast = expand_multiterm(ast, _exp, MAX_CLAUSE_COUNT)
        _require_positive_coverage(ast, f"msearch_df[{qid!r}]")
        asts.append(ast)
        filts.append(filt)

    # global clause space: unique leaves across the batch
    leaves: list[Node] = []
    for ast in asts:
        for lf in _leaves(ast):
            if lf not in leaves:
                leaves.append(lf)
    _check_positions(index_dir, leaves)
    terms = sorted({t for lf in leaves for t in _leaf_terms(lf)})
    stats = _stats if _stats is not None else _load_stats(index_dir)
    if _dfs is not None:
        missing = [t for t in terms if t not in _dfs]
        if missing:
            got = _load_dfs(index_dir, missing)
            for t in missing:
                _dfs[t] = got.get(t, 0)
        dfs = {t: _dfs[t] for t in terms if _dfs[t] > 0}
    else:
        dfs = _load_dfs(index_dir, terms)
    weights = _clause_weights(leaves, dfs, stats["doc_count"])

    if _postings is not None:
        nb = _postings_buckets(index_dir)
        postings = _postings
        if nb and "bucket" in postings.columns:
            bs = sorted({_build.postings_bucket_py(t, nb) for t in terms})
            postings = postings.filter(F.col("bucket").isin(bs))
        postings = postings.filter(F.col("term").isin(terms))
    else:
        postings = _read_postings_spark(spark, index_dir, terms)

    # shared-decode pruning: the union of per-query coverage ranges.  All
    # queries must yield a plan (an unprunable query needs every block, so
    # the shared decode can't drop any); an EMPTY per-query plan (provably
    # no matches) simply contributes nothing to the union.  Theta pruning
    # is per-query-score-frontier-specific and does not compose here.
    prune = None
    if k is not None and "blk_first" in postings.columns:
        memo_key = ("msearch", tuple(qids), tuple(queries[q] for q in qids), k)
        if _prune_memo is not None and memo_key in _prune_memo:
            prune = _prune_memo[memo_key]
        else:
            plans = []
            for ast in asts:
                p = _plan_intersection_prune(index_dir, ast, stats, dfs)
                if p is None:
                    plans = None
                    break
                plans.append(p)
            if plans:
                # union of the per-query coverage ranges: a docid outside
                # every query's coverage cannot match any of them (each
                # plan is a match-set superset)
                lo, hi = plans[0]["lo"], plans[0]["hi"]
                for p in plans[1:]:
                    lo, hi = _union_ranges((lo, hi), (p["lo"], p["hi"]))
                prune = {"lo": lo, "hi": hi, "shard_size": plans[0]["shard_size"]}
            if _prune_memo is not None:
                _prune_memo[memo_key] = prune

    # r6: the fused shard-local batch plan (one Python stage + one window)
    # replaces decode -> docs join -> pivot -> window whenever the r2
    # format's shard geometry is available — cold AND warm (the warm
    # session's pre-split pinned listing skips the split pass too)
    shard_sz = _shard_size_of(index_dir)
    if (
        k is not None
        and k > 0
        and "blk_first" in postings.columns
        and (shard_sz is not None or _norms_bc is not None)
    ):
        mask_bcs = (
            [_mask_for(f) for f in filts] if _mask_for is not None else None
        )
        return _msearch_shard_local(
            spark, index_dir, qids, asts, filts, leaves, weights, stats, k,
            postings, prune, norms_bc=_norms_bc, mask_bcs=mask_bcs,
            presplit=_presplit,
        )

    decoded, has_phrase = _decode_postings_df(postings, leaves, prune=prune)
    term_rows = (
        decoded.filter(F.col("pos").isNull()) if has_phrase else decoded
    ).select("clause", "docid", F.col("tf").cast("double").alias("tf"))
    parts = [term_rows]
    ph = _phrase_freq_df(decoded, leaves)
    if ph is not None:
        parts.append(ph)
    cand = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

    # docs projection: norm always; keyword/ts columns only if some query
    # in the batch filters on them
    need_cols = ["docid", "norm"]
    for fld in ("role", "tool"):
        if any(
            f.get(fld) is not None or f.get(f"{fld}_not")
            or f.get(f"{fld}_exists") or f.get(f"{fld}_not_exists")
            for f in filts
        ):
            need_cols.append(fld)
    if any(f.get("ts_min") is not None or f.get("ts_max") is not None for f in filts):
        need_cols.append("ts")
    docs = _docs if _docs is not None else spark.read.parquet(os.path.join(index_dir, "docs"))
    docs = docs.select(*need_cols)

    scored = cand.join(docs, "docid").withColumn(
        "score",
        _score_expr(weights, stats["avgdl"], F.col("clause"), F.col("tf"), F.col("norm")),
    )

    # clause -> queries fan-out (tiny literal): each shared leaf's scored
    # rows explode to exactly the queries that reference it
    leaf_sets = [set(_leaves(ast)) for ast in asts]
    qids_for_clause = [
        [qi for qi, ls in enumerate(leaf_sets) if leaf in ls] for leaf in leaves
    ]
    fan = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(str(q) for q in qs) + ")" for qs in qids_for_clause
        )
        + ")"
    )
    fanned = scored.withColumn(
        "qn", F.explode(F.element_at(fan, F.col("clause").cast("int") + 1))
    )

    # ONE (qid, docid) aggregation for the whole batch: conditional max
    # per global clause ((qn, docid, clause) rows are unique, so max-of-one
    # is the value); keyword/ts columns are per-docid constants, max picks
    # the value through
    aggs = [
        F.max(F.when(F.col("clause") == ci, F.col("score"))).alias(f"c{ci}")
        for ci in range(len(leaves))
    ] + [F.max(c).alias(c) for c in need_cols[2:]]
    pivoted = fanned.groupBy("qn", "docid").agg(*aggs)

    # per-query mask + filters + boost-weighted float64 score fold,
    # qid-dispatched (same arithmetic as the cold pivot path)
    keep = F.lit(False)
    score_chain = None
    for qi, (ast, filt) in enumerate(zip(asts, filts)):
        cond = (F.col("qn") == qi) & _mask_expr(ast, leaves)
        for c in _docs_filter_conditions(filt):
            cond = cond & c
        keep = keep | cond
        mult = _positive_multiplicity(ast)
        total = F.lit(0.0)
        for ci, leaf in enumerate(leaves):
            m = mult.get(leaf, 0)
            if m:
                piece = F.coalesce(F.col(f"c{ci}").cast("double"), F.lit(0.0))
                total = total + (piece if m == 1 else F.lit(float(m)) * piece)
        score_chain = (
            F.when(F.col("qn") == qi, total)
            if score_chain is None
            else score_chain.when(F.col("qn") == qi, total)
        )
    out = pivoted.filter(keep).withColumn("score", score_chain.cast("float"))

    if k is not None:
        from pyspark.sql.window import Window as _W

        w = _W.partitionBy("qn").orderBy(F.col("score").desc(), F.col("docid").asc())
        out = out.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= int(k)
        )
    qid_arr = F.array(*[F.lit(q) for q in qids])
    return out.select(
        F.element_at(qid_arr, F.col("qn").cast("int") + 1).alias("qid"),
        "docid",
        "score",
    ).orderBy("qid", F.col("score").desc(), F.col("docid").asc())


def _dis_max_shard_local(
    spark: SparkSession,
    index_dir: str,
    asts: list[Node],
    filts: list[dict],
    leaves: list[Node],
    weights: list[np.float32],
    stats: dict,
    k: int,
    tie_breaker: float,
    postings: DataFrame,
    prune: dict | None,
    norms_bc=None,
    mask_bcs: list | None = None,
    presplit: bool = False,
) -> DataFrame:
    """dis_max over the fused shard-local plan (r6).

    ``dis_max_df``'s union plan evaluates every clause query as its own
    full ``search_df(k=None)`` job (N scans + N decode stages), unions
    the match sets and pays a groupBy(docid) exchange for the
    conditional-max combine.  The combine is per-docid and every clause
    score for a docid is complete inside its shard partition (the same
    co-location argument as the single-query fused plan), so the whole
    dis_max can run in ONE Python stage: the union clause space is
    decoded once per shard partition, each clause query scores its own
    candidates, and the ``max + tie_breaker * (sum - max)`` fold runs in
    numpy over the partition's union match set, followed by a partition
    top-k and the global (score desc, docid asc) page.

    Arithmetic is exactly ``dis_max_df``'s: per-clause float32 scores
    from the standalone recipe — the float64 fold adds each clause
    query's leaves in that QUERY'S OWN leaf order (``_leaves(ast)``),
    matching the per-query ``_shard_local_topk`` fold, NOT msearch's
    global clause order — then per docid float64 s_i (exact 0.0 when the
    clause misses: ``coalesce(max(...), 0.0)``), ``greatest`` ==
    elementwise ``np.maximum``, a left-to-right float64 clause sum, and
    one final float32 round.  Bit-identical to the union plan (tested)."""
    any_phrase = any(isinstance(lf, _PHRASELIKE) for lf in leaves)
    kinds = _leaf_eval_kinds(leaves)
    term_clauses = kinds["term_clauses"]
    cache = bm25.norm_inverse_cache(stats["avgdl"])
    shard_size = _shard_size_of(index_dir)
    docs_dir = os.path.join(index_dir, "docs")
    if shard_size is None and norms_bc is None:
        raise ValueError(
            f"_dis_max_shard_local needs shard_size from {index_dir}/_build.json "
            "or broadcast norms"
        )
    leaf_index = {lf: ci for ci, lf in enumerate(leaves)}
    mult_arrs = []
    for ast in asts:
        m = _positive_multiplicity(ast)
        mult_arrs.append(
            np.array([float(m.get(lf, 0.0)) for lf in leaves], dtype=np.float64)
        )
    # per-clause-query fold order = the query's OWN leaf order (the order
    # _resolve_leaf_posts inserts / _shard_local_topk adds in standalone
    # evaluation) — float64 addition is commutative but not associative,
    # so a 3+-leaf clause folded in msearch's global order could differ
    # in the last ulp from the union plan's per-query search_df score
    q_leaf_cis = [[leaf_index[lf] for lf in _leaves(a)] for a in asts]
    flat_ors = [
        isinstance(a, Term)
        or (isinstance(a, Or) and all(isinstance(c, Term) for c in a.children))
        for a in asts
    ]
    filters_list = [f if filters_active(f) else None for f in filts]
    need_fetch = any(
        f is not None and (mask_bcs is None or mask_bcs[qi] is None)
        for qi, f in enumerate(filters_list)
    )
    if need_fetch and norms_bc is not None:
        raise ValueError(
            "filtered dis_max in broadcast mode requires per-clause "
            "filter masks; QuerySession builds them automatically"
        )

    _COL_TYPES = {
        "term": "string", "shard_min": "int",
        "docs_bytes": "binary", "tfs_bytes": "binary", "pos_bytes": "binary",
        "blk_n": "array<int>", "blk_first": "array<long>",
        "blk_last": "array<long>", "blk_doc_off": "array<long>",
        "blk_tf_off": "array<long>", "blk_pos_off": "array<long>",
    }
    cols = ["term", "shard_min", "docs_bytes", "tfs_bytes", "blk_n",
            "blk_first", "blk_last", "blk_doc_off", "blk_tf_off"]
    if any_phrase:
        cols += ["pos_bytes", "blk_pos_off"]
    n_shards = max(1, -(-stats["n_docs"] // shard_size)) if shard_size else 1 << 30
    pre = postings.select(*cols)
    if shard_size is not None and n_shards > 1 and not presplit:
        _split_schema = ", ".join(f"{c} {_COL_TYPES[c]}" for c in cols)

        def _split(batches):
            for pdf in batches:
                got = segments.split_rows_by_shard(pdf, shard_size, any_phrase)
                if len(got):
                    yield got

        pre = pre.mapInPandas(_split, schema=_split_schema)
    parts = pre.repartition(
        min(max(8, spark.sparkContext.defaultParallelism), n_shards), "shard_min"
    )
    asts_b = asts
    tie64 = np.float64(float(tie_breaker))
    nq = len(asts)
    empty = pd.DataFrame(
        {"docid": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")}
    )

    def gen(batches):
        import duckdb

        acc, pos_acc = _accumulate_partition(batches, term_clauses, prune)
        if not acc:
            yield empty
            return
        leaf_posts = _resolve_leaf_posts(acc, pos_acc, leaves, kinds)
        if not leaf_posts:
            yield empty
            return
        # one norms (+filter columns) fetch for the union candidate set
        cand_u = np.unique(np.concatenate([d for d, _ in leaf_posts.values()]))
        role_u = tool_u = ts_u = None
        if norms_bc is not None:
            norms_u = norms_bc.value[cand_u]
        elif not need_fetch:
            norms_u = _ranged_norms(docs_dir, shard_size, cand_u)
        else:
            norms_u = np.zeros(cand_u.size, dtype=np.uint8)
            role_u = np.full(cand_u.size, None, dtype=object)
            tool_u = np.full(cand_u.size, None, dtype=object)
            ts_u = np.full(cand_u.size, np.datetime64("NaT", "us"))
            for s in np.unique(cand_u // shard_size):
                lo_d, hi_d = int(s) * shard_size, (int(s) + 1) * shard_size - 1
                nd = duckdb.sql(
                    f"SELECT docid, norm, role, tool, ts "
                    f"FROM read_parquet('{docs_dir}/*.parquet') "
                    f"WHERE docid >= {lo_d} AND docid <= {hi_d} ORDER BY docid"
                ).df()
                fd = nd["docid"].to_numpy()
                idx = np.searchsorted(cand_u, fd)
                okm = (idx < cand_u.size) & (
                    cand_u[np.minimum(idx, cand_u.size - 1)] == fd
                )
                norms_u[idx[okm]] = nd["norm"].to_numpy()[okm].astype(np.uint8)
                role_u[idx[okm]] = nd["role"].to_numpy(dtype=object)[okm]
                tool_u[idx[okm]] = nd["tool"].to_numpy(dtype=object)[okm]
                ts_u[idx[okm]] = nd["ts"].to_numpy()[okm]
        fmask_u_memo: dict[int, np.ndarray] = {}

        # per-clause-query match sets, standalone-identical scores
        got: list[tuple | None] = []
        for qi, ast in enumerate(asts_b):
            marr = mult_arrs[qi]
            pos_parts = [
                leaf_posts[ci][0]
                for ci in q_leaf_cis[qi]
                if marr[ci] and ci in leaf_posts
            ]
            if not pos_parts:
                got.append(None)
                continue
            cand = np.unique(np.concatenate(pos_parts))
            posu = np.searchsorted(cand_u, cand)
            norms = norms_u[posu]
            flat = flat_ors[qi]
            present: dict[int, np.ndarray] = {}
            tot = np.zeros(cand.size, dtype=np.float64)
            for ci in q_leaf_cis[qi]:
                if ci not in leaf_posts:
                    continue
                d, t = leaf_posts[ci]
                idx = np.searchsorted(cand, d)
                okm = (idx < cand.size) & (
                    cand[np.minimum(idx, cand.size - 1)] == d
                )
                pos = idx[okm]
                if not flat:
                    m = np.zeros(cand.size, dtype=bool)
                    m[pos] = True
                    present[ci] = m
                if marr[ci]:
                    sc = bm25.score_tf(
                        t[okm], norms[pos], weights[ci], cache
                    ).astype(np.float64)
                    tot[pos] += marr[ci] * sc

            if flat:
                sel_m = np.ones(cand.size, dtype=bool)
            else:
                def ev(n: Node) -> np.ndarray:
                    if isinstance(n, _LEAF):
                        return present.get(
                            leaf_index[n], np.zeros(cand.size, dtype=bool)
                        )
                    if isinstance(n, And):
                        return np.logical_and.reduce([ev(c) for c in n.children])
                    if isinstance(n, Or):
                        return np.logical_or.reduce([ev(c) for c in n.children])
                    if isinstance(n, AtLeast):
                        return np.sum([ev(c) for c in n.children], axis=0) >= n.m
                    if isinstance(n, Not):
                        return ~ev(n.child)
                    raise TypeError(n)

                sel_m = ev(ast)
            f = filters_list[qi]
            if f is not None:
                if mask_bcs is not None and mask_bcs[qi] is not None:
                    sel_m = sel_m & mask_bcs[qi].value[cand]
                else:
                    if qi not in fmask_u_memo:
                        fmask_u_memo[qi] = filter_mask(role_u, tool_u, ts_u, f)
                    sel_m = sel_m & fmask_u_memo[qi][posu]
            if not sel_m.any():
                got.append(None)
                continue
            got.append((cand[sel_m], tot[sel_m].astype(np.float32)))

        if all(g is None for g in got):
            yield empty
            return
        # dis_max combine over the union match set — dis_max_df's exact
        # arithmetic: s_i = double(float32 clause score) or exact 0.0,
        # greatest == np.maximum, left-to-right float64 sum, one float32
        # round.  Per-docid, hence shard-local-complete.
        u = np.unique(np.concatenate([g[0] for g in got if g is not None]))
        svecs = []
        for g in got:
            sv = np.zeros(u.size, dtype=np.float64)
            if g is not None:
                sv[np.searchsorted(u, g[0])] = g[1].astype(np.float64)
            svecs.append(sv)
        mx = svecs[0]
        for sv in svecs[1:]:
            mx = np.maximum(mx, sv)
        sm = svecs[0]
        for sv in svecs[1:]:
            sm = sm + sv
        final = (mx + tie64 * (sm - mx)).astype(np.float32)
        order = np.lexsort((u, -final.astype(np.float64)))[:k]
        yield pd.DataFrame({"docid": u[order], "score": final[order]})

    out = parts.mapInPandas(gen, schema="docid long, score float")
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(int(k))


def dis_max_fused(
    spark: SparkSession,
    index_dir: str,
    queries: list[str],
    k: int = 10,
    tie_breaker: float = 0.0,
    session=None,
) -> DataFrame | None:
    """Fused one-stage dis_max plan (r6) — or None when the r2 shard
    geometry is unavailable, in which case ``relevance.dis_max_df`` falls
    back to its union-of-match-sets plan.  With a warm ``session`` the
    pinned stats / dfs / postings (pre-split) / norms / filter masks are
    reused, mirroring ``QuerySession.msearch``."""
    if not queries or k is None or k <= 0:
        return None
    _stats = session.stats if session is not None else None
    _dfs = session._dfs if session is not None else None
    _postings = session.postings if session is not None else None
    _prune_memo = session._prune_memo if session is not None else None
    _expand_memo = session._expand_memo if session is not None else None
    presplit = session._presplit if session is not None else False
    norms_bc = session.norms_bc if session is not None else None

    none_kwargs = {
        "role": None, "tool": None, "ts_min": None, "ts_max": None,
        "role_exists": False, "tool_exists": False,
        "role_not": (), "tool_not": (),
        "role_not_exists": False, "tool_not_exists": False,
    }

    def _exp(leaf) -> list[str]:
        if _expand_memo is not None and leaf in _expand_memo:
            return _expand_memo[leaf]
        out = _expand_leaf(index_dir, leaf)
        if _expand_memo is not None:
            _expand_memo[leaf] = out
        return out

    asts: list[Node] = []
    filts: list[dict] = []
    for i, q in enumerate(queries):
        ast, dqlf = extract_filters(parse(q), q)
        filt = merge_filters(q, dict(none_kwargs), dqlf)
        if _has_multiterm(ast):
            ast = expand_multiterm(ast, _exp, MAX_CLAUSE_COUNT)
        _require_positive_coverage(ast, f"dis_max_df[{i}]")
        asts.append(ast)
        filts.append(filt)

    leaves: list[Node] = []
    for ast in asts:
        for lf in _leaves(ast):
            if lf not in leaves:
                leaves.append(lf)
    _check_positions(index_dir, leaves)
    terms = sorted({t for lf in leaves for t in _leaf_terms(lf)})
    stats = _stats if _stats is not None else _load_stats(index_dir)
    if _dfs is not None:
        missing = [t for t in terms if t not in _dfs]
        if missing:
            got = _load_dfs(index_dir, missing)
            for t in missing:
                _dfs[t] = got.get(t, 0)
        dfs = {t: _dfs[t] for t in terms if _dfs[t] > 0}
    else:
        dfs = _load_dfs(index_dir, terms)
    weights = _clause_weights(leaves, dfs, stats["doc_count"])

    if _postings is not None:
        nb = _postings_buckets(index_dir)
        postings = _postings
        if nb and "bucket" in postings.columns:
            bs = sorted({_build.postings_bucket_py(t, nb) for t in terms})
            postings = postings.filter(F.col("bucket").isin(bs))
        postings = postings.filter(F.col("term").isin(terms))
    else:
        postings = _read_postings_spark(spark, index_dir, terms)

    shard_sz = _shard_size_of(index_dir)
    if "blk_first" not in postings.columns or (
        shard_sz is None and norms_bc is None
    ):
        return None

    # shared-decode pruning: union of per-clause coverage ranges (each a
    # match-set superset — the same composition rule as msearch_df; theta
    # pruning is per-query-frontier-specific and does not compose)
    prune = None
    memo_key = ("dis_max", tuple(queries), k)
    if _prune_memo is not None and memo_key in _prune_memo:
        prune = _prune_memo[memo_key]
    else:
        plans = []
        for ast in asts:
            p = _plan_intersection_prune(index_dir, ast, stats, dfs)
            if p is None:
                plans = None
                break
            plans.append(p)
        if plans:
            lo, hi = plans[0]["lo"], plans[0]["hi"]
            for p in plans[1:]:
                lo, hi = _union_ranges((lo, hi), (p["lo"], p["hi"]))
            prune = {"lo": lo, "hi": hi, "shard_size": plans[0]["shard_size"]}
        if _prune_memo is not None:
            _prune_memo[memo_key] = prune

    mask_bcs = (
        [session._filter_mask_bc(f) for f in filts]
        if session is not None
        else None
    )
    return _dis_max_shard_local(
        spark, index_dir, asts, filts, leaves, weights, stats, k,
        tie_breaker, postings, prune, norms_bc=norms_bc, mask_bcs=mask_bcs,
        presplit=presplit,
    )


def match_docids_df(spark: SparkSession, index_dir: str, query: str) -> DataFrame:
    """The boolean MATCH SET of a query as DataFrame(docid) — posting-set
    algebra as DataFrame set ops: intersect = inner join, union =
    distinct union, NOT = left_anti (SURVEY.md §2.3 bool query).  NOT is
    supported as a direct child of AND (the 'a AND NOT b' filter shape);
    other NOT placements need a complement scan — rejected with
    ValueError.  DQL field filters become a left-semi join against the
    filtered docs projection; wildcards/fuzzy expand against the
    dictionary like search_df.

    The building block for the reference's query-plus-aggregations
    request shape: ``match_count_df`` counts it, ``match_agg_df`` runs
    dashboard aggregations over it."""
    ast, dqlf = extract_filters(parse(query), query)
    if _has_multiterm(ast):
        ast = expand_multiterm(
            ast, lambda lf: _expand_leaf(index_dir, lf), MAX_CLAUSE_COUNT
        )
    _require_positive_coverage(ast, "match_count_df")

    def check_not_shape(n: Node, parent_is_and: bool = False) -> None:
        if isinstance(n, Not):
            if not parent_is_and:
                raise ValueError(
                    "match_count_df supports NOT only as a direct child of "
                    "AND ('a AND NOT b'); rewrite the query or use LocalIndex"
                )
            check_not_shape(n.child, False)
        elif isinstance(n, And):
            for c in n.children:
                check_not_shape(c, True)
        elif isinstance(n, Or):
            for c in n.children:
                check_not_shape(c, False)

    check_not_shape(ast)
    leaves = _leaves(ast)
    terms = sorted({t for lf in leaves for t in _leaf_terms(lf)})
    postings = _read_postings_spark(spark, index_dir, terms)
    decoded, has_phrase = _decode_postings_df(postings, leaves)
    clause_docs: dict[int, DataFrame] = {}
    for ci, leaf in enumerate(leaves):
        if isinstance(leaf, Term):
            rows = decoded.filter(F.col("clause") == ci)
            if has_phrase:
                rows = rows.filter(F.col("pos").isNull())
            clause_docs[ci] = rows.select("docid").distinct()
    ph = _phrase_freq_df(decoded, leaves)
    if ph is not None:
        for ci, leaf in enumerate(leaves):
            if isinstance(leaf, _PHRASELIKE):
                clause_docs[ci] = ph.filter(F.col("clause") == ci).select("docid").distinct()

    def combine(node: Node) -> DataFrame:
        if isinstance(node, _LEAF):
            return clause_docs[leaves.index(node)]
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            out = combine(pos[0])
            for c in pos[1:]:
                out = out.join(combine(c), "docid")
            for c in neg:
                out = out.join(combine(c), "docid", "left_anti")
            return out
        if isinstance(node, Or):
            out = combine(node.children[0])
            for c in node.children[1:]:
                out = out.unionByName(combine(c))
            return out.distinct()
        raise TypeError(node)

    matched = combine(ast)
    if dqlf:
        docs = spark.read.parquet(os.path.join(index_dir, "docs"))
        for cond in _docs_filter_conditions(dqlf):
            docs = docs.filter(cond)
        matched = matched.join(docs.select("docid"), "docid", "left_semi")
    return matched


def suggest_terms(
    index_dir: str,
    text: str,
    max_edits: int = 2,
    n: int = 5,
    min_df: int = 1,
) -> list[dict]:
    """OpenSearch ``term`` suggester (the _search ``suggest`` block /
    did-you-mean): for every analyzed token of ``text``, candidate
    dictionary terms within ``max_edits`` classic-Levenshtein edits,
    ranked the way Lucene's DirectSpellChecker does — distance asc, doc
    frequency desc, term asc — top ``n`` per token.  Tokens already in
    the dictionary (distance 0) return themselves first, like the
    suggester's default missing-mode still reporting matches.

    Driver-side dictionary scan (bounded by vocabulary, memoizable like
    fuzzy expansion); returns
    [{token, suggestions: [(term, distance, df), ...]}, ...]."""
    import duckdb

    from ..functions.analysis import tokenize as _tok

    out = []
    for token in _tok(text):
        q = token.replace("'", "''")
        e = int(max_edits)
        rows = duckdb.sql(
            f"SELECT term, levenshtein(term, '{q}') AS dist, df "
            f"FROM {_dict_sources(index_dir)} "
            f"WHERE abs(length(term) - {len(token)}) <= {e} "
            f"AND levenshtein(term, '{q}') <= {e} AND df >= {int(min_df)} "
            f"ORDER BY dist ASC, df DESC, term ASC LIMIT {int(n)}"
        ).fetchall()
        out.append(
            {"token": token,
             "suggestions": [(t, int(d), int(df)) for t, d, df in rows]}
        )
    return out


def search_multi_df(
    spark: SparkSession,
    index_dirs: list[str],
    query: str,
    k: int = 10,
    **filters,
) -> DataFrame:
    """Alias search over rotated indexes — the reference's deployment
    shape (the es-loader writes monthly/weekly/daily rotated indexes via
    ``__index_name`` routing; every dashboard queries the ``log-*``
    alias).  Faithfully reproduces OpenSearch's default query_then_fetch
    semantics: EACH index scores with its OWN statistics (idf/avgdl
    local to the index, like per-shard stats) and results merge by score
    value even though scores are not strictly comparable across indexes
    — that is exactly what an OpenSearch alias search returns.

    Merge order: score desc, index order asc, docid asc.  Returns
    (index_ord, docid, score); docids are index-local.  Scatter/gather:
    per-index top-k (each its own pruned plan) then a k×n_indexes-row
    merge — the global top-k is provably inside the union of per-index
    top-ks."""
    if not index_dirs:
        raise ValueError("search_multi_df needs at least one index")
    parts = [
        search_df(spark, d, query, k=k, **filters).select(
            F.lit(i).alias("index_ord"), "docid", "score"
        )
        for i, d in enumerate(index_dirs)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(
        F.col("score").desc(), F.col("index_ord").asc(), F.col("docid").asc()
    ).limit(k)


def _truncate_text_col(text: Column) -> Column:
    """ASCII column form of analysis.truncate_big_field (bytes == chars,
    exactly like sql_truncate_expr — the corpus contract)."""
    return F.when(
        F.length(text) > _analysis.TRUNCATE_BYTES,
        F.concat(
            F.substring(text, 1, _analysis.TRUNCATE_KEEP),
            F.lit(_analysis.TRUNCATE_MARK),
        ),
    ).otherwise(text)


def highlight_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    pre: str = "<em>",
    post: str = "</em>",
    **filters,
) -> DataFrame:
    """Hit highlighting for the top-k results — the OpenSearch
    ``highlight`` response block (Dashboards wraps matches in <em> by
    default).  Works over the frozen analyzer's TOKEN STREAM: the stored
    text is re-tokenized (truncate -> lowercase -> word runs, identical
    to indexing) and every token in the query's term set — after
    wildcard/fuzzy dictionary expansion — wraps in pre/post.  Phrase
    terms highlight individually (a documented simplification of
    positional phrase highlighting).  Returns (docid, score, highlight).

    Plan: top-k (k rows) broadcast-joined into the docs projection —
    the highlight projection runs on k rows, never the corpus."""
    ast, _ = extract_filters(parse(query), query)
    if _has_multiterm(ast):
        ast = expand_multiterm(
            ast, lambda lf: _expand_leaf(index_dir, lf), MAX_CLAUSE_COUNT
        )
    terms = sorted(set(query_terms(ast)))
    hits = search_df(spark, index_dir, query, k=k, **filters)
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).select("docid", "text")
    joined = docs.join(F.broadcast(hits), "docid")
    toks = F.filter(
        F.split(
            F.lower(F.coalesce(_truncate_text_col(F.col("text")), F.lit(""))),
            _analysis.SQL_SPLIT_RE,
        ),
        lambda x: x != "",
    )
    tset = F.array(*[F.lit(t) for t in terms])
    hl = F.array_join(
        F.transform(
            toks,
            lambda t: F.when(
                F.array_contains(tset, t), F.concat(F.lit(pre), t, F.lit(post))
            ).otherwise(t),
        ),
        " ",
    )
    return joined.select("docid", "score", hl.alias("highlight")).orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )


def match_count_df(spark: SparkSession, index_dir: str, query: str) -> DataFrame:
    """Boolean match count (no scoring): count over ``match_docids_df``."""
    return match_docids_df(spark, index_dir, query).agg(
        F.count("*").alias("n_matches")
    )


def match_agg_df(
    spark: SparkSession, index_dir: str, query: str, agg
) -> DataFrame:
    """The reference's standard request shape — a DQL query plus
    aggregations evaluated over the MATCHING documents (every dashboard
    panel is this: query context + visState aggs).  ``agg(docs)``
    receives the matched docs projection (docid, conv_id, turn_idx,
    role, tool, ts, norm) and returns any aggregation DataFrame (the
    operators in ``operators.aggs`` compose directly).

    Plan shape: the match set (posting algebra, candidate-sized) joins
    the docs projection once, then the aggregation runs with normal
    partial+final aggregation — at 100 TB the join input is the match
    set, never the corpus."""
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    matched = docs.join(
        match_docids_df(spark, index_dir, query), "docid", "left_semi"
    )
    return agg(matched)


def terms_enum_df(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    n: int = 10,
    by_df: bool = True,
) -> DataFrame:
    """The OpenSearch ``_terms_enum`` API (field-value autocomplete):
    dictionary terms with the given prefix — by descending doc frequency
    (term asc tie-break) when ``by_df``, else plain dictionary order
    (the _terms_enum default).  A pure dictionary range scan: the dict
    parquet is term-sorted within files, so zonemaps prune to the
    matching region — O(prefix region), never O(vocabulary)."""
    pfx = prefix.lower()
    if not pfx:
        raise ValueError("terms_enum: empty prefix")
    hi = pfx[:-1] + chr(ord(pfx[-1]) + 1)
    d = (
        spark.read.parquet(os.path.join(index_dir, "dict"))
        .select("term", "df")
        .filter((F.col("term") >= pfx) & (F.col("term") < hi))
    )
    order = (
        [F.col("df").desc(), F.col("term").asc()] if by_df else [F.col("term").asc()]
    )
    return d.orderBy(*order).limit(n)


def termvectors_df(
    spark: SparkSession, index_dir: str, docid: int, with_stats: bool = True
) -> DataFrame:
    """The OpenSearch ``_termvectors`` API: per-term (tf, positions) of
    ONE document, optionally joined with collection stats (df) —
    term-ascending like the API's field-terms map.

    Derived from the docs store's text through the frozen analyzer (a
    single-row fetch + a per-row token explode), which by the engine's
    build invariants equals what the positional postings hold for the
    doc; the df column comes from a narrow dictionary lookup of just
    this doc's terms."""
    from .percolate import tokens_col

    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    one = docs.filter(F.col("docid") == int(docid)).select(
        tokens_col(F.col("text")).alias("toks")
    )
    tv = (
        one.select(F.posexplode("toks").alias("pos", "term"))
        .groupBy("term")
        .agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )
    if with_stats:
        # one doc's distinct terms are metadata-scale: collect them and
        # push an IN filter into the term-sorted dict scan (zonemap
        # pruning), then broadcast-join the narrow result back
        terms = [r["term"] for r in tv.select("term").collect()]
        d = (
            spark.read.parquet(os.path.join(index_dir, "dict"))
            .select("term", "df")
            .filter(F.col("term").isin(terms))
        )
        tv = tv.join(F.broadcast(d), "term", "left")
    return tv.orderBy("term")


def significant_text_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    n: int = 10,
    min_doc_count: int = 3,
) -> DataFrame:
    """OpenSearch ``significant_text``: terms statistically
    over-represented in the TEXT of the query's matching docs vs the
    whole corpus, scored with the default JLH heuristic
    ``(p_fg - p_bg) * (p_fg / p_bg)`` exactly like
    ``aggs.significant_terms`` (p_fg <= p_bg drops, ES min_doc_count
    floor on the foreground, top-n by rounded score desc / term asc).
    Foreground counts are per-doc (a term counts once per matching doc,
    re-tokenized with the frozen analyzer expression); background counts
    come from the term DICTIONARY (df = docs containing the term), so
    the background pass reads O(candidate terms), never re-scans the
    corpus.  Denominators: subset = |match set|, superset = n_docs.

    Scale shape: tokenization runs over the MATCH SET only; the dict
    join carries only the foreground's distinct terms; one shuffle of
    those terms, a broadcast 1-row totals frame, no UDFs."""
    stats = _load_stats(index_dir)
    matched = match_docids_df(spark, index_dir, query)
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).select("docid", "text")
    joined = docs.join(matched, "docid", "left_semi")
    toks = F.filter(
        F.split(
            F.lower(F.coalesce(_truncate_text_col(F.col("text")), F.lit(""))),
            _analysis.SQL_SPLIT_RE,
        ),
        lambda x: x != "",
    )
    fg = (
        joined.select("docid", F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("fg_cnt"))
    )
    bg = spark.read.parquet(os.path.join(index_dir, "dict")).select(
        "term", F.col("df").alias("bg_cnt")
    )
    totals = matched.agg(F.count("*").alias("subset_size"))
    p_fg = F.col("fg_cnt") / F.col("subset_size")
    p_bg = F.col("bg_cnt") / F.lit(int(stats["n_docs"]))
    score = (p_fg - p_bg) * (p_fg / p_bg)
    return (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(totals))
        .filter(F.col("fg_cnt") >= min_doc_count)
        .withColumn("score_r", F.round(score, 6))
        .filter(p_fg > p_bg)
        .select("term", "fg_cnt", "bg_cnt", "score_r")
        .orderBy(F.col("score_r").desc(), F.col("term").asc())
        .limit(n)
    )


_SORT_FIELDS = ("ts", "conv_id", "turn_idx", "role", "tool", "docid")


def sorted_hits_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    sort_field: str = "ts",
    ascending: bool = False,
) -> DataFrame:
    """Field-sorted hits — the Discover time-sorted view (OpenSearch
    ``sort: [{"ts": "desc"}]``): the DQL match set (posting-set algebra,
    NO scoring) joined to the docs projection, top-k by
    (sort_field, docid asc).  Plan: the match set is candidate-sized, the
    docs join is a docid equi-join, and the page is a TakeOrdered — at
    100 TB the sort input is the match set, never the corpus."""
    if sort_field not in _SORT_FIELDS:
        raise ValueError(f"sort_field must be one of {_SORT_FIELDS}, got {sort_field!r}")
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "docid", "conv_id", "turn_idx", "role", "tool", "ts"
    )
    matched = docs.join(match_docids_df(spark, index_dir, query), "docid", "left_semi")
    key = F.col(sort_field).asc() if ascending else F.col(sort_field).desc()
    return matched.orderBy(key, F.col("docid").asc()).limit(k)


def more_like_this_terms(
    index_dir: str,
    docid: int,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
) -> list[tuple[str, float]]:
    """The ``more_like_this`` term-selection stage (OpenSearch MLT query,
    the 'find similar events' investigation tool): from the source doc's
    analyzed tokens, keep terms with in-doc tf >= min_term_freq and
    dictionary df >= min_doc_freq, score each term tf * idf (float64,
    the same BM25 idf the engine scores with — a documented divergence
    from Lucene MoreLikeThis's classic ``log(N/(df+1)) + 1``), and take
    the top max_query_terms by (score desc, term asc).  Deterministic:
    the SQL oracle (sqloracle.mlt_sql) re-derives the identical selection
    from the corpus, float64 op for float64 op.

    Driver-side by design: one point read of the doc text (docid-sorted
    docs parquet, row-group pruned) + one dictionary lookup of the doc's
    candidate terms — O(doc length), never O(corpus)."""
    import collections

    import duckdb

    from ..functions.analysis import tokenize as _tok

    stats = _load_stats(index_dir)
    row = duckdb.sql(
        f"SELECT text FROM read_parquet('{index_dir}/docs/*.parquet') "
        f"WHERE docid = {int(docid)}"
    ).fetchone()
    if row is None:
        raise ValueError(f"more_like_this: docid {docid} not in index")
    tf = collections.Counter(_tok(row[0]))
    cands = sorted(t for t, c in tf.items() if c >= min_term_freq)
    dfs = _load_dfs(index_dir, cands)
    scored = [
        (t, float(tf[t]) * bm25.idf(dfs[t], stats["doc_count"]))
        for t in cands
        if dfs.get(t, 0) >= min_doc_freq
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:max_query_terms]


def more_like_this_df(
    spark: SparkSession,
    index_dir: str,
    docid: int,
    k: int = 10,
    msm_pct: int = 30,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
) -> DataFrame:
    """more_like_this search: the selected terms run as a scoring OR with
    ``minimum_should_match`` = max(1, floor(msm_pct% of the term count))
    (the OpenSearch MLT '30%' default), excluding the source doc from the
    ranking (OpenSearch excludes the liked doc).  Exclusion is exact:
    top-(k+1) is fetched, the source dropped, the page re-cut to k —
    the filtered top-k is always contained in the unfiltered top-(k+1)."""
    sel = more_like_this_terms(
        index_dir, docid, max_query_terms, min_term_freq, min_doc_freq
    )
    if not sel:
        raise ValueError(
            f"more_like_this: doc {docid} yields no query terms "
            f"(min_term_freq={min_term_freq}, min_doc_freq={min_doc_freq})"
        )
    # quoted: corpus tokens like 'and' / 'or' would otherwise read as
    # DQL operators; a quoted single word parses as a plain Term
    q = " OR ".join(f'"{t}"' for t, _ in sel)
    m = max(1, (msm_pct * len(sel)) // 100)
    out = search_df(spark, index_dir, q, k=k + 1, minimum_should_match=m)
    return (
        out.filter(F.col("docid") != int(docid))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# local path (latency bench + WAND)


def _docid_indexed(d, cols: list[str]) -> dict:
    """docid-indexed numpy arrays from a docs projection (sorted by
    docid): each array has size max(docid)+1, scatter-assigned.  A
    one-shot build's store is dense and hits the zero-copy identity path;
    an EXPUNGED store (soft deletes merged away — operators/deletes.py
    keeps docids stable, so merged-out ids leave holes) gets zero/NaT/
    None fillers in the holes.  Filler slots are unreachable: an expunged
    docid appears in no postings row, so no scoring or filter-mask path
    ever indexes one."""
    ids = d["docid"].to_numpy()
    n = int(ids.max()) + 1 if len(ids) else 0
    if len(np.unique(ids)) != len(ids):
        raise ValueError("docs store has duplicate docids")
    dense = n == len(ids)  # sorted + unique => ids == arange(n)
    out = {}
    for c in cols:
        v = d[c].to_numpy()
        if c == "norm":
            v = v.astype(np.uint8)
        if dense:
            out[c] = v
        elif v.dtype == np.uint8:
            a = np.zeros(n, np.uint8)
            a[ids] = v
            out[c] = a
        elif np.issubdtype(v.dtype, np.datetime64):
            a = np.full(n, np.datetime64("NaT"), v.dtype)
            a[ids] = v
            out[c] = a
        else:
            a = np.full(n, None, dtype=object)
            a[ids] = v
            out[c] = a
    return out


class LocalIndex:
    """Driver-side reader: postings via DuckDB parquet pruning, norms and
    keyword columns as docid-indexed numpy arrays."""

    def __init__(self, index_dir: str):
        import duckdb

        self.dir = index_dir
        self.stats = _load_stats(index_dir)
        d = duckdb.sql(
            f"SELECT docid, norm, conv_id, role, tool, ts, dl FROM read_parquet('{index_dir}/docs/*.parquet') ORDER BY docid"
        ).df()
        arr = _docid_indexed(d, ["norm", "conv_id", "role", "tool", "ts"])
        self.norms = arr["norm"]
        self.conv = arr["conv_id"]
        self.role = arr["role"]
        self.tool = arr["tool"]
        self.ts = arr["ts"]
        self.cache = bm25.norm_inverse_cache(self.stats["avgdl"])
        self._term_cache: dict[str, list[dict]] = {}

    def _term_rows(self, terms: list[str]) -> dict[str, list[dict]]:
        import duckdb

        missing = [t for t in terms if t not in self._term_cache]
        if missing:
            tl = ",".join("'" + t.replace("'", "''") + "'" for t in missing)
            df = duckdb.sql(
                f"SELECT * FROM {_postings_sources(self.dir, missing)} "
                f"WHERE term IN ({tl})"
            ).df()
            for t in missing:
                self._term_cache[t] = df[df["term"] == t].to_dict("records")
        return {t: self._term_cache[t] for t in terms}

    def _term_postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        rows = self._term_rows([term])[term]
        if not rows:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ds, ts_ = zip(*(segments.decode_docs_tfs(r) for r in rows))
        docids = np.concatenate(ds)
        tfs = np.concatenate(ts_)
        order = np.argsort(docids, kind="mergesort")
        return docids[order], tfs[order]

    def _term_positions(self, term: str):
        """flat (docid-per-position, position) arrays for phrase eval."""
        rows = self._term_rows([term])[term]
        doc_flat, pos_flat = [], []
        for r in rows:
            docids, tfs = segments.decode_docs_tfs(r)
            pos, off = segments.decode_positions(r, tfs)
            doc_flat.append(np.repeat(docids, tfs))
            pos_flat.append(pos)
        if not doc_flat:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(doc_flat), np.concatenate(pos_flat)

    # -- exhaustive vectorized eval (mirrors oracle arithmetic exactly)

    def _eval(self, node: Node) -> tuple[np.ndarray, np.ndarray]:
        # docid SPACE, not doc count: an expunged store keeps stable
        # docids with holes, so masks size to max(docid)+1 (== the
        # norms array), which equals n_docs only for dense stores
        n = len(self.norms)
        if isinstance(node, _LEAF):
            if isinstance(node, Term):
                docids, tfs = self._term_postings(node.term)
                w_fn = lambda: bm25.clause_weight([docids.size], self.stats["doc_count"])
            elif isinstance(node, Phrase):
                docids, tfs = self._phrase_postings(_slots_of(node), node.slop)
                w_fn = lambda: bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in node.terms],
                    self.stats["doc_count"])
            elif isinstance(node, SpanNear):
                docids, tfs = self._span_postings(node)
                w_fn = lambda: bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in node.terms],
                    self.stats["doc_count"])
            elif isinstance(node, SpanFirst):
                docids, tfs = self._span_first_postings(node)
                w_fn = lambda: bm25.clause_weight(
                    [self._term_postings(node.term)[0].size],
                    self.stats["doc_count"])
            elif isinstance(node, SpanNot):
                docids, tfs = self._span_not_postings(node)
                w_fn = lambda: bm25.clause_weight(
                    [self._term_postings(node.include)[0].size],
                    self.stats["doc_count"])
            elif isinstance(node, (SpanContaining, SpanWithin)):
                docids, tfs = self._span_contain_postings(node)
                w_fn = lambda: bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in node.terms],
                    self.stats["doc_count"])
            elif isinstance(node, Intervals):
                docids, tfs = self._intervals_postings(node)
                w_fn = lambda: bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in node.terms],
                    self.stats["doc_count"])
            else:  # MultiPhrase/SpanOr: grouped per-slot weight association
                docids, tfs = self._phrase_postings(node.slots, 0)
                w_fn = lambda: bm25.grouped_weight(
                    [[self._term_postings(t)[0].size for t in ts] for ts in node.slots],
                    self.stats["doc_count"])
            mask = np.zeros(n, dtype=bool)
            acc = np.zeros(n, dtype=np.float64)
            if docids.size and self.stats["doc_count"]:
                w = w_fn()
                s = bm25.score_tf(tfs, self.norms[docids], w, self.cache)
                mask[docids] = True
                acc[docids] = s.astype(np.float64) * node.boost
            return mask, acc
        if isinstance(node, And):
            ms, accs = zip(*(self._eval(c) for c in node.children))
            return np.logical_and.reduce(ms), np.sum(accs, axis=0)
        if isinstance(node, Or):
            ms, accs = zip(*(self._eval(c) for c in node.children))
            return np.logical_or.reduce(ms), np.sum(accs, axis=0)
        if isinstance(node, AtLeast):
            ms, accs = zip(*(self._eval(c) for c in node.children))
            return np.sum(ms, axis=0) >= node.m, np.sum(accs, axis=0)
        if isinstance(node, Not):
            m, _ = self._eval(node.child)
            return ~m, np.zeros(n, dtype=np.float64)
        raise TypeError(node)

    def _phrase_postings(self, slots: tuple[tuple[str, ...], ...], slop: int = 0) -> tuple[np.ndarray, np.ndarray]:
        # per-slot flat (docid, position): the union over the slot's term
        # alternatives (singleton for plain phrases; the expansion set
        # for match_phrase_prefix — one term per (doc, pos), so the
        # union is a concatenation)
        def slot_flat(ts):
            parts = [self._term_positions(t) for t in ts]
            parts = [(d, p) for d, p in parts if d.size] or [
                (np.empty(0, np.int64), np.empty(0, np.int64))
            ]
            return (
                np.concatenate([d for d, _ in parts]),
                np.concatenate([p for _, p in parts]),
            )

        if slop > 0:
            # sloppy phrase: per-doc greedy sweep over the same flat
            # (docid, position) arrays (functions/sloppy.py); freq is
            # the float Lucene sloppy frequency
            flat = [slot_flat(ts) for ts in slots]
            return sloppy_freqs_flat(
                [d for d, _ in flat], [p for _, p in flat], slop
            )
        SHIFT = np.int64(1) << np.int64(21)  # positions < 2^21 (dl <= 32k)
        keys = None
        for i, ts in enumerate(slots):
            doc_flat, pos_flat = slot_flat(ts)
            k = doc_flat * SHIFT + (pos_flat - i)
            keys = k if keys is None else keys[np.isin(keys, k)]
            if keys is None or keys.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
        docs = keys // SHIFT
        return np.unique(docs, return_counts=True)

    def _intervals_postings(self, node: Intervals) -> tuple[np.ndarray, np.ndarray]:
        """intervals frequencies over the same flat (docid, position)
        arrays (functions/intervals.py kernel — minimal-interval
        semantics; optional slots pass through as genuinely-absent
        terms)."""
        flat = [self._term_positions(t) for t in node.terms]
        return intervals_freqs_flat(
            [d for d, _ in flat], [p for _, p in flat],
            node.spec, node.terms, node.required_slots,
        )

    def _span_postings(self, node: SpanNear) -> tuple[np.ndarray, np.ndarray]:
        """span_near frequencies over the same flat (docid, position)
        arrays (functions/spans.py kernel — raw positions, no slot
        offsets)."""
        flat = [self._term_positions(t) for t in node.terms]
        return span_freqs_flat(
            [d for d, _ in flat], [p for _, p in flat], node.slop, node.in_order
        )

    def _span_first_postings(self, node: SpanFirst) -> tuple[np.ndarray, np.ndarray]:
        d, p = self._term_positions(node.term)
        return span_first_freqs_flat(d, p, node.end)

    def _span_not_postings(self, node: SpanNot) -> tuple[np.ndarray, np.ndarray]:
        di, pi = self._term_positions(node.include)
        de, pe = self._term_positions(node.exclude)
        return span_not_freqs_flat(di, pi, de, pe, node.dist)

    def _span_contain_postings(self, node) -> tuple[np.ndarray, np.ndarray]:
        big = [self._term_positions(t) for t in node.big]
        dl, pl = self._term_positions(node.little)
        return span_contain_freqs_flat(
            [d for d, _ in big], [p for _, p in big], dl, pl,
            node.slop, node.in_order,
            "big" if isinstance(node, SpanContaining) else "little",
        )

    def _compile(self, query: str) -> tuple[Node, dict]:
        """parse -> field-filter extraction -> wildcard/fuzzy expansion
        against this index's dictionary."""
        ast, dqlf = extract_filters(parse(query), query)
        if _has_multiterm(ast):
            ast = expand_multiterm(
                ast, lambda lf: _expand_leaf(self.dir, lf), MAX_CLAUSE_COUNT
            )
        return ast, dqlf

    def search(
        self,
        query: str,
        k: int = 10,
        role=None,
        tool=None,
        ts_min=None,
        ts_max=None,
        role_not: tuple = (),
        tool_not: tuple = (),
        minimum_should_match: int | None = None,
        collapse: str | None = None,
    ) -> list[tuple[int, np.float32]]:
        ast, dqlf = self._compile(query)
        # a multi-term child expands into ONE nested node, so the root Or
        # keeps its clause count and msm can apply post-expansion
        ast = apply_minimum_should_match(ast, minimum_should_match, query)
        filt = merge_filters(
            query,
            {"role": role, "tool": tool, "ts_min": ts_min, "ts_max": ts_max,
             "role_not": tuple(role_not), "tool_not": tuple(tool_not)},
            dqlf,
        )
        _check_positions(self.dir, _leaves(ast))
        mask, acc = self._eval(ast)
        if filters_active(filt):
            mask &= filter_mask(self.role, self.tool, self.ts, filt)
        docids = np.nonzero(mask)[0]
        scores = acc[docids].astype(np.float32)
        if collapse is not None:
            # OpenSearch collapse: best (score desc, docid asc) hit per
            # group — sort once, keep each group's first occurrence
            grp = {"conv_id": self.conv, "role": self.role, "tool": self.tool}[collapse]
            order_all = np.lexsort((docids, -scores.astype(np.float64)))
            seen: set = set()
            keep = []
            for i in order_all:
                g = grp[docids[i]]
                if g not in seen:
                    seen.add(g)
                    keep.append(i)
            order = np.asarray(keep, dtype=np.int64)[:k]
        else:
            order = np.lexsort((docids, -scores.astype(np.float64)))[:k]
        return [(int(docids[i]), np.float32(scores[i])) for i in order]

    def explain(self, query: str, docid: int) -> dict:
        """The OpenSearch ``_explain`` API: the per-clause scoring
        breakdown of one document against a query — per clause its kind,
        terms, tf at the doc, float32 clause weight (idf / summed idf for
        phrases), float32 clause score, match flag, and the float32 total
        exactly as ``search`` would produce it (a debugging tool, like
        the reference's endpoint — driver-side by design)."""
        ast, dqlf = self._compile(query)
        if dqlf:
            raise ValueError("explain takes an unfiltered scoring query")
        leaves = _leaves(ast)
        _check_positions(self.dir, leaves)
        mult = _positive_multiplicity(ast)
        norm = np.array([self.norms[docid]], dtype=np.uint8)
        clauses = []
        total = np.float64(0.0)
        for ci, lf in enumerate(leaves):
            if isinstance(lf, Term):
                docids, tfs = self._term_postings(lf.term)
                w = bm25.clause_weight([docids.size], self.stats["doc_count"])
                terms = (lf.term,)
            elif isinstance(lf, Phrase):
                docids, tfs = self._phrase_postings(_slots_of(lf), lf.slop)
                w = bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in lf.terms],
                    self.stats["doc_count"])
                terms = lf.terms
            elif isinstance(lf, SpanNear):
                docids, tfs = self._span_postings(lf)
                w = bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in lf.terms],
                    self.stats["doc_count"])
                terms = lf.terms
            elif isinstance(lf, SpanFirst):
                docids, tfs = self._span_first_postings(lf)
                w = bm25.clause_weight(
                    [self._term_postings(lf.term)[0].size],
                    self.stats["doc_count"])
                terms = (lf.term,)
            elif isinstance(lf, SpanNot):
                docids, tfs = self._span_not_postings(lf)
                w = bm25.clause_weight(
                    [self._term_postings(lf.include)[0].size],
                    self.stats["doc_count"])
                terms = (lf.include,)
            elif isinstance(lf, (SpanContaining, SpanWithin)):
                docids, tfs = self._span_contain_postings(lf)
                w = bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in lf.terms],
                    self.stats["doc_count"])
                terms = lf.terms
            elif isinstance(lf, Intervals):
                docids, tfs = self._intervals_postings(lf)
                w = bm25.clause_weight(
                    [self._term_postings(t)[0].size for t in lf.terms],
                    self.stats["doc_count"])
                terms = lf.terms
            else:  # MultiPhrase/SpanOr: grouped weight, slots shown as a|b
                docids, tfs = self._phrase_postings(lf.slots, 0)
                w = bm25.grouped_weight(
                    [[self._term_postings(t)[0].size for t in ts] for ts in lf.slots],
                    self.stats["doc_count"])
                terms = tuple("|".join(ts) for ts in lf.slots)
            i = np.searchsorted(docids, docid)
            # float tf covers sloppy frequencies; display stays int when
            # integral so the term/exact-phrase breakdown is unchanged
            tfv = float(tfs[i]) if i < docids.size and docids[i] == docid else 0.0
            tf = int(tfv) if tfv == int(tfv) else tfv
            s = (
                np.float32(bm25.score_tf(np.array([tfv]), norm, w, self.cache)[0])
                if tfv
                else np.float32(0.0)
            )
            m = mult.get(lf, 0.0)
            total += m * np.float64(s)
            clauses.append(
                {"clause": ci, "kind": type(lf).__name__.lower(),
                 "terms": " ".join(terms), "tf": tf,
                 "weight": np.float32(w), "score": s,
                 "matched": tf > 0, "boost_weight": m}
            )
        mask, _ = self._eval(ast)
        return {
            "matches": bool(mask[docid]),
            "total": np.float32(total) if mask[docid] else np.float32(0.0),
            "clauses": clauses,
        }

    def more_like_this(
        self,
        docid: int,
        k: int = 10,
        msm_pct: int = 30,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
    ) -> list[tuple[int, np.float32]]:
        """Local more_like_this: identical selection + scoring to
        ``more_like_this_df`` (shared ``more_like_this_terms``)."""
        sel = more_like_this_terms(
            self.dir, docid, max_query_terms, min_term_freq, min_doc_freq
        )
        if not sel:
            raise ValueError(f"more_like_this: doc {docid} yields no query terms")
        q = " OR ".join(f'"{t}"' for t, _ in sel)  # quoted: operator-safe
        m = max(1, (msm_pct * len(sel)) // 100)
        hits = self.search(q, k=k + 1, minimum_should_match=m)
        return [h for h in hits if h[0] != docid][:k]

    # -- block-max WAND top-k for disjunctions of terms

    def search_wand(
        self, query: str, k: int = 10, minimum_should_match: int | None = None
    ) -> list[tuple[int, np.float32]]:
        """Block-max WAND top-k, rank- and score-identical to search(),
        for any And/Or/Not tree of terms (phrases -> search()).

        Term / OR-of-terms queries take the classic pivot-jumping path
        (_wand_or_terms); other trees take the general block-range
        evaluator (_wand_tree), which skips candidate ranges whose summed
        positive block upper bounds can't beat the running k-th score or
        where the boolean tree is structurally unmatchable in the range."""
        ast, dqlf = self._compile(query)
        if dqlf:
            raise ValueError(
                "search_wand does not evaluate field filters; use search() "
                "or search_df for filtered queries"
            )
        if minimum_should_match is not None and minimum_should_match > 1:
            # the WAND walkers assume and/or/not trees; msm queries take
            # the exhaustive evaluator (identical results)
            return self.search(query, k, minimum_should_match=minimum_should_match)
        def unboosted(n: Node) -> bool:
            return isinstance(n, Term) and n.boost == 1.0

        # boosted terms take the general tree evaluator (its positive-
        # weight dict carries boosts); the classic pivot path assumes
        # weight-1 clauses
        if unboosted(ast):
            return self._wand_or_terms([ast.term], k)
        if isinstance(ast, Or) and all(unboosted(c) for c in ast.children):
            return self._wand_or_terms([c.term for c in ast.children], k)
        return self._wand_tree(ast, k)

    def _wand_or_terms(self, terms: list[str], k: int) -> list[tuple[int, np.float32]]:
        """Block-max WAND over a disjunction of terms, CHUNKED (r6b).

        The docid space partitions into elementary intervals (boundaries =
        the union of every term's block lasts), each fully covered by at
        most one block per term, so per-interval score upper bounds are a
        pure array computation.  Intervals are then processed in chunks of
        ``_WAND_CHUNK``: a chunk skips every interval whose bound falls
        STRICTLY below the running k-th score at chunk entry (theta only
        grows, so the stale theta is conservative — never skips a doc the
        classic per-range walk would have scored into the top-k), decodes
        the surviving blocks once, and scores all surviving entries with
        ONE score_tf call per term.  Final top-k by (-score, docid) is
        identical to the classic pivot walk: every doc is scored at most
        once (intervals are disjoint), skipped docs are provably below
        theta_final, and per-doc float64 sums of same-magnitude float32
        clause scores are exact (order-free).  The chunking removes the
        per-block Python iteration that dominated hot-term ORs."""
        dfs = _load_dfs(self.dir, terms)
        tbs = [
            _TermBlocks(self, t, bm25.clause_weight([dfs.get(t, 0)], self.stats["doc_count"]))
            for t in terms
        ]
        tbs = [t for t in tbs if t.n_blocks]
        if not tbs:
            return []
        ends = np.unique(np.concatenate([t.lasts for t in tbs]))
        starts = np.empty_like(ends)
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
        m = ends.size
        bound = np.zeros(m, dtype=np.float64)
        infos = []
        for t in tbs:
            idx = np.searchsorted(t.lasts, starts, side="left")
            idxc = np.minimum(idx, t.n_blocks - 1)
            ov = (idx < t.n_blocks) & (t.firsts[idxc] <= ends)
            bound += np.where(ov, t.ubs[idxc], 0.0)
            infos.append((idxc, ov))

        top_d = np.empty(0, dtype=np.int64)
        top_s = np.empty(0, dtype=np.float32)
        j = 0
        while j < m:
            je = min(j + _WAND_CHUNK, m)
            full = top_d.size >= k and top_s.size > 0
            theta = float(top_s[-1]) if full else -np.inf
            do = bound[j:je] >= theta if full else np.ones(je - j, dtype=bool)
            if do.any():
                parts_d, parts_s = [], []
                for t, (idxc, ov) in zip(tbs, infos):
                    sel = ov[j:je] & do
                    if not sel.any():
                        continue
                    dd_parts, tf_parts = [], []
                    for bi in np.unique(idxc[j:je][sel]):
                        d, tf = t.entries(int(bi))
                        iv = np.searchsorted(ends, d, side="left")
                        keep = (iv >= j) & (iv < je)
                        keep[keep] = do[iv[keep] - j]
                        if keep.any():
                            dd_parts.append(d[keep])
                            tf_parts.append(tf[keep])
                    if dd_parts:
                        dd = np.concatenate(dd_parts)
                        ss = bm25.score_tf(
                            np.concatenate(tf_parts), self.norms[dd], t.weight, self.cache
                        )
                        parts_d.append(dd)
                        parts_s.append(ss.astype(np.float64))
                if parts_d:
                    alld = np.concatenate(parts_d)
                    alls = np.concatenate(parts_s)
                    ud, inv = np.unique(alld, return_inverse=True)
                    tot = np.zeros(ud.size, dtype=np.float64)
                    np.add.at(tot, inv, alls)
                    md = np.concatenate([top_d, ud])
                    ms = np.concatenate([top_s, tot.astype(np.float32)])
                    order = np.lexsort((md, -ms.astype(np.float64)))[:k]
                    top_d, top_s = md[order], ms[order]
            j = je

        return [(int(d), np.float32(s)) for d, s in zip(top_d, top_s)]

    def _wand_tree(self, ast: Node, k: int) -> list[tuple[int, np.float32]]:
        """General block-max evaluator for And/Or/Not trees of Terms,
        CHUNKED like :meth:`_wand_or_terms` (r6b).

        Per elementary interval (boundaries = union of all terms' block
        lasts), three precomputed arrays decide skipping: the per-term
        overlap mask, the positively-weighted bound sum, and the
        structural matchability of the tree (Term -> overlap, Not ->
        anywhere, And = all, Or = any — the same recursion the per-range
        walk evaluated, now vectorized over all intervals at once).  A
        chunk skips unmatchable intervals (no matching doc exists there —
        exact) and intervals whose bound is STRICTLY below theta at chunk
        entry (conservative: theta only grows), then decodes the
        surviving blocks and evaluates the tree once over the chunk's
        candidate union (candidates = positive-term postings —
        _require_positive_coverage holds).  Scores = float64 sum of the
        positive-path term float32 scores in fixed term order, like the
        per-range walk (its in_range dict iterated in the same term
        insertion order)."""
        leaves = _leaves(ast)
        if any(isinstance(lf, _PHRASELIKE) for lf in leaves):
            raise ValueError("WAND handles term trees; phrases use search()")
        _require_positive_coverage(ast, "search_wand")
        # positive score weight per term (a repeated clause scores
        # repeatedly in Lucene bool semantics; boosts accumulate the
        # same way)
        positive: dict[str, float] = {}
        for lf, mult in _positive_multiplicity(ast).items():
            positive[lf.term] = positive.get(lf.term, 0.0) + mult
        terms = [lf.term for lf in leaves]
        dfs = _load_dfs(self.dir, terms)
        tbs: dict[str, _TermBlocks] = {}
        for t in terms:
            tb = _TermBlocks(self, t, bm25.clause_weight([dfs.get(t, 0)], self.stats["doc_count"]))
            if tb.n_blocks:
                tbs[t] = tb
        if not tbs:
            return []
        ends = np.unique(np.concatenate([tb.lasts for tb in tbs.values()]))
        starts = np.empty_like(ends)
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
        m = ends.size
        bound = np.zeros(m, dtype=np.float64)
        ov_map: dict[str, np.ndarray] = {}
        idx_map: dict[str, np.ndarray] = {}
        for t, tb in tbs.items():
            idx = np.searchsorted(tb.lasts, starts, side="left")
            idxc = np.minimum(idx, tb.n_blocks - 1)
            ov = (idx < tb.n_blocks) & (tb.firsts[idxc] <= ends)
            ov_map[t] = ov
            idx_map[t] = idxc
            if t in positive:
                bound += positive[t] * np.where(ov, tb.ubs[idxc], 0.0)

        def matchable_vec(n: Node) -> np.ndarray:
            if isinstance(n, Term):
                ovn = ov_map.get(n.term)
                return ovn if ovn is not None else np.zeros(m, dtype=bool)
            if isinstance(n, Not):
                return np.ones(m, dtype=bool)
            if isinstance(n, And):
                return np.logical_and.reduce([matchable_vec(c) for c in n.children])
            if isinstance(n, Or):
                return np.logical_or.reduce([matchable_vec(c) for c in n.children])
            raise TypeError(n)

        mv = matchable_vec(ast)

        top_d = np.empty(0, dtype=np.int64)
        top_s = np.empty(0, dtype=np.float32)
        j = 0
        while j < m:
            je = min(j + _WAND_CHUNK, m)
            full = top_d.size >= k and top_s.size > 0
            theta = float(top_s[-1]) if full else -np.inf
            do = mv[j:je] & (bound[j:je] >= theta) if full else mv[j:je].copy()
            if do.any():
                gathered: dict[str, tuple[np.ndarray, np.ndarray]] = {}
                for t, tb in tbs.items():
                    sel = ov_map[t][j:je] & do
                    if not sel.any():
                        continue
                    dd_parts, tf_parts = [], []
                    for bi in np.unique(idx_map[t][j:je][sel]):
                        d, tf = tb.entries(int(bi))
                        iv = np.searchsorted(ends, d, side="left")
                        keep = (iv >= j) & (iv < je)
                        keep[keep] = do[iv[keep] - j]
                        if keep.any():
                            dd_parts.append(d[keep])
                            tf_parts.append(tf[keep])
                    if dd_parts:
                        gathered[t] = (
                            np.concatenate(dd_parts),
                            np.concatenate(tf_parts),
                        )
                pos_parts = [gathered[t][0] for t in gathered if t in positive]
                if pos_parts:
                    ud = np.unique(np.concatenate(pos_parts))
                    acc = np.zeros(ud.size, dtype=np.float64)
                    present: dict[str, np.ndarray] = {}
                    for t, (dd, tf) in gathered.items():
                        idx = np.searchsorted(ud, dd)
                        # negative-only terms may carry docids outside the
                        # positive-union candidate set — keep only hits
                        ok = (idx < ud.size) & (ud[np.minimum(idx, ud.size - 1)] == dd)
                        mk = np.zeros(ud.size, dtype=bool)
                        mk[idx[ok]] = True
                        present[t] = mk
                        if t in positive:
                            s = bm25.score_tf(tf, self.norms[dd], tbs[t].weight, self.cache)
                            acc[idx] += positive[t] * s.astype(np.float64)

                    def ev(n: Node) -> np.ndarray:
                        if isinstance(n, Term):
                            return present.get(n.term, np.zeros(ud.size, dtype=bool))
                        if isinstance(n, Not):
                            return ~ev(n.child)
                        if isinstance(n, And):
                            return np.logical_and.reduce([ev(c) for c in n.children])
                        if isinstance(n, Or):
                            return np.logical_or.reduce([ev(c) for c in n.children])
                        if isinstance(n, AtLeast):
                            return np.sum([ev(c) for c in n.children], axis=0) >= n.m
                        raise TypeError(n)

                    sel = ev(ast)
                    if sel.any():
                        md = np.concatenate([top_d, ud[sel]])
                        ms = np.concatenate([top_s, acc[sel].astype(np.float32)])
                        order = np.lexsort((md, -ms.astype(np.float64)))[:k]
                        top_d, top_s = md[order], ms[order]
            j = je

        return [(int(d), np.float32(s)) for d, s in zip(top_d, top_s)]


class _TermBlocks:
    """Per-term block cursor over all (salt) segment rows of a term.
    Blocks are docid-disjoint across rows (each doc lives in one shard),
    so sorting by first docid yields a single ascending block sequence."""

    def __init__(self, idx: LocalIndex, term: str, weight: np.float32):
        self.idx = idx
        self.weight = weight
        firsts, lasts, ubs, bufs = [], [], [], []
        for r in idx._term_rows([term])[term]:
            db = np.frombuffer(r["docs_bytes"], dtype=np.uint8)
            tb = np.frombuffer(r["tfs_bytes"], dtype=np.uint8)
            doff = list(r["blk_doc_off"]) + [len(db)]
            toff = list(r["blk_tf_off"]) + [len(tb)]
            row_ubs = _row_block_ubs(r, weight, idx.cache)
            r_firsts = r.get("blk_first") if isinstance(r, dict) else None
            for bi in range(len(r["blk_n"])):
                dbuf = db[doff[bi] : doff[bi + 1]]
                if r_firsts is not None and len(r_firsts):
                    firsts.append(int(r_firsts[bi]))
                else:
                    firsts.append(int(varint.decode(dbuf[: _first_vbyte_len(dbuf)])[0]))
                lasts.append(int(r["blk_last"][bi]))
                ubs.append(float(row_ubs[bi]))
                bufs.append((dbuf, tb[toff[bi] : toff[bi + 1]]))
        order = np.argsort(np.asarray(firsts, dtype=np.int64), kind="mergesort")
        self.firsts = np.asarray(firsts, dtype=np.int64)[order]
        self.lasts = np.asarray(lasts, dtype=np.int64)[order]
        self.ubs = np.asarray(ubs, dtype=np.float64)[order]
        self.bufs = [bufs[i] for i in order]
        self.n_blocks = len(self.bufs)
        self.term_ub = float(self.ubs.max()) if self.n_blocks else 0.0
        self.bi = 0
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    @property
    def exhausted(self) -> bool:
        return self.bi >= self.n_blocks

    @property
    def cur_first(self) -> int:
        return int(self.firsts[self.bi]) if not self.exhausted else np.iinfo(np.int64).max

    @property
    def cur_last(self) -> int:
        return int(self.lasts[self.bi]) if not self.exhausted else np.iinfo(np.int64).max

    @property
    def cur_ub(self) -> float:
        return float(self.ubs[self.bi]) if not self.exhausted else 0.0

    def advance_to(self, target: int) -> None:
        """Move to the first block whose last docid >= target (lasts are
        ascending because blocks are disjoint + sorted)."""
        if self.exhausted:
            return
        j = int(np.searchsorted(self.lasts, target, side="left"))
        self.bi = max(self.bi, j)

    def block_entries(self) -> tuple[np.ndarray, np.ndarray]:
        return self.entries(self.bi)

    def entries(self, bi: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(bi)
        if hit is None:
            dbuf, tbuf = self.bufs[bi]
            docids = np.cumsum(varint.decode(dbuf).astype(np.int64))
            tfs = varint.decode(tbuf).astype(np.int64)
            hit = (docids, tfs)
            self._cache[bi] = hit
        return hit


def _first_vbyte_len(buf: np.ndarray) -> int:
    i = 0
    while buf[i] & 0x80:
        i += 1
    return i + 1


def _row_block_ubs(r, weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """Per-block score upper bounds of one segment row: max over the
    pareto-optimal (tf, norm) impact pairs when the index carries them
    (tight — the same pair co-occurs in one doc), else the legacy
    score(max_tf, min_norm) cross-doc bound (valid but loose)."""
    pn = r.get("blk_pareto_n") if isinstance(r, dict) else None
    if pn is not None and len(pn):
        sc = bm25.score_tf(
            np.asarray(r["blk_pareto_tf"], dtype=np.int64),
            np.asarray(r["blk_pareto_norm"], dtype=np.int64),
            weight,
            cache,
        ).astype(np.float64)
        po = np.cumsum(np.asarray(pn, dtype=np.int64))
        return np.maximum.reduceat(sc, np.concatenate(([0], po[:-1])))
    return bm25.score_tf(
        np.asarray(r["blk_max_tf"], dtype=np.int64),
        np.asarray(r["blk_min_norm"], dtype=np.int64),
        weight,
        cache,
    ).astype(np.float64)


class QuerySession:
    """Warm distributed query session (VERDICT r2 item 6; r4 rework).

    Every cold ``search_df`` call pays a per-query setup floor: the stats
    parquet read, the dict df lookup, and a fresh docs parquet scan + its
    job scheduling.  A dashboard issuing repeated queries against the same
    index shouldn't — this object pins the per-index state once:

    - corpus stats + per-term df / prune-plan / wildcard-expansion memos
      (driver memory, O(queried terms)),
    - the postings file listing (and optionally the segment bytes,
      MEMORY_AND_DISK),
    - BROADCAST MODE (n_docs <= broadcast_cap): norms as a broadcast
      uint8 array, keyword/ts columns driver-side for filter masks, the
      docs projection persisted for the cold fallback;
    - SHARDED MODE (past the cap, r4): NONE of the above — construction
      does no O(corpus) work, and warm queries resolve norms + filters
      from per-shard ranged reads of the docid-sorted docs parquet inside
      the shard-local plan (_shard_local_topk).

    Single-term queries in broadcast mode keep the zero-exchange fused
    decode+score plan; every other shape (AND/OR/NOT trees, phrases,
    filters) runs the one-Python-stage shard-local plan in both modes.
    Scores are identical to cold ``search_df`` (tested both modes)."""

    #: docs above this, and the session refuses to build driver-side
    #: docs arrays / full-corpus broadcasts (norms = 1 byte/doc: 10^8 docs
    #: = 100 MB broadcast; beyond that the warm path reads per-shard norm
    #: slices executor-side — see _shard_local_topk)
    DEFAULT_BROADCAST_CAP = 100_000_000

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache_postings: bool = True,
        shuffle_partitions: int | None = 8,
        broadcast_cap: int | None = None,
    ):
        import duckdb

        self.spark = spark
        self.dir = index_dir
        # session shuffle width: a dashboard query's post-decode
        # aggregation carries ~(terms x df) rows — at test scale a handful
        # of tasks beats the session default's scheduling overhead
        # (measured ~0.2 s at 32 vs 4-8 partitions).  Spark reads the
        # conf at EXECUTION time, so it is set for the session's lifetime
        # and restored by close(); size to candidate volume, or None to
        # leave the conf alone.
        self._conf_key = "spark.sql.shuffle.partitions"
        self._prev_shuffle = spark.conf.get(self._conf_key)
        if shuffle_partitions is not None:
            spark.conf.set(self._conf_key, str(shuffle_partitions))
        self.stats = _load_stats(index_dir)
        self._dfs: dict[str, int] = {}
        self._prune_memo: dict = {}
        # pin the postings file listing/schema once (~0.8 s per query on a
        # 64-bucket store otherwise — driver-side directory listing); with
        # cache_postings the segment bytes persist in executor memory too
        # (MEMORY_AND_DISK — the Lucene page-cache analogue; at index
        # sizes beyond executor storage Spark evicts to disk, and a
        # 10^12-doc deployment would pin only its hot buckets)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        # r5: pin the PER-SHARD-SPLIT listing (segments.split_rows_by_shard)
        # so warm multi-clause queries skip the per-query split pass the
        # shard-local co-location fix requires — the split happens once at
        # pin time and the sub-rows persist.  Columns are pruned to the
        # query paths' needs (drops df/cttf/shard_max/impact tables from
        # executor memory).
        self._presplit = False
        _ssz = _shard_size_of(index_dir)
        if _ssz and max(1, -(-self.stats["n_docs"] // _ssz)) > 1:
            keep = ["term", "shard_min", "docs_bytes", "tfs_bytes",
                    "pos_bytes", "blk_n", "blk_first", "blk_last",
                    "blk_doc_off", "blk_tf_off", "blk_pos_off"]
            if "bucket" in self.postings.columns:
                keep.append("bucket")
            types = {
                "term": "string", "shard_min": "int", "bucket": "int",
                "docs_bytes": "binary", "tfs_bytes": "binary",
                "pos_bytes": "binary", "blk_n": "array<int>",
                "blk_first": "array<long>", "blk_last": "array<long>",
                "blk_doc_off": "array<long>", "blk_tf_off": "array<long>",
                "blk_pos_off": "array<long>",
            }
            _wp = bool(_build_params(index_dir).get("positions", True))

            def _presplit_pass(batches, _ssz=_ssz, _wp=_wp):
                for pdf in batches:
                    got = segments.split_rows_by_shard(pdf, _ssz, _wp)
                    if len(got):
                        yield got

            self.postings = self.postings.select(*keep).mapInPandas(
                _presplit_pass, schema=", ".join(f"{c} {types[c]}" for c in keep)
            )
            self._presplit = True
        if cache_postings:
            self.postings = self.postings.persist()
        cap = self.DEFAULT_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
        self.sharded = self.stats["n_docs"] > cap
        if self.sharded:
            # Sharded mode (r4, VERDICT r3 item 2): construction does NO
            # O(corpus) work — no driver-side docs load, no full-corpus
            # broadcasts, no docs persist.  Warm queries run the
            # shard-local plan with per-shard ranged norm/filter fetches.
            self.docs = None
            self.norms_bc = None
            self._role = self._tool = self._ts = None
        else:
            self.docs = (
                spark.read.parquet(os.path.join(index_dir, "docs"))
                .select("docid", "norm", "role", "tool", "ts")
                .persist()
            )
            self.docs.count()  # materialize the cache eagerly
            # norms in RAM (1 byte/doc) + keyword/ts columns for filter
            # masks — the session-scale analogue of Lucene holding norms
            d = duckdb.sql(
                f"SELECT docid, norm, role, tool, ts FROM read_parquet('{index_dir}/docs/*.parquet') ORDER BY docid"
            ).df()
            arr = _docid_indexed(d, ["norm", "role", "tool", "ts"])
            self._role = arr["role"]
            self._tool = arr["tool"]
            self._ts = arr["ts"]
            self.norms_bc = spark.sparkContext.broadcast(arr["norm"])
        self._mask_memo: dict = {}
        self._expand_memo: dict = {}
        self._excl_memo: dict = {}

    def _exclude_bc(self, exclude_dir: str | None):
        """Tombstone broadcast for warm live search, memoized on the
        log's content fingerprint (append-only log: a new delete changes
        the fingerprint and triggers a fresh load — the same staleness
        rule as the prune memo).  Returns None when the set exceeds
        EXCLUDE_BROADCAST_CAP (the multi-clause path then falls back to
        the cold anti-join plan).  Superseded broadcasts unpersist
        eagerly — one live tombstone broadcast per session."""
        if exclude_dir is None:
            return None
        fp = _tombstone_fingerprint(exclude_dir)
        if fp in self._excl_memo:
            return self._excl_memo[fp]
        arr = _load_tombstone_array(exclude_dir)
        bc = None
        if arr.size <= EXCLUDE_BROADCAST_CAP:
            bc = self.spark.sparkContext.broadcast(arr)
        for old in self._excl_memo.values():
            if old is not None:
                old.unpersist()
        self._excl_memo = {fp: bc}
        return bc

    def _filter_mask_bc(self, filt: dict):
        if self.sharded:
            return None  # filters evaluate from the ranged fetch instead
        if not filters_active(filt):
            return None
        key = tuple(
            (k, str(filt.get(k))) for k in sorted(filt) if filt.get(k) not in (None, (), False)
        )
        if key not in self._mask_memo:
            m = filter_mask(self._role, self._tool, self._ts, filt)
            self._mask_memo[key] = self.spark.sparkContext.broadcast(m)
        return self._mask_memo[key]

    def search(
        self,
        query: str,
        k: int = 10,
        role=None,
        tool=None,
        ts_min=None,
        ts_max=None,
        role_exists: bool = False,
        tool_exists: bool = False,
        role_not: tuple = (),
        tool_not: tuple = (),
        role_not_exists: bool = False,
        tool_not_exists: bool = False,
        search_after: tuple | None = None,
        minimum_should_match: int | None = None,
        collapse: str | None = None,
        _exclude_dir: str | None = None,
        _emit_fields: list[str] | None = None,
        _emit_types: list[str] | None = None,
    ) -> DataFrame:
        # DQL field filters must reach the broadcast mask, so extract them
        # here as well (search_df re-extracts; the merge is idempotent)
        _, dqlf = extract_filters(parse(query), query)
        filt = merge_filters(
            query,
            {"role": role, "tool": tool, "ts_min": ts_min, "ts_max": ts_max,
             "role_exists": role_exists, "tool_exists": tool_exists,
             "role_not": tuple(role_not), "tool_not": tuple(tool_not),
             "role_not_exists": role_not_exists, "tool_not_exists": tool_not_exists},
            dqlf,
        )
        return search_df(
            self.spark,
            self.dir,
            query,
            k=k,
            role=filt.get("role"),
            tool=filt.get("tool"),
            ts_min=filt.get("ts_min"),
            ts_max=filt.get("ts_max"),
            role_exists=bool(filt.get("role_exists")),
            tool_exists=bool(filt.get("tool_exists")),
            role_not=tuple(filt.get("role_not") or ()),
            tool_not=tuple(filt.get("tool_not") or ()),
            role_not_exists=bool(filt.get("role_not_exists")),
            tool_not_exists=bool(filt.get("tool_not_exists")),
            search_after=search_after,
            minimum_should_match=minimum_should_match,
            collapse=collapse,
            _exclude_dir=_exclude_dir,
            _exclude_bc=self._exclude_bc(_exclude_dir),
            _stats=self.stats,
            _dfs=self._dfs,
            _docs=self.docs,
            _postings=self.postings,
            _presplit=self._presplit,
            _prune_memo=self._prune_memo,
            _norms_bc=self.norms_bc,
            _filter_mask_bc=self._filter_mask_bc(filt),
            _expand_memo=self._expand_memo,
            _emit_fields=_emit_fields,
            _emit_types=_emit_types,
        )

    def msearch(self, queries: dict[str, str], k: int | None = 10) -> DataFrame:
        """Warm multi-search: the one-scan batch plan over the session's
        pinned postings/docs/stats (see msearch_df) — a dashboard refresh
        as one job instead of one per panel."""
        return msearch_df(
            self.spark,
            self.dir,
            queries,
            k=k,
            _stats=self.stats,
            _dfs=self._dfs,
            _docs=self.docs,
            _postings=self.postings,
            _prune_memo=self._prune_memo,
            _expand_memo=self._expand_memo,
            _presplit=self._presplit,
            _norms_bc=self.norms_bc,
            _mask_for=self._filter_mask_bc,
        )

    def match_count(self, query: str) -> int:
        return match_count_df(self.spark, self.dir, query).first()[0]

    def close(self) -> None:
        if self.docs is not None:
            self.docs.unpersist()
        self.postings.unpersist()
        self.spark.conf.set(self._conf_key, self._prev_shuffle)
        if self.norms_bc is not None:
            self.norms_bc.unpersist()
        for bc in self._mask_memo.values():
            bc.unpersist()
        for bc in self._excl_memo.values():
            if bc is not None:
                bc.unpersist()
