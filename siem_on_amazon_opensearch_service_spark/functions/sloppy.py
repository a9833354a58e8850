"""Sloppy-phrase frequency: Lucene's SloppyPhraseMatcher greedy sweep.

OpenSearch ``match_phrase`` with ``slop`` (query-string ``"a b"~N``) scores
a document by its *sloppy phrase frequency*: the greedy min-window sweep of
Lucene's SloppyPhraseMatcher/SloppyPhraseScorer emits a match every time
the lagging phrase position overtakes the next-smallest one, and each match
with total displacement ``matchLength <= slop`` contributes
``1 / (1 + matchLength)`` (BM25Similarity.SimScorer.computeSlopFactor).
The frequency is accumulated in FLOAT32, exactly as Lucene's
``float freq`` — the engine, the frozen oracle, and the DuckDB recursive
CTE oracle all reproduce this arithmetic bit-for-bit.

Algorithm (Lucene SloppyPhraseScorer.phraseFreq, the non-repeats path):
positions are offset-adjusted (``pos - slot``); a priority queue ordered by
(adjusted position, slot) holds one pointer per phrase term; the smallest
pointer advances; while it stays <= the next-smallest, it only tightens the
current window (``matchLength = end - pp.position``); the moment it
overtakes, the current window is emitted and the queue re-orders.  ``end``
is the running maximum adjusted position.

Scope: phrases whose terms are all DISTINCT.  Lucene's repeating-term
handling (PhrasePositions rptGroups) is a different, far hairier algorithm;
a repeated term under slop > 0 raises loudly at parse time rather than
silently diverging.  slop = 0 keeps the engine's exact-adjacency path
(identical result, cheaper: for distinct terms the greedy sweep with
slop = 0 emits exactly the adjacency matches with weight 1).
"""

from __future__ import annotations

import heapq

import numpy as np


def sloppy_freq(pos_lists: list[np.ndarray], slop: int) -> np.float32:
    """Sloppy phrase frequency for ONE document.

    ``pos_lists[i]`` = ascending in-doc positions of phrase term i (the
    raw analyzer positions; offset adjustment happens here).  Returns the
    float32 frequency (0.0 when no window fits within ``slop``)."""
    k = len(pos_lists)
    adj = []
    for i, pl in enumerate(pos_lists):
        a = np.asarray(pl, dtype=np.int64) - i
        if a.size == 0:
            return np.float32(0.0)
        adj.append(a)
    idx = [0] * k
    heap = [(int(adj[i][0]), i) for i in range(k)]
    heapq.heapify(heap)
    end = max(int(adj[i][0]) for i in range(k))
    freq = np.float32(0.0)
    pos, off = heapq.heappop(heap)
    match_length = end - pos
    next_pos = heap[0][0]
    while True:
        idx[off] += 1
        if idx[off] >= adj[off].size:
            break
        p = int(adj[off][idx[off]])
        if p > end:
            end = p
        if p > next_pos:
            if match_length <= slop:
                freq = np.float32(freq + np.float32(1.0 / (1.0 + match_length)))
            heapq.heappush(heap, (p, off))
            pos, off = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - pos
        else:
            ml2 = end - p
            if ml2 < match_length:
                match_length = ml2
            pos = p
    if match_length <= slop:
        freq = np.float32(freq + np.float32(1.0 / (1.0 + match_length)))
    return freq


def sloppy_freqs_flat(
    slot_docs: list[np.ndarray],
    slot_pos: list[np.ndarray],
    slop: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sloppy frequencies from flat per-slot (docid, position)
    arrays — the shape every engine path already holds (one docid entry
    per position occurrence).  Docs missing any slot are skipped (a
    sloppy phrase still requires every term).  Returns (docids ascending,
    float64 freqs) with zero-frequency docs dropped (freq 0 = no match,
    like the exact path)."""
    k = len(slot_docs)
    docs_sorted: list[np.ndarray] = []
    pos_sorted: list[np.ndarray] = []
    common: np.ndarray | None = None
    for d, p in zip(slot_docs, slot_pos):
        d = np.asarray(d, dtype=np.int64)
        p = np.asarray(p, dtype=np.int64)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        docs_sorted.append(d)
        pos_sorted.append(p)
        u = np.unique(d)
        common = u if common is None else np.intersect1d(common, u, assume_unique=True)
        if common.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    out_d, out_f = [], []
    # per-slot slice boundaries for each common doc
    bounds = [
        (np.searchsorted(docs_sorted[i], common, side="left"),
         np.searchsorted(docs_sorted[i], common, side="right"))
        for i in range(k)
    ]
    for j in range(common.size):
        pls = [pos_sorted[i][bounds[i][0][j] : bounds[i][1][j]] for i in range(k)]
        f = sloppy_freq(pls, slop)
        if f > 0:
            out_d.append(int(common[j]))
            out_f.append(float(f))
    return (
        np.asarray(out_d, dtype=np.int64),
        np.asarray(out_f, dtype=np.float64),
    )


def sloppy_sim_sql_2(
    la_expr: str,
    lb_expr: str,
    source: str,
    slop: int,
    name: str = "sim",
) -> str:
    """DuckDB recursive-CTE rendering of the SAME greedy sweep for a
    TWO-term sloppy phrase — the SQL-oracle path.

    ``source`` must be a CTE/relation with columns (docid, {la_expr},
    {lb_expr}): ascending OFFSET-ADJUSTED position lists of the two terms
    (term0 positions, term1 positions - 1).  Produces SQL selecting
    (docid, freq FLOAT) with freq > 0, replicating the float32
    accumulation.  With two pointers the priority queue degenerates to
    (current, other); each recursion step is one advance of the current
    pointer.  State: ia/ib = NEXT index to consume per list (1-based,
    list[1] is DuckDB's first element), cur = which list the minimum
    pointer came from, end_/ml per the Java variables."""
    # transition helpers: position of the would-be next element of the
    # current list, and the other pointer's current position
    return f"""
{name} AS (
  SELECT docid, {la_expr} AS la, {lb_expr} AS lb, 1 AS ia, 1 AS ib,
         CASE WHEN {la_expr}[1] <= {lb_expr}[1] THEN 0 ELSE 1 END AS cur,
         greatest({la_expr}[1], {lb_expr}[1]) AS end_,
         greatest({la_expr}[1], {lb_expr}[1]) - least({la_expr}[1], {lb_expr}[1]) AS ml,
         CAST(0.0 AS FLOAT) AS freq,
         FALSE AS done
  FROM {source}
  UNION ALL
  SELECT docid, la, lb,
         CASE WHEN cur = 0 THEN ia + 1 ELSE ia END AS ia,
         CASE WHEN cur = 1 THEN ib + 1 ELSE ib END AS ib,
         CASE
           WHEN (CASE WHEN cur = 0 THEN ia + 1 > len(la) ELSE ib + 1 > len(lb) END)
             THEN cur
           WHEN (CASE WHEN cur = 0 THEN la[ia + 1] ELSE lb[ib + 1] END)
                > (CASE WHEN cur = 0 THEN lb[ib] ELSE la[ia] END)
             THEN 1 - cur
           ELSE cur
         END AS cur,
         greatest(end_, CASE
           WHEN (CASE WHEN cur = 0 THEN ia + 1 > len(la) ELSE ib + 1 > len(lb) END)
             THEN end_
           ELSE (CASE WHEN cur = 0 THEN la[ia + 1] ELSE lb[ib + 1] END)
         END) AS end_,
         CASE
           WHEN (CASE WHEN cur = 0 THEN ia + 1 > len(la) ELSE ib + 1 > len(lb) END)
             THEN ml
           WHEN (CASE WHEN cur = 0 THEN la[ia + 1] ELSE lb[ib + 1] END)
                > (CASE WHEN cur = 0 THEN lb[ib] ELSE la[ia] END)
             -- switch: new current = other pointer; end' includes p
             THEN greatest(end_, CASE WHEN cur = 0 THEN la[ia + 1] ELSE lb[ib + 1] END)
                  - (CASE WHEN cur = 0 THEN lb[ib] ELSE la[ia] END)
           ELSE least(ml, greatest(end_, CASE WHEN cur = 0 THEN la[ia + 1] ELSE lb[ib + 1] END)
                          - (CASE WHEN cur = 0 THEN la[ia + 1] ELSE lb[ib + 1] END))
         END AS ml,
         CASE
           WHEN (CASE WHEN cur = 0 THEN ia + 1 > len(la) ELSE ib + 1 > len(lb) END)
                OR (CASE WHEN cur = 0 THEN la[ia + 1] ELSE lb[ib + 1] END)
                   > (CASE WHEN cur = 0 THEN lb[ib] ELSE la[ia] END)
             THEN CASE WHEN ml <= {slop}
                       THEN CAST(freq + CAST(1.0 / (1.0 + ml) AS FLOAT) AS FLOAT)
                       ELSE freq END
           ELSE freq
         END AS freq,
         (CASE WHEN cur = 0 THEN ia + 1 > len(la) ELSE ib + 1 > len(lb) END) AS done
  FROM {name} WHERE NOT done
)"""
