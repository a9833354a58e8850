"""span_near frequency: the Lucene span family over single-term clauses.

OpenSearch ``span_near`` (the query-DSL span family security content —
e.g. Sigma-rule compilations — leans on) matches documents where all
clause spans occur within ``slop`` total gap positions, optionally in
clause order.  The reference delegates it to Lucene SpanNearQuery;
re-expressed here over the same decoded position lists every phrase path
already holds.

Frozen contract (single-term clauses with DISTINCT terms — multi-term or
repeated-term sub-spans are rejected at parse time):

* ordered (``NearSpansOrdered``): candidates are enumerated by the
  stretch-to-order / shrink-to-shortest greedy chain — advance clause 0,
  stretch each later clause strictly past its predecessor, then shrink
  every earlier clause as late as order allows; emit the candidate and
  restart past it.  For two clauses this chain is exactly the set of
  adjacent A-then-B cross pairs of the merged position order (proved in
  tests against the closed form).  Width = p[n-1] - p[0] - (n-1).
* unordered (``NearSpansUnordered``): every pointer configuration
  visited by the smallest-range sweep (advance the global minimum, one
  configuration per step, the seed configuration included) is a
  candidate.  For two clauses these are exactly the merge-path pairs
  (closed form in tests/SQL).  Width = (max - min + 1) - n.

Each candidate with ``width <= slop`` contributes ``1/(1 + width)``
(BM25Similarity ``computeSlopFactor``), accumulated in FLOAT32 exactly
like the sloppy-phrase kernel; the clause weight is the summed-idf
``bm25.clause_weight`` over the span's terms (Lucene SpanWeight builds
one SimWeight over all terms).  Engine paths, the frozen Python oracle,
and the DuckDB SQL closed forms (2-term) reproduce the arithmetic
bit-for-bit.
"""

from __future__ import annotations

import numpy as np


def span_freq(pos_lists: list[np.ndarray], slop: int, in_order: bool) -> np.float32:
    """span_near frequency for ONE document.

    ``pos_lists[i]`` = ascending in-doc positions of clause term i (raw
    analyzer positions; spans do NOT offset-adjust).  Returns the float32
    frequency (0.0 when no candidate fits within ``slop``)."""
    k = len(pos_lists)
    lists = []
    for pl in pos_lists:
        a = np.asarray(pl, dtype=np.int64)
        if a.size == 0:
            return np.float32(0.0)
        lists.append(a)
    if k == 1:
        # degenerate single-clause span: every position is a width-0 match
        return np.float32(lists[0].size)
    freq = np.float32(0.0)
    if in_order:
        idx = [0] * k
        while True:
            # stretch to order: each clause strictly past its predecessor
            exhausted = False
            for i in range(1, k):
                prev = int(lists[i - 1][idx[i - 1]])
                j = int(np.searchsorted(lists[i], prev, side="right"))
                if j >= lists[i].size:
                    exhausted = True
                    break
                idx[i] = max(idx[i], j)
            if exhausted:
                break
            # shrink: advance each earlier clause as late as order allows
            for i in range(k - 2, -1, -1):
                nxt = int(lists[i + 1][idx[i + 1]])
                j = int(np.searchsorted(lists[i], nxt, side="left")) - 1
                if j > idx[i]:
                    idx[i] = j
            width = int(lists[k - 1][idx[k - 1]]) - int(lists[0][idx[0]]) - (k - 1)
            if width <= slop:
                freq = np.float32(freq + np.float32(1.0 / (1.0 + width)))
            idx[0] += 1
            if idx[0] >= lists[0].size:
                break
    else:
        idx = [0] * k
        while True:
            vals = [int(lists[i][idx[i]]) for i in range(k)]
            width = (max(vals) - min(vals) + 1) - k
            if width <= slop:
                freq = np.float32(freq + np.float32(1.0 / (1.0 + width)))
            mi = int(np.argmin(vals))
            idx[mi] += 1
            if idx[mi] >= lists[mi].size:
                break
    return freq


def span_freqs_flat(
    slot_docs: list[np.ndarray],
    slot_pos: list[np.ndarray],
    slop: int,
    in_order: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc span_near frequencies from flat per-clause (docid,
    position) arrays — the same shape :func:`sloppy_freqs_flat` consumes.
    Docs missing any clause term are skipped; zero-frequency docs are
    dropped.  Returns (docids ascending, float64 freqs)."""
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
    bounds = [
        (np.searchsorted(docs_sorted[i], common, side="left"),
         np.searchsorted(docs_sorted[i], common, side="right"))
        for i in range(k)
    ]
    for j in range(common.size):
        pls = [pos_sorted[i][bounds[i][0][j] : bounds[i][1][j]] for i in range(k)]
        f = span_freq(pls, slop, in_order)
        if f > 0:
            out_d.append(int(common[j]))
            out_f.append(float(f))
    return (
        np.asarray(out_d, dtype=np.int64),
        np.asarray(out_f, dtype=np.float64),
    )


def span_first_freqs_flat(
    docs: np.ndarray, pos: np.ndarray, end: int
) -> tuple[np.ndarray, np.ndarray]:
    """Lucene ``SpanFirstQuery`` over a single-term span: a position-``p``
    span has end ``p + 1``, so it matches iff ``p + 1 <= end``.  Every
    match is width 0 (slop factor 1.0), so the float32-accumulated
    frequency is exactly the count of qualifying positions (positions are
    < 2^15, far under float32's 2^24 integer exactness).  Fully
    vectorized — one mask + np.unique, no per-doc loop."""
    docs = np.asarray(docs, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    m = pos < end
    d, c = np.unique(docs[m], return_counts=True)
    return d, c.astype(np.float64)


#: span_not key packing: positions < 2^15 and dist <= _SPAN_NOT_MAX_DIST
#: keep per-doc key ranges non-overlapping under the +/- dist window
_SPAN_NOT_SHIFT = np.int64(1) << np.int64(21)
SPAN_NOT_MAX_DIST = 10_000


def span_not_freqs_flat(
    inc_docs: np.ndarray,
    inc_pos: np.ndarray,
    exc_docs: np.ndarray,
    exc_pos: np.ndarray,
    dist: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Lucene ``SpanNotQuery`` (include term, exclude term, pre = post =
    ``dist``): include positions ``p`` survive unless some exclude
    position ``q`` of the SAME doc lies within ``[p - dist, p + dist]``.
    Docs with no exclude occurrences keep every include position — the
    exclude term is NOT required.  Width-0 surviving spans → frequency =
    surviving count (exact in float32).

    Vectorized via packed ``doc * 2^21 + pos`` keys: an include key's
    exclusion window ``[k - dist, k + dist]`` stays inside its own doc's
    key range because positions < 2^15 and ``dist <= 10_000`` leave a
    ``2^21 - 2^15 - dist`` gap to the neighboring doc's keys."""
    if dist > SPAN_NOT_MAX_DIST:
        raise ValueError(f"span_not dist must be <= {SPAN_NOT_MAX_DIST}")
    inc_docs = np.asarray(inc_docs, dtype=np.int64)
    inc_pos = np.asarray(inc_pos, dtype=np.int64)
    exc_docs = np.asarray(exc_docs, dtype=np.int64)
    exc_pos = np.asarray(exc_pos, dtype=np.int64)
    keys_i = inc_docs * _SPAN_NOT_SHIFT + inc_pos
    keys_e = np.sort(exc_docs * _SPAN_NOT_SHIFT + exc_pos)
    lo = np.searchsorted(keys_e, keys_i - dist, side="left")
    hi = np.searchsorted(keys_e, keys_i + dist, side="right")
    keep = lo == hi
    d, c = np.unique(inc_docs[keep], return_counts=True)
    return d, c.astype(np.float64)


def span_sql_2(la_expr: str, lb_expr: str, source: str, slop: int,
               in_order: bool, name: str = "spanf", prefix: str = "sp") -> str:
    """DuckDB rendering of the 2-clause closed forms over a ``source``
    relation with (docid, {la_expr}, {lb_expr}) ascending RAW position
    lists.  Produces SQL selecting (docid, freq FLOAT) with freq > 0.

    ordered: candidates are adjacent A-then-B cross pairs of the merged
    order — pairs (a, b) with b > a, no A element in (a, b) and no B
    element in (a, b); width = b - a - 1.
    unordered: merge-path pairs — (a, b) such that A's predecessor of a
    is < b's run and vice versa: prev_a < b AND prev_b < a (seed pair
    included via the -1 default); width = |a - b| - 1.

    The float32 accumulation folds in candidate order (a, b ascending),
    matching the kernel's emission order."""
    if in_order:
        # adjacent A-then-B cross pairs: nothing from either list between
        cond = (
            "b.p > a.p "
            "AND NOT EXISTS (SELECT 1 FROM {pre}_ap a2 WHERE a2.docid = a.docid "
            "AND a2.p > a.p AND a2.p < b.p) "
            "AND NOT EXISTS (SELECT 1 FROM {pre}_bp b2 WHERE b2.docid = b.docid "
            "AND b2.p > a.p AND b2.p < b.p)"
        )
        width = "b.p - a.p - 1"
        ord_key = "a.p"  # the chain advances clause 0 strictly
    else:
        # merge-path pairs: each list's predecessor is before the other
        cond = (
            "coalesce((SELECT max(a2.p) FROM {pre}_ap a2 WHERE a2.docid = a.docid "
            "AND a2.p < a.p), -1) < b.p "
            "AND coalesce((SELECT max(b2.p) FROM {pre}_bp b2 WHERE b2.docid = b.docid "
            "AND b2.p < b.p), -1) < a.p"
        )
        width = "greatest(a.p, b.p) - least(a.p, b.p) - 1"
        ord_key = "least(a.p, b.p)"  # the sweep's min strictly increases
    cond = cond.format(pre=prefix)
    return f"""
{prefix}_ap AS (SELECT docid, unnest({la_expr}) AS p FROM {source}),
{prefix}_bp AS (SELECT docid, unnest({lb_expr}) AS p FROM {source}),
{prefix}_cand AS (
  SELECT a.docid, {ord_key} AS ord, {width} AS w
  FROM {prefix}_ap a JOIN {prefix}_bp b ON a.docid = b.docid
  WHERE {cond}
),
{name} AS (
  SELECT docid,
         CAST(list_reduce(
           list_prepend(CAST(0.0 AS FLOAT),
                        list(CAST(1.0 / (1.0 + w) AS FLOAT) ORDER BY ord)),
           (x, y) -> CAST(x + y AS FLOAT)) AS FLOAT) AS freq
  FROM {prefix}_cand WHERE w <= {slop}
  GROUP BY docid
)"""


def span_contain_freq(
    big_lists: list[np.ndarray],
    little_pos: np.ndarray,
    slop: int,
    in_order: bool,
    emit: str,
) -> np.float32:
    """Lucene ``span_containing`` / ``span_within`` for ONE document,
    with big = a span_near over single-term clauses and little = a
    single-term span.

    Big spans are this engine's span_near candidates (the frozen chain /
    sweep enumeration above) that satisfy ``slop``; a big span [s, e)
    contains little position q iff s <= q < e.

    * emit='big' (span_containing): every enumerated big candidate that
      contains >= 1 little position contributes 1/(1+width), float32-
      accumulated in enumeration order — SpanContainingQuery emits the
      big spans.
    * emit='little' (span_within): every little position contained in
      >= 1 qualifying big candidate contributes 1.0 (width-0 span),
      counted once regardless of how many bigs contain it —
      SpanWithinQuery emits the little spans.
    """
    k = len(big_lists)
    lists = []
    for pl in big_lists:
        a = np.asarray(pl, dtype=np.int64)
        if a.size == 0:
            return np.float32(0.0)
        lists.append(a)
    little = np.asarray(little_pos, dtype=np.int64)
    if little.size == 0:
        return np.float32(0.0)
    little = np.sort(little)

    def contains(s: int, e: int) -> bool:
        i = int(np.searchsorted(little, s, side="left"))
        return i < little.size and int(little[i]) < e

    freq = np.float32(0.0)
    contained = np.zeros(little.size, dtype=bool)

    def visit(vals: list[int]) -> None:
        nonlocal freq
        s, mx = min(vals), max(vals)
        e = mx + 1
        width = (mx - s + 1) - k if not in_order else vals[-1] - vals[0] - (k - 1)
        if width > slop:
            return
        if emit == "big":
            if contains(s, e):
                freq = np.float32(freq + np.float32(1.0 / (1.0 + width)))
        else:
            lo = int(np.searchsorted(little, s, side="left"))
            hi = int(np.searchsorted(little, e, side="left"))
            contained[lo:hi] = True

    if in_order:
        idx = [0] * k
        while True:
            exhausted = False
            for i in range(1, k):
                prev = int(lists[i - 1][idx[i - 1]])
                j = int(np.searchsorted(lists[i], prev, side="right"))
                if j >= lists[i].size:
                    exhausted = True
                    break
                idx[i] = max(idx[i], j)
            if exhausted:
                break
            for i in range(k - 2, -1, -1):
                nxt = int(lists[i + 1][idx[i + 1]])
                j = int(np.searchsorted(lists[i], nxt, side="left")) - 1
                if j > idx[i]:
                    idx[i] = j
            visit([int(lists[i][idx[i]]) for i in range(k)])
            idx[0] += 1
            if idx[0] >= lists[0].size:
                break
    else:
        idx = [0] * k
        while True:
            visit([int(lists[i][idx[i]]) for i in range(k)])
            vals = [int(lists[i][idx[i]]) for i in range(k)]
            mi = int(np.argmin(vals))
            idx[mi] += 1
            if idx[mi] >= lists[mi].size:
                break
    if emit == "little":
        freq = np.float32(0.0)
        for c in contained:  # ascending-q float32 fold, like every kernel
            if c:
                freq = np.float32(freq + np.float32(1.0))
    return freq


def span_contain_freqs_flat(
    big_docs: list[np.ndarray],
    big_pos: list[np.ndarray],
    little_docs: np.ndarray,
    little_pos: np.ndarray,
    slop: int,
    in_order: bool,
    emit: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc span_containing/within frequencies from flat per-clause
    (docid, position) arrays — big clauses first, little last, the same
    shape the decode paths hold.  Docs missing ANY term are skipped."""
    docs_all = list(big_docs) + [little_docs]
    pos_all = list(big_pos) + [little_pos]
    k = len(docs_all)
    docs_sorted: list[np.ndarray] = []
    pos_sorted: list[np.ndarray] = []
    common: np.ndarray | None = None
    for d, p in zip(docs_all, pos_all):
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
    bounds = [
        (np.searchsorted(docs_sorted[i], common, side="left"),
         np.searchsorted(docs_sorted[i], common, side="right"))
        for i in range(k)
    ]
    for j in range(common.size):
        pls = [pos_sorted[i][bounds[i][0][j] : bounds[i][1][j]] for i in range(k)]
        f = span_contain_freq(pls[:-1], pls[-1], slop, in_order, emit)
        if f > 0:
            out_d.append(int(common[j]))
            out_f.append(float(f))
    return (
        np.asarray(out_d, dtype=np.int64),
        np.asarray(out_f, dtype=np.float64),
    )


def span_contain_sql_2(
    la_expr: str,
    lb_expr: str,
    ll_expr: str,
    source: str,
    slop: int,
    in_order: bool,
    emit: str,
    name: str = "scf",
    prefix: str = "sc",
) -> str:
    """DuckDB rendering for a 2-clause big span + single-term little:
    the span_sql_2 candidate pairs (adjacent cross pairs / merge-path
    pairs) extended with the containment test against the little
    positions (``ll_expr``, ascending list on the same ``source``
    relation).  emit='big' folds 1/(1+w) over containing candidates in
    candidate order; emit='little' counts DISTINCT contained little
    positions."""
    if in_order:
        cond = (
            "b.p > a.p "
            "AND NOT EXISTS (SELECT 1 FROM {pre}_ap a2 WHERE a2.docid = a.docid "
            "AND a2.p > a.p AND a2.p < b.p) "
            "AND NOT EXISTS (SELECT 1 FROM {pre}_bp b2 WHERE b2.docid = b.docid "
            "AND b2.p > a.p AND b2.p < b.p)"
        )
        width = "b.p - a.p - 1"
        ord_key = "a.p"
        start, end = "a.p", "b.p + 1"
    else:
        cond = (
            "coalesce((SELECT max(a2.p) FROM {pre}_ap a2 WHERE a2.docid = a.docid "
            "AND a2.p < a.p), -1) < b.p "
            "AND coalesce((SELECT max(b2.p) FROM {pre}_bp b2 WHERE b2.docid = b.docid "
            "AND b2.p < b.p), -1) < a.p"
        )
        width = "greatest(a.p, b.p) - least(a.p, b.p) - 1"
        ord_key = "least(a.p, b.p)"
        start, end = "least(a.p, b.p)", "greatest(a.p, b.p) + 1"
    cond = cond.format(pre=prefix)
    base = f"""
{prefix}_ap AS (SELECT docid, unnest({la_expr}) AS p FROM {source}),
{prefix}_bp AS (SELECT docid, unnest({lb_expr}) AS p FROM {source}),
{prefix}_lp AS (SELECT docid, unnest({ll_expr}) AS q FROM {source}),
{prefix}_cand AS (
  SELECT a.docid, {ord_key} AS ord, {width} AS w, {start} AS s, {end} AS e
  FROM {prefix}_ap a JOIN {prefix}_bp b ON a.docid = b.docid
  WHERE {cond}
)"""
    if emit == "big":
        return base + f""",
{name} AS (
  SELECT docid,
         CAST(list_reduce(
           list_prepend(CAST(0.0 AS FLOAT),
                        list(CAST(1.0 / (1.0 + w) AS FLOAT) ORDER BY ord)),
           (x, y) -> CAST(x + y AS FLOAT)) AS FLOAT) AS freq
  FROM {prefix}_cand c
  WHERE w <= {slop}
    AND EXISTS (SELECT 1 FROM {prefix}_lp l
                WHERE l.docid = c.docid AND l.q >= c.s AND l.q < c.e)
  GROUP BY docid
)"""
    return base + f""",
{name} AS (
  SELECT l.docid, CAST(count(DISTINCT l.q) AS FLOAT) AS freq
  FROM {prefix}_lp l
  WHERE EXISTS (SELECT 1 FROM {prefix}_cand c
                WHERE c.docid = l.docid AND c.w <= {slop}
                  AND l.q >= c.s AND l.q < c.e)
  GROUP BY l.docid
)"""
