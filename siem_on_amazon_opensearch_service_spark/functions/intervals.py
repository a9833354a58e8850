"""Minimal-interval algebra: the Lucene/OpenSearch ``intervals`` query.

The reference exposes OpenSearch's full query DSL to its dashboards and
alerting rules; the ``intervals`` query (Lucene's intervals module —
``IntervalQuery`` / ``IntervalsSource``) is the positional-algebra
member of that surface: ordered/unordered proximity with ``max_gaps``,
``any_of`` alternation, and relational filters (containing,
contained_by, not_containing, not_contained_by, not_overlapping,
before, after).  This is deliberately NOT the span family
(functions/spans.py): spans iterate candidate enumerations whose
emitted windows are a strict subset of interval windows (see the
span_containing percolation negative result) — intervals implement
Clarke/Cormack *minimal-interval semantics* (Vigna, "Efficient Lazy
Algorithms for Minimal-Interval Semantics"): every operator produces
the ANTICHAIN of matching intervals, i.e. matching intervals that
contain no other matching interval.

Frozen contract (documented divergences called out where frozen):

* A minimal-interval list has strictly increasing starts AND ends.
* ``term`` -> one [p, p] interval per position.
* ``ordered(c1..ck)`` -> minimal [s, e] where children match in order,
  each child interval starting strictly after its predecessor's end
  (Lucene ``OrderedIntervalsSource``).  Enumeration: for each interval
  of c1, greedily chain each later child's FIRST interval past the
  predecessor's end (first-by-start == first-by-end on a minimal
  list), then minimalize the candidates.
* ``unordered(c1..ck)`` -> minimal windows containing one interval of
  each child, overlaps allowed (Lucene ``Intervals.unordered``).
  Enumeration: the k-way merge-path sweep over child interval lists
  (advance the minimum-start pointer), then minimalize.
* ``any_of`` -> minimalized union (``DisjunctionIntervalsSource``).
* ``max_gaps`` on ordered/unordered: each interval carries its
  *content* = sum of its constituent child contents (a term has
  content 1); gaps = (e - s + 1) - content.  Intervals with
  gaps > max_gaps are dropped AFTER minimalization (Lucene's
  ``maxgaps`` filters the source's minimal iterator).  Overlapping
  unordered children can drive gaps negative; negative gaps always
  pass (frozen).  When dedup/minimalization collapses equal [s, e]
  windows the SMALLEST content (largest gaps) is kept — frozen,
  conservative for the filter.
* Filters keep source intervals by an existential over the
  reference's minimal intervals: containing (some ref inside),
  contained_by (inside some ref), not_containing / not_contained_by /
  not_overlapping (complements), before (ends before some ref start),
  after (starts after some ref end).  A subset of an antichain is an
  antichain, so no re-minimalization is needed.
* Frequency: float32 fold of 1/(1 + (e - s)) over the root's minimal
  intervals in ascending order — the engine-wide slop-factor
  convention (sloppy/span kernels).  FROZEN: Lucene's IntervalScorer
  computes per-interval weight from the interval iterator too; absent
  the reference binary this engine freezes the width-based form and
  the DuckDB oracle reproduces it bit-for-bit.
* Clause weight: summed idf over ALL terms of the spec (filters'
  reference terms included) in first-appearance order —
  ``IntervalQuery`` builds one SimWeight from every extracted term.

Reference parity notes: the reference's OpenSearch endpoint accepts
this query under ``query.intervals`` (public OpenSearch query DSL);
the engine's textual surface is ``intervals(...)`` in plans/query.py.
Repeated terms anywhere in one intervals spec are rejected at parse
(same rule as the span family — Lucene's repeat handling is its own
machinery).
"""

from __future__ import annotations

from bisect import bisect_right
from dataclasses import dataclass

import numpy as np

#: relational filter kinds (IFilter.kind)
FILTER_KINDS = (
    "containing",
    "contained_by",
    "not_containing",
    "not_contained_by",
    "not_overlapping",
    "before",
    "after",
)
#: filters whose match REQUIRES the reference to produce an interval
EXISTENTIAL_FILTERS = ("containing", "contained_by", "before", "after")


@dataclass(frozen=True)
class ITerm:
    term: str


@dataclass(frozen=True)
class ICombine:
    """ordered / unordered over >= 2 children; max_gaps = -1 unlimited."""

    kind: str  # 'ordered' | 'unordered'
    children: tuple
    max_gaps: int = -1


@dataclass(frozen=True)
class IAnyOf:
    children: tuple


@dataclass(frozen=True)
class IFilter:
    kind: str  # one of FILTER_KINDS
    source: object
    reference: object


def spec_terms(spec) -> list[str]:
    """All terms of a spec in first-appearance order (the clause's
    canonical term order: slots, weight fold, SQL idf sum)."""
    out: list[str] = []

    def walk(s) -> None:
        if isinstance(s, ITerm):
            if s.term not in out:
                out.append(s.term)
        elif isinstance(s, (ICombine, IAnyOf)):
            for c in s.children:
                walk(c)
        elif isinstance(s, IFilter):
            walk(s.source)
            walk(s.reference)
        else:
            raise TypeError(s)

    walk(spec)
    return out


def spec_required_terms(spec) -> set[str]:
    """Terms a matching doc MUST contain: term -> itself;
    ordered/unordered -> union over children; any_of -> intersection;
    existential filters -> source u reference (both sides must emit an
    interval); negated filters -> source only."""
    if isinstance(spec, ITerm):
        return {spec.term}
    if isinstance(spec, ICombine):
        out: set[str] = set()
        for c in spec.children:
            out |= spec_required_terms(c)
        return out
    if isinstance(spec, IAnyOf):
        sets = [spec_required_terms(c) for c in spec.children]
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return out
    if isinstance(spec, IFilter):
        if spec.kind in EXISTENTIAL_FILTERS:
            return spec_required_terms(spec.source) | spec_required_terms(spec.reference)
        return spec_required_terms(spec.source)
    raise TypeError(spec)


def _minimalize(cands: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Antichain of (s, e, content) triples: drop every interval that
    contains another (s' >= s and e' <= e, as a SET — exact [s, e]
    duplicates collapse to one, keeping the smallest content).  Sweep in
    (s desc, e asc, content desc) order tracking the min end seen: a seen
    interval has s' >= s, so seen_min_e <= e proves containment."""
    if len(cands) <= 1:
        return list(cands)
    cands = sorted(cands, key=lambda t: (-t[0], t[1], -t[2]))
    out: list[tuple[int, int, int]] = []
    best_e = None
    for s, e, c in cands:
        if best_e is not None and best_e <= e:
            continue
        out.append((s, e, c))
        best_e = e
    out.reverse()
    return out


def interval_list(spec, pos_of: dict[str, np.ndarray]) -> list[tuple[int, int, int]]:
    """Minimal (s, e, content) intervals of ``spec`` for ONE document.
    ``pos_of[term]`` = ascending in-doc positions (missing/empty = term
    absent)."""
    if isinstance(spec, ITerm):
        ps = pos_of.get(spec.term)
        if ps is None:
            return []
        return [(int(p), int(p), 1) for p in ps]
    if isinstance(spec, IAnyOf):
        merged: list[tuple[int, int, int]] = []
        for c in spec.children:
            merged.extend(interval_list(c, pos_of))
        return _minimalize(merged)
    if isinstance(spec, ICombine):
        lists = [interval_list(c, pos_of) for c in spec.children]
        if any(not l for l in lists):
            return []
        k = len(lists)
        cands: list[tuple[int, int, int]] = []
        if spec.kind == "ordered":
            starts = [[iv[0] for iv in l] for l in lists]
            for a in lists[0]:
                s, prev_e, content = a[0], a[1], a[2]
                ok = True
                for j in range(1, k):
                    # first child-j interval starting strictly past the
                    # predecessor's end; minimal lists have increasing
                    # starts AND ends, so first-by-start == minimal end
                    i = bisect_right(starts[j], prev_e)
                    if i >= len(lists[j]):
                        # later firsts only end later -> no more chains
                        ok = False
                        break
                    iv = lists[j][i]
                    prev_e = iv[1]
                    content += iv[2]
                if not ok:
                    break
                cands.append((s, prev_e, content))
        else:  # unordered: k-way merge-path sweep over starts
            idx = [0] * k
            while True:
                ivs = [lists[j][idx[j]] for j in range(k)]
                s = min(iv[0] for iv in ivs)
                e = max(iv[1] for iv in ivs)
                cands.append((s, e, sum(iv[2] for iv in ivs)))
                mi = min(range(k), key=lambda j: ivs[j][0])
                idx[mi] += 1
                if idx[mi] >= len(lists[mi]):
                    break
        out = _minimalize(cands)
        if spec.max_gaps >= 0:
            out = [t for t in out if (t[1] - t[0] + 1) - t[2] <= spec.max_gaps]
        return out
    if isinstance(spec, IFilter):
        src = interval_list(spec.source, pos_of)
        if not src:
            return []
        ref = interval_list(spec.reference, pos_of)
        kind = spec.kind
        if kind == "containing":
            return [i for i in src if any(j[0] >= i[0] and j[1] <= i[1] for j in ref)]
        if kind == "not_containing":
            return [i for i in src if not any(j[0] >= i[0] and j[1] <= i[1] for j in ref)]
        if kind == "contained_by":
            return [i for i in src if any(i[0] >= j[0] and i[1] <= j[1] for j in ref)]
        if kind == "not_contained_by":
            return [i for i in src if not any(i[0] >= j[0] and i[1] <= j[1] for j in ref)]
        if kind == "not_overlapping":
            return [i for i in src if not any(j[1] >= i[0] and j[0] <= i[1] for j in ref)]
        if kind == "before":
            # exists a reference interval starting after the source ends
            last_start = max((j[0] for j in ref), default=None)
            if last_start is None:
                return []
            return [i for i in src if i[1] < last_start]
        if kind == "after":
            first_end = min((j[1] for j in ref), default=None)
            if first_end is None:
                return []
            return [i for i in src if i[0] > first_end]
        raise ValueError(kind)
    raise TypeError(spec)


def intervals_freq(spec, pos_of: dict[str, np.ndarray]) -> np.float32:
    """Document frequency: float32 fold of 1/(1 + width) over the root's
    minimal intervals in ascending order."""
    freq = np.float32(0.0)
    for s, e, _ in interval_list(spec, pos_of):
        freq = np.float32(freq + np.float32(1.0 / (1.0 + (e - s))))
    return freq


def intervals_freqs_flat(
    slot_docs: list[np.ndarray],
    slot_pos: list[np.ndarray],
    spec,
    terms: tuple[str, ...],
    required_slots: frozenset[int],
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc intervals frequencies from flat per-slot (docid, position)
    arrays — the decode shape every phrase-like kernel consumes.  Slot i
    holds term ``terms[i]``'s occurrences.  Candidate docs = the
    intersection of REQUIRED slots' doc sets (terms under any_of or a
    negated filter's reference are optional — their absence must not
    drop the doc); with no required slot, the union of all slots'.
    Zero-frequency docs are dropped."""
    k = len(slot_docs)
    docs_sorted: list[np.ndarray] = []
    pos_sorted: list[np.ndarray] = []
    uniq: list[np.ndarray] = []
    for d, p in zip(slot_docs, slot_pos):
        d = np.asarray(d, dtype=np.int64)
        p = np.asarray(p, dtype=np.int64)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        docs_sorted.append(d)
        pos_sorted.append(p)
        uniq.append(np.unique(d))
    cand: np.ndarray | None = None
    if required_slots:
        for i in sorted(required_slots):
            cand = uniq[i] if cand is None else np.intersect1d(cand, uniq[i], assume_unique=True)
            if cand.size == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    else:
        cand = np.unique(np.concatenate(uniq)) if uniq else np.empty(0, dtype=np.int64)
    if cand is None or cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    bounds = [
        (np.searchsorted(docs_sorted[i], cand, side="left"),
         np.searchsorted(docs_sorted[i], cand, side="right"))
        for i in range(k)
    ]
    out_d, out_f = [], []
    for j in range(cand.size):
        pos_of = {
            terms[i]: pos_sorted[i][bounds[i][0][j] : bounds[i][1][j]]
            for i in range(k)
            if bounds[i][1][j] > bounds[i][0][j]
        }
        f = intervals_freq(spec, pos_of)
        if f > 0:
            out_d.append(int(cand[j]))
            out_f.append(float(f))
    return (
        np.asarray(out_d, dtype=np.int64),
        np.asarray(out_f, dtype=np.float64),
    )


# ---------------------------------------------------------------------------
# DuckDB SQL closed forms (driver-oracle rendering)
#
# Renderable shapes (wider specs are engine + frozen-Python-oracle
# territory, refused loudly by the caller like wide span_near):
#   * ITerm
#   * IAnyOf over ITerms (point union: distinct terms never nest)
#   * ICombine of exactly 2 ITerms (+ max_gaps)
#   * IFilter whose source AND reference are each one of the above
# The candidate CTEs are definitional (all-pairs + NOT EXISTS
# minimalization), not the kernel's sweep — result-not-mechanics, the
# repo's standing oracle contract.


def _sq(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def sql_interval_ctes(spec, name: str, prefix: str, tok: str = "tok") -> list[str]:
    """CTE list ending in ``name`` = (docid, s, e, c) minimal intervals of
    ``spec`` over the ``tok`` (docid, term, pos) relation.  Raises
    NotImplementedError for shapes outside the renderable subset."""
    if isinstance(spec, ITerm):
        return [
            f"{name} AS (SELECT docid, pos AS s, pos AS e, 1 AS c FROM {tok} "
            f"WHERE term = {_sq(spec.term)})"
        ]
    if isinstance(spec, IAnyOf):
        if not all(isinstance(c, ITerm) for c in spec.children):
            raise NotImplementedError(
                "SQL oracle renders any_of over plain terms only; nested "
                "any_of branches are covered by the frozen Python oracle"
            )
        terms = ", ".join(_sq(c.term) for c in spec.children)
        # single positions never contain each other: already minimal.
        # DISTINCT guards the (impossible under this engine's analyzer)
        # two-terms-one-position case the kernel's dedup would collapse.
        return [
            f"{name} AS (SELECT DISTINCT docid, pos AS s, pos AS e, 1 AS c "
            f"FROM {tok} WHERE term IN ({terms}))"
        ]
    if isinstance(spec, ICombine):
        if len(spec.children) != 2 or not all(
            isinstance(c, ITerm) for c in spec.children
        ):
            raise NotImplementedError(
                "SQL oracle renders ordered/unordered of exactly 2 terms; "
                "wider/nested combines are covered by the frozen Python oracle"
            )
        ta, tb = spec.children[0].term, spec.children[1].term
        parts = [
            f"{prefix}_a AS (SELECT docid, pos AS p FROM {tok} WHERE term = {_sq(ta)})",
            f"{prefix}_b AS (SELECT docid, pos AS p FROM {tok} WHERE term = {_sq(tb)})",
        ]
        if spec.kind == "ordered":
            parts.append(
                f"{prefix}_cand AS (SELECT a.docid, a.p AS s, "
                f"(SELECT min(b.p) FROM {prefix}_b b "
                f"WHERE b.docid = a.docid AND b.p > a.p) AS e "
                f"FROM {prefix}_a a)"
            )
        else:
            parts.append(
                f"{prefix}_cand AS (SELECT a.docid, least(a.p, b.p) AS s, "
                f"greatest(a.p, b.p) AS e "
                f"FROM {prefix}_a a JOIN {prefix}_b b ON a.docid = b.docid)"
            )
        gap_pred = (
            f" AND m.e - m.s - 1 <= {int(spec.max_gaps)}" if spec.max_gaps >= 0 else ""
        )
        parts.append(
            f"{name} AS (SELECT m.docid, m.s, m.e, 2 AS c FROM {prefix}_cand m "
            f"WHERE m.e IS NOT NULL AND NOT EXISTS ("
            f"SELECT 1 FROM {prefix}_cand o WHERE o.docid = m.docid "
            f"AND o.e IS NOT NULL AND o.s >= m.s AND o.e <= m.e "
            f"AND (o.s > m.s OR o.e < m.e)){gap_pred})"
        )
        return parts
    if isinstance(spec, IFilter):
        parts = sql_interval_ctes(spec.source, f"{prefix}_src", f"{prefix}s", tok)
        parts += sql_interval_ctes(spec.reference, f"{prefix}_ref", f"{prefix}r", tok)
        rel = {
            "containing": "r.s >= m.s AND r.e <= m.e",
            "contained_by": "m.s >= r.s AND m.e <= r.e",
            "not_containing": "r.s >= m.s AND r.e <= m.e",
            "not_contained_by": "m.s >= r.s AND m.e <= r.e",
            "not_overlapping": "r.e >= m.s AND r.s <= m.e",
            "before": "r.s > m.e",
            "after": "r.e < m.s",
        }[spec.kind]
        neg = "NOT " if spec.kind.startswith("not_") else ""
        parts.append(
            f"{name} AS (SELECT m.* FROM {prefix}_src m WHERE {neg}EXISTS ("
            f"SELECT 1 FROM {prefix}_ref r WHERE r.docid = m.docid AND {rel}))"
        )
        return parts
    raise TypeError(spec)


def sql_intervals_freq(spec, name: str, prefix: str, tok: str = "tok") -> str:
    """Full CTE chain ending in ``name`` = (docid, freq FLOAT), freq > 0:
    the float32 fold of 1/(1 + width) over minimal intervals in ascending
    order — bit-identical to :func:`intervals_freq`."""
    parts = sql_interval_ctes(spec, f"{prefix}_min", prefix, tok)
    parts.append(
        f"{name} AS (SELECT docid, "
        f"CAST(list_reduce(list_prepend(CAST(0.0 AS FLOAT), "
        f"list(CAST(1.0 / (1.0 + (e - s)) AS FLOAT) ORDER BY s, e)), "
        f"(x, y) -> CAST(x + y AS FLOAT)) AS FLOAT) AS freq "
        f"FROM {prefix}_min GROUP BY docid)"
    )
    return ",\n".join(parts)
