"""Frozen pure-Python/numpy reference scorer ("the Lucene stand-in").

The reference's correctness oracle is OpenSearch/Lucene itself, which this
sandbox cannot run; SURVEY.md §5.2 therefore freezes an exhaustive,
no-skipping scorer with exactly the Lucene-default semantics the reference
relies on (StandardAnalyzer-style tokenization, BM25 k1=1.2 b=0.75, lossy
SmallFloat norms, score-desc / docID-asc tie-break).  The Spark engine must
be rank- AND score-identical to this oracle on every query class the
reference's dashboards use: term, AND, OR, NOT, phrase-within-turn,
keyword filter, time-range filter (SURVEY.md §2.3).

This module is intentionally NOT distributed — it is small-corpus ground
truth for pytest.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions import bm25
from ..functions.analysis import tokenize
from ..functions.sloppy import sloppy_freq
from ..functions.intervals import intervals_freq, spec_required_terms
from ..functions.spans import span_contain_freq, span_freq
from ..functions.smallfloat import encode_lengths
from ..plans.query import (
    MAX_CLAUSE_COUNT,
    And,
    AtLeast,
    Fuzzy,
    MultiPhrase,
    Node,
    Not,
    Or,
    Phrase,
    PhrasePrefix,
    Regexp,
    Intervals,
    SpanContaining,
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanWithin,
    Term,
    phrase_slots,
    apply_minimum_should_match,
    expand_multiterm,
    extract_filters,
    filter_mask,
    filters_active,
    levenshtein_within,
    merge_filters,
    parse,
    wildcard_regex,
)


@dataclass
class OracleHit:
    docid: int
    score: np.float32


class LuceneOracle:
    """Exhaustive in-memory index + scorer over a transcript DataFrame."""

    def __init__(self, pdf: pd.DataFrame):
        # stable docID order: (conv_id, turn_idx) — BASELINE.json input_hint
        pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
        self.meta = pdf
        self.n_docs = len(pdf)
        tokens = [tokenize(t) for t in pdf["text"].tolist()]
        self.dl = np.array([len(t) for t in tokens], dtype=np.int64)
        self.norm_bytes = encode_lengths(self.dl)
        self.doc_count = int((self.dl > 0).sum())
        self.sum_dl = int(self.dl.sum())
        self.avgdl = self.sum_dl / self.doc_count if self.doc_count else 0.0
        self.cache = bm25.norm_inverse_cache(self.avgdl) if self.doc_count else None
        # postings: term -> {docid: [positions]}
        post: dict[str, dict[int, list[int]]] = {}
        for docid, toks in enumerate(tokens):
            for pos, term in enumerate(toks):
                post.setdefault(term, {}).setdefault(docid, []).append(pos)
        self.postings = post

    # ---- clause evaluation: (match mask, float64 accum of float32 scores)

    def _term_tf(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        entry = self.postings.get(term, {})
        docids = np.fromiter(entry.keys(), dtype=np.int64, count=len(entry))
        tfs = np.fromiter((len(v) for v in entry.values()), dtype=np.int64, count=len(entry))
        return docids, tfs

    def _score_clause(self, docids: np.ndarray, tfs: np.ndarray, dfs: list[int]) -> tuple[np.ndarray, np.ndarray]:
        mask = np.zeros(self.n_docs, dtype=bool)
        acc = np.zeros(self.n_docs, dtype=np.float64)
        if docids.size == 0 or self.doc_count == 0:
            return mask, acc
        weight = bm25.clause_weight(dfs, self.doc_count)
        s = bm25.score_tf(tfs, self.norm_bytes[docids], weight, self.cache)
        mask[docids] = True
        acc[docids] = s.astype(np.float64)
        return mask, acc

    def _eval(self, node: Node) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(node, Term):
            docids, tfs = self._term_tf(node.term)
            mask, acc = self._score_clause(docids, tfs, [docids.size])
            return mask, acc * node.boost
        if isinstance(node, Phrase):
            docids, pfs = self._phrase_freq(phrase_slots(node), node.slop)
            dfs = [len(self.postings.get(t, {})) for t in node.terms]
            mask, acc = self._score_clause(docids, pfs, dfs)
            return mask, acc * node.boost
        if isinstance(node, SpanNear):
            docids, pfs = self._span_near_freq(node)
            dfs = [len(self.postings.get(t, {})) for t in node.terms]
            mask, acc = self._score_clause(docids, pfs, dfs)
            return mask, acc * node.boost
        if isinstance(node, (SpanContaining, SpanWithin)):
            emit = "big" if isinstance(node, SpanContaining) else "little"
            bigs = [self.postings.get(t, {}) for t in node.big]
            lit = self.postings.get(node.little, {})
            common = set(lit)
            for m in bigs:
                common &= set(m)
            docids, pfs = [], []
            for d in sorted(common):
                f = float(span_contain_freq(
                    [np.asarray(m[d], dtype=np.int64) for m in bigs],
                    np.asarray(lit[d], dtype=np.int64),
                    node.slop, node.in_order, emit,
                ))
                if f:
                    docids.append(d)
                    pfs.append(f)
            dfs = [len(self.postings.get(t, {})) for t in node.terms]
            mask, acc = self._score_clause(
                np.asarray(docids, dtype=np.int64),
                np.asarray(pfs, dtype=np.float64), dfs,
            )
            return mask, acc * node.boost
        if isinstance(node, SpanFirst):
            pmap = self.postings.get(node.term, {})
            docids, pfs = [], []
            for d in sorted(pmap):
                c = sum(1 for p in pmap[d] if p < node.end)
                if c:
                    docids.append(d)
                    pfs.append(float(c))
            mask, acc = self._score_clause(
                np.asarray(docids, dtype=np.int64),
                np.asarray(pfs, dtype=np.float64),
                [len(pmap)],
            )
            return mask, acc * node.boost
        if isinstance(node, SpanNot):
            imap = self.postings.get(node.include, {})
            emap = self.postings.get(node.exclude, {})
            docids, pfs = [], []
            for d in sorted(imap):
                ex = emap.get(d, ())
                c = sum(
                    1
                    for p in imap[d]
                    if not any(abs(q - p) <= node.dist for q in ex)
                )
                if c:
                    docids.append(d)
                    pfs.append(float(c))
            mask, acc = self._score_clause(
                np.asarray(docids, dtype=np.int64),
                np.asarray(pfs, dtype=np.float64),
                [len(imap)],
            )
            return mask, acc * node.boost
        if isinstance(node, Intervals):
            # minimal-interval kernel per candidate doc; candidates =
            # docs holding every REQUIRED term (optional any_of /
            # negated-reference terms only add candidates when required
            # is empty)
            req = sorted(spec_required_terms(node.spec))
            maps = {t: self.postings.get(t, {}) for t in node.terms}
            if req:
                common = set(maps[req[0]])
                for t in req[1:]:
                    common &= set(maps[t])
            else:
                common = set()
                for m in maps.values():
                    common |= set(m)
            docids, pfs = [], []
            for d in sorted(common):
                pos_of = {
                    t: np.asarray(m[d], dtype=np.int64)
                    for t, m in maps.items()
                    if d in m
                }
                f = float(intervals_freq(node.spec, pos_of))
                if f:
                    docids.append(d)
                    pfs.append(f)
            dfs = [len(maps[t]) for t in node.terms]
            mask, acc = self._score_clause(
                np.asarray(docids, dtype=np.int64),
                np.asarray(pfs, dtype=np.float64), dfs,
            )
            return mask, acc * node.boost
        if isinstance(node, (MultiPhrase, SpanOr)):
            # match_phrase_prefix / span_or: union-of-positions adjacency
            # per slot, grouped per-slot weight association
            # (bm25.grouped_weight)
            docids, pfs = self._phrase_freq(node.slots, 0)
            mask = np.zeros(self.n_docs, dtype=bool)
            acc = np.zeros(self.n_docs, dtype=np.float64)
            if docids.size and self.doc_count:
                weight = bm25.grouped_weight(
                    [[len(self.postings.get(t, {})) for t in ts] for ts in node.slots],
                    self.doc_count)
                sc = bm25.score_tf(pfs, self.norm_bytes[docids], weight, self.cache)
                mask[docids] = True
                acc[docids] = sc.astype(np.float64)
            return mask, acc * node.boost
        if isinstance(node, And):
            masks, accs = zip(*(self._eval(c) for c in node.children))
            mask = np.logical_and.reduce(masks)
            return mask, np.sum(accs, axis=0)
        if isinstance(node, Or):
            masks, accs = zip(*(self._eval(c) for c in node.children))
            mask = np.logical_or.reduce(masks)
            return mask, np.sum(accs, axis=0)
        if isinstance(node, AtLeast):
            masks, accs = zip(*(self._eval(c) for c in node.children))
            return np.sum(masks, axis=0) >= node.m, np.sum(accs, axis=0)
        if isinstance(node, Not):
            m, _ = self._eval(node.child)
            return ~m, np.zeros(self.n_docs, dtype=np.float64)
        raise TypeError(node)

    def _span_near_freq(self, node: SpanNear) -> tuple[np.ndarray, np.ndarray]:
        """span_near frequency per doc: the functions/spans.py kernel over
        raw per-term position lists (no slot offsets)."""
        maps = [self.postings.get(t, {}) for t in node.terms]
        if any(not m for m in maps):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        common = set(maps[0])
        for m in maps[1:]:
            common &= set(m)
        docids, pfs = [], []
        for d in sorted(common):
            f = float(span_freq(
                [np.asarray(m[d], dtype=np.int64) for m in maps],
                node.slop, node.in_order,
            ))
            if f:
                docids.append(d)
                pfs.append(f)
        return np.asarray(docids, dtype=np.int64), np.asarray(pfs, dtype=np.float64)

    def _phrase_freq(self, slots: tuple[tuple[str, ...], ...], slop: int = 0) -> tuple[np.ndarray, np.ndarray]:
        """Docs where each slot matches at consecutive positions (slop = 0;
        freq = adjacency count) or within ``slop`` total displacement
        (freq = Lucene sloppy frequency, functions/sloppy.py).  A slot is
        a tuple of term alternatives (singleton for plain phrases); its
        per-doc positions are the union over alternatives — one term per
        (doc, pos), so the union is a merge of disjoint sorted lists."""
        def slot_map(ts):
            out: dict[int, list[int]] = {}
            for t in ts:
                for d, pl in self.postings.get(t, {}).items():
                    out.setdefault(d, []).extend(pl)
            return {d: sorted(pl) for d, pl in out.items()}

        maps = [slot_map(ts) for ts in slots]
        if any(not m for m in maps):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        common = set(maps[0])
        for m in maps[1:]:
            common &= set(m)
        docids, pfs = [], []
        for d in sorted(common):
            if slop > 0:
                pf = float(sloppy_freq([np.asarray(m[d], dtype=np.int64) for m in maps], slop))
            else:
                base = np.asarray(maps[0][d], dtype=np.int64)
                ok = np.ones(base.shape, dtype=bool)
                for i, m in enumerate(maps[1:], start=1):
                    nxt = np.asarray(m[d], dtype=np.int64)
                    ok &= np.isin(base + i, nxt)
                pf = int(ok.sum())
            if pf:
                docids.append(d)
                pfs.append(pf)
        return np.asarray(docids, dtype=np.int64), np.asarray(pfs, dtype=np.float64)

    # ---- public API

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
    ) -> list[OracleHit]:
        ast, dqlf = extract_filters(parse(query), query)
        ast = apply_minimum_should_match(ast, minimum_should_match, query)
        filt = merge_filters(
            query,
            {"role": role, "tool": tool, "ts_min": ts_min, "ts_max": ts_max,
             "role_not": tuple(role_not), "tool_not": tuple(tool_not)},
            dqlf,
        )

        def expander(leaf) -> list[str]:
            if isinstance(leaf, PhrasePrefix):
                pfx = leaf.terms[-1]
                return sorted(
                    t for t in self.postings if t.startswith(pfx)
                )[: leaf.max_expansions]
            if isinstance(leaf, Fuzzy):
                return sorted(
                    t for t in self.postings
                    if levenshtein_within(t, leaf.term, leaf.max_edits)
                )
            if isinstance(leaf, Regexp):
                import re as _re

                rx = _re.compile(f"^(?:{leaf.pattern})$")
            else:
                rx = wildcard_regex(leaf.pattern)
            return sorted(t for t in self.postings if rx.match(t))

        ast = expand_multiterm(ast, expander, MAX_CLAUSE_COUNT)
        mask, acc = self._eval(ast)
        if filters_active(filt):
            mask &= filter_mask(self.meta["role"], self.meta["tool"], self.meta["ts"], filt)
        docids = np.nonzero(mask)[0]
        scores = acc[docids].astype(np.float32)
        order = np.lexsort((docids, -scores.astype(np.float64)))[:k]
        return [OracleHit(int(docids[i]), np.float32(scores[i])) for i in order]
