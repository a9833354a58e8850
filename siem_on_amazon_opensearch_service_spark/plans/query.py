"""Boolean/phrase/DQL query language -> AST.

Mirrors the query surface the reference actually exposes through OpenSearch
Dashboards saved objects: DQL term queries, bool must/should/must_not,
match_phrase, field-scoped phrase filters, exists filters, and
wildcard/prefix term queries (SURVEY.md §2.3;
/root/reference/source/saved_objects/each-indexpattern-search/*.ndjson
``searchSourceJSON`` — 80 phrase + 16 phrases + 1 exists filters).
Grammar:

    expr    := or
    or      := and (OR and)*
    and     := unary (AND unary)*
    unary   := NOT unary | atom
    atom    := '(' expr ')' | '"' phrase words '"'
             | field ':' value              # role:/tool: keyword filter
             | field ':' '"' value '"'      # quoted keyword value (spaces ok)
             | field ':' '(' v (OR v)* ')'  # is-one-of filter ('phrases')
             | field ':' '*'                # exists filter
             | NOT field-atom               # negated filter (negate: true)
             | 'text' ':' word              # field-scoped term
             | 'text' ':' '"' words '"'     # field-scoped phrase
             | 'text' ':' '(' w (OR w)* ')' # scoring OR of words
             | 'ts' ('>='|'<=') isodate     # inclusive time-range filter
             | word-with-*-or-?             # wildcard/prefix term query
             | word '~' [0|1|2]             # fuzzy term query (bare ~ = AUTO)
             | '/' pattern '/'              # regexp term query (anchored)
             | 'match' '(' params? text ')' # match query: analyze free text
             | 'simple_query_string' '(' params? sqs-text ')'
                                            # SimpleQueryParser: + | - () "" * ~N, lenient
             | word

Field atoms on keyword fields (role, tool) are NON-SCORING filters, the
DQL/filter-context semantics of the reference's saved searches; they are
legal only as the whole query or as direct positive conjuncts of the
top-level AND (``extract_filters``).  Wildcard and fuzzy atoms expand
against the index term dictionary into a scoring OR-of-terms (Lucene
SCORING_BOOLEAN_REWRITE), capped at MAX_CLAUSE_COUNT like Lucene's
BooleanQuery.maxClauseCount.

Fuzzy semantics (Lucene FuzzyQuery / the OpenSearch ``fuzziness`` param):
``term~N`` matches dictionary terms within N edits, N <= 2 like Lucene's
``LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE``; bare ``term~`` uses
the OpenSearch AUTO:3,6 ladder (0 edits below length 3, 1 below 6, else
2).  Distance is classic Levenshtein (insert/delete/substitute) — NOT
Damerau: Spark's ``levenshtein`` and DuckDB's ``levenshtein`` both
implement the classic form, so choosing it keeps the engine, the
distributed expansion, and the SQL oracle bit-identical; Lucene's default
``transpositions=true`` is the one deliberate divergence (a transposition
costs 2 here, documented, like FuzzyQuery(transpositions=false)).

Scoring semantics (Lucene bool): the document score is the float64 sum of
the float32 scores of the *matching* positive clauses, rounded to float32;
AND requires all operands, OR requires at least one, NOT filters without
contributing score.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions.analysis import tokenize
from ..functions.intervals import (
    FILTER_KINDS as _IV_FILTER_KINDS,
    IAnyOf,
    ICombine,
    IFilter,
    ITerm,
    spec_required_terms,
    spec_terms,
)
from ..functions.spans import SPAN_NOT_MAX_DIST as _SPAN_NOT_MAX_DIST


class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    term: str
    #: query-time boost (Lucene ``term^2``): multiplies the clause score;
    #: leaves with different boosts are distinct clauses
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase(Node):
    """Phrase-within-turn.  ``slop`` (``"a b"~2`` / match_phrase ``slop``)
    permits up to N total position displacements; slop = 0 is the exact
    adjacency phrase.  Sloppy frequency and its float32 accumulation
    follow Lucene's SloppyPhraseMatcher (functions/sloppy.py); phrases
    with REPEATED terms under slop > 0 are rejected at parse time
    (Lucene's repeating-term rptGroups machinery is out of scope — loud,
    not silently divergent)."""

    terms: tuple[str, ...]
    boost: float = 1.0
    slop: int = 0


@dataclass(frozen=True)
class PhrasePrefix(Node):
    """match_phrase_prefix (``"connection re"*``): a phrase whose LAST
    word is a term PREFIX.  Expanded against the term dictionary before
    execution (``expand_multiterm``): the first ``max_expansions``
    matching terms in dictionary order become the last slot of a
    ``MultiPhrase`` — Lucene's match_phrase_prefix TRUNCATES at
    max_expansions (default 50), it does not error like
    maxClauseCount.  Slop is not supported on phrase prefixes (a ``~N``
    after the ``*`` is rejected at parse time)."""

    terms: tuple[str, ...]  # fixed leading words + the prefix (last)
    boost: float = 1.0
    max_expansions: int = 50


@dataclass(frozen=True)
class SpanNear(Node):
    """Lucene/OpenSearch ``span_near`` over single-term clauses — DQL
    surface ``span_near(slop=N in_order=true a b c)`` (the query-DSL
    span family has no Lucene query-string syntax; this functional atom
    is the engine's textual rendering).  ``in_order`` defaults false
    like OpenSearch.  Frozen semantics (functions/spans.py): ordered =
    the stretch/shrink greedy chain (adjacent cross pairs at 2 clauses),
    unordered = every smallest-range sweep configuration; each candidate
    with width <= slop contributes 1/(1+width), float32-accumulated.
    Clause weight is the summed-idf ``bm25.clause_weight`` over the
    terms (SpanWeight builds one SimWeight across all clauses).
    Repeated terms are rejected at parse time (Lucene's overlapping
    same-term spans need its SpanPositionQueue machinery)."""

    terms: tuple[str, ...]
    slop: int = 0
    in_order: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFirst(Node):
    """Lucene/OpenSearch ``span_first`` over a single-term span — DQL
    surface ``span_first(end=N term)``: matches positions ``p`` with
    ``p + 1 <= end`` (a term span at ``p`` ends at ``p + 1``).  All
    matches are width 0, so frequency = qualifying-position count;
    weight is the term's full-df idf (SpanWeight uses collection
    stats, not the position-filtered count)."""

    term: str
    end: int
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNot(Node):
    """Lucene/OpenSearch ``span_not`` with symmetric pre/post — DQL
    surface ``span_not(dist=N include exclude)``: include-term positions
    survive unless an exclude-term position of the same doc lies within
    ``+/- dist``.  The exclude term is NOT required (docs lacking it
    match on every include position) and contributes no idf weight —
    pruning/required-term logic must treat only ``include`` as
    mandatory.  ``dist`` defaults 0, which over this engine's
    one-term-per-position analyzer never excludes anything for distinct
    terms (kept for Lucene parity; distinct terms never share a
    position).  Same-term include/exclude rejected at parse like
    span_near's repeated terms."""

    include: str
    exclude: str
    dist: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class SpanContaining(Node):
    """Lucene/OpenSearch ``span_containing`` — DQL surface
    ``span_containing(slop=N in_order=bool little=term b1 b2 ...)``:
    big spans are this engine's span_near candidates over the big
    clauses (width <= slop, optional order); a big span matching iff it
    contains >= 1 position of the little term.  Emits the BIG spans:
    freq = float32 fold of 1/(1+width) over containing candidates in
    enumeration order.  Weight = summed idf over big terms then little
    (SpanContainQuery builds one SimWeight from both sides).  All of
    big + little must be distinct terms (the span_near repeated-term
    rule, extended)."""

    big: tuple[str, ...]
    little: str
    slop: int = 0
    in_order: bool = False
    boost: float = 1.0

    @property
    def terms(self) -> tuple[str, ...]:
        return self.big + (self.little,)


@dataclass(frozen=True)
class SpanWithin(Node):
    """Lucene/OpenSearch ``span_within`` — same match SET as
    span_containing (the containment existential is symmetric) but
    emits the LITTLE spans: freq = count of little positions contained
    in >= 1 qualifying big candidate (each counted once, width-0
    slop factor).  Same weight and distinctness rules as
    span_containing."""

    big: tuple[str, ...]
    little: str
    slop: int = 0
    in_order: bool = False
    boost: float = 1.0

    @property
    def terms(self) -> tuple[str, ...]:
        return self.big + (self.little,)


@dataclass(frozen=True)
class SpanOr(Node):
    """Lucene/OpenSearch ``span_or`` over single-term clauses — DQL
    surface ``span_or(t1 t2 ...)``: the union of the terms' spans as ONE
    scoring clause.  Every span is width 0, so frequency = total
    occurrences of ANY of the terms; SpanOrQuery builds one SimWeight
    across all terms, frozen here as the grouped single-slot association
    ``bm25.grouped_weight([[df1, df2, ...]])`` (ordered float64 idf fold
    — the SQL oracle's ``list_reduce ... ORDER BY term`` matches because
    parse sorts the terms).  Engine-side it rides the MultiPhrase
    machinery as one slot of alternatives (``slots`` property); this is
    NOT the boolean ``a OR b``, which scores each term with its own idf.
    Duplicate terms rejected at parse (they would double-count)."""

    terms: tuple[str, ...]
    boost: float = 1.0

    @property
    def slots(self) -> tuple[tuple[str, ...], ...]:
        return (self.terms,)


@dataclass(frozen=True)
class SpanMulti(Node):
    """Lucene/OpenSearch ``span_multi`` — a multi-term query lifted into
    the span family.  DQL surface ``span_multi(err*)`` /
    ``span_multi(term~1)`` / ``span_multi(/rege?x/)``; the inner atom
    must be a multi-term query (Wildcard, Fuzzy or Regexp — Lucene's
    SpanMultiTermQueryWrapper takes a MultiTermQuery, so a plain term is
    rejected at parse).  Expansion (``expand_multiterm``) rewrites it
    into the ``SpanOr`` of its dictionary matches — the span-rewrite
    method (SpanOrQuery over the expanded SpanTermQueries, ONE SimWeight
    across all expansions), capped at maxClauseCount.  This differs from
    the bare multi-term atom's SCORING_BOOLEAN_REWRITE, which scores each
    expansion with its own idf and saturates per term; span_multi pools
    the occurrences under one grouped weight.  A single expansion
    collapses to the plain Term (a one-term span union is that term's
    spans, and the grouped fold of one idf is that idf); zero expansions
    match nothing.  Inner-atom boosts fold into the wrapper's boost
    (``span_multi(err*^2)`` == ``span_multi(err*)^2``), matching
    SpanMultiTermQueryWrapper's single top-level boost."""

    inner: Node  # Wildcard | Fuzzy | Regexp
    boost: float = 1.0


@dataclass(frozen=True)
class Intervals(Node):
    """Lucene/OpenSearch ``intervals`` query — minimal-interval algebra
    over single-term sources (functions/intervals.py holds the frozen
    semantics).  DQL surface::

        intervals(ordered(max_gaps=3 connection reset))
        intervals(not_containing(unordered(error timeout) refused))
        intervals(any_of(denied refused))

    combinators ``ordered`` / ``unordered`` (optional ``max_gaps=N``),
    ``any_of``, and the relational filters ``containing`` /
    ``contained_by`` / ``not_containing`` / ``not_contained_by`` /
    ``not_overlapping`` / ``before`` / ``after`` (two args: source then
    reference), nested arbitrarily over bare analyzed words.  Frequency
    = float32 fold of 1/(1+width) over the root's minimal intervals;
    weight = summed idf over ALL spec terms (filter references
    included) in first-appearance order — IntervalQuery builds one
    SimWeight from every extracted term.  Repeated terms anywhere in
    one spec are rejected at parse (the span-family rule).  Multi-term
    interval sources (prefix/wildcard/fuzzy) are out of scope — no
    syntax admits them, nothing silently diverges."""

    spec: object  # ITerm | ICombine | IAnyOf | IFilter tree
    boost: float = 1.0

    @property
    def terms(self) -> tuple[str, ...]:
        return tuple(spec_terms(self.spec))

    @property
    def required_slots(self) -> frozenset:
        """Slot indices (into ``terms``) whose term every match needs;
        terms under ``any_of`` branches or negated-filter references are
        optional — decode paths substitute empty position lists."""
        req = spec_required_terms(self.spec)
        return frozenset(i for i, t in enumerate(self.terms) if t in req)


@dataclass(frozen=True)
class MultiPhrase(Node):
    """Post-expansion multi-term phrase (Lucene MultiPhraseQuery): slot i
    matches ANY of ``slots[i]`` (an empty slot matches nothing — the
    zero-expansion phrase prefix).  Frequency is the exact-adjacency
    count over the UNION of each slot's term positions (at one
    (doc, pos) only one term exists, so the union is a concatenation);
    the clause weight is the float64 sum over slots of each slot's
    sequential idf subtotal (``bm25.grouped_weight``) — the association
    the SQL oracle reproduces with textual fixed-slot sums plus an
    ordered fold over the expansion slot.  Produced only by
    ``expand_multiterm``; never parsed directly."""

    slots: tuple[tuple[str, ...], ...]
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard(Node):
    """Wildcard/prefix term query (``err*``, ``w0004?``): ``*`` = any run,
    ``?`` = one token char.  Expanded against the term dictionary before
    execution (``expand_wildcards``)."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class Regexp(Node):
    """Regexp term query (``/err.r/``, Lucene RegexpQuery through the
    query_string ``/.../`` syntax): dictionary terms fully matching the
    anchored pattern.  Expanded against the term dictionary before
    execution like ``Wildcard`` (SCORING_BOOLEAN_REWRITE, maxClauseCount
    cap).

    Supported syntax is the common core where Python ``re``, DuckDB/RE2
    ``regexp_full_match``, and Lucene's RegExp agree on token strings:
    literals, ``.``, ``*``, ``+``, ``?``, ``{m,n}``, ``|``, groups
    ``(...)``, and character classes ``[a-z]`` / ``[^a-z]``.  Lucene's
    optional operators (``~`` complement, ``&`` intersection, ``<n-m>``
    numeric intervals) and backslash escapes are rejected at parse time —
    a pattern that silently meant different things to the engine and the
    SQL oracle would be worse than a loud error.  Patterns are lowercased
    like wildcards: the dictionary holds analyzer output (lowercase), so
    an uppercase literal could never match."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy(Node):
    """Fuzzy term query (``timeout~1``): dictionary terms within
    ``max_edits`` classic-Levenshtein edits of ``term``.  Expanded against
    the term dictionary before execution, exactly like ``Wildcard``
    (SCORING_BOOLEAN_REWRITE; FuzzyQuery under BooleanQuery rewrite)."""

    term: str
    max_edits: int
    boost: float = 1.0


@dataclass(frozen=True)
class FieldFilter(Node):
    """Keyword-field predicate: a non-scoring filter, the reference's DQL
    filter shapes (saved_objects searchSourceJSON ``filter[].meta``):

    - ``role:assistant`` — phrase filter (value: str);
    - ``role:(user OR assistant)`` — phrases / is-one-of filter (value:
      sorted tuple of str; 15 of these in the reference's saved objects,
      e.g. securityhub.ndjson Workflow.Status NEW|NOTIFIED);
    - ``tool:*`` — exists filter (value: None).

    Negation (``negate: true`` in the reference, 4 occurrences) is the
    enclosing Not node, legal as a top-level AND conjunct."""

    field: str
    value: str | tuple[str, ...] | None


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Not(Node):
    child: Node


@dataclass(frozen=True)
class AtLeast(Node):
    """``minimum_should_match``: matches when >= ``m`` of ``children``
    match; every matching child scores (Lucene bool should semantics).
    1 < m < len(children) always — ``apply_minimum_should_match``
    degenerates m=1 to Or and m=n to And."""

    m: int
    children: tuple[Node, ...]


def apply_minimum_should_match(ast: Node, m: int | None, query: str = "") -> Node:
    """OpenSearch's bool ``minimum_should_match`` parameter, applied to a
    top-level OR (the should-clause list): require >= m of its children.
    m=1 is the OR itself; m=n degenerates to AND (same match set AND the
    same score — this engine scores every positive-path leaf, so the
    rewrite is exact); anything else wraps in AtLeast."""
    if m is None or m <= 1:
        return ast
    if not isinstance(ast, Or):
        raise ValueError(
            f"minimum_should_match={m} requires a top-level OR query, got {query!r}"
        )
    if m > len(ast.children):
        raise ValueError(
            f"minimum_should_match={m} exceeds the {len(ast.children)} "
            f"should-clauses in {query!r}"
        )
    if m == len(ast.children):
        return And(ast.children)
    return AtLeast(m, ast.children)


#: keyword (non-analyzed) fields of the transcript schema; field atoms on
#: these compile to the filter machinery (role=/tool= in search_df)
KEYWORD_FIELDS = ("role", "tool")

#: Lucene BooleanQuery.maxClauseCount default: a wildcard expanding to more
#: terms than this raises rather than building an unbounded OR
MAX_CLAUSE_COUNT = 1024

_WILDCARD_CHARS = ("*", "?")
_WILDCARD_OK = re.compile(r"^[A-Za-z0-9_*?]+$")

#: regexp atom charset: the Python-re / RE2 / Lucene-RegExp common core
#: (see Regexp docstring).  No backslash (escape dialects differ), no
#: ``$``/anchors (matching is whole-term), none of Lucene's optional
#: operators (~ & < > " #).
_REGEXP_OK = re.compile(r"^[A-Za-z0-9_.*+?|(){}\[\]\-^,]+$")

#: Lucene LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE: ``term~N`` with
#: N above this raises, as FuzzyQuery's constructor does
MAX_FUZZY_EDITS = 2

_FUZZY_SUFFIX = re.compile(r"^(.*?)~(\d*)$")

#: trailing query-time boost on a word atom: term^2, err*^1.5, word~1^3
_BOOST_SUFFIX = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")
#: a standalone boost token following a quoted phrase / group: ^2
_BOOST_TOKEN = re.compile(r"^\^(\d+(?:\.\d+)?)$")
#: a slop token following a quoted phrase, optionally with a trailing
#: boost: "a b"~2  /  "a b"~2^3  (Lucene query-string proximity syntax)
_SLOP_TOKEN = re.compile(r"^~(\d+)(?:\^(\d+(?:\.\d+)?))?$")


def auto_fuzzy_edits(length: int) -> int:
    """The OpenSearch ``fuzziness: AUTO`` (AUTO:3,6) ladder used for a bare
    trailing ``~``: exact below 3 chars, 1 edit for 3-5, 2 for 6+."""
    if length < 3:
        return 0
    if length < 6:
        return 1
    return 2

#: time-range atom: ts>=2025-06-05T00:00:00 (ISO, 'T' or none; value is
#: normalized to the space form the filter machinery / SQL oracles use).
#: Only inclusive bounds — they compile to the ts_min/ts_max filters.
_TS_RANGE = re.compile(r"^ts(>=|<=|>|<)(\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2})?)$")


#: field:"quoted value" must tokenize as ONE atom (kuery quoted keyword
#: values / field-scoped phrases), so it precedes the bare-word branch;
#: /regexp/ (optionally ^boosted) precedes the paren branches because a
#: pattern may contain grouping parens
def _sqs_lex(text: str) -> list[tuple]:
    """Char-lexer for ``simple_query_string`` bodies (Lucene
    SimpleQueryParser's operator set): emits ``('op', c)`` for ``+ | ( )``
    anywhere and ``-`` at clause start, ``('phrase', body, slop)`` for
    quoted phrases with an optional ``~N`` slop suffix, ``('word', w)``
    otherwise.  Lenient like the parser it mirrors: an unclosed quote
    takes the rest of the text; a mid-word ``-`` stays part of the word
    (``foo-bar`` analyzes as text, it is not a negation)."""
    out: list[tuple] = []
    word: list[str] = []
    i, n = 0, len(text)

    def flush():
        if word:
            out.append(("word", "".join(word)))
            word.clear()

    while i < n:
        c = text[i]
        if c.isspace():
            flush()
            i += 1
        elif c in "+|()":
            flush()
            out.append(("op", c))
            i += 1
        elif c == "-" and not word:
            out.append(("op", "-"))
            i += 1
        elif c == '"' and not word:
            j = text.find('"', i + 1)
            if j < 0:
                body, i = text[i + 1 :], n
            else:
                body, i = text[i + 1 : j], j + 1
            m = re.match(r"~(\d+)", text[i:])
            slop = 0
            if m:
                slop = int(m.group(1))
                i += m.end()
            out.append(("phrase", body, slop))
        else:
            word.append(c)
            i += 1
    flush()
    return out


def _sqs_word_node(w: str, default_op: str) -> Node | None:
    """One SQS word -> a scoring node, or None if it analyzes away.
    Trailing ``*`` = prefix query; ``~``/``~N`` = fuzzy (bare ``~`` is
    SimpleQueryParser's default 2 edits; N lenient-clamps to the engine
    max).  A word that analyzes to several tokens (``foo-bar``) combines
    them with the default operator."""
    fuzz: int | None = None
    m = _FUZZY_SUFFIX.match(w)
    if m and m.group(1):
        w = m.group(1)
        fuzz = int(m.group(2)) if m.group(2) else MAX_FUZZY_EDITS
        fuzz = min(fuzz, MAX_FUZZY_EDITS)
    prefix = w.endswith("*")
    if prefix:
        w = w.rstrip("*")
    toks = tokenize(w)
    if not toks:
        return None
    if prefix and fuzz is None and len(toks) == 1 and _WILDCARD_OK.match(toks[-1] + "*"):
        return Wildcard(toks[-1] + "*")
    nodes = [Term(t) if not fuzz else Fuzzy(t, fuzz) for t in toks]
    if len(nodes) == 1:
        return nodes[0]
    return And(tuple(nodes)) if default_op == "and" else Or(tuple(nodes))


def _sqs_parse(text: str, default_op: str) -> Node | None:
    """Lenient left-to-right combine of the lexed clauses — Lucene
    SimpleQueryParser applies operators strictly left to right with no
    precedence (``a | b + c`` = ``(a OR b) AND c``).  ``-`` marks the
    NEXT clause as excluded: negated clauses join their group as
    ``AND NOT`` regardless of the pending operator (BooleanQuery
    MUST_NOT).  Invalid pieces degrade instead of raising: a dangling
    operator or empty group drops, a stray ``)`` is ignored."""
    toks = _sqs_lex(text)
    pos = 0

    def group(depth: int) -> Node | None:
        nonlocal pos
        result: Node | None = None
        nots: list[Node] = []
        pending: str | None = None
        neg = False

        def add(clause: Node | None):
            nonlocal result, pending, neg
            if clause is not None:
                if neg:
                    nots.append(clause)
                elif result is None:
                    result = clause
                else:
                    op = pending or default_op
                    result = And((result, clause)) if op == "and" else Or((result, clause))
            pending = None
            neg = False

        while pos < len(toks):
            t = toks[pos]
            if t == ("op", ")"):
                pos += 1
                if depth:
                    break
                continue  # stray ')' at top level: lenient skip
            if t == ("op", "("):
                pos += 1
                add(group(depth + 1))
                continue
            if t == ("op", "+"):
                pending = "and"
                pos += 1
                continue
            if t == ("op", "|"):
                pending = "or"
                pos += 1
                continue
            if t == ("op", "-"):
                neg = True
                pos += 1
                continue
            if t[0] == "phrase":
                ptoks = tokenize(t[1])
                node: Node | None
                if not ptoks:
                    node = None
                elif len(ptoks) == 1:
                    node = Term(ptoks[0])
                else:
                    node = Phrase(tuple(ptoks), slop=t[2])
                pos += 1
                add(node)
                continue
            pos += 1
            add(_sqs_word_node(t[1], default_op))
        if not nots:
            return result
        wrapped = tuple(Not(x) for x in nots)
        if result is None:
            # pure-negative group: keep the Nots — the engine's
            # positive-coverage check raises loudly at query time
            # (Lucene: a MUST_NOT-only boolean matches nothing)
            return wrapped[0] if len(wrapped) == 1 else And(wrapped)
        return And((result, *wrapped))

    return group(0)


_TOKEN_PAT = re.compile(
    r'(?:[^\s()"/]+:)?/[^/\s]+/(?:\^\d+(?:\.\d+)?)?'
    r'|\(|\)|[^\s()"]+:"[^"]*"|"[^"]*"|[^\s()]+'
)


def parse(query: str) -> Node:
    toks = _TOKEN_PAT.findall(query)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def take() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or() -> Node:
        left = parse_and()
        parts = [left]
        while peek() is not None and peek().upper() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def parse_and() -> Node:
        parts = [parse_unary()]
        while peek() is not None and peek().upper() == "AND":
            take()
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_unary() -> Node:
        t = peek()
        if t is None:
            raise ValueError(f"unexpected end of query: {query!r}")
        if t.upper() == "NOT":
            take()
            return Not(parse_unary())
        return parse_atom()

    def maybe_boost(node: Node) -> Node:
        """Consume a standalone ``^N`` token after a quoted phrase /
        field-scoped phrase (``"a b"^2``).  Boosting a parenthesized
        group is rejected — Lucene allows it, but the engine's boost
        model is per-clause (push the boost onto each atom instead)."""
        nxt = peek()
        if nxt is None:
            return node
        m = _BOOST_TOKEN.match(nxt)
        if not m:
            return node
        take()
        b = float(m.group(1))
        if b <= 0:
            raise ValueError(f"boost must be positive, got {nxt!r} in {query!r}")
        if isinstance(node, (Term, Phrase, PhrasePrefix, Wildcard, Fuzzy,
                             SpanNear, SpanFirst, SpanNot, SpanOr,
                             SpanMulti, SpanContaining, SpanWithin,
                             Intervals)):
            import dataclasses

            return dataclasses.replace(node, boost=node.boost * b)
        raise ValueError(
            f"boost {nxt!r} applies to terms and phrases only in {query!r} "
            "(boost each atom inside a group instead)"
        )

    def maybe_prefix(words: tuple[str, ...]) -> Node | None:
        """Consume a standalone ``*`` token after a quoted phrase —
        the match_phrase_prefix rendering ``"connection re"*``.  A slop
        token after the ``*`` is rejected (Lucene's match_phrase_prefix
        slop is out of scope here; the error beats a silent trailing-token
        failure)."""
        nxt = peek()
        if nxt is None:
            return None
        m = re.match(r"^\*(?:\^(\d+(?:\.\d+)?))?$", nxt)
        if not m:
            return None
        take()
        after = peek()
        if after is not None and _SLOP_TOKEN.match(after):
            raise ValueError(
                f"slop on a phrase prefix in {query!r}: "
                '"..."* supports exact adjacency only'
            )
        node = PhrasePrefix(tuple(words))
        if m.group(1):
            b = float(m.group(1))
            if b <= 0:
                raise ValueError(f"boost must be positive, got {nxt!r} in {query!r}")
            node = PhrasePrefix(tuple(words), boost=b)
        return node

    def maybe_slop(node: Node) -> Node:
        """Consume a ``~N`` (or ``~N^B``) token after a quoted phrase —
        Lucene's proximity syntax.  On a Phrase it sets the slop (with
        repeated-term rejection, see Phrase); on a Term (a single-word
        quoted phrase) it is Lucene's no-op."""
        nxt = peek()
        if nxt is None or not isinstance(node, (Phrase, Term)):
            return node
        m = _SLOP_TOKEN.match(nxt)
        if not m:
            return node
        take()
        slop = int(m.group(1))
        import dataclasses

        if isinstance(node, Phrase) and slop > 0:
            if len(set(node.terms)) != len(node.terms):
                raise ValueError(
                    f"sloppy phrase with repeated terms in {query!r}: "
                    "Lucene's repeating-term slop semantics (rptGroups) "
                    "are not implemented — rephrase with distinct terms"
                )
            node = dataclasses.replace(node, slop=slop)
        if m.group(2):
            b = float(m.group(2))
            if b <= 0:
                raise ValueError(f"boost must be positive, got {nxt!r} in {query!r}")
            node = dataclasses.replace(node, boost=node.boost * b)
        return node

    def parse_span_near() -> Node:
        """``span_near(slop=N in_order=true|false w1 w2 ...)`` — params
        may appear in any order before/between the words; defaults
        slop=0, in_order=false (the OpenSearch defaults)."""
        if peek() != "(":
            raise ValueError(f"span_near needs '(' in {query!r}")
        take()
        slop, in_order = 0, False
        words: list[str] = []
        while True:
            t2 = peek()
            if t2 is None:
                raise ValueError(f"missing ')' after span_near in {query!r}")
            if t2 == ")":
                take()
                break
            take()
            low = t2.lower()
            if low.startswith("slop="):
                try:
                    slop = int(low[5:])
                except ValueError:
                    raise ValueError(f"bad span_near slop {t2!r} in {query!r}") from None
                if slop < 0:
                    raise ValueError(f"span_near slop must be >= 0 in {query!r}")
            elif low.startswith("in_order="):
                v = low[9:]
                if v not in ("true", "false"):
                    raise ValueError(f"bad span_near in_order {t2!r} in {query!r}")
                in_order = v == "true"
            else:
                ws = tokenize(t2)
                if len(ws) != 1:
                    raise ValueError(
                        f"span_near clause {t2!r} must analyze to one term in {query!r}"
                    )
                words.append(ws[0])
        if len(words) < 2:
            raise ValueError(f"span_near needs at least 2 clauses in {query!r}")
        if len(set(words)) != len(words):
            raise ValueError(
                f"span_near with repeated terms is not supported in {query!r} "
                "(Lucene's overlapping same-term spans are out of scope)"
            )
        return maybe_boost(SpanNear(tuple(words), slop=slop, in_order=in_order))

    def scan_span_args(
        name: str,
        params: dict[str, int],
        sparams: dict[str, str] | None = None,
        bparams: dict[str, bool] | None = None,
    ) -> list[str]:
        """Shared ``name(key=val ... words ...)`` scanner for the span
        atoms: consumes through ')', updating ``params`` (int-valued),
        ``sparams`` (single-term string-valued, analyzer-normalized) and
        ``bparams`` (true/false) in place for recognized ``key=`` tokens;
        analyzer-normalized bare words returned in source order."""
        take()  # '('
        words: list[str] = []
        while True:
            t2 = peek()
            if t2 is None:
                raise ValueError(f"missing ')' after {name} in {query!r}")
            if t2 == ")":
                take()
                break
            take()
            low = t2.lower()
            key = next((k for k in params if low.startswith(k + "=")), None)
            if key is not None:
                try:
                    params[key] = int(low[len(key) + 1:])
                except ValueError:
                    raise ValueError(f"bad {name} {key} {t2!r} in {query!r}") from None
                continue
            if bparams is not None:
                key = next((k for k in bparams if low.startswith(k + "=")), None)
                if key is not None:
                    v = low[len(key) + 1:]
                    if v not in ("true", "false"):
                        raise ValueError(f"bad {name} {key} {t2!r} in {query!r}")
                    bparams[key] = v == "true"
                    continue
            if sparams is not None:
                key = next((k for k in sparams if low.startswith(k + "=")), None)
                if key is not None:
                    ws = tokenize(low[len(key) + 1:])
                    if len(ws) != 1:
                        raise ValueError(
                            f"{name} {key} {t2!r} must analyze to one term in {query!r}"
                        )
                    sparams[key] = ws[0]
                    continue
            ws = tokenize(t2)
            if len(ws) != 1:
                raise ValueError(
                    f"{name} clause {t2!r} must analyze to one term in {query!r}"
                )
            words.append(ws[0])
        return words

    def parse_span_first() -> Node:
        """``span_first(end=N term)`` — matches the term's positions
        ``p`` with ``p + 1 <= end``; end >= 1 required."""
        params = {"end": -1}
        words = scan_span_args("span_first", params)
        if params["end"] < 1:
            raise ValueError(f"span_first needs end=N with N >= 1 in {query!r}")
        if len(words) != 1:
            raise ValueError(f"span_first takes exactly one term in {query!r}")
        return maybe_boost(SpanFirst(words[0], end=params["end"]))

    def parse_span_not() -> Node:
        """``span_not(dist=N include exclude)`` — include positions with
        no exclude position within +/- dist (pre = post = dist, default
        0)."""
        params = {"dist": 0}
        words = scan_span_args("span_not", params)
        if not 0 <= params["dist"] <= _SPAN_NOT_MAX_DIST:
            raise ValueError(
                f"span_not dist must be in [0, {_SPAN_NOT_MAX_DIST}] in {query!r}"
            )
        if len(words) != 2:
            raise ValueError(
                f"span_not takes exactly include exclude in {query!r}"
            )
        if words[0] == words[1]:
            raise ValueError(
                f"span_not include == exclude matches nothing in {query!r}"
            )
        return maybe_boost(SpanNot(words[0], words[1], dist=params["dist"]))

    def parse_span_contain(name: str) -> Node:
        """``span_containing(slop=N in_order=bool little=term b1 b2 ...)``
        / ``span_within(...)`` — big clauses are the bare words; all of
        big + little must be distinct."""
        params = {"slop": 0}
        sparams = {"little": ""}
        bparams = {"in_order": False}
        words = scan_span_args(name, params, sparams, bparams)
        if params["slop"] < 0:
            raise ValueError(f"{name} slop must be >= 0 in {query!r}")
        if not sparams["little"]:
            raise ValueError(f"{name} needs little=term in {query!r}")
        if len(words) < 2:
            raise ValueError(f"{name} needs at least 2 big clauses in {query!r}")
        allt = words + [sparams["little"]]
        if len(set(allt)) != len(allt):
            raise ValueError(
                f"{name} with repeated terms is not supported in {query!r} "
                "(Lucene's overlapping same-term spans are out of scope)"
            )
        cls = SpanContaining if name == "span_containing" else SpanWithin
        return maybe_boost(
            cls(tuple(words), sparams["little"],
                slop=params["slop"], in_order=bparams["in_order"])
        )

    def parse_span_or() -> Node:
        """``span_or(t1 t2 ...)`` — union-of-spans single clause; terms
        sorted so the grouped-weight fold order is canonical (matches
        the SQL oracle's ORDER BY term)."""
        words = scan_span_args("span_or", {})
        if len(words) < 2:
            raise ValueError(f"span_or needs at least 2 terms in {query!r}")
        if len(set(words)) != len(words):
            raise ValueError(
                f"span_or with duplicate terms would double-count in {query!r}"
            )
        return maybe_boost(SpanOr(tuple(sorted(words))))

    def parse_intervals() -> Node:
        """``intervals(<expr>)`` — one nested interval-source expression:
        bare analyzed words, ``ordered(...)``/``unordered(...)`` with an
        optional ``max_gaps=N`` param anywhere among the args, ``any_of``
        (>= 2 sources), and the two-arg relational filters.  Repeated
        terms anywhere in the spec are rejected (span-family rule)."""
        take()  # '('

        def parse_expr():
            t2 = peek()
            if t2 is None:
                raise ValueError(f"missing ')' in intervals in {query!r}")
            if t2 == ")":
                raise ValueError(f"empty intervals source in {query!r}")
            take()
            low = t2.lower()
            if low in ("ordered", "unordered") and peek() == "(":
                take()
                children: list = []
                max_gaps = -1
                while True:
                    t3 = peek()
                    if t3 is None:
                        raise ValueError(f"missing ')' after {low} in {query!r}")
                    if t3 == ")":
                        take()
                        break
                    if t3.lower().startswith("max_gaps="):
                        take()
                        try:
                            max_gaps = int(t3[len("max_gaps="):])
                        except ValueError:
                            raise ValueError(
                                f"bad intervals max_gaps {t3!r} in {query!r}"
                            ) from None
                        if max_gaps < 0:
                            raise ValueError(
                                f"intervals max_gaps must be >= 0 in {query!r}"
                            )
                        continue
                    children.append(parse_expr())
                if len(children) < 2:
                    raise ValueError(
                        f"intervals {low} needs >= 2 sources in {query!r}"
                    )
                return ICombine(low, tuple(children), max_gaps)
            if low == "any_of" and peek() == "(":
                take()
                children = []
                while True:
                    t3 = peek()
                    if t3 is None:
                        raise ValueError(f"missing ')' after any_of in {query!r}")
                    if t3 == ")":
                        take()
                        break
                    children.append(parse_expr())
                if len(children) < 2:
                    raise ValueError(
                        f"intervals any_of needs >= 2 sources in {query!r}"
                    )
                return IAnyOf(tuple(children))
            if low in _IV_FILTER_KINDS and peek() == "(":
                take()
                src = parse_expr()
                ref = parse_expr()
                if peek() != ")":
                    raise ValueError(
                        f"intervals {low} takes exactly (source reference) in {query!r}"
                    )
                take()
                return IFilter(low, src, ref)
            ws = tokenize(t2)
            if len(ws) != 1:
                raise ValueError(
                    f"intervals source {t2!r} must analyze to one term in {query!r}"
                )
            return ITerm(ws[0])

        spec = parse_expr()
        if peek() != ")":
            raise ValueError(
                f"intervals takes exactly one source expression in {query!r}"
            )
        take()
        terms_all: list[str] = []

        def collect(s) -> None:
            if isinstance(s, ITerm):
                terms_all.append(s.term)
            elif isinstance(s, (ICombine, IAnyOf)):
                for c in s.children:
                    collect(c)
            else:
                collect(s.source)
                collect(s.reference)

        collect(spec)
        if len(set(terms_all)) != len(terms_all):
            raise ValueError(
                f"intervals with repeated terms is not supported in {query!r} "
                "(Lucene's same-term interval machinery is out of scope)"
            )
        return maybe_boost(Intervals(spec))

    def parse_span_multi() -> Node:
        """``span_multi(<multiterm atom>)`` — exactly one wildcard, fuzzy
        or regexp atom; an inner boost folds into the wrapper boost."""
        take()  # '('
        body = peek()
        if body is None or body == ")":
            raise ValueError(f"span_multi needs one multi-term atom in {query!r}")
        take()
        if peek() != ")":
            raise ValueError(f"missing ')' after span_multi in {query!r}")
        take()
        inner = (
            _regexp_atom(body, query) if body.startswith("/") else _word_atom(body, query)
        )
        if isinstance(inner, Term) and "~" in body:
            # term~0: FuzzyQuery(maxEdits=0) — a legal MultiTermQuery
            # whose span rewrite is the single SpanTermQuery == the Term
            return maybe_boost(inner)
        if not isinstance(inner, MULTITERM_ATOMS):
            raise ValueError(
                f"span_multi takes a multi-term atom (wildcard, fuzzy, "
                f"regexp), got {body!r} in {query!r} — "
                "SpanMultiTermQueryWrapper wraps a MultiTermQuery"
            )
        import dataclasses

        b = inner.boost
        return maybe_boost(
            SpanMulti(dataclasses.replace(inner, boost=1.0), boost=b)
        )

    def parse_match() -> Node:
        """``match(<free text>)`` — OpenSearch's ``match`` query: analyze
        ARBITRARY input at query time (the paste-a-log-line investigation
        flow; ``searchSourceJSON query.query`` free text) into a bool of
        term queries.  Params before the text, like the query DSL's:

            match(connection reset by peer)            # operator=or
            match(operator=and connection reset)       # all terms required
            match(fuzziness=AUTO conection resett)     # per-term AUTO ladder
            match(operator=and fuzziness=1 a b)

        Rewrites at parse time into the existing leaf machinery — Term
        atoms (or Fuzzy atoms under ``fuzziness``, dictionary-expanded
        like ``term~N``) under Or/And — so search, WAND, warm sessions,
        and the SQL oracle all apply unchanged.  Lucene keeps duplicate
        analyzed tokens as separate clauses (scores accumulate); so do
        we.  Tokens are run through the frozen analyzer, so punctuation
        in pasted input drops out; a query that analyzes to no terms is
        a loud error (ES: zero_terms_query=none would match nothing)."""
        take()  # '('
        op = "or"
        fuzz: int | str | None = None
        words: list[str] = []
        while True:
            t2 = peek()
            if t2 is None:
                raise ValueError(f"missing ')' after match in {query!r}")
            if t2 == ")":
                take()
                break
            if t2 == "(":
                raise ValueError(
                    f"'(' inside match(...) in {query!r}: the argument is "
                    "free text, not an expression"
                )
            t2 = take()
            low = t2.lower()
            if not words and low.startswith("operator="):
                v = low.split("=", 1)[1]
                if v not in ("and", "or"):
                    raise ValueError(
                        f"match operator must be and|or, got {t2!r} in {query!r}"
                    )
                op = v
                continue
            if not words and low.startswith("fuzziness="):
                v = low.split("=", 1)[1]
                if v == "auto":
                    fuzz = "auto"
                else:
                    try:
                        fuzz = int(v)
                    except ValueError:
                        raise ValueError(
                            f"match fuzziness must be AUTO|0|1|2, got {t2!r} "
                            f"in {query!r}"
                        ) from None
                    if not 0 <= fuzz <= MAX_FUZZY_EDITS:
                        raise ValueError(
                            f"match fuzziness must be AUTO|0|1|2, got {t2!r} "
                            f"in {query!r}"
                        )
                continue
            words.extend(tokenize(t2.strip('"')))
        if not words:
            raise ValueError(f"match() analyzed to no terms in {query!r}")

        def leaf(w: str) -> Node:
            if fuzz is None:
                return Term(w)
            e = auto_fuzzy_edits(len(w)) if fuzz == "auto" else fuzz
            return Term(w) if e == 0 else Fuzzy(w, e)

        leaves = tuple(leaf(w) for w in words)
        if len(leaves) == 1:
            return leaves[0]
        return And(leaves) if op == "and" else Or(leaves)

    def parse_simple_query_string() -> Node:
        """``simple_query_string(<text>)`` — the OpenSearch
        simple_query_string query (Lucene SimpleQueryParser): the
        END-USER search-box syntax that NEVER throws on malformed
        input.  ``+`` = AND, ``|`` = OR, ``-`` = NOT (clause prefix),
        ``"..."``[``~N``] = phrase with slop, trailing ``*`` = prefix,
        ``word~N`` = fuzzy, ``( )`` = grouping; adjacent clauses join
        with ``default_operator`` (param, ``or`` default).  Operators
        apply strictly left to right (no precedence).  Rewrites at
        parse time into the existing leaf algebra, so every engine
        path and the SQL oracle apply unchanged.  The only errors are
        the engine's own loud contracts: analyzing to no terms at all,
        or a pure-negative query (positive-coverage check).

            simple_query_string(connection reset | refused)
            simple_query_string(default_operator=and "connection reset"~2 -tool)
            simple_query_string(err* + (timeout | refused))
        """
        take()  # '('
        parts: list[str] = []
        depth = 0
        default_op = "or"
        first = True
        while True:
            t2 = peek()
            if t2 is None:
                break  # lenient: unclosed atom uses what it has
            take()
            if t2 == "(":
                depth += 1
            elif t2 == ")":
                if depth == 0:
                    break
                depth -= 1
            if first and t2.lower().startswith("default_operator="):
                v = t2.lower().split("=", 1)[1]
                if v in ("and", "or"):
                    default_op = v
                    first = False
                    continue
            first = False
            parts.append(t2)
        # the DQL tokenizer splits `"a b"~2` into two tokens; re-attach
        # the slop suffix the space-join would orphan
        body = re.sub(r'" ~(\d+)', r'"~\1', " ".join(parts))
        node = _sqs_parse(body, default_op)
        if node is None:
            raise ValueError(
                f"simple_query_string() analyzed to no terms in {query!r}"
            )
        return node

    def parse_atom() -> Node:
        t = take()
        if t.upper() in ("AND", "OR", "NOT"):
            # a bare operator would otherwise lowercase into a term —
            # surprising ('AND' silently searching for 'and'); reject
            raise ValueError(f"operator {t!r} where a term was expected in {query!r}")
        if t.lower() == "match" and peek() == "(":
            return parse_match()
        if t.lower() == "simple_query_string" and peek() == "(":
            return parse_simple_query_string()
        if t.lower() == "span_near" and peek() == "(":
            return parse_span_near()
        if t.lower() == "span_multi" and peek() == "(":
            return parse_span_multi()
        if t.lower() == "span_first" and peek() == "(":
            return parse_span_first()
        if t.lower() == "span_not" and peek() == "(":
            return parse_span_not()
        if t.lower() == "span_or" and peek() == "(":
            return parse_span_or()
        if t.lower() in ("span_containing", "span_within") and peek() == "(":
            return parse_span_contain(t.lower())
        if t.lower() == "intervals" and peek() == "(":
            return parse_intervals()
        if t == "(":
            node = parse_or()
            if peek() != ")":
                raise ValueError(f"missing ')' in {query!r}")
            take()
            return maybe_boost(node)
        if t.startswith("/"):
            return maybe_boost(_regexp_atom(t, query))
        if t.startswith('"'):
            words = tokenize(t.strip('"'))
            if not words:
                raise ValueError(f"empty phrase in {query!r}")
            pp = maybe_prefix(tuple(words))
            if pp is not None:
                return maybe_boost(pp)
            if len(words) == 1:
                return maybe_boost(maybe_slop(Term(words[0])))
            return maybe_boost(maybe_slop(Phrase(tuple(words))))
        m = _TS_RANGE.match(t)
        if m:
            op, val = m.group(1), m.group(2)
            if op in (">", "<"):
                raise ValueError(
                    f"strict bound {t!r} in {query!r}: time filters are "
                    "inclusive — use ts>= or ts<="
                )
            return FieldFilter("ts_min" if op == ">=" else "ts_max", val.replace("T", " "))
        if ":" in t and not t.startswith('"'):
            field, _, val = t.partition(":")
            field = field.lower()
            if val.startswith('"') and val.endswith('"') and len(val) >= 2:
                # quoted value: field:"security hub" — exact keyword match
                # on keyword fields (value NOT analyzed, spaces allowed);
                # a field-scoped phrase on the analyzed text field
                inner = val[1:-1]
                if field in KEYWORD_FIELDS:
                    if not inner:
                        raise ValueError(f"empty quoted value for field {field!r} in {query!r}")
                    return FieldFilter(field, inner)
                if field == "text":
                    words = tokenize(inner)
                    if not words:
                        raise ValueError(f"empty phrase for field 'text' in {query!r}")
                    pp = maybe_prefix(tuple(words))
                    if pp is not None:
                        return maybe_boost(pp)
                    return maybe_boost(maybe_slop(
                        Term(words[0]) if len(words) == 1 else Phrase(tuple(words))
                    ))
                raise ValueError(
                    f"unknown field {field!r} in {query!r} (fields: role, tool, text)"
                )
            if field in KEYWORD_FIELDS:
                if not val and peek() == "(":
                    # is-one-of filter: role:(user OR assistant) — the
                    # reference's 'phrases' filter / kuery value group
                    take()
                    vals: list[str] = []
                    while True:
                        v = peek()
                        if v is None:
                            raise ValueError(f"unterminated value group in {query!r}")
                        if v == ")":
                            take()
                            break
                        if v.upper() == "OR":
                            take()
                            continue
                        if v == "(" or v.upper() in ("AND", "NOT") or (
                            ":" in v and not v.startswith('"')
                        ):
                            raise ValueError(
                                f"only OR-separated keyword values are allowed in "
                                f"{field}:(...) groups, got {v!r} in {query!r}"
                            )
                        tok = take()
                        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
                            tok = tok[1:-1]  # quoted keyword value in a group
                            if not tok:
                                raise ValueError(f"empty quoted value in {query!r}")
                        vals.append(tok)
                    if not vals:
                        raise ValueError(f"empty value group for field {field!r} in {query!r}")
                    if len(vals) == 1:
                        return FieldFilter(field, vals[0])
                    return FieldFilter(field, tuple(sorted(set(vals))))
                if not val:
                    raise ValueError(f"empty value for field {field!r} in {query!r}")
                if val == "*":
                    return FieldFilter(field, None)  # exists
                if any(c in val for c in _WILDCARD_CHARS):
                    # keyword wildcards (role:assist*) are not evaluated;
                    # a literal-equality fallback would silently match
                    # nothing — fail loudly instead
                    raise ValueError(
                        f"wildcard in keyword filter {t!r} in {query!r}: only "
                        f"{field}:<literal> and {field}:* (exists) are supported"
                    )
                if _BOOST_SUFFIX.match(val):
                    # filters are non-scoring; a silent 'x^2' literal would
                    # surprise — quote the value if the caret is literal
                    raise ValueError(
                        f"boost on keyword filter {t!r} in {query!r}: filters "
                        f'do not score (use {field}:"{val}" for a literal caret)'
                    )
                return FieldFilter(field, val)  # keyword: NOT analyzed
            if field == "text":
                if not val and peek() == "(":
                    # text:(a OR b) — kuery value group on the analyzed
                    # field: sugar for the scoring OR of its words
                    take()
                    atoms: list[Node] = []
                    while True:
                        v = peek()
                        if v is None:
                            raise ValueError(f"unterminated value group in {query!r}")
                        if v == ")":
                            take()
                            break
                        if v.upper() == "OR":
                            take()
                            continue
                        if v in ("(",) or v.upper() in ("AND", "NOT") or ":" in v:
                            raise ValueError(
                                f"only OR-separated words are allowed in "
                                f"text:(...) groups, got {v!r} in {query!r}"
                            )
                        atoms.append(_word_atom(take(), query))
                    if not atoms:
                        raise ValueError(f"empty value group for field 'text' in {query!r}")
                    return atoms[0] if len(atoms) == 1 else Or(tuple(atoms))
                if not val:
                    raise ValueError(f"empty value for field 'text' in {query!r}")
                if val.startswith("/"):
                    return maybe_boost(_regexp_atom(val, query))
                return _word_atom(val, query)
            raise ValueError(
                f"unknown field {field!r} in {query!r} (fields: role, tool, text)"
            )
        return _word_atom(t, query)

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {query!r}")
    return node


def _regexp_atom(t: str, query: str) -> Node:
    """A ``/pattern/`` token (optionally ``/pattern/^N`` boosted) -> Regexp.
    The pattern is validated against the dialect-common charset and
    compiled once here so malformed patterns fail at parse time, not
    mid-executor."""
    body, boost = t, 1.0
    m = _BOOST_SUFFIX.match(t)
    if m and m.group(1).endswith("/"):
        body = m.group(1)
        boost = float(m.group(2))
        if boost <= 0:
            raise ValueError(f"boost must be positive in {t!r} in {query!r}")
    if not (body.startswith("/") and body.endswith("/") and len(body) >= 3):
        raise ValueError(f"bad regexp atom {t!r} in {query!r}: expected /pattern/")
    pat = body[1:-1]
    if not _REGEXP_OK.match(pat):
        raise ValueError(
            f"unsupported regexp {pat!r} in {query!r}: allowed syntax is "
            "literals, . * + ? {m,n} | (...) and [...] classes (no "
            "backslash escapes, no Lucene ~ & <> operators)"
        )
    pat = pat.lower()
    try:
        re.compile(f"^(?:{pat})$")
    except re.error as e:
        raise ValueError(f"bad regexp {pat!r} in {query!r}: {e}") from None
    return Regexp(pat, boost)


def _word_atom(t: str, query: str) -> Node:
    """A bare word: a Fuzzy if it carries a ``~`` suffix, a Wildcard if it
    carries * / ?, else a single analyzed term (the analyzer would strip
    wildcard/fuzzy markers, so check first — Lucene likewise does not
    analyze wildcard or fuzzy patterns).  A trailing ``^N`` boost applies
    to whichever atom the remainder parses to (``err*^2``, ``word~1^3``)."""
    if "^" in t:
        m = _BOOST_SUFFIX.match(t)
        if not m or "^" in m.group(1):
            raise ValueError(f"bad boost syntax in {t!r} in {query!r}: expected atom^number")
        b = float(m.group(2))
        if b <= 0:
            raise ValueError(f"boost must be positive in {t!r} in {query!r}")
        import dataclasses

        return dataclasses.replace(_word_atom(m.group(1), query), boost=b)
    if "~" in t:
        m = _FUZZY_SUFFIX.match(t)
        if not m or "~" in m.group(1) or not m.group(1):
            raise ValueError(f"bad fuzzy atom {t!r} in {query!r}: expected term~[0-2]")
        body, digits = m.group(1), m.group(2)
        if any(c in body for c in _WILDCARD_CHARS):
            raise ValueError(
                f"fuzzy and wildcard cannot combine in {t!r} in {query!r}"
            )
        analyzed = tokenize(body)
        if len(analyzed) != 1:
            raise ValueError(f"bad fuzzy term {body!r} in {query!r}")
        term = analyzed[0]
        edits = int(digits) if digits else auto_fuzzy_edits(len(term))
        if edits > MAX_FUZZY_EDITS:
            raise ValueError(
                f"fuzzy distance {edits} in {t!r} exceeds the supported "
                f"maximum {MAX_FUZZY_EDITS} (Lucene "
                "LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE)"
            )
        if edits == 0:
            return Term(term)  # FuzzyQuery(maxEdits=0) degenerates to TermQuery
        return Fuzzy(term, edits)
    if any(c in t for c in _WILDCARD_CHARS):
        if not _WILDCARD_OK.match(t):
            raise ValueError(f"bad wildcard pattern {t!r} in {query!r}")
        if not t.strip("*?"):
            raise ValueError(f"pattern {t!r} has no literal characters in {query!r}")
        return Wildcard(t.lower())
    analyzed = tokenize(t)
    if len(analyzed) != 1:
        raise ValueError(f"bad term {t!r} in {query!r}")
    return Term(analyzed[0])


def extract_filters(ast: Node, query: str = "") -> tuple[Node, dict]:
    """Split DQL keyword-field atoms out of the tree into a filter dict.

    FieldFilter atoms — positive (``role:x``, ``role:(x OR y)``,
    ``role:*``) or negated (``NOT role:x``, ``NOT role:(x OR y)``,
    ``NOT tool:*``; the reference's ``negate: true`` filters) — are legal
    ONLY as direct conjuncts of the top-level AND (or as the whole
    query): that is exactly the shape the reference's saved searches use
    (a filter array ANDed with the scored query).  Anywhere else — under
    OR, doubly negated, nested — the filter semantics would not be
    expressible as a docs-side predicate, so we reject loudly.

    Returns (core_ast, filters); filter keys per field: ``role`` (str
    equality or is-one-of tuple), ``role_not`` (excluded-values tuple,
    Lucene must_not semantics — a missing field passes), ``role_exists``,
    ``role_not_exists`` (must be missing), same for tool, plus
    ts_min/ts_max.  Raises on conflicting equality filters and on
    pure-filter queries (no scoring leaf — those need a full docs scan,
    not an index read)."""
    filters: dict = {}

    def add(ff: FieldFilter) -> None:
        if ff.value is None:
            filters[f"{ff.field}_exists"] = True
            return
        key = ff.field
        if key in filters and filters[key] != ff.value:
            raise ValueError(
                f"conflicting filters {key}:{filters[key]} vs {key}:{ff.value} in {query!r}"
            )
        filters[key] = ff.value

    def add_negated(ff: FieldFilter) -> None:
        if ff.value is None:
            filters[f"{ff.field}_not_exists"] = True
            return
        key = f"{ff.field}_not"
        vals = (ff.value,) if isinstance(ff.value, str) else ff.value
        filters[key] = tuple(sorted(set(filters.get(key, ())) | set(vals)))

    def check_no_filters(n: Node) -> None:
        if isinstance(n, FieldFilter):
            raise ValueError(
                f"field filter {n.field}:{n.value if n.value is not None else '*'} "
                f"must be a top-level AND conjunct in {query!r}"
            )
        if isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                check_no_filters(c)
        elif isinstance(n, Not):
            check_no_filters(n.child)

    if isinstance(ast, FieldFilter):
        add(ast)
        core = None
    elif isinstance(ast, Not) and isinstance(ast.child, FieldFilter):
        add_negated(ast.child)
        core = None
    elif isinstance(ast, And):
        rest = []
        for c in ast.children:
            if isinstance(c, FieldFilter):
                add(c)
            elif isinstance(c, Not) and isinstance(c.child, FieldFilter):
                add_negated(c.child)
            else:
                check_no_filters(c)
                rest.append(c)
        core = rest[0] if len(rest) == 1 else (And(tuple(rest)) if rest else None)
    else:
        check_no_filters(ast)
        core = ast
    if core is None:
        raise ValueError(
            f"pure filter query {query!r} has no scoring clause; "
            "filter-only matching needs a docs scan, not an index search"
        )
    return core, filters


def merge_filters(query: str, kwargs: dict, dql: dict) -> dict:
    """Merge explicit filter kwargs with DQL-extracted filters.  Equal
    values merge (ts bounds compare as instants, so a pd.Timestamp kwarg
    equals its normalized DQL string; is-one-of tuples compare as sets);
    different values conflict.  ``*_not`` exclusion tuples union (both
    exclusions apply); ``*_exists``/``*_not_exists`` booleans OR."""
    def same(a, b, key: str) -> bool:
        if a == b:
            return True
        if isinstance(a, (tuple, list)) and isinstance(b, (tuple, list)):
            return set(a) == set(b)
        if key in ("ts_min", "ts_max"):
            try:
                import pandas as _pd

                return _pd.Timestamp(a) == _pd.Timestamp(b)
            except (ValueError, TypeError):
                return False
        return False

    out = dict(kwargs)
    for k, v in dql.items():
        if k.endswith("_exists"):
            out[k] = bool(out.get(k)) or v
        elif k.endswith("_not"):
            out[k] = tuple(sorted(set(out.get(k) or ()) | set(v)))
        elif out.get(k) is None:
            out[k] = v
        elif not same(out[k], v, k):
            raise ValueError(f"query {query!r} filter {k}:{v} conflicts with {k}={out[k]!r} kwarg")
    return out


def filter_mask(role, tool, ts, filt: dict):
    """Boolean numpy mask applying the keyword/time filter dict to
    parallel role/tool/ts columns (numpy arrays or pandas Series) — the
    ONE implementation of filter semantics every local evaluator
    (LocalIndex, LuceneOracle, QuerySession masks, prune seeding,
    shard-local ranged fetch) shares, so negation/null behavior cannot
    drift between engines.

    Semantics (Lucene filter/must_not): positive value filters (str or
    is-one-of tuple) require the field present AND matching; ``*_not``
    excludes the listed values but a MISSING field passes (must_not of a
    term query matches docs without the field); ``*_exists`` requires
    present, ``*_not_exists`` requires missing; ts bounds are inclusive."""
    import numpy as np
    import pandas as pd

    role = pd.Series(role).reset_index(drop=True)
    tool = pd.Series(tool).reset_index(drop=True)
    m = np.ones(len(role), dtype=bool)
    for fld, col in (("role", role), ("tool", tool)):
        v = filt.get(fld)
        if v is not None:
            if isinstance(v, (tuple, list)):
                m &= col.isin(list(v)).to_numpy()
            else:
                m &= (col == v).to_numpy()
        nv = filt.get(f"{fld}_not")
        if nv:
            m &= (col.isna() | ~col.isin(list(nv))).to_numpy()
        if filt.get(f"{fld}_exists"):
            m &= col.notna().to_numpy()
        if filt.get(f"{fld}_not_exists"):
            m &= col.isna().to_numpy()
    if filt.get("ts_min") is not None or filt.get("ts_max") is not None:
        ts = pd.Series(ts).reset_index(drop=True)
        if filt.get("ts_min") is not None:
            m &= (ts >= pd.Timestamp(filt["ts_min"])).to_numpy()
        if filt.get("ts_max") is not None:
            m &= (ts <= pd.Timestamp(filt["ts_max"])).to_numpy()
    return m


#: every key filter_mask understands — memo keys and "filters active?"
#: checks iterate this, so adding a filter type cannot silently miss one
FILTER_KEYS = (
    "role", "tool", "role_not", "tool_not",
    "role_exists", "tool_exists", "role_not_exists", "tool_not_exists",
    "ts_min", "ts_max",
)


def filters_active(filt: dict) -> bool:
    """True if any filter constrains the query.  Value filters gate on
    ``is not None`` — role="" is a legitimate equality filter (r4 review
    fix) — while exclusion tuples / exists flags gate on truthiness
    (an empty exclusion list constrains nothing)."""
    if any(filt.get(k) is not None for k in ("role", "tool", "ts_min", "ts_max")):
        return True
    return any(
        filt.get(k)
        for k in ("role_not", "tool_not", "role_exists", "tool_exists",
                  "role_not_exists", "tool_not_exists")
    )


def wildcard_to_like(pattern: str) -> tuple[str, str]:
    """(SQL LIKE pattern with ESCAPE '\\', literal prefix).  Tokens may
    contain ``_`` (the analyzer keeps it), so literal underscores are
    escaped; ``*`` -> ``%``, ``?`` -> ``_``.  The literal prefix before
    the first wildcard enables dictionary range scans."""
    like = []
    prefix = []
    done_prefix = False
    for ch in pattern:
        if ch == "*":
            like.append("%")
            done_prefix = True
        elif ch == "?":
            like.append("_")
            done_prefix = True
        else:
            like.append("\\" + ch if ch in ("%", "_", "\\") else ch)
            if not done_prefix:
                prefix.append(ch)
    return "".join(like), "".join(prefix)


def wildcard_regex(pattern: str):
    """Anchored regex with the same match semantics as the LIKE form
    (driver-side expansion against small vocabularies)."""
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append("[a-z0-9_]*")
        elif ch == "?":
            parts.append("[a-z0-9_]")
        else:
            parts.append(re.escape(ch))
    return re.compile("^" + "".join(parts) + "$")


#: multi-term leaf types: rewritten against the term dictionary before
#: execution (Lucene MultiTermQuery subclasses)
MULTITERM = (Wildcard, Fuzzy, Regexp, PhrasePrefix)
#: the bare multi-term atoms span_multi may wrap (PhrasePrefix is quoted
#: syntax, never a bare word atom)
MULTITERM_ATOMS = (Wildcard, Fuzzy, Regexp)


def phrase_slots(leaf: Node) -> tuple[tuple[str, ...], ...]:
    """Per-slot term alternatives of a phrase-like leaf: a ``Phrase`` has
    singleton slots, a ``MultiPhrase`` its expansion slots.  The shared
    normalization every engine path uses so exact-adjacency/union logic
    is written once against slots."""
    if isinstance(leaf, (Phrase, SpanNear, SpanContaining, SpanWithin)):
        # for SpanContaining/SpanWithin the LAST slot is the little term
        return tuple((t,) for t in leaf.terms)
    if isinstance(leaf, SpanFirst):
        return ((leaf.term,),)
    if isinstance(leaf, SpanNot):
        # slot 1 (exclude) is fetched for position data but is NOT a
        # required slot — consumers special-case its absence
        return ((leaf.include,), (leaf.exclude,))
    if isinstance(leaf, (MultiPhrase, SpanOr)):
        return leaf.slots
    if isinstance(leaf, Intervals):
        # one slot per distinct spec term, first-appearance order; slots
        # outside required_slots are OPTIONAL (any_of branches, negated
        # filter references) — consumers substitute empty position lists
        return tuple((t,) for t in leaf.terms)
    raise TypeError(leaf)


def regexp_prefix(pattern: str) -> str:
    """Literal prefix of a regexp pattern (chars before the first
    metacharacter, excluding a literal that a following ``*``/``?``/
    ``{`` quantifier would make optional) — enables the same dictionary
    range scan wildcards get.  A pattern containing ``|`` gets no prefix:
    the alternation may apply at top level (``abc|xyz``), where a branch
    needs no common prefix."""
    if "|" in pattern:
        return ""
    out: list[str] = []
    for i, ch in enumerate(pattern):
        if not ("a" <= ch <= "z" or "0" <= ch <= "9" or ch == "_"):
            # ch is a metachar; a quantifier also makes the PREVIOUS
            # literal optional
            if ch in "*?{" and out:
                out.pop()
            return "".join(out)
        out.append(ch)
    return "".join(out)


def expand_multiterm(ast: Node, expander, max_clauses: int = MAX_CLAUSE_COUNT) -> Node:
    """Replace every multi-term leaf (Wildcard, Fuzzy) with the scoring OR
    of its dictionary matches (Lucene SCORING_BOOLEAN_REWRITE).
    ``expander(leaf)`` receives the leaf node and must return the matching
    index terms sorted ascending.  Zero matches become a Term that is
    guaranteed absent: for wildcards the raw pattern (``*``/``?`` can never
    appear in an analyzed token); for fuzzy the query term itself (the
    dictionary holds every corpus term, so an empty expansion proves the
    term has df 0) — matching nothing on every execution path.  More than
    ``max_clauses`` matches raises, like BooleanQuery.maxClauseCount."""
    if isinstance(ast, PhrasePrefix):
        # match_phrase_prefix: the expander returns the prefix's
        # dictionary matches sorted ascending; Lucene TRUNCATES at
        # max_expansions (no maxClauseCount error).  All-singleton
        # results collapse to the plain Phrase/Term (identical weight
        # and frequency semantics), zero expansions keep an empty last
        # slot — a MultiPhrase that matches nothing on every path.
        exp = tuple(expander(ast))[: ast.max_expansions]
        slots = tuple((t,) for t in ast.terms[:-1]) + (exp,)
        if all(len(s) == 1 for s in slots):
            if len(slots) == 1:
                return Term(slots[0][0], ast.boost)
            return Phrase(tuple(s[0] for s in slots), ast.boost)
        return MultiPhrase(slots, ast.boost)
    if isinstance(ast, SpanMulti):
        # span rewrite: SpanOr over the expansions, ONE grouped SimWeight
        # (vs the bare atom's per-term SCORING_BOOLEAN_REWRITE below)
        inner = ast.inner
        terms = list(expander(inner))
        label = (
            f"{inner.term}~{inner.max_edits}" if isinstance(inner, Fuzzy) else inner.pattern
        )
        if len(terms) > max_clauses:
            raise ValueError(
                f"too_many_clauses: span_multi({label!r}) expands to "
                f"{len(terms)} terms (cap {max_clauses})"
            )
        if not terms:
            # guaranteed-absent sentinel, same reasoning as the bare atoms
            return Term(inner.term if isinstance(inner, Fuzzy) else inner.pattern, ast.boost)
        if len(terms) == 1:
            return Term(terms[0], ast.boost)
        return SpanOr(tuple(sorted(terms)), ast.boost)
    if isinstance(ast, MULTITERM):
        terms = list(expander(ast))
        label = f"{ast.term}~{ast.max_edits}" if isinstance(ast, Fuzzy) else ast.pattern
        if len(terms) > max_clauses:
            raise ValueError(
                f"too_many_clauses: {label!r} expands to "
                f"{len(terms)} terms (cap {max_clauses})"
            )
        b = ast.boost  # the multi-term query's boost scales every expansion
        if not terms:
            # guaranteed-absent sentinel: for Wildcard the raw pattern
            # (``*``/``?`` can't appear in an analyzed token); for Fuzzy
            # the query term (dict holds every corpus term, so empty
            # expansion proves df 0); for Regexp the raw pattern (either
            # it contains a metachar no token can hold, or it is a pure
            # literal whose empty expansion proves it absent)
            return Term(ast.term if isinstance(ast, Fuzzy) else ast.pattern, b)
        if len(terms) == 1:
            return Term(terms[0], b)
        return Or(tuple(Term(t, b) for t in terms))
    if isinstance(ast, And):
        return And(tuple(expand_multiterm(c, expander, max_clauses) for c in ast.children))
    if isinstance(ast, Or):
        return Or(tuple(expand_multiterm(c, expander, max_clauses) for c in ast.children))
    if isinstance(ast, AtLeast):
        return AtLeast(ast.m, tuple(expand_multiterm(c, expander, max_clauses) for c in ast.children))
    if isinstance(ast, Not):
        return Not(expand_multiterm(ast.child, expander, max_clauses))
    return ast


def levenshtein_within(a: str, b: str, max_edits: int) -> bool:
    """Banded classic-Levenshtein predicate (no transpositions), early-exit
    when the band minimum exceeds ``max_edits`` — the driver-side analogue
    of the SQL ``levenshtein(a, b) <= e`` predicate the distributed
    expansion and the DuckDB oracle use."""
    if abs(len(a) - len(b)) > max_edits:
        return False
    if a == b:
        return True
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        lo = len(b) + 1
        for j, cb in enumerate(b, start=1):
            c = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(c)
            lo = min(lo, c)
        if lo > max_edits:
            return False
        prev = cur
    return prev[-1] <= max_edits


def query_terms(node: Node) -> list[str]:
    """All distinct terms referenced by a query, in first-appearance order."""
    out: list[str] = []

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            if n.term not in out:
                out.append(n.term)
        elif isinstance(n, (Phrase, SpanNear, SpanOr, SpanContaining,
                            SpanWithin, Intervals)):
            for t in n.terms:
                if t not in out:
                    out.append(t)
        elif isinstance(n, SpanFirst):
            if n.term not in out:
                out.append(n.term)
        elif isinstance(n, SpanNot):
            for t in (n.include, n.exclude):
                if t not in out:
                    out.append(t)
        elif isinstance(n, MultiPhrase):
            for s in n.slots:
                for t in s:
                    if t not in out:
                        out.append(t)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return out
