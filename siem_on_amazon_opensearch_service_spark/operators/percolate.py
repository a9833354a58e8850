"""Percolator: reverse search — match INCOMING documents against a set of
saved queries (the OpenSearch percolate query; operationally, the SIEM
alerting shape: every saved investigation search evaluated against each
new batch of transcript turns, no index required).

Re-expression: each DQL query compiles ONCE to a pure Spark Column
predicate over the frozen-analyzer token array —
``array_contains`` for terms, boolean algebra for bool trees,
``exists``-over-positions chains for exact phrases and phrase prefixes,
``LIKE`` / ``levenshtein`` / ``rlike`` exists-scans for
wildcard/fuzzy/regexp (no dictionary: the doc's own tokens are the
candidate set — semantically identical to dictionary expansion because
a term matching the pattern matches it whether or not it is in a
dictionary), and keyword/ts predicates for DQL field filters.  The
whole evaluation is JVM whole-stage-codegen — no Python in the per-row
path — so percolating N queries over a batch is one projection pass.

Sloppy phrases percolate too (r4e): membership is the smallest-range
existential over offset-adjusted position lists — nested ``exists``
lambdas carrying the running min/max, equivalent to (sloppy_freq > 0)
of the index-side greedy sweep (property-tested; frequency itself is
not needed for membership).  minimum_should_match is honored via
``AtLeast``.

Scale shape: tokenize once per row (shared subexpression across
queries), each query a boolean column; the explode to (doc, query_name)
rows emits only matches.  Streaming-safe: the predicate columns work
unchanged under ``readStream`` micro-batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import analysis as _analysis
from ..plans.query import (
    And,
    AtLeast,
    FieldFilter,
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
    SpanMulti,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanWithin,
    Term,
    Wildcard,
    parse,
    wildcard_to_like,
)


def tokens_col(text: Column) -> Column:
    """Frozen-analyzer token array (truncate -> lowercase -> word runs) —
    the identical expression the SQL oracles' ``tok`` CTE uses."""
    from .search import _truncate_text_col

    return F.filter(
        F.split(
            F.lower(F.coalesce(_truncate_text_col(text), F.lit(""))),
            _analysis.SQL_SPLIT_RE,
        ),
        lambda x: x != "",
    )


def _positions(toks: Column, pred) -> Column:
    """0-based positions (as a long array) of tokens satisfying ``pred``."""
    idx = F.transform(toks, lambda x, i: F.when(pred(x), i).otherwise(F.lit(-1)))
    return F.filter(idx, lambda p: p >= 0)


def _slots_predicate(toks: Column, slot_preds: list) -> Column:
    """Exact-adjacency membership over per-slot token predicates:
    EXISTS p in positions(slot0) with p+i in positions(slot_i) for all i
    — the MultiPhrase/Phrase match condition without an index."""
    pos = [_positions(toks, sp) for sp in slot_preds]

    def chain(p):
        cond = F.lit(True)
        for i in range(1, len(pos)):
            cond = cond & F.array_contains(pos[i], p + i)
        return cond

    return F.exists(pos[0], chain)


def _sloppy_predicate(toks: Column, terms: list[str], slop: int) -> Column:
    """Sloppy-phrase MEMBERSHIP as a pure Column expression.

    Lucene's SloppyPhraseMatcher greedy sweep (functions/sloppy.py) is the
    classic smallest-range algorithm over the offset-adjusted position
    lists: a document has sloppy_freq > 0 iff SOME selection of one
    adjusted position per slot spans ``max - min <= slop``.  That
    existential is expressed directly as nested ``exists`` lambdas
    carrying the running min/max — equivalence to the index-side sweep is
    property-tested against sloppy_freq.  Cost is O(prod |position
    lists|) per doc, bounded by short transcript turns and query-sized k
    (the sweep itself is what the INDEX uses; percolation has no
    postings).  Terms are distinct by the parse-time repeated-term
    guard."""
    adjs = [
        F.transform(
            _positions(toks, (lambda t: (lambda x: x == F.lit(t)))(t)),
            (lambda i: (lambda p: p - i))(i),
        )
        for i, t in enumerate(terms)
    ]

    def rec(level: int, cur_min: Column, cur_max: Column) -> Column:
        if level == len(adjs):
            return (cur_max - cur_min) <= F.lit(slop)
        return F.exists(
            adjs[level],
            lambda p: rec(level + 1, F.least(cur_min, p), F.greatest(cur_max, p)),
        )

    return F.exists(adjs[0], lambda p: rec(1, p, p))


def _span_predicate(toks: Column, terms: list[str], slop: int,
                    in_order: bool) -> Column:
    """span_near MEMBERSHIP as a pure Column expression.

    Property-tested equivalence (tests/test_spans.py): span_freq > 0 iff
    SOME selection of one RAW position per clause satisfies the mode's
    window test — ordered: strictly increasing with total gap
    p_n - p_1 - (n-1) <= slop (the chain always finds one when it
    exists); unordered: range width (max - min + 1) - n <= slop (the
    smallest-range sweep visits the minimal window).  Nested exists
    lambdas, zero Python per row, same cost shape as the sloppy
    predicate."""
    poss = [
        _positions(toks, (lambda t: (lambda x: x == F.lit(t)))(t))
        for t in terms
    ]
    n = len(poss)
    if in_order:
        def rec(level: int, prev: Column, first: Column) -> Column:
            if level == n:
                return (prev - first - F.lit(n - 1)) <= F.lit(slop)
            return F.exists(
                poss[level],
                lambda p: (p > prev) & rec(level + 1, p, first),
            )

        return F.exists(poss[0], lambda p: rec(1, p, p))

    def recu(level: int, cur_min: Column, cur_max: Column) -> Column:
        if level == n:
            return (cur_max - cur_min + F.lit(1) - F.lit(n)) <= F.lit(slop)
        return F.exists(
            poss[level],
            lambda p: recu(level + 1, F.least(cur_min, p), F.greatest(cur_max, p)),
        )

    return F.exists(poss[0], lambda p: recu(1, p, p))


def _escape_like(term_like: str) -> Column:
    return F.lit(term_like)


def compile_predicate(query: str, index_dir: str | None = None) -> "callable":
    """Compile a DQL query to ``f(toks, role, tool, ts) -> Column``
    (boolean).

    ``index_dir`` resolves the ONE leaf whose semantics depend on a term
    dictionary: match_phrase_prefix TRUNCATES its expansion to the first
    max_expansions dictionary terms, so index-free percolation (which
    matches the prefix directly) can match MORE docs when the prefix
    region exceeds the cap — the same caveat the ES percolator documents
    for multi-term queries against different term sources.  With an
    ``index_dir`` the prefix expands through the index's own dictionary
    scan and percolation is match-set-identical to the index for every
    query shape (random-tree tested).  Wildcard/fuzzy/regexp need no
    dictionary: their index path never truncates (it raises at
    maxClauseCount), so direct token matching is already exact."""
    ast = parse(query)

    def _no_contain(n: Node) -> None:
        if isinstance(n, (SpanContaining, SpanWithin)):
            # see the walk-branch comment: the any-selection containment
            # existential over-matches the index's span-iterator
            # candidates in BOTH modes (property-tested divergence)
            raise NotImplementedError(
                "span_containing/span_within percolation would diverge "
                "from the index's span-iterator candidates; evaluate "
                "through an index (search_df/match_docids_df)"
            )
        if isinstance(n, Intervals):
            # minimal-interval semantics: filters and max_gaps apply to
            # the MINIMALIZED interval set, which a selection
            # existential cannot reproduce (the span_containing lesson,
            # one algebra over) — refuse rather than silently diverge
            raise NotImplementedError(
                "intervals percolation is not supported: filters/"
                "max_gaps act on the minimal-interval antichain; "
                "evaluate through an index (search_df/match_docids_df)"
            )
        if isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                _no_contain(c)
        elif isinstance(n, Not):
            _no_contain(n.child)

    _no_contain(ast)

    def field_cond(ff: FieldFilter, role, tool, ts) -> Column:
        if ff.field in ("ts_min", "ts_max"):
            return (ts >= F.lit(ff.value)) if ff.field == "ts_min" else (ts <= F.lit(ff.value))
        col = {"role": role, "tool": tool}[ff.field]
        if ff.value is None:
            return col.isNotNull()
        if isinstance(ff.value, tuple):
            return col.isin(list(ff.value))
        return col == ff.value

    def walk(n: Node, toks, role, tool, ts) -> Column:
        if isinstance(n, Term):
            return F.array_contains(toks, n.term)
        if isinstance(n, Phrase):
            if n.slop > 0:
                return _sloppy_predicate(toks, list(n.terms), n.slop)
            return _slots_predicate(
                toks, [(lambda t: (lambda x: x == F.lit(t)))(t) for t in n.terms]
            )
        if isinstance(n, SpanNear):
            return _span_predicate(toks, list(n.terms), n.slop, n.in_order)
        if isinstance(n, Intervals):
            raise NotImplementedError(
                "intervals percolation is not supported: filters/"
                "max_gaps act on the minimal-interval antichain; "
                "evaluate through an index (search_df/match_docids_df)"
            )
        if isinstance(n, (SpanContaining, SpanWithin)):
            # NOT index-free-percolatable: the index side consumes the
            # span ITERATOR's emitted candidates (ordered chain /
            # smallest-range sweep), and an any-selection containment
            # existential provably over-matches BOTH modes (random-
            # layout property test found divergences in each) — unlike
            # span_near, where membership == the selection existential.
            raise NotImplementedError(
                "span_containing/span_within percolation would diverge "
                "from the index's span-iterator candidates; evaluate "
                "through an index (search_df/match_docids_df)"
            )
        if isinstance(n, SpanFirst):
            # membership: any position of the term before ``end``
            ps = _positions(toks, lambda x: x == F.lit(n.term))
            return F.exists(ps, lambda p: p < F.lit(n.end))
        if isinstance(n, SpanNot):
            # membership: some include position with no exclude position
            # within +/- dist (exclude absent entirely -> plain presence)
            pi = _positions(toks, lambda x: x == F.lit(n.include))
            pe = _positions(toks, lambda x: x == F.lit(n.exclude))
            return F.exists(
                pi,
                lambda p: ~F.exists(
                    pe, lambda q: F.abs(q - p) <= F.lit(n.dist)
                ),
            )
        if isinstance(n, SpanOr):
            # membership: any of the terms present
            out = F.lit(False)
            for t in n.terms:
                out = out | F.array_contains(toks, t)
            return out
        if isinstance(n, PhrasePrefix):
            if index_dir is not None:
                from .search import _expand_leaf

                exp = _expand_leaf(index_dir, n)
                if not exp:
                    return F.lit(False)
                alt = F.array(*[F.lit(t) for t in exp])
                last = lambda x: F.array_contains(alt, x)  # noqa: E731
            else:
                last = (lambda p: (lambda x: x.startswith(p)))(n.terms[-1])
            preds = [
                (lambda t: (lambda x: x == F.lit(t)))(t) for t in n.terms[:-1]
            ] + [last]
            return _slots_predicate(toks, preds)
        if isinstance(n, MultiPhrase):  # pragma: no cover — parse never emits
            raise TypeError("MultiPhrase is a post-expansion node")
        if isinstance(n, SpanMulti):
            # membership of the span rewrite == membership of the inner
            # multi-term atom: the SpanOr of the expansions matches a doc
            # iff ANY expanded term is present, which is exactly the
            # inner wildcard/fuzzy/regexp existential below
            return walk(n.inner, toks, role, tool, ts)
        if isinstance(n, Wildcard):
            like, _ = wildcard_to_like(n.pattern)
            return F.exists(
                toks, lambda x: F.like(x, F.lit(like), F.lit("\\"))
            )
        if isinstance(n, Fuzzy):
            e = n.max_edits
            t = F.lit(n.term)
            return F.exists(
                toks,
                lambda x: (F.abs(F.length(x) - F.length(t)) <= e)
                & (F.levenshtein(x, t) <= e),
            )
        if isinstance(n, Regexp):
            return F.exists(toks, lambda x: x.rlike(f"^(?:{n.pattern})$"))
        if isinstance(n, FieldFilter):
            return field_cond(n, role, tool, ts)
        if isinstance(n, And):
            out = F.lit(True)
            for c in n.children:
                out = out & walk(c, toks, role, tool, ts)
            return out
        if isinstance(n, Or):
            out = F.lit(False)
            for c in n.children:
                out = out | walk(c, toks, role, tool, ts)
            return out
        if isinstance(n, AtLeast):
            total = F.lit(0)
            for c in n.children:
                total = total + walk(c, toks, role, tool, ts).cast("int")
            return total >= n.m
        if isinstance(n, Not):
            # percolation is per-document membership; NOT is plain
            # negation (no coverage constraint — there is no index)
            return ~walk(n.child, toks, role, tool, ts)
        raise TypeError(n)

    return lambda toks, role, tool, ts: walk(ast, toks, role, tool, ts)


def filter_fields(query: str) -> set:
    """The metadata columns a DQL query's predicates actually touch —
    {'role','tool','ts'} subset.  Used to prune the percolation scan's
    input columns: the Arrow tokenize pass is a column-pruning barrier
    (the Python runner consumes whole rows), so untouched columns must be
    dropped BEFORE it — both for IO and because a source may carry
    degenerate columns (an all-null field inferred as void) that the
    parquet reader cannot even materialize."""
    out: set = set()

    def walk(x) -> None:
        if isinstance(x, FieldFilter):
            out.add("ts" if x.field.startswith("ts_") else x.field)
        for c in getattr(x, "children", ()) or ():
            walk(c)
        ch = getattr(x, "child", None)
        if ch is not None:
            walk(ch)

    walk(parse(query))
    return out


def with_tokens(
    df: DataFrame, text_col: str = "text", impl: str = "arrow",
    out_col: str = "__toks",
) -> DataFrame:
    """df + an ``out_col`` array<string> column of frozen-analyzer
    tokens, materialized ONCE.

    ``impl='column'`` is the JVM rendering (``tokens_col`` — the
    oracle-shaped reference).  ``'arrow'`` (default) computes the same
    lists in one Arrow pass (``segments.tokenize_series``, row-identical
    by the build's own parity tests): JVM ``split`` mints one
    java.lang.String per token and saturates memory bandwidth at a
    single core on DRAM-starved hosts (BENCH/scaling_r4g.md), and a
    Column toks referenced by N sibling predicate projections is
    re-evaluated N times (projection collapse) — the materialized
    column pays the tokenize exactly once for any number of
    consumers."""
    if impl == "column":
        return df.withColumn(out_col, tokens_col(F.col(text_col)))
    if impl != "arrow":
        raise ValueError(f"with_tokens impl must be arrow|column, got {impl!r}")
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    from . import segments

    cols = [f.name for f in df.schema.fields]
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )

    def gen(batches):
        for pdf in batches:
            pdf = pdf.assign(**{out_col: segments.tokenize_series(pdf[text_col])})
            yield pdf[cols + [out_col]]

    return df.mapInPandas(gen, schema)


def percolate_df(
    df: DataFrame,
    queries: dict[str, str],
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    index_dir: str | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Match every row of a transcript-shaped DataFrame against every
    saved query: returns (id_cols..., query_name) rows, one per
    (document, matching query), ordered for stable comparison.  Works
    identically on a streaming DataFrame (drop the orderBy downstream).
    Tokens come from ONE ``with_tokens`` pass (default arrow), so N
    saved queries share a single tokenize instead of collapsing into N."""
    if not queries:
        raise ValueError("percolate: no queries")
    fields: set = set()
    for q in queries.values():
        fields |= filter_fields(q)
    keep = list(dict.fromkeys(
        list(id_cols)
        + [f for f in ("role", "tool", "ts") if f in fields]
        + [text_col]
    ))
    toked = with_tokens(df.select(*keep), text_col, impl=impl)
    toks = F.col("__toks")
    role, tool, ts = F.col("role"), F.col("tool"), F.col("ts")
    flags = [
        compile_predicate(q, index_dir)(toks, role, tool, ts).alias(name)
        for name, q in sorted(queries.items())
    ]
    wide = toked.select(*id_cols, *flags)
    names = sorted(queries)
    pairs = F.array(
        *[
            F.when(F.col(n), F.lit(n)).otherwise(F.lit(None))
            for n in names
        ]
    )
    out = wide.select(
        *id_cols,
        F.explode(F.filter(pairs, lambda x: x.isNotNull())).alias("query_name"),
    )
    return out


def percolate_sql(path: str, queries: dict[str, str]) -> str:
    """DuckDB statement mirroring ``percolate_df`` over the raw corpus
    parquet: one match-set subquery per saved query (each with its own
    CTE scope), UNION ALL'd with the query name attached."""
    from . import sqloracle as _sq
    from ..plans.query import extract_filters

    parts = []
    for name in sorted(queries):
        q = queries[name]
        ast, dqlf = extract_filters(parse(q), q)
        leaves: list[Node] = []

        def collect(n: Node) -> None:
            if isinstance(n, _sq.LEAVES):
                if n not in leaves:
                    leaves.append(n)
            elif isinstance(n, (And, Or, AtLeast)):
                for c in n.children:
                    collect(c)
            elif isinstance(n, Not):
                collect(n.child)

        collect(ast)
        fsql = _sq._filters_sql(dqlf)
        where = f"{fsql.replace(' WHERE ', ' WHERE (')})" if fsql else ""
        parts.append(
            f"SELECT conv_id, turn_idx, '{name}' AS query_name FROM (\n"
            f"WITH RECURSIVE {_sq._base_ctes(path)},\n"
            f"{_sq._leaf_ctes(leaves)},\n"
            f"combined AS ({_sq._combine_sql(ast, leaves)})\n"
            f"SELECT d.conv_id, d.turn_idx FROM d JOIN combined USING (docid){where}\n"
            f")"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY conv_id, turn_idx, query_name"


def named_search_df(
    spark,
    index_dir: str,
    queries: dict[str, str],
    k: int = 10,
) -> DataFrame:
    """OpenSearch named queries (``_name`` on bool should-clauses +
    per-hit ``matched_queries``): score the OR of the named sub-queries,
    then annotate each of the top-k hits with the sorted names of the
    sub-queries it matches.

    Scoring is EXACTLY the boolean OR (same match set, scores, ranking
    as search_df on ``(q1) OR (q2) OR ...`` in sorted-name order).
    Membership annotation re-evaluates each named query as a percolator
    predicate over just the k hit documents (a broadcast join of k
    docids against the docs store + pure Column predicates — k-scale
    work, nothing corpus-sized moves).  ``index_dir`` is passed to the
    predicate compiler so dictionary-expansion leaves (prefix/wildcard/
    fuzzy) annotate with exact index parity.

    Returns (docid, score, matched_queries) where matched_queries is
    the comma-joined sorted name list (non-empty by construction: every
    hit matched at least one sub-query)."""
    from . import search as _search

    if not queries:
        raise ValueError("named_search_df: no queries")
    names = sorted(queries)
    overall = " OR ".join(f"({queries[n]})" for n in names)
    hits = _search.search_df(spark, index_dir, overall, k=k)
    docs = spark.read.parquet(index_dir + "/docs")
    top = docs.join(F.broadcast(hits), "docid")
    toks = tokens_col(F.col("text"))
    role, tool, ts = F.col("role"), F.col("tool"), F.col("ts")
    pairs = F.array(
        *[
            F.when(
                compile_predicate(queries[n], index_dir)(toks, role, tool, ts),
                F.lit(n),
            ).otherwise(F.lit(None))
            for n in names
        ]
    )
    return top.select(
        "docid",
        "score",
        F.array_join(F.filter(pairs, lambda x: x.isNotNull()), ",").alias(
            "matched_queries"
        ),
    ).orderBy(F.col("score").desc(), F.col("docid").asc())


def named_search_sql(path: str, queries: dict[str, str], k: int = 10) -> str:
    """DuckDB statement for named_search_df: bm25_sql of the OR for the
    top-k, plus one isolated match-set subquery per name (docid-keyed),
    string_agg'd per hit in name order."""
    from . import sqloracle as _sq
    from ..plans.query import extract_filters

    names = sorted(queries)
    overall = " OR ".join(f"({queries[n]})" for n in names)
    parts = []
    for name in names:
        if "'" in name:
            raise ValueError(f"query name {name!r} must not contain a quote")
        q = queries[name]
        ast, dqlf = extract_filters(parse(q), q)
        leaves: list[Node] = []

        def collect(n: Node) -> None:
            if isinstance(n, _sq.LEAVES):
                if n not in leaves:
                    leaves.append(n)
            elif isinstance(n, (And, Or, AtLeast)):
                for c in n.children:
                    collect(c)
            elif isinstance(n, Not):
                collect(n.child)

        collect(ast)
        fsql = _sq._filters_sql(dqlf)
        where = f"{fsql.replace(' WHERE ', ' WHERE (')})" if fsql else ""
        parts.append(
            f"SELECT docid, '{name}' AS query_name FROM (\n"
            f"WITH RECURSIVE {_sq._base_ctes(path)},\n"
            f"{_sq._leaf_ctes(leaves)},\n"
            f"combined AS ({_sq._combine_sql(ast, leaves)})\n"
            f"SELECT d.docid FROM d JOIN combined USING (docid){where}\n"
            f")"
        )
    matches = "\nUNION ALL\n".join(parts)
    return f"""WITH hits AS ({_sq.bm25_sql(path, overall, k=k)}),
nm AS ({matches})
SELECT h.docid, h.score_r,
       (SELECT string_agg(query_name, ',' ORDER BY query_name)
        FROM nm WHERE nm.docid = h.docid) AS matched_queries
FROM hits h
ORDER BY h.score_r DESC, h.docid ASC"""
