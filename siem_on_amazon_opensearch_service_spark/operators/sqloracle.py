"""DuckDB-SQL oracle generator for BM25 queries.

Renders the entire frozen scoring pipeline — stable docIDs, analyzer,
lossy norms, Lucene BM25, tie-break — as one ANSI-ish SQL statement DuckDB
can run directly against the transcript parquet.  This is the driver-facing
correctness oracle (``__spark_entry__.oracle_sql``); the same arithmetic is
unit-tested bit-exact against the engine in tests/.
"""

from __future__ import annotations

from ..functions.analysis import SQL_SPLIT_RE, sql_truncate_expr
from ..functions.bm25 import sql_idf_expr, sql_score_expr
from ..functions.sloppy import sloppy_sim_sql_2
from ..functions.smallfloat import sql_decode_case
from ..plans.query import (
    And,
    AtLeast,
    Fuzzy,
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
    apply_minimum_should_match,
    extract_filters,
    merge_filters,
    parse,
    wildcard_to_like,
)

#: scoring leaf node types (Wildcard/Fuzzy/Regexp render as grouped
#: term-set leaves)
LEAVES = (Term, Phrase, PhrasePrefix, Wildcard, Fuzzy, Regexp, SpanMulti,
          SpanNear, SpanFirst, SpanNot, SpanOr, SpanContaining, SpanWithin,
          Intervals)


def _mt_pred(leaf) -> str:
    """Dictionary-membership predicate of a bare multi-term atom over the
    ``tok`` CTE's ``term`` column — the SQL twin of the engine's
    dictionary expansion (identical arithmetic / dialect-common regex
    core, see each branch)."""
    if isinstance(leaf, Fuzzy):
        q = leaf.term.replace("'", "''")
        return (
            f"abs(length(term) - {len(leaf.term)}) <= {leaf.max_edits} "
            f"AND levenshtein(term, '{q}') <= {leaf.max_edits}"
        )
    if isinstance(leaf, Regexp):
        # DuckDB regexp_full_match is RE2; the grammar's charset
        # restriction keeps RE2 and the engine's Python re in the
        # dialect-common core, so the term sets agree exactly
        pq = leaf.pattern.replace("'", "''")
        return f"regexp_full_match(term, '{pq}')"
    like, _ = wildcard_to_like(leaf.pattern)
    like_sql = like.replace("'", "''")
    return f"term LIKE '{like_sql}' ESCAPE '\\'"


def _base_ctes(path: str, source_where: str | None = None) -> str:
    trunc = sql_truncate_expr("text")
    where = f"\n  WHERE {source_where}" if source_where else ""
    return f"""
raw AS (
  SELECT conv_id, turn_idx, role, tool, ts, {trunc} AS text
  FROM read_parquet('{path}'){where}
),
d AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS docid,
         conv_id, turn_idx, role, tool, ts, text
  FROM raw
),
tok0 AS (
  SELECT docid,
         list_filter(string_split_regex(lower(coalesce(text, '')), '{SQL_SPLIT_RE}'),
                     x -> x <> '') AS toks
  FROM d
),
dl AS (SELECT docid, len(toks) AS dl FROM tok0),
stats AS (
  SELECT count(*) FILTER (WHERE dl > 0) AS doc_count,
         CAST(sum(dl) AS DOUBLE) / count(*) FILTER (WHERE dl > 0) AS avgdl
  FROM dl
),
dln AS (SELECT docid, {sql_decode_case('dl')} AS dl_dec FROM dl),
tok AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY pre_pos) - 1 AS pos
  FROM (
    SELECT docid, unnest(toks) AS term, generate_subscripts(toks, 1) AS pre_pos
    FROM tok0
  )
)"""


def _q(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def _leaf_ctes(leaves: list[Node]) -> str:
    parts = []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, (Wildcard, Fuzzy, Regexp)):
            # multi-term leaf = the OR of its dictionary matches (engine:
            # expand_multiterm SCORING_BOOLEAN_REWRITE).  Rendered as a
            # grouped term-set: per-(doc, term) float32 scores with
            # PER-TERM idf weights, summed in float64 per doc.  s_i stays
            # DOUBLE — _combine_sql casts the overall total to float32
            # once, exactly like the engine's flat-Or aggregation.  The
            # fuzzy predicate is DuckDB's classic levenshtein — the exact
            # arithmetic the engine's dictionary expansion uses.
            pred = _mt_pred(leaf)
            score = sql_score_expr(
                "f.tf",
                "n.dl_dec",
                sql_idf_expr("w.df", "(SELECT doc_count FROM stats)"),
                "(SELECT avgdl FROM stats)",
            )
            parts.append(
                f"ptf_{i} AS (SELECT docid, term, count(*) AS tf FROM tok "
                f"WHERE {pred} GROUP BY docid, term)"
            )
            parts.append(
                f"pdf_{i} AS (SELECT term, count(*) AS df FROM ptf_{i} GROUP BY term)"
            )
            parts.append(
                f"tf_{i} AS (SELECT DISTINCT docid, 1 AS tf FROM ptf_{i})"
            )
            parts.append(
                f"s_{i} AS (SELECT f.docid, SUM(CAST({score} AS DOUBLE)) AS s "
                f"FROM ptf_{i} f JOIN pdf_{i} w USING (term) JOIN dln n USING (docid) "
                f"GROUP BY f.docid)"
            )
            continue
        if isinstance(leaf, PhrasePrefix):
            # match_phrase_prefix: expansion set = the prefix's corpus
            # terms, first max_expansions in term order (the engine's
            # dictionary scan uses the identical predicate + LIMIT);
            # frequency = adjacency count with the LAST slot matched by
            # set membership (one term per (doc, pos), so the join count
            # IS the union-of-positions MultiPhrase frequency); weight =
            # fixed-slot idfs as a textual left-associated sum plus an
            # ordered list_reduce fold over the expansion idfs — the
            # grouped association bm25.grouped_weight freezes.
            pfx = leaf.terms[-1]
            hi = pfx[:-1] + chr(ord(pfx[-1]) + 1)
            parts.append(
                f"exp_{i} AS (SELECT term FROM (SELECT DISTINCT term FROM tok "
                f"WHERE term >= {_q(pfx)} AND term < {_q(hi)}) "
                f"ORDER BY term LIMIT {int(leaf.max_expansions)})"
            )
            joins = "tok t0"
            if len(leaf.terms) == 1:
                conds = [f"t0.term IN (SELECT term FROM exp_{i})"]
            else:
                conds = [f"t0.term = {_q(leaf.terms[0])}"]
                for j, t in enumerate(leaf.terms[1:-1], start=1):
                    joins += f" JOIN tok t{j} ON t{j}.docid = t0.docid AND t{j}.pos = t0.pos + {j}"
                    conds.append(f"t{j}.term = {_q(t)}")
                j = len(leaf.terms) - 1
                joins += f" JOIN tok t{j} ON t{j}.docid = t0.docid AND t{j}.pos = t0.pos + {j}"
                conds.append(f"t{j}.term IN (SELECT term FROM exp_{i})")
            parts.append(
                f"tf_{i} AS (SELECT t0.docid, count(*) AS tf FROM {joins} "
                f"WHERE {' AND '.join(conds)} GROUP BY t0.docid)"
            )
            exp_sum = (
                f"(SELECT coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                f"list(v ORDER BY term)), (a, b) -> a + b), 0.0) FROM "
                f"(SELECT term, ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) "
                f"- df + 0.5) / (df + 0.5)) AS v FROM "
                f"(SELECT term, count(DISTINCT docid) AS df FROM tok "
                f"WHERE term IN (SELECT term FROM exp_{i}) GROUP BY term)))"
            )
            fixed = " + ".join(
                f"ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5))"
                for t in leaf.terms[:-1]
            )
            weight = f"CAST({fixed + ' + ' if fixed else ''}{exp_sum} AS FLOAT)"
            score = sql_score_expr("f.tf", "n.dl_dec", weight, "(SELECT avgdl FROM stats)")
            parts.append(
                f"s_{i} AS (SELECT f.docid, {score} AS s FROM tf_{i} f JOIN dln n USING (docid))"
            )
            continue
        if isinstance(leaf, SpanMulti):
            # span_multi: the span rewrite pools ALL matching terms'
            # occurrences under ONE grouped weight (engine: SpanOr of the
            # sorted expansions, bm25.grouped_weight single slot) — tf =
            # total occurrences of any matching term; weight = ordered
            # float64 fold of the matching terms' idfs in term order
            # (list_reduce over list(... ORDER BY term), matching the
            # parse-sorted SpanOr fold), cast float32 once.  Contrast the
            # bare-atom branch above, which keeps PER-TERM idfs.
            pred = _mt_pred(leaf.inner)
            parts.append(
                f"exp_{i} AS (SELECT DISTINCT term FROM tok WHERE {pred})"
            )
            parts.append(
                f"tf_{i} AS (SELECT docid, CAST(count(*) AS DOUBLE) AS tf "
                f"FROM tok WHERE term IN (SELECT term FROM exp_{i}) "
                f"GROUP BY docid)"
            )
            weight = (
                f"CAST((SELECT coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                f"list(v ORDER BY term)), (a, b) -> a + b), 0.0) FROM "
                f"(SELECT term, ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) "
                f"- df + 0.5) / (df + 0.5)) AS v FROM "
                f"(SELECT term, count(DISTINCT docid) AS df FROM tok "
                f"WHERE term IN (SELECT term FROM exp_{i}) GROUP BY term))) AS FLOAT)"
            )
        elif isinstance(leaf, Intervals):
            # intervals: definitional minimal-interval CTEs
            # (functions/intervals.py sql_intervals_freq — all-pairs
            # candidates + NOT EXISTS minimalization, result-not-
            # mechanics).  Renderable shapes: terms, any_of over terms,
            # 2-term ordered/unordered (+max_gaps), one filter over two
            # such; wider specs raise there and stay frozen-Python-
            # oracle territory like wide span_near.  Weight = summed idf
            # over ALL spec terms in first-appearance order (the
            # engine's bm25.clause_weight fold order).
            from ..functions.intervals import sql_intervals_freq

            parts.append(
                sql_intervals_freq(leaf.spec, f"ivf_{i}", f"iv{i}").strip()
            )
            parts.append(
                f"tf_{i} AS (SELECT docid, CAST(freq AS DOUBLE) AS tf "
                f"FROM ivf_{i} WHERE freq > 0)"
            )
            idf_sum = " + ".join(
                f"ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5))"
                for t in leaf.terms
            )
            weight = f"CAST({idf_sum} AS FLOAT)"
        elif isinstance(leaf, SpanNear):
            # span_near: 2-clause closed forms (functions/spans.py —
            # adjacent cross pairs / merge-path pairs); wider spans are
            # engine+frozen-oracle territory, refused loudly here like
            # wide sloppy phrases.
            if len(leaf.terms) != 2:
                raise NotImplementedError(
                    "SQL oracle renders span_near of exactly 2 clauses; "
                    "wider ones are covered by the frozen Python oracle"
                )
            from ..functions.spans import span_sql_2

            t0, t1 = leaf.terms
            parts.append(
                f"cand_{i} AS (SELECT a.docid, a.la, b.lb FROM "
                f"(SELECT docid, list_sort(list(pos)) AS la FROM tok "
                f"WHERE term = {_q(t0)} GROUP BY docid) a JOIN "
                f"(SELECT docid, list_sort(list(pos)) AS lb FROM tok "
                f"WHERE term = {_q(t1)} GROUP BY docid) b USING (docid))"
            )
            parts.append(
                span_sql_2(
                    "la", "lb", f"cand_{i}", leaf.slop, leaf.in_order,
                    name=f"spf_{i}", prefix=f"sp{i}",
                ).strip()
            )
            parts.append(
                f"tf_{i} AS (SELECT docid, CAST(freq AS DOUBLE) AS tf "
                f"FROM spf_{i} WHERE freq > 0)"
            )
            idf_sum = " + ".join(
                f"ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5))"
                for t in leaf.terms
            )
            weight = f"CAST({idf_sum} AS FLOAT)"
        elif isinstance(leaf, (SpanContaining, SpanWithin)):
            # big = 2-clause closed-form candidates + containment EXISTS
            # against the little positions; wider bigs are engine +
            # frozen-oracle territory like wide span_near
            if len(leaf.big) != 2:
                raise NotImplementedError(
                    "SQL oracle renders span_containing/span_within with "
                    "exactly 2 big clauses; wider ones are covered by the "
                    "frozen Python oracle"
                )
            from ..functions.spans import span_contain_sql_2

            t0, t1 = leaf.big
            emit = "big" if isinstance(leaf, SpanContaining) else "little"
            parts.append(
                f"cand_{i} AS (SELECT a.docid, a.la, b.lb, l.ll FROM "
                f"(SELECT docid, list_sort(list(pos)) AS la FROM tok "
                f"WHERE term = {_q(t0)} GROUP BY docid) a JOIN "
                f"(SELECT docid, list_sort(list(pos)) AS lb FROM tok "
                f"WHERE term = {_q(t1)} GROUP BY docid) b USING (docid) JOIN "
                f"(SELECT docid, list_sort(list(pos)) AS ll FROM tok "
                f"WHERE term = {_q(leaf.little)} GROUP BY docid) l USING (docid))"
            )
            parts.append(
                span_contain_sql_2(
                    "la", "lb", "ll", f"cand_{i}", leaf.slop, leaf.in_order,
                    emit, name=f"scf_{i}", prefix=f"sc{i}",
                ).strip()
            )
            parts.append(
                f"tf_{i} AS (SELECT docid, CAST(freq AS DOUBLE) AS tf "
                f"FROM scf_{i} WHERE freq > 0)"
            )
            idf_sum = " + ".join(
                f"ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5))"
                for t in leaf.terms
            )
            weight = f"CAST({idf_sum} AS FLOAT)"
        elif isinstance(leaf, SpanFirst):
            # span_first: tf = positions of the term before ``end``;
            # weight = the term's FULL-df idf (SpanWeight uses collection
            # stats, not the position-filtered count) — exact for any end
            parts.append(
                f"tf_{i} AS (SELECT docid, CAST(count(*) AS DOUBLE) AS tf "
                f"FROM tok WHERE term = {_q(leaf.term)} AND pos < {int(leaf.end)} "
                f"GROUP BY docid)"
            )
            weight = (
                f"CAST(ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(leaf.term)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(leaf.term)}) + 0.5)) AS FLOAT)"
            )
        elif isinstance(leaf, SpanNot):
            # span_not: include positions with no exclude position within
            # +/- dist; the exclude term contributes no idf — exact for
            # any dist (no candidate enumeration needed)
            parts.append(
                f"tf_{i} AS (SELECT a.docid, CAST(count(*) AS DOUBLE) AS tf "
                f"FROM tok a WHERE a.term = {_q(leaf.include)} AND NOT EXISTS ("
                f"SELECT 1 FROM tok b WHERE b.docid = a.docid "
                f"AND b.term = {_q(leaf.exclude)} "
                f"AND b.pos BETWEEN a.pos - {int(leaf.dist)} AND a.pos + {int(leaf.dist)}"
                f") GROUP BY a.docid)"
            )
            weight = (
                f"CAST(ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(leaf.include)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(leaf.include)}) + 0.5)) AS FLOAT)"
            )
        elif isinstance(leaf, SpanOr):
            # span_or: tf = total occurrences of ANY of the terms; weight
            # = grouped single-slot association (bm25.grouped_weight) —
            # a sequential left fold over the SORTED terms' full-df idfs,
            # which a textual left-associated '+' chain reproduces
            # exactly (parse sorts the terms).  A zero-df term still
            # contributes (count over the empty set is 0, not NULL).
            in_list = ", ".join(_q(t) for t in leaf.terms)
            parts.append(
                f"tf_{i} AS (SELECT docid, CAST(count(*) AS DOUBLE) AS tf "
                f"FROM tok WHERE term IN ({in_list}) GROUP BY docid)"
            )
            idf_sum = " + ".join(
                f"ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5))"
                for t in leaf.terms
            )
            weight = f"CAST({idf_sum} AS FLOAT)"
        elif isinstance(leaf, Term):
            parts.append(
                f"tf_{i} AS (SELECT docid, count(*) AS tf FROM tok WHERE term = {_q(leaf.term)} GROUP BY docid)"
            )
            weight = sql_idf_expr(f"(SELECT count(*) FROM tf_{i})", "(SELECT doc_count FROM stats)")
        elif leaf.slop > 0:
            # sloppy phrase: DuckDB recursive-CTE simulation of the SAME
            # greedy sweep the engine runs (functions/sloppy.py) — one
            # step per pointer advance, float32 freq accumulation,
            # candidates = docs holding both terms.  Rendered for the
            # 2-term case; engine + frozen oracle support any arity, so
            # wider sloppy phrases are pytest-verified rather than
            # SQL-oracled.
            if len(leaf.terms) != 2:
                raise NotImplementedError(
                    "SQL oracle renders sloppy phrases of exactly 2 terms; "
                    "wider ones are covered by the frozen Python oracle"
                )
            t0, t1 = leaf.terms
            parts.append(
                f"cand_{i} AS (SELECT a.docid, a.la, b.lb FROM "
                f"(SELECT docid, list_sort(list(pos)) AS la FROM tok "
                f"WHERE term = {_q(t0)} GROUP BY docid) a JOIN "
                f"(SELECT docid, list_sort(list(pos - 1)) AS lb FROM tok "
                f"WHERE term = {_q(t1)} GROUP BY docid) b USING (docid))"
            )
            parts.append(
                sloppy_sim_sql_2("la", "lb", f"cand_{i}", leaf.slop, name=f"sim_{i}").strip()
            )
            parts.append(
                f"tf_{i} AS (SELECT docid, CAST(freq AS DOUBLE) AS tf "
                f"FROM sim_{i} WHERE done AND freq > 0)"
            )
            idf_sum = " + ".join(
                f"ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5))"
                for t in leaf.terms
            )
            weight = f"CAST({idf_sum} AS FLOAT)"
        else:  # Phrase: adjacency self-joins on positions
            joins = "tok t0"
            conds = [f"t0.term = {_q(leaf.terms[0])}"]
            for j, t in enumerate(leaf.terms[1:], start=1):
                joins += f" JOIN tok t{j} ON t{j}.docid = t0.docid AND t{j}.pos = t0.pos + {j}"
                conds.append(f"t{j}.term = {_q(t)}")
            parts.append(
                f"tf_{i} AS (SELECT t0.docid, count(*) AS tf FROM {joins} WHERE {' AND '.join(conds)} GROUP BY t0.docid)"
            )
            idf_sum = " + ".join(
                f"ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - "
                f"(SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5) / "
                f"((SELECT count(DISTINCT docid) FROM tok WHERE term = {_q(t)}) + 0.5))"
                for t in leaf.terms
            )
            weight = f"CAST({idf_sum} AS FLOAT)"
        score = sql_score_expr("f.tf", "n.dl_dec", weight, "(SELECT avgdl FROM stats)")
        parts.append(
            f"s_{i} AS (SELECT f.docid, {score} AS s FROM tf_{i} f JOIN dln n USING (docid))"
        )
    return ",\n".join(parts)


def _positive_multiplicity(node: Node) -> dict[Node, float]:
    """Not-free score weight per leaf — the only score contributors
    (Lucene bool semantics: must_not filters, never scores; a clause
    appearing twice scores twice, and a query-time boost multiplies its
    occurrence's contribution).  Mirrors operators/search and
    oracle.LuceneOracle._eval (per-occurrence accumulation, Not = zero)."""
    counts: dict[Node, float] = {}

    def walk(n: Node) -> None:
        if isinstance(n, LEAVES):
            counts[n] = counts.get(n, 0.0) + n.boost
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c)

    walk(node)
    return counts


def _match_sql(ast: Node, leaves: list[Node]) -> str:
    """Boolean match set as SQL set algebra (INTERSECT/UNION/EXCEPT); fully
    general, including pure-negative queries (complement against ``d``)."""
    def idx(n: Node) -> int:
        return leaves.index(n)

    if isinstance(ast, LEAVES):
        return f"SELECT docid FROM tf_{idx(ast)}"
    if isinstance(ast, And):
        return " INTERSECT ".join(f"({_match_sql(c, leaves)})" for c in ast.children)
    if isinstance(ast, Or):
        return " UNION ".join(f"({_match_sql(c, leaves)})" for c in ast.children)
    if isinstance(ast, AtLeast):
        branches = " UNION ALL ".join(
            f"SELECT DISTINCT docid, {i} AS _br FROM ({_match_sql(c, leaves)})"
            for i, c in enumerate(ast.children)
        )
        return (
            f"SELECT docid FROM ({branches}) "
            f"GROUP BY docid HAVING count(*) >= {ast.m}"
        )
    if isinstance(ast, Not):
        return f"SELECT docid FROM d EXCEPT ({_match_sql(ast.child, leaves)})"
    raise TypeError(ast)


def _combine_sql(ast: Node, leaves: list[Node]) -> str:
    """(docid, s) for the full tree: docids from the match-set algebra,
    score = float32(float64 sum of the doc's POSITIVE-path leaf scores) —
    identical semantics to the engine and the frozen Python oracle for any
    And/Or/Not tree."""
    mult = _positive_multiplicity(ast)
    pos = [(i, mult[lf]) for i, lf in enumerate(leaves) if mult.get(lf)]
    match = _match_sql(ast, leaves)
    if not pos:
        return f"SELECT docid, CAST(0.0 AS FLOAT) AS s FROM ({match})"
    union = " UNION ALL ".join(
        f"SELECT docid, {m} * CAST(s AS DOUBLE) AS s FROM s_{i}" for i, m in pos
    )
    return (
        f"SELECT m.docid, CAST(COALESCE(t.s, 0.0) AS FLOAT) AS s "
        f"FROM ({match}) m LEFT JOIN ("
        f"SELECT docid, SUM(s) AS s FROM ({union}) GROUP BY docid"
        f") t USING (docid)"
    )


def _filters_sql(filt: dict, alias: str = "d") -> str:
    """SQL rendering of plans.query.filter_mask: is-one-of tuples render
    as IN lists; *_not exclusions OR an IS NULL (Lucene must_not keeps
    missing-field docs); *_not_exists requires NULL."""
    conds = []
    for fld in ("role", "tool"):
        v = filt.get(fld)
        if v is not None:
            if isinstance(v, (tuple, list)):
                vals = ", ".join(_q(x) for x in v)
                conds.append(f"{alias}.{fld} IN ({vals})")
            else:
                conds.append(f"{alias}.{fld} = {_q(v)}")
        nv = filt.get(f"{fld}_not")
        if nv:
            vals = ", ".join(_q(x) for x in nv)
            conds.append(f"({alias}.{fld} IS NULL OR {alias}.{fld} NOT IN ({vals}))")
        if filt.get(f"{fld}_exists"):
            conds.append(f"{alias}.{fld} IS NOT NULL")
        if filt.get(f"{fld}_not_exists"):
            conds.append(f"{alias}.{fld} IS NULL")
    if filt.get("ts_min") is not None:
        conds.append(f"{alias}.ts >= TIMESTAMP '{filt['ts_min']}'")
    if filt.get("ts_max") is not None:
        conds.append(f"{alias}.ts <= TIMESTAMP '{filt['ts_max']}'")
    return (" WHERE " + " AND ".join(conds)) if conds else ""


def match_count_sql(path: str, query: str) -> str:
    """DuckDB statement: single row (n_matches BIGINT) for a boolean query."""
    ast, dqlf = extract_filters(parse(query), query)
    leaves: list[Node] = []

    def collect(n: Node) -> None:
        if isinstance(n, LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, Not):
            collect(n.child)

    collect(ast)
    fsql = _filters_sql(dqlf)
    body = (
        "SELECT count(*) AS n_matches FROM combined"
        if not fsql
        else f"SELECT count(*) AS n_matches FROM combined c JOIN d USING (docid){fsql}"
    )
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)})
{body}"""


def match_agg_sql(path: str, query: str, agg_body: str) -> str:
    """DuckDB statement: ``agg_body`` evaluated over the matched docs
    (exposed as CTE ``m`` carrying the docs projection columns) — the
    oracle for search.match_agg_df's query-plus-aggregations request
    shape."""
    ast, dqlf = extract_filters(parse(query), query)
    leaves: list[Node] = []

    def collect(n: Node) -> None:
        if isinstance(n, LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, Not):
            collect(n.child)

    collect(ast)
    fsql = _filters_sql(dqlf)
    where_m = f"{fsql.replace(' WHERE ', ' WHERE (')})" if fsql else ""
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)}),
m AS (SELECT d.* FROM d JOIN combined USING (docid){where_m})
{agg_body}"""


def bm25_sql(
    path: str,
    query: str,
    k: int = 10,
    role: str | None = None,
    tool: str | None = None,
    ts_min: str | None = None,
    ts_max: str | None = None,
    role_exists: bool = False,
    tool_exists: bool = False,
    search_after: tuple | None = None,
    source_where: str | None = None,
    minimum_should_match: int | None = None,
    collapse: str | None = None,
    extra_where: str | None = None,
) -> str:
    """Full DuckDB statement: (docid BIGINT, score_r DOUBLE) top-k.  The
    query string is the same DQL surface as search_df — field filters
    extract and merge with the kwargs, wildcard leaves render as grouped
    term-set CTEs (no expansion needed: the SQL itself scans the
    vocabulary the engine's dictionary was built from).  ``search_after``
    is the engine's deep-pagination cursor: only rows strictly after
    (score, docid) in ranking order survive.  ``minimum_should_match``
    requires >= m of a top-level OR's clauses.  ``source_where`` restricts
    the CORPUS before docid assignment and stats — the oracle for an
    index built over a subset (rotation: one index per time bucket),
    whose idf/avgdl and docids are local to that subset."""
    ast, dqlf = extract_filters(parse(query), query)
    ast = apply_minimum_should_match(ast, minimum_should_match, query)
    if collapse and search_after is not None:
        raise NotImplementedError(
            "collapse + search_after: the engine collapses BEFORE the "
            "cursor; this rendering would cursor first — not supported"
        )
    # OpenSearch collapse: keep the (s desc, docid asc)-best hit per
    # group before paging — a QUALIFY on the grouped row_number
    coll = (
        f" QUALIFY row_number() OVER (PARTITION BY d.{collapse} "
        f"ORDER BY c.s DESC, c.docid ASC) = 1"
        if collapse
        else ""
    )
    filt = merge_filters(
        query,
        {"role": role, "tool": tool, "ts_min": ts_min, "ts_max": ts_max,
         "role_exists": role_exists, "tool_exists": tool_exists},
        dqlf,
    )
    leaves: list[Node] = []

    def collect(n: Node) -> None:
        if isinstance(n, LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, Not):
            collect(n.child)

    collect(ast)
    fsql = _filters_sql(filt)
    cursor = ""
    if search_after is not None:
        s, d = float(search_after[0]), int(search_after[1])
        cursor = (
            f"{' AND' if fsql else ' WHERE'} "
            f"(c.s < {s!r} OR (c.s = {s!r} AND c.docid > {d}))"
        )
    # extra_where: an arbitrary non-scoring predicate over the joined hit
    # row (c.docid / d.* in scope) — e.g. a nested-query EXISTS over a
    # derived array column (entry.q_bm25_nested_filter)
    extra = ""
    if extra_where:
        extra = f"{' AND' if (fsql or cursor) else ' WHERE'} ({extra_where})"
    return f"""WITH RECURSIVE {_base_ctes(path, source_where)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)})
SELECT docid, round(CAST(s AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid, c.s
  FROM combined c JOIN d USING (docid){fsql}{cursor}{extra}{coll}
  ORDER BY c.s DESC, c.docid ASC
  LIMIT {k}
)"""


def _join_field_prefix(path: str, query: str) -> tuple[str, str]:
    """Shared CTE prefix for the join-field oracles: the child query's
    full scored match set joined to conv_id, plus the per-conversation
    aggregate frame carrying every score mode (max/min, ordered-fold sum
    — the engine's docid-ordered float64 fold, textually replayed)."""
    ast, dqlf = extract_filters(parse(query), query)
    filt = merge_filters(query, {}, dqlf)
    leaves: list[Node] = []

    def collect(n: Node) -> None:
        if isinstance(n, LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, Not):
            collect(n.child)

    collect(ast)
    fsql = _filters_sql(filt)
    prefix = f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)}),
ch AS (
  SELECT d.conv_id, c.docid, CAST(c.s AS DOUBLE) AS s
  FROM combined c JOIN d USING (docid){fsql}
),
agg AS (
  SELECT conv_id, count(*) AS n_children,
         list_reduce(list_prepend(0.0, list(s ORDER BY docid)), (a, b) -> a + b) AS ssum,
         max(s) AS smax, min(s) AS smin
  FROM ch GROUP BY conv_id
)"""
    return prefix, fsql


def _join_field_score(score_mode: str) -> str:
    return {
        "none": "0.0",
        "max": "smax",
        "min": "smin",
        "sum": "ssum",
        "avg": "ssum / n_children",
    }[score_mode]


def has_child_sql(
    path: str,
    query: str,
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
) -> str:
    """DuckDB statement for ``joinfield.has_child_df``: (conv_id,
    n_children, score_r) — conversations with >= min_children matching
    turns, scored by the join-field mode, (score desc, conv_id) top-k."""
    prefix, _ = _join_field_prefix(path, query)
    mx = f" AND n_children <= {int(max_children)}" if max_children is not None else ""
    s = _join_field_score(score_mode)
    return f"""{prefix}
SELECT conv_id, n_children,
       round(CAST(CAST({s} AS FLOAT) AS DOUBLE), 3) AS score_r
FROM agg
WHERE n_children >= {int(min_children)}{mx}
ORDER BY CAST({s} AS FLOAT) DESC, conv_id ASC
LIMIT {int(k)}"""


def has_parent_sql(
    path: str,
    query: str,
    k: int = 10,
    score_mode: str = "max",
    score: bool = True,
) -> str:
    """DuckDB statement for ``joinfield.has_parent_df``: (docid, conv_id,
    score_r) — every turn of each matching conversation, the aggregate
    score propagated (or 0 when ``score`` is false)."""
    prefix, _ = _join_field_prefix(path, query)
    s = _join_field_score(score_mode) if score else "0.0"
    return f"""{prefix}
SELECT d.docid, d.conv_id,
       round(CAST(CAST({s} AS FLOAT) AS DOUBLE), 3) AS score_r
FROM d JOIN agg USING (conv_id)
ORDER BY CAST({s} AS FLOAT) DESC, d.docid ASC
LIMIT {int(k)}"""


def msearch_sql(path: str, queries: dict[str, str], k: int = 10) -> str:
    """DuckDB statement for ``msearch_df``: (qid, docid, score_r) — each
    query's ``bm25_sql`` rendered independently and UNION ALL'd under its
    qid literal.  Deliberately the definitional per-query form: the
    engine's shared one-scan batch plan must be invisible in the values."""
    parts = []
    for qid, q in queries.items():
        lit = "'" + qid.replace("'", "''") + "'"
        parts.append(
            f"SELECT {lit} AS qid, t.docid, t.score_r FROM (\n{bm25_sql(path, q, k=k)}\n) t"
        )
    body = "\nUNION ALL\n".join(parts)
    return (
        "SELECT qid, docid, score_r FROM (\n"
        + body
        + "\n) u ORDER BY qid, score_r DESC, docid"
    )


def mlt_sql(
    path: str,
    docid: int,
    k: int = 10,
    msm_pct: int = 30,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
) -> str:
    """DuckDB statement for ``more_like_this_df``: the FULL pipeline —
    term selection (in-doc tf >= min_term_freq, df >= min_doc_freq,
    tf * idf float64 score, top max_query_terms by (score desc, term)),
    minimum_should_match = max(1, floor(msm_pct% of selected)), grouped
    term-set BM25 scoring (per-term idf, float64 sum, one float32 cast),
    source-doc exclusion — derived independently from the corpus, no
    engine-side expansion baked in."""
    D = int(docid)
    score = sql_score_expr(
        "f.tf",
        "n.dl_dec",
        sql_idf_expr("w.df", "(SELECT doc_count FROM stats)"),
        "(SELECT avgdl FROM stats)",
    )
    return f"""WITH RECURSIVE {_base_ctes(path)},
src AS (
  SELECT term, count(*) AS tf FROM tok WHERE docid = {D}
  GROUP BY term HAVING count(*) >= {int(min_term_freq)}
),
sdf AS (
  SELECT term, count(DISTINCT docid) AS df FROM tok
  WHERE term IN (SELECT term FROM src) GROUP BY term
),
sel AS (
  SELECT s.term,
         CAST(s.tf AS DOUBLE) *
         ln(1 + (CAST((SELECT doc_count FROM stats) AS DOUBLE) - f.df + 0.5)
                / (f.df + 0.5)) AS mscore
  FROM src s JOIN sdf f USING (term) WHERE f.df >= {int(min_doc_freq)}
  ORDER BY mscore DESC, s.term LIMIT {int(max_query_terms)}
),
msm AS (
  SELECT greatest(1, CAST(floor({int(msm_pct)} * count(*) / 100.0) AS BIGINT)) AS m
  FROM sel
),
ptf AS (
  SELECT docid, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM sel) GROUP BY docid, term
),
pdf AS (SELECT term, count(*) AS df FROM ptf GROUP BY term),
sc AS (
  SELECT f.docid, SUM(CAST({score} AS DOUBLE)) AS s, count(*) AS nm
  FROM ptf f JOIN pdf w USING (term) JOIN dln n USING (docid)
  GROUP BY f.docid
)
SELECT docid, round(CAST(CAST(s AS FLOAT) AS DOUBLE), 3) AS score_r
FROM sc
WHERE nm >= (SELECT m FROM msm) AND docid != {D}
ORDER BY CAST(s AS FLOAT) DESC, docid LIMIT {int(k)}"""


def sorted_hits_sql(
    path: str,
    query: str,
    k: int = 10,
    sort_field: str = "ts",
    ascending: bool = False,
) -> str:
    """DuckDB statement for ``sorted_hits_df``: the match set joined to
    the doc projection, ordered by (sort_field, docid)."""
    ast, dqlf = extract_filters(parse(query), query)
    leaves: list[Node] = []

    def collect(n: Node) -> None:
        if isinstance(n, LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, Not):
            collect(n.child)

    collect(ast)
    fsql = _filters_sql(dqlf)
    where = f"{fsql.replace(' WHERE ', ' WHERE (')})" if fsql else ""
    direction = "ASC" if ascending else "DESC"
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)})
SELECT d.docid, d.conv_id, d.turn_idx, d.role, d.tool, d.ts
FROM d JOIN combined USING (docid){where}
ORDER BY d.{sort_field} {direction}, d.docid LIMIT {int(k)}"""


def significant_text_sql(
    path: str,
    query: str,
    n: int = 10,
    min_doc_count: int = 3,
) -> str:
    """DuckDB statement for ``significant_text_df``: per-doc foreground
    term counts over the match set, background df over all docs, JLH
    score, top-n by (rounded score desc, term asc)."""
    ast, dqlf = extract_filters(parse(query), query)
    leaves: list[Node] = []

    def collect(node: Node) -> None:
        if isinstance(node, LEAVES):
            if node not in leaves:
                leaves.append(node)
        elif isinstance(node, (And, Or, AtLeast)):
            for c in node.children:
                collect(c)
        elif isinstance(node, Not):
            collect(node.child)

    collect(ast)
    fsql = _filters_sql(dqlf)
    msel = (
        "SELECT docid FROM combined"
        if not fsql
        else f"SELECT c.docid FROM combined c JOIN d USING (docid){fsql}"
    )
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)}),
m AS ({msel}),
fg AS (
  SELECT term, count(DISTINCT t.docid) AS fg_cnt
  FROM tok t JOIN m USING (docid) GROUP BY term
),
bg AS (
  SELECT term, count(DISTINCT docid) AS bg_cnt FROM tok
  WHERE term IN (SELECT term FROM fg) GROUP BY term
),
tot AS (
  SELECT (SELECT count(*) FROM m) AS subset_size,
         (SELECT count(*) FROM d) AS superset_size
)
SELECT term, fg_cnt, bg_cnt,
       round((CAST(fg_cnt AS DOUBLE) / subset_size
              - CAST(bg_cnt AS DOUBLE) / superset_size)
             * ((CAST(fg_cnt AS DOUBLE) / subset_size)
                / (CAST(bg_cnt AS DOUBLE) / superset_size)), 6) AS score_r
FROM fg JOIN bg USING (term) CROSS JOIN tot
WHERE fg_cnt >= {int(min_doc_count)}
  AND CAST(fg_cnt AS DOUBLE) / subset_size > CAST(bg_cnt AS DOUBLE) / superset_size
ORDER BY score_r DESC, term ASC LIMIT {int(n)}"""


def terms_enum_sql(path: str, prefix: str, n: int = 10, by_df: bool = True) -> str:
    """DuckDB statement for ``terms_enum_df``: dictionary region = the
    corpus's distinct terms with the prefix, df = docs containing."""
    pfx = prefix.lower()
    hi = pfx[:-1] + chr(ord(pfx[-1]) + 1)
    order = "df DESC, term ASC" if by_df else "term ASC"
    return f"""WITH {_base_ctes(path)}
SELECT term, count(DISTINCT docid) AS df FROM tok
WHERE term >= {_q(pfx)} AND term < {_q(hi)}
GROUP BY term ORDER BY {order} LIMIT {int(n)}"""


def _adhoc_base_ctes(path: str, id_col: str, text_col: str) -> str:
    """Generic-table variant of _base_ctes: docid = the caller's id
    column (not row_number), same CTE names (d/tok0/dl/stats/dln/tok) so
    _leaf_ctes/_combine_sql compose unchanged.  ``path`` ending in
    .parquet reads the file; anything else is taken as a relation name
    (the driver gate pre-registers tables as views)."""
    rel = f"read_parquet('{path}')" if path.endswith(".parquet") else path
    trunc = sql_truncate_expr(text_col)
    return f"""
d AS (
  SELECT {id_col} AS docid, {trunc} AS text FROM {rel}
),
tok0 AS (
  SELECT docid,
         list_filter(string_split_regex(lower(coalesce(text, '')), '{SQL_SPLIT_RE}'),
                     x -> x <> '') AS toks
  FROM d
),
dl AS (SELECT docid, len(toks) AS dl FROM tok0),
stats AS (
  SELECT count(*) FILTER (WHERE dl > 0) AS doc_count,
         CAST(sum(dl) AS DOUBLE) / count(*) FILTER (WHERE dl > 0) AS avgdl
  FROM dl
),
dln AS (SELECT docid, {sql_decode_case('dl')} AS dl_dec FROM dl),
tok AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY pre_pos) - 1 AS pos
  FROM (
    SELECT docid, unnest(toks) AS term, generate_subscripts(toks, 1) AS pre_pos
    FROM tok0
  )
)"""


def bm25_adhoc_sql(
    path: str,
    query: str,
    k: int | None = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    minimum_should_match: int | None = None,
    rounded: bool = True,
) -> str:
    """DuckDB statement for operators.adhoc.bm25_adhoc_df: (id_col,
    score_r DOUBLE round-3) top-k over a raw table, ids as docids.  Same
    leaf restriction as the engine (term/phrase/span_first/span_not/
    span_or + boolean trees; no field filters, no dictionary-expansion
    leaves).  ``rounded=False`` keeps the raw float32 score (column name
    ``score``) — for composition into rank-fusion legs, where the
    ROUNDED value could reorder near-ties relative to the engine."""
    from .adhoc import _collect_leaves

    ast, dqlf = extract_filters(parse(query), query)
    if dqlf:
        raise ValueError("ad-hoc BM25 takes no field filters")
    ast = apply_minimum_should_match(ast, minimum_should_match, query)
    leaves = _collect_leaves(ast)
    sel = (
        "round(CAST(s AS DOUBLE), 3) AS score_r"
        if rounded
        else "CAST(s AS DOUBLE) AS score"
    )
    tail = "" if k is None else f"ORDER BY s DESC, docid ASC\nLIMIT {int(k)}"
    return f"""WITH RECURSIVE {_adhoc_base_ctes(path, id_col, text_col)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)})
SELECT docid AS {id_col}, {sel}
FROM combined
{tail}"""


def rrf_sql(
    leg_sqls: list[tuple[str, str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    rrf_k: int = 60,
    rank_window: int = 100,
) -> str:
    """DuckDB statement for operators.adhoc.rrf_fuse.  Each leg is
    (subquery_sql, its id column, its score column); ranks are 1-based
    row_number by (score desc, id asc) cut at rank_window; the fused sum
    folds textually in leg order — the engine's fixed association."""
    legs = []
    for i, (sql, lid, lsc) in enumerate(leg_sqls):
        legs.append(
            f"leg_{i} AS (SELECT {lid} AS id, 1.0 / ({int(rrf_k)} + r) AS c{i} "
            f"FROM (SELECT {lid}, row_number() OVER "
            f"(ORDER BY {lsc} DESC, {lid} ASC) AS r FROM ({sql})) "
            f"WHERE r <= {int(rank_window)})"
        )
    join = "leg_0"
    for i in range(1, len(leg_sqls)):
        join += f" FULL OUTER JOIN leg_{i} USING (id)"
    total = " + ".join(f"COALESCE(c{i}, 0.0)" for i in range(len(leg_sqls)))
    return f"""WITH {', '.join(legs)}
SELECT id AS {id_col}, {total} AS rrf_score
FROM {join}
ORDER BY rrf_score DESC, id ASC
LIMIT {int(k)}"""


def hybrid_sql(
    leg_sqls: list[tuple[str, str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    weights: list[float] | None = None,
    rank_window: int = 100,
) -> str:
    """DuckDB statement for operators.adhoc.hybrid_fuse: per-leg min_max
    normalization over the rank window (single-point leg -> 1.0),
    weighted arithmetic mean with missing legs as 0, folded textually in
    leg order."""
    if weights is None:
        weights = [1.0] * len(leg_sqls)
    wsum = float(sum(weights))
    legs = []
    for i, (sql, lid, lsc) in enumerate(leg_sqls):
        legs.append(
            f"hleg_{i} AS (SELECT {lid} AS id, "
            f"CASE WHEN max(s) OVER () = min(s) OVER () THEN 1.0 "
            f"ELSE (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ()) END AS n{i} "
            f"FROM (SELECT {lid}, CAST({lsc} AS DOUBLE) AS s, row_number() OVER "
            f"(ORDER BY {lsc} DESC, {lid} ASC) AS r FROM ({sql})) "
            f"WHERE r <= {int(rank_window)})"
        )
    join = "hleg_0"
    for i in range(1, len(leg_sqls)):
        join += f" FULL OUTER JOIN hleg_{i} USING (id)"
    total = " + ".join(
        f"{float(w)!r} * COALESCE(n{i}, 0.0)" for i, w in enumerate(weights)
    )
    return f"""WITH {', '.join(legs)}
SELECT id AS {id_col}, ({total}) / {wsum!r} AS hybrid_score
FROM {join}
ORDER BY hybrid_score DESC, id ASC
LIMIT {int(k)}"""


def multi_match_sql(
    path: str,
    query: str,
    fields: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
) -> str:
    """DuckDB statement for operators.adhoc.multi_match_df: per-field
    ad-hoc legs (each with its own stats, rounded=False so near-ties keep
    the engine's float32 ordering), full-outer-joined and combined with
    the identical greatest/sum arithmetic, one final float32 cast, round-3
    for the driver hash."""
    if match_type not in ("best_fields", "most_fields"):
        raise ValueError(f"multi_match: unknown type {match_type!r}")
    legs = []
    for i, fld in enumerate(fields):
        leg = bm25_adhoc_sql(
            path, query, k=None, id_col=id_col, text_col=fld, rounded=False
        )
        legs.append(
            f"leg_{i} AS (SELECT {id_col} AS id, score AS s{i} FROM ({leg}))"
        )
    join = "leg_0"
    for i in range(1, len(fields)):
        join += f" FULL OUTER JOIN leg_{i} USING (id)"
    scols = [f"COALESCE(CAST(s{i} AS DOUBLE), 0.0)" for i in range(len(fields))]
    ssum = " + ".join(scols)
    if match_type == "most_fields":
        total = f"({ssum})"
    else:
        mx = f"greatest({', '.join(scols)})"
        total = (
            f"({mx} + {float(tie_breaker)!r} * (({ssum}) - {mx}))"
            if tie_breaker
            else mx
        )
    return f"""WITH {', '.join(legs)}
SELECT id AS {id_col},
       round(CAST(CAST({total} AS FLOAT) AS DOUBLE), 3) AS score_r
FROM {join}
ORDER BY CAST({total} AS FLOAT) DESC, id ASC
LIMIT {int(k)}"""
