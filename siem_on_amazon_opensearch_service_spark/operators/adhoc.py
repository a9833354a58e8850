"""Index-free (ad-hoc) BM25 scoring and reciprocal-rank-fusion hybrid
search.

``bm25_adhoc_df`` scores ANY (id, text) DataFrame against a DQL query
with the engine's frozen Lucene-BM25 arithmetic WITHOUT building an
index — the Lucene ``MemoryIndex`` / one-off ``_score`` shape.  The
reference reaches this surface through OpenSearch scoring on ephemeral
indexes; re-expressed here as pure Column expressions over the frozen
analyzer's token array (zero Python in the scorer, whole-stage
codegen), with corpus stats (doc_count, avgdl, per-term dfs) gathered
in ONE aggregate pass.  At scale: two scans of the text column (one
stats pass with map-side partial aggregation, one scoring pass ending
in a global top-k) and no other shuffle.

Exactness: the arithmetic mirrors functions/bm25 term for term — the
lossy SmallFloat norm round-trip (smallfloat.sql_decode_case rendered
as a Spark CASE expression), normInverse-then-multiply operation order,
float32 clause weights, float64 accumulation with one final float32
cast.  tests/test_adhoc.py proves rank/score identity against the
INDEX path (LocalIndex over the same rows) and against the DuckDB
rendering.

``rrf_fuse`` combines ranked legs (e.g. this lexical scorer and a
vector leg from operators/similarity) by reciprocal rank fusion —
OpenSearch's hybrid-query RRF processor: score(d) = sum over legs of
1 / (rrf_k + rank_leg(d)), rank 1-based within each leg, missing docs
contribute nothing.  Legs are expected to be top-window results
(k-to-hundreds of rows), so the single-partition rank window is
driver-scale by construction; the fused sum folds in leg order (fixed
association, exact cross-engine).

Reference parity: the OpenSearch hybrid query + score-ranker-processor
(reference delegates to the search pipeline; no reference-repo code
implements it — it is an OpenSearch-engine feature the repo's saved
objects can invoke).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..functions import bm25
from ..functions.smallfloat import sql_decode_case
from ..plans.query import (
    And,
    AtLeast,
    Node,
    Not,
    Or,
    Phrase,
    SpanFirst,
    SpanNot,
    SpanOr,
    Term,
    apply_minimum_should_match,
    extract_filters,
    parse,
)

#: leaves the ad-hoc scorer supports: per-doc tf expressible as a pure
#: Column over the token/position arrays.  Dictionary-expansion leaves
#: (wildcard/fuzzy/regexp/phrase-prefix) would need a vocabulary scan,
#: and sloppy/span_near need candidate enumeration — all refused loudly;
#: build an index for those.
_ADHOC_LEAVES = (Term, Phrase, SpanFirst, SpanNot, SpanOr)


def _toks_col(text: Column) -> Column:
    from .percolate import tokens_col

    return tokens_col(text)


def _positions(toks: Column, term: str) -> Column:
    idx = F.transform(
        toks, lambda x, i: F.when(x == F.lit(term), i).otherwise(F.lit(-1))
    )
    return F.filter(idx, lambda p: p >= 0)


def _collect_leaves(ast: Node) -> list[Node]:
    leaves: list[Node] = []

    def walk(n: Node) -> None:
        if isinstance(n, _ADHOC_LEAVES):
            if isinstance(n, Phrase) and n.slop:
                raise NotImplementedError(
                    "ad-hoc BM25 supports exact-adjacency phrases only"
                )
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.child)
        else:
            raise NotImplementedError(
                f"ad-hoc BM25 supports term/phrase/span_first/span_not/"
                f"span_or leaves and boolean trees; got {type(n).__name__} "
                f"— build an index for dictionary-expansion or proximity-"
                f"enumeration queries"
            )

    walk(ast)
    return leaves


def _leaf_tf(leaf: Node, toks: Column) -> Column:
    """Per-doc clause frequency as a pure Column (long)."""
    if isinstance(leaf, Term):
        return F.size(F.filter(toks, lambda x: x == F.lit(leaf.term)))
    if isinstance(leaf, Phrase):
        pos = [_positions(toks, t) for t in leaf.terms]

        def run_at(p: Column) -> Column:
            cond = F.lit(True)
            for j in range(1, len(leaf.terms)):
                cond = cond & F.array_contains(pos[j], p + F.lit(j))
            return cond

        return F.size(F.filter(pos[0], run_at))
    if isinstance(leaf, SpanFirst):
        return F.size(
            F.filter(_positions(toks, leaf.term), lambda p: p < F.lit(leaf.end))
        )
    if isinstance(leaf, SpanNot):
        pe = _positions(toks, leaf.exclude)
        return F.size(
            F.filter(
                _positions(toks, leaf.include),
                lambda p: ~F.exists(
                    pe, lambda q: F.abs(q - p) <= F.lit(leaf.dist)
                ),
            )
        )
    if isinstance(leaf, SpanOr):
        alts = F.array(*[F.lit(t) for t in leaf.terms])
        return F.size(F.filter(toks, lambda x: F.array_contains(alts, x)))
    raise TypeError(leaf)


def _mask(node: Node, present: dict[Node, Column]) -> Column:
    if isinstance(node, _ADHOC_LEAVES):
        return present[node]
    if isinstance(node, And):
        out = _mask(node.children[0], present)
        for c in node.children[1:]:
            out = out & _mask(c, present)
        return out
    if isinstance(node, Or):
        out = _mask(node.children[0], present)
        for c in node.children[1:]:
            out = out | _mask(c, present)
        return out
    if isinstance(node, AtLeast):
        cnt = None
        for c in node.children:
            piece = F.when(_mask(c, present), 1).otherwise(0)
            cnt = piece if cnt is None else cnt + piece
        return cnt >= node.m
    if isinstance(node, Not):
        return ~_mask(node.child, present)
    raise TypeError(node)


def _facts_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    nonterm: list[tuple[int, Node]],
) -> DataFrame:
    """One Arrow pass emitting the packed (__id, __facts) frame: Python
    tokenize + integer facts instead of the JVM split() expression.
    Row-identical to the column builder — same char-based truncation
    (the corpus's ASCII contract, _truncate_text_col), same lower ->
    word-run split, same per-leaf tf definitions — but the text column
    crosses memory once per Arrow batch instead of allocating a
    java.lang.String per token: 2-3x faster single-threaded AND scaling
    on bandwidth-starved hosts (the chunking/c4 impl='arrow' lesson,
    BENCH/scaling_r4g.md)."""
    import re as _re

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    from ..functions import analysis as _analysis

    split = _re.compile(_analysis.SQL_SPLIT_RE)
    tb, tk, tm = (
        _analysis.TRUNCATE_BYTES,
        _analysis.TRUNCATE_KEEP,
        _analysis.TRUNCATE_MARK,
    )
    need_pos: set[str] = set()
    for _, leaf in nonterm:
        if isinstance(leaf, Phrase):
            need_pos.update(leaf.terms)
        elif isinstance(leaf, SpanFirst):
            need_pos.add(leaf.term)
        elif isinstance(leaf, SpanNot):
            need_pos.update((leaf.include, leaf.exclude))
        # SpanOr: membership counts only — no positions

    def leaf_tf(leaf: Node, cnt: dict, pos: dict) -> int:
        if isinstance(leaf, Phrase):
            p0 = pos.get(leaf.terms[0], ())
            sets = [set(pos.get(t, ())) for t in leaf.terms[1:]]
            return sum(
                1 for p in p0 if all((p + j + 1) in s for j, s in enumerate(sets))
            )
        if isinstance(leaf, SpanFirst):
            return sum(1 for p in pos.get(leaf.term, ()) if p < leaf.end)
        if isinstance(leaf, SpanNot):
            exc = pos.get(leaf.exclude, ())
            return sum(
                1
                for p in pos.get(leaf.include, ())
                if not any(abs(q - p) <= leaf.dist for q in exc)
            )
        if isinstance(leaf, SpanOr):
            alts = set(leaf.terms)
            return sum(cnt.get(t, 0) for t in alts)
        raise TypeError(leaf)

    schema = StructType(
        [
            StructField("__id", df.schema[id_col].dataType),
            StructField("__facts", ArrayType(LongType())),
        ]
    )
    src = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
    )

    # vectorized facts (r6b): dl and per-term tf come from COUNTING regex
    # passes over the lowered text — token strings are never materialized
    # for pure term/SpanOr queries.  Identities: the number of
    # non-overlapping TOKEN_RE matches equals len(split-minus-empties)
    # (same maximal [A-Za-z0-9_]+ runs), and a token equals `term` iff
    # `term` occurs as a maximal run, which the boundary lookarounds
    # assert exactly.  Positional leaves (phrase/span_first/span_not)
    # still walk tokens per row, but only over rows whose anchor term is
    # present — absent-anchor rows score 0 by the same arithmetic the
    # per-row path used.  The reference per-row formulation survives as
    # impl="column"; tests assert row identity between the two.
    # r6c: the per-term/anchor passes run through pyarrow's RE2
    # (count_substring_regex / match_substring_regex) instead of CPython
    # re — ~7x on the term passes (measured), one pandas->arrow convert
    # per batch amortized over every pattern.  Pattern equivalence is
    # exact: terms are [A-Za-z0-9_]+ tokens, and RE2's \b is the ASCII
    # word boundary — transitions of [A-Za-z0-9_] — so \bterm\b accepts
    # precisely the (?<![A-Za-z0-9_])term(?![A-Za-z0-9_]) language the
    # r6b lookarounds asserted (randomized cross-engine equality checked
    # in tests).  dl keeps the CPython TOKEN_RE count: many-match
    # counting measured FASTER there than RE2.
    tok_count_re = _re.compile(_analysis.TOKEN_RE.pattern)
    term_pats = {t: r"\b" + _re.escape(t) + r"\b" for t in terms}
    anchors: list[str] = []
    for _, leaf in nonterm:
        if isinstance(leaf, Phrase):
            anchors.append(leaf.terms[0])
        elif isinstance(leaf, SpanFirst):
            anchors.append(leaf.term)
        elif isinstance(leaf, SpanNot):
            anchors.append(leaf.include)
        else:  # SpanOr: membership counts only — vectorized below
            anchors.append("")
    anchor_pats = {
        a: r"\b" + _re.escape(a) + r"\b" for a in set(anchors) - {""}
    }
    term_idx = {t: i for i, t in enumerate(terms)}

    def gen(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            s = pdf["__text"]
            long_mask = s.str.len() > tb
            if long_mask.any():
                s = s.where(~long_mask, s.str.slice(0, tk) + tm)
            low = s.str.lower()
            n = len(pdf)
            nfacts = 1 + len(terms) + len(nonterm)
            facts = np.zeros((n, nfacts), dtype=np.int64)
            facts[:, 0] = low.str.count(tok_count_re).to_numpy(dtype=np.int64)
            arr = pa.Array.from_pandas(low)
            for t, i in term_idx.items():
                facts[:, 1 + i] = (
                    pc.count_substring_regex(arr, pattern=term_pats[t])
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            if nonterm:
                cand = np.zeros(n, dtype=bool)
                row_anchor_hit = {}
                for a, pat in anchor_pats.items():
                    hit = (
                        pc.match_substring_regex(arr, pattern=pat)
                        .to_numpy(zero_copy_only=False)
                        .astype(bool)
                    )
                    row_anchor_hit[a] = hit
                    cand |= hit
                for j, (_, leaf) in enumerate(nonterm):
                    if isinstance(leaf, SpanOr):
                        col = len(terms) + 1 + j
                        for t in set(leaf.terms):
                            facts[:, col] += facts[:, 1 + term_idx[t]]
                if cand.any():
                    vals = low.values
                    pos_leaves = [
                        (len(terms) + 1 + j, a, leaf)
                        for j, ((_, leaf), a) in enumerate(zip(nonterm, anchors))
                        if a
                    ]
                    for ri in np.nonzero(cand)[0]:
                        toks = [x for x in split.split(vals[ri]) if x]
                        pos: dict[str, list[int]] = {}
                        for i, x in enumerate(toks):
                            if x in need_pos:
                                pos.setdefault(x, []).append(i)
                        for col, a, leaf in pos_leaves:
                            if row_anchor_hit[a][ri]:
                                facts[ri, col] = leaf_tf(leaf, {}, pos)
            yield pd.DataFrame(
                {"__id": pdf["__id"].values, "__facts": list(facts)}
            )

    return src.mapInPandas(gen, schema)


def bm25_adhoc_df(
    df: DataFrame,
    query: str,
    k: int | None = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    minimum_should_match: int | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """(id_col, score float32) — BM25 top-k over a raw table, no index.

    Identical scores to building an index over the same rows with the
    given ids as docids and querying it (tests assert this against
    LocalIndex).  Field filters are rejected: an arbitrary table has no
    role/tool/ts contract — filter the DataFrame before calling.

    ``impl``: "arrow" (default) extracts the packed per-doc facts in one
    Arrow pass (the fast path on bandwidth-bound hosts); "column" is the
    pure-Column reference formulation — row-identical by construction
    (tests assert score equality on every leaf type), kept as the
    oracle-shaped spec."""
    ast, dqlf = extract_filters(parse(query), query)
    if dqlf:
        raise ValueError(
            "ad-hoc BM25 takes no field filters; filter the DataFrame "
            "before scoring"
        )
    ast = apply_minimum_should_match(ast, minimum_should_match, query)
    leaves = _collect_leaves(ast)

    # ONE tokenize pass: project the narrow per-doc facts (dl, per-term
    # tf, per-positional-leaf tf) and materialize them with an eager
    # localCheckpoint — tokenization (the dominant cost) runs once, and
    # the stats aggregate + scoring both read ints-per-doc instead of
    # re-tokenizing the text column.  The checkpoint is ~(2 + #terms +
    # #phrase-like-leaves) longs per doc — the standard
    # storage-for-a-second-scan trade the dedup operators make too.
    terms = sorted({t for lf in leaves for t in _leaf_terms_of(lf)})
    tcol = {t: f"__t{i}" for i, t in enumerate(terms)}
    nonterm = [
        (ci, leaf) for ci, leaf in enumerate(leaves) if not isinstance(leaf, Term)
    ]
    if impl == "arrow":
        packed = _facts_arrow(df, id_col, text_col, terms, nonterm).localCheckpoint(
            eager=True
        )
    elif impl == "column":
        toks = _toks_col(F.col(text_col))

        def _term_eq(t: str):
            # NOTE: a `lambda x, t=t:` default-arg binding reads as the
            # two-argument (element, index) lambda form to F.filter — bind
            # through a closure instead
            return lambda x: x == F.lit(t)

        # all facts come out of ONE let-binding (the dedup module's
        # single-element-transform trick): projection collapse would
        # otherwise inline — and re-evaluate — the tokenize expression into
        # every count column (measured: no speedup at all from the single
        # pass until this).  body(a) sees the token array once per row.
        def body(a):
            facts = [F.size(a).cast("long")]
            facts += [F.size(F.filter(a, _term_eq(t))).cast("long") for t in terms]
            facts += [_leaf_tf(leaf, a).cast("long") for _, leaf in nonterm]
            return F.array(*facts)

        facts_col = F.element_at(F.transform(F.array(toks), body), 1)
        packed = df.select(
            F.col(id_col).alias("__id"), facts_col.alias("__facts")
        ).localCheckpoint(eager=True)
    else:
        raise ValueError(f"impl must be 'arrow' or 'column', got {impl!r}")

    # unpack AFTER the checkpoint: the materialized frame holds the
    # packed longs, so per-column element_at reads, never re-tokenizes
    unpack = [F.col("__id"), F.element_at("__facts", 1).alias("__dl")]
    for i, t in enumerate(terms):
        unpack.append(F.element_at("__facts", i + 2).alias(tcol[t]))
    leaf_tf_name: dict[int, str] = {}
    for ci, leaf in enumerate(leaves):
        if isinstance(leaf, Term):
            leaf_tf_name[ci] = tcol[leaf.term]
    for j, (ci, _) in enumerate(nonterm):
        leaf_tf_name[ci] = f"__tf{ci}"
        unpack.append(
            F.element_at("__facts", len(terms) + 2 + j).alias(f"__tf{ci}")
        )
    narrow = packed.select(*unpack)

    aggs = [
        F.count(F.when(F.col("__dl") > 0, 1)).alias("__dc"),
        F.sum("__dl").alias("__sumdl"),
    ] + [
        F.count(F.when(F.col(tcol[t]) > 0, 1)).alias(f"__df{i}")
        for i, t in enumerate(terms)
    ]
    srow = narrow.agg(*aggs).collect()[0]
    doc_count = int(srow["__dc"] or 0)
    if doc_count == 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, score float"
        )
    avgdl = float(srow["__sumdl"]) / doc_count
    dfs = {t: int(srow[f"__df{i}"] or 0) for i, t in enumerate(terms)}

    from .search import _clause_weights, _positive_multiplicity

    weights = _clause_weights(leaves, dfs, doc_count)
    mult = _positive_multiplicity(ast)

    # lossy norm round-trip: the same searched CASE the DuckDB oracle
    # uses, evaluated over the raw token count (ANSI SQL — valid Spark)
    scored = narrow.withColumn(
        "__dln", F.expr(sql_decode_case("__dl")).cast("double")
    )
    ninv = F.lit(1.0) / (
        F.lit(bm25.K1)
        * (F.lit(1.0 - bm25.B) + F.lit(bm25.B) * F.col("__dln") / F.lit(avgdl))
    )
    present: dict[Node, Column] = {}
    total = F.lit(0.0)
    for ci, leaf in enumerate(leaves):
        tf = F.col(leaf_tf_name[ci])
        present[leaf] = tf > 0
        m = float(mult.get(leaf, 0.0))
        if m:
            w = F.lit(float(np.float64(weights[ci])))
            clause = (
                (w - w / (F.lit(1.0) + tf.cast("double") * ninv))
                .cast("float")
                .cast("double")
            )
            total = total + F.lit(m) * clause
    out = (
        scored.filter(_mask(ast, present))
        .select(F.col("__id").alias(id_col), total.cast("float").alias("score"))
    )
    if k is None:
        return out
    return out.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _leaf_terms_of(leaf: Node) -> list[str]:
    if isinstance(leaf, Term):
        return [leaf.term]
    if isinstance(leaf, (Phrase, SpanOr)):
        return list(leaf.terms)
    if isinstance(leaf, SpanFirst):
        return [leaf.term]
    if isinstance(leaf, SpanNot):
        # the exclude term needs no df (it carries no idf weight) but
        # listing it costs one conditional count and keeps the stats
        # pass uniform
        return [leaf.include]
    raise TypeError(leaf)


def rrf_fuse(
    legs: list[DataFrame],
    k: int = 10,
    id_col: str = "doc_id",
    score_cols: list[str] | None = None,
    rrf_k: int = 60,
    rank_window: int = 100,
) -> DataFrame:
    """Reciprocal rank fusion of ranked legs: score(d) = sum over legs of
    1/(rrf_k + rank), rank 1-based by (leg score desc, id asc), legs cut
    to ``rank_window`` before fusing.  Returns (id_col, rrf_score double)
    top-k by (rrf_score desc, id asc).

    Legs must already be top-window results — the rank window runs
    single-partition, which is exactly right for k-to-hundreds of rows
    and means fusion adds no cluster-scale shuffle.  The fused sum folds
    in leg order (c0 + c1 + ...), a fixed association the SQL oracle
    reproduces textually."""
    from pyspark.sql import Window

    if score_cols is None:
        score_cols = ["score"] * len(legs)
    fused = None
    for i, (leg, sc) in enumerate(zip(legs, score_cols)):
        w = Window.orderBy(F.col(sc).desc(), F.col(id_col).asc())
        r = (
            leg.select(id_col, sc)
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= rank_window)
            .select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("__r"))).alias(f"__c{i}"),
            )
        )
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    total = F.lit(0.0)
    for i in range(len(legs)):
        total = total + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    return (
        fused.select(F.col(id_col), total.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hybrid_fuse(
    legs: list[DataFrame],
    k: int = 10,
    id_col: str = "doc_id",
    score_cols: list[str] | None = None,
    weights: list[float] | None = None,
    rank_window: int = 100,
) -> DataFrame:
    """OpenSearch hybrid query + normalization processor (the 2.x neural
    search default): per-leg ``min_max`` normalization over the leg's
    rank window — nrm = (s - min)/(max - min), a single-point leg
    normalizes to 1.0 — combined by the WEIGHTED ARITHMETIC MEAN over
    all legs with a missing leg contributing 0 (the processor averages
    over every sub-query, not just the ones that matched).  Returns
    (id_col, hybrid_score double) top-k by (score desc, id asc).

    Determinism contract: leg inputs must be cross-engine-exact values
    (raw float32 BM25 / round-6 cosine — the RRF rank rule); min/max are
    exact selections and the normalization is two IEEE double ops on
    exact inputs, so both engines produce bit-identical hybrid scores.
    The mean folds textually in leg order.  Same scale shape as
    rrf_fuse: legs are already top-window frames, fusion adds no
    cluster-scale shuffle."""
    from pyspark.sql import Window

    if score_cols is None:
        score_cols = ["score"] * len(legs)
    if weights is None:
        weights = [1.0] * len(legs)
    if len(weights) != len(legs):
        raise ValueError("one weight per leg")
    wsum = float(sum(weights))
    fused = None
    for i, (leg, sc) in enumerate(zip(legs, score_cols)):
        w = Window.orderBy(F.col("__s").desc(), F.col(id_col).asc())
        top = (
            leg.select(id_col, F.col(sc).cast("double").alias("__s"))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= rank_window)
        )
        ext = top.select(
            F.col(id_col),
            "__s",
            F.min("__s").over(Window.partitionBy()).alias("__mn"),
            F.max("__s").over(Window.partitionBy()).alias("__mx"),
        )
        nrm = F.when(
            F.col("__mx") == F.col("__mn"), F.lit(1.0)
        ).otherwise((F.col("__s") - F.col("__mn")) / (F.col("__mx") - F.col("__mn")))
        r = ext.select(F.col(id_col), nrm.alias(f"__n{i}"))
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    total = F.lit(0.0)
    for i, wt in enumerate(weights):
        total = total + F.lit(float(wt)) * F.coalesce(F.col(f"__n{i}"), F.lit(0.0))
    return (
        fused.select(F.col(id_col), (total / F.lit(wsum)).alias("hybrid_score"))
        .orderBy(F.col("hybrid_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def multi_match_df(
    df: DataFrame,
    query: str,
    fields: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
) -> DataFrame:
    """OpenSearch ``multi_match`` re-expressed over the ad-hoc scorer:
    score the query independently against each field (each field keeps its
    OWN doc_count/avgdl/df stats, as per-field Lucene indexes do), then
    combine per doc —

    - ``best_fields``: Lucene DisjunctionMaxQuery — max of the field
      scores plus ``tie_breaker`` * (sum of the losing fields);
    - ``most_fields``: bool-OR of the per-field queries — plain sum.

    A doc matching in ANY field matches (full outer join of the legs).
    Combination runs in float64 over the float32 leg scores in field
    order with one final float32 cast — fixed association, replayed
    textually by sqloracle.multi_match_sql.

    Scale: one stats pass + one scoring pass per field (bm25_adhoc_df's
    shape); the combine join is between already-filtered match sets."""
    if match_type not in ("best_fields", "most_fields"):
        raise ValueError(f"multi_match: unknown type {match_type!r}")
    if len(fields) < 2:
        raise ValueError("multi_match: need >= 2 fields")
    legs = []
    for i, fld in enumerate(fields):
        leg = bm25_adhoc_df(
            df.select(F.col(id_col), F.col(fld).cast("string").alias("text")),
            query,
            k=None,
            id_col=id_col,
        )
        legs.append(leg.select(id_col, F.col("score").alias(f"__s{i}")))
    out = legs[0]
    for leg in legs[1:]:
        out = out.join(leg, id_col, "full_outer")
    scols = [
        F.coalesce(F.col(f"__s{i}"), F.lit(0.0)).cast("double")
        for i in range(len(fields))
    ]
    ssum = scols[0]
    for c in scols[1:]:
        ssum = ssum + c
    if match_type == "most_fields":
        total = ssum
    else:
        mx = F.greatest(*scols)
        total = mx + F.lit(float(tie_breaker)) * (ssum - mx) if tie_breaker else mx
    out = out.select(F.col(id_col), total.cast("float").alias("score"))
    if k is None:
        return out
    return out.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
