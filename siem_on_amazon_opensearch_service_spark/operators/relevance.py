"""OpenSearch relevance-rewriting layer: function_score, rescore, rank_eval.

The reference delegates every scoring feature to OpenSearch; these are the
three score-level APIs users layer on top of its saved searches
(``function_score`` recency decay on dashboards, ``rescore`` windows for
precision tuning, ``_rank_eval`` for relevance regression tests).  Spark-first
re-expression: the BM25 match set comes from ``search_df(k=None)`` (the full
scored set, no sort), score rewriting is pure JVM column algebra over a docid
join with the docs projection, and the page is a TakeOrdered top-k.

Numeric contract (frozen, mirrored textually by the SQL oracles):

* the query score is the engine's float32 BM25 score, widened to float64;
* every function value is computed in float64; derived constants
  (``2*sigma^2``, lambda, the pivot scale, DCG rank coefficients, IDCG) are
  computed ONCE in Python and embedded as the *same* double literal in both
  the Spark plan and the DuckDB SQL, so no transcendental function is ever
  evaluated independently by the two engines unless unavoidable
  (``gauss``/``exp`` decay evaluate ``exp`` engine-side; the result is cast
  to float32 before combining to absorb last-ulp libm/JVM differences);
* the combined score is cast to float32 once, then ranked
  ``(score desc, docid asc)``.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.query import (
    And,
    AtLeast,
    Node,
    Not,
    Or,
    extract_filters,
    merge_filters,
    parse,
)
from .search import search_df
from .sqloracle import LEAVES, _base_ctes, _combine_sql, _filters_sql, _leaf_ctes

_HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# shared constants / leaf collection

def ts_epoch(origin: str) -> float:
    """Naive-UTC timestamp string -> epoch seconds (the corpus convention:
    naive timestamps are UTC, matching the UTC Spark session and DuckDB's
    naive TIMESTAMP epoch())."""
    dt = datetime.fromisoformat(origin).replace(tzinfo=timezone.utc)
    return dt.timestamp()


def decay_constants(kind: str, scale: float, decay: float) -> dict:
    """The decay family's derived constant, computed once in Python.

    OpenSearch decay semantics: the function value is ``decay`` exactly at
    distance ``scale`` past ``offset``.
      linear: pivot = scale / (1 - decay);   v = max(0, (pivot - dist)/pivot)
      exp:    lambda = ln(decay) / scale;    v = exp(lambda * dist)
      gauss:  two_sigma2 = -scale^2 / ln(decay); v = exp(-dist^2 / two_sigma2)
    """
    if kind == "linear":
        return {"pivot": scale / (1.0 - decay)}
    if kind == "exp":
        return {"lam": math.log(decay) / scale}
    if kind == "gauss":
        return {"two_sigma2": -(scale * scale) / math.log(decay)}
    raise ValueError(f"unknown decay kind {kind!r}")


def _collect_leaves(ast: Node) -> list[Node]:
    leaves: list[Node] = []

    def walk(n: Node) -> None:
        if isinstance(n, LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (And, Or, AtLeast)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.child)
        else:  # pragma: no cover - parser guarantees the node set
            raise TypeError(n)

    walk(ast)
    return leaves


# ---------------------------------------------------------------------------
# score functions: paired Column / SQL renderings

def _dist(x, origin: float, offset: float, is_sql: bool):
    if is_sql:
        return f"greatest(abs({x} - {origin!r}) - {offset!r}, 0.0)"
    return F.greatest(F.abs(x - F.lit(origin)) - F.lit(offset), F.lit(0.0))


def decay_col(kind: str, x: Column, origin: float, scale: float,
              offset: float, decay: float) -> Column:
    c = decay_constants(kind, scale, decay)
    d = _dist(x, origin, offset, is_sql=False)
    if kind == "linear":
        p = c["pivot"]
        return F.greatest((F.lit(p) - d) / F.lit(p), F.lit(0.0))
    if kind == "exp":
        v = F.exp(F.lit(c["lam"]) * d)
    else:  # gauss
        v = F.exp(-(d * d) / F.lit(c["two_sigma2"]))
    # float32 absorb: exp() is the one engine-evaluated transcendental
    return v.cast("float").cast("double")


def decay_sql(kind: str, x: str, origin: float, scale: float,
              offset: float, decay: float) -> str:
    c = decay_constants(kind, scale, decay)
    d = _dist(x, origin, offset, is_sql=True)
    if kind == "linear":
        p = c["pivot"]
        return f"greatest(({p!r} - {d}) / {p!r}, 0.0)"
    if kind == "exp":
        v = f"exp({c['lam']!r} * {d})"
    else:
        v = f"exp(-({d} * {d}) / {c['two_sigma2']!r})"
    return f"CAST(CAST({v} AS FLOAT) AS DOUBLE)"


def random_uniform_col(seed: int, docid: Column) -> Column:
    """Deterministic uniform in [0, 1): the first 8 hex nibbles of
    md5('seed:docid') as a 32-bit integer over 2^32.  Pure string+integer
    arithmetic so Spark and DuckDB agree bit-for-bit (OpenSearch
    random_score with a seed+field is likewise a deterministic hash)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), docid.cast("string")))
    val = F.lit(0).cast("long")
    for i in range(8):
        nib = F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - F.lit(1)
        val = val + nib.cast("long") * F.lit(16 ** (7 - i))
    return val.cast("double") / F.lit(float(2**32))


def random_uniform_sql(seed: int, docid: str) -> str:
    h = f"md5('{seed}:' || CAST({docid} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(CAST({terms} AS DOUBLE) / {float(2**32)!r})"


def field_value_factor_col(field: Column, factor: float, modifier: str,
                           missing: float) -> Column:
    x = F.coalesce(field.cast("double"), F.lit(missing)) * F.lit(factor)
    if modifier == "none":
        return x
    if modifier == "sqrt":  # IEEE-exact, identical cross-engine
        return F.sqrt(x)
    if modifier == "log1p":
        return F.log1p(x).cast("float").cast("double")
    raise ValueError(f"unknown modifier {modifier!r}")


def field_value_factor_sql(field: str, factor: float, modifier: str,
                           missing: float) -> str:
    x = f"(COALESCE(CAST({field} AS DOUBLE), {missing!r}) * {factor!r})"
    if modifier == "none":
        return x
    if modifier == "sqrt":
        return f"sqrt({x})"
    if modifier == "log1p":
        return f"CAST(CAST(ln(1.0 + {x}) AS FLOAT) AS DOUBLE)"
    raise ValueError(f"unknown modifier {modifier!r}")


def _function_value(fn: dict, is_sql: bool):
    """One function spec -> its float64 value (Column or SQL string).

    Spec kinds (the OpenSearch function_score families that need no
    script engine): ``linear``/``exp``/``gauss`` decay on a numeric or
    ts field, ``field_value_factor``, ``random`` (seeded hash), and
    ``weight`` (constant).  Every kind accepts a ``weight`` multiplier.
    """
    kind = fn["kind"]
    w = float(fn.get("weight", 1.0))
    if kind in ("linear", "exp", "gauss"):
        field = fn.get("field", "ts")
        origin = fn["origin"]
        if isinstance(origin, str):
            origin = ts_epoch(origin)
        x = (
            (f"epoch(d.{field})" if field == "ts" else f"CAST(d.{field} AS DOUBLE)")
            if is_sql
            else F.col(field).cast("double")
        )
        v = (decay_sql if is_sql else decay_col)(
            kind, x, float(origin), float(fn["scale"]),
            float(fn.get("offset", 0.0)), float(fn.get("decay", 0.5)),
        )
    elif kind == "field_value_factor":
        field = fn["field"]
        args = (float(fn.get("factor", 1.0)), fn.get("modifier", "none"),
                float(fn.get("missing", 1.0)))
        v = (
            field_value_factor_sql(f"d.{field}", *args)
            if is_sql
            else field_value_factor_col(F.col(field), *args)
        )
    elif kind == "random":
        seed = int(fn["seed"])
        v = (
            random_uniform_sql(seed, "c.docid")
            if is_sql
            else random_uniform_col(seed, F.col("docid"))
        )
    elif kind == "weight":
        v = repr(1.0) if is_sql else F.lit(1.0)
    else:
        raise ValueError(f"unknown function kind {kind!r}")
    if w != 1.0:
        v = f"({v} * {w!r})" if is_sql else v * F.lit(w)
    return v


def _combine_functions(vals, score_mode: str, is_sql: bool):
    if not vals:
        return repr(1.0) if is_sql else F.lit(1.0)
    if score_mode == "first":
        return vals[0]
    if is_sql:
        if score_mode == "multiply":
            out = vals[0]
            for v in vals[1:]:
                out = f"({out} * {v})"
            return out
        if score_mode == "sum":
            return "(" + " + ".join(vals) + ")"
        if score_mode == "avg":
            return f"(({' + '.join(vals)}) / {float(len(vals))!r})"
        if score_mode in ("max", "min"):
            fn = "greatest" if score_mode == "max" else "least"
            return f"{fn}({', '.join(vals)})"
    else:
        if score_mode == "multiply":
            out = vals[0]
            for v in vals[1:]:
                out = out * v
            return out
        if score_mode == "sum":
            out = vals[0]
            for v in vals[1:]:
                out = out + v
            return out
        if score_mode == "avg":
            out = vals[0]
            for v in vals[1:]:
                out = out + v
            return out / F.lit(float(len(vals)))
        if score_mode in ("max", "min"):
            fn = F.greatest if score_mode == "max" else F.least
            return fn(*vals)
    raise ValueError(f"unknown score_mode {score_mode!r}")


def _boost_combine(s, fval, boost_mode: str, is_sql: bool):
    if is_sql:
        table = {
            "multiply": f"({s} * {fval})",
            "sum": f"({s} + {fval})",
            "replace": fval,
            "max": f"greatest({s}, {fval})",
            "min": f"least({s}, {fval})",
            "avg": f"(({s} + {fval}) / 2.0)",
        }
    else:
        table = {
            "multiply": s * fval,
            "sum": s + fval,
            "replace": fval,
            "max": F.greatest(s, fval),
            "min": F.least(s, fval),
            "avg": (s + fval) / F.lit(2.0),
        }
    try:
        return table[boost_mode]
    except KeyError:
        raise ValueError(f"unknown boost_mode {boost_mode!r}") from None


# ---------------------------------------------------------------------------
# function_score

def function_score_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    *,
    functions: list[dict],
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    session=None,
    **filt,
) -> DataFrame:
    """OpenSearch function_score: rewrite every matching doc's BM25 score
    with decay / field-value / random functions, then top-k.

    ``session`` (a warm QuerySession over the same index) pins stats /
    dfs / postings / docs for the base query and serves the field join
    from its persisted docs projection when the fields are pinned.

    Plan shape: full scored match set (``search_df(k=None)`` — no sort)
    joined on docid with the docs projection (only the fields the
    functions read), the combined score as one JVM column expression, and
    a TakeOrdered page.  The docid join is the only exchange beyond the
    base query's own; at cluster scale both sides are docid-partitioned
    parquet so AQE plans a shuffle-free sort-merge or broadcasts the
    match set when the query is selective.

    r6: on the r2 format the base query's fused generator EMITS the
    function fields itself (per-shard ranged reads of the docs parquet —
    ``search_df(_emit_fields=...)``), so the docs join disappears and the
    whole query is one Python stage + TakeOrdered.  Field values are the
    same parquet cells the join read, and the score rewrite stays the
    identical JVM column expression.  Restricted to timestamp/integral
    fields (their NULLs survive the Arrow boundary unambiguously —
    integral columns can't hold NaN); other shapes keep the join."""
    import os
    import re

    from .search import _shard_size_of

    fields = sorted(
        {fn.get("field", "ts") for fn in functions if fn["kind"] != "random" and fn["kind"] != "weight"}
    )
    base_kwargs: dict = {}
    if fields and _shard_size_of(index_dir) is not None and all(
        re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", f) and f not in ("docid", "score")
        for f in fields
    ):
        dschema = {
            sf.name: sf.dataType.simpleString()
            for sf in spark.read.parquet(os.path.join(index_dir, "docs")).schema.fields
        }
        emit_t = {"timestamp": "timestamp", "bigint": "double", "int": "double",
                  "smallint": "double", "tinyint": "double"}
        if all(dschema.get(f) in emit_t for f in fields):
            base_kwargs = {
                "_emit_fields": fields,
                "_emit_types": [emit_t[dschema[f]] for f in fields],
            }
    if session is not None:
        base = session.search(query, k=None, **base_kwargs, **filt)
    else:
        base = search_df(spark, index_dir, query, k=None, **base_kwargs, **filt)
    scored = base
    if fields and not all(f in base.columns for f in fields):
        # legacy format / non-fused branch / unsupported field type:
        # attach the fields with the docid join as before
        if (
            session is not None
            and session.docs is not None
            and all(f in session.docs.columns for f in fields)
        ):
            docs = session.docs.select("docid", *fields)
        else:
            docs = spark.read.parquet(os.path.join(index_dir, "docs")).select("docid", *fields)
        scored = base.join(docs, "docid")
    vals = [_function_value(fn, is_sql=False) for fn in functions]
    fval = _combine_functions(vals, score_mode, is_sql=False)
    s = F.col("score").cast("double")
    final = _boost_combine(s, fval, boost_mode, is_sql=False).cast("float")
    out = scored.select("docid", final.alias("score"))
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def function_score_sql(
    path: str,
    query: str,
    k: int = 10,
    *,
    functions: list[dict],
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    **kwargs,
) -> str:
    """DuckDB oracle for function_score_df: (docid BIGINT, score_r DOUBLE)."""
    ast, dqlf = extract_filters(parse(query), query)
    filt = merge_filters(query, dict(kwargs), dqlf)
    leaves = _collect_leaves(ast)
    fsql = _filters_sql(filt)
    vals = [_function_value(fn, is_sql=True) for fn in functions]
    fval = _combine_functions(vals, score_mode, is_sql=True)
    final = _boost_combine("CAST(c.s AS DOUBLE)", fval, boost_mode, is_sql=True)
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)})
SELECT docid, round(CAST(score AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid, CAST({final} AS FLOAT) AS score
  FROM combined c JOIN d USING (docid){fsql}
  ORDER BY score DESC, c.docid ASC
  LIMIT {k}
)"""


# ---------------------------------------------------------------------------
# rank_feature

RANK_FEATURE_KINDS = ("saturation", "log", "sigmoid")


def _rank_feature_val(fn: dict, x, is_sql: bool):
    """One rank_feature function over a float64 feature value ``x``
    (Column or SQL string) -> float64 in [0, 1) (saturation/sigmoid) or
    unbounded (log).  EXACTNESS: saturation is pure rational double
    arithmetic (bit-exact cross-engine); log/sigmoid round-trip the
    transcendental (ln / pow) through float32 on BOTH engines to absorb
    libm-vs-JVM last-ulp differences (the decay-function recipe).
    A missing feature contributes 0 — ES's unindexed-rank_feature
    behavior."""
    kind = fn["kind"]
    if kind not in RANK_FEATURE_KINDS:
        raise ValueError(
            f"rank_feature kind must be one of {RANK_FEATURE_KINDS}, got {kind!r}"
        )
    if kind == "saturation":
        pivot = float(fn["pivot"])
        if pivot <= 0:
            raise ValueError("saturation pivot must be > 0")
        if is_sql:
            v = f"({x} / ({x} + {pivot!r}))"
        else:
            v = x / (x + F.lit(pivot))
    elif kind == "log":
        scaling = float(fn.get("scaling_factor", 1.0))
        if scaling <= 0:
            raise ValueError("log scaling_factor must be > 0")
        if is_sql:
            v = f"CAST(CAST(ln({scaling!r} + {x}) AS FLOAT) AS DOUBLE)"
        else:
            v = F.log(F.lit(scaling) + x).cast("float").cast("double")
    else:  # sigmoid
        pivot, ex = float(fn["pivot"]), float(fn["exponent"])
        if pivot <= 0 or ex <= 0:
            raise ValueError("sigmoid pivot and exponent must be > 0")
        # pivot^exp computed ONCE in python, float32-rounded like x^exp
        import numpy as _np

        pe = float(_np.float32(pivot**ex))
        if is_sql:
            xe = f"CAST(CAST(pow({x}, {ex!r}) AS FLOAT) AS DOUBLE)"
            v = f"({xe} / ({xe} + {pe!r}))"
        else:
            xe = F.pow(x, F.lit(ex)).cast("float").cast("double")
            v = xe / (xe + F.lit(pe))
    if is_sql:
        return f"COALESCE({v}, 0.0)"
    return F.coalesce(v, F.lit(0.0))


def rank_feature_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    field: str,
    fn: dict,
    k: int = 10,
    boost: float = 1.0,
    session=None,
    **filt,
) -> DataFrame:
    """OpenSearch ``rank_feature`` as a bool-should companion to a text
    query: score = float32(bm25(query) + boost * fn(feature)) — the
    popularity/recency-boost idiom (saturation / log / sigmoid over a
    numeric doc field, e.g. turn_idx or dl).

    Same plan shape as function_score: full scored match set, docid join
    to the column-pruned feature projection, one JVM score expression,
    TakeOrdered page."""
    import os

    if session is not None:
        base = session.search(query, k=None, **filt)
    else:
        base = search_df(spark, index_dir, query, k=None, **filt)
    if (
        session is not None
        and session.docs is not None
        and field in session.docs.columns
    ):
        docs = session.docs.select("docid", field)
    else:
        docs = spark.read.parquet(os.path.join(index_dir, "docs")).select(
            "docid", field
        )
    val = _rank_feature_val(fn, F.col(field).cast("double"), is_sql=False)
    final = (
        F.col("score").cast("double") + F.lit(float(boost)) * val
    ).cast("float")
    out = base.join(docs, "docid").select("docid", final.alias("score"))
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def rank_feature_sql(
    path: str,
    query: str,
    field: str,
    fn: dict,
    k: int = 10,
    boost: float = 1.0,
    **kwargs,
) -> str:
    """DuckDB oracle for rank_feature_df: (docid BIGINT, score_r DOUBLE)."""
    ast, dqlf = extract_filters(parse(query), query)
    filt = merge_filters(query, dict(kwargs), dqlf)
    leaves = _collect_leaves(ast)
    fsql = _filters_sql(filt)
    # `dl` (exact token count, == docs parquet dl) lives in its own CTE,
    # not in d; every other feature field is a d column.
    feat_join = " LEFT JOIN dl fdl USING (docid)" if field == "dl" else ""
    src = "fdl.dl" if field == "dl" else f"d.{field}"
    val = _rank_feature_val(fn, f"CAST({src} AS DOUBLE)", is_sql=True)
    final = f"(CAST(c.s AS DOUBLE) + {float(boost)!r} * {val})"
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)})
SELECT docid, round(CAST(score AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid, CAST({final} AS FLOAT) AS score
  FROM combined c JOIN d USING (docid){feat_join}{fsql}
  ORDER BY score DESC, c.docid ASC
  LIMIT {k}
)"""


# ---------------------------------------------------------------------------
# rescore

def rescore_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    rescore_query: str,
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    session=None,
    **filt,
) -> DataFrame:
    """OpenSearch rescore: re-rank the top ``window_size`` hits of the base
    query by ``query_weight * base + rescore_weight * secondary`` (docs the
    secondary query misses keep their base component — Lucene
    QueryRescorer semantics), then return the top ``k``.

    The secondary match set is cut down to the window by a broadcast semi
    join (window_size docids), so the expensive side is touched once and
    the final combine involves only window-sized frames."""
    if session is not None:
        window = session.search(query, k=window_size, **filt)
        second = session.search(rescore_query, k=None)
    else:
        window = search_df(spark, index_dir, query, k=window_size, **filt)
        second = search_df(spark, index_dir, rescore_query, k=None)
    second = second.join(
        F.broadcast(window.select("docid")), "docid"
    ).withColumnRenamed("score", "score2")
    combined = window.join(F.broadcast(second), "docid", "left")
    total = (
        F.col("score").cast("double") * F.lit(float(query_weight))
        + F.coalesce(F.col("score2").cast("double"), F.lit(0.0))
        * F.lit(float(rescore_weight))
    ).cast("float")
    out = combined.select("docid", total.alias("score"))
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def rescore_sql(
    path: str,
    query: str,
    rescore_query: str,
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    **kwargs,
) -> str:
    """DuckDB oracle for rescore_df: (docid BIGINT, score_r DOUBLE)."""
    ast1, dqlf = extract_filters(parse(query), query)
    filt = merge_filters(query, dict(kwargs), dqlf)
    ast2, dqlf2 = extract_filters(parse(rescore_query), rescore_query)
    if any(v for v in dqlf2.values()):
        raise NotImplementedError("rescore_query with DQL filters")
    leaves = _collect_leaves(ast1)
    for lf in _collect_leaves(ast2):
        if lf not in leaves:
            leaves.append(lf)
    fsql = _filters_sql(filt)
    qw, rw = float(query_weight), float(rescore_weight)
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
c1 AS ({_combine_sql(ast1, leaves)}),
c2 AS ({_combine_sql(ast2, leaves)}),
win AS (
  SELECT c.docid, c.s
  FROM c1 c JOIN d USING (docid){fsql}
  ORDER BY c.s DESC, c.docid ASC
  LIMIT {window_size}
)
SELECT docid, round(CAST(score AS DOUBLE), 3) AS score_r
FROM (
  SELECT w.docid,
         CAST(CAST(w.s AS DOUBLE) * {qw!r}
              + COALESCE(CAST(c2.s AS DOUBLE), 0.0) * {rw!r} AS FLOAT) AS score
  FROM win w LEFT JOIN c2 USING (docid)
  ORDER BY score DESC, w.docid ASC
  LIMIT {k}
)"""


# ---------------------------------------------------------------------------
# rank_eval

def _dcg_coefs(k: int) -> list[float]:
    """1 / log2(rank + 1) for ranks 1..k, computed once in Python and
    embedded as literals in BOTH engines (no transcendental divergence)."""
    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def ideal_dcg(ratings: dict[int, int], k: int) -> float:
    coefs = _dcg_coefs(k)
    rels = sorted((r for r in ratings.values() if r > 0), reverse=True)[:k]
    return sum((2**rel - 1) * c for rel, c in zip(rels, coefs))


def rank_eval_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    ratings: dict[int, int],
    k: int = 10,
    **filt,
) -> DataFrame:
    """OpenSearch _rank_eval over one request: precision@k, recall@k, MRR,
    and NDCG@k for a query against graded relevance judgments.

    ``ratings`` maps docid -> integer grade (0 = irrelevant).  Metrics
    follow the _rank_eval module: precision divides by RETRIEVED count,
    recall by the number of docs with grade > 0, MRR uses the first
    ranked doc with grade > 0, NDCG uses gain ``2^grade - 1`` with the
    rank coefficients embedded as shared literals (see _dcg_coefs).
    Everything after the top-k page is k-row-sized arithmetic."""
    from pyspark.sql.window import Window

    hits = search_df(spark, index_dir, query, k=k, **filt)
    w = Window.orderBy(F.col("score").desc(), F.col("docid").asc())
    ranked = hits.withColumn("rnk", F.row_number().over(w))
    rated = spark.createDataFrame(
        [(int(d), int(r)) for d, r in sorted(ratings.items())], "docid long, rel int"
    )
    j = ranked.join(F.broadcast(rated), "docid", "left").withColumn(
        "rel", F.coalesce(F.col("rel"), F.lit(0))
    )
    coefs = _dcg_coefs(k)
    coef = F.element_at(
        F.array(*[F.lit(c) for c in coefs]), F.col("rnk").cast("int")
    )
    total_rel = sum(1 for r in ratings.values() if r > 0)
    idcg = ideal_dcg(ratings, k)
    agg = j.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("_hits"),
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("_first"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0)) * coef
        ).alias("_dcg"),
    )
    return agg.select(
        F.round(F.col("_hits").cast("double") / F.col("_n"), 6).alias("precision_k"),
        F.round(F.col("_hits").cast("double") / F.lit(float(total_rel)), 6).alias("recall_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("_first").cast("double"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(F.col("_dcg") / F.lit(float(idcg)), 6).alias("ndcg_k"),
    )


def rank_eval_sql(
    path: str,
    query: str,
    ratings: dict[int, int],
    k: int = 10,
    **kwargs,
) -> str:
    """DuckDB oracle for rank_eval_df: one row
    (precision_k, recall_k, mrr, ndcg_k), all DOUBLE rounded to 6."""
    ast, dqlf = extract_filters(parse(query), query)
    filt = merge_filters(query, dict(kwargs), dqlf)
    leaves = _collect_leaves(ast)
    fsql = _filters_sql(filt)
    coefs = _dcg_coefs(k)
    coef_list = ", ".join(repr(c) for c in coefs)
    rated_rows = ", ".join(f"({int(d)}, {int(r)})" for d, r in sorted(ratings.items()))
    total_rel = sum(1 for r in ratings.values() if r > 0)
    idcg = ideal_dcg(ratings, k)
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)}),
hits AS (
  SELECT c.docid, c.s,
         row_number() OVER (ORDER BY c.s DESC, c.docid ASC) AS rnk
  FROM combined c JOIN d USING (docid){fsql}
  ORDER BY c.s DESC, c.docid ASC
  LIMIT {k}
),
rated(rdocid, rel) AS (VALUES {rated_rows}),
coefs AS (SELECT unnest([{coef_list}]) AS coef,
                 generate_subscripts([{coef_list}], 1) AS rnk),
j AS (
  SELECT h.rnk, COALESCE(r.rel, 0) AS rel, c.coef
  FROM hits h
  LEFT JOIN rated r ON r.rdocid = h.docid
  JOIN coefs c USING (rnk)
)
SELECT round(CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS precision_k,
       round(CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS DOUBLE) / {float(total_rel)!r}, 6) AS recall_k,
       round(COALESCE(1.0 / min(CASE WHEN rel > 0 THEN rnk END), 0.0), 6) AS mrr,
       round(sum((pow(2.0, CAST(rel AS DOUBLE)) - 1.0) * coef) / {float(idcg)!r}, 6) AS ndcg_k
FROM j"""


# ---------------------------------------------------------------------------
# dis_max / boosting (the two remaining scriptless compound query types)

def dis_max_df(
    spark: SparkSession,
    index_dir: str,
    queries: list[str],
    k: int = 10,
    tie_breaker: float = 0.0,
    session=None,
) -> DataFrame:
    """Lucene DisjunctionMaxQuery: a doc matching any clause scores
    ``max_i + tie_breaker * (sum_i - max_i)`` over the clause scores.

    Each clause is a full DQL query evaluated to its scored match set
    (``search_df(k=None)``); the union aggregates per docid with one
    conditional-max column per clause (clause count is query-sized), so
    the combine is a single exchange and the final arithmetic is a fixed
    left-to-right float64 fold the SQL oracle mirrors textually.  Missing
    clauses contribute 0.0 (scores are positive, so 0 is both the max
    floor and the sum identity).

    r6: on the r2 index format the whole query runs the fused shard-local
    plan instead (one Python stage — the per-docid combine needs no
    exchange; ``search._dis_max_shard_local``), score-identical by the
    same float64-fold argument; the union plan below is the fallback for
    legacy formats and ``k=None`` callers."""
    if not queries:
        raise ValueError("dis_max_df: at least one clause query required")
    from .search import dis_max_fused

    fused = dis_max_fused(
        spark, index_dir, queries, k=k, tie_breaker=tie_breaker,
        session=session,
    )
    if fused is not None:
        return fused

    def _scored(q):
        if session is not None:
            return session.search(q, k=None)
        return search_df(spark, index_dir, q, k=None)

    parts = [
        _scored(q).select("docid", F.lit(i).alias("ci"), F.col("score"))
        for i, q in enumerate(queries)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy("docid").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("ci") == i, F.col("score").cast("double"))),
                F.lit(0.0),
            ).alias(f"s{i}")
            for i in range(len(queries))
        ]
    )
    cols = [F.col(f"s{i}") for i in range(len(queries))]
    mx = cols[0] if len(cols) == 1 else F.greatest(*cols)
    sm = cols[0]
    for c in cols[1:]:
        sm = sm + c
    final = (mx + F.lit(float(tie_breaker)) * (sm - mx)).cast("float")
    out = agg.select("docid", final.alias("score"))
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def dis_max_sql(
    path: str, queries: list[str], k: int = 10, tie_breaker: float = 0.0
) -> str:
    """DuckDB oracle for dis_max_df: (docid BIGINT, score_r DOUBLE)."""
    asts = []
    leaves: list[Node] = []
    for q in queries:
        ast, dqlf = extract_filters(parse(q), q)
        if any(v for v in dqlf.values()):
            raise NotImplementedError("dis_max clause with DQL filters")
        asts.append(ast)
        for lf in _collect_leaves(ast):
            if lf not in leaves:
                leaves.append(lf)
    ctes = ",\n".join(
        f"c{i} AS ({_combine_sql(ast, leaves)})" for i, ast in enumerate(asts)
    )
    union = " UNION ALL ".join(
        f"SELECT docid, {i} AS ci, s FROM c{i}" for i in range(len(asts))
    )
    sconds = ", ".join(
        f"COALESCE(max(CASE WHEN ci = {i} THEN CAST(s AS DOUBLE) END), 0.0) AS s{i}"
        for i in range(len(asts))
    )
    names = [f"s{i}" for i in range(len(asts))]
    mx = names[0] if len(names) == 1 else f"greatest({', '.join(names)})"
    sm = names[0]
    for nm in names[1:]:
        sm = f"({sm} + {nm})"
    tb = float(tie_breaker)
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
{ctes},
u AS ({union}),
g AS (SELECT docid, {sconds} FROM u GROUP BY docid)
SELECT docid, round(CAST(score AS DOUBLE), 3) AS score_r
FROM (
  SELECT docid, CAST({mx} + {tb!r} * ({sm} - {mx}) AS FLOAT) AS score
  FROM g
  ORDER BY score DESC, docid ASC
  LIMIT {k}
)"""


def boosting_df(
    spark: SparkSession,
    index_dir: str,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int = 10,
    session=None,
) -> DataFrame:
    """OpenSearch boosting query: docs matching the negative query keep
    their positive score DEMOTED by ``negative_boost`` (not excluded —
    the difference from NOT).  One multiply over the positive scored set;
    the negative side contributes only a match-set (no scoring), joined
    as a flag."""
    from .search import match_docids_df

    if session is not None:
        pos = session.search(positive, k=None)
        # the scored set's docids ARE the match set — reuse the warm path.
        # Pure-negative negatives are refused on BOTH paths (search_df and
        # match_docids_df each require positive coverage), so this raises
        # the same ValueError the cold path does.
        neg = session.search(negative, k=None).select("docid").withColumn(
            "_neg", F.lit(True)
        )
    else:
        pos = search_df(spark, index_dir, positive, k=None)
        neg = match_docids_df(spark, index_dir, negative).withColumn(
            "_neg", F.lit(True)
        )
    joined = pos.join(neg, "docid", "left")
    final = F.when(
        F.col("_neg").isNotNull(),
        (F.col("score").cast("double") * F.lit(float(negative_boost))).cast("float"),
    ).otherwise(F.col("score"))
    out = joined.select("docid", final.alias("score"))
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def boosting_sql(
    path: str, positive: str, negative: str,
    negative_boost: float = 0.5, k: int = 10,
) -> str:
    """DuckDB oracle for boosting_df: (docid BIGINT, score_r DOUBLE)."""
    from .sqloracle import _match_sql

    astp, dqlf = extract_filters(parse(positive), positive)
    astn, dqlfn = extract_filters(parse(negative), negative)
    if any(v for v in dqlf.values()) or any(v for v in dqlfn.values()):
        raise NotImplementedError("boosting with DQL filters")
    leaves = _collect_leaves(astp)
    for lf in _collect_leaves(astn):
        if lf not in leaves:
            leaves.append(lf)
    nb = float(negative_boost)
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
cpos AS ({_combine_sql(astp, leaves)}),
mneg AS ({_match_sql(astn, leaves)})
SELECT docid, round(CAST(score AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid,
         CASE WHEN c.docid IN (SELECT docid FROM mneg)
              THEN CAST(CAST(c.s AS DOUBLE) * {nb!r} AS FLOAT)
              ELSE c.s END AS score
  FROM cpos c
  ORDER BY score DESC, c.docid ASC
  LIMIT {k}
)"""


# ---------------------------------------------------------------------------
# constant_score

def constant_score_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    boost: float = 1.0,
) -> DataFrame:
    """OpenSearch ``constant_score``: filter-context evaluation — every
    matching doc scores exactly ``boost`` (Lucene ConstantScoreQuery; no
    BM25, no idf/tf).  The reference's dashboards use this shape for
    pure-filter panels where ranking noise is unwanted.

    Spark-first: the match set is posting-set algebra
    (``match_docids_df`` — joins/anti-joins, no scoring columns ever
    materialize), the score a literal.  With all scores equal the
    (score desc, docid asc) tie-break degenerates to the first ``k``
    docids of the match set, so the page is a TakeOrdered on docid —
    no score sort at all."""
    from .search import match_docids_df

    matched = match_docids_df(spark, index_dir, query)
    score = F.round(F.lit(float(boost)).cast("float").cast("double"), 3)
    return (
        matched.select("docid", score.alias("score_r"))
        .orderBy(F.col("docid").asc())
        .limit(k)
    )


def constant_score_sql(
    path: str, query: str, k: int = 10, boost: float = 1.0
) -> str:
    """DuckDB oracle for constant_score_df: (docid BIGINT, score_r DOUBLE)."""
    from .sqloracle import _filters_sql, _match_sql

    ast, dqlf = extract_filters(parse(query), query)
    leaves = _collect_leaves(ast)
    fsql = _filters_sql(dqlf)
    b = float(boost)
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
m AS (SELECT docid FROM ({_match_sql(ast, leaves)}) _m)
SELECT m.docid, round(CAST(CAST({b!r} AS FLOAT) AS DOUBLE), 3) AS score_r
FROM m JOIN d USING (docid){fsql}
ORDER BY m.docid ASC
LIMIT {k}"""


# ---------------------------------------------------------------------------
# distance_feature

def distance_feature_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    *,
    origin: str,
    pivot_seconds: float,
    boost: float = 1.0,
    session=None,
    **filt,
) -> DataFrame:
    """OpenSearch ``distance_feature`` on the ts field: recency boosting
    as an ADDITIVE should-clause — ``score + boost * pivot /
    (pivot + |ts - origin|)`` (the Lucene LongDistanceFeatureQuery
    saturation curve), unlike function_score's multiplicative decay.
    The investigation shape: "same relevance query, but surface recent
    turns first when scores tie".

    Frozen numeric contract (mirrored textually by the SQL oracle):
    distances in float64 epoch SECONDS (``pivot_seconds`` likewise —
    OpenSearch's date-math pivot pre-converted by the caller), the sum
    cast to float32 once, rank (score desc, docid asc).

    Plan: full scored match set (no sort) + docid equi-join with the
    docs projection (ts only) + one JVM column expression + TakeOrdered
    page — identical shape to function_score, one exchange beyond the
    base query."""
    import os

    if session is not None:
        base = session.search(query, k=None, **filt)
        if session.docs is not None and "ts" in session.docs.columns:
            docs = session.docs.select("docid", "ts")
        else:
            docs = spark.read.parquet(os.path.join(index_dir, "docs")).select("docid", "ts")
    else:
        base = search_df(spark, index_dir, query, k=None, **filt)
        docs = spark.read.parquet(os.path.join(index_dir, "docs")).select("docid", "ts")
    o = ts_epoch(origin)
    p = float(pivot_seconds)
    b = float(boost)
    contrib = F.lit(b) * F.lit(p) / (
        F.lit(p) + F.abs(F.col("ts").cast("double") - F.lit(o))
    )
    final = (F.col("score").cast("double") + contrib).cast("float")
    out = base.join(docs, "docid").select("docid", final.alias("score"))
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def distance_feature_sql(
    path: str,
    query: str,
    k: int = 10,
    *,
    origin: str,
    pivot_seconds: float,
    boost: float = 1.0,
    **kwargs,
) -> str:
    """DuckDB oracle for distance_feature_df: (docid BIGINT, score_r DOUBLE)."""
    ast, dqlf = extract_filters(parse(query), query)
    filt = merge_filters(query, dict(kwargs), dqlf)
    leaves = _collect_leaves(ast)
    fsql = _filters_sql(filt)
    o = ts_epoch(origin)
    p = float(pivot_seconds)
    b = float(boost)
    contrib = f"{b!r} * {p!r} / ({p!r} + abs(epoch(d.ts) - {o!r}))"
    return f"""WITH RECURSIVE {_base_ctes(path)},
{_leaf_ctes(leaves)},
combined AS ({_combine_sql(ast, leaves)})
SELECT docid, round(CAST(score AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid,
         CAST(CAST(c.s AS DOUBLE) + {contrib} AS FLOAT) AS score
  FROM combined c JOIN d USING (docid){fsql}
  ORDER BY score DESC, c.docid ASC
  LIMIT {k}
)"""


def ids_query_df(spark: SparkSession, index_dir: str, ids: list[int]) -> DataFrame:
    """OpenSearch ``ids`` query: constant-score fetch of explicit docids
    (Lucene TermInSetQuery over _id).  A pushdown-friendly IN predicate on
    the docid-sorted docs parquet — row-group pruning keeps the scan
    O(touched groups) at corpus scale.  Rows ordered by docid; score is
    the constant 1.0 every non-scoring filter context yields."""
    if not ids:
        raise ValueError("ids query: empty id list")
    docs = spark.read.parquet(f"{index_dir}/docs")
    return (
        docs.filter(F.col("docid").isin([int(i) for i in ids]))
        .select(
            "docid", "role", "tool", "ts",
            F.lit(1.0).cast("float").alias("score"),
        )
        .orderBy("docid")
    )


def pinned_query_df(
    spark: SparkSession,
    index_dir: str,
    pinned_ids: list[int],
    organic_query: str,
    k: int = 10,
) -> DataFrame:
    """OpenSearch ``pinned`` query: the given ids rank first IN THE GIVEN
    ORDER (whether or not they match), then organic hits with pinned ids
    removed, filling to ``k`` total.  Output (docid, rnk, pinned).

    Frozen determinism contract: organic order is (round-3 score desc,
    docid asc) — the engine's float32 scores could permute round-3 ties
    relative to any oracle, so BOTH sides rank on the rounded value (the
    cross-engine rank rule from the RRF operator).  All window ops run
    over <= k + |pinned| rows."""
    if not pinned_ids:
        raise ValueError("pinned query: empty pinned list")
    npin = len(pinned_ids)
    if npin >= k:
        raise ValueError(f"pinned query: need k > |pinned| ({npin})")
    from pyspark.sql.window import Window

    pinned = spark.createDataFrame(
        [(int(d), i + 1) for i, d in enumerate(pinned_ids)], "docid long, rnk long"
    )
    organic = search_df(spark, index_dir, organic_query, k=k + npin).select(
        "docid", F.round(F.col("score").cast("double"), 3).alias("score_r")
    )
    org = organic.join(pinned.select("docid"), "docid", "left_anti")
    w = Window.orderBy(F.col("score_r").desc(), F.col("docid").asc())
    org = (
        org.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k - npin)
        .select("docid", (F.col("__r") + npin).cast("long").alias("rnk"))
    )
    out = pinned.select("docid", "rnk", F.lit(True).alias("pinned")).unionByName(
        org.select("docid", "rnk", F.lit(False).alias("pinned"))
    )
    return out.orderBy("rnk")


def pinned_query_sql(
    organic_sql: str, pinned_ids: list[int], k: int
) -> str:
    """DuckDB replay of pinned_query_df given the organic top-(k+P)
    statement (docid, score_r)."""
    npin = len(pinned_ids)
    vals = ", ".join(f"({int(d)}, {i + 1})" for i, d in enumerate(pinned_ids))
    notin = ", ".join(str(int(d)) for d in pinned_ids)
    return f"""
WITH p(docid, rnk) AS (VALUES {vals}),
organic AS (SELECT docid, score_r FROM ({organic_sql})),
org2 AS (
  SELECT docid, row_number() OVER (ORDER BY score_r DESC, docid ASC) AS r
  FROM organic WHERE docid NOT IN ({notin}))
SELECT CAST(docid AS BIGINT) AS docid, CAST(rnk AS BIGINT) AS rnk, TRUE AS pinned FROM p
UNION ALL
SELECT docid, r + {npin} AS rnk, FALSE FROM org2 WHERE r <= {int(k) - npin}
ORDER BY rnk
"""
