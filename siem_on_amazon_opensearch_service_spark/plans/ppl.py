"""OpenSearch PPL (Piped Processing Language) -> Spark DataFrame / DuckDB SQL.

PPL is the second query surface an OpenSearch SIEM user runs every day
(the Query Workbench / event analytics pipe syntax):

    search source=events | where value > 50 | stats count() as cnt by event_type

This module parses the command pipeline the OpenSearch SQL plugin's PPL
grammar exposes (the deterministic core: search/where/fields/eval/rename/
stats [with span() time buckets]/eventstats/parse/lookup/sort/head/dedup/
top/rare) and compiles it BOTH ways:

- ``Pipeline.to_df(spark, tables)`` — fold over DataFrame operators
  (filter/select/withColumn/groupBy/window);
- ``Pipeline.to_sql(tables)`` — a DuckDB statement with the identical
  semantics, used as the driver oracle.

Scalar expressions (where/eval) are rendered once to DIALECT-COMMON SQL
text executed verbatim by both engines (F.expr on the Spark side) — the
repo's established cross-engine exactness recipe (operators/geoagg) — so
arithmetic agrees bit for bit.  Whitelisted functions are the ones with
identical semantics in Spark and DuckDB: abs, floor, ceil, round, sqrt,
exp, ln, lower, upper, length, coalesce.

Determinism-at-scale contract (deliberately stricter than the OpenSearch
engine, which inherits index order):

- ``head`` and ``dedup`` REQUIRE an active ``sort`` — on a distributed
  engine "first N rows" of an unsorted relation is nondeterministic, so
  the compiler refuses instead of silently depending on partition order.
- ``dedup`` keeps, per key, the first row in the active sort order
  (row_number() == 1 over PARTITION BY keys) — give the sort a unique
  tiebreaker column for a total order.
- ``top``/``rare`` break count ties by field value ascending.

Scale shapes: where/eval/fields are codegen'd column expressions; stats is
one map-side-combinable hash aggregation; sort materializes only at the
pipeline edge (a global sort feeding head N is a TakeOrderedAndProject,
not a full shuffle-sort); dedup/top/rare are single window functions over
the grouped frame.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d+|\d+)
      | (?P<str>'[^']*'|"[^"]*")
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op><=|>=|!=|=|<|>|\+|-|\*|/|%|\(|\)|,|\|)
    )""",
    re.X,
)

_FUNCS = {
    "abs": 1, "floor": 1, "ceil": 1, "sqrt": 1, "exp": 1, "ln": 1,
    "lower": 1, "upper": 1, "length": 1,
    "round": 2, "coalesce": 2,
}
#: stddev/var are the SAMPLE forms in both engines (Spark stddev ==
#: stddev_samp == DuckDB stddev); their sums of squares are
#: summation-order-sensitive doubles — round via a following eval when
#: the result feeds a cross-engine hash
_AGG_FUNCS = {
    "count", "sum", "avg", "min", "max", "distinct_count", "stddev", "var",
}
_SPAN_UNITS = {"m": "minute", "h": "hour", "d": "day"}
_KEYWORDS = {
    "search", "source", "where", "fields", "eval", "rename", "stats",
    "eventstats", "parse", "lookup", "sort", "head", "dedup", "top", "rare",
    "by", "as", "and", "or", "not",
}


def _lex(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise ValueError(f"PPL: cannot tokenize at: {rest[:30]!r}")
        pos = m.end()
        for kind in ("num", "str", "name", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    toks.append(("eof", ""))
    return toks


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat_op(self, op):
        k, v = self.peek()
        if k == "op" and v == op:
            return self.next()[1]
        return None

    def expect_op(self, op):
        if self.eat_op(op) is None:
            raise ValueError(f"PPL: expected {op!r}, got {self.peek()[1]!r}")

    def kw(self, word):
        k, v = self.peek()
        if k == "name" and v.lower() == word:
            self.next()
            return True
        return False

    def expect_name(self):
        k, v = self.next()
        if k != "name":
            raise ValueError(f"PPL: expected identifier, got {v!r}")
        return v


# --------------------------------------------------------------------------
# scalar expression parsing -> dialect-common SQL text

def _expr(p: _P) -> str:
    return _or(p)


def _or(p: _P) -> str:
    left = _and(p)
    while p.kw("or"):
        left = f"({left} OR {_and(p)})"
    return left


def _and(p: _P) -> str:
    left = _not(p)
    while p.kw("and"):
        left = f"({left} AND {_not(p)})"
    return left


def _not(p: _P) -> str:
    if p.kw("not"):
        return f"(NOT {_not(p)})"
    return _cmp(p)


def _cmp(p: _P) -> str:
    left = _add(p)
    k, v = p.peek()
    if k == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
        p.next()
        right = _add(p)
        return f"({left} {'<>' if v == '!=' else v} {right})"
    return left


def _add(p: _P) -> str:
    left = _mul(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("+", "-"):
            p.next()
            left = f"({left} {v} {_mul(p)})"
        else:
            return left


def _mul(p: _P) -> str:
    left = _atom(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("*", "/", "%"):
            p.next()
            left = f"({left} {v} {_atom(p)})"
        else:
            return left


def _atom(p: _P) -> str:
    k, v = p.peek()
    if k == "op" and v == "-":  # unary minus
        p.next()
        return f"(- {_atom(p)})"
    if k == "num":
        p.next()
        return v
    if k == "str":
        p.next()
        return "'" + v[1:-1].replace("'", "''") + "'"
    if k == "op" and v == "(":
        p.next()
        inner = _expr(p)
        p.expect_op(")")
        return f"({inner})"
    if k == "name":
        name = p.next()[1]
        low = name.lower()
        if p.peek() == ("op", "("):
            if low == "like":  # SQL-infix rendering: like(f, 'pat%')
                p.next()
                target = _expr(p)
                p.expect_op(",")
                pat = _expr(p)
                p.expect_op(")")
                if not (pat.startswith("'") and pat.endswith("'")):
                    raise ValueError("PPL: like() needs a quoted pattern")
                return f"({target} LIKE {pat})"
            if low not in _FUNCS:
                raise ValueError(f"PPL: unknown function {name!r}")
            p.next()
            args = [_expr(p)]
            while p.eat_op(","):
                args.append(_expr(p))
            p.expect_op(")")
            if len(args) != _FUNCS[low]:
                raise ValueError(f"PPL: {name} takes {_FUNCS[low]} args")
            return f"{low}({', '.join(args)})"
        if low in _KEYWORDS:
            raise ValueError(f"PPL: keyword {name!r} in expression")
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"PPL: bad field name {name!r}")
        return name
    raise ValueError(f"PPL: unexpected token {v!r}")


# --------------------------------------------------------------------------
# commands

@dataclass
class Search:
    source: str


@dataclass
class Where:
    cond: str


@dataclass
class Fields:
    names: list
    minus: bool = False


@dataclass
class Eval:
    assigns: list  # [(name, sql)]


@dataclass
class Rename:
    pairs: list  # [(old, new)]


@dataclass
class Stats:
    aggs: list  # [(fn, arg|None, alias)]
    by: list  # [(sql_expr, out_name)] — plain fields have expr == name


@dataclass
class EventStats:
    aggs: list  # [(fn, arg|None, alias)] — window aggs, rows kept
    by: list  # [str]


@dataclass
class Parse:
    field: str
    regex: str
    name: str


@dataclass
class FillNull:
    value: str  # literal SQL text
    fields: list


@dataclass
class Lookup:
    table: str
    key: str          # field in the lookup table
    local: str        # matching field in the pipeline (== key when no 'as')


@dataclass
class Sort:
    keys: list  # [(field, desc)]


@dataclass
class Head:
    n: int


@dataclass
class Dedup:
    keys: list


@dataclass
class TopRare:
    n: int
    field: str
    by: list
    rare: bool


@dataclass
class Pipeline:
    source: str
    commands: list = dfield(default_factory=list)

    # -- Spark ------------------------------------------------------------
    def to_df(self, spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
        if self.source not in tables:
            raise ValueError(f"PPL: unknown source {self.source!r}")
        df = tables[self.source]
        sort: list[tuple[str, bool]] | None = None

        def sort_cols():
            return [
                F.col(f).desc() if d else F.col(f).asc() for f, d in sort
            ]

        for c in self.commands:
            if isinstance(c, Where):
                df = df.filter(F.expr(c.cond))
            elif isinstance(c, Fields):
                df = df.drop(*c.names) if c.minus else df.select(*c.names)
            elif isinstance(c, Eval):
                for name, sql in c.assigns:
                    # eval/parse must INTRODUCE names: withColumn would
                    # silently replace while the SQL side appends a
                    # duplicate column (WHERE then binds the original) —
                    # refuse the divergence instead of picking a side
                    if name in df.columns:
                        raise ValueError(
                            f"PPL: eval target {name!r} already exists; "
                            "eval/parse introduce new columns (rename or "
                            "drop the old one first)"
                        )
                    df = df.withColumn(name, F.expr(sql))
            elif isinstance(c, Rename):
                for old, new in c.pairs:
                    df = df.withColumnRenamed(old, new)
            elif isinstance(c, Stats):
                aggs = [
                    _spark_agg(fn, arg).alias(alias) for fn, arg, alias in c.aggs
                ]
                if c.by:
                    keys = [F.expr(e).alias(a) for e, a in c.by]
                    df = df.groupBy(*keys).agg(*aggs)
                else:
                    df = df.agg(*aggs)
                sort = None
            elif isinstance(c, EventStats):
                w = Window.partitionBy(*c.by)
                for fn, arg, alias in c.aggs:
                    # Spark rejects count(DISTINCT) as a window function;
                    # size(collect_set) over the same window is equivalent
                    agg = (
                        F.size(F.collect_set(arg).over(w)).cast("long")
                        if fn == "distinct_count"
                        else _spark_agg(fn, arg).over(w)
                    )
                    df = df.withColumn(alias, agg)
            elif isinstance(c, Parse):
                if c.name in df.columns:
                    raise ValueError(
                        f"PPL: parse target {c.name!r} already exists; "
                        "parse introduces a new column"
                    )
                df = df.withColumn(
                    c.name, F.expr(f"regexp_extract({c.field}, '{c.regex}', 1)")
                )
            elif isinstance(c, FillNull):
                for fld in c.fields:
                    df = df.withColumn(
                        fld, F.coalesce(F.col(fld), F.expr(c.value))
                    )
            elif isinstance(c, Lookup):
                if c.table not in tables:
                    raise ValueError(f"PPL: unknown lookup table {c.table!r}")
                lt = tables[c.table]
                # enrichment joins broadcast the lookup side — dimension
                # tables (IOC lists, geo feeds, customer dims) are small
                # next to the event stream, so no event-side shuffle
                if c.local == c.key:
                    df = df.join(F.broadcast(lt), c.key, "left")
                else:
                    df = df.join(
                        F.broadcast(lt), df[c.local] == lt[c.key], "left"
                    )
            elif isinstance(c, Sort):
                sort = c.keys
            elif isinstance(c, Head):
                if not sort:
                    raise ValueError("PPL: head requires an active sort")
                df = df.orderBy(*sort_cols()).limit(c.n)
            elif isinstance(c, Dedup):
                if not sort:
                    raise ValueError("PPL: dedup requires an active sort")
                w = Window.partitionBy(*c.keys).orderBy(*sort_cols())
                df = (
                    df.withColumn("__r", F.row_number().over(w))
                    .filter(F.col("__r") == 1)
                    .drop("__r")
                )
            elif isinstance(c, TopRare):
                g = df.groupBy(*(c.by + [c.field])).agg(F.count("*").alias("cnt"))
                order = [
                    F.col("cnt").asc() if c.rare else F.col("cnt").desc(),
                    F.col(c.field).asc(),
                ]
                w = Window.partitionBy(*c.by).orderBy(*order)
                df = (
                    g.withColumn("__r", F.row_number().over(w))
                    .filter(F.col("__r") <= c.n)
                    .drop("__r")
                )
                sort = [(b, False) for b in c.by] + [("cnt", not c.rare), (c.field, False)]
            else:
                raise TypeError(c)
        if sort:
            df = df.orderBy(*sort_cols())
        return df

    # -- DuckDB -----------------------------------------------------------
    def to_sql(self, tables: dict[str, str] | None = None) -> str:
        rel = (tables or {}).get(self.source, self.source)
        q = f"SELECT * FROM {rel}"
        sort: list[tuple[str, bool]] | None = None

        def order_by():
            return ", ".join(f"{f} {'DESC' if d else 'ASC'}" for f, d in sort)

        for c in self.commands:
            if isinstance(c, Where):
                q = f"SELECT * FROM ({q}) WHERE {c.cond}"
            elif isinstance(c, Fields):
                cols = ", ".join(c.names)
                q = (
                    f"SELECT * EXCLUDE ({cols}) FROM ({q})"
                    if c.minus
                    else f"SELECT {cols} FROM ({q})"
                )
            elif isinstance(c, Eval):
                # contract: eval targets are NEW names (to_df enforces it
                # where the schema is known; a duplicate here would make
                # WHERE bind the pre-eval column)
                adds = ", ".join(f"{sql} AS {name}" for name, sql in c.assigns)
                q = f"SELECT *, {adds} FROM ({q})"
            elif isinstance(c, Rename):
                olds = ", ".join(o for o, _ in c.pairs)
                news = ", ".join(f"{o} AS {n}" for o, n in c.pairs)
                q = f"SELECT * EXCLUDE ({olds}), {news} FROM ({q})"
            elif isinstance(c, Stats):
                aggs = ", ".join(
                    f"{_sql_agg(fn, arg)} AS {alias}" for fn, arg, alias in c.aggs
                )
                if c.by:
                    sel = ", ".join(f"{e} AS {a}" for e, a in c.by)
                    grp = ", ".join(e for e, _ in c.by)
                    q = f"SELECT {sel}, {aggs} FROM ({q}) GROUP BY {grp}"
                else:
                    q = f"SELECT {aggs} FROM ({q})"
                sort = None
            elif isinstance(c, EventStats):
                over = (
                    f"OVER (PARTITION BY {', '.join(c.by)})" if c.by else "OVER ()"
                )
                adds = ", ".join(
                    f"{_sql_agg(fn, arg)} {over} AS {alias}"
                    for fn, arg, alias in c.aggs
                )
                q = f"SELECT *, {adds} FROM ({q})"
            elif isinstance(c, Parse):
                q = (
                    f"SELECT *, regexp_extract({c.field}, '{c.regex}', 1) "
                    f"AS {c.name} FROM ({q})"
                )
            elif isinstance(c, FillNull):
                reps = ", ".join(
                    f"coalesce({fld}, {c.value}) AS {fld}" for fld in c.fields
                )
                excl = ", ".join(c.fields)
                q = f"SELECT * EXCLUDE ({excl}), {reps} FROM ({q})"
            elif isinstance(c, Lookup):
                rel = (tables or {}).get(c.table, c.table)
                if c.local == c.key:
                    q = f"SELECT * FROM ({q}) LEFT JOIN {rel} USING ({c.key})"
                else:
                    q = (
                        f"SELECT * FROM ({q}) l LEFT JOIN {rel} r "
                        f"ON l.{c.local} = r.{c.key}"
                    )
            elif isinstance(c, Sort):
                sort = c.keys
            elif isinstance(c, Head):
                if not sort:
                    raise ValueError("PPL: head requires an active sort")
                q = f"SELECT * FROM ({q}) ORDER BY {order_by()} LIMIT {c.n}"
            elif isinstance(c, Dedup):
                if not sort:
                    raise ValueError("PPL: dedup requires an active sort")
                part = ", ".join(c.keys)
                q = (
                    f"SELECT * FROM ({q}) QUALIFY row_number() OVER "
                    f"(PARTITION BY {part} ORDER BY {order_by()}) = 1"
                )
            elif isinstance(c, TopRare):
                keys = ", ".join(c.by + [c.field])
                part = f"PARTITION BY {', '.join(c.by)} " if c.by else ""
                direc = "ASC" if c.rare else "DESC"
                q = (
                    f"SELECT {keys}, cnt FROM ("
                    f"SELECT {keys}, count(*) AS cnt FROM ({q}) GROUP BY {keys}"
                    f") QUALIFY row_number() OVER ({part}ORDER BY cnt {direc}, "
                    f"{c.field} ASC) <= {c.n}"
                )
                sort = [(b, False) for b in c.by] + [("cnt", not c.rare), (c.field, False)]
            else:
                raise TypeError(c)
        if sort:
            q = f"SELECT * FROM ({q}) ORDER BY {order_by()}"
        return q


def _spark_agg(fn: str, arg: str | None):
    if fn == "count":
        return F.count(F.lit(1))
    if fn == "distinct_count":
        return F.countDistinct(arg)
    if fn == "var":
        return F.var_samp(arg)
    return getattr(F, fn)(arg)


def _sql_agg(fn: str, arg: str | None) -> str:
    if fn == "count":
        return "count(*)"
    if fn == "distinct_count":
        return f"count(DISTINCT {arg})"
    if fn == "var":
        return f"var_samp({arg})"
    return f"{fn}({arg})"


# --------------------------------------------------------------------------
# pipeline parsing

def _parse_aggs(p: _P) -> list:
    aggs = []
    i = 0
    while True:
        fn = p.expect_name().lower()
        if fn not in _AGG_FUNCS:
            raise ValueError(f"PPL: unknown agg {fn!r}")
        p.expect_op("(")
        arg = None
        if not p.eat_op(")"):
            arg = p.expect_name()
            p.expect_op(")")
        if fn != "count" and arg is None:
            raise ValueError(f"PPL: {fn} needs a field argument")
        alias = p.expect_name() if p.kw("as") else f"agg{i}"
        aggs.append((fn, arg, alias))
        i += 1
        if not p.eat_op(","):
            break
    return aggs


#: multi-span parents: unit -> (date_trunc parent grain, INTERVAL unit,
#: sub-field extractor, parent modulus).  A span of n units is rendered
#: date_trunc(parent) + INTERVAL n UNIT * floor(sub/n) — ONE
#: dialect-common string (verified value-identical Spark vs DuckDB).
#: Valid only when n divides the parent modulus: then within-parent
#: anchoring equals OpenSearch fixed_interval's epoch anchoring.
_SPAN_PARENTS = {
    "m": ("hour", "MINUTE", "minute", 60),
    "h": ("day", "HOUR", "hour", 24),
}


def _parse_by_item(p: _P) -> tuple[str, str]:
    """A stats by-item: a plain field, or ``span(field, n unit)`` time
    bucketing (PPL's date_histogram-in-the-pipe).  n=1 uses the
    date_trunc grains both engines share (1m/1h/1d); n>1 uses the
    dialect-common date_trunc(parent) + INTERVAL arithmetic and requires
    n to divide the parent grain (5m, 15m, 6h, ... — equal to
    epoch-anchored fixed_interval buckets by the divisibility argument).
    n>1 days is refused: epoch-day arithmetic has no dialect-common
    rendering (Spark datediff vs DuckDB date_diff signatures diverge)."""
    name = p.expect_name()
    if name.lower() == "span":
        p.expect_op("(")
        fld = p.expect_name()
        p.expect_op(",")
        k, v = p.next()
        if k != "num" or not v.isdigit() or int(v) < 1:
            raise ValueError(f"PPL: span needs a positive integer count, got {v!r}")
        n = int(v)
        unit = p.expect_name().lower()
        if unit not in _SPAN_UNITS:
            raise ValueError(f"PPL: unknown span unit {unit!r}")
        p.expect_op(")")
        if n == 1:
            return (f"date_trunc('{_SPAN_UNITS[unit]}', {fld})", f"{fld}_span")
        if unit not in _SPAN_PARENTS:
            raise ValueError(
                "PPL: multi-unit spans support m/h only (n>1 days would "
                "need dialect-diverging epoch-day arithmetic)"
            )
        parent, iunit, sub, mod = _SPAN_PARENTS[unit]
        if mod % n:
            raise ValueError(
                f"PPL: span count must divide {mod} for unit {unit!r} "
                f"(epoch-anchored fixed_interval equivalence), got {n}"
            )
        return (
            f"date_trunc('{parent}', {fld}) + INTERVAL '{n}' {iunit} "
            f"* cast(floor({sub}({fld}) / {n}) as int)",
            f"{fld}_span",
        )
    return (name, name)


def parse_ppl(text: str) -> Pipeline:
    p = _P(_lex(text))
    p.kw("search")  # optional leading 'search'
    if not p.kw("source"):
        raise ValueError("PPL: pipeline must start with 'search source=<table>'")
    p.expect_op("=")
    pipe = Pipeline(source=p.expect_name())
    while p.eat_op("|"):
        cmd = p.expect_name().lower()
        if cmd == "where":
            pipe.commands.append(Where(_expr(p)))
        elif cmd == "fields":
            minus = bool(p.eat_op("-"))
            if not minus:
                p.eat_op("+")
            names = [p.expect_name()]
            while p.eat_op(","):
                names.append(p.expect_name())
            pipe.commands.append(Fields(names, minus))
        elif cmd == "eval":
            assigns = []
            while True:
                name = p.expect_name()
                p.expect_op("=")
                assigns.append((name, _expr(p)))
                if not p.eat_op(","):
                    break
            pipe.commands.append(Eval(assigns))
        elif cmd == "rename":
            pairs = []
            while True:
                old = p.expect_name()
                if not p.kw("as"):
                    raise ValueError("PPL: rename needs 'old as new'")
                pairs.append((old, p.expect_name()))
                if not p.eat_op(","):
                    break
            pipe.commands.append(Rename(pairs))
        elif cmd in ("stats", "eventstats"):
            aggs = _parse_aggs(p)
            by = []
            if p.kw("by"):
                by.append(_parse_by_item(p))
                while p.eat_op(","):
                    by.append(_parse_by_item(p))
            if cmd == "stats":
                pipe.commands.append(Stats(aggs, by))
            else:
                if any(e != a for e, a in by):
                    raise ValueError("PPL: eventstats by takes plain fields")
                pipe.commands.append(EventStats(aggs, [a for _, a in by]))
        elif cmd == "fillnull":
            if not p.kw("with"):
                raise ValueError("PPL: fillnull syntax is 'fillnull with <value> in f1, f2'")
            k, v = p.next()
            if k == "num":
                val = v
            elif k == "str":
                val = "'" + v[1:-1].replace("'", "''") + "'"
            elif k == "op" and v == "-" and p.peek()[0] == "num":
                val = "-" + p.next()[1]
            else:
                raise ValueError("PPL: fillnull needs a literal value")
            if not p.kw("in"):
                raise ValueError("PPL: fillnull syntax is 'fillnull with <value> in f1, f2'")
            flds = [p.expect_name()]
            while p.eat_op(","):
                flds.append(p.expect_name())
            pipe.commands.append(FillNull(val, flds))
        elif cmd == "lookup":
            table = p.expect_name()
            key = p.expect_name()
            local = p.expect_name() if p.kw("as") else key
            pipe.commands.append(Lookup(table, key, local))
        elif cmd == "parse":
            fld = p.expect_name()
            k, v = p.next()
            if k != "str":
                raise ValueError("PPL: parse needs a quoted regex")
            regex = v[1:-1]
            if "\\" in regex or "'" in regex:
                # Spark string literals unescape backslashes, DuckDB's do
                # not — refuse the divergence instead of silently differing;
                # character classes ([0-9]+ etc.) express the same patterns
                raise ValueError(
                    "PPL: parse regex may not contain backslashes or quotes "
                    "(use character classes)"
                )
            if not p.kw("as"):
                raise ValueError("PPL: parse needs 'as <name>'")
            pipe.commands.append(Parse(fld, regex, p.expect_name()))
        elif cmd == "sort":
            keys = []
            while True:
                desc = bool(p.eat_op("-"))
                if not desc:
                    p.eat_op("+")
                keys.append((p.expect_name(), desc))
                if not p.eat_op(","):
                    break
            pipe.commands.append(Sort(keys))
        elif cmd == "head":
            k, v = p.next()
            if k != "num" or "." in v:
                raise ValueError("PPL: head needs an integer")
            pipe.commands.append(Head(int(v)))
        elif cmd == "dedup":
            keys = [p.expect_name()]
            while p.eat_op(","):
                keys.append(p.expect_name())
            pipe.commands.append(Dedup(keys))
        elif cmd in ("top", "rare"):
            k, v = p.peek()
            n = 10
            if k == "num":
                p.next()
                n = int(v)
            fld = p.expect_name()
            by = []
            if p.kw("by"):
                by.append(p.expect_name())
                while p.eat_op(","):
                    by.append(p.expect_name())
            pipe.commands.append(TopRare(n, fld, by, rare=(cmd == "rare")))
        else:
            raise ValueError(f"PPL: unknown command {cmd!r}")
    if p.peek()[0] != "eof":
        raise ValueError(f"PPL: trailing input at {p.peek()[1]!r}")
    return pipe
