"""Boolean/phrase query language -> AST.

Mirrors the query surface the reference actually exposes through OpenSearch
Dashboards saved objects: DQL term queries, bool must/should/must_not, and
match_phrase (SURVEY.md §2.3; /root/reference/source/saved_objects/
each-dashboard/*.ndjson ``searchSourceJSON``).  Grammar:

    expr    := or
    or      := and (OR and)*
    and     := unary (AND unary)*
    unary   := NOT unary | atom
    atom    := '(' expr ')' | '"' phrase words '"' | word

Scoring semantics (Lucene bool): the document score is the float64 sum of
the float32 scores of the *matching* positive clauses, rounded to float32;
AND requires all operands, OR requires at least one, NOT filters without
contributing score.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions.analysis import tokenize


class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    term: str


@dataclass(frozen=True)
class Phrase(Node):
    terms: tuple[str, ...]


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Not(Node):
    child: Node


_TOKEN_PAT = re.compile(r'\(|\)|"[^"]*"|[^\s()]+')


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

    def parse_atom() -> Node:
        t = take()
        if t.upper() in ("AND", "OR", "NOT"):
            # a bare operator would otherwise lowercase into a term —
            # surprising ('AND' silently searching for 'and'); reject
            raise ValueError(f"operator {t!r} where a term was expected in {query!r}")
        if t == "(":
            node = parse_or()
            if peek() != ")":
                raise ValueError(f"missing ')' in {query!r}")
            take()
            return node
        if t.startswith('"'):
            words = tokenize(t.strip('"'))
            if not words:
                raise ValueError(f"empty phrase in {query!r}")
            if len(words) == 1:
                return Term(words[0])
            return Phrase(tuple(words))
        analyzed = tokenize(t)
        if len(analyzed) != 1:
            raise ValueError(f"bad term {t!r} in {query!r}")
        return Term(analyzed[0])

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {query!r}")
    return node


def query_terms(node: Node) -> list[str]:
    """All distinct terms referenced by a query, in first-appearance order."""
    out: list[str] = []

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            if n.term not in out:
                out.append(n.term)
        elif isinstance(n, Phrase):
            for t in n.terms:
                if t not in out:
                    out.append(t)
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return out
