from .query import And, Node, Not, Or, Phrase, Term, parse  # noqa: F401
