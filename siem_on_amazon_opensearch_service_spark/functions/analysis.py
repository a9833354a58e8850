"""Text analysis: the engine's frozen tokenizer.

The reference maps searchable fields as OpenSearch ``text`` with NO custom
analyzer anywhere in its templates
(/root/reference/source/lambda/deploy_es/data.ini:104 — ``@message``;
no ``"analyzer"`` key in any template), i.e. Lucene's StandardAnalyzer:
UAX#29 word boundaries + lowercase + 255-char max token length.

For the ASCII transcript corpus this engine targets, UAX#29 word breaking
reduces to: maximal runs of ``[A-Za-z0-9_]`` (underscore is ExtendNumLet and
joins words under UAX#29).  We freeze exactly that rule so that the Spark
engine, the pure-Python oracle, and the DuckDB SQL oracles tokenize
identically:

    token := lowercase(run of [A-Za-z0-9_]), runs longer than 255 chars are
    split into 255-char chunks (Lucene maxTokenLength behavior).

Also here: the reference's ingest-side big-field truncation — any field
value larger than 32,766 bytes (Lucene's max term/field size) is truncated
to 32,753 bytes + ``<<TRUNCATED>>``
(/root/reference/source/lambda/es_loader/siem/__init__.py:1123-1145).
Truncation is applied BEFORE tokenization, as the reference applies it
before handing docs to OpenSearch.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
#: same pattern for DuckDB's string_split_regex (split on the complement).
SQL_SPLIT_RE = "[^A-Za-z0-9_]+"
MAX_TOKEN_LENGTH = 255

TRUNCATE_BYTES = 32766
TRUNCATE_KEEP = 32753
TRUNCATE_MARK = "<<TRUNCATED>>"


def truncate_big_field(text: str) -> str:
    """Reference truncation rule (siem/__init__.py:1129-1145): UTF-8-safe
    trim to 32,753 bytes + marker when the field exceeds 32,766 bytes."""
    if text is None:
        return text
    raw = text.encode("utf-8")
    if len(raw) <= TRUNCATE_BYTES:
        return text
    cut = raw[:TRUNCATE_KEEP]
    # utf-8-safe: drop a partial trailing multibyte sequence
    return cut.decode("utf-8", errors="ignore") + TRUNCATE_MARK


def tokenize(text: str | None) -> list[str]:
    """Frozen analyzer: truncate -> word runs -> lowercase -> 255-char split.

    This single function defines tokenization for the whole system; the
    vectorized Spark path (pandas .str ops) and the SQL oracles must agree
    with it token-for-token (asserted in tests).
    """
    if not text:
        return []
    text = truncate_big_field(text)
    out: list[str] = []
    for run in TOKEN_RE.findall(text):
        run = run.lower()
        if len(run) <= MAX_TOKEN_LENGTH:
            out.append(run)
        else:
            out.extend(
                run[i : i + MAX_TOKEN_LENGTH]
                for i in range(0, len(run), MAX_TOKEN_LENGTH)
            )
    return out


def sql_truncate_expr(col: str) -> str:
    """SQL equivalent of truncate_big_field for ASCII text (bytes == chars)."""
    return (
        f"CASE WHEN length({col}) > {TRUNCATE_BYTES} "
        f"THEN substr({col}, 1, {TRUNCATE_KEEP}) || '{TRUNCATE_MARK}' "
        f"ELSE {col} END"
    )
