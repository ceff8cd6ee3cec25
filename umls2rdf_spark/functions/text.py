"""Text/RDF literal functions — JVM-side Column expressions only.

Re-expresses the reference's Python string helpers (escape,
turtle_string, get_url_term at umls2rdf.py:103-129) as Catalyst
expressions so they run inside whole-stage codegen, not per-row
Python. At 100 TB these run on every emitted triple — they must never
leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rdf_escape(col: Column) -> Column:
    r"""Turtle string escape: ``\`` → ``\\`` then ``"`` → ``\"``.

    Mirrors umls2rdf.py:103 ``escape()``; order matters (backslashes
    first) exactly as in the reference.
    """
    backslashed = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    return F.replace(backslashed, F.lit('"'), F.lit('\\"'))


def turtle_literal(
    col: Column, lang: Column | None = None, datatype: str | None = None
) -> Column:
    """Render a Turtle literal (umls2rdf.py:106 ``turtle_string``):
    triple-quoted iff the value contains a newline, then an optional
    ``@lang`` or ``^^datatype`` suffix.
    """
    esc = rdf_escape(col)
    quoted = F.when(
        esc.contains("\n"), F.concat(F.lit('"""'), esc, F.lit('"""'))
    ).otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    if lang is not None:
        return F.concat(quoted, F.lit("@"), lang)
    if datatype is not None:
        return F.concat(quoted, F.lit("^^"), F.lit(datatype))
    return quoted


def url_term(ns: Column | str, code: Column) -> Column:
    """``get_url_term`` (umls2rdf.py:124): join namespace and
    percent-quoted code with exactly one '/'.

    Quoting matches ``urllib.parse.quote(code)`` (safe='/') byte-for-
    byte, including ':', ',', parens, '=', '@' and UTF-8 non-ASCII:
    ``url_encode`` produces application/x-www-form-urlencoded (UTF-8,
    uppercase hex); the four fixups map that onto quote()'s RFC-3986
    behavior ('+' means space there; '*' must be escaped; '~' and '/'
    must not). Literal '%', '~' or '/' in the input cannot collide
    with the fixup patterns because url_encode has already escaped
    them ('%' → '%25', so an input "%2F" arrives here as "%252F").
    All JVM-side, codegen-friendly.
    """
    ns_col = F.lit(ns) if isinstance(ns, str) else ns
    quoted = F.url_encode(code)
    quoted = F.replace(quoted, F.lit("+"), F.lit("%20"))
    quoted = F.replace(quoted, F.lit("*"), F.lit("%2A"))
    quoted = F.replace(quoted, F.lit("%7E"), F.lit("~"))
    quoted = F.replace(quoted, F.lit("%2F"), F.lit("/"))
    sep = F.when(ns_col.endswith("/"), F.lit("")).otherwise(F.lit("/"))
    return F.concat(ns_col, sep, quoted)


# Reference dict at umls2rdf.py:92 — UMLS 3-letter LAT → BCP47-ish tag.
UMLS_LANGCODE_MAP = {
    "eng": "en", "fre": "fr", "cze": "cz", "fin": "fi", "ger": "de",
    "ita": "it", "jpn": "jp", "pol": "pl", "por": "pt", "rus": "ru",
    "spa": "es", "swe": "sw", "scr": "hr", "dut": "nl", "lav": "lv",
    "hun": "hu", "kor": "kr", "dan": "da", "nor": "no", "heb": "he",
    "baq": "eu",
}


def lang_tag(col: Column) -> Column:
    """Literal-map lookup (dict at umls2rdf.py:92) as a Catalyst
    expression — a broadcast-free dimension lookup."""
    pairs: list[Column] = []
    for k, v in UMLS_LANGCODE_MAP.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.element_at(F.create_map(*pairs), F.lower(col))
