"""Text normalization — the ftfy-style cleanup stage every published
pipeline runs before tokenization (C4 strips control characters;
ROOTS/ftfy fix UTF-8-as-Latin-1 mojibake; everything collapses
whitespace): fix the classic double-encoding sequences, strip control
and zero-width/bidi characters, normalize exotic spaces, and collapse
whitespace runs — with a PER-STAGE removal count so the cleanup is
auditable (the pii.py release-gate discipline, not a silent rewrite).

Engine parity, stated precisely:

- MOJIBAKE is a fixed literal-pair table (``MOJIBAKE_PAIRS``) applied
  by chained ``replace()`` — no regex at all; counts come from the
  length-delta identity ``(len(before) - len(replace(before, bad,
  ''))) div len(bad)`` (Spark ``length`` and DuckDB ``length`` both
  count code points). Pairs are ordered LONGEST-PREFIX-FIRST: the
  bare ``â€`` remainder pair applies only after every three-char
  ``â€x`` sequence it prefixes (pinned by test).
- The regex stages use only Java∩RE2 syntax: literal char classes
  written with ``\\x{HHHH}`` code-point escapes (valid in BOTH Java
  regex and RE2 — ``\\uHHHH`` is Java-only) and bounded quantifiers;
  no lookaround, no backreferences.
- Stages apply IN ORDER and each count is taken on the text AFTER
  the earlier stages (sequential semantics, the PII convention):
  mojibake first (its pairs contain code points the control strip
  would eat), then C0/C1 control chars (which removes the stray
  U+009D of the right-double-quote artifact the bare-pair stage
  leaves), zero-width/bidi marks, NBSP-family spaces → plain space,
  space/tab runs → one space, 3+ newline runs → exactly two, and a
  final trim.

100 TB: one zero-shuffle codegen select over the scan (fuses with
the quality/dedup passes); idempotence pinned by test — running the
normalizer on its own output changes nothing, so pipeline re-runs
are safe.

Reference parity: the reference's only text transform is Turtle
escaping (/root/reference/umls2rdf.py:103-116); this exists for the
LLM-pipeline surface (SURVEY §2 C65).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (bad, good) literal pairs — classic UTF-8-read-as-cp1252 artifacts
#: (each ``bad`` is the cp1252 rendering of the good char's UTF-8
#: bytes). Ordered so no earlier pair's input is a prefix of a later
#: pair's input being needed first: the bare U+00E2 U+20AC remainder
#: comes after every three-char sequence it prefixes.
MOJIBAKE_PAIRS: tuple[tuple[str, str], ...] = (
    ("â€˜", "'"),  # U+2018 left single quote
    ("â€™", "'"),  # U+2019 right single quote
    ("â€œ", '"'),  # U+201C left double quote
    ("â€“", "-"),  # U+2013 en dash
    ("â€”", "-"),  # U+2014 em dash
    ("â€¦", "..."),  # U+2026 ellipsis
    ("â€", '"'),  # U+201D remainder (its 3rd byte is the
    #                         unprintable U+009D — ctrl stage eats it)
    ("Ã©", "é"),  # é
    ("Ã¨", "è"),  # è
    ("Ã¼", "ü"),  # ü
    ("Ã¶", "ö"),  # ö
    ("Ã±", "ñ"),  # ñ
    ("Â ", " "),  # mojibake'd NBSP
)

#: (name, Java∩RE2 pattern, replacement) regex stages, applied after
#: the mojibake pairs, in order. Patterns are ASCII source text using
#: \x{...} code-point escapes — the syntax BOTH engines parse.
NORM_STAGES: tuple[tuple[str, str, str], ...] = (
    # C0 controls except \t \n, plus DEL and the C1 block
    (
        "ctrl",
        "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}"
        "\\x{007F}-\\x{009F}]",
        "",
    ),
    # zero-width chars, bidi marks, BOM
    (
        "zerowidth",
        "[\\x{200B}-\\x{200F}\\x{202A}-\\x{202E}\\x{FEFF}]",
        "",
    ),
    # NBSP-family exotic spaces -> plain space
    (
        "nbsp",
        "[\\x{00A0}\\x{2000}-\\x{200A}\\x{202F}\\x{3000}]",
        " ",
    ),
    # space/tab runs -> one space
    ("multispace", "[ \\t]{2,}", " "),
    # 3+ newlines -> exactly two (the paragraph break survives)
    ("multinewline", "\\n{3,}", "\n\n"),
)


def normalize_columns(text_col: str) -> tuple[list[Column], Column]:
    """(count columns, normalized-text column) — expr-level so other
    single-scan selects can fuse the pass (the pii_count_columns
    convention). ``n_moji`` is the total replaced-sequence count over
    all pairs; regex stages count matches sequentially."""
    cur: Column = F.col(text_col)
    moji = F.lit(0).cast("bigint")
    for bad, good in MOJIBAKE_PAIRS:
        moji = moji + (
            (
                F.length(cur)
                - F.length(F.replace(cur, F.lit(bad), F.lit("")))
            )
            / F.lit(len(bad))
        ).cast("bigint")
        cur = F.replace(cur, F.lit(bad), F.lit(good))
    counts = [moji.alias("n_moji")]
    for name, pat, rep in NORM_STAGES:
        counts.append(
            F.regexp_count(cur, F.lit(pat))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, rep)
    return counts, F.trim(cur)


def normalize_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "text_norm",
) -> DataFrame:
    """(id, text_norm, n_moji, n_ctrl, n_zerowidth, n_nbsp,
    n_multispace, n_multinewline) in one zero-shuffle select."""
    counts, cur = normalize_columns(text_col)
    return df.select(F.col(id_col), cur.alias(out_col), *counts)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_text_sql(
    table_sql: str,
    id_col: str,
    text_expr: str,
    out_col: str = "text_norm",
) -> str:
    """DuckDB twin generated from the SAME pair/stage constants, so
    the normalized bytes and every count are value-verified."""
    cur = text_expr
    moji_terms = []
    for bad, good in MOJIBAKE_PAIRS:
        moji_terms.append(
            f"CAST((length({cur}) - length(replace({cur}, {_q(bad)}, '')))"
            f" // {len(bad)} AS BIGINT)"
        )
        cur = f"replace({cur}, {_q(bad)}, {_q(good)})"
    counts = [" + ".join(moji_terms) + " AS n_moji"]
    for name, pat, rep in NORM_STAGES:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, {_q(pat)})) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, {_q(pat)}, {_q(rep)}, 'g')"
    counts_sql = ",\n       ".join(counts)
    return f"""
SELECT {id_col},
       trim({cur}) AS {out_col},
       {counts_sql}
FROM ({table_sql}) AS __norm_src
"""
