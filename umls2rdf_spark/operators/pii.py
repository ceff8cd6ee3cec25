"""PII scrubbing: redact emails / IPv4 addresses / SSN-shaped ids /
phone numbers from a text corpus and count what was removed — the
standard pre-release step every published training-data pipeline runs
(BigScience/ROOTS and StarCoder both ship exactly this email/IP/id
regex pass).

Relation to ``textstats.scrub_text`` (C15): that is the lightweight
in-pipeline noise scrub (email/URL/phone to placeholders, no
accounting) used inside corpus_prep and the streaming intake; THIS
operator is the auditable release-gate form — per-document removal
counts per category, order-analyzed patterns (no cross-category
double-redaction), idempotence pinned, and an oracle generated from
the same constants so the redacted bytes are value-verified.

Spark-first shape: the whole scrub is ONE select of chained
``regexp_count`` / ``regexp_replace`` Column expressions — JVM-side,
stateless per row, zero shuffle — so it fuses into the same scan as
the quality/dedup operators (the htmlextract.py discipline). The
DuckDB twin is GENERATED from the same ``PII_STAGES`` constants
(:func:`pii_scrub_sql`), so redaction output and counts are
value-verified byte-for-byte per document.

Dialect parity, stated precisely: every pattern below is valid and
equivalent in Java regex (Spark) and RE2 (DuckDB) — no lookaround, no
backreferences, ``\\b`` is the ASCII word boundary and ``\\d`` is
``[0-9]`` in both. Stages apply IN ORDER and each stage's count is
taken on the text AFTER the earlier stages replaced (sequential
semantics): email first so address digits can't feed the phone rule,
IPv4 before phone because a dotted quad's first three octets would
otherwise match the separator-structured phone pattern, SSN before
phone for the same reason. Placeholders contain no digits or ``@`` so
they are inert to later stages.

The phone pattern deliberately requires SEPARATOR-structured digit
groups (``\\+?\\(?\\d{2,4}\\)?[ .-]\\d{3,4}[ .-]\\d{3,5}\\b``):
ISO dates (2026-08-15), semantic versions (1.2.3) and formatted
prices (1,000.00) do NOT match — pinned by tests. That is the usual
precision/recall trade for regex PII (a bare 10-digit run is left
alone); the contract is deterministic and documented, not exhaustive.

100 TB: pure map over the scan — no shuffle, no state, perfectly
partition-parallel; counts aggregate map-side if rolled up. Run it
AFTER dedup (so near-dup clustering sees original bytes) and BEFORE
packing/export, which is where the published pipelines place it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, Java∩RE2 pattern, placeholder) — applied IN ORDER; see the
#: module docstring for why the order is load-bearing.
PII_STAGES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\(?\d{2,4}\)?[ .-]\d{3,4}[ .-]\d{3,5}\b", "<PHONE>"),
)


def pii_count_columns(text_col: str) -> tuple[list[Column], Column]:
    """(count columns, scrubbed-text column) — the expr-level form so
    other single-scan selects (operators/reporting.py) can fuse the
    PII pass with their own columns. Counts are SEQUENTIAL (each
    stage counts on the text after earlier stages replaced)."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, rep in PII_STAGES:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, rep)
    return counts, cur


def pii_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "clean",
) -> DataFrame:
    """(id, clean, n_email, n_ipv4, n_ssn, n_phone) — redacted text
    plus per-document removal counts, in one zero-shuffle select."""
    counts, cur = pii_count_columns(text_col)
    return df.select(F.col(id_col), cur.alias(out_col), *counts)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def pii_scrub_sql(
    table_sql: str,
    id_col: str,
    text_expr: str,
    out_col: str = "clean",
) -> str:
    """DuckDB twin of :func:`pii_scrub`, generated from the same
    ``PII_STAGES`` (sequential counts included; ``'g'`` flag supplies
    Spark's global-replace default)."""
    cur = text_expr
    counts = []
    for name, pat, rep in PII_STAGES:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, {_q(pat)})) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, {_q(pat)}, {_q(rep)}, 'g')"
    counts_sql = ",\n       ".join(counts)
    return f"""
SELECT {id_col},
       {cur} AS {out_col},
       {counts_sql}
FROM ({table_sql}) AS __pii_src
"""
