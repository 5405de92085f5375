"""Text-analysis functions for the documents table (SURVEY.md §2.8):
token counting, quality scoring, language-ID heuristic, fingerprinting.

All pure Column expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path. Each has an exact ANSI-SQL twin used by the
DuckDB oracles in queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish lexer: runs of letters, runs of digits, single non-alnum marks.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# Tiny per-language marker lexicons for the heuristic classifier.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "los"],
    "zh": ["de5", "shi4", "le5"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (BIGINT on both engines).

    Deliberately size(split(...)), NOT regexp_count(trim, '\\s+') + 1:
    the r17 A/B measured the regexp_count spelling ~50% SLOWER at sf1
    (it is RuntimeReplaceable sugar for size(regexp_extract_all(...)),
    whose java.util.regex matcher loop costs more than StringSplit) —
    see OPTIMIZATION_r17.md."""
    return F.size(F.split(F.trim(col), r"\s+")).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish regex lexer. (regexp_count is
    plan-identical sugar for this exact expression — r17 plan capture.)"""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), F.lit(0))).cast("bigint")


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(F.split(F.trim(col), r"\s+"))).cast("bigint")


def quality_score_cols(col: Column) -> dict[str, Column]:
    """Heuristic document-quality features: length, mean token length,
    type-token ratio (lexical diversity), non-alpha character ratio.
    A real pipeline thresholds on these to drop boilerplate/garbage."""
    # n_tokens/n_distinct share ONE split array here (codegen
    # subexpression elimination collapses the identical `toks`), so the
    # size(split) form is cheaper than a second regexp_count pass over
    # the text — the array is materialized for array_distinct anyway.
    toks = F.split(F.trim(col), r"\s+")
    n_chars = F.length(col).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    non_alpha = F.length(F.regexp_replace(col, r"[a-z ]", "")).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - (n_tokens - 1)) / n_tokens,  # chars excl. separators
        "type_token_ratio": n_distinct / n_tokens,
        "non_alpha_ratio": non_alpha / n_chars,
    }


def lang_id_heuristic(col: Column) -> Column:
    """Marker-word language ID: score = number of marker-word hits per
    language on the tokenized text; argmax wins, ties broken by language
    code order, zero hits → 'und'. Deterministic and SQL-expressible."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    scores = [
        (lang, sum((F.array_contains(toks, m).cast("int") for m in markers), F.lit(0)))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # reversed so earlier language codes win ties (last .when chain wins? no:
    # build with when-otherwise where first match in code order is taken)
    expr = F.when(best_score == 0, F.lit("und"))
    for lang, s in scores:
        expr = expr.when(s == best_score, F.lit(lang))
    return expr.otherwise(result)


def fingerprint(col: Column) -> Column:
    """Canonicalizing document fingerprint: md5 over lower(trim(text)) with
    whitespace runs collapsed — stable across engines (DuckDB md5 matches)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


# PII redaction: pattern list applied IN ORDER (overlapping shapes —
# SSN/card before the looser phone pattern; email before IPv4 so an
# address's host dots never half-match). Regexes stay inside the
# Java-regex ∩ RE2 common subset so the DuckDB oracle can run the
# IDENTICAL chain (pii_redact_sql) — \b, bounded repetition, character
# classes only; no lookarounds, no backreferences.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_redact(col: Column) -> Column:
    """Chained built-in regexp_replace over PII_PATTERNS — JVM-side,
    codegen'd, no Python in the hot path (the standard scrub step of a
    training-data pipeline: emails, IPv4s, US SSNs/phones, card
    numbers → typed placeholder tokens)."""
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_redact_sql(expr: str) -> str:
    """The ANSI/DuckDB twin of pii_redact over ``expr`` (DuckDB needs
    the 'g' flag for replace-all; Spark's regexp_replace is global by
    default)."""
    out = expr
    for _name, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
