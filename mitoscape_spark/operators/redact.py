"""PII redaction and text normalization for training corpora.

Standard pre-training hygiene: strip emails / URLs / phone numbers and
canonicalize whitespace before dedup and tokenization. Everything here
is JVM-side ``regexp_replace`` / ``regexp_count`` column expressions —
no Python boundary, evaluated inside the scan stage (narrow, shuffle-
free, whole-stage-codegen'd), so at 100 TB it costs one regex pass per
row and composes with predicate pushdown untouched.

Pattern portability: the regexes stay within the subset Java regex
(Spark) and RE2 (DuckDB) interpret identically — character classes,
bounded repetition, alternation; no backreferences, no lookaround —
so redaction output is oracle-checkable cross-engine. ``\\s`` is
avoided in favor of an explicit ``[ \\t\\n\\r]`` class (Java's ``\\s``
includes U+000B, RE2's does not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: URLs first (a URL may embed an email-shaped userinfo),
# then emails, then phone-ish digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[A-Za-z0-9./_%?&=#-]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()-]{6,}[0-9]", "<PHONE>"),
]

_WS = r"[ \t\n\r]+"


def redact_expr(col: Column | str) -> Column:
    """Column expression applying every PII pattern in order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Add ``out_col`` with all PII patterns replaced by typed tokens."""
    return docs.withColumn(out_col, redact_expr(text_col))


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row match counts for each PII pattern — the audit side of
    redaction (which sources leak, how much). Same narrow scan shape."""
    return docs.select(
        "*",
        *[
            F.regexp_count(F.col(text_col), F.lit(p)).alias(f"n_{name}")
            for name, p, _ in PII_PATTERNS
        ],
    )


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "normalized",
    lowercase: bool = True,
) -> DataFrame:
    """Whitespace-collapse + trim (+ optional lowercase): the canonical
    form fed to shingling/minhash so cosmetic differences don't defeat
    dedup."""
    c = F.trim(F.regexp_replace(F.col(text_col), _WS, " "))
    if lowercase:
        c = F.lower(c)
    return docs.withColumn(out_col, c)
