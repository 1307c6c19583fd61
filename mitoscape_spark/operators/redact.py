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


# 13–19 digits with optional single space/dash separators, word-bounded.
# A >19-digit run matches NOTHING (no interior \b) — same semantics in
# Java regex and RE2, both of which only accept a match ending at the
# run's end.
CC_CANDIDATE = r"\b(?:\d[ -]?){12,18}\d\b"


def luhn_valid_expr(c: Column) -> Column:
    """True iff ``c`` (a CC-shaped candidate string, separators
    allowed) passes the Luhn checksum — entirely JVM-side higher-order
    functions, no Python boundary. Restated verbatim in the DuckDB
    oracle (1-based lambda index there ⇒ double on even positions;
    0-based here ⇒ double on odd)."""
    digits = F.split(F.reverse(F.regexp_replace(c, "[ -]", "")), "")
    vals = F.transform(
        digits,
        lambda ch, i: F.when(
            i % 2 == 1,
            F.when(
                ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9
            ).otherwise(ch.cast("int") * 2),
        ).otherwise(ch.cast("int")),
    )
    return F.aggregate(vals, F.lit(0), lambda acc, x: acc + x) % 10 == 0


def redact_credit_cards(
    docs: DataFrame, text_col: str = "text", out_col: str = "cc_redacted"
) -> DataFrame:
    """Replace Luhn-VALID card-shaped digit runs with ``<CC>``; leave
    invalid ones (order ids, timestamps) untouched — the checksum gate
    is what keeps false-positive redaction off training text, which a
    bare digit-run regex cannot do.

    Plan shape: extract candidates (regexp_extract_all), filter by the
    Luhn expression, fold literal replaces over the survivors
    (``aggregate`` + ``replace``) — one narrow scan, zero shuffles,
    zero Python. Adds ``n_cc_candidates`` / ``n_cc`` audit columns.
    Note ``replace`` is literal: a validated candidate string occurring
    elsewhere in the row's text is redacted there too (documented,
    matched by the oracle's identical fold)."""
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(CC_CANDIDATE), 0
    )
    valid = F.filter(cands, luhn_valid_expr)
    redacted = F.aggregate(
        valid,
        F.col(text_col),
        lambda acc, x: F.replace(acc, x, F.lit("<CC>")),
    )
    return (
        docs.withColumn("n_cc_candidates", F.size(cands))
        .withColumn("n_cc", F.size(valid))
        .withColumn(out_col, redacted)
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
