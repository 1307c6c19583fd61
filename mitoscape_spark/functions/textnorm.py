"""Deterministic dedup-grade text normalization (CCNet-style).

Near-duplicate detection over raw web text under-links aggressively:
case, punctuation, digit runs ("posted 2024-01-07"), and whitespace
jitter flip shingles without changing content. The standard fix
(CCNet / Gopher preprocessing) normalizes BEFORE hashing:

    lowercase → strip punctuation → fold digits to 0 →
    collapse whitespace → trim

Everything here is a pure column expression (JVM regex engine inside
whole-stage codegen — no UDF), and every step is restatable verbatim
in ANSI-ish SQL, so normalized-text queries stay DuckDB-oracle-
checkable. Accent folding is deliberately OUT of scope: Spark has no
built-in `strip_accents`, and a `translate` table would only cover a
hand-picked alphabet while silently passing the rest — a partial
normalizer that LOOKS total is worse for dedup than none.

Relation to ``operators/redact.py::normalize_text``: that one is the
DISPLAY normalizer (lowercase + whitespace collapse only — content
preserved for readers); this one is the DEDUP normalizer (punctuation
and digits deliberately destroyed to widen match recall). Different
contracts, both oracle-checked.

No reference counterpart (alignment engine); this is the
training-corpus preprocessing primitive in front of
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_for_dedup(col: Column | str) -> Column:
    """CCNet-style normalization as one composed column expression.

    Order matters and is part of the contract (mirrored in the SQL
    oracle): punctuation is removed BEFORE digit folding so "3.14"
    folds to "000" not "0.00", and whitespace collapses LAST so
    removed-punctuation gaps merge.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"[^\w\s]|_", " ")  # punctuation → space
    c = F.regexp_replace(c, r"\d", "0")         # digit folding
    c = F.regexp_replace(c, r"\s+", " ")        # collapse whitespace
    return F.trim(c)


#: The identical pipeline as a DuckDB SQL expression template —
#: ``TEXTNORM_SQL.format(col="text")``. Kept adjacent to the Spark
#: expression so the two cannot drift silently (the oracle hash check
#: enforces agreement on every corpus).
TEXTNORM_SQL = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE("
    "LOWER({col}), '[^\\w\\s]|_', ' ', 'g'), "
    "'[0-9]', '0', 'g'), '\\s+', ' ', 'g'))"
)
