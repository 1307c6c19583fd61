"""SAM MD-tag parser: (md, seq) -> list of substitution variants.

Semantics match the reference's combinator grammar
(``MDParser.scala:26-118``, driven by ``Feature.scala:64-108``):

    md := matches (subOrDel matches)*
    matches  := integer            # bases identical to the reference
    sub      := [ACGTN]            # the *reference* base at a mismatch
    del      := '^' [ACGTN]+       # bases deleted from the read

Two cursors walk the read:

* ``ref``  counts reference-consuming ops (matches, subs, deletions);
* ``read`` indexes into ``seq``, the ``samtools calmd -e``-masked read
  where matched bases are ``'='`` and only mismatches/insertions show a
  real base.

A match count of *n* advances ``read`` to just past the *n*-th ``'='``,
skipping any interleaved non-'=' characters — that is how insertions
(read-only bases, invisible to the MD tag) are consumed
(``MDParser.scala:46-66, 75-87``). A deletion consumes reference only
(``MDParser.scala:112-117``). A substitution emits
``f"{pos}{read_base}"`` and advances both cursors; substitutions whose
read base is ``N`` are dropped (``MDParser.scala:97-110``). Malformed
tags raise ``MDParseError`` (``Feature.scala:105-108``).

Positions: the reference's cursors start at 0 for every read and are
never offset by the alignment start, so its variants are read-relative
— which can never match the genome-positioned LD table except for reads
aligned at position 1 (SURVEY.md §8 Q3). The intended semantics are
genome-relative; ``offset`` (the 0-based alignment start) provides
them. ``offset=0`` reproduces the reference's read-relative behavior.

The Spark surface is an Arrow-vectorized pandas UDF (pure-Python
tokenizer over series batches) — this is the one scalar function in the
engine that built-in expressions genuinely cannot express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASES = frozenset("ACGTNacgtn")


class MDParseError(ValueError):
    """Raised for MD tags that do not match the grammar."""


def parse_md(md: str, seq: str, offset: int = 0) -> list[str]:
    """Parse one MD tag against its calmd-masked read sequence.

    Returns substitution variants as ``"<1-based pos><read base>"``,
    positions offset by ``offset`` (pass the 0-based alignment start
    for genome coordinates, 0 for the reference's read-relative mode).
    """
    if md is None or seq is None:
        raise MDParseError("md/seq must not be null")
    variants: list[str] = []
    ref = 0  # reference-consuming ops seen so far
    read = 0  # cursor into seq
    i = 0
    n_md = len(md)
    while i < n_md:
        ch = md[i]
        if ch.isdigit():
            j = i
            while j < n_md and md[j].isdigit():
                j += 1
            n = int(md[i:j])
            i = j
            # advance read past the n-th '=', skipping insertion bases
            count = 0
            while count < n:
                if read >= len(seq):
                    raise MDParseError(
                        f"MD tag {md!r} overruns read of length {len(seq)}"
                    )
                if seq[read] == "=":
                    count += 1
                read += 1
            ref += n
        elif ch == "^":
            i += 1
            j = i
            while j < n_md and md[j] in _BASES:
                j += 1
            if j == i:
                raise MDParseError(f"empty deletion in MD tag {md!r}")
            ref += j - i  # deletion consumes reference only
            i = j
        elif ch in _BASES:
            if read < len(seq) and seq[read] == "=":
                # the MD tag claims a mismatch at a position calmd marked
                # as matching — malformed (md, seq) pair
                raise MDParseError(
                    f"MD tag {md!r} mismatch at matched base (read pos {read})"
                )
            if read >= len(seq):
                raise MDParseError(
                    f"MD tag {md!r} overruns read of length {len(seq)}"
                )
            read_base = seq[read].upper()
            if read_base != "N":
                variants.append(f"{offset + ref + 1}{read_base}")
            ref += 1
            read += 1
            i += 1
        else:
            raise MDParseError(f"unexpected char {ch!r} in MD tag {md!r}")
    return variants


def _md_variants(
    md: pd.Series, seq: pd.Series, offset: pd.Series
) -> pd.Series:
    out = []
    for m, s, o in zip(md, seq, offset):
        if m is None or s is None:
            out.append(None)
            continue
        out.append(parse_md(m, s, int(o) if o is not None else 0))
    return pd.Series(out)


md_variants_udf = F.pandas_udf(  # type: ignore[call-overload]
    _md_variants, T.ArrayType(T.StringType())
)
"""Column UDF: (md, seq, offset) -> array<string> of variants."""
