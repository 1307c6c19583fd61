"""MD-tag parser unit vectors (FIXTURES.md §'MD-tag parser unit-test
vectors' + SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from mitoscape_spark.functions.md_parser import MDParseError, parse_md


@pytest.mark.parametrize(
    ("md", "seq", "expected"),
    [
        ("10", "==========", []),
        ("4A5", "====A=====", ["5A"]),
        ("2G4T2", "==T====C==", ["3T", "8C"]),
        ("4C5", "====N=====", []),  # N substitution dropped
        ("3^AC6", "=========", []),  # deletion consumes reference only
        # insertion 'AC' inside the first 5 matches: counts skip non-'='
        ("5A4", "==AC===T====", ["6T"]),
        ("0A9", "C=========", ["1C"]),
        # adjacent substitutions separated by 0-count
        ("1A0C1", "=GT=", ["2G", "3T"]),
    ],
)
def test_read_relative(md, seq, expected):
    assert parse_md(md, seq) == expected


def test_genome_offset():
    # alignment start 100 (1-based) → offset 99: intended genome-relative
    # positions (SURVEY.md §8 Q3); offset 0 reproduces the reference.
    assert parse_md("4A5", "====A=====", offset=99) == ["104A"]
    assert parse_md("4A5", "====A=====", offset=0) == ["5A"]


@pytest.mark.parametrize(
    ("md", "seq"),
    [
        ("3X9", "============"),  # invalid sub base
        ("99", "===="),  # count overruns read
        ("3^", "===="),  # empty deletion
        ("1A1", "==="),  # sub claimed at matched base
    ],
)
def test_malformed_raises(md, seq):
    with pytest.raises(MDParseError):
        parse_md(md, seq)


def test_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from mitoscape_spark.functions.md_parser import md_variants_udf

    df = spark.createDataFrame(
        [("r1", "4A5", "====A=====", 0), ("r2", "10", "==========", 99)],
        ["read", "md", "seq", "offset"],
    )
    out = (
        df.select(
            "read",
            md_variants_udf(F.col("md"), F.col("seq"), F.col("offset")).alias("v"),
        )
        .orderBy("read")
        .collect()
    )
    assert out[0].v == ["5A"]
    assert out[1].v == []


# ---- property test: model-generate (md, seq, expected), invert ------
from hypothesis import given, settings
from hypothesis import strategies as st

_B = "ACGT"

_match_seg = st.tuples(
    st.integers(min_value=1, max_value=8),  # '=' count
    st.lists(st.sampled_from(_B), max_size=3),  # insertion bases
)
_event = st.one_of(
    st.tuples(st.just("sub"), st.sampled_from(_B + "N")),
    st.tuples(st.just("del"), st.lists(st.sampled_from(_B), min_size=1, max_size=3)),
)


@settings(max_examples=200, deadline=None)
@given(
    lead=_match_seg,
    body=st.lists(st.tuples(_event, _match_seg), max_size=5),
    offset=st.integers(min_value=0, max_value=16000),
)
def test_parse_md_inverts_generated_model(lead, body, offset):
    """Build (md, seq) from a random alignment model — matches with
    embedded insertions, substitutions (incl. dropped N), deletions —
    and check the parser emits exactly the modeled variants."""
    md_parts: list[str] = []
    seq_parts: list[str] = []
    expected: list[str] = []
    ref = 0

    def emit_match(seg):
        nonlocal ref
        n, ins = seg
        # insertions sit before the '='s; the parser must skip them
        # while counting matches
        seq_parts.append("".join(ins) + "=" * n)
        md_parts.append(str(n))
        ref += n

    emit_match(lead)
    for (kind, payload), seg in body:
        if kind == "sub":
            read_base = payload
            ref_base = "A" if read_base != "A" else "C"  # any non-equal ref
            md_parts.append(ref_base)
            seq_parts.append(read_base)
            if read_base != "N":
                expected.append(f"{offset + ref + 1}{read_base}")
            ref += 1
        else:
            md_parts.append("^" + "".join(payload))
            ref += len(payload)
        emit_match(seg)

    assert parse_md("".join(md_parts), "".join(seq_parts), offset) == expected


def test_md_variants_available_from_sql(spark):
    """The SQL frontend can call the registered pandas UDF."""
    from mitoscape_spark.functions import register_sql_functions

    register_sql_functions(spark)
    spark.createDataFrame(
        [("10A5", "==========A=====", 0)], "md string, seq string, off long"
    ).createOrReplaceTempView("md_smoke")
    row = spark.sql(
        "SELECT md_variants(md, seq, off) AS v FROM md_smoke"
    ).head()
    assert row.v == ["11A"]
