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
