"""Scalar/array helper functions: MD-tag parsing, SAM attributes, vector math."""

from mitoscape_spark.functions.md_parser import md_variants_udf, parse_md
from mitoscape_spark.functions.sam import attr_int
from mitoscape_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "md_variants_udf",
    "parse_md",
    "attr_int",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
