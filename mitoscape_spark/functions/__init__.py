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


def register_sql_functions(spark) -> None:
    """Expose the engine's Python functions to the SQL frontend:
    ``SELECT md_variants(md, seq, start) FROM aligns`` works after this.

    Registration carries the same execution profile as the DataFrame
    form (Arrow-vectorized pandas UDF — one registration, both APIs);
    the JVM-expressible helpers (cosine etc.) are deliberately NOT
    registered as UDFs: in SQL they exist as higher-order-function
    expressions already (aggregate/transform), which stay codegen'd.
    """
    spark.udf.register("md_variants", md_variants_udf)
