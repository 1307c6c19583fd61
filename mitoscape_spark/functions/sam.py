"""SAM attribute-string helpers (reference ``Feature.scala:80-96``).

The reference splits the whole tag string on whitespace then ':' into a
map and probes NM/NH/XQ with defaults. Expressed here as JVM-side
``regexp_extract`` + ``coalesce`` — stays inside whole-stage codegen,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def attr_int(attributes: Column | str, tag: str, default: int) -> Column:
    """Extract an integer SAM tag (``"NM:i:3"``) with a default.

    Defaults per ``Feature.scala:122-124``: NM→0, NH→1, XQ→0.
    """
    col = F.col(attributes) if isinstance(attributes, str) else attributes
    hit = F.regexp_extract(col, rf"(?:^|\s){tag}:i:(-?\d+)", 1)
    return (
        F.when(hit == "", F.lit(default)).otherwise(hit.cast("int"))
    ).alias(tag.lower())
