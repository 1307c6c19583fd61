"""Declared query registry.

``QUERIES``  maps name -> callable(spark, sf_dir) -> DataFrame (Spark plan).
``ORACLE``   maps name -> equivalent ANSI SQL for the DuckDB oracle.

Names without an ORACLE entry are non-SQL-expressible ops; the driver
records a weaker rows-only check for those (see __spark_entry__.py).
"""

from __future__ import annotations

from mitoscape_spark.queries.relational import ORACLE as _REL_ORACLE
from mitoscape_spark.queries.relational import QUERIES as _REL_QUERIES
from mitoscape_spark.queries.extensions import ORACLE as _EXT_ORACLE
from mitoscape_spark.queries.extensions import QUERIES as _EXT_QUERIES
from mitoscape_spark.queries.domain import ORACLE as _DOM_ORACLE
from mitoscape_spark.queries.domain import QUERIES as _DOM_QUERIES

QUERIES = {**_REL_QUERIES, **_EXT_QUERIES, **_DOM_QUERIES}
ORACLE = {**_REL_ORACLE, **_EXT_ORACLE, **_DOM_ORACLE}

__all__ = ["QUERIES", "ORACLE"]
