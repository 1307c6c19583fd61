"""Table catalog for the synthetic test corpus (TESTDATA.md).

One parquet file per table under an ``sf`` directory. We always load
through ``spark.read.parquet`` with the file's own schema — explicit,
no inference pass — so Catalyst's column pruning and predicate pushdown
reach the parquet scan (check with ``df.explain``: ``ReadSchema`` /
``PushedFilters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Catalog metadata cache: `spark.read.parquet` pays a driver-side file
# listing + footer schema read on every call (~0.1 s locally; a real
# metastore round-trip on a cluster). The resolved DataFrame (analyzed
# logical plan over an InMemoryFileIndex) is immutable and reusable, so
# cache it per (application, path) — exactly what a metastore-backed
# catalog does with table metadata. Scan partitioning is decided at
# physical-planning time from the current session conf, so cached
# entries still respect per-query maxPartitionBytes etc.
#
# ASSUMPTION: the parquet inputs are immutable for the lifetime of the
# application (true for the read-only test corpus; true at 100 TB for
# immutable landing-zone snapshots). Callers that rewrite a table path
# in-place must call ``invalidate_cache(path)`` (or no-arg for all) —
# otherwise the memoized InMemoryFileIndex serves stale file listings.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# Physical-layout overrides: maps a logical table to a session-catalog
# table (e.g. a bucketed rewrite produced at ingest). Queries keep
# addressing logical names via load_table; ingest/bench register the
# better layout and every downstream plan picks it up — the engine
# analog of pointing a metastore table at a re-clustered location.
_LAYOUT_OVERRIDES: dict[tuple[str, str, str], str] = {}


def register_layout_override(
    spark: SparkSession, sf_dir: str, name: str, table: str
) -> None:
    """Serve ``name`` from session-catalog ``table`` instead of parquet."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    _LAYOUT_OVERRIDES[key] = table
    _TABLE_CACHE.pop(key, None)


def layout_override(spark: SparkSession, sf_dir: str, name: str) -> str | None:
    """The overriding catalog table for (sf_dir, name), if registered."""
    return _LAYOUT_OVERRIDES.get(
        (spark.sparkContext.applicationId, sf_dir, name)
    )


def register_local_override(
    spark: SparkSession, sf_dir: str, name: str, max_rows: int = 10_000
) -> int:
    """Serve ``name`` as a driver-local relation (LocalTableScan).

    A broadcast-hash join over a parquet-backed dimension launches a
    separate one-stage JOB per query just to materialize the broadcast
    side (~26 ms fixed launch cost at any data size, PERF.md §10). Over
    a LocalTableScan, BroadcastExchange collects driver-resident rows
    directly — no job. Collecting a TINY dimension once and re-serving
    it locally is the engine analog of pinning dimension tables as
    broadcast variables at session start; at 100 TB the nation/region
    class of dims is still KB-sized, so the pattern holds unchanged.

    Refuses tables above ``max_rows`` — this is a dimension cache, not
    a result cache. Returns the row count. Layout overrides
    (``register_layout_override``) take precedence if both are set.
    """
    df = load_table(spark, sf_dir, name)
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"register_local_override: {name!r} exceeds max_rows="
            f"{max_rows} — not a dimension table"
        )
    if not rows:
        # 'VALUES ' with zero tuples is a SQL parse error, not an empty
        # LocalRelation — fail with a real message (round-7 advice item
        # 3). An empty dim is a caller bug here: the override exists to
        # shave the broadcast-build job off HOT dims, and an empty hot
        # dim means the sf_dir is wrong or the table was never loaded.
        raise ValueError(
            f"register_local_override: {name!r} is empty under "
            f"{sf_dir!r} — refusing to cache an empty dimension "
            "(check sf_dir / ingest)"
        )
    # NOT createDataFrame(rows): that builds an RDD-backed LogicalRDD,
    # which still scans through a job (and through Python ser/de — the
    # probe measured it SLOWER than the parquet scan). A SQL VALUES
    # literal analyzes to a Catalyst LocalRelation → LocalTableScanExec,
    # whose broadcast collects driver-side with no job at all.
    # NOTE: string escaping below assumes the session default
    # spark.sql.parser.escapedStringLiterals=false (backslash escapes
    # active); a session flipping that legacy conf would mis-read
    # embedded quotes/backslashes in dim strings.
    def lit(v, dt) -> str:
        if v is None:
            return f"CAST(NULL AS {dt.simpleString()})"
        if isinstance(dt, T.StringType):
            esc = str(v).replace("\\", "\\\\").replace("'", "\\'")
            return f"'{esc}'"
        if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType)):
            return f"CAST({int(v)} AS {dt.simpleString()})"
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            f = float(v)
            if f != f or f in (float("inf"), float("-inf")):
                # repr(nan)/repr(inf) are not SQL literals; the string
                # cast form is ('NaN'/'Infinity' per ANSI float casts)
                return f"CAST('{f}' AS {dt.simpleString()})"
            return f"CAST({f!r} AS {dt.simpleString()})"
        if isinstance(dt, T.BooleanType):
            return "true" if v else "false"
        if isinstance(dt, T.DateType):
            return f"DATE'{v.isoformat()}'"
        raise ValueError(
            f"register_local_override: unsupported dim column type {dt}"
        )
    fields = df.schema.fields
    values = ", ".join(
        "(" + ", ".join(lit(r[f.name], f.dataType) for f in fields) + ")"
        for r in rows
    )
    cols = ", ".join(f"`{f.name}`" for f in fields)
    local = spark.sql(f"SELECT * FROM (VALUES {values}) AS t({cols})")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    _TABLE_CACHE[key] = local
    return len(rows)


def invalidate_cache(path: str | None = None) -> None:
    """Drop memoized table metadata (all entries, or one sf_dir/path).

    Call after rewriting parquet under a previously-loaded path; see the
    immutability note on ``_TABLE_CACHE``.
    """
    if path is None:
        _TABLE_CACHE.clear()
        return
    for key in [k for k in _TABLE_CACHE if k[1] == path]:
        _TABLE_CACHE.pop(key, None)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    override = _LAYOUT_OVERRIDES.get(key)
    if override is not None:
        # session-catalog metadata is already cached JVM-side; bucketed
        # scans additionally expose outputPartitioning to the planner
        return spark.table(override)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # parquet TIMESTAMP(NANOS) read as long (see session.py); truncate
        # to µs — the oracle does the same via CAST(ts AS TIMESTAMP), so
        # both engines compare timestamps at identical precision.
        # integer DIV, not float /: ns-since-epoch (~1.7e18) exceeds the
        # double's exact-integer range, float division would corrupt µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so spark.sql can reference it."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
