"""Declarative data-quality expectations — a rule list compiled into
ONE aggregation pass over the table (plus one key-hash pass per
uniqueness rule), returning a violation report instead of a boolean.

The contract layer every scheduled 100 TB load needs between "ingest
finished" and "downstream may read": expectations are data, not code
(reviewable, diffable, per-table config), and the report is a
DataFrame — alert rules, dashboards, and the CLI exit-code gate all
consume it.

Plan shape: every per-row rule (not_null / in_range / regex /
accepted_values / custom SQL predicate) becomes one conditional-count
aggregate; all of them ride a single partial+final hash agg over one
scan, however many rules are declared (same one-job discipline as
profile_columns). ``unique`` rules cannot ride a row predicate — each
costs one key-count aggregation, stated rather than hidden.

Supported rules (dicts — serializable to/from JSON config):
  {"rule": "not_null", "col": c}
  {"rule": "in_range", "col": c, "lo": x, "hi": y}   (inclusive; NULL passes — pair with not_null)
  {"rule": "regex",    "col": c, "pattern": p}        (NULL passes)
  {"rule": "accepted_values", "col": c, "values": [...]} (NULL passes)
  {"rule": "expression", "name": n, "sql": "<boolean SQL>"} (row passes when TRUE; NULL = violation)
  {"rule": "unique", "cols": [c, ...]}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("rule_id", "rule", "target", "n_violations", "passed")


def _violation_expr(rule: dict) -> tuple[str, Column]:
    kind = rule["rule"]
    if kind == "not_null":
        return rule["col"], F.col(rule["col"]).isNull()
    if kind == "in_range":
        c = F.col(rule["col"])
        return rule["col"], c.isNotNull() & (
            (c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"]))
        )
    if kind == "regex":
        c = F.col(rule["col"])
        return rule["col"], c.isNotNull() & ~c.rlike(rule["pattern"])
    if kind == "accepted_values":
        if not rule["values"]:
            raise ValueError(
                "accepted_values needs a non-empty values list "
                "(an empty list would mean 'no value is ever legal' — "
                "state that intent with a not_null + expression rule)"
            )
        c = F.col(rule["col"])
        return rule["col"], c.isNotNull() & ~c.isin(*rule["values"])
    if kind == "expression":
        # NULL predicate = violation: an expectation that cannot be
        # evaluated has NOT been met (the silent-NULL trap inverted)
        return rule["name"], ~F.coalesce(F.expr(rule["sql"]), F.lit(False))
    raise ValueError(f"unknown expectation rule: {kind!r}")


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """(rule_id, rule, target, n_violations, passed) — one row per
    declared rule, in declaration order."""
    row_rules = [
        (i, r) for i, r in enumerate(rules) if r["rule"] != "unique"
    ]
    uniq_rules = [
        (i, r) for i, r in enumerate(rules) if r["rule"] == "unique"
    ]
    spark = df.sparkSession
    reports: list[DataFrame] = []
    if row_rules:
        aggs = []
        for i, r in row_rules:
            _, bad = _violation_expr(r)
            aggs.append(
                F.sum(bad.cast("long")).alias(f"_v_{i}")
            )
        one = df.agg(*aggs)
        meta = [(i, r["rule"], _violation_expr(r)[0]) for i, r in row_rules]
        stack = ", ".join(
            f"{i}, '{kind}', '{target}', coalesce(_v_{i}, 0)"
            for i, kind, target in meta
        )
        reports.append(
            one.select(
                F.expr(
                    f"stack({len(meta)}, {stack}) AS "
                    "(rule_id, rule, target, n_violations)"
                )
            )
        )
    for i, r in uniq_rules:
        cols = r["cols"]
        dupes = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .agg(
                F.coalesce(
                    F.sum(F.col("_n") - 1), F.lit(0)
                ).alias("n_violations")
            )
            .select(
                F.lit(i).alias("rule_id"),
                F.lit("unique").alias("rule"),
                F.lit(",".join(cols)).alias("target"),
                "n_violations",
            )
        )
        reports.append(dupes)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule_id",
        "rule",
        "target",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    ).orderBy("rule_id")
