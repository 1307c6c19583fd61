"""Scale-technique tests: salted aggregation/join results match their
unsalted equivalents; bucketed joins plan no Exchange."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_agg_matches_plain(spark):
    from mitoscape_spark.operators.skew import salted_agg

    li = load_table(spark, SF, "lineitem")
    salted = salted_agg(
        li,
        "l_orderkey",
        {
            "sq": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "mx": ("l_extendedprice", "max"),
        },
        n_salts=8,
    )
    plain = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("sq"),
        F.count("l_quantity").alias("n"),
        F.max("l_extendedprice").alias("mx"),
    )
    got = {r.l_orderkey: (r.sq, r.n, r.mx) for r in salted.collect()}
    want = {r.l_orderkey: (r.sq, r.n, r.mx) for r in plain.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0])
        assert got[k][1] == want[k][1]
        assert got[k][2] == pytest.approx(want[k][2])


def test_salted_join_matches_plain(spark):
    from mitoscape_spark.operators.skew import salted_join

    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    salted = salted_join(orders, customer, "o_custkey", n_salts=8)
    plain = orders.join(customer, on="o_custkey")
    assert salted.count() == plain.count()
    got = sorted(
        (r.o_orderkey, r.c_name)
        for r in salted.select("o_orderkey", "c_name").collect()
    )
    want = sorted(
        (r.o_orderkey, r.c_name)
        for r in plain.select("o_orderkey", "c_name").collect()
    )
    assert got == want


def test_top_keys_diagnostic(spark):
    from mitoscape_spark.operators.skew import top_keys

    li = load_table(spark, SF, "lineitem")
    rows = top_keys(li, "l_orderkey", n=5).collect()
    assert len(rows) == 5
    assert all(rows[i].rows >= rows[i + 1].rows for i in range(4))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from mitoscape_spark.sources.bucketed import bucketed_join, write_bucketed

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # force a sort-merge join: with broadcast on, the planner broadcasts
    # the small side and ignores bucketing ("disabled by query planner").
    # Bucketing's payoff is the big-big case, which broadcast can't do.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    write_bucketed(orders, "b_orders", "o_custkey", n_buckets=4)
    write_bucketed(customer, "b_customer", "o_custkey", n_buckets=4)
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == orders.join(customer, "o_custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_layout_prunes(spark, tmp_path):
    from mitoscape_spark.sources.layout import (
        read_partitioned,
        write_partitioned,
    )

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])
    back = read_partitioned(spark, path)
    one_lang = docs.select("lang").head()[0]
    filtered = back.where(F.col("lang") == one_lang)
    plan = _plan(filtered)
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1].splitlines()[0], plan
    assert (
        filtered.count()
        == docs.where(F.col("lang") == one_lang).count()
    )
