"""Physical-plan regression tests — the scale contract, not just the
results: filters must reach the parquet scan, dimension joins must
broadcast, the brute-force baselines are the ONLY nested loops, and no
Python shows up in JVM-expressible pipelines."""

from __future__ import annotations

import contextlib
import io

from mitoscape_spark.queries.extensions import QUERIES as EXT
from mitoscape_spark.queries.relational import QUERIES as REL

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q02_filters_push_to_scan(spark):
    plan = plan_of(REL["q02"](spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(
        "GreaterThan(l_quantity" in l or "l_quantity" in l for l in pushed
    ), plan


def test_q09_dimension_join_broadcasts(spark):
    plan = plan_of(REL["q09"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_q10_has_no_join(spark):
    # the pairwise-combination rewrite must stay join-free
    plan = plan_of(REL["q10"](spark, SF))
    assert "Join" not in plan, plan
    assert "HashAggregate" in plan


def test_q15_topk_never_global_sorts(spark):
    plan = plan_of(REL["q15"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_interval_join_is_equi_not_nested_loop(spark):
    plan = plan_of(EXT["ext_interval_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jvm_pipelines_have_no_python(spark):
    for name in ["q05", "q10", "ext_minhash_pairs", "ext_simhash",
                 "ext_lang_id", "ext_quality"]:
        fn = REL.get(name) or EXT[name]
        plan = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has Python in the hot path"
        )
