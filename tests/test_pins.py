"""The switchable lineage-pin helper (SCALE.md §23).

Every §20 pin routes through ``mitoscape_spark.pins.pin`` so a cluster
deployment can trade pin speed for executor-loss recovery with ONE
session conf instead of editing ~80 call sites. These tests pin the
knob's three behaviours; the pins' *semantic* no-op property (same
rows with or without a pin) is covered by the oracle suite, which runs
every pinned query against DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mitoscape_spark.pins import PIN_DIR_CONF, PIN_MODE_CONF, pin, pin_eager


def _sample(spark):
    return spark.range(100).withColumn("k", F.col("id") % 7)


def test_default_mode_is_local(spark):
    # no conf set → localCheckpoint: works with NO checkpoint dir
    # configured (reliable mode would raise), and the lineage is
    # truncated to a scan of the checkpointed RDD
    assert spark.conf.get(PIN_MODE_CONF, "local") == "local"
    out = _sample(spark).transform(pin)
    assert out.count() == 100
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan


def test_reliable_mode_requires_dir(spark):
    spark.conf.set(PIN_MODE_CONF, "reliable")
    try:
        if spark.sparkContext.getCheckpointDir() is not None:
            return  # another test already set one; covered below
        spark.conf.unset(PIN_DIR_CONF)
        try:
            _sample(spark).transform(pin)
            raise AssertionError("reliable mode without a dir must raise")
        except ValueError as exc:
            assert PIN_DIR_CONF in str(exc)
    finally:
        spark.conf.set(PIN_MODE_CONF, "local")


def test_reliable_mode_checkpoints_to_dir_and_matches(tmp_path, spark):
    base = _sample(spark)
    expect = sorted(r.id for r in base.collect())
    ckpt = str(tmp_path / "pins")
    spark.conf.set(PIN_MODE_CONF, "reliable")
    spark.conf.set(PIN_DIR_CONF, ckpt)
    try:
        out = base.transform(pin_eager)  # eager → files exist NOW
        got = sorted(r.id for r in out.collect())
        assert got == expect
        # reliable checkpoint wrote real files under the configured dir
        found = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckpt)
            for f in fs
        ]
        assert found, f"no checkpoint files under {ckpt}"
        # lazy form returns the same rows too
        got_lazy = sorted(
            r.id for r in base.transform(pin).collect()
        )
        assert got_lazy == expect
    finally:
        spark.conf.set(PIN_MODE_CONF, "local")


def test_local_and_reliable_rows_identical(tmp_path, spark):
    df = _sample(spark).groupBy("k").agg(F.count("*").alias("n"))
    local_rows = sorted(map(tuple, df.transform(pin).collect()))
    spark.conf.set(PIN_MODE_CONF, "reliable")
    spark.conf.set(PIN_DIR_CONF, str(tmp_path / "pins2"))
    try:
        rel_rows = sorted(map(tuple, df.transform(pin).collect()))
    finally:
        spark.conf.set(PIN_MODE_CONF, "local")
    assert rel_rows == local_rows
