"""Lineage pins: one switchable implementation for every §20 pin.

The engine pins ~80 reduced intermediates — multi-consumer aggregates
and per-round iterative states — so they materialize once instead of
re-executing per consumer, and so iterative plans stay O(1) instead of
growing per round. The default implementation is
``DataFrame.localCheckpoint``: cheapest (executor-local storage, no
lineage kept), which is exactly the guide-§5 idiom for reduced
intermediates whose recomputation is cheap relative to the query.

**Fault-tolerance tradeoff (round-11 verdict item 2).**
localCheckpoint data is UNRECOVERABLE on executor loss — the lineage
was truncated, so a lost block kills the job instead of recomputing.
On a single-box bench that is irrelevant (the "executor" dying is the
whole JVM dying); on a multi-hour 100 TB cluster job it means one
pre-empted executor can cost the whole run. That deployment flips ONE
session conf instead of editing code:

    spark.conf.set("spark.mitoscape.pin.mode", "reliable")
    spark.conf.set("spark.mitoscape.pin.reliableDir",
                   "hdfs://…/checkpoints")   # or call setCheckpointDir

and every pin in the engine becomes a reliable ``DataFrame.checkpoint``
to the configured directory (recomputable-free recovery from HDFS/S3,
at the cost of a write+read per pin). SCALE.md §localCheckpoint has
the full decision rule.

Call sites use the chain-preserving form ``df.transform(pin)`` /
``df.transform(pin_eager)`` so the knob is consulted at plan-build
time, per pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: "local" (default) → localCheckpoint; "reliable" → checkpoint to
#: PIN_DIR_CONF (set via spark.conf at session or runtime).
PIN_MODE_CONF = "spark.mitoscape.pin.mode"
#: Reliable-checkpoint directory; consulted only in "reliable" mode and
#: only when the SparkContext has no checkpoint dir set already.
PIN_DIR_CONF = "spark.mitoscape.pin.reliableDir"


def pin(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialization pin for a reduced multi-consumer or per-round
    intermediate (§20 doctrine). Lazy by default: the pin materializes
    with the first action that consumes it, adding no extra job."""
    spark = df.sparkSession
    mode = spark.conf.get(PIN_MODE_CONF, "local")
    if mode == "reliable":
        sc = spark.sparkContext
        try:
            has_dir = sc.getCheckpointDir() is not None
        except Exception:  # noqa: BLE001 — API drift; setCheckpointDir
            has_dir = False  # below is idempotent
        if not has_dir:
            d = spark.conf.get(PIN_DIR_CONF, None)
            if not d:
                raise ValueError(
                    f"{PIN_MODE_CONF}=reliable requires a checkpoint "
                    f"dir: set {PIN_DIR_CONF} or call "
                    "sparkContext.setCheckpointDir"
                )
            sc.setCheckpointDir(d)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def pin_eager(df: DataFrame) -> DataFrame:
    """Eager pin: materializes NOW (its own job). Used where consumers
    fork immediately (frozen ids) or per-round in iterative loops."""
    return pin(df, eager=True)
