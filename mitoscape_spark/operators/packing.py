"""Sequence packing: concatenate-and-split planning for training data.

Pretraining pipelines concatenate tokenized documents in a fixed order
and slice the stream into ``budget``-token sequences. The plan for that
is a global prefix sum: each document's ``start_offset`` is the total
token count of every document before it, and its pack assignment is
``start_offset DIV budget``.

Scale shape — the naive version is a Window over a *global* ORDER BY,
which Spark executes as a single partition: a one-task bottleneck at
100 TB. This module implements the classic two-phase distributed prefix
sum instead:

1. bucket rows by the order key (``order_col DIV bucket_width``);
2. aggregate per-bucket token totals — one row per bucket;
3. cumulative-sum those totals with a window over the *tiny* bucket
   table (the only global ordering materialized);
4. broadcast-join each bucket's base offset back and finish with a
   within-bucket window — bounded partitions, full parallelism.

Equivalent to the global window for any numeric, unique ``order_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    bucket_width: int = 4096,
) -> DataFrame:
    """Assign (start_offset, pack_id) to every row under the global
    order of ``order_col``. Rows may straddle pack boundaries — the
    pack_id is where the row *starts*, matching concatenate-then-split
    semantics.
    """
    # DIV requires an integral operand; a double order column would
    # fail analysis deep in the plan — validate here with a clear
    # message (fractional keys also break the uniqueness contract)
    order_type = df.schema[order_col].dataType.simpleString()
    if order_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"pack_sequences/global_row_number need an integral "
            f"order_col; {order_col!r} is {order_type}"
        )
    rows = df.select(
        order_col,
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.expr(f"{order_col} DIV {bucket_width}").alias("_bkt"),
    )

    totals = rows.groupBy("_bkt").agg(F.sum(tokens_col).alias("_tot"))
    w_bkt = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(w_bkt), F.lit(0)).alias("_base")
    )

    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rows.join(F.broadcast(bases), "_bkt")
        .select(
            order_col,
            tokens_col,
            (
                F.col("_base")
                + F.coalesce(F.sum(tokens_col).over(w_in), F.lit(0))
            ).alias("start_offset"),
        )
        .withColumn("pack_id", F.expr(f"start_offset DIV {budget}"))
    )


def global_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str = "row_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Stable 0-based global row numbers under ``order_col``'s order —
    the driver-free zipWithIndex. The naive
    ``row_number() OVER (ORDER BY ...)`` plans a SINGLE-partition
    window (one task owns the entire table); this reuses the two-phase
    bucketed prefix sum above with a unit weight per row, so the only
    global ordering materialized is the tiny per-bucket count table.
    ``order_col`` must be numeric and unique (same contract as
    ``pack_sequences``)."""
    numbered = pack_sequences(
        df.select(F.col(order_col), F.lit(1).alias("_one")),
        order_col=order_col,
        tokens_col="_one",
        budget=1 << 62,  # single "pack": offsets ARE the row numbers
        bucket_width=bucket_width,
    ).select(order_col, F.col("start_offset").alias(out_col))
    return df.join(numbered, order_col)


def bin_pack_ffd(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_groups: int = 32,
) -> DataFrame:
    """No-straddle packing: assign whole rows to packs of capacity
    ``budget`` via first-fit-decreasing — the variant for SFT/eval data
    where documents must NOT split across sequences (pack_sequences
    above is the concatenate-and-split pretraining variant).

    Global FFD is inherently sequential, so the distributed shape is
    partition-local FFD: rows scatter deterministically into
    ``n_groups`` groups by id hash, each group packs independently in
    one Arrow batch (sorted descending, first-fit — the 11/9·OPT+1
    classic, additive across groups), and pack ids are globally unique
    as (group << 32) | local. Waste stays within the FFD bound per
    group; more groups = more parallelism but up to one extra
    partially-filled pack per group — size n_groups to corpus/1e5 rows,
    not cores (the trailing-pack waste is the price of parallelism and
    is measured in tests).

    A row larger than ``budget`` cannot pack — it fails loudly (JVM-side
    raise in the same pass) rather than silently truncating.
    """
    import pandas as pd

    # the guard rides the LIVE weight column — a separate guard column
    # would be dead code and Catalyst's column pruning would silently
    # optimize the raise away
    guarded_w = F.when(
        (F.col(tokens_col) > budget) | (F.col(tokens_col) < 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"bin_pack_ffd: row weight outside [0, {budget}]: "
                ),
                F.col(id_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col(tokens_col).cast("long"))
    rows = df.select(
        F.col(id_col),
        guarded_w.alias("_w"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_groups)).alias("_grp"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = int(pdf["_grp"].iloc[0])
        pdf = pdf.sort_values(
            ["_w", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # current fill per local pack
        assign: list[int] = []
        for w in pdf["_w"]:
            w = int(w)
            for i, f in enumerate(fills):  # first fit
                if f + w <= budget:
                    fills[i] = f + w
                    assign.append(i)
                    break
            else:
                fills.append(w)
                assign.append(len(fills) - 1)
        pdf["pack_id"] = [(grp << 32) | a for a in assign]
        return pdf[[id_col, "_w", "pack_id"]].rename(
            columns={"_w": tokens_col}
        )

    return rows.groupBy("_grp").applyInPandas(
        pack, f"{id_col} long, {tokens_col} long, pack_id long"
    )
