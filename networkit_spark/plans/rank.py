"""Distributed global ranking — no single-partition ``Window.orderBy``.

A bare ``Window.orderBy(...)`` (no ``partitionBy``) collapses the whole
input into ONE task; at link-graph scale (10^9 nodes / 10^12 edges) that
is the classic scale-killer.  ``global_row_number`` produces the exact
same 0-based global rank with a range repartition + per-partition sort +
broadcast prefix offsets — the parallel ``zipWithIndex`` pattern already
used by ``graph.assign_dense_ids`` (single-column) and
``operators.overlap`` (hash-bucketed), factored here for multi-column
orderings.

Cost: one range shuffle over the ordering columns (sampled boundaries),
one P-row driver aggregate for the offsets, one broadcast join.  The
result is deterministic and independent of ``num_parts``: it always
equals the rank a global ascending sort on ``order_cols`` would give
(``order_cols`` must be a total order — tie-break with a key column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_parts: int | None = None,
) -> DataFrame:
    """``df`` + ``out_col`` = 0-based global rank by ``order_cols`` asc.

    Equivalent to ``row_number().over(Window.orderBy(*order_cols)) - 1``
    but distributed: range-partition on the ordering columns, rank
    within each partition (window partitioned by the physical partition
    id → parallel sorts), then shift by broadcast cumulative counts
    (P driver rows — O(parallelism), not O(rows)).
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    P = num_parts or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parted = (
        df.repartitionByRange(P, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)) - F.lit(1),
        )
        .persist()
    )
    counts = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    acc, rows = 0, []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        rows.append((r["_pid"], acc))
        acc += r["_cnt"]
    off_df = spark.createDataFrame(rows or [(0, 0)], "_pid int, _off long")
    return (
        parted.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )
