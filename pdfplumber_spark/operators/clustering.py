"""Tolerance clustering as a Spark window plan (SURVEY.md §2.4).

The reference's ``cluster_objects`` (``utils/clustering.py:42-66``) clusters
the *distinct* key values with a chained gap rule, then maps objects to
clusters. Distributed shape:

1. distinct (partition-local pre-agg, then shuffle on the partition keys);
2. ``lag`` + gap flag + running ``sum`` over (partition keys, value order) —
   identical to gap-based sessionization, applied to space instead of time;
3. broadcast-or-shuffle join back to the rows.

For page-local clustering the partition keys are (url, page_number) and AQE
turns the join into a local one; the same plan works corpus-wide for global
keys (e.g. clustering event values per user).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def with_cluster_id(
    df: DataFrame,
    value_col: str,
    tolerance: float,
    partition_cols: Sequence[str] = (),
    out_col: str = "cluster_id",
) -> DataFrame:
    """Add a dense cluster id per (partition_cols, chained gaps on value_col).

    tolerance == 0 gives one cluster per distinct value (reference
    ``cluster_list`` fast path, ``clustering.py:10-11``).
    """
    pcols = list(partition_cols)
    w = Window.partitionBy(*pcols).orderBy(value_col) if pcols else (
        Window.orderBy(value_col)
    )
    distinct = df.select(*pcols, value_col).distinct()
    gap = (
        (F.col(value_col) - F.lag(value_col).over(w)) > F.lit(tolerance)
    ).cast("long")
    ids = (
        distinct.withColumn("_gap", F.coalesce(gap, F.lit(0)))
        .withColumn(out_col, F.sum("_gap").over(w))
        .drop("_gap")
    )
    return df.join(ids, pcols + [value_col], "left")


def cluster_agg(
    df: DataFrame,
    value_col: str,
    tolerance: float,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Cluster then aggregate: per cluster emit count/min/max/mean of the
    value — the distributed ``cluster_list`` + per-cluster stats."""
    pcols = list(partition_cols)
    cl = with_cluster_id(df, value_col, tolerance, pcols)
    return cl.groupBy(*pcols, "cluster_id").agg(
        F.count("*").alias("n"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
        F.avg(value_col).alias("mean_val"),
    )


def snap_to_cluster_mean(
    df: DataFrame,
    value_col: str,
    tolerance: float,
    partition_cols: Sequence[str] = (),
    out_col: str = None,
) -> DataFrame:
    """Distributed ``snap_objects`` (``utils/geometry.py:150-159``): move each
    row's value to its cluster's row-weighted mean."""
    out_col = out_col or value_col
    pcols = list(partition_cols)
    cl = with_cluster_id(df, value_col, tolerance, pcols, out_col="_cid")
    w = Window.partitionBy(*(pcols + ["_cid"]))
    return cl.withColumn(out_col, F.avg(value_col).over(w)).drop("_cid")


def interval_merge(
    df: DataFrame,
    start_col: str,
    end_col: str,
    tolerance: float,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Distributed ``join_edge_group`` (``table.py:39-65``): union of
    intervals along a line — running-max + gap flag + cumsum segment id,
    then min(start)/max(end) per segment."""
    pcols = list(partition_cols)
    w = (
        Window.partitionBy(*pcols).orderBy(start_col, end_col)
        if pcols
        else Window.orderBy(start_col, end_col)
    )
    run_max = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_seg = (
        F.when(run_max.isNull(), F.lit(1))
        .when(F.col(start_col) > run_max + F.lit(tolerance), F.lit(1))
        .otherwise(F.lit(0))
    )
    seg = df.withColumn("_seg", F.sum(new_seg).over(w))
    return seg.groupBy(*pcols, "_seg").agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count("*").alias("n_merged"),
    ).drop("_seg")
