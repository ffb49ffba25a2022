"""Distributed global ranking — the scale-safe replacement for
``row_number()/ntile() OVER (ORDER BY ...)``.

A bare global window funnels the whole relation through one task; this
module computes the identical global rank with distributed machinery
(the q38 derivation, factored for reuse):

1. range-partition + sort by the order columns (the same distributed
   sort ``orderBy`` uses);
2. ``row_number`` per range partition — a window keyed by partition id,
   parallel across partitions;
3. broadcast the per-partition row counts (≤ #partitions rows) and add
   each partition's exclusive prefix offset → the exact global rank.

The range-partitioned relation is PERSISTED for the duration of the
job: the rank branch and the counts branch both read it, and
``repartitionByRange``'s boundary sampler is seeded by the RDD id —
two separate executions of the same plan can draw DIFFERENT partition
boundaries once partitions hold more rows than the sample size, which
silently corrupts the offsets (caught by the 10× scaling probe:
equal-width ntile phases came out unequal; small inputs hide the bug
because the sampler takes every row). At cluster scale the persist is
a checkpoint/materialized interim — the standard shape for any
two-phase global algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: semantic-hash → persisted range-partitioned interim. The persist is
#: a CORRECTNESS mechanism (both branches must read one
#: materialization), so eviction is conservative: a small LRU rather
#: than release-on-next-call — distinct rank queries (q38, p09, ...)
#: coexist without evicting each other mid-lifecycle, and repeated
#: runs of the same query reuse the same interim instead of
#: re-persisting. Only >_SCRATCH_CAP distinct rank plans interleaved
#: with deferred execution could evict a live interim (recomputation
#: after eviction would re-draw boundaries).
_SCRATCH: dict = {}
_SCRATCH_CAP = 4


def with_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "_r",
    total_col: str = "_n",
    num_partitions: int = 32,
) -> DataFrame:
    """``df`` + ``rank_col`` (1-based global rank under ``order_cols``,
    which must form a total order for determinism) + ``total_col`` (the
    relation's row count) — no single-partition window over ``df``."""
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_gr_pid", F.spark_partition_id()
    )
    key = (
        part.sparkSession.sparkContext.applicationId,
        part._jdf.queryExecution().analyzed().semanticHash(),
    )
    cached = _SCRATCH.pop(key, None)
    if cached is not None:
        part = cached  # re-insert below as most-recently-used
    else:
        part = part.persist()
        while len(_SCRATCH) >= _SCRATCH_CAP:
            oldest = next(iter(_SCRATCH))
            try:
                _SCRATCH.pop(oldest).unpersist()
            except Exception:
                _SCRATCH.pop(oldest, None)
    _SCRATCH[key] = part
    w_local = Window.partitionBy("_gr_pid").orderBy(*order_cols)
    local = part.withColumn("_gr_rn", F.row_number().over(w_local))
    counts = local.groupBy("_gr_pid").agg(F.count("*").alias("_gr_c"))
    w_prev = Window.orderBy("_gr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_gr_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "_gr_pid",
        F.coalesce(F.sum("_gr_c").over(w_prev), F.lit(0)).alias("_gr_off"),
        F.sum("_gr_c").over(w_all).alias(total_col),
    )
    return (
        local.join(F.broadcast(offs), "_gr_pid")
        .withColumn(rank_col, F.col("_gr_rn") + F.col("_gr_off"))
        .drop("_gr_pid", "_gr_rn", "_gr_off")
    )


def ntile_expr(rank_col: str, total_col: str, k: int) -> Column:
    """SQL ``ntile(k)`` as a closed form of (global rank, total rows):
    the first ``n % k`` buckets take ``ceil(n/k)`` rows, the rest
    ``floor(n/k)`` — integer DIV end-to-end, no double quotient to
    mis-floor at any n."""
    return F.expr(
        f"""CASE WHEN {rank_col} <= ({total_col} % {k})
                     * ({total_col} DIV {k} + 1)
                THEN ({rank_col} - 1) DIV ({total_col} DIV {k} + 1)
                ELSE ({total_col} % {k})
                     + ({rank_col} - ({total_col} % {k})
                        * ({total_col} DIV {k} + 1) - 1)
                       DIV ({total_col} DIV {k})
           END + 1"""
    )
