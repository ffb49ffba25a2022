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

The range-partitioned relation is eagerly CHECKPOINTED: the rank
branch and the counts branch both read it, and
``repartitionByRange``'s boundary sampler is seeded by the RDD id —
two separate executions of the same plan can draw DIFFERENT partition
boundaries once partitions hold more rows than the sample size, which
silently corrupts the offsets (caught by the 10× scaling probe:
equal-width ntile phases came out unequal; small inputs hide the bug
because the sampler takes every row). Checkpointing truncates lineage,
so no branch can ever recompute the partitioning — the standard
materialized-interim shape for any two-phase global algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: semantic-hash → eagerly localCheckpoint-ed range-partitioned
#: interim. Checkpointing (not persist) is the correctness mechanism:
#: it TRUNCATES LINEAGE, so the returned DataFrame's two branches can
#: only ever read the one materialization — no cache eviction,
#: ``spark.catalog.clearCache()``, or deferred execution can make a
#: branch silently recompute with freshly-sampled (divergent) range
#: boundaries. The memo is then purely a perf cache (reuse across
#: repeated runs of the same rank query); evicted entries just drop
#: our reference — checkpoint blocks free when the consumer
#: DataFrames are gc'd. On a multi-executor cluster, prefer a
#: RELIABLE checkpoint dir (``sc.setCheckpointDir`` + ``checkpoint``)
#: — localCheckpoint blocks die with their executor.
_SCRATCH: dict = {}
_SCRATCH_CAP = 8


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
        part = part.localCheckpoint(eager=True)
        while len(_SCRATCH) >= _SCRATCH_CAP:
            _SCRATCH.pop(next(iter(_SCRATCH)))
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
