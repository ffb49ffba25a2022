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

#: applicationId → checkpoint dir already applied via setCheckpointDir
#: (the applied value is wrapped in a random UUID subdir, so it cannot
#: be read back and compared — see _materialize)
_CKPT_APPLIED: dict[str, str] = {}


def _materialize(part: DataFrame) -> DataFrame:
    """Eagerly checkpoint the range-partitioned interim.

    Checkpointing (not persist) is the correctness mechanism: it
    TRUNCATES LINEAGE, so the returned DataFrame's two branches can
    only ever read the one materialization — no cache eviction,
    ``spark.catalog.clearCache()``, or deferred execution can make a
    branch silently recompute with freshly-sampled (divergent) range
    boundaries. Each call checkpoints afresh — a cross-call memo keyed
    on the analyzed plan would serve stale data if the files under the
    same path changed, and lineage truncation makes that undetectable.

    When ``spark.graft.checkpointDir`` is set, the interim goes to a
    RELIABLE checkpoint (``sc.setCheckpointDir`` + ``checkpoint``) —
    the cluster-grade path, since ``localCheckpoint`` blocks die with
    their executor and a lost block is unrecoverable (lineage is
    gone). ``localCheckpoint`` remains the single-JVM local default,
    where executor loss means JVM loss anyway."""
    spark = part.sparkSession
    ckpt_dir = spark.conf.get("spark.graft.checkpointDir", None)
    if ckpt_dir:
        sc = spark.sparkContext
        # setCheckpointDir stores <dir>/<random-UUID>, so comparing
        # getCheckpointDir() to the raw conf value is always unequal —
        # memoize the applied conf per context instead, or every call
        # would mkdir a fresh orphan UUID directory on the remote FS
        if _CKPT_APPLIED.get(sc.applicationId) != ckpt_dir:
            sc.setCheckpointDir(ckpt_dir)
            _CKPT_APPLIED[sc.applicationId] = ckpt_dir
        # reliable checkpoints are not auto-deleted; long-running apps
        # should also set spark.cleaner.referenceTracking.cleanCheckpoints
        # so gc'd interims free their files
        return part.checkpoint(eager=True)
    return part.localCheckpoint(eager=True)


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
    part = _materialize(part)
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
