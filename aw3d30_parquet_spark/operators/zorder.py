"""Z-order (Morton-curve) clustering — multi-dimensional data layout.

The reference partitions its output by the filename-encoded tile key
(one dimension). Real multi-dimensional pruning — "give me the rows
near (lat, lon)" or "(partkey, suppkey)" — needs a layout where file
min/max ranges are tight on EVERY dimension at once; sorting by one
column makes the others' ranges span the whole domain. Interleaving the
bits of the dimensions (the Z/Morton curve) gives a single sort key
whose contiguous ranges are small hyper-rectangles, so range-
partitioning + sorting by it clusters all dimensions simultaneously —
the OPTIMIZE ZORDER BY pattern from Delta/Iceberg, built here from
stock Spark primitives.

Everything is JVM-side codegen (shift/mask/or over longs — no UDF): the
z-value of a 100 TB table costs one projection, and the clustered write
is the one range-shuffle the sort would need anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (non-negative ints < 2**bits) into one
    long: bit ``i`` of column ``j`` lands at position ``i*len(cols)+j``.
    ``len(cols) * bits`` must fit in 63 bits. Pure shift/mask/or —
    whole-stage-codegen friendly, no Python."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def cluster_by_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "_z",
) -> DataFrame:
    """Lay ``df`` out along the Z-curve of ``cols``: range-partition by
    z-value, sort within partitions — each output task (and thus each
    written file) covers one compact z-range = one small hyper-rectangle
    in ``cols`` space, so parquet min/max skipping prunes on every
    clustered dimension. Write the result with ``.write.parquet`` (or
    any sink) to persist the layout; the z column is kept so readers
    can range-filter on it directly."""
    zed = df.withColumn(z_col, zvalue(cols, bits))
    parted = (
        zed.repartitionByRange(num_partitions, z_col)
        if num_partitions
        else zed.repartitionByRange(z_col)
    )
    return parted.sortWithinPartitions(z_col)


def _zvalue_sql(cols: list[str], bits: int) -> str:
    """The identical interleave as portable SQL (oracle side)."""
    n = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return " | ".join(terms)


_Z_BITS = 10  # two 10-bit dims → 20-bit z-value
_Z_BLOCK_SHIFT = 8  # 256 z-values per block ⟺ 16×16 cells


def q72_zorder_cluster(spark, sf_dir: str) -> DataFrame:
    """Z-order layout audit over lineitem keyed on (partkey, suppkey)
    mod 1024: compute the interleaved z-value natively, then per
    256-wide z-block report row count and each dimension's min/max
    span. TIGHT per-block spans on BOTH dimensions (≤16-cell sides vs
    the 1024-cell domain) are exactly the property that makes file-
    level min/max skipping effective on either predicate after a
    z-clustered write — the aggregate is the measurable form of the
    layout guarantee. Top 20 blocks by z keep the result bounded."""
    from aw3d30_parquet_spark.operators.relational import _t

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 1024).cast("long").alias("pk"),
        (F.col("l_suppkey") % 1024).cast("long").alias("sk"),
    )
    zed = li.withColumn("z", zvalue(["pk", "sk"], _Z_BITS))
    return (
        zed.withColumn("z_block", F.shiftright("z", _Z_BLOCK_SHIFT))
        .groupBy("z_block")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("pk").alias("pk_min"),
            F.max("pk").alias("pk_max"),
            F.min("sk").alias("sk_min"),
            F.max("sk").alias("sk_max"),
        )
        .orderBy("z_block")
        .limit(20)
    )


_Q72_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(l_partkey % 1024 AS BIGINT) AS pk,
         CAST(l_suppkey % 1024 AS BIGINT) AS sk
  FROM lineitem
), zed AS (
  SELECT pk, sk, {_zvalue_sql(["pk", "sk"], _Z_BITS)} AS z FROM keyed
)
SELECT z >> {_Z_BLOCK_SHIFT} AS z_block, count(*) AS n_rows,
       min(pk) AS pk_min, max(pk) AS pk_max,
       min(sk) AS sk_min, max(sk) AS sk_max
FROM zed GROUP BY z_block ORDER BY z_block LIMIT 20
"""

QUERIES = {"q72_zorder_cluster": q72_zorder_cluster}
ORACLE_SQL = {"q72_zorder_cluster": _Q72_ORACLE}
