"""Bucketed (co-located) joins: shuffle elimination for fact-fact joins.

SURVEY §2.2 scale posture: "big joins shuffle on their keys … use
bucketing for co-located joins". A table bucketed by its join key with
the same bucket count as its peer joins with NO Exchange on either side
— at 100 TB that removes the dominant cost of a fact-fact join (the
reference never joins, so this is pure engine surface).

Bucketing requires a managed table (metastore records the bucket spec),
hence ``saveAsTable`` rather than a bare ``parquet(path)`` write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed table bucketed (and sorted) by key."""
    w = df.write.bucketBy(buckets, key).mode("overwrite")
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys; Catalyst
    plans a SortMergeJoin with zero Exchange nodes."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], "inner")


#: (applicationId, sf_dir) → (orders_table, lineitem_table) already
#: written this session — the write is the build-once index cost (like
#: v05's IVF); every later call joins the existing bucketed tables.
_BUCKETED: dict[tuple[str, str], tuple[str, str]] = {}

#: key → the session that WROTE those tables: each session's tables
#: are dropped through its own catalog at exit (a later session's
#: in-memory catalog has no entry for them, and issuing drops through
#: a stopped context is a silent no-op)
_OWNERS: dict[tuple[str, str], SparkSession] = {}

#: one atexit hook per process (not per (app, sf_dir))
_ATEXIT_ARMED = False

#: filesystem reap age gate: a b01_* warehouse directory from a
#: FOREIGN session tag younger than this may belong to a concurrently
#: running session — never touch it
_REAP_MIN_AGE_S = 6 * 3600


def _session_tag(spark: SparkSession) -> str:
    """Stable per-session tag: the applicationId classically; under
    Spark Connect (no sparkContext) the Python session object's id,
    which is unique for the life of the session — exactly the life of
    its managed scratch tables."""
    try:
        return spark.sparkContext.applicationId
    except Exception:
        return f"connect_{id(spark):x}"


def _reap_stale_b01(
    spark: SparkSession, app_tag: str, prefixes: tuple[str, ...] = ("b01_",)
) -> None:
    """Remove ``prefixes``-named WAREHOUSE DIRECTORIES left by crashed
    sessions (b01's bucketed fact tables; graph.py's l02 bucketed edge
    table reuses this with its own prefix).

    This must be a filesystem sweep, not a catalog sweep: under the
    default in-memory catalog a killed JVM takes its catalog entries
    with it, so the next session's ``SHOW TABLES`` can never list the
    orphans — only their directories survive. Two safety rails:
    (1) age gate — a foreign-tag directory younger than
    ``_REAP_MIN_AGE_S`` may belong to a live concurrent session and is
    left alone; (2) catalog entries for foreign tags are never
    dropped — under a shared persistent metastore that would kill a
    running session's tables mid-query.  Non-local warehouse URIs
    (s3a://…) are skipped; object stores reap via lifecycle policies.
    """
    import shutil
    import time
    from urllib.parse import urlparse

    try:
        parsed = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
        if parsed.scheme not in ("", "file"):
            return
        wh = parsed.path
        if not wh or not os.path.isdir(wh):
            return
        now = time.time()
        for name in os.listdir(wh):
            full = os.path.join(wh, name)
            if (
                name.startswith(prefixes)
                and app_tag.lower() not in name.lower()
                and os.path.isdir(full)
                and now - os.path.getmtime(full) > _REAP_MIN_AGE_S
            ):
                shutil.rmtree(full, ignore_errors=True)
    except Exception:
        pass


def _bucketed_fact_tables(
    spark: SparkSession, sf_dir: str, buckets: int
) -> tuple[str, str]:
    import atexit
    import re

    from aw3d30_parquet_spark.operators.relational import _t

    global _ATEXIT_ARMED

    app = _session_tag(spark)
    key = (app, sf_dir)
    if key in _BUCKETED:
        return _BUCKETED[key]
    app_tag = re.sub(r"[^0-9a-zA-Z]+", "_", app)
    _reap_stale_b01(spark, app_tag)
    slug = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir).strip("_")
    tag = f"{app_tag}_{slug}"
    ot, lt = f"b01_orders_{tag}", f"b01_lineitem_{tag}"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = spark.table("lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(orders, ot, "o_orderkey", buckets=buckets)
    write_bucketed(lineitem, lt, "l_orderkey", buckets=buckets)
    # managed tables land under spark.sql.warehouse.dir — drop whatever
    # _BUCKETED holds at exit, each table through the session that
    # OWNS it (a restarted context can't drop a predecessor's tables;
    # those leak to the age-gated filesystem reap above instead)
    if not _ATEXIT_ARMED:
        _ATEXIT_ARMED = True

        def _drop_all() -> None:
            for k, pair in list(_BUCKETED.items()):
                owner = _OWNERS.get(k)
                if owner is not None:
                    for t in pair:
                        _drop_quietly(owner, t)

        atexit.register(_drop_all)
    _BUCKETED[key] = (ot, lt)
    _OWNERS[key] = spark
    return ot, lt


def _drop_quietly(spark: SparkSession, table: str) -> None:
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    except Exception:
        pass


def bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b01: fact-fact join with the shuffle ELIMINATED by bucketing —
    orders ⋈ lineitem on the order key, both sides written as managed
    tables bucketed (and sorted) by that key with the same bucket
    count, rolled up to revenue per order priority.

    This is the 100 TB posture claim made executable: a fact-fact join
    normally shuffles BOTH inputs on the join key every time it runs;
    bucketing pays that shuffle once at write time, and every
    subsequent join of the two tables plans as a SortMergeJoin with
    ZERO Exchange on either side (pinned by tests/test_bucketing.py on
    THIS function). At 100 TB the re-shuffle is the dominant cost of
    the pipeline's hottest join — bucketing turns it into a co-located
    merge.

    The oracle computes the identical relation from the original
    Parquet tables, so a hash match also certifies the bucketed
    write→read roundtrip lossless (f01's argument, applied to the
    bucketed writer). Table names carry the applicationId so
    concurrent sessions never collide; tables are dropped at exit.

    Bucket count is sized to the cluster (defaultParallelism, floor 8)
    rather than a constant: buckets cap the bucketed SCAN's task count,
    so a fixed count silently serializes the read as data grows — the
    10× probe measured buckets=8 at 1.49 s vs buckets=32 at 1.13 s on
    the same corpus (SCALING.md). At 100 TB the same knob is set to
    the cluster's core count; results are bucket-count-invariant, so
    the oracle hash is unaffected.
    """
    from aw3d30_parquet_spark.operators.relational import (
        _cents,
        _exact_money_sum,
    )

    from pyspark.sql import functions as F

    try:
        buckets = max(8, spark.sparkContext.defaultParallelism)
    except Exception:  # Spark Connect: no sparkContext — deploy default
        buckets = 32
    ot, lt = _bucketed_fact_tables(spark, sf_dir, buckets=buckets)
    joined = bucketed_equi_join(spark, ot, lt, "o_orderkey", "l_orderkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            _exact_money_sum(_cents(F.col("l_extendedprice")), "revenue"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {"b01_bucketed_fact_join": bucketed_fact_join}

ORACLE_SQL = {
    "b01_bucketed_fact_join": """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(floor(
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
}


#: (applicationId, sf_dir) → month-partitioned lineitem path already
#: written this session (b01's build-once pattern for the DPP fact).
_DPP_WRITTEN: dict[tuple[str, str], str] = {}


def dpp_partitioned_fact(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per session) lineitem partitioned by ship month —
    the layout DYNAMIC PARTITION PRUNING needs: pruning happens at the
    directory level, so the partition column IS the prune key."""
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.session import register_views
    from aw3d30_parquet_spark.sources.files import _export_dir

    # _session_tag, not bare applicationId: under Spark Connect there
    # is no sparkContext and the sibling memo patterns (graph.py,
    # text.py) already degrade instead of raising (ADVICE r5)
    key = (_session_tag(spark), sf_dir)
    if key in _DPP_WRITTEN:
        return _DPP_WRITTEN[key]
    register_views(spark, sf_dir)
    out = os.path.join(_export_dir(spark, sf_dir), "b02_lineitem_by_month")
    (
        spark.table("lineitem")
        .withColumn(
            "ship_month", F.date_format("l_shipdate", "yyyy-MM")
        )
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(out)
    )
    _DPP_WRITTEN[key] = out
    return out


def dpp_month_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b02: DYNAMIC PARTITION PRUNING — the third member of the
    physical-layout family (k01 salts hot keys, b01 removes the
    shuffle, this removes the SCAN): the month-partitioned fact is
    joined to a dimension whose qualifying months are only known at
    RUNTIME (Q1 urgent-order months), and Catalyst injects the dim's
    broadcast result as a `dynamicpruning` subquery INTO the fact
    scan's partition filters — three quarters of the fact's
    directories are never read. The plan pin
    (`tests/test_bucketing.py`) asserts the dynamicpruning expression
    sits on the scan; the oracle certifies the join result itself.

    At 100 TB this is THE mechanism that makes date-partitioned fact
    tables queryable: a selective dim filter prunes years of
    partitions without a manual date predicate on the fact.
    """
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.operators.relational import (
        _cents,
        _exact_money_sum,
    )
    from aw3d30_parquet_spark.session import register_views

    register_views(spark, sf_dir)
    fact = spark.read.parquet(dpp_partitioned_fact(spark, sf_dir))
    dim = (
        spark.table("orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.month("o_orderdate") <= 3)
        )
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("ship_month")
        )
        .distinct()
    )
    return (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n_items"),
            _exact_money_sum(_cents(F.col("l_extendedprice")), "revenue"),
        )
        .orderBy("ship_month")
    )


QUERIES["b02_dpp_month_join"] = dpp_month_join

ORACLE_SQL["b02_dpp_month_join"] = """
WITH dim AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
  FROM orders
  WHERE o_orderpriority = '1-URGENT' AND month(o_orderdate) <= 3
)
SELECT l.ship_month, count(*) AS n_items,
       CAST(floor(
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS revenue
FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             l_extendedprice
      FROM lineitem) l
JOIN dim ON dim.ship_month = l.ship_month
GROUP BY l.ship_month ORDER BY l.ship_month
"""
