"""Skew mitigation for shuffle joins: key salting (SURVEY §2.2 posture
"skewed keys hurt … salting for skew, AQE for runtime re-plan").

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on by
default in this engine) handles most skew at runtime by splitting
oversized partitions. Salting is the *static* fallback for the cases
AQE can't fix — e.g. one hot key whose rows must still meet every
matching row of the other side:

- the skewed (big) side gets a uniform random salt in [0, n);
- the small side is replicated n times, once per salt value;
- the join key becomes (key, salt) → the hot key's rows spread across
  n shuffle partitions instead of one straggler task.

Results are exactly those of the unsalted join (verified in pytest by
hash equality); the cost is an n× replication of the small side —
bounded, since that side is small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on column ``on`` with key salting.

    Deterministic salt (hash of the row's other columns would not be —
    ``monotonically_increasing_id`` is partition-deterministic and never
    shuffles), uniform by construction.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt.cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = left.join(right, [on, "_salt"], how)
    return joined.drop("_salt")


def salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k01: the salted join exercised on a DELIBERATELY hot-keyed fact —
    the driver-visible proof that salting preserves join semantics.

    The skew fixture is deterministic: every third customer key in
    ``orders`` is remapped to key 1 (``o_custkey % 3 = 0 → 1``), so
    ~one third of the fact concentrates on a single customer — the "one
    viral user_id" shape AQE's skew split can mitigate but a static
    pipeline wants robust by construction. The hot fact is salted-joined
    to the ``customer`` dim on the remapped key and rolled up per market
    segment; the oracle runs the PLAIN join over the identical remap, so
    a hash match certifies the salt/replicate/join/drop round-trip is
    exactly the unsalted relation.

    Scale shape: the dim is replicated ``n_salts``× (bounded — it is
    small by construction), the fact's hot key spreads across 16 shuffle
    partitions instead of one straggler task, and the post-join rollup
    is an ordinary partial-agg groupBy. The (key, salt) shuffle is
    plan-pinned in tests/test_skew.py on THIS function with broadcast
    disabled.
    """
    from aw3d30_parquet_spark.operators.relational import (
        _cents,
        _exact_money_sum,
        _t,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = spark.table("customer")
    hot = orders.select(
        F.when(F.col("o_custkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey"),
        "o_totalprice",
    )
    dim = customer.select("c_custkey", "c_mktsegment")
    return (
        salted_join(hot, dim, "c_custkey", n_salts=16)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _exact_money_sum(_cents(F.col("o_totalprice")), "total"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES = {"k01_salted_hot_join": salted_hot_join}

ORACLE_SQL = {
    "k01_salted_hot_join": """
WITH hot AS (
  SELECT CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE o_custkey END AS c_custkey,
         o_totalprice
  FROM orders
)
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(floor(
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS total
FROM hot JOIN customer USING (c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
}
