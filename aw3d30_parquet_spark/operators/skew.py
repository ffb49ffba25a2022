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

from pyspark.sql import DataFrame
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
