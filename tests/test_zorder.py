"""Z-order clustering: interleave correctness, oracle match, layout."""

import pytest

from aw3d30_parquet_spark.operators.zorder import (
    ORACLE_SQL,
    QUERIES,
    cluster_by_zvalue,
    zvalue,
)
from aw3d30_parquet_spark.oracle import compare

from tests.conftest import SF_T2


def _py_morton2(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 511, 1023) for b in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zvalue(["a", "b"], 10)).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton2(a, b, 10), (a, b)


def test_zvalue_rejects_overflow():
    with pytest.raises(ValueError):
        zvalue(["a", "b"], 32)


def test_q72_oracle_match(spark, duck_t2):
    ok, h1, h2 = compare(
        QUERIES["q72_zorder_cluster"](spark, SF_T2),
        duck_t2,
        ORACLE_SQL["q72_zorder_cluster"],
    )
    assert ok, f"q72: spark hash {h1} != duckdb hash {h2}"


def test_cluster_layout_partitions_cover_disjoint_z_ranges(spark):
    # clustered layout ⟹ every partition holds one contiguous z-range;
    # ranges of different partitions do not overlap
    import itertools

    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    clustered = cluster_by_zvalue(df, ["a", "b"], bits=5, num_partitions=4)
    per_part = clustered.rdd.glom().collect()
    ranges = [
        (min(r["_z"] for r in part), max(r["_z"] for r in part))
        for part in per_part
        if part
    ]
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in itertools.combinations(ranges, 2):
        assert hi1 < lo2 or hi2 < lo1, (ranges,)


def test_cluster_blocks_are_tight_rectangles(spark):
    # the layout guarantee q72 measures: a 256-wide z-block spans ≤16
    # cells per dimension (vs the 1024-cell domain)
    from pyspark.sql import functions as F

    rows = [((7 * i) % 1024, (13 * i) % 1024) for i in range(4096)]
    df = spark.createDataFrame(rows, "pk LONG, sk LONG")
    spans = (
        df.withColumn("z", zvalue(["pk", "sk"], 10))
        .withColumn("z_block", F.shiftright("z", 8))
        .groupBy("z_block")
        .agg(
            (F.max("pk") - F.min("pk")).alias("pk_span"),
            (F.max("sk") - F.min("sk")).alias("sk_span"),
        )
        .agg(F.max("pk_span").alias("p"), F.max("sk_span").alias("s"))
        .first()
    )
    assert spans.p <= 15 and spans.s <= 15, spans
