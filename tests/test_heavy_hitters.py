"""a07 exact heavy hitters: Misra–Gries candidates + exact verify."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import aw3d30_parquet_spark.operators.relational as rel


def _write_tables(tmp_path, docs_rows):
    pd.DataFrame(docs_rows).to_parquet(tmp_path / "documents.parquet")
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        src = f"/root/testdata/sf0.001/{name}.parquet"
        (tmp_path / f"{name}.parquet").write_bytes(open(src, "rb").read())
    return str(tmp_path)


def test_a07_adversarial_long_tail(spark, tmp_path):
    """A corpus engineered against the candidate pass: a huge long
    tail of distinct once-only tokens (every one evicts MG counters)
    plus a handful of true heavy hitters. The exact output must equal
    the naive full groupBy."""
    rows = []
    # 3 heavy tokens: ~2000 each; long tail: 60k distinct singletons
    heavy = " ".join(f"hh{i % 3}" for i in range(6000))
    rows.append({"doc_id": 0, "text": heavy, "source": "h"})
    for d in range(60):
        tail = " ".join(f"tail{d}_{j}" for j in range(1000))
        rows.append({"doc_id": d + 1, "text": tail, "source": "t"})
    sf = _write_tables(tmp_path, rows)
    out = {
        (r.tok, r.cnt)
        for r in rel.a07_heavy_hitters(spark, sf).collect()
    }
    # exact truth: n = 66000 tokens, threshold n/200 = 330
    assert out == {("hh0", 2000), ("hh1", 2000), ("hh2", 2000)}


def test_a07_matches_naive_groupby_on_fixture(spark):
    sf = "/root/testdata/sf0.01"
    got = [
        (r.tok, r.cnt) for r in rel.a07_heavy_hitters(spark, sf).collect()
    ]
    from aw3d30_parquet_spark.session import register_views

    register_views(spark, sf)
    toks = spark.table("documents").select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    n = toks.count()
    want = [
        (r.tok, r.cnt)
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * rel.HH_K >= n)
        .orderBy(F.desc("cnt"), "tok")
        .collect()
    ]
    assert got == want
    assert len(got) > 0


def test_a07_verify_join_is_broadcast(spark):
    plan = (
        rel.a07_heavy_hitters(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
