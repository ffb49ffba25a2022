"""l01 fixed-iteration PageRank: pure-python twin + invariants."""

import pandas as pd

from tests.conftest import SF_SMOKE


def _python_pagerank(sf_dir: str):
    """Dict-and-loop recomputation with the operator's exact integer
    arithmetic (no Spark, no SQL)."""
    from aw3d30_parquet_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
        PR_SUPP_OFFSET,
        PR_TOP_K,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    pairs = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["l_suppkey", "o_custkey"]
        ]
        .drop_duplicates()
        .itertuples(index=False)
    )
    adj: dict[int, list[int]] = {}
    for s, c in ((int(s) + PR_SUPP_OFFSET, int(c)) for s, c in pairs):
        adj.setdefault(s, []).append(c)
        adj.setdefault(c, []).append(s)
    n = len(adj)
    tele = (3 * PR_SCALE // PR_DAMP_DEN) // n
    r = {v: PR_SCALE // n for v in adj}
    for _ in range(PR_ITERS):
        contrib: dict[int, int] = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            share = r[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += share
        r = {
            v: tele + (PR_DAMP_NUM * c) // PR_DAMP_DEN
            for v, c in contrib.items()
        }
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:PR_TOP_K]
    return n, r, top


def test_l01_pagerank_matches_python(spark):
    from aw3d30_parquet_spark.operators.graph import (
        pagerank_supplier_customer,
    )

    n, _, top = _python_pagerank(SF_SMOKE)
    rows = pagerank_supplier_customer(spark, SF_SMOKE).collect()
    got = [(r.node, r.rank_e12) for r in rows]
    assert got == top, (got[:3], top[:3])
    assert len(got) > 0 and n > len(got)  # top-k is a strict slice


def test_l01_rank_mass_conserved(spark):
    """Integer PageRank loses only floor dust — up to deg−1 units per
    node per division plus damping/teleport floors, a vanishing
    fraction of the 10^12 total. The 0.1% bound catches the real
    failure modes (double-counted edges ⇒ mass ≈ 2×; dropped side of
    the undirected union ⇒ mass collapse) with orders of magnitude of
    margin over floor dust."""
    from aw3d30_parquet_spark.operators.graph import PR_SCALE

    n, r, _ = _python_pagerank(SF_SMOKE)
    total = sum(r.values())
    assert 0 < PR_SCALE - total < PR_SCALE // 1000


def test_l01_no_cartesian_and_deterministic(spark):
    from aw3d30_parquet_spark.operators.graph import (
        pagerank_supplier_customer,
    )
    from aw3d30_parquet_spark.oracle import canonical_hash

    df1 = pagerank_supplier_customer(spark, SF_SMOKE)
    assert "CartesianProduct" not in df1._jdf.queryExecution().executedPlan().toString()
    h1 = canonical_hash(df1.toPandas())
    h2 = canonical_hash(
        pagerank_supplier_customer(spark, SF_SMOKE).toPandas()
    )
    assert h1 == h2


def test_l01_no_standalone_count_job(spark):
    """r6 (VERDICT #6): |nodes| rides a persisted 1-row consts relation
    broadcast into consumers instead of a standalone ``deg.count()``
    driver action. Pin: constructing the operator with ZERO iterations
    fires ZERO Spark jobs — the only construction-time actions left
    are the per-iteration lineage-cut materializations, so the old
    standalone count (which fired regardless of the iteration count)
    cannot silently come back. (Per-iteration job counts themselves
    are AQE-dependent and not pinnable.)"""
    from aw3d30_parquet_spark.operators.graph import (
        pagerank_supplier_customer,
    )

    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup())
    df = pagerank_supplier_customer(spark, SF_SMOKE, iters=0)
    assert set(st.getJobIdsForGroup()) == before  # lazy end to end
    assert df.columns == ["node", "rank_e12"]


def test_l02_bucketed_matches_l01(spark):
    """The co-located-iteration form is a pure physical-layout change:
    identical BIGINT arithmetic ⇒ identical ranks, row for row."""
    from aw3d30_parquet_spark.operators.graph import (
        pagerank_bucketed,
        pagerank_supplier_customer,
    )

    base = pagerank_supplier_customer(spark, SF_SMOKE).collect()
    bucketed = pagerank_bucketed(spark, SF_SMOKE).collect()
    assert bucketed == base


def test_l02_iteration_join_edge_side_no_exchange(spark):
    """The 1000-executor claim, plan-pinned: the per-iteration
    edge⋈rank join reads edge_deg from the src-bucketed table with
    ZERO Exchange on the edge side — the plan's ONE Exchange is the
    |nodes|-row rank relation shuffling into the bucket layout."""
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.operators.graph import (
        PR_SCALE,
        _bucketed_edge_deg,
        _l02_iteration_join,
    )
    from aw3d30_parquet_spark.plans import count_node, formatted_plan

    tbl = _bucketed_edge_deg(spark, SF_SMOKE)
    edge_deg = spark.table(tbl)
    # mimic the real loop's rank relation: coalesce() discards the
    # bucket layout, exactly like the persisted+coalesced ranks the
    # query iterates on — so the rank side NEEDS its one shuffle
    ranks = (
        edge_deg.groupBy("src")
        .agg(F.max("deg").alias("deg"))
        .select(F.col("src").alias("node"), F.lit(PR_SCALE).alias("r"))
        .coalesce(4)
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = _l02_iteration_join(edge_deg, ranks)
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # exactly 1 Exchange: the |nodes|-row rank side shuffling into
        # the bucket layout. Were the EDGE side shuffling, the
        # non-partitioned rank side would need one too → count 2.
        assert count_node(joined, "Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
