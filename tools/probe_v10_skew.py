#!/usr/bin/env python
"""v10 IVF-parquet skew / K-scaling probe (SCALING.md evidence).

The exact-Lloyd IVF inherits whatever imbalance the data has: on the
``emb-skew`` corpus (make_scale10.py — ~1/3 of all vectors collapsed
onto one anchor direction, k01's hot-key fixture applied to vector
space) the hot region clusters into one partition, and a query NEAR
the anchor probes it — candidate volume ≈ corpus/3 per hot query
instead of ≈ corpus/K. This probe measures, per (k_clusters, query
cohort):

- index build seconds (one-time, per K),
- probe seconds (median of 3) for COLD queries (replica-0/base ids —
  the registered v10 shape) and HOT queries (replica 1's leading ids,
  which rank the anchor cluster first),
- the candidate row count each cohort's probe join actually
  materializes (hot-partition membership x queries hitting it).

K-scaling is the mitigation under test: Lloyd with more centroids
splits the hot blob into multiple sub-centroids, so a hot query's
n_probe=2 selection covers ~2/hot_centroids of the blob instead of
all of it. Usage::

    python tools/probe_v10_skew.py [corpus_dir] [K ...]

defaults: /tmp/embskew100, K in (8, 64).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _loadavg  # noqa: E402  (the ONE load-sampling idiom)

HOT_QUERY_LO = 100_000  # replica 1's leading ids (emb-skew anchors)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/embskew100"
    ks = [int(a) for a in sys.argv[2:]] or [8, 64]

    from pyspark.sql import functions as F

    from aw3d30_parquet_spark import scratch
    from aw3d30_parquet_spark.functions.vectors import (
        IVF_N_PROBE,
        _ivf_parquet_index,
        ann_topk_ivf_parquet,
    )
    from aw3d30_parquet_spark.session import get_spark

    spark = get_spark(app_name="v10-skew-probe")
    rows = []
    for k_clusters in ks:
        scratch.release_all()
        t0 = time.perf_counter()
        # salt_target=0: explicitly UNSALTED (since r8 the None default
        # derives the file-SLO salt policy) — this probe studies the
        # K-scaling dimension at the r7 fixed shape
        path, cents = _ivf_parquet_index(spark, corpus, k_clusters, salt_target=0)
        build_s = round(time.perf_counter() - t0, 2)
        sizes = (
            spark.read.parquet(path)
            .groupBy("cluster_id")
            .count()
            .orderBy(F.col("count").desc())
            .collect()
        )
        top = [(int(r["cluster_id"]), int(r["count"])) for r in sizes[:3]]
        for cohort, lo in (("cold", 0), ("hot", HOT_QUERY_LO)):
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                ann_topk_ivf_parquet(
                    spark, corpus, k_clusters=k_clusters, query_lo=lo,
                    n_probe=IVF_N_PROBE, salt_target=0,
                ).count()
                times.append(time.perf_counter() - t0)
            rows.append(
                {
                    "k_clusters": k_clusters,
                    "cohort": cohort,
                    "probe_sec_med": round(statistics.median(times), 2),
                    "probe_sec_max": round(max(times), 2),
                    "build_sec": build_s,
                    "top_clusters": top,
                    "candidates": _candidates(
                        spark, corpus, k_clusters, lo
                    ),
                    # post-measurement load: steal adjudication without
                    # cross-referencing uptime by hand (bench._loadavg)
                    "load": _loadavg(),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"corpus": corpus, "rows": rows}))


def _candidates(spark, corpus, k_clusters, query_lo) -> int:
    """Rows the probe join materializes: Σ over selected (query,
    cluster) of cluster membership — the cost driver the wall-clock
    numbers contextualize."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.functions.vectors import (
        DEFAULT_N_QUERIES,
        IVF_N_PROBE,
        _emb,
        _ivf_parquet_index,
        _kmeans_dist,
        _kmeans_xi,
    )

    path, cents = _ivf_parquet_index(spark, corpus, k_clusters, salt_target=0)
    cent = spark.createDataFrame(cents, "cid int, ci array<long>")
    queries = _emb(spark, corpus).filter(
        (F.col("vec_id") >= query_lo)
        & (F.col("vec_id") < query_lo + DEFAULT_N_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), _kmeans_xi().alias("xi"))
    wq = Window.partitionBy("query_id").orderBy("dist", "cid")
    probe = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("dist", _kmeans_dist("xi", "ci"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_N_PROBE)
        .select("query_id", F.col("cid").alias("cluster_id"))
    )
    sizes = spark.read.parquet(path).groupBy("cluster_id").count()
    return int(
        probe.join(sizes, "cluster_id")
        .agg(F.sum("count"))
        .collect()[0][0]
    )


if __name__ == "__main__":
    main()
