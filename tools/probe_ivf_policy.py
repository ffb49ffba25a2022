#!/usr/bin/env python
"""v10 derived-IVF-policy validation probe (VERDICT r8 #3).

The r8 policy (`_ivf_policy`: k = clamp(√N, 4..256), n_probe ≈ k/4,
salt_target from the 64 MB file SLO) was validated at sf0.1 and the
10× corpus only. This probe runs it at an arbitrary corpus — the 100×
emb corpus (`make_scale10.py <dir> 100 emb`, 200 k vectors) puts the
√N rule INTO its k=256 clamp (√200 000 ≈ 447) — and measures what the
verdict asked for:

- the derived (k, n_probe, salt_target) the policy produces;
- index BUILD wall-clock (the k-means + partitioned write, timed as
  the first `_ivf_parquet_index` call of the session);
- PROBE wall-clock (median of 3 materializations after build);
- recall@5 vs the exact brute-force v02 on the same query budget;
- the on-disk index file-size distribution (the 64 MB SLO's subject).

Usage: python tools/probe_ivf_policy.py [corpus_dir ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _loadavg  # noqa: E402  (the ONE load-sampling idiom)


def probe(spark, corpus: str) -> dict:
    from aw3d30_parquet_spark.functions import vectors as V

    def mat(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    out: dict = {"corpus": corpus, "load_start": _loadavg()}
    k, n_probe, salt = V._ivf_policy(spark, corpus)
    n = V._emb(spark, corpus).count()
    out["n_vectors"] = n
    out["policy"] = {"k": k, "n_probe": n_probe, "salt_target": salt}
    t0 = time.perf_counter()
    path, cents = V._ivf_parquet_index(spark, corpus)
    out["build_sec"] = round(time.perf_counter() - t0, 2)
    sizes = sorted(
        os.path.getsize(os.path.join(r, f))
        for r, _dirs, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    out["index_files"] = {
        "n": len(sizes),
        "min_b": sizes[0],
        "med_b": sizes[len(sizes) // 2],
        "max_b": sizes[-1],
        "total_mb": round(sum(sizes) / 1e6, 1),
    }
    mat(V.ann_topk_ivf_parquet(spark, corpus))  # warm-up after build
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        mat(V.ann_topk_ivf_parquet(spark, corpus))
        times.append(time.perf_counter() - t0)
    out["probe_sec_med"] = round(statistics.median(times), 2)
    out["probe_sec_minmax"] = [round(min(times), 2), round(max(times), 2)]
    exact = V.ann_topk_bruteforce(spark, corpus).toPandas()
    approx = V.ann_topk_ivf_parquet(spark, corpus).toPandas()
    es = set(zip(exact.query_id, exact.neighbor_id))
    vs = set(zip(approx.query_id, approx.neighbor_id))
    out["recall_at_5"] = round(len(es & vs) / len(es), 3)
    out["load_end"] = _loadavg()
    return out


def main() -> None:
    from aw3d30_parquet_spark.session import get_spark

    spark = get_spark(app_name="ivf-policy-probe")
    for corpus in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        print(json.dumps(probe(spark, corpus)), flush=True)


if __name__ == "__main__":
    main()
