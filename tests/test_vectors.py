"""V-tests: vector ops against numpy oracles (SURVEY §5.2)."""

import numpy as np
import pytest

from aw3d30_parquet_spark.functions.vectors import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
    embedding_neardup_pairs,
)

from tests.conftest import SF_SMOKE

K = 5
NQ = 20


@pytest.fixture(scope="module")
def emb_np():
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _numpy_topk(ids, mat, k=K, nq=NQ):
    """Exact cosine top-k oracle — ranked on the ROUNDED cosine with
    id tiebreak, matching v02's determinism contract (4-decimal
    precision is the operator's rank granularity)."""
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    out = {}
    for qi in range(len(ids)):
        if ids[qi] >= nq:
            continue
        cos = unit @ unit[qi]
        # exclude self; sort by (-floor-half-up-rounded cos, id) —
        # the same floor(x·10⁴+0.5) rounding the operator uses
        # (python round() is banker's and can differ at boundaries)
        cand = [
            (-(np.floor(float(cos[j]) * 10000 + 0.5) / 10000), int(ids[j]))
            for j in range(len(ids))
            if j != qi
        ]
        cand.sort()
        out[int(ids[qi])] = [nid for _, nid in cand[:k]]
    return out


def test_v2_bruteforce_matches_numpy(spark, emb_np):
    ids, mat = emb_np
    oracle = _numpy_topk(ids, mat)
    got = ann_topk_bruteforce(spark, SF_SMOKE, k=K, n_queries=NQ).collect()
    got_map = {}
    for row in got:
        got_map.setdefault(row.query_id, []).append(row.neighbor_id)
    assert set(got_map) == set(oracle)
    for q in oracle:
        assert got_map[q] == oracle[q], f"query {q}: {got_map[q]} != {oracle[q]}"


def test_v3_lsh_recall(spark, emb_np):
    ids, mat = emb_np
    oracle = _numpy_topk(ids, mat)
    got = ann_topk_lsh(spark, SF_SMOKE, k=K, n_queries=NQ).collect()
    got_map = {}
    for row in got:
        got_map.setdefault(row.query_id, set()).add(row.neighbor_id)
    hits = total = 0
    for q, truth in oracle.items():
        hits += len(set(truth) & got_map.get(q, set()))
        total += len(truth)
    recall = hits / total
    assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8"


def test_v5_ivf_recall(spark, emb_np):
    # seed-pinned k-means ⇒ deterministic 0.86 at the default 16/8;
    # bound leaves margin for MLlib init-algorithm drift across versions
    ids, mat = emb_np
    oracle = _numpy_topk(ids, mat)
    got = ann_topk_ivf(spark, SF_SMOKE, k=K, n_queries=NQ).collect()
    got_map = {}
    for row in got:
        got_map.setdefault(row.query_id, set()).add(row.neighbor_id)
    hits = total = 0
    for q, truth in oracle.items():
        hits += len(set(truth) & got_map.get(q, set()))
        total += len(truth)
    recall = hits / total
    assert recall >= 0.75, f"IVF recall {recall:.2f} < 0.75"


def test_v6_pq_recall(spark, emb_np):
    # seed-pinned sample k-means ⇒ deterministic codebooks; with exact
    # rerank over 100 ADC candidates the bound leaves ample margin
    from aw3d30_parquet_spark.functions.vectors import ann_topk_pq

    ids, mat = emb_np
    oracle = _numpy_topk(ids, mat)
    got = ann_topk_pq(spark, SF_SMOKE, k=K, n_queries=NQ).collect()
    got_map = {}
    for row in got:
        got_map.setdefault(row.query_id, set()).add(row.neighbor_id)
    hits = total = 0
    for q, truth in oracle.items():
        hits += len(set(truth) & got_map.get(q, set()))
        total += len(truth)
    recall = hits / total
    assert recall >= 0.75, f"PQ recall {recall:.2f} < 0.75"


def test_v4_neardup_pairs_exact_subset(spark, emb_np):
    ids, mat = emb_np
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    cos = unit @ unit.T
    truth = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cos[i, j] > 0.9995:  # margin above the 0.999 threshold
                truth.add((int(ids[i]), int(ids[j])))
    got = {
        (row.id_a, row.id_b)
        for row in embedding_neardup_pairs(spark, SF_SMOKE).collect()
    }
    # every comfortably-above-threshold pair must be found
    missed = truth - got
    assert not missed, f"near-dup pairs missed: {sorted(missed)[:5]}"


def test_v4_neardup_finds_injected_duplicates(spark, emb_np):
    """Non-vacuous near-dup check: clone 5 vectors with tiny noise
    (cos > 0.9999) under shifted ids — the banded-LSH join must find
    every injected pair and nothing below threshold."""
    import pandas as pd

    from aw3d30_parquet_spark.functions.vectors import _neardup_pairs_df

    ids, mat = emb_np
    rng = np.random.default_rng(7)
    clones = mat[:5] + rng.normal(0, 1e-4, mat[:5].shape)
    all_ids = np.concatenate([ids, ids[:5] + 1_000_000])
    all_mat = np.concatenate([mat, clones])
    pdf = pd.DataFrame(
        {
            "vec_id": all_ids.astype("int64"),
            "embedding": [row.astype("float32") for row in all_mat],
        }
    )
    emb = spark.createDataFrame(pdf)
    got = {
        (row.id_a, row.id_b) for row in _neardup_pairs_df(emb).collect()
    }
    want = {(int(i), int(i) + 1_000_000) for i in ids[:5]}
    assert want <= got, f"missed injected pairs: {sorted(want - got)}"
    # nothing spurious: every reported pair must truly clear the bar
    unit = all_mat / np.linalg.norm(all_mat, axis=1)[:, None]
    by_id = {int(v): i for i, v in enumerate(all_ids)}
    for ia, ib in got:
        cos = float(unit[by_id[ia]] @ unit[by_id[ib]])
        assert cos >= 0.999 - 1e-9, (ia, ib, cos)


def test_v7_semantic_dedup_matches_numpy(spark, emb_np):
    """V7: the SemDeDup drop set equals a numpy recomputation — same
    axis-sign clustering, same rounded-cosine keeper rule."""
    from aw3d30_parquet_spark.functions.vectors import (
        SEMDEDUP_TAU,
        semantic_dedup,
        semdedup_bits,
    )

    ids, mat = emb_np
    bits = semdedup_bits(len(ids))
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    signs = (mat[:, :bits] > 0).astype(int)
    weights = 2 ** np.arange(bits - 1, -1, -1)
    cids = signs @ weights
    want = {}
    for j in range(len(ids)):
        best = None
        for i in range(len(ids)):
            if ids[i] >= ids[j] or cids[i] != cids[j]:
                continue
            cos = np.floor(float(unit[i] @ unit[j]) * 10000 + 0.5) / 10000
            if cos < SEMDEDUP_TAU:
                continue
            key = (-cos, int(ids[i]))
            if best is None or key < best:
                best = key
        if best is not None:
            want[int(ids[j])] = (int(cids[j]), best[1], -best[0])
    rows = semantic_dedup(spark, SF_SMOKE).collect()
    got = {
        r.dropped_id: (r.cluster_id, r.keeper_id, r.cos) for r in rows
    }
    assert set(got) == set(want), (
        sorted(set(got) ^ set(want))[:5]
    )
    for d, (cid, kid, cos) in want.items():
        gcid, gkid, gcos = got[d]
        assert (gcid, gkid) == (cid, kid), (d, got[d], want[d])
        assert abs(gcos - cos) < 1e-9, (d, gcos, cos)
    # non-vacuous on the fixture: the drop path must actually fire
    assert len(got) > 0


def test_v8_range_search_matches_numpy(spark, emb_np):
    """V8: the radius result set equals a numpy recomputation — same
    rounded-cosine gate, same per-query hit counts."""
    from aw3d30_parquet_spark.functions.vectors import (
        DEFAULT_N_QUERIES,
        RANGE_SEARCH_TAU,
        cosine_range_search,
    )

    ids, mat = emb_np
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    want = {}
    counts = {}
    for qi in range(len(ids)):
        if ids[qi] >= DEFAULT_N_QUERIES:
            continue
        hits = []
        for ci in range(len(ids)):
            if ci == qi:
                continue
            cos = np.floor(float(unit[qi] @ unit[ci]) * 10000 + 0.5) / 10000
            if cos >= RANGE_SEARCH_TAU:
                hits.append((int(ids[ci]), cos))
        for nid, cos in hits:
            want[(int(ids[qi]), nid)] = cos
        if hits:
            counts[int(ids[qi])] = len(hits)
    rows = cosine_range_search(spark, SF_SMOKE).collect()
    got = {(r.query_id, r.neighbor_id): r.cos for r in rows}
    got_counts = {r.query_id: r.n_hits for r in rows}
    assert set(got) == set(want)
    for k, cos in want.items():
        assert abs(got[k] - cos) < 1e-9, (k, got[k], cos)
    assert got_counts == counts
    assert len(got) > 0


def test_v9_kmeans_matches_python(spark, emb_np):
    """V9: the fixed-iteration exact-integer Lloyd output equals a
    pure-python recomputation (same scaled components, floor-mean
    update, (dist, cid) tie-break)."""
    from aw3d30_parquet_spark.functions.vectors import (
        KMEANS_ITERS,
        KMEANS_K,
        KMEANS_SCALE,
        kmeans_fixed,
    )

    ids, mat = emb_np
    xi = {
        int(ids[i]): [
            int(np.floor(float(v) * KMEANS_SCALE + 0.5)) for v in mat[i]
        ]
        for i in range(len(ids))
    }
    cent = {v: list(xi[v]) for v in sorted(xi) if v < KMEANS_K}

    def assign(cent):
        out = {}
        for v, x in xi.items():
            best = None
            for cid in sorted(cent):
                d = sum((a - b) * (a - b) for a, b in zip(x, cent[cid]))
                if best is None or (d, cid) < best[:2]:
                    best = (d, cid)
            out[v] = best
        return out

    a = assign(cent)
    for _ in range(KMEANS_ITERS - 1):
        new = {}
        for cid in {c for _, c in a.values()}:
            members = [xi[v] for v, (_, c) in a.items() if c == cid]
            ncomp = []
            for j in range(len(members[0])):
                s = sum(m[j] for m in members)
                q = abs(s) // len(members)
                ncomp.append(q if s >= 0 else -q)  # truncate toward 0
            new[cid] = ncomp
        a = assign(new)
    want = {}
    for v, (d, cid) in a.items():
        n, inert = want.get(cid, (0, 0))
        want[cid] = (n + 1, inert + d)
    rows = kmeans_fixed(spark, SF_SMOKE).collect()
    got = {r.cluster_id: (r.n_members, r.inertia) for r in rows}
    assert got == want
    assert sum(n for n, _ in got.values()) == len(ids)


def test_v10_ivf_parquet_pruned_probe(spark):
    """v10: the disk-backed IVF probe must (a) carry a dynamic-
    partition-pruning expression on the index scan's PartitionFilters
    (the pruning IS the operator's scale claim — n_probe of k_clusters
    directories read), (b) rank identically across invocations, and
    (c) keep recall vs the exact v02 top-k above the floor under the
    corpus-derived r8 policy defaults (k=22, n_probe=6 on this
    fixture; was the hand-picked 2-of-8 before r8)."""
    from aw3d30_parquet_spark.functions.vectors import (
        ann_topk_bruteforce,
        ann_topk_ivf_parquet,
    )
    from aw3d30_parquet_spark.oracle import canonical_hash

    df = ann_topk_ivf_parquet(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, "index scan is not partition-pruned"
    p1 = df.toPandas()
    assert canonical_hash(p1) == canonical_hash(
        ann_topk_ivf_parquet(spark, SF_SMOKE).toPandas()
    )
    exact = ann_topk_bruteforce(spark, SF_SMOKE).toPandas()
    es = set(zip(exact.query_id, exact.neighbor_id))
    vs = set(zip(p1.query_id, p1.neighbor_id))
    # measured 0.94 smoke under the r8 derived policy (k=22, np=6);
    # was 0.71 at the hand-picked k=8, np=2
    assert len(es & vs) / len(es) >= 0.6
    # every returned neighbor must come from a probed cluster of its
    # own query — cross-query leakage would show as rank inflation
    assert list(p1.groupby("query_id").size().unique()) == [5]


def test_v10_policy_derivation(spark):
    """r8: index knobs are corpus-derived policy, not hand-picked —
    k = clamp(√N), n_probe = max(2, ⌈k/4⌉) (the ~¼ read fraction).
    r9 (ADVICE r8): salt_target comes from the 64 MB file SLO over a
    FIXED logical row-width model (4 B/element + constant overhead) —
    a pure function of (N, dim), so the index layout no longer varies
    with parquet codec/version/filesystem across environments.
    Explicit overrides still win (the probe tools rely on that)."""
    import math

    import pyspark.sql.functions as F

    from aw3d30_parquet_spark.functions.vectors import (
        IVF_FILE_SLO_BYTES,
        IVF_ROW_OVERHEAD_BYTES,
        IVF_SALT_MIN_ROWS,
        _emb,
        _ivf_policy,
    )

    k, np_, salt = _ivf_policy(spark, SF_SMOKE)
    n = _emb(spark, SF_SMOKE).count()
    assert k == max(4, min(256, int(math.floor(math.sqrt(n) + 0.5))))
    assert np_ == max(2, -(-k // 4))
    dim = _emb(spark, SF_SMOKE).select(F.size("embedding")).first()[0]
    assert salt == max(
        IVF_SALT_MIN_ROWS,
        IVF_FILE_SLO_BYTES // (4 * dim + IVF_ROW_OVERHEAD_BYTES),
    )
    # the model is environment-free: same (N, dim) → same layout
    assert salt == _ivf_policy(spark, SF_SMOKE)[2]


def test_v10_salted_layout_identical_and_pruned(spark):
    """The salted index layout (sub-partition oversized clusters by
    xxhash64(vec_id) mod buckets) is a pure PHYSICAL change: identical
    result rows to the default layout, dynamic partition pruning on
    cluster_id intact, and the on-disk tree actually carries salt=
    sub-directories for clusters above the target."""
    import glob
    import os

    from aw3d30_parquet_spark.functions.vectors import (
        _ivf_parquet_index,
        ann_topk_ivf_parquet,
    )
    from aw3d30_parquet_spark.oracle import canonical_hash

    base = ann_topk_ivf_parquet(spark, SF_SMOKE).toPandas()
    salted = ann_topk_ivf_parquet(spark, SF_SMOKE, salt_target=50)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, "salted scan lost partition pruning"
    assert canonical_hash(salted.toPandas()) == canonical_hash(base)
    path, _ = _ivf_parquet_index(spark, SF_SMOKE, salt_target=50)
    subdirs = glob.glob(os.path.join(path, "cluster_id=*", "salt=*"))
    assert subdirs, "no salt sub-partitions written"


def test_kmeans_argmin_kernel_exact_and_guarded():
    """r9: the vectorized assignment kernel (float64 BLAS in disguise)
    must (a) reproduce exact int64 squared-L2 distances, (b) break
    distance ties toward the SMALLEST cid (the (dist, cid) ordering
    the v09/v10 oracles pin), and (c) raise past the exactness bound
    instead of silently rounding."""
    import pandas as pd

    from aw3d30_parquet_spark.functions.vectors import (
        KMEANS_UDF_ABS_MAX,
        _kmeans_argmin_kernel,
    )

    rng = np.random.default_rng(5)
    dim, k, n = 64, 7, 40
    cmat = rng.integers(-(10**6), 10**6, size=(k, dim), dtype=np.int64)
    cids = np.arange(10, 10 + k, dtype=np.int64)
    x = rng.integers(-(10**6), 10**6, size=(n, dim), dtype=np.int64)
    # rows 0/1 duplicate centroids 3 and 0 exactly (dist 0, unique min)
    x[0], x[1] = cmat[3], cmat[0]
    pdf = pd.DataFrame({"vec_id": np.arange(n), "xi": list(x)})
    out = pd.concat(list(_kmeans_argmin_kernel(cids, cmat)([pdf])))
    # exact int64 reference (python ints -> no overflow possible)
    for i in range(n):
        ds = [
            (sum((int(a) - int(b)) ** 2 for a, b in zip(x[i], cmat[j])), int(cids[j]))
            for j in range(k)
        ]
        want = min(ds)
        assert (out.iloc[i]["dist"], out.iloc[i]["cid"]) == want, i
    # tie-break: duplicate centroid -> equal dists for the duplicated
    # rows of cmat; fabricate two identical centroids and check the
    # smaller cid wins
    cmat2 = np.vstack([cmat[0], cmat[0]])
    cids2 = np.array([5, 6], np.int64)
    pdf2 = pd.DataFrame({"vec_id": [0], "xi": [cmat[0]]})
    out2 = pd.concat(list(_kmeans_argmin_kernel(cids2, cmat2)([pdf2])))
    assert (out2.iloc[0]["dist"], out2.iloc[0]["cid"]) == (0, 5)
    # exactness at the corner: components at bound-1 with opposite
    # signs maximize dist = 4*dim*M^2 — the case the r9 review showed
    # the old 10^7 bound got wrong by 3 integer ulps
    from aw3d30_parquet_spark.functions.vectors import _kmeans_exact_bound

    m = _kmeans_exact_bound(dim) - 1
    corner_c = np.full((1, dim), -m, np.int64)
    corner_c[0, -1] = -(m - 1)
    corner_x = np.full(dim, m, np.int64)
    out3 = pd.concat(
        list(
            _kmeans_argmin_kernel(np.array([0], np.int64), corner_c)(
                [pd.DataFrame({"vec_id": [0], "xi": [corner_x]})]
            )
        )
    )
    want3 = sum(
        (int(a) - int(b)) ** 2 for a, b in zip(corner_x, corner_c[0])
    )
    assert int(out3.iloc[0]["dist"]) == want3
    # overflow guard (vector side and centroid side)
    bad = pd.DataFrame(
        {"vec_id": [0], "xi": [np.full(dim, KMEANS_UDF_ABS_MAX, np.int64)]}
    )
    with pytest.raises(ValueError, match="exact-float64 bound"):
        list(_kmeans_argmin_kernel(cids, cmat)([bad]))
    with pytest.raises(ValueError, match="exact-float64 bound"):
        _kmeans_argmin_kernel(
            cids, np.full((k, dim), KMEANS_UDF_ABS_MAX, np.int64)
        )


def test_v7_group_collapsed_equals_pairwise_and_numpy(spark, tmp_path):
    """r12: the duplicate-saturated arm (_v07_group_collapsed) is
    byte-identical to the direct pairwise arm AND to a numpy brute
    force, on a corpus built to hit every tricky branch: exact
    replicas (closed-form within-group keepers), a scaled twin pair
    (two DISTINCT vectors with rounded cos 1.0 — the cross-group
    keeper must beat the own-group min by id at equal cosine), and
    sign-colliding base vectors (multi-group clusters). The gate must
    pick the collapsed arm here (pair volume >> collapsed volume) and
    the pairwise arm on the duplicate-free smoke fixture."""
    import shutil

    import pandas as pd

    from aw3d30_parquet_spark.functions import vectors as vv

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents"
    ).split():
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", tmp_path / f"{t}.parquet")
    rng = np.random.default_rng(42)
    base = rng.normal(size=(16, 64)).astype(np.float64)
    base[3] = base[1] * 3.0  # distinct vector, same direction: the
    # rounded cross-group cosine is 1.0, tying the within-group 1.0
    reps = 40
    ids, mat = [], []
    for i in range(16):
        for r in range(reps):
            ids.append(i * 10 + r * 1000)  # interleave ids across groups
            mat.append(base[i])
    ids = np.array(ids, dtype=np.int64)
    mat = np.array(mat)
    pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [row.astype(np.float32) for row in mat],
            "label": "x",
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    sf = str(tmp_path)
    df_collapsed = vv.semantic_dedup(spark, sf)
    # the collapsed arm only compiles on duplicate-saturated corpora,
    # so the suite-wide hygiene walk (which runs at sf0.01, pairwise)
    # never sees it — pin its plan hygiene here
    plan = df_collapsed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    got_collapsed = df_collapsed.collect()
    n, pair_cand, grp_cand = vv._V07_GATE_MEMO[
        next(k for k in vv._V07_GATE_MEMO if k[1] == sf)
    ]
    assert n == 16 * reps
    assert pair_cand > vv.V07_PAIRWISE_RATIO_CAP * (grp_cand + n), (
        "fixture must exercise the collapsed arm"
    )
    old_cap = vv.V07_PAIRWISE_RATIO_CAP
    try:
        vv.V07_PAIRWISE_RATIO_CAP = float("inf")
        got_pairwise = vv.semantic_dedup(spark, sf).collect()
    finally:
        vv.V07_PAIRWISE_RATIO_CAP = old_cap
    assert got_collapsed == got_pairwise  # byte-identical arms

    # independent numpy truth (the v07 semantics from first principles)
    bits = vv.semdedup_bits(len(ids))
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    signs = (mat[:, :bits] > 0).astype(int)
    cids = signs @ (2 ** np.arange(bits - 1, -1, -1))
    want = {}
    for j in range(len(ids)):
        best = None
        for i in range(len(ids)):
            if ids[i] >= ids[j] or cids[i] != cids[j]:
                continue
            cos = np.floor(float(unit[i] @ unit[j]) * 10000 + 0.5) / 10000
            if cos < vv.SEMDEDUP_TAU:
                continue
            key = (-cos, int(ids[i]))
            if best is None or key < best:
                best = key
        if best is not None:
            want[int(ids[j])] = (int(cids[j]), best[1], -best[0])
    got = {
        r.dropped_id: (r.cluster_id, r.keeper_id, r.cos)
        for r in got_collapsed
    }
    assert set(got) == set(want)
    for d, (cid, kid, cos) in want.items():
        gcid, gkid, gcos = got[d]
        assert (gcid, gkid) == (cid, kid), (d, got[d], want[d])
        assert abs(gcos - cos) < 1e-9, (d, gcos, cos)
    # the scaled-twin tie: members of base[3]'s group (min id 30) must
    # keep base[1]'s group min (id 10) — equal rounded cos 1.0, lower id
    assert got[30][1] == 10

    # duplicate-free fixture: the gate must keep the pairwise arm
    vv.semantic_dedup(spark, SF_SMOKE)  # compile populates the memo
    key = next(k for k in vv._V07_GATE_MEMO if k[1] == SF_SMOKE)
    n2, p2, g2 = vv._V07_GATE_MEMO[key]
    assert p2 <= vv.V07_PAIRWISE_RATIO_CAP * (g2 + n2)
