"""V-tests for text + dedup ops without a SQL oracle: lang-ID vs a pandas
reimplementation, SimHash invariants, MinHash recall vs exact Jaccard."""

import re

import pandas as pd
import pytest

from aw3d30_parquet_spark.functions.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from aw3d30_parquet_spark.functions.text import LANG_STOPWORDS, lang_id

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


def test_lang_id_matches_pandas(spark, docs_pdf):
    got = {
        row.doc_id: row.pred_lang
        for row in lang_id(spark, SF_SMOKE).collect()
    }
    langs = list(LANG_STOPWORDS)
    for _, rec in docs_pdf.iterrows():
        toks = re.split(r"\s+", rec["text"].strip())
        hits = {
            lang: sum(t in set(words) for t in toks)
            for lang, words in LANG_STOPWORDS.items()
        }
        best = max(hits.values())
        pred = "unk"
        if best > 0:
            pred = next(l for l in langs if hits[l] == best)
        assert got[rec["doc_id"]] == pred, rec["doc_id"]


def test_simhash_invariants(spark, docs_pdf):
    rows = simhash(spark, SF_SMOKE).collect()
    sigs = {row.doc_id: row.simhash_bits for row in rows}
    assert all(len(s) == 64 for s in sigs.values())
    # deterministic: recompute → identical signatures
    again = {r.doc_id: r.simhash_bits for r in simhash(spark, SF_SMOKE).collect()}
    assert sigs == again

    def ham(a, b):
        return sum(x != y for x, y in zip(sigs[a], sigs[b]))

    # near-dup (high-Jaccard) pairs must be far closer in Hamming space
    # than arbitrary pairs (~32 expected for independent docs)
    near = [
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
        if r.jaccard >= 0.8
    ]
    assert near, "fixture should contain high-Jaccard near-duplicates"
    near_mean = sum(ham(a, b) for a, b in near) / len(near)
    ids = sorted(sigs)
    rand_pairs = [(ids[i], ids[(i * 7 + 13) % len(ids)]) for i in range(100)]
    rand_pairs = [(a, b) for a, b in rand_pairs if a != b]
    rand_mean = sum(ham(a, b) for a, b in rand_pairs) / len(rand_pairs)
    assert near_mean < rand_mean / 2, f"near {near_mean} vs random {rand_mean}"


def test_minhash_recall_vs_exact(spark):
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
        if r.jaccard >= 0.7  # comfortably above the LSH threshold
    }
    approx = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(spark, SF_SMOKE).collect()
    }
    assert exact, "fixture should contain near-duplicates"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"MinHash recall {recall:.2f} < 0.9"


def test_d07_prefix_variant_equals_d04(spark):
    """The prefix-filtered Jaccard join (scale variant) produces exactly
    the inverted-index relation — candidate pruning is lossless."""
    from aw3d30_parquet_spark.functions.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from aw3d30_parquet_spark.oracle import canonical_hash

    sf = "/root/testdata/sf0.01"
    h_direct = canonical_hash(ngram_jaccard_pairs(spark, sf).toPandas())
    h_prefix = canonical_hash(ngram_jaccard_pairs_prefix(spark, sf).toPandas())
    assert h_direct == h_prefix


def test_d08_union_find_equals_label_propagation(spark):
    """The size-gated driver union-find path and the distributed
    label-propagation path produce identical clusters (same keepers,
    sizes, and member strings)."""
    from aw3d30_parquet_spark.functions.dedup import neardup_components
    from aw3d30_parquet_spark.oracle import canonical_hash

    sf = "/root/testdata/sf0.01"
    via_uf = neardup_components(spark, sf).toPandas()
    via_lp = neardup_components(spark, sf, driver_edge_cap=0).toPandas()
    assert len(via_uf) > 0, "fixture should contain near-dup clusters"
    assert canonical_hash(via_uf) == canonical_hash(via_lp)


def test_d08_member_cap_bounds_row_width(spark):
    """A cluster larger than MEMBER_CAP lists exactly MEMBER_CAP
    member ids while cluster_size keeps the true count."""
    import aw3d30_parquet_spark.functions.dedup as dd

    orig = dd.MEMBER_CAP
    dd.MEMBER_CAP = 2
    try:
        out = dd.neardup_components(spark, "/root/testdata/sf0.01").collect()
    finally:
        dd.MEMBER_CAP = orig
    big = [r for r in out if r.cluster_size > 2]
    assert big, "fixture should contain a cluster larger than the cap"
    for r in big:
        assert len(r.members.split(",")) == 2
        # keeper (the min label) is always in the sorted sample prefix
        assert r.members.split(",")[0] == str(r.keeper)


def test_d11_editdist_prefix_equals_d10(spark):
    """The ED-Join rare-gram prefix variant produces exactly the
    count-filter relation — prefix candidate pruning is lossless
    (and the fixture must actually exercise it)."""
    from aw3d30_parquet_spark.functions.dedup import (
        qgram_editdist_pairs,
        qgram_editdist_pairs_prefix,
    )
    from aw3d30_parquet_spark.oracle import canonical_hash

    sf = "/root/testdata/sf0.01"
    direct = qgram_editdist_pairs(spark, sf).toPandas()
    prefix = qgram_editdist_pairs_prefix(spark, sf).toPandas()
    assert len(direct) > 0, "fixture should contain edit-dist pairs"
    assert canonical_hash(direct) == canonical_hash(prefix)


def test_d11_prefix_covers_adversarial_tie_boundary(spark, tmp_path):
    """Duplicate grams tied at the prefix boundary are the case the
    tie-extension exists for: strings made of ONE repeated character
    have 22 identical grams (every occurrence ties with the boundary),
    and every within-distance pair must still surface."""
    import pandas as pd

    from aw3d30_parquet_spark.functions.dedup import (
        qgram_editdist_pairs,
        qgram_editdist_pairs_prefix,
    )

    rows = []
    # aaa…a vs aaa…ab-style: distance ≤ 5 via suffix substitutions
    for i in range(6):
        rows.append({
            "doc_id": i,
            "text": "a" * (24 - i) + "b" * i,
            "source": "t",
        })
    # plus a far-away string (all c's) that must NOT pair with the a's
    rows.append({"doc_id": 99, "text": "c" * 24, "source": "t"})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        src = f"/root/testdata/sf0.001/{name}.parquet"
        (tmp_path / f"{name}.parquet").write_bytes(
            open(src, "rb").read()
        )
    sf = str(tmp_path)
    direct = {
        (r.id_a, r.id_b, r.dist)
        for r in qgram_editdist_pairs(spark, sf).collect()
    }
    prefix = {
        (r.id_a, r.id_b, r.dist)
        for r in qgram_editdist_pairs_prefix(spark, sf).collect()
    }
    assert direct == prefix
    assert (0, 1, 1) in prefix and (0, 5, 5) in prefix
    assert not any(99 in (a, b) for a, b, _ in prefix)


def test_d12_pipeline_audit_with_injected_exact_dups(spark, tmp_path):
    """End-to-end pipeline audit on a corpus with BOTH fates present:
    exact copies must count as exact_dup (never double-counted as
    near-dup), near-dup cluster non-keepers as near_dup, and totals
    must add up per source."""
    import pandas as pd

    base = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    extra = base.head(10).copy()  # exact copies of 10 existing texts
    extra["doc_id"] = extra["doc_id"] + 1_000_000
    extra["source"] = "copies"
    docs = pd.concat([base, extra], ignore_index=True)
    docs.to_parquet(tmp_path / "documents.parquet")
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        src = f"/root/testdata/sf0.001/{name}.parquet"
        (tmp_path / f"{name}.parquet").write_bytes(open(src, "rb").read())

    import aw3d30_parquet_spark.functions.dedup as dd
    from aw3d30_parquet_spark.oracle import canonical_hash

    out = dd.dedup_pipeline_audit(spark, str(tmp_path)).toPandas()
    copies = out[out.source == "copies"].iloc[0]
    assert copies.n_docs == 10
    assert copies.n_exact_dup == 10  # originals have lower doc_ids
    assert copies.n_near_dup == 0 and copies.n_kept == 0
    assert (
        out.n_exact_dup + out.n_near_dup + out.n_kept == out.n_docs
    ).all()
    assert out.n_near_dup.sum() > 0, "fixture should have near-dups"
    # distributed path identical
    out2 = dd.dedup_pipeline_audit(
        spark, str(tmp_path), driver_edge_cap=0
    ).toPandas()
    assert canonical_hash(out) == canonical_hash(out2)


def test_d11_lossless_on_random_low_entropy_corpora(spark, tmp_path):
    """Randomized ground-truth check: on low-entropy alphabets (maximal
    gram duplication — the regime where prefix-filter tie handling can
    silently drop pairs) d11's output must equal a direct DP
    Levenshtein over all pairs, for several seeded corpora."""
    import numpy as np
    import pandas as pd

    from aw3d30_parquet_spark.functions.dedup import (
        EDIT_D,
        EDIT_PREFIX,
        qgram_editdist_pairs_prefix,
    )

    def lev(a: str, b: str) -> int:
        prev = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            cur = np.empty(len(b) + 1, dtype=np.int64)
            cur[0] = i
            for j, cb in enumerate(b, 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            prev = cur
        return int(prev[-1])

    for seed in (7, 23):
        rng = np.random.default_rng(seed)
        # 6 base strings, 5 mutants each (0–5 random substitutions):
        # within-cluster pairs are true matches, cross-cluster mostly
        # not — and the 3-letter alphabet makes every gram hot
        texts = []
        for _ in range(6):
            base = rng.choice(list("abc"), EDIT_PREFIX)
            for m in range(5):
                s = base.copy()
                pos = rng.choice(EDIT_PREFIX, size=m, replace=False)
                s[pos] = rng.choice(list("abc"), m)
                texts.append("".join(s))
        d = tmp_path / f"corpus{seed}"
        d.mkdir()
        pd.DataFrame(
            {
                "doc_id": range(30),
                "text": texts,
                "source": ["r"] * 30,
            }
        ).to_parquet(d / "documents.parquet")
        for name in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "embeddings",
        ]:
            src = f"/root/testdata/sf0.001/{name}.parquet"
            (d / f"{name}.parquet").write_bytes(open(src, "rb").read())
        truth = {
            (i, j, lev(texts[i], texts[j]))
            for i in range(30)
            for j in range(i + 1, 30)
            if lev(texts[i], texts[j]) <= EDIT_D
        }
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in qgram_editdist_pairs_prefix(spark, str(d)).collect()
        }
        assert got == truth, f"seed {seed}: {truth - got} missing"
        assert truth, f"seed {seed}: degenerate fixture (no pairs)"


def test_d13_incremental_equals_d10_boundary_pairs(spark):
    """d13 (snapshot-vs-corpus slice) must produce exactly the d10
    pairs that CROSS the snapshot boundary — the asymmetric count
    filter loses nothing the symmetric one finds."""
    from aw3d30_parquet_spark.functions.dedup import (
        editdist_incremental,
        qgram_editdist_pairs,
    )

    full = qgram_editdist_pairs(spark, SF_SMOKE).toPandas()
    inc = editdist_incremental(spark, SF_SMOKE).toPandas()

    def is_snap(x):
        return x % 10 >= 8

    # crossing pairs reoriented as (new, old, dist)
    want = {
        ((a if is_snap(a) else b), (b if is_snap(a) else a), d)
        for a, b, d in zip(full.id_a, full.id_b, full.dist)
        if is_snap(a) != is_snap(b)
    }
    got = set(zip(inc.id_new, inc.id_old, inc.dist))
    assert got == want


def test_d13_band_join_is_lossless(spark):
    """d13's banded (h, shifted-pos) equi-join must emit EXACTLY the
    rows of the direct |Δpos| ≤ d predicate — the band is a join-key
    packaging of the Gravano window, not a narrowing of it. Regression
    for the r7 clamp `between(1, EDIT_N_GRAMS)`: posexplode positions
    are 0-based, so that clamp silently excluded every corpus gram at
    pos 0 (sf0.01: 49 802 → 47 828 matched rows), an undercount that
    turns the lossless count filter lossy for pairs sitting exactly on
    the EDIT_MIN_SHARED bound."""
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.functions.dedup import (
        EDIT_D,
        EDIT_N_GRAMS,
        _ed_gram_hashes,
    )

    gh = _ed_gram_hashes(spark, SF_SMOKE)
    is_snap = F.col("doc_id") % 10 >= 8
    banded = (
        gh.filter(is_snap)
        .select(
            "doc_id",
            "h",
            F.explode(
                F.sequence(F.col("pos") - EDIT_D, F.col("pos") + EDIT_D)
            ).alias("pos"),
        )
        .filter(F.col("pos").between(0, EDIT_N_GRAMS - 1))
        .alias("a")
        .join(
            gh.filter(~is_snap).alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.pos") == F.col("b.pos")),
        )
        .count()
    )
    direct = (
        gh.filter(is_snap)
        .alias("a")
        .join(
            gh.filter(~is_snap).alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= EDIT_D),
        )
        .count()
    )
    assert banded == direct


def test_d14_metrics_internally_consistent(spark):
    """d14's counts must cohere: both forms agree on n_true_pairs (the
    losslessness witness), d10's candidates are fewer (tighter bar),
    d11's gram-join rows are fewer (smaller join), and n_true_pairs
    equals d10's actual output count."""
    from aw3d30_parquet_spark.functions.dedup import (
        editdist_candidate_metrics,
        qgram_editdist_pairs,
    )

    m = (
        editdist_candidate_metrics(spark, SF_SMOKE)
        .toPandas()
        .set_index("form")
    )
    d10, d11 = m.loc["d10_all_grams"], m.loc["d11_rare_prefix"]
    assert d10.n_true_pairs == d11.n_true_pairs
    assert d10.n_candidates <= d11.n_candidates
    assert d11.gram_join_rows <= d10.gram_join_rows
    assert d10.n_candidates >= d10.n_true_pairs
    assert d10.n_true_pairs == len(
        qgram_editdist_pairs(spark, SF_SMOKE).toPandas()
    )


def test_t09_bm25_matches_python(spark, docs_pdf):
    """t09 vs an independent pure-python BM25 (dict-and-loop, no SQL):
    same distinct-term queries, same k1/b, ranks compared on the
    floor-rounded score with c_id tie-break."""
    import math
    from collections import Counter

    from aw3d30_parquet_spark.functions.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_CAP,
        BM25_QUERY_TERMS,
        SIMILAR_QUERY_MOD,
        SIMILAR_TOP_K,
        bm25_search,
    )

    tf = {}
    for _, rec in docs_pdf.iterrows():
        toks = re.split(r"\s+", rec["text"].strip())
        tf[int(rec["doc_id"])] = Counter(toks)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n_docs = len(tf)
    sum_dl = sum(dl.values())
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    want = {}
    for q in tf:
        if q % SIMILAR_QUERY_MOD or q >= BM25_QUERY_CAP:
            continue
        # rarest-m query-term pruning, same (df, term) ordering as the
        # operator (no-op on this fixture's <=31-term vocabulary)
        q_terms = set(
            sorted(tf[q], key=lambda t: (df[t], t))[:BM25_QUERY_TERMS]
        )
        scores = {}
        for c, ctf in tf.items():
            if c == q:
                continue
            s, n_terms = 0.0, 0
            for t in q_terms:
                if t not in ctf:
                    continue
                n_terms += 1
                idf = math.log(
                    1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)
                )
                s += (
                    idf
                    * ctf[t]
                    * (BM25_K1 + 1)
                    / (
                        ctf[t]
                        + BM25_K1
                        * (1 - BM25_B + BM25_B * dl[c] * n_docs / sum_dl)
                    )
                )
            if n_terms:
                scores[c] = (
                    math.floor(s * 10000 + 0.5) / 10000,
                    n_terms,
                )
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1][0], kv[0])
        )[:SIMILAR_TOP_K]
        for rank, (c, (s, n_terms)) in enumerate(ranked, 1):
            want[(q, rank)] = (c, n_terms, s)
    rows = bm25_search(spark, SF_SMOKE).collect()
    got = {
        (r.q_id, r.rank): (r.c_id, r.n_terms, r.score) for r in rows
    }
    assert set(got) == set(want)
    for key, (c, n_terms, s) in want.items():
        gc, gn, gs = got[key]
        assert (gc, gn) == (c, n_terms), (key, got[key], want[key])
        assert abs(gs - s) < 1e-9, (key, gs, s)
    assert len(got) > 0


def test_d15_incremental_lsh_vs_exact_split_pairs(spark):
    """d15: every reported (snapshot, corpus) pair must be exact-true
    (precision 1.0 — the verify step is exact Jaccard), and recall of
    comfortably-above-threshold cross-split pairs must clear the same
    0.9 bar as the d06 self-join (same banding, same guarantee)."""
    from aw3d30_parquet_spark.functions.dedup import (
        minhash_lsh_incremental,
    )

    exact_cross = set()
    for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect():
        a_snap, b_snap = r.id_a % 10 >= 8, r.id_b % 10 >= 8
        if a_snap == b_snap:
            continue
        snap, corp = (r.id_a, r.id_b) if a_snap else (r.id_b, r.id_a)
        exact_cross.add((snap, corp, r.jaccard))
    got = {
        (r.snap_id, r.corpus_id)
        for r in minhash_lsh_incremental(spark, SF_SMOKE).collect()
    }
    truth_ids = {(s, c) for s, c, _ in exact_cross}
    # precision: nothing outside the exact cross-split relation
    assert got <= truth_ids, sorted(got - truth_ids)[:5]
    comfortable = {(s, c) for s, c, j in exact_cross if j >= 0.7}
    assert comfortable, "fixture should contain cross-split near-dups"
    recall = len(comfortable & got) / len(comfortable)
    assert recall >= 0.9, f"d15 recall {recall:.2f} < 0.9"


def test_d16_substring_spans_matches_python(spark, docs_pdf):
    """d16 vs an independent pure-python recomputation: same window
    inventory, same >=2-distinct-docs duplicate rule, same
    gaps-and-islands span merge."""
    from collections import defaultdict

    from aw3d30_parquet_spark.functions.dedup import (
        SPAN_STRIDE,
        SPAN_WIDTH,
        substring_span_dedup,
    )

    occ = defaultdict(set)
    wins = {}
    for _, rec in docs_pdf.iterrows():
        d, t = int(rec["doc_id"]), rec["text"]
        ps = []
        p = 0
        while p + SPAN_WIDTH <= len(t):
            g = t[p : p + SPAN_WIDTH]
            occ[g].add(d)
            ps.append((p, g))
            p += SPAN_STRIDE
        wins[d] = ps
    want = {}
    for d, ps in wins.items():
        dup = [p for p, g in ps if len(occ[g]) >= 2]
        if not dup:
            continue
        spans = []
        prev_end = None
        for p in dup:
            if prev_end is None or p > prev_end + 1:
                spans.append([p, p + SPAN_WIDTH - 1])
            else:
                spans[-1][1] = max(spans[-1][1], p + SPAN_WIDTH - 1)
            prev_end = spans[-1][1]
        want[d] = (
            len(dup),
            len(spans),
            sum(e - s + 1 for s, e in spans),
        )
    rows = substring_span_dedup(spark, SF_SMOKE).collect()
    got = {
        r.doc_id: (r.n_dup_windows, r.n_spans, r.dup_chars) for r in rows
    }
    assert got == want, sorted(set(got) ^ set(want))[:5]
    # non-vacuous: the fixture must actually contain repeated passages
    assert len(got) > 0


def test_t10_phrase_search_matches_python(spark, docs_pdf):
    """t10 vs a pure-python scan: same first-PHRASE_LEN-tokens query
    phrases, same consecutive-match counting."""
    from aw3d30_parquet_spark.functions.text import (
        BM25_QUERY_CAP,
        PHRASE_LEN,
        SIMILAR_QUERY_MOD,
        phrase_search,
    )

    toks = {
        int(r["doc_id"]): re.split(r"\s+", r["text"].strip())
        for _, r in docs_pdf.iterrows()
    }
    want = {}
    for q, w in toks.items():
        if q % SIMILAR_QUERY_MOD or q >= BM25_QUERY_CAP:
            continue
        if len(w) < PHRASE_LEN:
            continue
        phrase = w[:PHRASE_LEN]
        for c, cw in toks.items():
            if c == q:
                continue
            n = sum(
                1
                for i in range(len(cw) - PHRASE_LEN + 1)
                if cw[i : i + PHRASE_LEN] == phrase
            )
            if n:
                want[(q, c)] = n
    rows = phrase_search(spark, SF_SMOKE).collect()
    got = {(r.q_id, r.c_id): r.n_occurrences for r in rows}
    assert got == want, sorted(set(got) ^ set(want))[:5]
    assert len(got) > 0


def test_pair_agg_single_explicit_distribution(spark):
    """r7 plan shape for the low-compression pair aggregates (d13/d04):
    the ONLY hash distribution of the packed pair key is the explicit
    8x-wide repartition — were the aggregate inserting its own
    ENSURE_REQUIREMENTS exchange on pk, a second hashpartitioning(pk)
    would appear and the 88->31s reshaping would have regressed."""
    from aw3d30_parquet_spark.functions.dedup import (
        editdist_incremental,
        ngram_jaccard_pairs,
    )
    from aw3d30_parquet_spark.plans import formatted_plan

    from tests.conftest import SF_SMOKE

    for fn in (editdist_incremental, ngram_jaccard_pairs):
        plan = formatted_plan(fn(spark, SF_SMOKE))
        hits = [
            line
            for line in plan.splitlines()
            if "hashpartitioning(pk#" in line
        ]
        assert len(hits) == 1, (fn.__name__, hits)
        assert "REPARTITION_BY_NUM" in hits[0], (fn.__name__, hits)


def test_pair_agg_width_tracks_corpus_volume(spark, tmp_path):
    """r8: the pair-agg repartition width is volume-derived — plain
    core count at sf0.1-class corpora (where the r7 fixed 8x width was
    pure scheduling overhead: d04 1.44->1.82 s), the measured 8x probe
    shape once documents.parquet reaches probe scale, and the scale
    posture when the input layout is unreadable."""
    from aw3d30_parquet_spark.functions.dedup import _pair_agg_width

    cores = spark.sparkContext.defaultParallelism
    assert _pair_agg_width(spark, SF_SMOKE) == cores
    assert _pair_agg_width(spark, "/root/testdata/sf0.1") == cores
    big = tmp_path / "documents.parquet"
    big.write_bytes(b"\0" * 6_000_000)  # 10x-probe-class corpus size
    assert _pair_agg_width(spark, str(tmp_path)) == 8 * cores
    mid = tmp_path / "mid"
    mid.mkdir()
    (mid / "documents.parquet").write_bytes(b"\0" * 1_600_000)
    assert _pair_agg_width(spark, str(mid)) == 3 * cores  # linear ramp
    assert _pair_agg_width(spark, str(tmp_path / "absent")) == 8 * cores


def test_packed_pair_key_range_guard(spark):
    """r7 ADVICE: the single-long pair key silently merges distinct
    pairs when doc ids exceed 2^31 — the key expression must fail
    loudly on out-of-range ids and stay exact in range."""
    from pyspark.sql import functions as F

    from aw3d30_parquet_spark.functions.dedup import _packed_pair_key

    ok = (
        spark.createDataFrame([(3, 5)], "a long, b long")
        .select(_packed_pair_key(F.col("a"), F.col("b")).alias("pk"))
        .collect()
    )
    assert ok[0].pk == 3 * 2**32 + 5
    bad = spark.createDataFrame([(1 << 31, 5)], "a long, b long")
    with pytest.raises(Exception, match="packed pair key"):
        bad.select(_packed_pair_key(F.col("a"), F.col("b"))).collect()
