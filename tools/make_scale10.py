#!/usr/bin/env python
"""Build the 10x scaling-probe corpus described in SCALING.md.

Replicates the sf0.1 FACT tables 10x into the output dir (default
``/tmp/scale10``) with key offsets so every FK join stays valid, and
copies the DIMENSION tables unchanged — the realistic scale shape:
facts grow, dims don't.

- ``customer``/``orders``/``lineitem`` replicas shift their key chain
  together (``o_custkey`` with ``c_custkey``, ``l_orderkey`` with
  ``o_orderkey``); ``l_partkey``/``l_suppkey`` keep pointing at the
  fixed dims.
- ``events`` replicas get distinct users (offset ``user_id``).
- ``documents`` replicas append a one-token replica tag to ``text`` —
  deliberately making every replica a ~0.95-Jaccard near-dup of its
  original: the ADVERSARIAL case for the dedup family (hot shingles,
  hot LSH buckets, quadratically more true pairs).
- ``embeddings`` replicas keep identical vectors under offset ids —
  10-member exact-duplicate clusters, the adversarial case for
  embedding near-dup / SemDeDup.

Usage: ``python tools/make_scale10.py [out_dir] [replicas] [mode]`` then
``SPARK_GRAFT_SF_DIR=/tmp/scale10 SPARK_GRAFT_BENCH_REPEATS=1
SPARK_GRAFT_BENCH_ONLY=... python bench.py``.

Modes (third positional arg, default ``full``):

- ``full`` — every fact table replicated (the SCALING.md 10x corpus).
- ``fixed-delta`` — documents only: replica 0 is complete; replicas
  i>=1 DROP their snapshot-eligible slice (``doc_id % 10 >= 8``), so
  the d13/d09/d15 delta stays EXACTLY the sf0.1 delta while the
  existing-corpus side grows ~(1 + 0.8*(replicas-1))x. This evidences
  the incremental family's actual production claim — cost linear in
  the DELTA, sub-linear in the corpus — which the plain replica probe
  cannot (it scales delta and corpus together, ~replicas^2 join
  volume). Other tables are copied unchanged (the probes only read
  documents).
- ``docs`` — documents replicated, everything else copied unchanged:
  the cheap way to build the 100x corpus for the retrieval/selection
  family probes (t08/t09/t10/p13/p14), whose scale claims are
  query-budget arguments over the documents table alone.
- ``relational`` — customer/orders/lineitem/events replicated,
  documents/embeddings copied unchanged: the SCALING.md "100x
  relational probe" corpus (60 M-row lineitem at replicas=100) for the
  full driver-sim oracle validation — the text/vector families keep
  their sf0.1 size so exact pair enumeration stays pair-bounded while
  the relational surface runs at 100x.
- ``emb`` — embeddings replicated (identical vectors under offset ids:
  100-member exact-duplicate clusters, the adversarial near-dup case),
  everything else copied unchanged: the ANN-family scale probe
  (v02/v03/v10) corpus.
- ``docs-density`` — the FIXED-DENSITY near-dup corpus (the d04/d07
  100x probe): every replica is "paraphrased" by replacing every 3rd
  word with a per-replica tag token, which destroys ALL original
  trigram shingles (any 3 consecutive word positions contain a
  multiple of 3) — so replicas share no shingles with the base or
  each other, and candidate volume CANNOT grow quadratically in
  replicas the way the plain replica corpus makes it. True near-dup
  pairs are CONSTRUCTED instead: every doc with ``doc_id % 50 == 0``
  gets an in-replica twin (same paraphrase + one extra token,
  Jaccard ≈ 0.97), so true pairs = replicas x ceil(N/50) — pair
  DENSITY constant as the corpus grows, the production claim "
  candidates linear in corpus, verify cost linear in TRUE pairs".
- ``emb-skew`` — embeddings replicated like ``emb`` but with a
  deliberately HOT region: replicas with i % 3 == 1 collapse onto a
  fixed anchor direction (tiny per-vector jitter) so ~1/3 of all
  vectors land in one IVF cluster (k01's hot-key fixture pattern
  applied to vector space) — the v10 partition-skew probe. Replica 0
  stays the cold base set (i % 3 == 1 excludes it), which the probe's
  HOT_QUERY_LO=100000 (replica 1's leading ids) relies on.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = os.environ.get("SCALE_SRC_DIR", "/root/testdata/sf0.1")

# key stride per replica — round numbers above every sf0.1 max key
STRIDES = {
    "customer": ("c_custkey", 100_000),
    "orders": ("o_orderkey", 1_000_000),
    "events": ("event_id", 1_000_000),
    "documents": ("doc_id", 100_000),
    "embeddings": ("vec_id", 100_000),
}
DIMS = ("region", "nation", "supplier", "part")


def build(
    out_dir: str = "/tmp/scale10", replicas: int = 10, mode: str = "full"
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    copy_unchanged = list(DIMS)
    if mode in ("fixed-delta", "docs", "docs-density"):
        # probes in these modes only read documents — ship the other
        # tables through unchanged so register_views still finds them
        copy_unchanged += ["customer", "orders", "lineitem", "events",
                           "embeddings"]
    elif mode == "relational":
        copy_unchanged += ["documents", "embeddings"]
    elif mode in ("emb", "emb-skew"):
        copy_unchanged += ["customer", "orders", "lineitem", "events",
                           "documents"]
    for t in copy_unchanged:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )

    def rep(table: str, select: str) -> None:
        """UNION ALL of `select` for i in 0..replicas-1 -> parquet."""
        parts = [select.format(i=i) for i in range(replicas)]
        sql = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )

    src = lambda t: f"read_parquet('{SRC}/{t}.parquet')"  # noqa: E731

    if mode in ("emb", "emb-skew"):
        # emb-skew: replicas with i % 3 == 1 collapse onto a single
        # ANCHOR direction (two large fixed components + a tiny
        # deterministic per-vector jitter) — under v09's exact Lloyd
        # they form ONE tight cluster holding ~1/3 of all vectors,
        # k01's hot-key fixture applied to vector space. Replica 0
        # stays the base set, so the Lloyd init (first k ids) and the
        # default v10 query set remain cold; hot queries are replica
        # 1's leading ids (vec_id 100000+).
        hot = (
            "list_transform(range(1, 65), d -> CASE"
            " WHEN d = 1 THEN CAST(5.0 + (vec_id % 997) / 100000.0 AS FLOAT)"
            " WHEN d = 2 THEN CAST(-5.0 + (vec_id % 991) / 100000.0 AS FLOAT)"
            " ELSE CAST(0.0 AS FLOAT) END)"
        )
        parts = []
        for i in range(replicas):
            emb_expr = (
                hot
                if (mode == "emb-skew" and i % 3 == 1)
                else "embedding"
            )
            parts.append(
                f"SELECT vec_id + {i}*{STRIDES['embeddings'][1]} AS vec_id,"
                f" {emb_expr} AS embedding, label FROM {src('embeddings')}"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO"
            f" '{out_dir}/embeddings.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM"
            f" read_parquet('{out_dir}/embeddings.parquet')"
        ).fetchone()[0]
        print(f"embeddings: {n} rows")
        return

    if mode == "docs-density":
        # paraphrase: every 3rd word -> per-replica tag (kills every
        # original trigram shingle); constructed in-replica twins keep
        # pair DENSITY constant (see module docstring)
        stride = STRIDES["documents"][1]
        # twin ids live at base_id + 50000 within each replica stride,
        # and the probe tests classify rows by doc_id // stride and
        # doc_id % stride >= 50000 — a source corpus with wider ids
        # would silently collide twin ids with paraphrase ids and
        # misclassify rows (r7 ADVICE): fail loudly instead
        max_id = con.execute(
            f"SELECT max(doc_id) FROM {src('documents')}"
        ).fetchone()[0]
        assert max_id < 50_000 and max_id < stride, (
            f"docs-density requires source doc_id < 50000 (and < replica"
            f" stride {stride}); {SRC} has max doc_id {max_id}"
        )
        parts = []
        for i in range(replicas):
            # TAG (not replace) every 3rd word: each original trigram
            # maps to one tagged trigram, so the per-replica shingle
            # df distribution ≈ the base corpus' (no hot-key collapse
            # — replacing with a bare tag measured 10x candidate
            # inflation per replica), while every trigram still
            # carries the replica tag, keeping replica shingle spaces
            # disjoint
            nz = (
                r"regexp_replace(trim(text), '(\S+\s+\S+)\s+(\S+)',"
                rf" '\1 \2zr{i}', 'g')"
            )
            parts.append(
                f"SELECT doc_id + {i}*{stride} AS doc_id,"
                f" {nz} AS text, lang, source,"
                f" CAST(length({nz}) AS BIGINT) AS n_chars"
                f" FROM {src('documents')}"
            )
            # the twin marker carries the replica tag too: with a bare
            # ' q0' the 1-2 UNTAGGED trailing words of a doc whose
            # length is not a multiple of 3 formed a cross-replica
            # shared trigram ("w dup q0") — a small quadratic leak the
            # disjointness test (tests/test_scale_probes.py) now pins
            parts.append(
                f"SELECT doc_id + {i}*{stride} + 50000 AS doc_id,"
                f" {nz} || ' q{i}' AS text, lang, source,"
                f" CAST(length({nz}) + {len(f' q{i}')} AS BIGINT) AS n_chars"
                f" FROM {src('documents')} WHERE doc_id % 50 = 0"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO"
            f" '{out_dir}/documents.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*), count(*) FILTER (doc_id % {stride} >= 50000)"
            f" FROM read_parquet('{out_dir}/documents.parquet')"
        ).fetchone()
        print(f"documents: {n[0]} rows, constructed twins {n[1]}")
        return

    if mode in ("fixed-delta", "docs"):
        # replica 0 keeps its full slice (THE fixed delta); in
        # fixed-delta mode every later replica drops its
        # snapshot-eligible rows so only the corpus side grows
        tail = " WHERE (doc_id % 10) < 8"
        parts = []
        for i in range(replicas):
            where = tail if (mode == "fixed-delta" and i > 0) else ""
            parts.append(
                f"SELECT doc_id + {i}*{STRIDES['documents'][1]} AS doc_id,"
                + (
                    " text"
                    if i == 0
                    else f" text || ' replica{i}' AS text"
                )
                + f", lang, source, n_chars FROM {src('documents')}{where}"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO"
            f" '{out_dir}/documents.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*),"
            f" count(*) FILTER ((doc_id % 10) >= 8)"
            f" FROM read_parquet('{out_dir}/documents.parquet')"
        ).fetchone()
        print(f"documents: {n[0]} rows, snapshot slice {n[1]}")
        return

    rep(
        "customer",
        f"SELECT c_custkey + {{i}}*{STRIDES['customer'][1]} AS c_custkey,"
        " c_name, c_nationkey, c_acctbal, c_mktsegment FROM "
        + src("customer"),
    )
    rep(
        "orders",
        f"SELECT o_orderkey + {{i}}*{STRIDES['orders'][1]} AS o_orderkey,"
        f" o_custkey + {{i}}*{STRIDES['customer'][1]} AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM "
        + src("orders"),
    )
    rep(
        "lineitem",
        f"SELECT l_orderkey + {{i}}*{STRIDES['orders'][1]} AS l_orderkey,"
        " l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
        " l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM "
        + src("lineitem"),
    )
    rep(
        "events",
        f"SELECT event_id + {{i}}*{STRIDES['events'][1]} AS event_id, ts,"
        f" user_id + {{i}}*{STRIDES['events'][1]} AS user_id,"
        " event_type, value, props FROM " + src("events"),
    )
    if mode == "relational":
        for t in list(STRIDES) + list(DIMS):
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
            ).fetchone()[0]
            print(f"{t}: {n} rows")
        return
    rep(
        "documents",
        f"SELECT doc_id + {{i}}*{STRIDES['documents'][1]} AS doc_id,"
        " CASE WHEN {i} = 0 THEN text"
        " ELSE text || ' replica{i}' END AS text,"
        " lang, source, n_chars FROM " + src("documents"),
    )
    rep(
        "embeddings",
        f"SELECT vec_id + {{i}}*{STRIDES['embeddings'][1]} AS vec_id,"
        " embedding, label FROM " + src("embeddings"),
    )
    for t in list(STRIDES) + list(DIMS):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mode = sys.argv[3] if len(sys.argv) > 3 else "full"
    build(out, n, mode)
