#!/usr/bin/env python
"""Candidate-volume counters for the retrieval/selection scale probes.

Wall-clock alone can't distinguish "the operator is scale-right" from
"the host was quiet" — d14's evidence pattern records the CANDIDATE
ROW COUNTS the plans actually materialize. This script recomputes, in
DuckDB, the volume drivers of the five query-budget operators
(t08/t09/t10/p13/p14) against any corpus dir, so SCALING.md's 10x/100x
rows can carry counts next to seconds:

- t08: candidate join rows = query-shingle ⋈ corpus-postings matches
  (bounded by the fixed query budget x shingle df);
- t09: candidate rows = pruned query terms (<=50 queries x 32 rarest
  terms) ⋈ postings;
- t10: anchor rows = word-1 postings matches per phrase (the chain's
  largest relation; later joins only shrink it — r7 A/B'd a rarest-
  slot anchor and reverted it: on this fixture's tiny vocabulary the
  rarest of three phrase words is nearly as hot as word-1);
- p13: feature rows (uni+bigram occurrences — the map-side volume) and
  the fixed bucket count B;
- p14: eval-shingle build rows and train-side probe rows (the filter
  itself is fixed 32 kbit).

Usage: python tools/probe_counts.py [corpus_dir ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from aw3d30_parquet_spark.functions.dedup import (  # noqa: E402
    _MH_MIN_SQL,
    _MH_PARAMS,
    EDIT_D,
    EDIT_MIN_SHARED,
    EDIT_N_GRAMS,
    EDIT_PREFIX,
    EDIT_Q,
    SPAN_STRIDE,
    SPAN_WIDTH,
)
from aw3d30_parquet_spark.functions.pipeline import (  # noqa: E402
    BENCH_MOD,
    BOILER_CHUNK_TOKENS,
    BOILER_MIN_DOCS,
)
from aw3d30_parquet_spark.functions.text import (  # noqa: E402
    BM25_QUERY_CAP,
    BM25_QUERY_TERMS,
    SIMILAR_QUERY_MOD,
)

BASE = """
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM read_parquet('{d}/documents.parquet')
), shing AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' ')))
              ELSE [array_to_string(w, ' ')] END AS shs
  FROM words
), sh AS (
  SELECT doc_id, unnest(shs) AS s FROM shing
), toks AS (
  SELECT doc_id, unnest(w) AS term, generate_subscripts(w, 1) - 1 AS pos
  FROM words
)
"""


def counts(d: str) -> dict[str, int]:
    """``PROBE_ONLY=t10,d04`` (comma-separated key prefixes) restricts
    which counters run — the d_true_pairs exact-pair join is by design
    quadratic on the ADVERSARIAL replica corpora (every replica a
    near-dup), where running it is the pathology the fixed-density
    corpus exists to avoid."""
    import os

    only = [
        p.strip()
        for p in os.environ.get("PROBE_ONLY", "").split(",")
        if p.strip()
    ]

    def wanted(key: str) -> bool:
        return not only or any(key.startswith(p) for p in only)

    con = duckdb.connect()
    out: dict[str, int] = {}

    def put(key: str, sql: str) -> None:
        if wanted(key):
            out[key] = con.execute(sql).fetchone()[0]

    put(
        "docs",
        f"SELECT count(*) FROM read_parquet('{d}/documents.parquet')",
    )
    q = (
        f"q.doc_id % {SIMILAR_QUERY_MOD} = 0"
        f" AND q.doc_id < {BM25_QUERY_CAP}"
    )
    put(
        "t08_candidates",
        BASE.format(d=d)
        + f"""SELECT count(*) FROM sh q JOIN sh c
              ON q.s = c.s AND q.doc_id <> c.doc_id WHERE {q}""",
    )
    put(
        "t09_candidates",
        BASE.format(d=d)
        + f"""
, tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qterms AS (
  SELECT q.doc_id AS q_id, q.term FROM (
    SELECT DISTINCT t.doc_id, t.term FROM toks t
    WHERE t.doc_id % {SIMILAR_QUERY_MOD} = 0
      AND t.doc_id < {BM25_QUERY_CAP}
  ) q JOIN df USING (term)
  QUALIFY row_number() OVER (PARTITION BY q.doc_id
                             ORDER BY df.df, q.term)
          <= {BM25_QUERY_TERMS}
)
SELECT count(*) FROM qterms q JOIN tf p USING (term)
WHERE p.doc_id <> q.q_id""",
    )
    # r11 (verdict item 4): index-size + per-step counters so the
    # retrieval family's 100×-fixed-density row carries the full
    # volume decomposition, not just the end-to-end candidate count —
    # postings rows (the maintained index, corpus-linear by
    # definition), Σ df over the pruned query terms (the t09 candidate
    # BOUND: candidates = Σdf − self-matches), and the positional
    # chain's survivors at every join step (selectivity must multiply
    # — a step whose survivors grow super-linearly in the corpus is
    # the d13-class smell).
    put(
        "t08_index_rows",
        BASE.format(d=d) + "SELECT count(*) FROM sh",
    )
    put(
        "t09_postings",
        BASE.format(d=d)
        + "SELECT count(*) FROM (SELECT doc_id, term FROM toks GROUP BY 1, 2)",
    )
    put(
        "t09_qterm_df_sum",
        BASE.format(d=d)
        + f"""
, tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qterms AS (
  SELECT q.doc_id AS q_id, q.term, df.df FROM (
    SELECT DISTINCT t.doc_id, t.term FROM toks t
    WHERE t.doc_id % {SIMILAR_QUERY_MOD} = 0
      AND t.doc_id < {BM25_QUERY_CAP}
  ) q JOIN df USING (term)
  QUALIFY row_number() OVER (PARTITION BY q.doc_id
                             ORDER BY df.df, q.term)
          <= {BM25_QUERY_TERMS}
)
SELECT sum(df) FROM qterms""",
    )
    put(
        "t10_postings",
        BASE.format(d=d) + "SELECT count(*) FROM toks",
    )

    def t10_chain(steps: int) -> str:
        """Survivor count after joining the first ``steps`` phrase
        words (steps=1 reproduces the anchor count; 3 = full PHRASE_LEN
        matches) — mirrors text.phrase_search's positional-join chain."""
        sql = (
            BASE.format(d=d)
            + f"""
, phr AS (
  SELECT doc_id AS q_id, w[1] AS w0, w[2] AS w1, w[3] AS w2
  FROM words
  WHERE doc_id % {SIMILAR_QUERY_MOD} = 0
    AND doc_id < {BM25_QUERY_CAP} AND len(w) >= 3
)
SELECT count(*) FROM phr
JOIN toks t0 ON t0.term = phr.w0 AND t0.doc_id <> phr.q_id"""
        )
        for i in range(1, steps):
            sql += (
                f"\nJOIN toks t{i} ON t{i}.doc_id = t0.doc_id"
                f" AND t{i}.pos = t0.pos + {i} AND t{i}.term = phr.w{i}"
            )
        return sql

    put("t10_anchors", t10_chain(1))
    put("t10_step2_survivors", t10_chain(2))
    put("t10_step3_matches", t10_chain(3))

    # r11: m06 frame-dedup volume drivers, mirroring the m06 oracle's
    # own CTEs (frame identity ⇔ (width, start mod 256) by the
    # generator law). The digest self-join's candidate volume is
    # Σ_h c_h·(c_h−1) — linear in corpus at FIXED per-digest density
    # (real content: unbounded digest space), but this FIXTURE's
    # digest space saturates at ≤ 4·256 keys, so c_h grows with the
    # corpus and candidates go quadratic — the adversarial-density
    # case, counted here so SCALING.md can say so with numbers.
    m06_base = f"""
WITH params AS (
  SELECT doc_id, 16 + (doc_id % 4) * 8 AS w,
         4 + doc_id % 6 AS nf, doc_id % 256 AS s
  FROM read_parquet('{d}/documents.parquet') WHERE doc_id % 3 = 2
), frames AS (
  SELECT doc_id, w, (s + k.k * w * 16) % 256 AS start
  FROM params
  CROSS JOIN (SELECT unnest(range(0, 9)) AS k) k
  WHERE k.k < nf AND k.k % 2 = 0
), dist AS (
  SELECT DISTINCT doc_id, w, start FROM frames
), freq AS (
  SELECT w, start, count(*) AS c FROM dist GROUP BY 1, 2
)
"""
    put("m06_dist_rows", m06_base + "SELECT count(*) FROM dist")
    put("m06_digest_space", m06_base + "SELECT count(*) FROM freq")
    put("m06_max_digest_freq", m06_base + "SELECT max(c) FROM freq")
    put(
        "m06_candidates",
        m06_base + "SELECT sum(c * (c - 1)) FROM freq",
    )
    # p13 hashes every unigram + bigram occurrence (map-side): volume =
    # sum(n_tokens) + sum(greatest(n_tokens - 1, 0)) over docs
    put(
        "p13_feature_rows",
        BASE.format(d=d)
        + """SELECT sum(len(w)) + sum(greatest(len(w) - 1, 0))
             FROM words""",
    )
    # p14's build side: distinct shingles of the bench slice
    # (doc_id % 97 == 0); probe side: every non-bench shingle row.
    # Both are inherently linear in the corpus (decontamination scans
    # the corpus by definition) — what must stay FIXED is the filter
    # itself (32 kbit broadcast), which these counts contextualize.
    put(
        "p14_eval_shingles",
        BASE.format(d=d)
        + "SELECT count(DISTINCT s) FROM sh WHERE doc_id % 97 = 0",
    )
    put(
        "p14_probe_rows",
        BASE.format(d=d)
        + "SELECT count(*) FROM sh WHERE doc_id % 97 <> 0",
    )
    # d04 (inverted-index Jaccard): candidate join volume = one row per
    # (doc pair, shared shingle) = sum over shingles of C(df, 2) — the
    # c^2 term the fixed-density corpus must keep LINEAR in replicas
    put(
        "d04_candidates",
        BASE.format(d=d)
        + """SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT)
             FROM (SELECT s, count(*) AS c FROM sh GROUP BY s)""",
    )
    # TRUE pairs (exact Jaccard >= 0.6) — what verify cost must track
    put(
        "d_true_pairs",
        BASE.format(d=d)
        + """
, docn AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT count(*) FROM (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
) p JOIN docn na ON na.doc_id = p.ia JOIN docn nb ON nb.doc_id = p.ib
WHERE p.inter >= 0.6 * (na.n + nb.n - p.inter)""",
    )
    # d07 (prefix filtering): candidates = distinct pairs sharing a
    # PREFIX shingle (each doc's n - ceil(0.6 n) + 1 globally-rarest).
    # Tie-break within equal df is md5(s) here vs xxhash64 in the
    # engine — a volume PROXY (identical when df ties don't straddle
    # the prefix boundary), fine for counting, not for membership.
    put(
        "d07_candidates",
        BASE.format(d=d)
        + """
, docn AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
, dfq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
, pre AS (
  SELECT sh.doc_id, sh.s
  FROM sh JOIN dfq USING (s) JOIN docn USING (doc_id)
  QUALIFY row_number() OVER (PARTITION BY sh.doc_id
                             ORDER BY dfq.df, md5(sh.s))
          <= docn.n - ceil(0.6 * docn.n) + 1
)
SELECT count(*) FROM (
  SELECT DISTINCT a.doc_id, b.doc_id
  FROM pre a JOIN pre b ON a.s = b.s AND a.doc_id < b.doc_id
)""",
    )
    # ------------------------------------------------ banded-MinHash family
    # d06/d15 (VERDICT r8 #6): the band-join volume was argued, not
    # measured, at 100×. These CTEs are the d06 oracle's own minhash
    # arithmetic (ONE md5 per shingle → 60-bit long, then the embedded
    # 2-universal (a_i, b_i) literals via _MH_MIN_SQL, band key = the
    # 2-slice values joined "_") so the counters measure exactly the
    # relation the engine banding produces.
    MH = f"""
, h0 AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh
), mhx AS (
  SELECT doc_id, i.i AS perm,
         {_MH_MIN_SQL}
  FROM h0, (SELECT unnest(range(0, {len(_MH_PARAMS)})) AS i) i
  GROUP BY doc_id, i.i
), bandkey AS (
  SELECT doc_id, perm // 2 AS band,
         string_agg(mh::VARCHAR, '_' ORDER BY perm) AS bk
  FROM mhx GROUP BY doc_id, perm // 2
)
"""
    # band-join rows by FORMULA: Σ over (band, key) buckets of
    # C(occupancy, 2) — O(distinct band keys), never materializes the
    # pair join, so the counter is safe on adversarial corpora
    put(
        "d06_band_join_rows",
        BASE.format(d=d) + MH
        + """SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT)
             FROM (SELECT band, bk, count(*) AS c
                   FROM bandkey GROUP BY 1, 2)""",
    )
    # distinct candidate pairs + exact-Jaccard-verified survivors —
    # these DO materialize the pair set; size with the formula first
    put(
        "d06_candidates",
        BASE.format(d=d) + MH
        + """SELECT count(*) FROM (
               SELECT DISTINCT a.doc_id, b.doc_id
               FROM bandkey a JOIN bandkey b
               ON a.band = b.band AND a.bk = b.bk
                  AND a.doc_id < b.doc_id)""",
    )
    put(
        "d06_verified_pairs",
        BASE.format(d=d) + MH
        + """
, cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandkey a JOIN bandkey b
  ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
), docn AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT count(*) FROM (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2
) p JOIN docn na ON na.doc_id = p.id_a
    JOIN docn nb ON nb.doc_id = p.id_b
WHERE p.inter >= 0.6 * (na.n + nb.n - p.inter)""",
    )
    # d15 (asymmetric snapshot × corpus): band-join rows by the same
    # bucket formula — Σ snap_count · corpus_count per (band, key)
    put(
        "d15_band_join_rows",
        BASE.format(d=d) + MH
        + """SELECT CAST(coalesce(sum(cs * cc), 0) AS BIGINT) FROM (
               SELECT band, bk,
                      count(*) FILTER (doc_id % 10 >= 8) AS cs,
                      count(*) FILTER (doc_id % 10 < 8) AS cc
               FROM bandkey GROUP BY 1, 2)""",
    )
    put(
        "d15_candidates",
        BASE.format(d=d) + MH
        + """SELECT count(*) FROM (
               SELECT DISTINCT s.doc_id, c.doc_id
               FROM bandkey s JOIN bandkey c
               ON s.band = c.band AND s.bk = c.bk
               WHERE s.doc_id % 10 >= 8 AND c.doc_id % 10 < 8)""",
    )
    put(
        "d15_verified_pairs",
        BASE.format(d=d) + MH
        + """
, cand AS (
  SELECT DISTINCT s.doc_id AS snap_id, c.doc_id AS corpus_id
  FROM bandkey s JOIN bandkey c
  ON s.band = c.band AND s.bk = c.bk
  WHERE s.doc_id % 10 >= 8 AND c.doc_id % 10 < 8
), docn AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT count(*) FROM (
  SELECT c.snap_id, c.corpus_id, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.snap_id
  JOIN sh b ON b.doc_id = c.corpus_id AND b.s = a.s
  GROUP BY 1, 2
) p JOIN docn na ON na.doc_id = p.snap_id
    JOIN docn nb ON nb.doc_id = p.corpus_id
WHERE p.inter >= 0.6 * (na.n + nb.n - p.inter)""",
    )
    # ------------------------------------------------ edit-distance family
    # Domain mirrors dedup._ed_docs (constants imported from it so the
    # counters can't drift): the fixed EDIT_PREFIX-char prefix, docs
    # shorter than that excluded; grams are the EDIT_N_GRAMS positional
    # EDIT_Q-grams.
    # Positions here are 1-based (DuckDB substring) vs the engine's
    # 0-based posexplode — only Δpos matters, so counts are identical
    # (validated: d13_gram_join_rows == the engine's direct-join count
    # at sf0.01).
    ED = f"""
, edp AS (
  SELECT doc_id, substring(text, 1, {EDIT_PREFIX}) AS p
  FROM read_parquet('{{d}}/documents.parquet')
  WHERE length(substring(text, 1, {EDIT_PREFIX})) = {EDIT_PREFIX}
), edg AS (
  SELECT doc_id, CAST(r.range AS INT) AS pos,
         substring(p, CAST(r.range AS INT), {EDIT_Q}) AS gr
  FROM edp CROSS JOIN range(1, {EDIT_N_GRAMS + 1}) r
)
"""

    def ed_base() -> str:
        return BASE.format(d=d) + ED.format(d=d)

    # join volume by FORMULA (Σ over gram, band-pair of df products,
    # minus the same-doc banded pairs the engine's doc_id < doc_id
    # predicate excludes, halved to unordered) — O(distinct (gram,pos))
    # + O(docs × 22²) however large the would-be join is, so the
    # counter itself cannot blow up on adversarial corpora
    put(
        "d10_gram_join_rows",
        ed_base()
        + f"""
, dfp AS (SELECT gr, pos, count(*) AS df FROM edg GROUP BY 1, 2)
SELECT CAST((sum_all - same_doc) / 2 AS BIGINT) FROM (
  SELECT sum(a.df * b.df) AS sum_all
  FROM dfp a JOIN dfp b
  ON a.gr = b.gr AND abs(a.pos - b.pos) <= {EDIT_D}
) s, (
  SELECT count(*) AS same_doc
  FROM edg a JOIN edg b
  ON a.doc_id = b.doc_id AND a.gr = b.gr AND abs(a.pos - b.pos) <= {EDIT_D}
) t""",
    )
    # d13: asymmetric snapshot (doc_id % 10 >= 8) × corpus volume
    ED13 = """
, snapg AS (SELECT * FROM edg WHERE doc_id % 10 >= 8)
, corpg AS (SELECT * FROM edg WHERE doc_id % 10 < 8)
"""
    put(
        "d13_gram_join_rows",
        ed_base()
        + ED13
        + f"""
, dfa AS (SELECT gr, pos, count(*) AS df FROM snapg GROUP BY 1, 2)
, dfb AS (SELECT gr, pos, count(*) AS df FROM corpg GROUP BY 1, 2)
SELECT CAST(coalesce(sum(a.df * b.df), 0) AS BIGINT)
FROM dfa a JOIN dfb b ON a.gr = b.gr AND abs(a.pos - b.pos) <= {EDIT_D}""",
    )
    # candidate pairs passing the Gravano count bound (EDIT_MIN_SHARED
    # banded matches) and the verify survivors (levenshtein <= EDIT_D)
    # — these DO
    # materialize the pair aggregation, so gate them behind PROBE_ONLY
    # on corpora whose join volume the formula counter sized first
    put(
        "d13_candidates",
        ed_base()
        + ED13
        + f"""
SELECT count(*) FROM (
  SELECT a.doc_id, b.doc_id
  FROM snapg a JOIN corpg b
  ON a.gr = b.gr AND abs(a.pos - b.pos) <= {EDIT_D}
  GROUP BY 1, 2 HAVING count(*) >= {EDIT_MIN_SHARED}
)""",
    )
    # ------------------------------------------------ d16 substring spans
    # VERDICT r9 #3: the digest-groupBy posture was measured only to
    # 10×. Window inventory mirrors the d16 oracle's own CTEs (stride-S
    # generate_series + md5(substr)); the volume drivers are the
    # inventory itself (the only corpus-sized shuffle), the ≥2-doc dup
    # digest set, the dup-window join-back rows, and the merged spans.
    D16 = f"""
, w16 AS (
  SELECT doc_id,
         unnest(generate_series(1, length(text) - {SPAN_WIDTH - 1},
                                {SPAN_STRIDE})) AS p,
         text
  FROM read_parquet('{d}/documents.parquet')
  WHERE length(text) >= {SPAN_WIDTH}
), g16 AS (
  SELECT doc_id, p, md5(substr(text, p, {SPAN_WIDTH})) AS h FROM w16
)
"""
    put(
        "d16_window_rows",
        BASE.format(d=d) + D16 + "SELECT count(*) FROM g16",
    )
    put(
        "d16_dup_digests",
        BASE.format(d=d) + D16
        + """SELECT count(*) FROM (
               SELECT h FROM g16 GROUP BY h
               HAVING count(DISTINCT doc_id) >= 2)""",
    )
    put(
        "d16_dup_window_rows",
        BASE.format(d=d) + D16
        + """SELECT count(*) FROM g16
             JOIN (SELECT h FROM g16 GROUP BY h
                   HAVING count(DISTINCT doc_id) >= 2) dup USING (h)""",
    )
    put(
        "d16_spans",
        BASE.format(d=d) + D16
        + f"""
, dw AS (
  SELECT g16.doc_id, g16.p FROM g16
  JOIN (SELECT h FROM g16 GROUP BY h
        HAVING count(DISTINCT doc_id) >= 2) dup USING (h)
), flagged AS (
  SELECT doc_id, p,
         CASE WHEN max(p + {SPAN_WIDTH - 1}) OVER (
                PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR p > max(p + {SPAN_WIDTH - 1}) OVER (
                PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) + 1
         THEN 1 ELSE 0 END AS new_span
  FROM dw
)
SELECT CAST(coalesce(sum(new_span), 0) AS BIGINT) FROM flagged""",
    )
    # ------------------------------------------------ p05 decontamination
    # VERDICT r9 #4: p05's wall grew 5.1× at 10× — the steepest
    # p-family grower. Volume drivers, mirroring the p05 oracle: the
    # bench probe rows (corpus/97 docs × distinct shingles), the
    # train-side DISTINCT shingle relation (the join's build side —
    # grows with the corpus), the join hit rows, and the contaminated
    # doc count (the leak outcome the fixture constructs).
    P05 = f"""
, bench05 AS (
  SELECT doc_id, s FROM sh WHERE doc_id % {BENCH_MOD} = 0
), train05 AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} <> 0
)
"""
    put(
        "p05_bench_rows",
        BASE.format(d=d) + P05 + "SELECT count(*) FROM bench05",
    )
    put(
        "p05_train_distinct",
        BASE.format(d=d) + P05 + "SELECT count(*) FROM train05",
    )
    put(
        "p05_hit_rows",
        BASE.format(d=d) + P05
        + "SELECT count(*) FROM bench05 JOIN train05 USING (s)",
    )
    put(
        "p05_contaminated_docs",
        BASE.format(d=d) + P05
        + """SELECT count(*) FROM (
               SELECT b.doc_id, count(*) AS n_sh, count(t.s) AS n_hit
               FROM bench05 b LEFT JOIN train05 t USING (s)
               GROUP BY b.doc_id)
             WHERE n_hit >= n_sh * 0.5""",
    )
    # p11 boilerplate chunks: per-(doc, chunk-hash) distinct rows (the
    # one corpus-sized shuffle), distinct chunks, and flagged chunks
    P11 = f"""
, ch11 AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(w[i.i * {BOILER_CHUNK_TOKENS} + 1 :
                               i.i * {BOILER_CHUNK_TOKENS} + {BOILER_CHUNK_TOKENS}], ' ')) AS h
  FROM words,
       LATERAL (SELECT unnest(range(0,
                CAST(ceil(len(w) / {BOILER_CHUNK_TOKENS}.0) AS BIGINT))) AS i) i
)
"""
    put(
        "p11_chunk_rows",
        BASE.format(d=d) + P11 + "SELECT count(*) FROM ch11",
    )
    put(
        "p11_distinct_chunks",
        BASE.format(d=d) + P11 + "SELECT count(DISTINCT h) FROM ch11",
    )
    put(
        "p11_boiler_chunks",
        BASE.format(d=d) + P11
        + f"""SELECT count(*) FROM (
                SELECT h FROM ch11 GROUP BY h
                HAVING count(*) >= {BOILER_MIN_DOCS})""",
    )
    put(
        "d13_verified_pairs",
        ed_base()
        + ED13
        + f"""
, cand AS (
  SELECT a.doc_id AS id_new, b.doc_id AS id_old
  FROM snapg a JOIN corpg b
  ON a.gr = b.gr AND abs(a.pos - b.pos) <= {EDIT_D}
  GROUP BY 1, 2 HAVING count(*) >= {EDIT_MIN_SHARED}
)
SELECT count(*) FROM cand
JOIN edp pa ON pa.doc_id = cand.id_new
JOIN edp pb ON pb.doc_id = cand.id_old
WHERE levenshtein(pa.p, pb.p) <= {EDIT_D}""",
    )
    # ------------------------------------------------ v07 SemDeDup
    # VERDICT r11 #3: v07's Σ n_c² within-cluster cost is argued from
    # the SemDeDup k ∝ n rule (semdedup_bits keeps MEAN occupancy
    # ≤ 128) but was never probed at 100× — and the m06 lesson is that
    # a SATURATED key space (adversarial replicas landing in the same
    # sign bucket by construction) turns "Σ within-cluster pairs"
    # quadratic regardless of any mean-occupancy law, because the MAX
    # occupancy grows ∝ n while the mean stays flat. Counters mirror
    # the operator's own plan: the adaptive bits, occupied clusters,
    # the hottest cluster's n_c, and the exact pair volume
    # Σ n_c·(n_c−1)/2 the cluster-keyed self-join materializes.
    if wanted("v07") and os.path.exists(f"{d}/embeddings.parquet"):
        from aw3d30_parquet_spark.functions.vectors import semdedup_bits

        n_vec = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/embeddings.parquet')"
        ).fetchone()[0]
        bits = semdedup_bits(n_vec)
        sign_expr = " + ".join(
            f"(CASE WHEN CAST(embedding[{i + 1}] AS DOUBLE) > 0 "
            f"THEN {1 << (bits - 1 - i)} ELSE 0 END)"
            for i in range(bits)
        )
        V07 = f"""
WITH cid AS (
  SELECT ({sign_expr}) AS cluster_id
  FROM read_parquet('{d}/embeddings.parquet')
), occ AS (
  SELECT cluster_id, count(*) AS n_c FROM cid GROUP BY 1
)
"""
        out["v07_vectors"] = n_vec
        out["v07_bits"] = bits
        out["v07_clusters"] = con.execute(
            V07 + "SELECT count(*) FROM occ"
        ).fetchone()[0]
        out["v07_max_cluster"] = con.execute(
            V07 + "SELECT max(n_c) FROM occ"
        ).fetchone()[0]
        out["v07_cand_pairs"] = int(
            con.execute(
                V07
                + "SELECT CAST(coalesce(sum(n_c * (n_c - 1) / 2), 0) "
                "AS BIGINT) FROM occ"
            ).fetchone()[0]
        )
    return out


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        c = counts(d)
        print(d, c)
