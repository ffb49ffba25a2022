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
  largest relation; later joins only shrink it);
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
    con = duckdb.connect()
    out: dict[str, int] = {}
    out["docs"] = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/documents.parquet')"
    ).fetchone()[0]
    q = (
        f"q.doc_id % {SIMILAR_QUERY_MOD} = 0"
        f" AND q.doc_id < {BM25_QUERY_CAP}"
    )
    out["t08_candidates"] = con.execute(
        BASE.format(d=d)
        + f"""SELECT count(*) FROM sh q JOIN sh c
              ON q.s = c.s AND q.doc_id <> c.doc_id WHERE {q}"""
    ).fetchone()[0]
    out["t09_candidates"] = con.execute(
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
WHERE p.doc_id <> q.q_id"""
    ).fetchone()[0]
    out["t10_anchors"] = con.execute(
        BASE.format(d=d)
        + f"""
, phr AS (
  SELECT doc_id AS q_id, w[1] AS w0
  FROM words
  WHERE doc_id % {SIMILAR_QUERY_MOD} = 0
    AND doc_id < {BM25_QUERY_CAP} AND len(w) >= 3
)
SELECT count(*) FROM phr JOIN toks t
ON t.term = phr.w0 AND t.doc_id <> phr.q_id"""
    ).fetchone()[0]
    # p13 hashes every unigram + bigram occurrence (map-side): volume =
    # sum(n_tokens) + sum(greatest(n_tokens - 1, 0)) over docs
    out["p13_feature_rows"] = con.execute(
        BASE.format(d=d)
        + """SELECT sum(len(w)) + sum(greatest(len(w) - 1, 0))
             FROM words"""
    ).fetchone()[0]
    # p14's build side: distinct shingles of the bench slice
    # (doc_id % 97 == 0); probe side: every non-bench shingle row.
    # Both are inherently linear in the corpus (decontamination scans
    # the corpus by definition) — what must stay FIXED is the filter
    # itself (32 kbit broadcast), which these counts contextualize.
    out["p14_eval_shingles"] = con.execute(
        BASE.format(d=d)
        + "SELECT count(DISTINCT s) FROM sh WHERE doc_id % 97 = 0"
    ).fetchone()[0]
    out["p14_probe_rows"] = con.execute(
        BASE.format(d=d)
        + "SELECT count(*) FROM sh WHERE doc_id % 97 <> 0"
    ).fetchone()[0]
    return out


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        c = counts(d)
        print(d, c)
