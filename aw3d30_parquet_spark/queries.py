"""The declared query contract (SURVEY.md §2.3): oracle SQL, Q1–Q28.

These strings are the t2 correctness contract — each was validated to
hash-match between Spark SQL and DuckDB on sf0.01 (SURVEY §2.3,
"Empirically validated"). They are deliberately dialect-shared and
deterministic (total ORDER BY or pure aggregate, floats rounded,
NULLS FIRST pinned). Do not reword casually.

The engine's own implementations are DataFrame-API (operators/
relational.py); the SQL here is what the DuckDB oracle runs.
Extended (LLM-pipeline) oracle SQL lives in functions/ next to its
implementation and may use DuckDB dialect — the contract is matching
results + column names, not shared text.
"""

from __future__ import annotations

from aw3d30_parquet_spark.constants import (
    HLL_ALPHA_NUM,
    HLL_M,
    HLL_P,
    HLL_RHO_MAX,
)

# a10's oracle mirrors the operator constant-for-constant; the α·m²/2^-53
# numerator is embedded as the SAME double literal the operator uses so
# the one float division per week is bit-identical across engines.
_A10_SQL = f"""
WITH ev AS (
  SELECT date_trunc('day', ts) AS day, user_id FROM events
), hh AS (
  SELECT day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM ev
), rw AS (
  SELECT day, h % {HLL_M} AS j,
         (h >> {HLL_P}) + {1 << 52} AS w1
  FROM hh
), rr AS (
  SELECT day, j, CAST(log2(w1 & (-w1)) AS INT) + 1 AS rho FROM rw
), daily AS (
  SELECT day, j, max(rho) AS r FROM rr GROUP BY 1, 2
), weekly AS (
  SELECT CAST(date_trunc('week', day) AS DATE) AS week, j, max(r) AS r
  FROM daily GROUP BY 1, 2
), agg AS (
  SELECT week,
         CAST(sum(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - r)) AS BIGINT)
           AS s_hit,
         count(*) AS m_hit
  FROM weekly GROUP BY week
), fin AS (
  SELECT week,
         s_hit + ({HLL_M} - m_hit) * (CAST(1 AS BIGINT) << {HLL_RHO_MAX})
           AS s_int,
         CAST({HLL_M} - m_hit AS BIGINT) AS zero_registers
  FROM agg
)
SELECT week, s_int, zero_registers,
       CAST(floor(
         CASE WHEN {HLL_ALPHA_NUM!r} / s_int <= {2.5 * HLL_M}
                   AND zero_registers > 0
              THEN CAST({HLL_M} AS DOUBLE)
                   * ln(CAST({HLL_M} AS DOUBLE) / zero_registers)
              ELSE {HLL_ALPHA_NUM!r} / s_int
         END * 10000 + 0.5) AS BIGINT) / 10000.0 AS est
FROM fin ORDER BY week
"""

ORACLE_SQL: dict[str, str] = {
    # -- scan + projection
    "q01_scan_project": """
SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
""",
    # -- conjunctive range filter (mirrors Set::filter Netherlands,
    #    reference src/main.rs:71-74)
    "q02_filter_conjunction": """
SELECT c_custkey, c_name FROM customer
WHERE c_nationkey BETWEEN 5 AND 10 AND c_acctbal > 1000.0
ORDER BY c_custkey
""",
    # -- disjunctive filter (mirrors Set::filter France, src/main.rs:75-79)
    "q03_filter_disjunction": """
SELECT event_id FROM events
WHERE (event_type = 'error' OR value > 150.0) AND user_id < 20
ORDER BY event_id
""",
    # -- regex extraction (mirrors the tile-key parser, src/main.rs:298)
    "q04_regex_extract": """
SELECT doc_id, regexp_extract(source, '[0-9]+', 0) AS src_num
FROM documents WHERE lang = 'en' ORDER BY doc_id
""",
    # -- inner equi join + agg
    "q05_inner_join": """
SELECT n_name, count(*) AS cnt
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
    # -- multi-way star join (broadcast-dim shape)
    "q06_star_join": """
SELECT r_name,
       CAST(floor(
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
    # -- left outer join
    "q07_left_outer_join": """
SELECT n_name, count(c_custkey) AS cnt
FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name
""",
    # -- semi join via EXISTS
    "q08_semi_join": """
SELECT count(*) AS cnt FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45.0)
""",
    # -- anti join via NOT EXISTS
    "q09_anti_join": """
SELECT count(*) AS cnt FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    # -- theta (non-equi) join
    "q10_theta_join": """
SELECT count(*) AS cnt
FROM supplier s JOIN customer c
ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
""",
    # -- grouped aggregation suite (TPC-H Q1 shape)
    "q11_group_agg": """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       CAST(floor(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                  * 100 + 0.5) AS BIGINT) / 100.0 AS sum_qty,
       CAST(floor(
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 100.0 * 100 + 0.5) AS BIGINT) / 100.0
         AS avg_price,
       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    # -- distinct aggregate
    "q12_count_distinct": """
SELECT count(DISTINCT user_id) AS cnt FROM events WHERE event_type = 'purchase'
""",
    # -- rollup
    "q13_rollup": """
SELECT event_type, count(*) AS cnt,
       CAST(floor(
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS total
FROM events GROUP BY ROLLUP (event_type)
ORDER BY event_type NULLS FIRST
""",
    # -- grouping sets
    "q14_grouping_sets": """
SELECT lang, source, count(*) AS cnt
FROM documents GROUP BY GROUPING SETS ((lang), (source))
ORDER BY lang NULLS FIRST, source NULLS FIRST
""",
    # -- ranking window, top-k per group (deterministic tie-break)
    "q15_rank_topk": """
SELECT c_mktsegment, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) t
WHERE rn <= 3 ORDER BY c_mktsegment, c_custkey
""",
    # -- analytic window (lag)
    "q16_lag": """
SELECT event_id,
       CAST(floor((value - lag(value, 1, 0.0)
              OVER (PARTITION BY user_id ORDER BY ts, event_id))
            * 100 + 0.5) AS BIGINT) / 100.0 AS delta
FROM events WHERE user_id = 1 ORDER BY event_id
""",
    # -- window frame spec
    "q17_window_frame": """
SELECT event_id,
       CAST(floor(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            * 100 + 0.5) AS BIGINT) / 100.0 AS run3
FROM events WHERE user_id <= 3 ORDER BY event_id
""",
    # -- global sort + limit (top-k)
    "q18_topk": """
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0 AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    # -- intersect
    "q19_intersect": """
SELECT c_nationkey AS k FROM customer
INTERSECT SELECT s_nationkey FROM supplier ORDER BY k
""",
    # -- except
    "q20_except": """
SELECT n_nationkey FROM nation
EXCEPT SELECT s_nationkey FROM supplier ORDER BY n_nationkey
""",
    # -- union all
    "q21_union_all": """
SELECT count(*) AS cnt FROM (
  SELECT c_custkey AS k FROM customer
  UNION ALL SELECT s_suppkey FROM supplier) t
""",
    # -- string functions
    "q22_string_funcs": """
SELECT doc_id, upper(lang) AS lang_u, length(text) AS n, substr(text, 1, 10) AS head
FROM documents WHERE doc_id < 20 ORDER BY doc_id
""",
    # -- date functions (explicit DATE cast unifies DuckDB DATE vs Spark TS)
    "q23_date_trunc": """
SELECT cast(date_trunc('day', ts) AS DATE) AS d, count(*) AS cnt
FROM events GROUP BY cast(date_trunc('day', ts) AS DATE) ORDER BY d
""",
    # -- conditional + math functions
    "q24_cond_math": """
SELECT event_type,
       CAST(floor(
         CAST(sum(CASE WHEN value > 100.0
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS DOUBLE) / 100.0
         * 100 + 0.5) AS BIGINT) / 100.0 AS big,
       CAST(floor(sum(sqrt(abs(value))) * 100 + 0.5) AS BIGINT) / 100.0
         AS rooted,
       CAST(sum(cast(floor(value) AS BIGINT)) AS BIGINT) AS floored
FROM events GROUP BY event_type ORDER BY event_type
""",
    # -- semi-structured extraction from JSON-ish string column
    "q25_json_extract": """
SELECT event_id, cast(regexp_extract(props, '[0-9]+', 0) AS INTEGER) AS k
FROM events WHERE event_id < 25 ORDER BY event_id
""",
    # -- tumbling-window aggregation, batch form (streaming analogue in S-tests)
    "q26_tumbling_window": """
SELECT date_trunc('hour', ts) AS w, count(*) AS cnt
FROM events WHERE event_type = 'click'
GROUP BY date_trunc('hour', ts) ORDER BY w
""",
    # -- exact dedup
    "q27_distinct": """
SELECT count(*) AS cnt FROM (SELECT DISTINCT lang, source FROM documents) t
""",
    # -- as-of semantics (latest signup at-or-before each purchase)
    "q28_asof": """
SELECT e.event_id,
       (SELECT max(s.ts) FROM events s
        WHERE s.user_id = e.user_id AND s.event_type = 'signup' AND s.ts <= e.ts)
       AS last_signup
FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id
""",
    # q29: real JSON-path extraction (Spark get_json_object ↔ DuckDB
    # json_extract_string) feeding a grouped aggregate.
    "q29_json_path": """
WITH ex AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
SELECT event_type, count(*) AS cnt, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM ex WHERE k IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    # q30: full grouping lattice; NULLS FIRST pinned (SURVEY §2.3 rules)
    "q30_cube": """
SELECT event_type, CAST(floor(value / 50.0) AS INTEGER) AS band,
       count(*) AS cnt,
       CAST(floor(
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS total
FROM events
GROUP BY CUBE (event_type, CAST(floor(value / 50.0) AS INTEGER))
ORDER BY event_type NULLS FIRST, band NULLS FIRST
""",
    "q31_cross_join": """
SELECT r_regionkey, count(*) AS cnt, CAST(sum(s_nationkey) AS BIGINT) AS sum_nk
FROM supplier CROSS JOIN region
GROUP BY r_regionkey ORDER BY r_regionkey
""",
    "q32_range_frame": """
SELECT event_id,
       CAST(floor(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
              RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
            * 100 + 0.5) AS BIGINT) / 100.0 AS range5
FROM events WHERE user_id <= 3 ORDER BY event_id
""",
    "q33_fact_fact_join": """
SELECT o_orderpriority, count(*) AS cnt,
       CAST(floor(
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              AS DOUBLE) / 10000.0 * 100 + 0.5) AS BIGINT) / 100.0
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    "q34_full_outer_join": """
SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, p_orders, p_total
FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 750) c
FULL OUTER JOIN (
  SELECT o_custkey, count(*) AS p_orders,
         CAST(floor(
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE)
           / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS p_total
  FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
) o ON c_custkey = o_custkey
ORDER BY custkey
""",
    "q35_pivot": """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    "q36_percentiles": """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "q37_first_last_nth": """
SELECT event_id, user_id,
       CAST(floor(first_value(value) OVER w * 100 + 0.5) AS BIGINT) / 100.0
         AS first_v,
       CAST(floor(last_value(value)  OVER w * 100 + 0.5) AS BIGINT) / 100.0
         AS last_v,
       CAST(floor(nth_value(value, 3) OVER w * 100 + 0.5) AS BIGINT) / 100.0
         AS third_v
FROM events WHERE user_id <= 3
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY event_id
""",
    "q38_ntile": """
SELECT bucket, count(*) AS cnt,
       CAST(floor(min(o_totalprice) * 100 + 0.5) AS BIGINT) / 100.0 AS lo,
       CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) / 100.0 AS hi
FROM (SELECT o_totalprice,
             ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
GROUP BY bucket ORDER BY bucket
""",
    "q39_posexplode": """
WITH toks AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents WHERE doc_id < 100
)
SELECT u.token, count(*) AS cnt
FROM toks, LATERAL (
  SELECT unnest(t) AS token, unnest(range(len(t))) AS pos
) u
WHERE u.pos < 5
GROUP BY u.token ORDER BY u.token
""",
    "q40_correlated_subquery": """
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0 AS total
FROM orders o
WHERE (SELECT count(*) FROM lineitem l
       WHERE l.l_orderkey = o.o_orderkey) >= 7
ORDER BY o_orderkey
""",
    # q41: statistical aggregates derived from EXACT integer sums (quantity
    # is integral; price/discount are exact cents) so partial-agg merge
    # order cannot perturb the rounded doubles — the final double math
    # mirrors the Spark expression tree term-for-term (IEEE ops are
    # deterministic given identical expressions and exact inputs).
    "q41_stat_agg": """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(q) AS sq, sum(q*q) AS sqq,
         sum(p) AS sp, sum(p*p) AS spp, sum(q*p) AS sqp,
         sum(d) AS sd, sum(q*d) AS sqd
  FROM (SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d
        FROM lineitem)
  GROUP BY l_returnflag
), f AS (
  SELECT l_returnflag,
         CAST(n AS DOUBLE) AS n,
         CAST(sq AS DOUBLE) AS sq, CAST(sqq AS DOUBLE) AS sqq,
         CAST(sp AS DOUBLE) AS sp, CAST(spp AS DOUBLE) AS spp,
         CAST(sqp AS DOUBLE) AS sqp,
         CAST(sd AS DOUBLE) AS sd, CAST(sqd AS DOUBLE) AS sqd
  FROM s
)
SELECT l_returnflag,
       CAST(floor(sqrt((sqq - sq*sq/n) / (n - 1.0)) * 100 + 0.5) AS BIGINT)
         / 100.0 AS sd_qty,
       CAST(floor((sqq - sq*sq/n) / (n - 1.0) * 100 + 0.5) AS BIGINT)
         / 100.0 AS var_qty,
       CAST(floor((sqp - sq*sp/n) /
                  (sqrt(sqq - sq*sq/n) * sqrt(spp - sp*sp/n))
                  * 1000 + 0.5) AS BIGINT) / 1000.0 + 0.0 AS corr_qp,
       CAST(floor((sqd - sq*sd/n) / n / 100.0 * 1000 + 0.5) AS BIGINT)
         / 1000.0 + 0.0 AS cov_qd
FROM f ORDER BY l_returnflag
""",
    # q42: argmin/argmax — c_custkey unique ⇒ deterministic
    "q42_min_max_by": """
SELECT c_nationkey,
       max_by(c_name, c_custkey) AS max_name,
       min_by(c_name, c_custkey) AS min_name
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
""",
    "q43_having": """
SELECT o_custkey, count(*) AS n_orders,
       CAST(floor(
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS total
FROM orders GROUP BY o_custkey HAVING count(*) >= 15
ORDER BY o_custkey
""",
    "q44_percent_rank": """
SELECT c_custkey, c_mktsegment,
       CAST(floor(percent_rank() OVER w * 10000 + 0.5) AS BIGINT) / 10000.0
         AS pr,
       CAST(floor(cume_dist()    OVER w * 10000 + 0.5) AS BIGINT) / 10000.0
         AS cd
FROM customer WHERE c_custkey <= 200
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
""",
    # q45: interval arithmetic (DuckDB spells the interval with quotes;
    #      semantics are identical on naive timestamps)
    "q45_interval_arith": """
SELECT event_id,
       ts + INTERVAL '1 hour' AS ts_plus_h,
       CAST(ts AS DATE) + 30 AS d_plus_30,
       date_diff('day', CAST(ts AS DATE), DATE '2025-01-01') AS days_to_2025
FROM events WHERE event_id < 50 ORDER BY event_id
""",
    "q46_uncorrelated_subquery": """
SELECT c_custkey,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) / 100.0 AS bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)
ORDER BY c_custkey
""",
    # q47: deterministic list agg — sort before join; DuckDB list() is
    #      order-dependent just like collect_list
    "q47_sorted_list_agg": """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
    "q48_bitwise": """
SELECT user_id & 7 AS band, count(*) AS cnt,
       CAST(sum(xor(event_id, user_id)) AS BIGINT) AS sum_x,
       CAST(sum(user_id << 2) AS BIGINT) AS sum_s
FROM events GROUP BY user_id & 7 ORDER BY band
""",
    # q49: higher-order list functions — DuckDB spells them list_*;
    #      predicates compare exact floats (no summation → no float risk)
    "q49_array_hof": """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       CAST(list_indexof(embedding, list_max(embedding)) AS BIGINT) AS argmax,
       len(list_filter(embedding, x -> x > 2.0)) > 0 AS has_big
FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
""",
    # q50: Spark's map functions ↔ DuckDB's JSON functions over the
    #      same props strings
    "q50_map_ops": """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
       CAST(len(json_keys(props)) AS BIGINT) AS n_keys
FROM events WHERE event_id < 50 ORDER BY event_id
""",
    # q51: struct_pack ↔ named_struct; field access on the max_by result
    "q51_struct_ops": """
SELECT c_nationkey,
       CAST(floor((t.top).bal * 100 + 0.5) AS BIGINT) / 100.0 AS top_bal,
       (t.top).name AS top_name
FROM (
  SELECT c_nationkey,
         max_by(struct_pack(bal := c_acctbal, name := c_name), c_custkey) AS top
  FROM customer GROUP BY c_nationkey
) t
ORDER BY c_nationkey
""",
    "q52_except_intersect_all": """
SELECT op, k, cnt FROM (
  SELECT 'except_all' AS op, k, count(*) AS cnt FROM (
    SELECT c_nationkey AS k FROM customer
    EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY k
  UNION ALL
  SELECT 'intersect_all' AS op, k, count(*) AS cnt FROM (
    SELECT c_nationkey AS k FROM customer
    INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY k
) ORDER BY op, k
""",
    # q53: DuckDB regexp_replace needs 'g' for Spark's replace-all
    "q53_string_transform": """
SELECT doc_id,
       length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_novowel,
       translate(source, 'src', 'SRC') AS src_u,
       lpad(lang, 5, '_') AS lang_pad,
       reverse(lang) AS lang_rev
FROM documents WHERE doc_id < 30 ORDER BY doc_id
""",
    "q54_time_range_frame": """
SELECT event_id,
       count(*) OVER w AS cnt_1h,
       CAST(floor(sum(value) OVER w * 100 + 0.5) AS BIGINT) / 100.0
         AS sum_1h
FROM events WHERE user_id <= 5
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    "q55_null_least_greatest": """
SELECT event_id,
       nullif(CAST(floor(value) AS BIGINT) % 3, 0) AS band_nz,
       coalesce(nullif(CAST(floor(value) AS BIGINT) % 3, 0), -1) AS band_filled,
       CAST(floor(least(value, 100.0) * 100 + 0.5) AS BIGINT) / 100.0
         AS capped,
       CAST(floor(greatest(value, 10.0) * 100 + 0.5) AS BIGINT) / 100.0
         AS floored
FROM events WHERE event_id < 60 ORDER BY event_id
""",
    # q56: UNPIVOT syntax differs (Spark: FOR..IN; DuckDB: ON..INTO)
    "q56_unpivot": """
SELECT event_type, metric,
       CAST(floor(val * 100 + 0.5) AS BIGINT) / 100.0 AS val FROM (
  UNPIVOT (
    SELECT event_type,
           CAST(floor(
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS total,
           CAST(floor(
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0
             * 100 + 0.5) AS BIGINT) / 100.0 AS mean,
           CAST(count(*) AS DOUBLE) AS cnt
    FROM events GROUP BY event_type
  ) ON total, mean, cnt INTO NAME metric VALUE val
) ORDER BY event_type, metric
""",
    "q57_lateral_join": """
SELECT n_name, t.n_cust, t.max_bal
FROM nation,
LATERAL (
  SELECT count(*) AS n_cust,
         CAST(floor(max(c_acctbal) * 100 + 0.5) AS BIGINT) / 100.0
           AS max_bal
  FROM customer WHERE c_nationkey = n_nationkey
) t
ORDER BY n_name
""",
    # q58: DuckDB puts IGNORE NULLS inside the call parens
    "q58_ignore_nulls_window": """
SELECT event_id,
       CAST(floor(
         last_value(CASE WHEN event_type = 'error' THEN NULL
                         ELSE value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         * 100 + 0.5) AS BIGINT) / 100.0 AS carried
FROM events WHERE user_id <= 8
ORDER BY event_id
""",
    "q59_group_by_all": """
SELECT event_type, user_id % 10 AS bucket, count(*) AS cnt,
       CAST(floor(
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 * 100 + 0.5) AS BIGINT) / 100.0 AS total
FROM events GROUP BY ALL
ORDER BY event_type, bucket
""",
    # q60: DuckDB's generate_series(date, date, interval) yields
    #      timestamps — cast back to DATE
    "q60_date_series_fill": """
SELECT cal.d, coalesce(e.cnt, 0) AS cnt
FROM (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                     INTERVAL 1 DAY)) AS DATE) AS d
) cal
LEFT JOIN (
  SELECT CAST(ts AS DATE) AS ed, count(*) AS cnt
  FROM events GROUP BY CAST(ts AS DATE)
) e ON cal.d = e.ed
ORDER BY cal.d
""",
    # q61: same recursion in both dialects (floor-cast parent arithmetic
    #      is dialect-shared; DuckDB integer '/' yields DOUBLE, hence /2.0)
    "q61_recursive_cte": """
WITH RECURSIVE tree AS (
  SELECT n_nationkey AS k, 0 AS depth FROM nation WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey, t.depth + 1
  FROM nation n JOIN tree t
    ON CAST(floor((n.n_nationkey - 1) / 2.0) AS INT) = t.k
  WHERE n.n_nationkey > 0
)
SELECT depth, count(*) AS cnt, min(k) AS min_k, max(k) AS max_k
FROM tree GROUP BY depth ORDER BY depth
""",
    "q62_bool_agg_cume_dist": """
WITH cd AS (
  SELECT c_mktsegment, c_acctbal,
         cume_dist() OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey) AS cd
  FROM customer
)
SELECT c_mktsegment,
       bool_and(c_acctbal > -1000.0) AS none_deep_negative,
       bool_or(c_acctbal > 9000.0) AS any_rich,
       count(*) FILTER (WHERE cd <= 0.1) AS bottom_decile_cnt,
       count(*) AS cnt
FROM cd GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    # q63: independent derivation of the try_ semantics — CASE/NULL
    #      arithmetic, not DuckDB try_ twins
    "q63_try_arithmetic": """
SELECT event_id,
       CASE WHEN user_id % 3 = 0 THEN NULL
            ELSE floor(value / (user_id % 3) * 100 + 0.5) / 100 END AS ratio,
       CAST(regexp_extract(props, '[0-9]+', 0) AS INT) AS k_val,
       CAST(NULL AS INT) AS not_numeric
FROM events WHERE event_id < 60 ORDER BY event_id
""",
    # q64: DuckDB has no width_bucket — emulate with the same
    #      floor((x-lo)/w)+1 arithmetic Spark's WidthBucket evaluates
    "q64_width_bucket_histogram": """
SELECT CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 13
            ELSE CAST(floor(o_totalprice / 50000.0) AS INT) + 1 END AS bucket,
       count(*) AS cnt,
       CAST(floor(min(o_totalprice) * 100 + 0.5) AS BIGINT) / 100.0 AS lo,
       CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) / 100.0 AS hi
FROM orders GROUP BY 1 ORDER BY bucket
""",
    # q65: same chained-carry windows; exact integer stage counts
    "q65_event_funnel": """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
), st AS (
  SELECT user_id, ts, event_id, event_type,
         min(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS t_signup
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), st2 AS (
  SELECT user_id, ts, event_type, t_signup,
         min(CASE WHEN event_type = 'click' AND t_signup IS NOT NULL
                       AND ts > t_signup THEN ts END) OVER w AS t_click
  FROM st
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), pu AS (
  SELECT user_id,
         max(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS s1,
         max(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS s2,
         max(CASE WHEN event_type = 'purchase' AND t_click IS NOT NULL
                       AND ts > t_click THEN 1 ELSE 0 END) AS s3
  FROM st2 GROUP BY user_id
)
SELECT count(*) AS users,
       CAST(sum(s1) AS BIGINT) AS signed_up,
       CAST(sum(s2) AS BIGINT) AS clicked_after,
       CAST(sum(s3) AS BIGINT) AS purchased_after
FROM pu
""",
    # q66: same cohort arithmetic; count(DISTINCT CASE ...) pivots the
    # week offsets; date_trunc('week') is Monday-start in both engines
    "q66_retention_cohorts": """
WITH signups AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), acts AS (
  SELECT CAST(date_trunc('week', s.t0) AS DATE) AS cohort,
         date_diff('day', CAST(s.t0 AS DATE), CAST(e.ts AS DATE)) // 7 AS w,
         e.user_id
  FROM events e JOIN signups s USING (user_id)
  WHERE e.ts >= s.t0
)
SELECT cohort,
       count(DISTINCT CASE WHEN w = 0 THEN user_id END) AS w0,
       count(DISTINCT CASE WHEN w = 1 THEN user_id END) AS w1,
       count(DISTINCT CASE WHEN w = 2 THEN user_id END) AS w2,
       count(DISTINCT CASE WHEN w = 3 THEN user_id END) AS w3
FROM acts WHERE w BETWEEN 0 AND 3
GROUP BY cohort ORDER BY cohort
""",
    # q67: date_diff('second') counts second-boundary crossings =
    # floor-epoch difference = Spark's unix_timestamp arithmetic
    "q67_sessionization": """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
), per AS (
  SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY user_id, sid
)
SELECT n_events, count(*) AS n_sessions
FROM per GROUP BY n_events ORDER BY n_events
""",
    # q68: DATE + INTEGER adds days in DuckDB (Spark: date_add); the
    # interval predicate matches exactly one version per order, and
    # revenue sums as exact integer cents (floor is IEEE-identical)
    "q68_scd_dimension_join": """
WITH versions AS (
  SELECT c_custkey, c_mktsegment, v.v AS v,
         DATE '1994-01-01' + CAST(v.v * 800 + c_custkey % 365 AS INTEGER)
           AS eff_from
  FROM customer, (SELECT unnest([0, 1, 2]) AS v) v
), iv AS (
  SELECT *, lead(eff_from) OVER (PARTITION BY c_custkey ORDER BY v)
            AS eff_to
  FROM versions
)
SELECT c_mktsegment || '/v' || CAST(v AS VARCHAR) AS seg_version,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN iv
  ON o.o_custkey = iv.c_custkey
 AND iv.eff_from <= CAST(o.o_orderdate AS DATE)
 AND (iv.eff_to IS NULL OR CAST(o.o_orderdate AS DATE) < iv.eff_to)
GROUP BY seg_version ORDER BY seg_version
""",
    # q69: the same merge as a full-outer join; all money as exact
    # floor-cents integers before any aggregation
    "q69_merge_upsert": """
WITH tgt AS (
  SELECT c_custkey, CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), upd AS (
  SELECT user_id + CASE WHEN event_id % 11 = 0 THEN 10000 ELSE 0 END AS key,
         CAST(floor(value * 100) AS BIGINT) AS delta
  FROM events
), agg AS (
  SELECT key, CAST(sum(delta) AS BIGINT) AS delta_cents
  FROM upd GROUP BY key
), m AS (
  SELECT CASE WHEN t.c_custkey IS NULL THEN 'insert'
              WHEN a.key IS NULL THEN 'keep'
              ELSE 'update' END AS action,
         coalesce(t.bal_cents, 0) + coalesce(a.delta_cents, 0) AS new_bal
  FROM tgt t FULL OUTER JOIN agg a ON t.c_custkey = a.key
)
SELECT action, count(*) AS n_rows,
       CAST(sum(new_bal) AS BIGINT) AS total_cents
FROM m GROUP BY action ORDER BY action
""",
    # q70: the all-integer z²>9 inequality — no float in the flag on
    # either engine, so window merge order cannot flip a flag
    "q70_rolling_anomalies": """
WITH framed AS (
  SELECT event_type,
         CAST(floor(value * 100) AS BIGINT) AS v,
         count(*) OVER w AS n,
         sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS s1,
         sum(CAST(floor(value * 100) AS BIGINT)
             * CAST(floor(value * 100) AS BIGINT)) OVER w AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
), flagged AS (
  SELECT event_type,
         CASE WHEN (v * n - s1) * (v * n - s1) > 9 * (n * s2 - s1 * s1)
              THEN 1 ELSE 0 END AS anom
  FROM framed WHERE n >= 5
)
SELECT event_type, count(*) AS n_scored,
       CAST(sum(anom) AS BIGINT) AS n_anomalies
FROM flagged GROUP BY event_type ORDER BY event_type
""",
    # q71: snapshot diff — the oracle compares payload VALUES where the
    # engine compares xxhash64 digests; equal classification either way
    "q71_snapshot_diff": """
WITH v1 AS (
  SELECT c_custkey AS key,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
         c_nationkey AS nk
  FROM customer
), v2 AS (
  SELECT key,
         bal_cents + CASE WHEN key % 13 = 0 THEN 500 ELSE 0 END AS bal_cents,
         nk
  FROM v1 WHERE key % 97 <> 0
  UNION ALL
  SELECT key + 1000000, bal_cents, nk FROM v1 WHERE key % 101 = 0
), d AS (
  SELECT CASE
           WHEN a.key IS NULL THEN 'insert'
           WHEN b.key IS NULL THEN 'delete'
           WHEN a.bal_cents <> b.bal_cents OR a.nk <> b.nk THEN 'update'
           ELSE 'unchanged'
         END AS action,
         COALESCE(a.key, b.key) AS key
  FROM v1 a FULL OUTER JOIN v2 b ON a.key = b.key
)
SELECT action, count(*) AS n_rows, CAST(sum(key) AS BIGINT) AS sum_keys
FROM d GROUP BY action ORDER BY action
""",
    # q73: VARIANT typed access on the Spark side; DuckDB reads the
    # same value through its JSON operators — results must agree
    "q73_variant_json": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       count(DISTINCT CAST(props::JSON->>'k' AS BIGINT)) AS n_k
FROM events GROUP BY event_type ORDER BY event_type
""",
    # q74: same LATERAL construct in DuckDB (both engines decorrelate;
    # integer-cents spend keeps rank order float-free)
    "q74_lateral_topk": """
SELECT s.c_mktsegment, t.c_custkey, t.spend_cents
FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
LATERAL (
  SELECT c.c_custkey,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS spend_cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = s.c_mktsegment
  GROUP BY c.c_custkey
  ORDER BY spend_cents DESC, c_custkey LIMIT 2
) t
ORDER BY c_mktsegment, spend_cents DESC, c_custkey
""",
    # a07: EXACT heavy hitters — the oracle is the naive full groupBy;
    # matching it proves the Misra–Gries candidate pass dropped no
    # true heavy hitter and the verify pass counted exactly
    "a07_heavy_hitters": """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
), tot AS (SELECT count(*) AS n FROM toks)
SELECT tok, count(*) AS cnt
FROM toks, tot
GROUP BY tok, n
HAVING count(*) * 200 >= n
ORDER BY cnt DESC, tok
""",
    # a08: full hash oracle for the CMS weekly rollup — promoted from
    # rows-only (r7). The estimate needs no matrix at all in SQL:
    # est(u) = min_i |{events e in week : h_i(e.user) = h_i(u)}| — the
    # weekly matrix cell M[i, h_i(u)] IS that count, because weekly
    # rollup is element-wise addition of daily counts. The
    # multiply-shift hash ((id+1)·a_i mod 2^64) >> 54 is exact integer
    # arithmetic: DuckDB computes the wraparound product in HUGEINT
    # (ids ≥ 0, so (id+1)·a < 2^127 always) and the bucket by integer
    # division by 2^54. Unlike a03–a06 (engine-RNG/register-format
    # sketches), every CMS operation here is order-independent integer
    # math — the same promotability class as v03/v04's hyperplanes.
    "a08_cms_freq_rollup": """
WITH ev AS (
  SELECT CAST(date_trunc('week', date_trunc('day', ts)) AS DATE) AS week,
         user_id
  FROM events
), mult(i, a) AS (
  VALUES (0, CAST(11400714819323198485 AS HUGEINT)),
         (1, CAST(14029467366897019727 AS HUGEINT)),
         (2, CAST(1609587929392839161 AS HUGEINT)),
         (3, CAST(2870177450012600261 AS HUGEINT))
), week_cells AS (
  SELECT e.week, m.i,
         ((CAST(e.user_id + 1 AS HUGEINT) * m.a) % 18446744073709551616)
           // 18014398509481984 AS b,
         count(*) AS cnt
  FROM ev e CROSS JOIN mult m
  GROUP BY 1, 2, 3
), wk AS (
  SELECT week, count(*) AS n_events FROM ev GROUP BY week
), probes(user_id) AS (
  VALUES (0),(10),(20),(30),(40),(50),(60),(70),(80),(90)
), probe_cells AS (
  SELECT w.week, p.user_id, m.i,
         ((CAST(p.user_id + 1 AS HUGEINT) * m.a) % 18446744073709551616)
           // 18014398509481984 AS b
  FROM wk w CROSS JOIN probes p CROSS JOIN mult m
)
SELECT pc.week AS week,
       CAST(pc.user_id AS BIGINT) AS user_id,
       CAST(min(COALESCE(wc.cnt, 0)) AS BIGINT) AS est,
       CAST(any_value(w.n_events) AS BIGINT) AS n_events
FROM probe_cells pc
JOIN wk w ON w.week = pc.week
LEFT JOIN week_cells wc
  ON wc.week = pc.week AND wc.i = pc.i AND wc.b = pc.b
GROUP BY pc.week, pc.user_id
ORDER BY pc.week, pc.user_id
""",
    # a10: full hash oracle for the HLL distinct rollup — same exact
    # register arithmetic: md5-prefix 60-bit hash (v03's device),
    # trailing-zero rho via log2 of a power of two (IEEE-exact), the
    # harmonic sum as an exact BIGINT in units of 2^-53, one float
    # division per week against the shared constant literal.
    "a10_hll_distinct_rollup": _A10_SQL,
    # q75: same contribution-explode derivation in DuckDB (a
    # COUNT(DISTINCT) OVER RANGE is also directly expressible there,
    # but the twin mirrors the operator's day-arithmetic exactly)
    "q75_rolling_distinct_users": """
WITH daily AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
), span AS (
  SELECT max(day) AS max_day FROM daily
), contrib AS (
  SELECT DISTINCT day + CAST(k.k AS INTEGER) AS day, user_id
  FROM daily CROSS JOIN (SELECT unnest(range(0, 7)) AS k) k, span
  WHERE day + CAST(k.k AS INTEGER) <= span.max_day
), wau AS (
  SELECT day, count(*) AS wau FROM contrib GROUP BY day
), dau AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM daily GROUP BY day
)
SELECT w.day, COALESCE(d.dau, 0) AS dau, w.wau
FROM wau w LEFT JOIN dau d ON d.day = w.day
ORDER BY w.day
""",
    # a09: the KMV sketch content (k smallest md5 digests) is a
    # deterministic relation — full sketch state + estimates are
    # hash-checked, the one sketch-family member that can be. The ALL
    # row merges the WEEKLY sketches (bottom-k of their union), the
    # lossless-merge property the operator certifies in-plan. 2^60 is
    # an exact double; the estimator is one division on identical
    # operands.
    "a09_kmv_bottomk_rollup": """
WITH dig AS (
  SELECT DISTINCT CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR) AS scope,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
), weekly AS (
  SELECT scope, h FROM (
    SELECT scope, h,
           row_number() OVER (PARTITION BY scope ORDER BY h) AS rn
    FROM dig
  ) WHERE rn <= 32
), allsk AS (
  SELECT 'ALL' AS scope, h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM weekly)
  ) WHERE rn <= 32
), sk AS (
  SELECT * FROM weekly UNION ALL SELECT * FROM allsk
), exact AS (
  SELECT scope, count(*) AS exact_distinct FROM dig GROUP BY scope
  UNION ALL
  SELECT 'ALL', count(DISTINCT h) FROM dig
), agg AS (
  SELECT scope, count(*) AS n_sketch, max(h) AS kth_digest
  FROM sk GROUP BY scope
)
SELECT a.scope, a.n_sketch, a.kth_digest,
       CASE WHEN a.n_sketch < 32 THEN a.n_sketch
            ELSE CAST(floor(31.0 * 1152921504606846976.0
                 / CAST(a.kth_digest AS DOUBLE) + 0.5) AS BIGINT)
       END AS est_distinct,
       e.exact_distinct
FROM agg a JOIN exact e ON e.scope = a.scope
ORDER BY a.scope
""",
}
