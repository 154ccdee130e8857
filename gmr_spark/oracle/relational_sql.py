"""DuckDB twins for the relational surface (gmr_spark.operators.relational).

Same DECIMAL-cast / unique-tiebreak determinism contract; see that module's
docstring. Each string runs on the driver's pre-registered DuckDB views.
"""

_REV = "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))"

Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

Q3 = f"""
WITH agg AS (
    SELECT o.o_orderkey, o.o_orderpriority, CAST(ROUND({_REV}, 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderpriority
)
SELECT o_orderkey, o_orderpriority, revenue
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey) AS rn FROM agg) t
WHERE rn <= 10
"""

Q5 = f"""
SELECT n.n_name, CAST(ROUND({_REV}, 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_nationkey = c.c_nationkey
GROUP BY n.n_name
"""

FILTER_SCAN = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
"""

TOPK_PER_GROUP = """
SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INTEGER) AS rn
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
    FROM part
) t WHERE rn <= 3
"""

SET_OPS = """
SELECT 'both' AS tag, key FROM (
    SELECT c_custkey AS key FROM customer
    INTERSECT
    SELECT o_custkey AS key FROM orders
) a
UNION ALL
SELECT 'cust_only' AS tag, key FROM (
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders
) b
"""

ROLLUP_REVENUE = """
SELECT r.r_name, n.n_name,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""

WINDOW_RUNNING = """
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS seq,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

SESSIONIZE = """
WITH lagged AS (
    SELECT event_id, user_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT event_id, user_id, ts,
           CASE WHEN prev_ts IS NULL
                     OR date_diff('second', prev_ts, ts) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM lagged
)
SELECT event_id, user_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS session_seq
FROM flagged
"""

ASOF_JOIN = """
WITH matched AS (
    SELECT e.event_id, o.o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
    FROM events e
    JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.event_id, m.o_orderkey AS asof_orderkey
FROM events e
LEFT JOIN (SELECT event_id, o_orderkey FROM matched WHERE rn = 1) m
       ON m.event_id = e.event_id
"""

GLOBAL_SORT_RANK = """
SELECT event_id, CAST(ROW_NUMBER() OVER (ORDER BY value, event_id) AS INTEGER) AS rnk
FROM events
"""

DISTINCT_AGG = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""

PIVOT_EVENT_COUNTS = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view"
FROM events
GROUP BY user_id
"""

CUBE_ORDER_STATS = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

EXACT_PERCENTILES = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(MIN(value), 6) AS vmin,
       ROUND(MAX(value), 6) AS vmax
FROM events
GROUP BY event_type
"""

SCALAR_FUNCTIONS = """
SELECT event_id,
       CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS INTEGER) AS prop_k,
       UPPER(event_type) AS type_upper,
       CAST(LENGTH(event_type) AS INTEGER) AS type_len,
       CASE WHEN value >= 50.0 THEN 'high' ELSE 'low' END AS value_band
FROM events
"""

SEMI_JOIN_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""

ANTI_JOIN_QUIET_CUSTOMERS = """
SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
"""

RANGE_JOIN_EVENTS = """
SELECT e1.event_id, COUNT(e2.event_id) AS n_follow
FROM events e1
LEFT JOIN events e2 ON e2.user_id = e1.user_id
  AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
GROUP BY e1.event_id
"""

# Bound-check oracle for the sketch surface: the Spark side computes the
# sketch-vs-exact accuracy booleans itself (operators.relational.
# approx_sketch_bounds); the oracle asserts every bound holds. Both Spark
# sketches are deterministic for a fixed dataset, so these are stable rows.
APPROX_SKETCH_BOUNDS = """
SELECT event_type,
       TRUE AS users_within_10pct,
       TRUE AS p50_in_band,
       TRUE AS p90_in_band,
       TRUE AS p99_in_band
FROM events GROUP BY event_type
"""

ZSCORE_EVENTS = """
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6) AS z
FROM events
"""

Q6 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24
"""

Q18 = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
) b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""

Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""

Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(ROUND({_REV}, 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE s.s_nationkey IN (0, 1) AND c.c_nationkey IN (0, 1)
  AND s.s_nationkey <> c.c_nationkey
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
"""

# Q14 pattern: both sides of the share division ROUND(·, 2) then DOUBLE —
# decimal widths diverge across engines above that point.
Q8 = """
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CASE WHEN s.s_nationkey = 0
                THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                ELSE CAST(0 AS DECIMAL(22,6)) END), 2) AS DOUBLE)
       / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
       AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE p.p_type = 'STANDARD' AND cn.n_regionkey = 0
GROUP BY EXTRACT(year FROM o.o_orderdate)
"""

Q15 = f"""
WITH rev AS MATERIALIZED (
    SELECT l_suppkey, ROUND({_REV}, 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""

# threshold compare by exact decimal cross-multiplication (qty*5*cnt <
# sum_qty), mirroring the engine — never a float average
Q17 = """
WITH b1 AS MATERIALIZED (
    SELECT l.l_partkey, CAST(l.l_quantity AS DECIMAL(8,2)) AS qty,
           CAST(l.l_extendedprice AS DECIMAL(12,2)) AS ext
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
), stats AS MATERIALIZED (
    SELECT l_partkey AS sp, SUM(qty) AS sum_qty,
           CAST(COUNT(*) AS DECIMAL(10,0)) AS cnt
    FROM b1 GROUP BY l_partkey
)
SELECT CAST(ROUND(CAST(ROUND(SUM(b.ext), 2) AS DOUBLE) / 7.0, 2) AS DOUBLE)
       AS avg_yearly
FROM b1 b JOIN stats t ON b.l_partkey = t.sp
WHERE b.qty * CAST(5 AS DECIMAL(2,0)) * t.cnt < t.sum_qty
"""

Q10 = f"""
WITH agg AS (
    SELECT c.c_custkey, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal,
           n.n_name, CAST(ROUND({_REV}, 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
SELECT c_custkey, c_name, acctbal, n_name, revenue
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rn FROM agg) t
WHERE rn <= 20
"""

Q12 = """
SELECT l.l_returnflag,
       -- CAST: DuckDB SUM over INTEGER returns HUGEINT (int128), which
       -- pandas widens to float64/object and the driver hashes differently
       -- from Spark's BIGINT. Every final-projection SUM-of-integers must
       -- carry this cast (PIVOT_EVENT_COUNTS established the pattern).
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
GROUP BY l.l_returnflag
"""

Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
) t
GROUP BY c_count
"""

Q14 = """
SELECT 100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                ELSE CAST(0 AS DECIMAL(22,6)) END), 2) AS DOUBLE)
       / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""

Q19 = f"""
SELECT CAST(ROUND({_REV}, 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""

Q22 = """
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal a
WHERE c.c_acctbal > a.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
"""


Q2 = """
WITH parts AS MATERIALIZED (
    SELECT p_partkey, p_brand FROM part
    WHERE p_type = 'SMALL' AND p_size >= 40
), offers AS MATERIALIZED (
    SELECT l.l_partkey, l.l_suppkey,
           MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
    FROM lineitem l JOIN parts p ON l.l_partkey = p.p_partkey
    GROUP BY l.l_partkey, l.l_suppkey
), best AS (
    SELECT l_partkey, MIN(unit_cost) AS best_cost FROM offers GROUP BY l_partkey
), winner AS (
    SELECT o.l_partkey, MIN(o.l_suppkey) AS s_suppkey, MIN(o.unit_cost) AS best_cost
    FROM offers o JOIN best b
      ON o.l_partkey = b.l_partkey AND o.unit_cost = b.best_cost
    GROUP BY o.l_partkey
)
SELECT w.l_partkey AS p_partkey, p.p_brand, s.s_name, n.n_name, w.best_cost
FROM winner w
JOIN parts p ON p.p_partkey = w.l_partkey
JOIN supplier s ON s.s_suppkey = w.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
"""

Q9 = """
SELECT n.n_name,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(
           CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4)))
           - CAST(p.p_retailprice AS DECIMAL(12,2))
             * CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))
       ), 2) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
"""

Q11 = """
WITH per_part AS MATERIALIZED (
    SELECT l.l_partkey,
           SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * CAST(l.l_quantity AS DECIMAL(12,2))) AS value
    FROM lineitem l
    WHERE l.l_suppkey IN (
        SELECT s.s_suppkey FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA')
    GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(ROUND(value, 2) AS DOUBLE) AS stock_value
FROM per_part
WHERE CAST(value AS DOUBLE)
      > (SELECT CAST(SUM(value) AS DOUBLE) FROM per_part) * 0.0001
"""

Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""

Q20 = """
WITH pair_vol AS MATERIALIZED (
    SELECT l.l_suppkey, l.l_partkey,
           SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS sq
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY l.l_suppkey, l.l_partkey
), part_tot AS (
    SELECT l_partkey, SUM(sq) AS tot FROM pair_vol GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
WHERE s.s_suppkey IN (
    SELECT v.l_suppkey
    FROM pair_vol v JOIN part_tot t ON v.l_partkey = t.l_partkey
    WHERE CAST(v.sq AS DOUBLE) > CAST(t.tot AS DOUBLE) * 0.15)
"""

Q21 = """
WITH ret AS MATERIALIZED (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l
    WHERE l.l_returnflag = 'R'
      AND l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
), multi AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1
), sole AS (
    SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
    FROM ret GROUP BY l_orderkey HAVING COUNT(*) = 1
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM sole
JOIN multi USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = sole.l_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


KMV_SKETCH = """
WITH hs AS MATERIALIZED (
    SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events
),
bottom AS (
    SELECT h FROM hs ORDER BY h LIMIT 64
),
kth AS (
    SELECT MAX(h) AS hk, COUNT(*) AS k_eff FROM bottom
),
ex AS (SELECT COUNT(*) AS exact_distinct FROM hs),
-- nibble expansion of the first 13 hex chars: digit * 2^(4j) terms are each
-- exact in double (powers of two) and 16^13 = 2^52 < 2^53, so the sum is
-- bit-identical to Spark's conv(hex,16,10) -> double
val AS (
    SELECT SUM((strpos('0123456789abcdef', substr(k.hk, i.i, 1)) - 1)
               * POWER(16, 13 - i.i)) AS v
    FROM kth k, (SELECT unnest(generate_series(1, 13)) AS i) i
)
SELECT CAST(64 AS INTEGER) AS k,
       CAST(k.k_eff AS BIGINT) AS k_eff,
       ROUND((k.k_eff - 1) / (v.v / POWER(16, 13)), 6) AS est_distinct,
       CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       ROUND(ABS(ROUND((k.k_eff - 1) / (v.v / POWER(16, 13)), 6)
                 - e.exact_distinct) / e.exact_distinct, 6) AS rel_err
FROM kth k, ex e, val v
"""


MERGE_UPSERT = """
WITH latest_base AS MATERIALIZED (
    SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-05-01 00:00:00'
    ) WHERE rn = 1
),
latest_upd AS MATERIALIZED (
    SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-05-01 00:00:00'
    ) WHERE rn = 1
)
SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
       COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
       COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
       CASE WHEN u.o_orderkey IS NULL THEN 'K'
            WHEN b.o_orderkey IS NULL THEN 'I'
            ELSE 'U' END AS action
FROM latest_base b
FULL OUTER JOIN latest_upd u ON u.c_custkey = b.c_custkey
"""


ATTRIBUTION = """
WITH p AS MATERIALIZED (
    SELECT event_id AS purchase_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
),
v AS MATERIALIZED (
    SELECT event_id AS view_id, user_id, ts AS v_ts
    FROM events WHERE event_type = 'view'
)
SELECT p.purchase_id, p.user_id,
       COUNT(*) AS n_views,
       FIRST(v.view_id ORDER BY v.v_ts, v.view_id) AS first_view_id
FROM p
JOIN v ON v.user_id = p.user_id
      AND v.v_ts < p.p_ts
      AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR
GROUP BY p.purchase_id, p.user_id
"""


SCD2_HISTORY = """
SELECT o_custkey AS c_custkey,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
       o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS valid_from_epoch,
       COALESCE(CAST(epoch(LEAD(o_orderdate) OVER w) AS BIGINT),
                253370764800) AS valid_to_epoch,
       (LEAD(o_orderdate) OVER w IS NULL) AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


DQ_AUDIT = """
SELECT 'orderkey_unique' AS check_name,
       (SELECT COUNT(*) FROM (
            SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
        )) AS n_violations
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem_orderkey_fk',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'totalprice_positive',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
UNION ALL
SELECT 'discount_domain',
       (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1)
UNION ALL
SELECT 'orders_have_lineitems',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
"""


DQ_AUDIT_WRAPPED = f"""
SELECT check_name, n_violations, (n_violations = 0) AS passed
FROM ({DQ_AUDIT.strip()})
"""
