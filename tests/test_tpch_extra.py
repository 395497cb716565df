"""Unregistered TPC-H analog shapes, oracle-verified (SURVEY §9: the
driver's gate window is fully allocated, so these extra join shapes are
library functions checked here with the same DuckDB hash compare)."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_matches_oracle
from tutorial_apache_beam_spark.queries.relational import (
    q2_min_cost_supplier,
    q5_regional_volume,
    q10_returned_items,
    q14_promo_revenue_share,
)

Q2_ORACLE = """
WITH ps AS (
  SELECT DISTINCT l.l_partkey, l.l_suppkey, s.s_name, s.s_acctbal
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
)
SELECT l_partkey AS p_partkey,
       l_suppkey AS s_suppkey,
       s_name,
       round(s_acctbal, 2) AS s_acctbal
FROM ps p
WHERE s_acctbal = (SELECT min(s_acctbal) FROM ps q
                   WHERE q.l_partkey = p.l_partkey)
"""

Q5_ORACLE = """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1996
GROUP BY 1
"""

Q10_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS r
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1
)
SELECT c.c_custkey,
       c.c_name,
       round(rev.r, 2)        AS revenue,
       round(c.c_acctbal, 2)  AS c_acctbal,
       n.n_name               AS nation
FROM rev
JOIN customer c ON rev.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
ORDER BY round(rev.r, 2) DESC, c.c_custkey
LIMIT 20
"""

Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p.p_brand LIKE 'Brand#1%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


def test_q2_min_cost_supplier(spark, duck):
    assert_matches_oracle(q2_min_cost_supplier(spark, SF_DIR), duck, Q2_ORACLE)


def test_q5_regional_volume(spark, duck):
    assert_matches_oracle(q5_regional_volume(spark, SF_DIR), duck, Q5_ORACLE)


def test_q10_returned_items(spark, duck):
    assert_matches_oracle(q10_returned_items(spark, SF_DIR), duck, Q10_ORACLE)


def test_q14_promo_revenue_share(spark, duck):
    assert_matches_oracle(q14_promo_revenue_share(spark, SF_DIR), duck, Q14_ORACLE)


Q7_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l.l_shipdate) AS ship_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('CHINA', 'JAPAN')
  AND sn.n_name IN ('CHINA', 'JAPAN')
  AND cn.n_name <> sn.n_name
GROUP BY 1, 2, 3
"""

Q19_ORACLE = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def test_q7_bilateral_volume(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import q7_bilateral_volume

    assert_matches_oracle(q7_bilateral_volume(spark, SF_DIR), duck, Q7_ORACLE)


def test_q19_disjunctive_revenue(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import (
        q19_disjunctive_revenue,
    )

    assert_matches_oracle(q19_disjunctive_revenue(spark, SF_DIR), duck, Q19_ORACLE)


Q8_ORACLE = """
SELECT year(o.o_orderdate) AS order_year,
       round(sum(CASE WHEN sn.n_name = 'CHINA'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS china_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
"""

Q16_ORACLE = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p.p_brand, p.p_size, count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
GROUP BY 1, 2
"""


def test_q8_market_share(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import q8_market_share

    assert_matches_oracle(q8_market_share(spark, SF_DIR), duck, Q8_ORACLE)


def test_q16_supplier_part_stats(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import (
        q16_supplier_part_stats,
    )

    assert_matches_oracle(q16_supplier_part_stats(spark, SF_DIR), duck, Q16_ORACLE)


Q9_ORACLE = """
SELECT sn.n_name AS supp_nation,
       year(o.o_orderdate) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE contains(p.p_name, 'red')
GROUP BY 1, 2
"""

Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
  FROM lineitem GROUP BY 1)
SELECT l_partkey, value FROM per_part
WHERE value > (SELECT round(0.001 * sum(value), 6) FROM per_part)
"""

Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY 1
"""

Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""

Q17_ORACLE = """
WITH brand AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#23'),
thresholds AS (
  SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS qty_threshold
  FROM brand GROUP BY 1)
SELECT round(sum(b.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM brand b JOIN thresholds t ON b.l_partkey = t.l_partkey
WHERE b.l_quantity < t.qty_threshold
"""

Q21_ORACLE = """
WITH per_os AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL '60 days'
                  THEN 1 ELSE 0 END) AS any_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(any_late) AS n_late
  FROM per_os GROUP BY 1)
SELECT s.l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM per_os s JOIN per_o o ON s.l_orderkey = o.l_orderkey
WHERE s.any_late = 1 AND o.n_supp > 1 AND o.n_late = 1
GROUP BY 1
"""

Q22_ORACLE = """
WITH coded AS (
  SELECT c_custkey, c_acctbal, CAST(c_custkey % 7 AS INT) AS cntrycode
  FROM customer WHERE CAST(c_custkey % 7 AS INT) IN (1, 2, 3)),
avg_bal AS (
  SELECT round(avg(c_acctbal), 6) AS a FROM coded WHERE c_acctbal > 0)
SELECT cntrycode,
       CAST(count(*) AS BIGINT)     AS numcust,
       round(sum(c_acctbal), 2)     AS totacctbal
FROM coded c
WHERE c.c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


def test_q9_product_profit(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import q9_product_profit

    assert_matches_oracle(q9_product_profit(spark, SF_DIR), duck, Q9_ORACLE)


def test_q11_important_parts(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import q11_important_parts

    assert_matches_oracle(q11_important_parts(spark, SF_DIR), duck, Q11_ORACLE)


def test_q13_customer_distribution(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import (
        q13_customer_distribution,
    )

    assert_matches_oracle(
        q13_customer_distribution(spark, SF_DIR), duck, Q13_ORACLE
    )


def test_q15_top_supplier(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import q15_top_supplier

    assert_matches_oracle(q15_top_supplier(spark, SF_DIR), duck, Q15_ORACLE)


def test_q17_small_quantity_revenue(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import (
        q17_small_quantity_revenue,
    )

    assert_matches_oracle(
        q17_small_quantity_revenue(spark, SF_DIR), duck, Q17_ORACLE
    )


def test_q21_waiting_supplier(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import q21_waiting_supplier

    assert_matches_oracle(q21_waiting_supplier(spark, SF_DIR), duck, Q21_ORACLE)


def test_q22_global_sales_opportunity(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import (
        q22_global_sales_opportunity,
    )

    assert_matches_oracle(
        q22_global_sales_opportunity(spark, SF_DIR), duck, Q22_ORACLE
    )


Q20_ORACLE = """
WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
ps AS (
  SELECT l_partkey, l_suppkey,
         sum(l_quantity) AS total_qty,
         sum(CASE WHEN year(l_shipdate) = 1996
                  THEN l_quantity ELSE 0 END) AS qty_1996
  FROM lineitem JOIN red ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM ps WHERE total_qty > 2 * qty_1996)
"""


def test_q20_potential_promotion(spark, duck):
    from tutorial_apache_beam_spark.queries.relational import (
        q20_potential_promotion,
    )

    assert_matches_oracle(
        q20_potential_promotion(spark, SF_DIR), duck, Q20_ORACLE
    )
