"""Subquery-heavy TPC-H shapes (Q4, Q13, Q17, Q21, Q22) adapted to the
testdata schema — the correlated-subquery decorrelation family.

These are deliberately written as Spark SQL over temp views rather
than DataFrame chains: EXISTS / NOT EXISTS / correlated scalar
subqueries are where Catalyst's decorrelation (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery → semi/anti joins) earns its keep, and the
SQL form is what a reference user migrating analytics would write.
Plan shape is asserted in tests/test_plans.py (no cartesian products;
EXISTS becomes a semi join).

Determinism discipline: correlated averages are computed as
exact-decimal SUM divided by COUNT — summing doubles in engine-defined
order could flip boundary rows of a `x < k * avg(...)` predicate
between Spark and DuckDB; a DECIMAL(25,6) sum is order-independent
and converts to double exactly at these magnitudes.

Schema adaptations (testdata has no commitdate/receiptdate/comment):
Q4/Q21's "late delivery" predicate becomes `l_returnflag = 'R'`;
Q13's comment filter becomes an order-priority filter; Q22's country
code is c_nationkey and "no orders" becomes "no recent orders"
(every customer in the testdata has some order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# Q4 — order-priority checking (EXISTS → left-semi join) ----------------------


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a left-semi join on
    l_orderkey; the date filter pushes to the orders scan, so the semi
    join probes only one quarter of orders."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP_NTZ '1999-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1999-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


# Q13 — customer order-count distribution (outer join in join-cond) -----------


@query(
    "q_tpch_q13",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the filter lives in the LEFT JOIN condition
    (not a WHERE — that would drop customers with zero qualifying
    orders), then a second aggregation turns per-customer counts into
    a distribution. COUNT(o_orderkey) counts only matched rows."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        WITH c_orders AS (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM c_orders GROUP BY c_count
        """
    )


# Q17 — small-quantity-order revenue (correlated scalar subquery) -------------


@query(
    "q_tpch_q17",
    oracle="""
    SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem l1
    WHERE l1.l_quantity < 0.5 * (
      SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             / COUNT(*)
      FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: a correlated scalar subquery (per-part average
    quantity) that Catalyst decorrelates into an aggregate joined back
    on l_partkey — one shuffle each side, no per-row subquery
    execution. The average is exact-decimal-sum / count so the
    boundary predicate is engine-independent."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6)))
                     AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem l1
        WHERE l1.l_quantity < 0.5 * (
          SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*)
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        """
    )


# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS) ---------------


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
                    AND l1.l_returnflag = 'R'
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole at-fault supplier on multi-supplier
    'F' orders — an EXISTS and a NOT EXISTS correlated on a non-equal
    supplier of the same order, decorrelated to one semi and one anti
    join on l_orderkey. Top-10 with a name tiebreak (deterministic)."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
                        AND l1.l_returnflag = 'R'
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
                     AND o.o_orderstatus = 'F'
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
        """
    )


# Q22 — global sales opportunity (NOT EXISTS + uncorrelated scalar) -----------


@query(
    "q_tpch_q22",
    oracle="""
    SELECT c_nationkey AS cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6)))
                 AS DOUBLE), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-09-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: an uncorrelated scalar subquery (average
    positive balance — computed once, broadcast as a literal-like
    one-row join) plus a NOT EXISTS anti join against recent orders.
    Country code adapted to c_nationkey; 'no orders' adapted to 'no
    recent orders' (every testdata customer has at least one order)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               round(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6)))
                     AS DOUBLE), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                   / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP_NTZ '1999-09-01 00:00:00')
        GROUP BY c_nationkey
        """
    )
