"""Additional TPC-H-shaped analytics adapted to the testdata schema
(no shipmode/commitdate/mfgr columns — Q12/Q16 are adapted versions
exercising the same operator shapes). All decimal-exact, all
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.numerics import grid_sum
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))"


def _rev_col() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,6)"
    )


# Q6 — forecasting revenue change (pure filter + agg, no join) -----------------


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount
                            AS DECIMAL(25,6))) * 1000000 AS HUGEINT)
                AS DOUBLE) / 1000000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + single aggregate: every predicate reaches the
    parquet scan; zero shuffle (single-group agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            grid_sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(25,6)"
                ),
                6,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# Q10 — returned-item revenue by customer ---------------------------------------


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(CAST(SUM({_REV}) * 1000000 AS HUGEINT) AS DOUBLE)
             / 1000000.0 AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue: 4-way join with
    broadcast nation, deterministic top-k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(grid_sum(_rev_col(), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# Q12-adapted — shipping-delay classes per priority ------------------------------


@query(
    "q_ship_delay",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                         > 90 THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                         <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS ontime_items
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic + conditional aggregation over a join (the Q12
    shape; l_shipmode doesn't exist in this schema, delay classes play
    its role)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(delay > 90, 1).otherwise(0))
            .cast("bigint")
            .alias("late_items"),
            F.sum(F.when(delay <= 90, 1).otherwise(0))
            .cast("bigint")
            .alias("ontime_items"),
        )
    )


# Q14 — promotion revenue share ----------------------------------------------------


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT (100.0 * CAST(CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                                   THEN {_REV} ELSE CAST(0 AS DECIMAL(25,6))
                              END) * 1000000 AS HUGEINT) AS DOUBLE))
             / CAST(CAST(SUM({_REV}) * 1000000 AS HUGEINT) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-04-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of conditional to total revenue (broadcast part join;
    both sums decimal-exact, one double division)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type").like("PROMO%"), _rev_col()
    ).otherwise(F.lit(0).cast("decimal(25,6)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (
                    F.lit(100.0)
                    * (F.sum(promo) * 1000000)
                    .cast("decimal(38,0)")
                    .cast("double")
                )
                / (F.sum(_rev_col()) * 1000000)
                .cast("decimal(38,0)")
                .cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# Q16-adapted — supplier diversity per part class -----------------------------------


@query(
    "q_part_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 500)
    GROUP BY p.p_brand, p.p_type
    """,
)
def q_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count over a join with a NOT-EXISTS exclusion (the Q16
    shape: anti-join against a blacklist subquery)."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#13"
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_suppliers = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 500
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(F.broadcast(bad_suppliers), on="l_suppkey", how="left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# Q18 — large-volume orders -----------------------------------------------------------


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(20,2))) > 150
    )
    SELECT c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-filter (HAVING over sum) feeding a join — the aggregate
    runs FIRST, so only qualifying orderkeys join (semi-join pushup)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,2)"))
            .cast("double")
            .alias("sum_qty")
        )
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# Q19 — disjunctive predicate revenue ---------------------------------------------------


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(CAST(SUM({_REV}) * 1000000 AS HUGEINT) AS DOUBLE)
             / 1000000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-column predicates across a join (tests
    predicate handling the optimizer can't split into one pushdown)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        grid_sum(_rev_col(), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# Q7 — volume shipping between two nations -----------------------------------


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(SUM({_REV}) * 1000000 AS HUGEINT) AS DOUBLE)
             / 1000000.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_name IN ('NATION_0', 'NATION_1')
      AND cn.n_name IN ('NATION_0', 'NATION_1')
      AND sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border revenue between two nations by
    ship year. Supplier/customer/nation dims broadcast; the only big
    shuffle is orders⋈lineitem; the nation-pair predicate prunes both
    dimension branches before the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = F.col("n_name").isin("NATION_0", "NATION_1")
    sn = n.filter(pair).select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = n.filter(pair).select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        li.join(F.broadcast(s.join(F.broadcast(sn), on="s_nationkey")
                             .select("s_suppkey", "supp_nation")),
                on=[li.l_suppkey == F.col("s_suppkey")])
        .join(o.select("o_orderkey", "o_custkey"),
              on=[li.l_orderkey == F.col("o_orderkey")])
        .join(F.broadcast(c.join(F.broadcast(cn), on="c_nationkey")
                           .select("c_custkey", "cust_nation")),
              on=[F.col("o_custkey") == F.col("c_custkey")])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(grid_sum(_rev_col(), 6).alias("revenue"))
    )


# Q8 — national market share ---------------------------------------------------


@query(
    "q_tpch_q8",
    oracle=f"""
    WITH base AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS volume,
             sr.r_name AS supp_region
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region cr ON cr.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN region sr ON sr.r_regionkey = sn.n_regionkey
      WHERE cr.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_region = 'ASIA' THEN volume
                          ELSE CAST(0 AS DECIMAL(25,6)) END)
                     * 1000000 AS HUGEINT) AS DOUBLE)
             / CAST(CAST(SUM(volume) * 1000000 AS HUGEINT) AS DOUBLE)
             AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: ASIA suppliers' share of ECONOMY-part revenue
    sold to AMERICA customers, by order year — an 8-way star with
    every dimension broadcast and a conditional decimal aggregate
    (share = exact decimal sums divided once in double)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")

    cust_side = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
                    on=[n.n_regionkey == r.r_regionkey],
                ).select("n_nationkey")
            ),
            on=[c.c_nationkey == F.col("n_nationkey")],
        ).select("c_custkey")
    )
    supp_side = (
        s.join(
            F.broadcast(
                n.join(F.broadcast(r), on=[n.n_regionkey == r.r_regionkey])
                .select("n_nationkey", F.col("r_name").alias("supp_region"))
            ),
            on=[s.s_nationkey == F.col("n_nationkey")],
        ).select("s_suppkey", "supp_region")
    )
    econ_parts = p.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    vol = _rev_col()
    base = (
        li.join(F.broadcast(econ_parts), on=[li.l_partkey == F.col("p_partkey")])
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              on=[li.l_orderkey == F.col("o_orderkey")])
        .join(F.broadcast(cust_side), on=[F.col("o_custkey") == F.col("c_custkey")])
        .join(F.broadcast(supp_side), on=[li.l_suppkey == F.col("s_suppkey")])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_region",
        )
    )
    zero = F.lit(0).cast("decimal(25,6)")
    return base.groupBy("o_year").agg(
        (
            (
                F.sum(
                    F.when(
                        F.col("supp_region") == "ASIA", F.col("volume")
                    ).otherwise(zero)
                )
                * 1000000
            )
            .cast("decimal(38,0)")
            .cast("double")
            / (F.sum("volume") * 1000000)
            .cast("decimal(38,0)")
            .cast("double")
        ).alias("mkt_share")
    )


# Q15 — top supplier(s) by quarterly revenue -----------------------------------


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM({_REV}) * 1000000 AS HUGEINT) AS DOUBLE)
               / 1000000.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top-revenue supplier of a quarter — an
    aggregate (revenue view) filtered by a scalar subquery over ITSELF
    (max of the same aggregate). Catalyst evaluates the revenue CTE
    once per consumer; the decimal-exact revenue makes the equality
    predicate safe (float revenue would make `= MAX(...)` fragile)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate")
             >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate")
               < F.lit("1999-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            grid_sum(_rev_col(), 6).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, on=[s.s_suppkey == revenue.supplier_no])
        .join(
            F.broadcast(max_rev),
            on=[F.col("total_revenue") == F.col("m")],
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


# Q2 — min-cost supplier (correlated min over a derived catalog) ---------------
# The testdata has no partsupp table, so the part-supplier catalog is
# derived from lineitem: a supplier "offers" a part at the minimum
# extended price ever shipped for that (part, supplier) pair. MIN of a
# double picks an existing value (no float summation), so the offer is
# engine-exact without DECIMAL laundering.


@query(
    "q_tpch_q2",
    oracle="""
    WITH euro_supp AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    offers AS (
      SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice) AS offer
      FROM lineitem l
      JOIN euro_supp es ON es.s_suppkey = l.l_suppkey
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT es.s_acctbal, es.s_name, es.n_name,
           p.p_partkey, p.p_brand, o.offer, es.s_suppkey
    FROM part p
    JOIN offers o ON o.l_partkey = p.p_partkey
    JOIN euro_supp es ON es.s_suppkey = o.l_suppkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
      AND o.offer = (SELECT MIN(o2.offer) FROM offers o2
                     WHERE o2.l_partkey = p.p_partkey)
    ORDER BY es.s_acctbal DESC, es.n_name, es.s_name, p.p_partkey,
             es.s_suppkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for each LARGE mid-size
    part, the European supplier(s) offering it at the minimum observed
    price. The correlated `= (SELECT MIN ...)` becomes a window MIN
    over the offers frame partitioned by part — ONE shuffle on
    l_partkey, reused by the window and the final part join; the
    supplier dimension (region-filtered) is broadcast into both the
    offer derivation and the output join. Reference analogue: lookup
    queries at datalake/query.go answer "best row per key" the same
    way — here at warehouse scale."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")

    euro_supp = (
        s.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                    on=[n.n_regionkey == r.r_regionkey],
                ).select("n_nationkey", "n_name")
            ),
            on=[s.s_nationkey == F.col("n_nationkey")],
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(
            F.broadcast(euro_supp.select("s_suppkey")),
            on=[li.l_suppkey == F.col("s_suppkey")],
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("offer"))
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("min_offer", F.min("offer").over(w)).filter(
        F.col("offer") == F.col("min_offer")
    )
    wanted = p.filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_brand")
    return (
        best.join(F.broadcast(wanted), on=[best.l_partkey == wanted.p_partkey])
        .join(F.broadcast(euro_supp), on=[best.l_suppkey == euro_supp.s_suppkey])
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "offer", "s_suppkey",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey",
            "s_suppkey",
        )
        .limit(100)
    )


# Q9 — product-type profit by nation and year ----------------------------------
# No ps_supplycost in the testdata: cost is modeled as
# 0.6 * p_retailprice * l_quantity (same join/agg shape, deterministic
# arithmetic; the double product is IEEE-identical in both engines and
# the DECIMAL cast happens on the same value).


@query(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
             - CAST(0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(25,6))
           ) * 1000000 AS HUGEINT) AS DOUBLE) / 1000000.0 AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and order year): the
    part filter broadcast-prunes lineitem FIRST (the only fact-sized
    join is lineitem->orders on orderkey), supplier->nation collapses
    to one broadcast map, and profit terms are decimal-cast per row so
    the cross-row sum is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")

    gear = p.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = s.join(
        F.broadcast(n), on=[s.s_nationkey == n.n_nationkey]
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = (
        _rev_col()
        - (F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")).cast(
            "decimal(25,6)"
        )
    )
    return (
        li.join(F.broadcast(gear), on=[li.l_partkey == gear.p_partkey])
        .join(F.broadcast(supp_nation), on=[li.l_suppkey == F.col("s_suppkey")])
        .join(
            o.select("o_orderkey", "o_orderdate"),
            on=[li.l_orderkey == F.col("o_orderkey")],
        )
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(grid_sum(profit, 6).alias("sum_profit"))
    )


# Q11 — important stock (group value vs a global-threshold scalar) -------------
# partsupp value is modeled from lineitem: a nation's stock value per
# part is SUM(p_retailprice * l_quantity) over lineitems shipped by
# that nation's suppliers.


@query(
    "q_tpch_q11",
    oracle="""
    WITH nation_lines AS (
      SELECT l.l_partkey,
             CAST(p.p_retailprice * l.l_quantity AS DECIMAL(25,6)) AS v
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    ),
    per_part AS (
      SELECT l_partkey AS p_partkey, SUM(v) AS value_dec
      FROM nation_lines GROUP BY 1
    )
    SELECT p_partkey,
           CAST(CAST(value_dec * 1000000 AS HUGEINT) AS DOUBLE)
             / 1000000.0 AS stock_value
    FROM per_part
    WHERE CAST(value_dec AS DOUBLE) >
          (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM nation_lines)
    ORDER BY stock_value DESC, p_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value within one
    nation, kept only when it exceeds a fraction of the nation's TOTAL
    value — an aggregate filtered against a scalar subquery over the
    same frame. The nation's line set is computed once; Catalyst
    evaluates the per-part agg and the grand total as two consumers of
    one shuffle. Both threshold sides derive from exact DECIMAL sums,
    so the double comparison is engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    nation_supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_7")),
            on=[s.s_nationkey == n.n_nationkey],
        ).select("s_suppkey")
    )
    lines = (
        li.join(F.broadcast(nation_supp), on=[li.l_suppkey == F.col("s_suppkey")])
        .join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            on=[li.l_partkey == F.col("p_partkey")],
        )
        .select(
            "p_partkey",
            (F.col("p_retailprice") * F.col("l_quantity"))
            .cast("decimal(25,6)")
            .alias("v"),
        )
    )
    per_part = lines.groupBy("p_partkey").agg(F.sum("v").alias("value_dec"))
    threshold = lines.agg(
        (F.sum("v").cast("double") * F.lit(0.001)).alias("thr")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("value_dec").cast("double") > F.col("thr"))
        .select(
            "p_partkey",
            (
                (F.col("value_dec") * 1000000)
                .cast("decimal(38,0)")
                .cast("double")
                / F.lit(1000000.0)
            ).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "p_partkey")
    )


# Q20 — suppliers with excess shipments (nested semi-join chain) ---------------
# No partsupp availqty: the inner predicate becomes "1999 shipped
# quantity of small-named parts above the all-supplier average", which
# keeps Q20's scalar-subquery-inside-semi-join chain and stays
# scale-invariant (an absolute threshold would saturate at higher SF).


@query(
    "q_tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM shipped
      WHERE CAST(qty AS DOUBLE) >
            (SELECT CAST(SUM(qty) AS DOUBLE) / COUNT(*) FROM shipped)
    )
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-shipment suppliers): a LEFT-SEMI join
    of the supplier dimension against an aggregate that is itself
    filtered by a scalar subquery over the same aggregate. The part
    filter broadcasts into the lineitem scan, the shipped frame is
    ~|suppliers| rows, and the average threshold is a 1-row broadcast
    — supplier never shuffles. Quantities sum in DECIMAL so the
    average is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")

    small = p.filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate")
             >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate")
               < F.lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .join(F.broadcast(small), on=[li.l_partkey == F.col("p_partkey")])
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty"))
    )
    avg_qty = shipped.agg(
        (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    excess = (
        shipped.join(F.broadcast(avg_qty))
        .filter(F.col("qty").cast("double") > F.col("avg_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(excess),
            on=[s.s_suppkey == F.col("l_suppkey")],
            how="left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
