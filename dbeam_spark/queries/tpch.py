"""TPC-H-style analytics suite over the star-schema testdata.

Adapted to the columns the testdata actually has (no partsupp /
commitdate / shipmode). Each query is written DataFrame-first so
Catalyst pushes filters and prunes columns at the parquet scan, and
every dimension join is an explicit broadcast — at 100 TB the fact
tables (lineitem/orders) shuffle at most once on their join key while
region/nation/supplier/part ship to executors as broadcast hash maps.

Aggregates are rounded in BOTH engines so IEEE summation-order noise
cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbeam_spark.operators.util import bounded_grain_window
from dbeam_spark.queries.registry import register
from dbeam_spark.session import ensure_utc
from dbeam_spark.sources.files import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, sf_dir, name)


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: scan → filter → hash-agg (map-side
    partials) → tiny sort. The only shuffle is the final 6-group agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).alias("sum_disc_price"),
            F.round(F.sum(_revenue() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue. customer is NOT a bounded dim (it
    scales with the fact data), so it joins key-partitioned and AQE
    broadcasts it only when the runtime size allows — at 100 TB it
    degrades to a shuffle join instead of OOMing the driver.
    orders⋈lineitem is the one guaranteed shuffle, on the order key."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join. supplier/nation/region are broadcast; the
    orders⋈lineitem fact-fact join is the single shuffle."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + global agg: all predicates push to the scan
    (PushedFilters), result is a single partial-aggregated row."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade volume by year. Both nation joins broadcast;
    the disjunctive pair filter runs post-join on broadcast columns."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit (adapted: no partsupp in the testdata, so
    profit = discounted revenue). part/supplier/nation broadcast."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            _revenue().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: conditional aggregation over a
    broadcast part join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_revenue()), 4).alias("promo_revenue")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: agg-subquery semi join (left_semi in Spark,
    which at scale is a shuffle-free broadcast of the small key set)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_discount_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive predicate join (the classic OR-of-ANDs that needs a
    join-then-filter plan; part stays broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "window_top_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: single hash-partitioned window; the
    deterministic (price, key) sort makes ranking reproducible."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
        # no terminal sort (order-insensitive hash gate, guide §2.4)
    )


@register(
    "rollup_sales",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level ROLLUP aggregation (region → nation → grand total);
    Spark computes all grouping sets in one shuffle via Expand."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@register(
    "distinct_count",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase partial-distinct plan).
    The approximate HLL path is `approx_distinct` (rows-only gate)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS sketch_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for
    high-cardinality distincts — no exact distinct shuffle. The HLL
    estimate itself is engine-specific, so the gate contract is the
    invariant form: the exact count (SQL-checkable) plus a flag that
    the sketch landed within 5% of it — rsd is 0.01, so 5% is a 5σ
    bound that holds for any regenerated testdata; the estimate's
    exact value stays out of the hash."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
        )
        .select(
            "o_orderpriority",
            "exact_customers",
            (
                F.abs(F.col("approx") - F.col("exact_customers")) * 100
                <= F.col("exact_customers") * 5
            ).alias("sketch_within_5pct"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (EXISTS adapted to shipdate >
    orderdate since the testdata has no commitdate): left_semi join —
    at scale a single shuffle on the order key, no row duplication."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q22_inactive_customers",
    oracle="""
    SELECT SUBSTRING(c_name, 1, 9) AS name_prefix,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY SUBSTRING(c_name, 1, 9)
    ORDER BY name_prefix
    """,
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity shape: scalar subquery (broadcast 1-row
    cross) + NOT EXISTS as a left_anti join."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("name_prefix")
    )


@register(
    "cube_sales",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderpriority)
    ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over two dimensions: all four grouping sets in one
    Expand + one shuffle."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.asc_nulls_first("c_mktsegment"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


@register(
    "percentile_prices",
    oracle="""
    SELECT c_mktsegment,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the
    same linear interpolation); the approximate sketch path at scale
    is approx_percentile (rows-only sibling below)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "approx_percentile_prices",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           TRUE AS p50_within_rank_tol,
           TRUE AS p95_within_rank_tol
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the 100 TB path (mergeable state,
    no full sort/collect per group). The sketch's picked element is
    engine-specific, so the gate contract is the invariant form: the
    approx p50/p95 must land between the EXACT percentiles at
    rank ± 0.02 (accuracy=1000 guarantees rank error ≤ 0.001, so the
    20× margin holds on any regenerated data); the oracle states the
    group counts and the always-true flags."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr(
                "approx_percentile(o_totalprice, array(0.5, 0.95), 1000)"
            ).alias("ap"),
            F.expr(
                "percentile(o_totalprice, array(0.48, 0.52, 0.93, 0.97))"
            ).alias("ex"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            (
                (F.element_at("ap", 1) >= F.element_at("ex", 1))
                & (F.element_at("ap", 1) <= F.element_at("ex", 2))
            ).alias("p50_within_rank_tol"),
            (
                (F.element_at("ap", 2) >= F.element_at("ex", 3))
                & (F.element_at("ap", 2) <= F.element_at("ex", 4))
            ).alias("p95_within_rank_tol"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "salted_join_volume",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def salted_join_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation demo: the same customer⋈nation aggregation
    routed through operators.joins.salted_join — identical results to
    the plain join, with hot nation keys scattered across 8 salt
    buckets (the pattern for hot-key fact⋈dim joins when a broadcast
    isn't possible)."""
    from dbeam_spark.operators.joins import salted_join

    cust = _t(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    nation = _t(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nationkey"
    )
    return (
        salted_join(cust, nation, on="nationkey", salt_buckets=8)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: conditional share-of-total per year over
    an 8-way star join (all dims broadcast, facts shuffle once)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = _revenue()
    share_num = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(share_num) / F.sum(vol), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier: reusable revenue 'view' + scalar-max subquery
    (broadcast 1-row join, not a window over all rows)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_revenue"))
        .cache()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue: the correlated AVG subquery
    becomes a pre-aggregated per-part average joined back — one extra
    agg instead of a per-row subquery execution."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT p_partkey, s_acctbal, s_name, n_name,
             l_extendedprice / l_quantity AS cost,
             MIN(l_extendedprice / l_quantity)
               OVER (PARTITION BY p_partkey) AS min_cost
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
           CAST(ROUND(cost * 10000) AS BIGINT) AS unit_cost_x10k
    FROM costs WHERE cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 adapted: no partsupp table in
    the testdata, so lineitem IS the part-supplier price list and
    unit cost is l_extendedprice/l_quantity; reference semantics
    `args/QueryBuilder.java` has no analytics — this suite is the
    beyond-parity engine).

    The correlated MIN subquery of textbook Q2 becomes one window MIN
    over p_partkey — at 100 TB that is a single shuffle on partkey
    instead of a per-row subquery; all four dims broadcast.

    unit_cost is reported ×10⁴ as an integer: ROUND(x, 4) on a
    division result can land on decimal ties that the two engines'
    rounding sees on opposite sides (shortest-repr HALF_UP vs float
    multiply-round); ROUND to an integer only ties on exactly-
    representable .5 doubles, which both engines round identically."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    from pyspark.sql import Window

    cost = F.col("l_extendedprice") / F.col("l_quantity")
    w = Window.partitionBy("p_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("p_partkey", "s_acctbal", "s_name", "n_name", cost.alias("cost"))
        .withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.round(F.col("cost") * 10000)
            .cast("long")
            .alias("unit_cost_x10k"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


@register(
    "q11_important_values",
    oracle="""
    WITH v AS (
      SELECT l_partkey, SUM(l_extendedprice) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(val, 2) AS part_value
    FROM v
    WHERE val > (SELECT SUM(val) * 0.002 FROM v)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important part values (TPC-H Q11 adapted to lineitem as the
    part-supplier relation). The scalar total-value subquery becomes a
    1-row aggregate cross-joined (broadcast) onto the per-part
    aggregate — the fact table is scanned once, re-aggregated from the
    grouped intermediate, never rescanned."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("val"))
    )
    total = v.agg((F.sum("val") * 0.002).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", F.round("val", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q12_shipping_delay",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 0 THEN 'early'
                WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'on_time'
                ELSE 'late' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE year(l_shipdate) = 1997
    GROUP BY 1
    ORDER BY 1
    """,
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay priority report (TPC-H Q12 adapted: the testdata
    has no l_shipmode/commitdate, so lines bucket by actual shipping
    delay vs order date). One fact-fact join shuffled on orderkey, then
    a 3-group aggregate with map-side partials."""
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(delay < 0, "early")
            .when(delay <= 30, "on_time")
            .otherwise("late")
            .alias("delay_bucket"),
            F.when(high, 1).otherwise(0).alias("h"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("h").alias("high_line_count"),
            F.sum(1 - F.col("h")).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13; the comment-regex
    exclusion becomes a priority exclusion — the testdata has no
    comment column). Outer join keeps zero-order customers; the second
    aggregate is tiny. At 100 TB the join shuffles once on custkey and
    the distribution agg is a few hundred groups."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'SMALL'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier counts by part attributes (TPC-H Q16 adapted: lineitem
    as the part-supplier relation; the complaints NOT IN becomes a
    negative-balance supplier exclusion). NOT IN → broadcast left_anti
    join; COUNT(DISTINCT) shuffles on the group keys after a map-side
    distinct partial."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "SMALL")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS q
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    tot AS (SELECT l_partkey, SUM(q) AS tq FROM sp GROUP BY l_partkey)
    SELECT DISTINCT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM sp
    JOIN tot USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE q > 0.5 * tq
    ORDER BY s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers dominating a PROMO part's 1997 volume (TPC-H Q20
    adapted: availqty-vs-half-shipped becomes supplier-share-of-part >
    50%). The nested IN-subquery chain of textbook Q20 flattens into
    grouped aggregates re-joined on partkey; l_quantity is integral so
    the share comparison is exact in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    sp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    tot = sp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(F.sum("q").alias("tq"))
    return (
        sp.join(tot, sp.l_partkey == F.col("t_partkey"))
        .filter(F.col("q") > 0.5 * F.col("tq"))
        .join(F.broadcast(supp), sp.l_suppkey == supp.s_suppkey)
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .distinct()
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_fail
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
    FROM lineitem l
    JOIN orders ON o_orderkey = l.l_orderkey AND o_orderstatus = 'F'
    JOIN per_order po ON po.l_orderkey = l.l_orderkey
    JOIN supplier ON s_suppkey = l.l_suppkey
    WHERE l.l_returnflag = 'R' AND po.n_supp > 1 AND po.n_fail = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who solely failed multi-supplier orders (TPC-H Q21
    adapted: receiptdate>commitdate becomes l_returnflag='R'). The
    EXISTS / NOT-EXISTS pair of textbook Q21 collapses into ONE
    per-(order, supplier) rollup: after the `n_fail = 1` filter each
    qualifying order has exactly one failing supplier, and that
    supplier is recovered from the same rollup (max of the failing
    suppkey) — so lineitem is scanned ONCE, nothing rejoins the raw
    fact table, and the final count needs no distinct at all (one row
    per qualifying order by construction). Shuffle ladder: ONE forced
    orderkey repartition satisfies BOTH rollup levels (orderkey is a
    subset of the (orderkey, suppkey) grouping, so Catalyst inserts
    no further exchange) and the orders join's left side. The
    two-exchange groupBy ladder it replaces bought map-side combine
    worth almost nothing here (~1-4 lineitems per (order, supplier)),
    so one full-row exchange strictly wins — measured 1.07s → 0.81s
    at sf0.1, same rows."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    per_os = (
        li.select("l_orderkey", "l_suppkey", "l_returnflag")
        .repartition(F.col("l_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("po_key"),
            F.col("l_suppkey").alias("po_supp"),
        )
        .agg(F.max(F.col("l_returnflag") == "R").alias("fail"))
    )
    per_order = per_os.groupBy("po_key").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("fail").cast("int")).alias("n_fail"),
        F.max(F.when(F.col("fail"), F.col("po_supp"))).alias("fail_supp"),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_fail") == 1)
    )
    return (
        qualifying.join(orders, F.col("po_key") == orders.o_orderkey)
        .groupBy("fail_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("fail_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "pivot_returns",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           ROUND(SUM(CASE WHEN l_returnflag = 'A'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_a,
           ROUND(SUM(CASE WHEN l_returnflag = 'N'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_n,
           ROUND(SUM(CASE WHEN l_returnflag = 'R'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_r
    FROM lineitem
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def pivot_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by year pivoted on return flag. The pivot values are
    declared explicitly so Spark skips the extra distinct-values job
    and the plan is a single hash aggregate with map-side partials —
    a pivot over K known values costs the same as a K-way conditional
    agg at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("ship_year", F.year("l_shipdate").cast("long"))
        .groupBy("ship_year")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum(_revenue()), 2))
        .select(
            "ship_year",
            F.coalesce(F.col("A"), F.lit(0.0)).alias("rev_a"),
            F.coalesce(F.col("N"), F.lit(0.0)).alias("rev_n"),
            F.coalesce(F.col("R"), F.lit(0.0)).alias("rev_r"),
        )
        .orderBy("ship_year")
    )


@register(
    "histogram_prices",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin,
           CAST(FLOOR(o_totalprice / 25000) AS BIGINT) * 25000.0 AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY bin
    ORDER BY bin
    """,
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (the data-profiling
    primitive): binning is pure column math riding the scan, the agg
    shuffles |bins| groups no matter the row count."""
    orders = _t(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / 25000).cast("long")
    return (
        orders.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            "bin",
            (F.col("bin") * 25000.0).alias("bin_lo"),
            "n_orders",
            "total_price",
        )
        .orderBy("bin")
    )


@register(
    "p95_outlier_orders",
    oracle="""
    WITH thresh AS (
      SELECT c_mktsegment AS seg,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY seg)
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_outliers,
           ROUND(MIN(o_totalprice), 2) AS min_outlier,
           ROUND(MAX(o_totalprice), 2) AS max_outlier
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN thresh ON seg = c_mktsegment
    WHERE o_totalprice > p95
    GROUP BY seg
    ORDER BY seg
    """,
)
def p95_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment p95 outlier report (the anomaly-detection shape:
    compute a per-group threshold, join it back, filter). Spark's
    `percentile` interpolates exactly like DuckDB's quantile_cont, so
    the cut is engine-exact. The threshold table is |segments| rows —
    broadcast back onto the fact join; the facts shuffle once on
    custkey, reused by both passes under AQE."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    oc = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), "o_totalprice"
    )
    thresh = oc.groupBy("seg").agg(
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95")
    )
    return (
        oc.join(F.broadcast(thresh), "seg")
        .filter(F.col("o_totalprice") > F.col("p95"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.min("o_totalprice"), 2).alias("min_outlier"),
            F.round(F.max("o_totalprice"), 2).alias("max_outlier"),
        )
        .orderBy("seg")
    )


@register(
    "set_ops_customers",
    oracle="""
    SELECT c_custkey FROM (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE year(o_orderdate) = 1996
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders
      WHERE year(o_orderdate) = 1997
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE year(o_orderdate) = 1998
    )
    ORDER BY c_custkey
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1996 AND 1997 but NOT 1998 — INTERSECT /
    EXCEPT set algebra. Catalyst plans both as aggregates/anti-joins
    on the key; each leg is the same scan with a different pushed
    year filter, so AQE reuses the exchange. (Chained set ops are
    left-associative in both engines: (A ∩ B) \\ C.)"""
    orders = _t(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    return (
        active(1996)
        .intersect(active(1997))
        .exceptAll(active(1998))
        .orderBy("c_custkey")
    )


@register(
    "unpivot_yearly_metrics",
    oracle="""
    WITH y AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_price,
             ROUND(SUM(l_tax * l_extendedprice), 2) AS sum_tax
      FROM lineitem GROUP BY ship_year)
    SELECT ship_year, metric, val FROM (
      SELECT ship_year, 'sum_qty' AS metric, sum_qty AS val FROM y
      UNION ALL
      SELECT ship_year, 'sum_price', sum_price FROM y
      UNION ALL
      SELECT ship_year, 'sum_tax', sum_tax FROM y)
    ORDER BY ship_year, metric
    """,
)
def unpivot_yearly_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape with the native `unpivot` (melt) operator:
    the yearly aggregate is tiny, the unpivot is a zero-shuffle
    generator over it — the standard shape for feeding wide metric
    tables into long-format consumers."""
    li = _t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.sum(F.col("l_tax") * F.col("l_extendedprice")), 2).alias(
                "sum_tax"
            ),
        )
    )
    return wide.unpivot(
        ["ship_year"], ["sum_qty", "sum_price", "sum_tax"], "metric", "val"
    ).orderBy("ship_year", "metric")


@register(
    "profile_lineitem",
    oracle="""
    SELECT col_name,
           CAST(n AS BIGINT) AS n,
           CAST(n_null AS BIGINT) AS n_null,
           ROUND(mn, 2) AS min_val,
           ROUND(mx, 2) AS max_val,
           ROUND(avg_val, 4) AS avg_val,
           ROUND(stddev_val, 4) AS stddev_val
    FROM (
      SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS n,
             COUNT(*) - COUNT(l_quantity) AS n_null,
             MIN(l_quantity) AS mn, MAX(l_quantity) AS mx,
             AVG(l_quantity) AS avg_val, STDDEV_SAMP(l_quantity) AS stddev_val
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', COUNT(l_extendedprice),
             COUNT(*) - COUNT(l_extendedprice),
             MIN(l_extendedprice), MAX(l_extendedprice),
             AVG(l_extendedprice), STDDEV_SAMP(l_extendedprice)
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', COUNT(l_discount),
             COUNT(*) - COUNT(l_discount),
             MIN(l_discount), MAX(l_discount),
             AVG(l_discount), STDDEV_SAMP(l_discount)
      FROM lineitem)
    ORDER BY col_name
    """,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling report (count/nulls/min/max/mean/stddev per
    numeric column) — the data-quality primitive run before training
    ingestion. One scan computes ALL columns' stats in a single
    aggregate (Spark evaluates the agg expressions together), then the
    wide row unpivots to long form driver-free."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    wide = li.agg(
        *[
            f
            for c in cols
            for f in (
                F.count(c).alias(f"{c}__n"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
                F.round(F.min(c), 2).alias(f"{c}__min_val"),
                F.round(F.max(c), 2).alias(f"{c}__max_val"),
                F.round(F.avg(c), 4).alias(f"{c}__avg_val"),
                F.round(F.stddev_samp(c), 4).alias(f"{c}__stddev_val"),
            )
        ]
    )
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__min_val").alias("min_val"),
            F.col(f"{c}__max_val").alias("max_val"),
            F.col(f"{c}__avg_val").alias("avg_val"),
            F.col(f"{c}__stddev_val").alias("stddev_val"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*per_col)).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )


@register(
    "fuzzy_supplier_names",
    oracle="""
    SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
    FROM supplier a JOIN supplier b
      ON substr(a.s_name, 1, 16) = substr(b.s_name, 1, 16)
     AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def fuzzy_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical supplier names via blocked fuzzy self-join
    (operators/joins.py::blocked_fuzzy_join): prefix-16 blocking keys
    the shuffle, levenshtein runs only inside blocks — the
    record-linkage pattern that replaces the unshardable O(n²)
    all-pairs edit-distance scan."""
    supp = _t(spark, sf_dir, "supplier")
    from dbeam_spark.operators.joins import blocked_fuzzy_join

    return (
        blocked_fuzzy_join(supp, "s_name", "s_suppkey", 16, 1)
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    )


@register(
    "customer_quartiles",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
             AS quartile,
           ROUND(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 6)
             AS cume
    FROM customer
    ORDER BY c_custkey
    """,
)
def customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles + cume_dist over a UNIQUE total order (ties
    broken by key) so bucket edges are engine-exact — computed WITHOUT
    a global unpartitioned window. global_ranked range-partitions the
    sort and folds per-partition offsets back, then ntile/cume_dist
    are pure arithmetic on the exact rank: per-partition bounded
    sorts, no single-task WindowExec, survives fact-scale input."""
    from dbeam_spark.operators.ranking import global_ranked, ntile_from_rank

    cust = _t(spark, sf_dir, "customer")
    ranked, n = global_ranked(
        cust.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
    )
    return ranked.select(
        "c_custkey",
        ntile_from_rank(F.col("_rank"), n, 4).alias("quartile"),
        F.round(F.col("_rank") / F.lit(n), 6).alias("cume"),
    )  # no terminal sort (order-insensitive hash gate, guide §2.4)


@register(
    "rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS c_custkey,
             CAST(date_diff('day', MAX(o_orderdate),
                            TIMESTAMP '2001-09-01') AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(o_totalprice) AS monetary_raw
      FROM orders GROUP BY o_custkey)
    SELECT c_custkey, recency_days, frequency,
           ROUND(monetary_raw, 2) AS monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days, c_custkey) AS BIGINT)
             AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS BIGINT)
             AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary_raw DESC, c_custkey) AS BIGINT)
             AS m_score
    FROM rfm
    ORDER BY c_custkey
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartile scores — the marketing-analytics staple). One aggregate
    on custkey, then three global ntile windows over the |customers|-
    sized result with key tie-breaks so quartile edges are
    deterministic. Scale note: the windows sort customers, not orders;
    for billions of customers swap ntile for approx-quantile cut
    points broadcast back."""
    from dbeam_spark.operators.ranking import global_ranked, ntile_from_rank

    orders = _t(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.datediff(
            F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
        )
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary_raw"),
    )
    # pin the rollup so the three rank passes don't rescan orders
    from pyspark import StorageLevel

    rfm = rfm.persist(StorageLevel.MEMORY_AND_DISK)
    # three scale-safe global ranks (range-partitioned, no single-task
    # window); each yields an ntile score joined back on the key
    specs = [
        ("r_score", [F.col("recency_days").asc(), F.col("c_custkey").asc()]),
        ("f_score", [F.col("frequency").desc(), F.col("c_custkey").asc()]),
        ("m_score", [F.col("monetary_raw").desc(), F.col("c_custkey").asc()]),
    ]
    out = rfm
    for score_col, order in specs:
        ranked, n = global_ranked(rfm, order, rank_col="_rank")
        scores = ranked.select(
            "c_custkey",
            ntile_from_rank(F.col("_rank"), n, 4).alias(score_col),
        )
        out = out.join(scores, "c_custkey")
    return out.select(
        "c_custkey",
        "recency_days",
        "frequency",
        F.round("monetary_raw", 2).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )  # no terminal sort (order-insensitive hash gate, guide §2.4)


@register(
    "daily_revenue_filled",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', MIN(o_orderdate)) AS lo,
             date_trunc('day', MAX(o_orderdate)) AS hi
      FROM orders),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 day')) AS day
      FROM bounds),
    daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             SUM(o_totalprice) AS rev, COUNT(*) AS n
      FROM orders GROUP BY day)
    SELECT s.day, ROUND(COALESCE(rev, 0), 2) AS revenue,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
    FROM spine s LEFT JOIN daily USING (day)
    ORDER BY s.day
    """,
)
def daily_revenue_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily revenue: a calendar spine generated from the
    data's own min/max (sequence+explode — no driver loop), left-joined
    onto the daily aggregate so silent zero-activity days appear as
    explicit zeros — the shape every time-series report and forecast
    needs. The spine is |days| rows (tiny at any fact scale) and
    broadcast-joins onto the aggregate."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("n")
    )
    bounds = orders.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.round(F.coalesce(F.col("rev"), F.lit(0)), 2).alias("revenue"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
        .orderBy("day")
    )


@register(
    "revenue_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders GROUP BY day)
    SELECT day, rev,
           ROUND(AVG(rev) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
             AS ma7
    FROM daily
    ORDER BY day
    """,
)
def revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average over daily revenue (the
    smoothing/trend primitive). Daily totals are rounded BEFORE the
    window in both engines so the frame inputs are identical; the
    window is a single ordered pass over |days| rows. At fact scale the
    heavy lifting is the daily aggregate — the MA itself never sees raw
    rows."""
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    w = bounded_grain_window("day").rowsBetween(-6, 0)
    return daily.select(
        "day", "rev", F.round(F.avg("rev").over(w), 2).alias("ma7")
    ).orderBy("day")


@register(
    "yoy_revenue_growth",
    oracle="""
    WITH yearly AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders GROUP BY yr)
    SELECT yr, rev,
           ROUND(rev - LAG(rev) OVER (ORDER BY yr), 2) AS delta,
           ROUND((rev - LAG(rev) OVER (ORDER BY yr))
                 / LAG(rev) OVER (ORDER BY yr), 4) AS growth
    FROM yearly
    ORDER BY yr
    """,
)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth (lag window over the yearly aggregate;
    NULL for the first year). Totals are rounded before the lag so
    deltas and ratios are computed from identical inputs in both
    engines."""
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    yearly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    w = bounded_grain_window("yr")
    prev = F.lag("rev").over(w)
    return yearly.select(
        "yr",
        "rev",
        F.round(F.col("rev") - prev, 2).alias("delta"),
        F.round((F.col("rev") - prev) / prev, 4).alias("growth"),
    ).orderBy("yr")


@register(
    "customer_order_span",
    oracle="""
    SELECT o_custkey AS c_custkey,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                AS BIGINT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice)
                 / NULLIF(date_diff('day', MIN(o_orderdate),
                                    MAX(o_orderdate)), 0), 4)
             AS revenue_per_active_day
    FROM orders
    GROUP BY o_custkey
    ORDER BY c_custkey
    """,
)
def customer_order_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime span report (first/last order, active window,
    revenue intensity). Min/max/count are exact in any engine; the
    intensity ratio divides a rounded sum by an integer day count
    (NULL for single-day customers via NULLIF in both engines). One
    shuffle on custkey."""
    orders = _t(spark, sf_dir, "orders")
    span = F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).cast("long")
    return (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            span.alias("active_days"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum("o_totalprice")
                / F.nullif(span, F.lit(0)),
                4,
            ).alias("revenue_per_active_day"),
        )
        # no terminal sort (order-insensitive hash gate, guide §2.4)
    )


@register(
    "sql_adhoc_revenue",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_quantity > 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_adhoc_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-supplied SQL TEXT against the engine (dbeam's --sqlFile
    mode, reference args/QueryBuilder.java:create_from_query, aimed at
    parquet instead of JDBC): tables registered as temp views, the
    query string handed to spark.sql — Catalyst plans it identically
    to the DataFrame API (same pushdown, same codegen), which is the
    point: the SQL surface costs nothing."""
    for t in ("lineitem",):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_quantity > 25
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@register(
    "market_basket_types",
    oracle="""
    WITH ot AS (
      SELECT DISTINCT l_orderkey, p_type
      FROM lineitem JOIN part ON p_partkey = l_partkey)
    SELECT a.p_type AS type_a, b.p_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM ot a JOIN ot b
      ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
    GROUP BY type_a, type_b
    ORDER BY n_orders DESC, type_a, type_b
    """,
)
def market_basket_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part-type pairs bought in the same
    order (the association-mining primitive). The distinct
    (order, type) projection caps the self-join at ≤K types per order
    — pairs per order are K(K-1)/2 regardless of lineitem count, so
    the join is bounded by basket width, not basket depth. Shuffles on
    orderkey once; the pair aggregate is |types|² groups."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    ot = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    a = ot.select(F.col("l_orderkey").alias("k"), F.col("p_type").alias("type_a"))
    b = ot.select(F.col("l_orderkey").alias("k"), F.col("p_type").alias("type_b"))
    return (
        a.join(b, "k")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "type_a", "type_b")
    )


@register(
    "grouping_sets_sales",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(GROUPING(n_name) * 2
                + GROUPING(year(o_orderdate)) AS BIGINT) AS gid,
           ROUND(SUM(o_totalprice), 2) AS rev
    FROM orders JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY GROUPING SETS ((n_name), (year(o_orderdate)), ())
    ORDER BY gid, n_name NULLS FIRST, yr NULLS FIRST
    """,
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (by-nation, by-year, grand total in ONE
    pass) with an explicit grouping-flag id — composed as
    GROUPING(a)*2+GROUPING(b) in both engines because native
    grouping_id() bit orders differ. Complements rollup_sales /
    cube_sales: sets are hand-picked, not hierarchical. One expand +
    one aggregate, map-side partials intact."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    yr = F.year("o_orderdate").cast("long").alias("yr")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("n_name", yr, "o_totalprice")
    )
    return (
        joined.groupingSets(
            [["n_name"], ["yr"], []], "n_name", "yr"
        )
        .agg(
            (F.grouping("n_name") * 2 + F.grouping("yr"))
            .cast("long")
            .alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
        .select("n_name", "yr", "gid", "rev")
        .orderBy("gid", F.col("n_name").asc_nulls_first(), F.col("yr").asc_nulls_first())
    )


@register(
    "nation_part_types",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(DISTINCT p_type)), '|') AS types,
           CAST(len(list(DISTINCT p_type)) AS BIGINT) AS n_types
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def nation_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the sorted distinct part types each supplier
    nation ships (collect_set + sort_array so the array value is
    deterministic — raw collect order is partitioning-dependent and
    can never be hash-gated). The sorted array is serialized to a
    '|'-joined string in both engines: the gate canonicalizes results
    via pandas sort_values, which cannot sort raw list cells."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sort_array(F.collect_set("p_type")).alias("types_arr"))
        .select(
            "n_name",
            F.array_join("types_arr", "|").alias("types"),
            F.size("types_arr").cast("long").alias("n_types"),
        )
        .orderBy("n_name")
    )


@register(
    "stats_correlation",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sy,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxy,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxx,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) + 0.0 AS corr_disc_qty
    FROM s ORDER BY l_returnflag
    """,
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of discount vs quantity per return flag —
    the statistical-aggregate surface, made engine-exact: both engines
    aggregate EXACT integers (discount quantized to 2-dp ticks, the
    scale cancels in r) and evaluate the identical closed-form double
    expression once per group, so the 6-dp result is bit-stable where
    built-in corr() (order-dependent running sums) is not. Map-side
    partials, one shuffle, 3 groups."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_discount") * 100).cast("long")
    y = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    corr = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    return (
        s.select(
            "l_returnflag",
            "n",
            (F.round(corr, 6) + 0.0).alias("corr_disc_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "revenue_trend",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    s AS (
      SELECT yr,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM monthly GROUP BY yr
    )
    SELECT yr, n AS n_months,
           ROUND(((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)) / 100.0,
                 2) + 0.0 AS slope_per_month
    FROM s WHERE n > 1 ORDER BY yr
    """,
)
def revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year revenue trend: ordinary-least-squares slope of monthly
    revenue over the month index, from exact integer sums (revenue in
    cents) with one identical closed-form evaluation per year — the
    regr_slope surface without its order-dependent float accumulation.
    Two tiny aggregates; everything partial-agg friendly."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("x"),
        )
        .agg(F.sum(cents).alias("y"))
    )
    s = monthly.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * 1.0
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    ) / 100.0
    return (
        s.filter(F.col("n") > 1)
        .select(
            "yr",
            F.col("n").alias("n_months"),
            (F.round(slope, 2) + 0.0).alias("slope_per_month"),
        )
        .orderBy("yr")
    )


@register(
    "integrity_audit",
    oracle="""
    SELECT 'lineitem.orderkey->orders' AS constraint_name,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem.partkey->part',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem.suppkey->supplier',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'orders.custkey->customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer.nationkey->nation',
           CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'supplier.nationkey->nation',
           CAST(COUNT(*) AS BIGINT)
    FROM supplier s WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
    UNION ALL
    SELECT 'nation.regionkey->region',
           CAST(COUNT(*) AS BIGINT)
    FROM nation n WHERE NOT EXISTS
      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
    ORDER BY constraint_name
    """,
)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star schema: one
    orphan count per foreign-key constraint — the data-quality gate a
    pipeline runs after ingest/export and before training. Every check
    is a left_anti join on key-only projections; true-dimension parents
    (nation/region/supplier/part at dbeam scale) broadcast so those
    checks are map-only, while fact-sized parents (orders, customer)
    anti-join with a key shuffle — broadcastable here, but a 100 TB
    orders key set is not, so the plan must not assume it. Each count
    is a 1-row aggregate."""
    checks = [
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey", True),
        ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey", False),
        ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
        ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
        ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey", True),
    ]
    out = None
    for name, child, ck, parent, pk, small_parent in checks:
        parent_keys = _t(spark, sf_dir, parent).select(F.col(pk))
        if small_parent:
            parent_keys = F.broadcast(parent_keys)
        orphans = (
            _t(spark, sf_dir, child)
            .select(F.col(ck))
            .join(parent_keys, F.col(ck) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("constraint_name"), "n_orphans")
        )
        out = orphans if out is None else out.unionByName(orphans)
    return out.orderBy("constraint_name")


@register(
    "key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS n
      FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows_per_key,
           CAST(ROUND(quantile_cont(n, 0.5) * 100) AS BIGINT) AS p50_x100,
           CAST(ROUND(quantile_cont(n, 0.99) * 100) AS BIGINT) AS p99_x100,
           FLOOR(MAX(n) * 10000 / SUM(n)) / 10000.0 + 0.0
             AS max_key_share
    FROM per_key
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic — the measurement that decides
    between a plain shuffle join, AQE skew splitting, and explicit
    salting (operators/joins.py): per-key row counts reduced to
    cardinality, max, p50/p99, and the hottest key's share of all
    rows. Two partial-agg-friendly passes (groupBy key, then one
    global row); at 100 TB the first agg is the only real shuffle and
    map-side combine collapses it. Integer×100 percentiles and
    integer-math share keep every statistic bit-identical across
    engines."""
    orders = _t(spark, sf_dir, "orders")
    per_key = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_rows_per_key"),
        F.expr("CAST(ROUND(percentile(n, 0.5) * 100) AS LONG)").alias(
            "p50_x100"
        ),
        F.expr("CAST(ROUND(percentile(n, 0.99) * 100) AS LONG)").alias(
            "p99_x100"
        ),
        (
            F.floor(F.max("n") * 10000 / F.sum("n")) / 10000.0 + 0.0
        ).alias("max_key_share"),
    )


@register(
    "trimmed_mean_prices",
    oracle="""
    WITH bounds AS (
      SELECT quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_kept,
           CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      / COUNT(*)) AS BIGINT) AS trimmed_mean_cents
    FROM orders, bounds
    WHERE o_totalprice >= lo AND o_totalprice <= hi
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def trimmed_mean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean order value per priority (robust-statistics
    shape: drop the tails, average the core). The global 5th/95th
    percentile pair is a 1-row scalar cross-joined back (broadcast
    nested loop on one row — map-only), so the fact table is scanned
    once more with a pushed-down range filter. Cent-quantized SUM
    makes the mean summation-order exact, and the mean is emitted as
    an integer-rounded cent value (ROUND on a fractional-scale
    division result can tie-break differently across engines; integer
    ROUND only ties on exactly-representable .5 doubles)."""
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.95)").alias("hi"),
    )
    kept = orders.join(F.broadcast(bounds)).where(
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") <= F.col("hi"))
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        kept.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum(cents) / F.count(F.lit(1)))
            .cast("long")
            .alias("trimmed_mean_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "monthly_seasonality",
    oracle="""
    WITH monthly AS (
      SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(cents) AS all_cents, COUNT(*) AS n_months
            FROM monthly)
    SELECT month, n_orders,
           ROUND(cents / 100.0, 2) AS revenue,
           FLOOR(cents * n_months * 10000 / all_cents) / 10000.0 + 0.0
             AS seasonality_index
    FROM monthly, tot
    ORDER BY month
    """,
)
def monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonality index (month's revenue ÷ the equal-share
    baseline): the demand-planning view of the order stream. Exact
    cent-quantized sums, the corpus total is a 1-row broadcast, and
    the index is integer math before one final division — engine-
    stable at any scale."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    monthly = orders.groupBy(
        F.month("o_orderdate").cast("long").alias("month")
    ).agg(
        F.sum(cents).alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    tot = monthly.agg(
        F.sum("cents").alias("all_cents"),
        F.count(F.lit(1)).alias("n_months"),
    )
    return (
        monthly.join(F.broadcast(tot))
        .select(
            "month",
            "n_orders",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            (
                F.floor(
                    F.col("cents") * F.col("n_months") * 10000 / F.col("all_cents")
                )
                / 10000.0
                + 0.0
            ).alias("seasonality_index"),
        )
        .orderBy("month")
    )


@register(
    "priority_drift",
    oracle="""
    WITH mid AS (
      SELECT CAST(MIN(o_orderdate) AS TIMESTAMP)
             + (CAST(MAX(o_orderdate) AS TIMESTAMP)
                - CAST(MIN(o_orderdate) AS TIMESTAMP)) / 2 AS m
      FROM orders
    ),
    cells AS (
      SELECT o_orderpriority AS priority,
             CASE WHEN CAST(o_orderdate AS TIMESTAMP) < m
                  THEN 'first' ELSE 'second' END AS half,
             COUNT(*) AS o
      FROM orders, mid
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT c.priority, c.half, c.o,
             SUM(c.o) OVER (PARTITION BY c.priority) AS row_t,
             SUM(c.o) OVER (PARTITION BY c.half) AS col_t,
             SUM(c.o) OVER () AS grand
      FROM cells c
    )
    SELECT priority,
           CAST(SUM(CASE WHEN half = 'first' THEN o END) AS BIGINT)
             AS n_first,
           CAST(SUM(CASE WHEN half = 'second' THEN o END) AS BIGINT)
             AS n_second,
           CAST(SUM(CAST(FLOOR(
             (o - row_t * col_t * 1.0 / grand)
             * (o - row_t * col_t * 1.0 / grand)
             / (row_t * col_t * 1.0 / grand) * 1000000) AS BIGINT))
             AS BIGINT) AS chi2_x1e6
    FROM tot
    GROUP BY priority
    ORDER BY priority
    """,
)
def priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: chi-square contribution of each
    order priority between the first and second half of the date
    range (the pipeline-health check that catches a feed silently
    changing mix). Each cell's (observed − expected)²/expected term is
    a deterministic IEEE computation from exact integer counts,
    floor-quantized to ×1e6 BEFORE summing — so the statistic is
    bit-identical across engines (a raw float SUM would be
    summation-order dependent). Two shuffles: the cell counts, then
    the marginal windows over ≤|priorities × 2| rows."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    mid = orders.agg(
        (
            F.min("o_orderdate").cast("timestamp").cast("long")
            + (
                F.max("o_orderdate").cast("timestamp").cast("long")
                - F.min("o_orderdate").cast("timestamp").cast("long")
            )
            / 2
        ).alias("m_epoch")
    )
    cells = (
        orders.join(F.broadcast(mid))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.when(
                F.col("o_orderdate").cast("timestamp").cast("long")
                < F.col("m_epoch"),
                "first",
            )
            .otherwise("second")
            .alias("half"),
        )
        .groupBy("priority", "half")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wp = Window.partitionBy("priority")
    wh = Window.partitionBy("half")
    wg = Window.partitionBy(F.lit(0))  # ≤10-cell frame, bounded by enum
    t = (
        cells.withColumn("row_t", F.sum("o").over(wp))
        .withColumn("col_t", F.sum("o").over(wh))
        .withColumn("grand", F.sum("o").over(wg))
    )
    e = F.col("row_t") * F.col("col_t") * 1.0 / F.col("grand")
    term = F.floor((F.col("o") - e) * (F.col("o") - e) / e * 1000000).cast(
        "long"
    )
    return (
        t.groupBy("priority")
        .agg(
            F.sum(F.when(F.col("half") == "first", F.col("o")))
            .cast("long")
            .alias("n_first"),
            F.sum(F.when(F.col("half") == "second", F.col("o")))
            .cast("long")
            .alias("n_second"),
            F.sum(term).cast("long").alias("chi2_x1e6"),
        )
        .orderBy("priority")
    )


@register(
    "abc_classification",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(
               l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (
               ORDER BY cents DESC, l_partkey
             ) AS cum_cents,
             SUM(cents) OVER () AS total_cents
      FROM pr
    )
    SELECT CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           ROUND(SUM(cents) / 100.0, 2) AS revenue,
           FLOOR(SUM(cents) * 10000 / MAX(total_cents)) / 10000.0 + 0.0
             AS revenue_share
    FROM ranked
    GROUP BY 1
    ORDER BY 1
    """,
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification of parts (A = first 80% of
    cumulative revenue, B = to 95%, C = tail): the inventory-
    stratification shape. The expensive step is the per-part cent-
    exact aggregate (shuffles once on partkey, map-side combinable);
    the running-share window then ranks |parts| rows — the already-
    reduced dimension cardinality, NOT the fact table, so the global
    ordering is acceptable even at 100 TB (and integer-math class
    boundaries keep every engine on the same side of each cut)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    pr = li.groupBy("l_partkey").agg(F.sum(cents).alias("cents"))
    # Single-partition by design over the REDUCED per-part frame (the
    # docstring's dimension-cardinality argument); the constant
    # partition key states that intent in source (Catalyst folds it
    # back to an unpartitioned spec — ensure_utc squelches the WARN).
    w_cum = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.col("cents").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(F.lit(0))
    ranked = pr.withColumn("cum_cents", F.sum("cents").over(w_cum)).withColumn(
        "total_cents", F.sum("cents").over(w_all)
    )
    cls = (
        F.when(
            F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A"
        )
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            (
                F.floor(
                    F.sum("cents") * 10000 / F.max("total_cents")
                )
                / 10000.0
                + 0.0
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "supplier_concentration",
    oracle="""
    WITH sr AS (
      SELECT s_nationkey,
             l_suppkey,
             CAST(SUM(CAST(ROUND(
               l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT s_nationkey, l_suppkey, cents,
             SUM(cents) OVER (PARTITION BY s_nationkey) AS nat_cents
      FROM sr
    )
    SELECT n_name,
           COUNT(*) AS n_suppliers,
           ROUND(SUM(cents) / 100.0, 2) AS revenue,
           CAST(SUM(CAST(FLOOR(
             (cents * 10000.0 / nat_cents)
             * (cents * 10000.0 / nat_cents) / 100) AS BIGINT))
             AS BIGINT) AS hhi_x100
    FROM tot JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier market concentration per nation: the Herfindahl-
    Hirschman index from each supplier's revenue share (procurement-
    risk analytics; HHI > 2500 flags concentrated supply). Shares come
    from exact cent sums; each share² term is floor-quantized BEFORE
    summing, so the index is bit-identical across engines (the raw
    float sum would be order-dependent). Shuffles: the per-supplier
    cent rollup, then windows/aggs over the reduced |suppliers| rows;
    the nation name join is a bounded-dim broadcast."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    sr = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("s_nationkey")
    tot = sr.withColumn("nat_cents", F.sum("cents").over(w))
    share_x10k = F.col("cents") * 10000.0 / F.col("nat_cents")
    term = F.floor(share_x10k * share_x10k / 100).cast("long")
    return (
        tot.join(
            F.broadcast(nation), tot.s_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            F.sum(term).cast("long").alias("hhi_x100"),
        )
        .orderBy("n_name")
    )


@register(
    "brand_price_position",
    oracle="""
    WITH p AS (
      SELECT p_brand, p_type,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    type_med AS (
      SELECT p_type,
             CAST(ROUND(quantile_cont(cents, 0.5) * 2) AS BIGINT)
               AS type_median_x2
      FROM p GROUP BY p_type
    )
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(ROUND(quantile_cont(cents, 0.5) * 2) AS BIGINT)
             AS brand_median_x2,
           CAST(SUM(CASE WHEN cents * 2 > type_median_x2
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_type_median
    FROM p JOIN type_med USING (p_type)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def brand_price_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-architecture view: each brand's median retail price and
    how many of its parts sit above their TYPE's median — the
    premium-vs-value positioning matrix. Cent-quantized prices make
    the interpolated medians exact (×2 keeps half-way values
    integral); the type-median table is a bounded-dim broadcast
    joined back onto the part scan."""
    part = _t(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    p = part.select("p_brand", "p_type", cents.alias("cents"))
    type_med = p.groupBy("p_type").agg(
        F.expr("CAST(ROUND(percentile(cents, 0.5) * 2) AS LONG)").alias(
            "type_median_x2"
        )
    )
    return (
        p.join(F.broadcast(type_med), "p_type")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr(
                "CAST(ROUND(percentile(cents, 0.5) * 2) AS LONG)"
            ).alias("brand_median_x2"),
            F.sum(
                F.when(
                    F.col("cents") * 2 > F.col("type_median_x2"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_above_type_median"),
        )
        .orderBy("p_brand")
    )


@register(
    "trade_flow_matrix",
    oracle="""
    SELECT cr.r_name AS cust_region, sr.r_name AS supp_region,
           COUNT(*) AS n_lineitems,
           ROUND(CAST(SUM(CAST(ROUND(
             l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             AS BIGINT) / 100.0, 2) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region cr ON cr.r_regionkey = cn.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN region sr ON sr.r_regionkey = sn.n_regionkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-region × supplier-region trade-flow matrix (q7
    generalized to ALL region pairs — the import/export overview).
    One orders⋈lineitem fact shuffle; customer joins key-partitioned
    (AQE promotes at small SF); the nation→region chain pre-collapses
    to a nationkey→region map on the driver-side bounded dims before
    touching facts, so only TWO broadcast lookups ride the fact rows.
    Cent-exact revenue."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nat_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("nk"), F.col("r_name"))
    cust_r = cust.join(
        F.broadcast(nat_region), cust.c_nationkey == F.col("nk")
    ).select("c_custkey", F.col("r_name").alias("cust_region"))
    supp_r = supp.join(
        F.broadcast(nat_region), supp.s_nationkey == F.col("nk")
    ).select("s_suppkey", F.col("r_name").alias("supp_region"))
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_r, orders.o_custkey == cust_r.c_custkey)
        .join(F.broadcast(supp_r), li.l_suppkey == supp_r.s_suppkey)
        .groupBy("cust_region", "supp_region")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
        )
        .orderBy("cust_region", "supp_region")
    )


@register(
    "power_users_pareto",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents, n_orders,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rk,
             COUNT(*) OVER () AS n_cust,
             SUM(cents) OVER () AS total_cents
      FROM per_cust
    )
    SELECT CAST(SUM(CASE WHEN rk * 10 <= n_cust THEN 1 ELSE 0 END)
                AS BIGINT) AS top_decile_customers,
           FLOOR(SUM(CASE WHEN rk * 10 <= n_cust THEN cents ELSE 0 END)
                 * 10000 / MAX(total_cents)) / 10000.0 + 0.0
             AS top_decile_revenue_share,
           FLOOR(SUM(CASE WHEN rk * 2 <= n_cust THEN cents ELSE 0 END)
                 * 10000 / MAX(total_cents)) / 10000.0 + 0.0
             AS top_half_revenue_share
    FROM ranked
    """,
)
def power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) report: what share of revenue
    the top-decile and top-half customers carry — the whale-detection
    dashboard number. The global revenue rank comes from the
    range-partitioned global_ranked operator (no single-task window);
    deterministic rank tie-break on custkey, integer-math shares."""
    from dbeam_spark.operators.ranking import global_ranked

    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents).alias("cents"), F.count(F.lit(1)).alias("n_orders")
    )
    ranked, n_cust = global_ranked(
        per_cust, [F.col("cents").desc(), F.col("o_custkey").asc()],
        rank_col="rk",
    )
    in_decile = F.when(F.col("rk") * 10 <= F.lit(n_cust), F.col("cents")).otherwise(0)
    in_half = F.when(F.col("rk") * 2 <= F.lit(n_cust), F.col("cents")).otherwise(0)
    return ranked.agg(
        F.sum(F.when(F.col("rk") * 10 <= F.lit(n_cust), 1).otherwise(0))
        .cast("long")
        .alias("top_decile_customers"),
        (
            F.floor(F.sum(in_decile) * 10000 / F.sum("cents"))
            / 10000.0
            + 0.0
        ).alias("top_decile_revenue_share"),
        (
            F.floor(F.sum(in_half) * 10000 / F.sum("cents"))
            / 10000.0
            + 0.0
        ).alias("top_half_revenue_share"),
    )


@register(
    "order_size_distribution",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_items,
             CAST(SUM(CAST(ROUND(
               l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CASE WHEN n_items <= 2 THEN '1-2'
                WHEN n_items <= 4 THEN '3-4'
                ELSE '5+' END AS basket_band,
           COUNT(*) AS n_orders,
           CAST(SUM(n_items) AS BIGINT) AS n_items,
           ROUND(SUM(cents) / 100.0, 2) AS revenue,
           CAST(FLOOR(SUM(cents * 2) / SUM(n_items)) AS BIGINT)
             AS avg_item_cents_x2
    FROM per_order
    GROUP BY 1
    ORDER BY 1
    """,
)
def order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: orders and revenue by line-count
    band, plus average item value per band (merchandising view). The
    banding runs over the per-order rollup (map-side combinable);
    the per-band average is FLOOR of the same IEEE quotient of exact
    cent sums in both engines (a bare CAST would truncate in Spark
    but round in DuckDB)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"), F.sum(cents).alias("cents")
    )
    band = (
        F.when(F.col("n_items") <= 2, "1-2")
        .when(F.col("n_items") <= 4, "3-4")
        .otherwise("5+")
    )
    return (
        per_order.groupBy(band.alias("basket_band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").cast("long").alias("n_items"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            F.floor(F.sum(F.col("cents") * 2) / F.sum("n_items"))
            .cast("long")
            .alias("avg_item_cents_x2"),
        )
        .orderBy("basket_band")
    )


@register(
    "supplier_dependency",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CASE WHEN n_suppliers = 1 THEN 'single-source'
                WHEN n_suppliers <= 3 THEN 'dual-to-triple'
                ELSE 'diversified' END AS sourcing_band,
           COUNT(*) AS n_parts,
           CAST(MIN(n_suppliers) AS BIGINT) AS min_suppliers,
           CAST(MAX(n_suppliers) AS BIGINT) AS max_suppliers
    FROM ps
    GROUP BY 1
    ORDER BY 1
    """,
)
def supplier_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply-risk report: parts banded by how many
    distinct suppliers have shipped them (procurement's
    diversification checklist). The distinct count comes from a
    (part, supplier) pre-aggregation — one shuffle of reduced pairs,
    no countDistinct row expansion — then a tiny banding rollup."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.groupBy("l_partkey", "l_suppkey").agg(F.lit(1).alias("_x"))
    ps = pairs.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    band = (
        F.when(F.col("n_suppliers") == 1, "single-source")
        .when(F.col("n_suppliers") <= 3, "dual-to-triple")
        .otherwise("diversified")
    )
    return (
        ps.groupBy(band.alias("sourcing_band"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("n_suppliers").cast("long").alias("min_suppliers"),
            F.max("n_suppliers").cast("long").alias("max_suppliers"),
        )
        .orderBy("sourcing_band")
    )


@register(
    "completeness_audit",
    oracle="""
    SELECT 'orders' AS tbl, 'o_custkey' AS col,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_nulls
    FROM orders
    UNION ALL
    SELECT 'orders', 'o_totalprice', COUNT(*),
           COUNT(*) - COUNT(o_totalprice) FROM orders
    UNION ALL
    SELECT 'lineitem', 'l_orderkey', COUNT(*),
           COUNT(*) - COUNT(l_orderkey) FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'l_extendedprice', COUNT(*),
           COUNT(*) - COUNT(l_extendedprice) FROM lineitem
    UNION ALL
    SELECT 'customer', 'c_mktsegment', COUNT(*),
           COUNT(*) - COUNT(c_mktsegment) FROM customer
    UNION ALL
    SELECT 'events', 'props', COUNT(*),
           COUNT(*) - COUNT(props) FROM events
    UNION ALL
    SELECT 'documents', 'text', COUNT(*),
           COUNT(*) - COUNT(text) FROM documents
    ORDER BY tbl, col
    """,
)
def completeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table completeness (NULL-rate) audit over the load-
    bearing columns of the star schema — the DQ monitor that pairs
    with integrity_audit (referential) and priority_drift
    (distributional). Each table contributes one partial-aggregated
    count pass; the union is rows-per-column tiny. At 100 TB each
    branch is a single map-side-combinable scan — no shuffle carries
    more than one row per column audited."""
    specs = [
        ("orders", ["o_custkey", "o_totalprice"]),
        ("lineitem", ["l_orderkey", "l_extendedprice"]),
        ("customer", ["c_mktsegment"]),
        ("events", ["props"]),
        ("documents", ["text"]),
    ]
    out = None
    for tbl, cols in specs:
        df = _t(spark, sf_dir, tbl)
        for col in cols:
            branch = df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(col).alias("col"),
                "n_rows",
                "n_nulls",
            )
            out = branch if out is None else out.unionByName(branch)
    return out.orderBy("tbl", "col")


@register(
    "cohort_ltv",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS om,
             year(o_orderdate) * 12 + month(o_orderdate) AS ym,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    fc AS (
      SELECT o_custkey, om, ym, cents,
             MIN(om) OVER (PARTITION BY o_custkey) AS cohort_month,
             MIN(ym) OVER (PARTITION BY o_custkey) AS cym
      FROM o
    ),
    g AS (
      SELECT cohort_month, ym - cym AS month_idx,
             COUNT(*) AS n_orders,
             COUNT(DISTINCT o_custkey) AS active_customers,
             SUM(cents) AS revenue_cents
      FROM fc GROUP BY 1, 2
    )
    SELECT cohort_month,
           CAST(month_idx AS BIGINT) AS month_idx,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(active_customers AS BIGINT) AS active_customers,
           CAST(revenue_cents AS BIGINT) AS revenue_cents,
           CAST(SUM(revenue_cents) OVER (
                  PARTITION BY cohort_month ORDER BY month_idx
                ) AS BIGINT) AS cum_revenue_cents
    FROM g
    ORDER BY cohort_month, month_idx
    """,
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by
    first-order month, revenue tracked by months-since-acquisition,
    with the running cumulative LTV per cohort — the standard
    retention-economics view.

    Shape: ONE shuffle on o_custkey serves both window MINs (cohort
    assignment), then a small (cohort x month_idx) rollup; the
    cumulative window runs over that reduced matrix (#months² rows at
    any scale), never over raw orders. Cent-exact integer sums."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("om"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    wc = Window.partitionBy("o_custkey")
    fc = o.select(
        "o_custkey",
        "ym",
        "cents",
        F.min("om").over(wc).alias("cohort_month"),
        F.min("ym").over(wc).alias("cym"),
    )
    g = fc.groupBy(
        "cohort_month", (F.col("ym") - F.col("cym")).alias("month_idx")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_custkey").alias("active_customers"),
        F.sum("cents").alias("revenue_cents"),
    )
    wcum = (
        Window.partitionBy("cohort_month")
        .orderBy("month_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "cohort_month",
        F.col("month_idx").cast("long").alias("month_idx"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("active_customers").cast("long").alias("active_customers"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        F.sum("revenue_cents").over(wcum).cast("long").alias(
            "cum_revenue_cents"
        ),
    ).orderBy("cohort_month", "month_idx")


@register(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
      FROM customer GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(sz) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS exposed_customers,
           CAST(ROUND(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END)
                      * 10000.0 / SUM(sz)) AS BIGINT)
             AS exposed_share_x1e4
    FROM g
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (mktsegment, nationkey)
    quasi-identifier: per segment, how many identifier groups fall
    below k=5 members and what share of customers sit in those
    re-identifiable groups — the privacy gate a training-data release
    pipeline runs before shipping user-derived records.

    Shape: two map-side-combinable aggregations (pair counts, then a
    segment rollup over the tiny group table); exact integer math."""
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("sz")
    )
    small = F.when(F.col("sz") < 5, F.col("sz")).otherwise(0)
    return (
        g.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("sz").cast("long").alias("min_group_size"),
            F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
            .cast("long")
            .alias("n_small_groups"),
            F.sum(small).cast("long").alias("exposed_customers"),
            F.round(F.sum(small) * 10000.0 / F.sum("sz"))
            .cast("long")
            .alias("exposed_share_x1e4"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "uniqueness_audit",
    oracle="""
    WITH checks AS (
      SELECT 'customer.c_custkey' AS key_check,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT c_custkey) AS n_keys
      FROM customer
      UNION ALL
      SELECT 'orders.o_orderkey', COUNT(*), COUNT(DISTINCT o_orderkey)
      FROM orders
      UNION ALL
      SELECT 'part.p_partkey', COUNT(*), COUNT(DISTINCT p_partkey)
      FROM part
      UNION ALL
      SELECT 'supplier.s_suppkey', COUNT(*), COUNT(DISTINCT s_suppkey)
      FROM supplier
      UNION ALL
      SELECT 'events.event_id', COUNT(*), COUNT(DISTINCT event_id)
      FROM events
      UNION ALL
      SELECT 'documents.doc_id', COUNT(*), COUNT(DISTINCT doc_id)
      FROM documents
      UNION ALL
      SELECT 'lineitem.(orderkey,partkey,suppkey)', COUNT(*),
             COUNT(DISTINCT l_orderkey || '|' || l_partkey || '|' || l_suppkey)
      FROM lineitem
    )
    SELECT key_check,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows - n_keys AS BIGINT) AS n_duplicate_rows
    FROM checks
    ORDER BY key_check
    """,
)
def uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across every keyed table — the
    third leg of the DQ trio (integrity_audit: FKs,
    completeness_audit: NULLs). Each check is one map-side-combinable
    count-distinct per table; the composite lineitem key concatenates
    to one column so the distinct needs no multi-column expansion."""
    def chk(name: str, df: DataFrame, key) -> DataFrame:
        return df.agg(
            F.lit(name).alias("key_check"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(key).cast("long").alias("n_keys"),
        )

    li = _t(spark, sf_dir, "lineitem")
    parts = [
        chk("customer.c_custkey", _t(spark, sf_dir, "customer"),
            F.col("c_custkey")),
        chk("orders.o_orderkey", _t(spark, sf_dir, "orders"),
            F.col("o_orderkey")),
        chk("part.p_partkey", _t(spark, sf_dir, "part"),
            F.col("p_partkey")),
        chk("supplier.s_suppkey", _t(spark, sf_dir, "supplier"),
            F.col("s_suppkey")),
        chk("events.event_id", _t(spark, sf_dir, "events"),
            F.col("event_id")),
        chk("documents.doc_id", _t(spark, sf_dir, "documents"),
            F.col("doc_id")),
        chk(
            "lineitem.(orderkey,partkey,suppkey)",
            li,
            F.concat_ws(
                "|", "l_orderkey", "l_partkey", "l_suppkey"
            ),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "n_duplicate_rows",
        (F.col("n_rows") - F.col("n_keys")).cast("long"),
    ).orderBy("key_check")


@register(
    "uniqueness_audit_sampled",
    oracle="""
    WITH s AS (
      SELECT * FROM events
      WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) IN ('0', '1')
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
             AS n_dup_event_ids,
           CAST(COALESCE(SUM(CASE WHEN value IS NULL OR value <= 0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_value_violations,
           CAST(COALESCE(SUM(CASE WHEN event_type IN
                    ('view', 'click', 'purchase', 'signup', 'error')
                                  THEN 0 ELSE 1 END), 0) AS BIGINT)
             AS n_type_violations
    FROM s
    """,
)
def uniqueness_audit_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SAMPLED DQ audit over events — the batch consumer of the
    `stage_key_buckets` layout (operators/bucketing.py, promoted r8
    from the streaming completeness audit). The audit facts are all
    per-user-decomposable (event-id uniqueness, value domain, type
    domain), so a 2/16-nibble user cohort gives an unbiased audit at
    1/8 the scan: the reader LISTS only the sampled `nib=` dirs —
    input bytes scale with the sample fraction, not the corpus (the
    r7 lesson: a post-source md5 filter measured IDENTICAL to the
    exhaustive audit at 100x because every byte still decoded).
    Oracle restates the gate as substr(md5(user_id), 1, 1) — the
    bucket function is deliberately cross-engine SQL."""
    from dbeam_spark.operators.bucketing import (
        read_key_buckets,
        stage_key_buckets,
    )

    ensure_utc(spark)
    staged = stage_key_buckets(spark, sf_dir, "events", "user_id")
    ev = read_key_buckets(spark, staged, ("0", "1"))
    known = ("view", "click", "purchase", "signup", "error")
    return ev.agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.count_distinct("event_id"))
        .cast("long")
        .alias("n_dup_event_ids"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("value").isNull() | (F.col("value") <= 0), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_value_violations"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_type").isin(*known), 0).otherwise(1)
            ),
            F.lit(0),
        ).cast("long").alias("n_type_violations"),
    )


@register(
    "domain_audit",
    oracle="""
    WITH checks AS (
      SELECT 'orders.o_orderstatus in (O,F,P)' AS rule,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                      THEN 0 ELSE 1 END) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'lineitem.l_discount in [0,0.1]', COUNT(*),
             SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
                      THEN 0 ELSE 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_quantity in [1,50]', COUNT(*),
             SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                      THEN 0 ELSE 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'events.value >= 0', COUNT(*),
             SUM(CASE WHEN value >= 0 THEN 0 ELSE 1 END)
      FROM events
      UNION ALL
      SELECT 'documents.lang in corpus langs', COUNT(*),
             SUM(CASE WHEN lang IN ('en','de','fr','es','zh')
                      THEN 0 ELSE 1 END)
      FROM documents
    )
    SELECT rule,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations
    FROM checks
    ORDER BY rule
    """,
)
def domain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accepted-values / range constraint audit (the dbt-style domain
    checks): each rule is a map-side conditional count over its table,
    no shuffle beyond the 1-row-per-rule union. Completes the DQ
    quartet: integrity (FKs), completeness (NULLs), uniqueness (PKs),
    domain (values)."""
    def rule(name: str, df: DataFrame, ok) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias(
                "n_violations"
            ),
        )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    docs = _t(spark, sf_dir, "documents")
    parts = [
        rule(
            "orders.o_orderstatus in (O,F,P)",
            o,
            F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        rule(
            "lineitem.l_discount in [0,0.1]",
            li,
            (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
        ),
        rule(
            "lineitem.l_quantity in [1,50]",
            li,
            (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
        ),
        rule("events.value >= 0", ev, F.col("value") >= 0),
        rule(
            "documents.lang in corpus langs",
            docs,
            F.col("lang").isin("en", "de", "fr", "es", "zh"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")


@register(
    "revenue_trailing_7d",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT)
               AS day_num,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2)
    SELECT day, cents,
           CAST(SUM(cents) OVER (
             ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trailing7_cents
    FROM daily
    ORDER BY day
    """,
)
def revenue_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True trailing-7-CALENDAR-day revenue via a RANGE window frame
    over the integer day number — unlike revenue_moving_avg's ROWS
    frame, missing days shrink the window instead of silently
    stretching it across gaps (the correctness difference between
    ROWS and RANGE that bites sparse series). Cent-quantized sums
    keep the frame inputs integer-exact in both engines; the window
    runs over |days| rows, never facts."""
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    ).withColumn(
        "day_num",
        F.datediff(F.col("day"), F.lit("1992-01-01").cast("date"))
        .cast("long"),
    )
    w = bounded_grain_window("day_num").rangeBetween(-6, 0)
    return (
        daily.select(
            "day",
            "cents",
            F.sum("cents").over(w).cast("long").alias("trailing7_cents"),
        )
        .orderBy("day")
    )


@register(
    "segment_migration",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 'h1' ELSE 'h2' END AS half,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    thr AS (
      SELECT half,
             CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT) AS q1_x4,
             CAST(quantile_cont(cents, 0.50) * 4 AS BIGINT) AS q2_x4,
             CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT) AS q3_x4
      FROM spend GROUP BY half
    ),
    seg AS (
      SELECT s.o_custkey, s.half,
             1 + CASE WHEN s.cents * 4 > t.q1_x4 THEN 1 ELSE 0 END
               + CASE WHEN s.cents * 4 > t.q2_x4 THEN 1 ELSE 0 END
               + CASE WHEN s.cents * 4 > t.q3_x4 THEN 1 ELSE 0 END
               AS quartile
      FROM spend s JOIN thr t USING (half)
    )
    SELECT a.quartile AS seg_h1, b.quartile AS seg_h2,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM seg a JOIN seg b
      ON a.o_custkey = b.o_custkey AND a.half = 'h1' AND b.half = 'h2'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend-quartile MIGRATION matrix between the two
    halves of the order history (pre/post 1998): who moved up, who
    churned down — the customer-base drift view behind retention
    spend. Scale-safe quartiling: per-half quartile CUT VALUES come
    from one 8-row percentile aggregate broadcast back, and bucket
    assignment is a map-side comparison — no global ranking window
    over customers (the rewrite pattern customer_quartiles/
    rfm_segments adopted). Thresholds are ×4-quantized: quartile
    interpolation fractions are k/4, so 4*(a + (k/4)*(b-a)) is an
    exact integer — the ×2 variant could land on a half-integer
    where Spark CAST truncates but DuckDB CAST rounds."""
    orders = _t(spark, sf_dir, "orders")
    spend = (
        orders.withColumn(
            "half",
            F.when(
                F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
                "h1",
            ).otherwise("h2"),
        )
        .groupBy(F.col("o_custkey"), F.col("half"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    thr = spend.groupBy("half").agg(
        F.expr("CAST(percentile(cents, 0.25) * 4 AS LONG)").alias("q1_x4"),
        F.expr("CAST(percentile(cents, 0.50) * 4 AS LONG)").alias("q2_x4"),
        F.expr("CAST(percentile(cents, 0.75) * 4 AS LONG)").alias("q3_x4"),
    )
    seg = spend.join(F.broadcast(thr), "half").select(
        "o_custkey",
        "half",
        (
            F.lit(1)
            + (F.col("cents") * 4 > F.col("q1_x4")).cast("int")
            + (F.col("cents") * 4 > F.col("q2_x4")).cast("int")
            + (F.col("cents") * 4 > F.col("q3_x4")).cast("int")
        ).alias("quartile"),
    )
    a = seg.filter(F.col("half") == "h1").select(
        "o_custkey", F.col("quartile").alias("seg_h1")
    )
    b = seg.filter(F.col("half") == "h2").select(
        "o_custkey", F.col("quartile").alias("seg_h2")
    )
    return (
        a.join(b, "o_custkey")
        .groupBy("seg_h1", "seg_h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("seg_h1", "seg_h2")
    )


@register(
    "l_diversity_audit",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment, c.c_nationkey, o.o_orderpriority
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
      SELECT c_mktsegment, c_nationkey,
             COUNT(*) AS sz,
             COUNT(DISTINCT o_orderpriority) AS l_div
      FROM j GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(l_div) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_diversity,
           CAST(SUM(CASE WHEN l_div < 3 THEN sz ELSE 0 END) AS BIGINT)
             AS exposed_rows
    FROM g
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's complement: a
    quasi-identifier group can be large (k-safe) yet leak the
    sensitive attribute if every member shares one value. Per
    segment: groups whose sensitive attribute (order priority) shows
    fewer than l=3 distinct values, and the rows they expose to
    homogeneity attacks. Together with k_anonymity_audit this is the
    standard pre-release pair.

    Shape: the fact-dim join broadcasts customer's projection only at
    small SF (AQE-sized); the distinct count runs per bounded
    (segment, nation) group — no countDistinct expansion at the
    segment rollup, which aggregates the tiny group table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    j = o.select("o_custkey", "o_orderpriority").join(
        c, F.col("o_custkey") == F.col("c_custkey")
    )
    g = j.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct("o_orderpriority").alias("l_div"),
    )
    return (
        g.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("l_div").cast("long").alias("min_l"),
            F.sum(F.when(F.col("l_div") < 3, 1).otherwise(0))
            .cast("long")
            .alias("n_low_diversity"),
            F.sum(F.when(F.col("l_div") < 3, F.col("sz")).otherwise(0))
            .cast("long")
            .alias("exposed_rows"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "basket_rules",
    oracle="""
    WITH ot AS (
      SELECT DISTINCT l_orderkey, p_type
      FROM lineitem JOIN part ON p_partkey = l_partkey),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ot),
    s AS (SELECT p_type, COUNT(*) AS s_t FROM ot GROUP BY p_type),
    ab AS (
      SELECT a.p_type AS ante, b.p_type AS cons, COUNT(*) AS s_ab
      FROM ot a JOIN ot b
        ON a.l_orderkey = b.l_orderkey AND a.p_type <> b.p_type
      GROUP BY 1, 2
    ),
    rules AS (
      SELECT ante, cons,
             CAST(s_ab AS BIGINT) AS s_ab,
             CAST(s_ab * 10000 // sa.s_t AS BIGINT) AS conf_x1e4,
             CAST(s_ab * n.n_orders * 10000 // (sa.s_t * sb.s_t)
                  AS BIGINT) AS lift_x1e4
      FROM ab
      JOIN s sa ON sa.p_type = ante
      JOIN s sb ON sb.p_type = cons
      CROSS JOIN n
      WHERE s_ab * 100 >= n.n_orders
    )
    SELECT ante, cons, s_ab, conf_x1e4, lift_x1e4, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY lift_x1e4 DESC, conf_x1e4 DESC, ante, cons) AS rk
      FROM rules
    ) WHERE rk <= 20
    ORDER BY rk
    """,
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over part-type baskets: directed A→B rules
    with integer-exact support, confidence (s_AB/s_A ×1e4, floor)
    and lift (s_AB·N / (s_A·s_B) ×1e4, floor), min-support 1% of
    orders, top-20 by lift with a full deterministic tie-break —
    market_basket_types' counts taken through to the actual
    recommendation metrics. All ratios are integer floor divisions,
    so both engines agree bit-for-bit.

    Shape: the basket self-join is width-bounded (≤K types per
    order); per-type supports and the 1-row total broadcast back onto
    the |types|² rule table, and the ranking window runs over the
    min-support survivors only."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    ot = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    n = ot.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    s = ot.groupBy("p_type").agg(F.count(F.lit(1)).alias("s_t"))
    a = ot.select(F.col("l_orderkey").alias("k"), F.col("p_type").alias("ante"))
    b = ot.select(F.col("l_orderkey").alias("k"), F.col("p_type").alias("cons"))
    ab = (
        a.join(b, "k")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("s_ab"))
    )
    sa = s.select(F.col("p_type").alias("ante"), F.col("s_t").alias("sa"))
    sb = s.select(F.col("p_type").alias("cons"), F.col("s_t").alias("sb"))
    rules = (
        ab.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sb), "cons")
        .crossJoin(F.broadcast(n))
        .filter(F.col("s_ab") * 100 >= F.col("n_orders"))
        .select(
            "ante",
            "cons",
            F.col("s_ab").cast("long"),
            F.expr("s_ab * 10000 DIV sa").cast("long").alias("conf_x1e4"),
            F.expr("s_ab * n_orders * 10000 DIV (sa * sb)")
            .cast("long")
            .alias("lift_x1e4"),
        )
    )
    from pyspark.sql import Window

    # enumeration-bounded: rules over type pairs, not fact rows
    w = bounded_grain_window(
        F.col("lift_x1e4").desc(), F.col("conf_x1e4").desc(), "ante", "cons"
    )
    return (
        rules.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .orderBy("rk")
    )


@register(
    "part_skyline",
    oracle="""
    WITH p AS (SELECT p_partkey,
                      CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
                      CAST(p_size AS BIGINT) AS size
               FROM part)
    SELECT a.p_partkey, a.cents, a.size FROM p a
    WHERE NOT EXISTS (SELECT 1 FROM p b
      WHERE b.cents <= a.cents AND b.size >= a.size
        AND (b.cents < a.cents OR b.size > a.size))
    ORDER BY p_partkey
    """,
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-optimal set): parts not dominated on
    (price low, size high) — the multi-criteria shortlist primitive
    (cheapest-for-its-size). The oracle is the O(n^2) NOT EXISTS
    spec; the Spark plan is the sweep-line form: per-price max size
    (one map-side-combined groupBy whose output is DOMAIN-bounded —
    distinct price points, not rows), a scale-safe global prefix-max
    over the price order (operators/ranking.global_prefix_max: range
    partition + per-partition window + carry-in map, never a
    single-partition global window), and a broadcast semi-join of the
    surviving (price, size) pairs back onto the part table. Skyline
    output is mutually non-dominating, so the survivor set is tiny by
    construction — safe to broadcast."""
    ensure_utc(spark)
    from dbeam_spark.operators.ranking import global_prefix_max

    part = _t(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    m = p.groupBy("cents").agg(F.max("size").alias("msize"))
    s = global_prefix_max(m, [F.col("cents")], F.col("msize"), "prevmax")
    sky_pairs = s.filter(
        F.col("prevmax").isNull() | (F.col("msize") > F.col("prevmax"))
    ).select("cents", F.col("msize").alias("size"))
    return (
        p.join(F.broadcast(sky_pairs), ["cents", "size"])
        .select("p_partkey", "cents", "size")
        .orderBy("p_partkey")
    )


@register(
    "histogram_equidepth",
    oracle="""
    WITH cuts AS (SELECT quantile_cont(o_totalprice,
      [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS c FROM orders)
    SELECT bucket, COUNT(*) AS n_orders,
           CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS lo_cents,
           CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS hi_cents
    FROM (
      SELECT o_totalprice,
             CAST(1 + (o_totalprice > c[1])::INT + (o_totalprice > c[2])::INT
                + (o_totalprice > c[3])::INT + (o_totalprice > c[4])::INT
                + (o_totalprice > c[5])::INT + (o_totalprice > c[6])::INT
                + (o_totalprice > c[7])::INT AS BIGINT) AS bucket
      FROM orders, cuts)
    GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 buckets of ~equal row count) of order
    value — the optimizer's-eye view of a column, complementing
    histogram_prices' equi-width bins. NEVER a global ntile window:
    the seven cut values come from one exact-percentile aggregate
    (1 row, broadcast back), and bucket assignment is a map-side sum
    of strict comparisons — identical arithmetic in both engines
    (Spark `percentile` interpolates exactly like DuckDB
    quantile_cont), so boundary assignment is bit-stable. Scan →
    scalar agg → map-side bucket → one 8-group shuffle."""
    ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    qs = [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]
    cuts = orders.agg(
        F.expr(
            "percentile(o_totalprice, array({}))".format(
                ", ".join(str(q) for q in qs)
            )
        ).alias("c")
    )
    bucket = F.lit(1)
    for i in range(7):
        bucket = bucket + (F.col("o_totalprice") > F.col("c")[i]).cast("int")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.join(F.broadcast(cuts))
        .select(bucket.cast("long").alias("bucket"), cents.alias("cents"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "bloom_pruned_revenue",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_orderkey IN
      (SELECT o_orderkey FROM orders WHERE o_totalprice >= 450000)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-item revenue of very-large orders (price >= 450k), with
    the fact side pre-pruned by an explicit Bloom filter
    (operators/joins.bloom_semi_join) before the exact semi-join —
    the runtime-filter pattern as a first-class operator. The filter
    build shuffles at most num_bits/64 words (config-bounded), the
    probe is pure Catalyst bit math inside the lineitem scan stage,
    and only bloom survivors (true matches + a ~0.1% false-positive
    trickle) reach the join exchange. Output is the exact semi-join
    result — false positives die in the verify join, so the oracle is
    the plain IN-subquery spec."""
    ensure_utc(spark)
    from dbeam_spark.operators.joins import bloom_semi_join

    lineitem = _t(spark, sf_dir, "lineitem")
    keys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 450000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    hit = bloom_semi_join(lineitem, keys, on="l_orderkey")
    return (
        hit.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "brand_trend_slope",
    oracle="""
    WITH m0 AS (SELECT MIN(date_trunc('month', l_shipdate)) AS m
                FROM lineitem),
    monthly AS (
      SELECT p.p_brand,
             date_diff('month', m0.m, date_trunc('month', l.l_shipdate))
               AS x,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey, m0
      GROUP BY 1, 2
    ),
    s AS (
      SELECT p_brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy
      FROM monthly GROUP BY 1
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_months,
           CAST((n*sxy - sx*sy) * 10000 // (n*sxx - sx*sx) AS BIGINT)
             AS slope_cents_x1e4
    FROM s ORDER BY p_brand
    """,
)
def brand_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand revenue trend: the OLS slope of monthly revenue over
    a month index, computed ENTIRELY in integer sufficient statistics
    (n, Σx, Σy, Σx², Σxy) so both engines agree bit-for-bit — float
    regr_slope would be summation-order dependent. The month index is
    centered on the global minimum month (a 1-row broadcast scalar):
    centering keeps n·Σxy within int64 at warehouse scale (raw epoch
    months would overflow the 1e4-scaled numerator ~1000× sooner).
    Plan: fact scan → broadcast part dim → one (brand, month) rollup
    (map-side combined) → 25-row stats rollup. Slope is emitted as a
    floor-scaled integer (cents/month × 1e4)."""
    ensure_utc(spark)
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    m0 = lineitem.agg(
        F.min(F.date_trunc("month", F.col("l_shipdate"))).alias("m")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    monthly = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .crossJoin(F.broadcast(m0))
        .groupBy(
            "p_brand",
            F.months_between(
                F.date_trunc("month", F.col("l_shipdate")), F.col("m")
            )
            .cast("long")
            .alias("x"),
        )
        .agg(F.sum(cents).alias("y"))
    )
    s = monthly.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        "p_brand",
        F.col("n").cast("long").alias("n_months"),
        F.expr("(n*sxy - sx*sy) * 10000 DIV (n*sxx - sx*sx)")
        .cast("long")
        .alias("slope_cents_x1e4"),
    ).orderBy("p_brand")


@register(
    "join_cardinality_profile",
    oracle="""
    WITH lk AS (SELECT l_orderkey AS k, COUNT(*) AS n
                FROM lineitem GROUP BY 1),
    ok AS (SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
    j AS (SELECT lk.k, lk.n AS nl, ok.n AS nr FROM lk JOIN ok USING (k))
    SELECT (SELECT COUNT(*) FROM lk) AS keys_left,
           (SELECT COUNT(*) FROM ok) AS keys_right,
           COUNT(*) AS keys_shared,
           CAST(SUM(nl * nr) AS BIGINT) AS join_rows,
           CAST(MAX(nl * nr) AS BIGINT) AS max_key_rows,
           CAST(SUM(CASE WHEN nl * nr > 4 THEN nl * nr ELSE 0 END)
                AS BIGINT) AS rows_from_heavy_keys
    FROM j
    """,
)
def join_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion audit BEFORE the join: per-key multiplicities of
    both sides joined on the key (two map-side-combined rollups whose
    join carries one row per key, never the fact rows), predicting the
    exact output cardinality Σ nl·nr, the worst single key, and the
    mass concentrated in heavy keys (nl·nr > 4). At 100 TB this is
    the cheap dry-run that decides salting / AQE-skew settings before
    committing to a fact-fact shuffle — the profile costs two
    aggregations, the mistake it prevents costs the cluster."""
    ensure_utc(spark)
    lk = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("nl"))
    )
    ok = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("nr"))
    )
    nlk = lk.agg(F.count(F.lit(1)).cast("long").alias("keys_left"))
    nok = ok.agg(F.count(F.lit(1)).cast("long").alias("keys_right"))
    j = lk.join(ok, "k").select("nl", "nr")
    prof = j.agg(
        F.count(F.lit(1)).cast("long").alias("keys_shared"),
        F.sum(F.col("nl") * F.col("nr")).cast("long").alias("join_rows"),
        F.max(F.col("nl") * F.col("nr")).cast("long").alias("max_key_rows"),
        F.sum(
            F.when(F.col("nl") * F.col("nr") > 4, F.col("nl") * F.col("nr"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("rows_from_heavy_keys"),
    )
    return (
        nlk.crossJoin(F.broadcast(nok))
        .crossJoin(F.broadcast(prof))
        .select(
            "keys_left",
            "keys_right",
            "keys_shared",
            "join_rows",
            "max_key_rows",
            "rows_from_heavy_keys",
        )
    )


@register(
    "revenue_islands",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    flagged AS (
      SELECT day, cents,
             CAST(date_diff('day', TIMESTAMP '1990-01-01', day) AS BIGINT)
               - ROW_NUMBER() OVER (ORDER BY day) AS grp
      FROM daily WHERE cents >= 700000 * 100
    ),
    islands AS (
      SELECT MIN(day) AS start_day, MAX(day) AS end_day,
             COUNT(*) AS n_days,
             CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM flagged GROUP BY grp
    )
    SELECT * FROM islands ORDER BY n_days DESC, start_day LIMIT 10
    """,
)
def revenue_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE days with daily
    revenue ≥ 700k, via the classic day_number − row_number grouping
    key (consecutive qualifying days share a constant difference).
    The window runs over the DAILY rollup — bounded by the calendar,
    not the fact count (same class as revenue_moving_avg) — and the
    top-10 longest streaks come from a distributed
    TakeOrderedAndProject. The streak-detection primitive behind
    uptime/SLA reporting and demand-surge analysis."""
    ensure_utc(spark)
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    flagged = daily.filter(F.col("cents") >= 700000 * 100).withColumn(
        "grp",
        F.datediff(
            F.col("day"), F.lit("1990-01-01").cast("timestamp")
        ).cast("long")
        - F.row_number().over(bounded_grain_window("day")),
    )
    islands = flagged.groupBy("grp").agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    return (
        islands.select("start_day", "end_day", "n_days", "total_cents")
        .orderBy(F.col("n_days").desc(), "start_day")
        .limit(10)
    )


@register(
    "return_rate_wilson",
    oracle="""
    WITH s AS (
      SELECT o.o_orderpriority,
             COUNT(*) AS n,
             SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    )
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n_lines,
           CAST(r AS BIGINT) AS n_returned,
           CAST(FLOOR((r/n + 1.9208/n - 1.96*sqrt((r/n*(1 - r/n)
                + 0.9604/n)/n)) / (1 + 3.8416/n) * 1000000) AS BIGINT)
             AS wilson_lo_x1e6,
           CAST(FLOOR((r/n + 1.9208/n + 1.96*sqrt((r/n*(1 - r/n)
                + 0.9604/n)/n)) / (1 + 3.8416/n) * 1000000) AS BIGINT)
             AS wilson_hi_x1e6
    FROM s ORDER BY o_orderpriority
    """,
)
def return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate per order priority with the Wilson 95% score
    interval — the statistically honest proportion bound (a 3-of-10
    rate and a 3000-of-10000 rate stop looking alike). Float math IS
    engine-exact here because +,−,×,/,sqrt are all IEEE
    exactly-rounded: both engines evaluate the SAME expression tree
    with the SAME decimal literals (1.9208, 0.9604, 3.8416 — spelled,
    not computed as 1.96², which could differ by an ulp from the
    literal), so every intermediate double is bit-identical and the
    1e6-scaled FLOOR cannot straddle engines. One fact-fact join and
    a 5-group rollup."""
    ensure_utc(spark)
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    s = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderpriority"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("r"),
        )
    )
    lo = (
        "CAST(FLOOR((r/n + 1.9208/n - 1.96*sqrt((r/n*(1 - r/n)"
        " + 0.9604/n)/n)) / (1 + 3.8416/n) * 1000000) AS BIGINT)"
    )
    hi = lo.replace("/n - 1.96*", "/n + 1.96*")
    return s.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_lines"),
        F.col("r").cast("long").alias("n_returned"),
        F.expr(lo).alias("wilson_lo_x1e6"),
        F.expr(hi).alias("wilson_hi_x1e6"),
    ).orderBy("o_orderpriority")


@register(
    "orders_benford",
    oracle="""
    WITH d AS (
      SELECT SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    t AS (SELECT COUNT(*) AS n FROM d)
    SELECT digit, COUNT(*) AS n_orders,
           CAST(COUNT(*) * 1000000 // (SELECT n FROM t) AS BIGINT)
             AS share_x1e6,
           CAST(FLOOR(log10(1.0 + 1.0/CAST(digit AS BIGINT)) * 1000000)
                AS BIGINT) AS benford_x1e6
    FROM d GROUP BY digit ORDER BY digit
    """,
)
def orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    fraud/fabrication screen: observed first-digit shares next to the
    Benford expectation log₁₀(1 + 1/d). Map-side digit extraction,
    one 9-group rollup, scalar total broadcast back. The only float
    is log₁₀ of nine fixed constants, each ≥ 0.01 away from its
    1e6-scaled floor boundary — libm-vs-Math.log10 ulp differences
    cannot flip the floor. The testdata's uniform price range shows
    the expected NON-Benford overweight of leading 1-4: the audit
    flags synthetic data as synthetic."""
    ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        ).alias("digit")
    )
    t = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n_orders").cast("long"),
            F.expr("n_orders * 1000000 DIV n").cast("long").alias(
                "share_x1e6"
            ),
            F.expr(
                "CAST(FLOOR(log10(1.0 + 1.0/CAST(digit AS BIGINT))"
                " * 1000000) AS BIGINT)"
            ).alias("benford_x1e6"),
        )
        .orderBy("digit")
    )


KM_ORACLE = """
    WITH cutoff AS (SELECT MAX(o_orderdate) - INTERVAL 90 DAY AS cut
                    FROM orders),
    span AS (
      SELECT c.c_mktsegment AS seg,
             date_diff('day', MIN(o.o_orderdate), MAX(o.o_orderdate))
               AS life,
             MAX(o.o_orderdate) <= (SELECT cut FROM cutoff) AS churned
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    ),
    ev AS (
      SELECT seg, life,
             SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
             COUNT(*) AS c
      FROM span GROUP BY seg, life
    ),
    risk AS (
      SELECT seg, life, d,
             SUM(c) OVER (PARTITION BY seg ORDER BY life DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS n
      FROM ev
    ),
    h AS (SELECT UNNEST([1095, 1825, 2190, 2555]) AS horizon),
    km AS (
      SELECT r.seg, h.horizon,
             list_reduce(
               list_prepend(CAST(1.0 AS DOUBLE),
                 list(1 - CAST(d AS DOUBLE)/n ORDER BY life)
                   FILTER (life <= horizon AND d > 0)),
               (acc, x) -> acc * x) AS s
      FROM risk r, h
      GROUP BY r.seg, h.horizon
    )
    SELECT seg, CAST(horizon AS BIGINT) AS horizon,
           CAST(FLOOR(s * 1000000) AS BIGINT) AS survival_x1e6
    FROM km ORDER BY seg, horizon
    """


def km_from_spans(per_cust: DataFrame, customer: DataFrame) -> DataFrame:
    """Kaplan-Meier fold shared by the batch query and its streaming
    twin: takes the per-customer (o_custkey, first_d, last_d) span
    frame — however it was accumulated — joins segments, builds the
    day-domain-bounded (seg, life) event table, the reverse-cumulative
    risk window, and the ordered (1 − d/n) product at four horizons.
    Identical inputs ⇒ identical IEEE folds ⇒ both callers share one
    SQL oracle (KM_ORACLE)."""
    cutoff = per_cust.agg(
        (F.max("last_d") - F.expr("INTERVAL 90 DAYS")).alias("cut")
    )
    span = per_cust.crossJoin(F.broadcast(cutoff)).join(
        customer.select("c_custkey", "c_mktsegment"),
        per_cust["o_custkey"] == customer["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.datediff(F.col("last_d"), F.col("first_d")).alias("life"),
        (F.col("last_d") <= F.col("cut")).alias("churned"),
    )
    ev = span.groupBy("seg", "life").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("seg")
        .orderBy(F.col("life").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = ev.withColumn("n", F.sum("c").over(w))
    series = risk.groupBy("seg").agg(
        F.sort_array(F.collect_list(F.struct("life", "d", "n"))).alias("evs")
    )
    horizons = F.explode(
        F.array(*[F.lit(h) for h in (1095, 1825, 2190, 2555)])
    ).alias("horizon")
    return (
        series.select("seg", "evs")
        .select("seg", "evs", horizons)
        .select(
            "seg",
            F.col("horizon").cast("long"),
            F.expr(
                "CAST(FLOOR(aggregate(filter(evs, s -> s.life <= horizon"
                " AND s.d > 0), CAST(1.0 AS DOUBLE),"
                " (acc, s) -> acc * (1 - CAST(s.d AS DOUBLE)/s.n))"
                " * 1000000) AS BIGINT)"
            ).alias("survival_x1e6"),
        )
        .orderBy("seg", "horizon")
    )


@register("customer_survival_km", oracle=KM_ORACLE)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival per market segment: S(t) = ∏(1 − dᵢ/nᵢ)
    over churn-event times ≤ t, right-censoring customers still
    active within 90 days of the dataset edge — real survival
    analysis (the retention curve with censoring done honestly),
    sampled at four horizons. Shape: per-customer span rollup FIRST
    (so the segment join moves one row per customer, not per order),
    a (segment, lifetime) event table bounded by the DAY DOMAIN, a
    reverse-cumulative risk-set window over that bounded table, and
    the KM product as an ordered JVM fold per (segment, horizon) —
    both engines multiply the identical (1 − d/n) doubles in
    identical lifetime order with exactly-rounded IEEE ops, so even
    this float product chain is hash-gated."""
    ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_d"),
        F.max("o_orderdate").alias("last_d"),
    )
    return km_from_spans(per_cust, customer)


@register(
    "join_view_demo",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def join_view_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained JOIN view (jobs/join_view_maintain,
    A39) proven equal to the one-shot join: lineitem arrives in two
    delta batches and orders in three, five maintenance calls apply
    the three-term delta join d(L⋈R) = dL⋈R ∪ L⋈dR ∪ dL⋈dR, and the
    final view aggregates to EXACTLY what joining the full tables
    yields — the oracle is that one-shot join, so the hash gate
    proves the IVM algebra end-to-end (no row lost, duplicated, or
    joined twice across batch boundaries)."""
    import shutil
    import tempfile

    from dbeam_spark.jobs.join_view_maintain import (
        maintain_join_view,
        read_join_view,
    )

    ensure_utc(spark)
    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    view_dir = tempfile.mkdtemp(prefix="join_view_demo_")
    shutil.rmtree(view_dir, ignore_errors=True)
    l_batches = [
        lineitem.filter(F.pmod("l_orderkey", F.lit(2)) == i) for i in range(2)
    ]
    o_batches = [
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == i) for i in range(3)
    ]
    maintain_join_view(
        spark, view_dir, "l_orderkey", "o_orderkey",
        left_delta=l_batches[0], right_delta=o_batches[0],
    )
    maintain_join_view(
        spark, view_dir, "l_orderkey", "o_orderkey",
        right_delta=o_batches[1],
    )
    maintain_join_view(
        spark, view_dir, "l_orderkey", "o_orderkey",
        left_delta=l_batches[1],
    )
    maintain_join_view(
        spark, view_dir, "l_orderkey", "o_orderkey",
        right_delta=o_batches[2],
    )
    view = read_join_view(spark, view_dir)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    out = (
        view.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )
    rows = out.collect()
    shutil.rmtree(view_dir, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@register(
    "nation_rank_stability",
    oracle="""
    WITH yearly AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr, n.n_name,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
                   JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT yr, n_name,
             CAST(ROW_NUMBER() OVER (PARTITION BY yr
                  ORDER BY cents DESC, n_name) AS BIGINT) AS rk
      FROM yearly
    ),
    pairs AS (
      SELECT a.yr AS yr_from, COUNT(*) AS n,
             CAST(SUM((a.rk - b.rk) * (a.rk - b.rk)) AS BIGINT) AS sd2
      FROM ranked a JOIN ranked b
        ON b.n_name = a.n_name AND b.yr = a.yr + 1
      GROUP BY a.yr
    )
    SELECT yr_from, CAST(n AS BIGINT) AS n_nations, sd2,
           CAST((n*(n*n-1)*3000000 - 6000000*sd2) // (n*(n*n-1))
                - 2000000 AS BIGINT) AS spearman_x1e6
    FROM pairs WHERE n >= 2 ORDER BY yr_from
    """,
)
def nation_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year Spearman rank correlation of nation revenue
    ranks — 'does the league table reshuffle?' as one number per year
    pair. ρ = 1 − 6Σd²/(n(n²−1)) is an exact rational of integer
    ranks, so the 1e6-scaled value is pure integer floor division —
    with a +2·D offset keeping the numerator positive, because Spark
    DIV truncates toward zero while DuckDB // floors (they differ
    exactly on negatives, the CLAUDE.md hazard). All grains are
    bounded (nation × year), the only data-scaled work is the yearly
    rollup with broadcast dims."""
    ensure_utc(spark)
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    yearly = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"), "n_name"
        )
        .agg(F.sum(cents).alias("cents"))
    )
    rk = F.row_number().over(
        Window.partitionBy("yr").orderBy(F.col("cents").desc(), "n_name")
    )
    ranked = yearly.select("yr", "n_name", rk.cast("long").alias("rk"))
    nxt = ranked.select(
        (F.col("yr") - 1).alias("yr"),
        F.col("n_name"),
        F.col("rk").alias("rk_next"),
    )
    pairs = (
        ranked.join(nxt, ["yr", "n_name"])
        .groupBy(F.col("yr").alias("yr_from"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("rk") - F.col("rk_next"))
                * (F.col("rk") - F.col("rk_next"))
            ).alias("sd2"),
        )
        .filter(F.col("n") >= 2)
    )
    return pairs.select(
        "yr_from",
        F.col("n").cast("long").alias("n_nations"),
        F.col("sd2").cast("long"),
        F.expr(
            "(n*(n*n-1)*3000000 - 6000000*sd2) DIV (n*(n*n-1)) - 2000000"
        )
        .cast("long")
        .alias("spearman_x1e6"),
    ).orderBy("yr_from")


@register(
    "revenue_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM daily
    ),
    cusum AS (
      SELECT day,
             SUM(cents - (SELECT total // n_days FROM stats)) OVER (
               ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
      FROM daily
    )
    SELECT
      (SELECT MIN(day) FROM cusum
       WHERE ABS(s) = (SELECT MAX(ABS(s)) FROM cusum))
        AS changepoint_day,
      CAST((SELECT MAX(ABS(s)) FROM cusum) AS BIGINT)
        AS max_cusum_abs_cents,
      (SELECT n_days FROM stats) AS n_days,
      CAST((SELECT total // n_days FROM stats) AS BIGINT)
        AS mean_daily_cents
    """,
)
def revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM change-point detection on daily revenue: the
    cumulative sum of deviations from the global daily mean peaks (in
    absolute value) at the most likely level-shift day — the classic
    distribution-free screen for "did the business change on some
    date", feeding alerting and A/B cutover audits. Integer-exact
    end-to-end: cents, an integer floor mean, and an integer prefix
    sum, so the argmax day and peak magnitude hash-match the SQL
    restatement exactly (ties break to the earliest day).

    Shape at 100 TB: ONE map-side-combinable daily rollup collapses
    the fact table to a calendar-bounded frame; the prefix sum runs on
    ≤366 rows/year (bounded_grain_window) and two 1-row aggregates
    broadcast back. Nothing downstream of the rollup scales with
    order volume."""
    ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("total"),
    ).withColumn("mu", F.expr("total DIV n_days"))
    from pyspark.sql import Window

    w = bounded_grain_window("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cusum = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn("s", F.sum(F.col("cents") - F.col("mu")).over(w))
        .withColumn("abs_s", F.abs("s"))
    )
    peak = cusum.agg(F.max("abs_s").alias("peak"))
    return (
        cusum.crossJoin(F.broadcast(peak))
        .filter(F.col("abs_s") == F.col("peak"))
        .agg(
            F.min("day").alias("changepoint_day"),
            F.max("peak").cast("long").alias("max_cusum_abs_cents"),
            F.max("n_days").alias("n_days"),
            F.max("mu").cast("long").alias("mean_daily_cents"),
        )
    )


@register(
    "customer_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk
      FROM spend
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS total,
             CAST(SUM(rk * cents) AS HUGEINT) AS weighted
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(total AS BIGINT) AS total_cents,
           CAST((2 * weighted - (n + 1) * total) * 1000000
                // (n * total) AS BIGINT) AS gini_x1e6
    FROM agg
    """,
)
def customer_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the one-number
    concentration summary behind "do 20% of customers drive 80% of
    revenue" (the integral twin of power_users_pareto's curve).
    Integer-exact: G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) over
    cents-quantized spend with a TOTAL order (cents, custkey), floor-
    quantized ×1e6 — both engines do the same exact integer
    arithmetic, so the value is hash-gated.

    Scale shape: the per-customer rollup collapses the fact table
    first; the global rank runs through operators/ranking.
    global_ranked (range-partitioned sort + per-partition offsets
    folded back as literals — never a single-partition window over a
    data-scaled frame); the final Gini is one 1-row aggregate."""
    from dbeam_spark.operators.ranking import global_ranked

    ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked, _n = global_ranked(
        spend, [F.col("cents"), F.col("o_custkey")], rank_col="rk"
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(F.col("rk") * F.col("cents")).cast("long").alias("weighted"),
    )
    # exact integer Gini on the driver (3 scalars; HUGEINT-equivalent
    # via python ints — 2·weighted can exceed int64 only far beyond
    # any earthly order volume, but python ints don't care)
    r = agg.collect()[0]
    n, total, weighted = int(r["n"]), int(r["total"]), int(r["weighted"])
    gini_x1e6 = (2 * weighted - (n + 1) * total) * 1_000_000 // (n * total)
    return spark.createDataFrame(
        [(n, total, gini_x1e6)],
        "n_customers long, total_cents long, gini_x1e6 long",
    )


@register(
    "revenue_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS total
      FROM daily
    ),
    dev AS (
      SELECT day,
             CAST(cents AS HUGEINT)
               - (SELECT total // n FROM stats) AS d,
             LAG(CAST(cents AS HUGEINT)
                 - (SELECT total // n FROM stats)) OVER (
               ORDER BY day) AS d_prev
      FROM daily
    ),
    agg AS (
      SELECT SUM(d * d) AS ss,
             SUM(CASE WHEN d_prev IS NULL THEN 0 ELSE d * d_prev END)
               AS cross_sum
      FROM dev
    )
    SELECT CAST((SELECT n FROM stats) AS BIGINT) AS n_days,
           CAST((SELECT cross_sum * 1000000 // ss FROM agg) AS BIGINT)
             AS autocorr_lag1_x1e6
    """,
)
def revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue — the persistence signal
    behind "does a strong day predict the next" (the same deviation
    series CUSUM peaks over, read as serial correlation; ρ₁ ≈ 0 says
    shuffle-day noise, ρ₁ → 1 says momentum/level shifts). Exact
    integer arithmetic end-to-end: cents, the floor mean, deviation
    PRODUCTS (Σd·d₋₁ and Σd², exact Python/HUGEINT ints — each term
    can pass int64, so the Spark side reduces the calendar-bounded
    daily frame on the driver with big ints), and one floor-quantized
    ratio — hash-gated against the HUGEINT SQL restatement.

    Scale: one map-side-combinable daily rollup collapses the fact
    table; everything after runs over ≤366 rows/year."""
    ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    rows = daily.orderBy("day").collect()  # calendar-bounded frame
    cents = [int(r["cents"]) for r in rows]
    n = len(cents)
    mu = sum(cents) // n
    d = [c - mu for c in cents]
    ss = sum(x * x for x in d)
    cross = sum(d[i] * d[i - 1] for i in range(1, n))
    # TRUNCATING division (like DuckDB's integer `//` on a negative
    # numerator): python's // floors toward −∞ and would come out one
    # lower whenever ρ < 0 — the gotcha in reverse
    num = cross * 1_000_000
    q = abs(num) // ss
    rho = -q if num < 0 else q
    return spark.createDataFrame(
        [(n, rho)],
        "n_days long, autocorr_lag1_x1e6 long",
    )


@register(
    "ks_price_by_priority",
    oracle="""
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g
      FROM orders
    ),
    d AS (
      SELECT v,
             SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS c2
      FROM s GROUP BY v
    ),
    c AS (
      SELECT v,
             SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc1,
             SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc2
      FROM d
    ),
    t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM d)
    SELECT CAST(t.n1 AS BIGINT) AS n1,
           CAST(t.n2 AS BIGINT) AS n2,
           CAST(MAX(ABS(cc1 * t.n2 - cc2 * t.n1)) AS BIGINT) AS d_num,
           -- overflow-staged (see mannwhitney): multiply path while
           -- n1*n2 is far from int64, divide-denominator-first past it
           CAST(CASE WHEN t.n1 * t.n2 <= 9000000000000
                THEN MAX(ABS(cc1 * t.n2 - cc2 * t.n1)) * 1000000
                     // (t.n1 * t.n2)
                ELSE MAX(ABS(cc1 * t.n2 - cc2 * t.n1))
                     // GREATEST(t.n1 * t.n2 // 1000000, 1)
                END AS BIGINT) AS d_x1e6
    FROM c, t
    GROUP BY t.n1, t.n2
    """,
)
def ks_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic: does the order-value
    distribution of urgent/high-priority orders differ from the rest?
    D = max |F₁(x) − F₂(x)| over the pooled sample — the
    distribution-free drift test behind A/B sanity checks and
    data-drift monitors. Everything is exact integer math: values are
    cents, the ECDF difference is compared via the cross-multiplied
    numerator |cc1·n2 − cc2·n1| (no division until the final reported
    quantization), so the statistic hash-matches the SQL restatement
    bit-for-bit.

    Scale shape: one map-side-combinable groupBy collapses the fact
    table to distinct values with per-group counts; the ECDF prefix
    sums run through operators.ranking.global_cumsum (range-partition
    + per-partition windows + carry fold — NO single-partition global
    window), and the max reduces combinably. The int64 headroom note:
    cc·n products need n1·n2·1e6 < 2^63, i.e. both samples under ~3B
    rows at the 1e-6 quantization — past that, drop to 1e4
    quantization or pre-bin values."""
    from dbeam_spark.operators.ranking import global_cumsum

    orders = _t(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("v"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("g"),
    )
    d = s.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c2"),
    )
    c = global_cumsum(d, [F.col("v").asc()], ["c1", "c2"])
    totals = d.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    num = F.abs(
        F.col("_cum_c1") * F.col("n1_n2")[1]
        - F.col("_cum_c2") * F.col("n1_n2")[0]
    )
    return (
        c.crossJoin(
            F.broadcast(
                totals.select(
                    F.array("n1", "n2").alias("n1_n2"), "n1", "n2"
                )
            )
        )
        .groupBy("n1", "n2")
        .agg(F.max(num).cast("long").alias("d_num"))
        .select(
            "n1",
            "n2",
            "d_num",
            # integer DIV, not float /: d_num*1e6 can pass 2^53 where
            # double division rounds but DuckDB's // stays exact;
            # overflow-staged past ~9e12 pair products
            F.expr(
                "CASE WHEN n1 * n2 <= 9000000000000 THEN "
                "d_num * 1000000 DIV (n1 * n2) ELSE "
                "d_num DIV GREATEST(n1 * n2 DIV 1000000, 1) END"
            )
            .cast("long")
            .alias("d_x1e6"),
        )
    )


@register(
    "mannwhitney_price_returns",
    oracle="""
    WITH s AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
      FROM lineitem
    ),
    d AS (
      SELECT v,
             SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS c2,
             COUNT(*) AS c
      FROM s GROUP BY v
    ),
    c AS (
      SELECT v, c1, c,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc
      FROM d
    ),
    t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM d),
    r AS (
      -- 2*average tie rank of value v = (start + end) = 2*cc - c + 1
      SELECT SUM(c1 * (2 * cc - c + 1)) AS r1_x2 FROM c
    )
    SELECT CAST(t.n1 AS BIGINT) AS n1,
           CAST(t.n2 AS BIGINT) AS n2,
           CAST(r.r1_x2 - t.n1 * (t.n1 + 1) AS BIGINT) AS u1_x2,
           -- u1*1e6 overflows int64 once 2*n1*n2 passes ~9e12 (the
           -- 10x probe ran with ~20% headroom): multiply path below
           -- the threshold, divide-the-denominator-first above
           CAST(CASE WHEN 2 * t.n1 * t.n2 <= 9000000000000
                THEN (r.r1_x2 - t.n1 * (t.n1 + 1)) * 1000000
                     // (2 * t.n1 * t.n2)
                ELSE (r.r1_x2 - t.n1 * (t.n1 + 1))
                     // GREATEST(2 * t.n1 * t.n2 // 1000000, 1)
                END AS BIGINT) AS auc_x1e6
    FROM t, r
    """,
)
def mannwhitney_price_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between returned and kept
    lineitem prices — the non-parametric "is one distribution
    stochastically larger" companion to the KS drift test, with the
    effect size reported as AUC = U/(n1·n2) (the probability a random
    returned item outprices a random kept one). Tie handling is the
    textbook average rank, kept integral by working in DOUBLED ranks:
    2·avg_rank(v) = 2·cum_count(v) − count(v) + 1, so U is exact
    integer end-to-end and the whole report hash-matches SQL.

    Scale shape identical to ks_price_by_priority: one combinable
    groupBy to distinct values, ECDF prefix sums via
    operators.ranking.global_cumsum (no single-partition window), one
    combinable rollup. Headroom: 2·R1 < 2·n², so int64 holds to
    n ≈ 2B rows; past that pre-bin values."""
    from dbeam_spark.operators.ranking import global_cumsum

    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
    )
    d = s.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c2"),
        F.count(F.lit(1)).alias("c"),
    )
    cum = global_cumsum(d, [F.col("v").asc()], ["c"])
    r1 = cum.agg(
        F.sum(
            F.col("c1") * (2 * F.col("_cum_c") - F.col("c") + 1)
        ).cast("long").alias("r1_x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    return r1.select(
        "n1",
        "n2",
        (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1))
        .cast("long")
        .alias("u1_x2"),
        # overflow-staged division, mirroring the oracle CASE
        F.expr(
            "CASE WHEN 2 * n1 * n2 <= 9000000000000 THEN "
            "(r1_x2 - n1 * (n1 + 1)) * 1000000 DIV (2 * n1 * n2) "
            "ELSE (r1_x2 - n1 * (n1 + 1)) "
            "DIV GREATEST(2 * n1 * n2 DIV 1000000, 1) END"
        )
        .cast("long")
        .alias("auc_x1e6"),
    )


@register(
    "window_suite_orders",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n,
             ROW_NUMBER() OVER w AS rk,
             LAG(o_orderkey) OVER w AS prev_order,
             LEAD(o_orderkey) OVER w AS next_order,
             FIRST_VALUE(o_orderkey) OVER w AS first_order,
             LAST_VALUE(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS last_order,
             NTH_VALUE(o_orderkey, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS second_order,
             CAST(NTILE(4) OVER w AS BIGINT) AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, prev_order, next_order,
           first_order, last_order, second_order, quartile,
           CAST((rk - 1) * 1000000 // GREATEST(n - 1, 1) AS BIGINT)
             AS pctrank_x1e6,
           CAST(rk * 1000000 // n AS BIGINT) AS cume_x1e6
    FROM base
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window-function surface in one partitioned pass:
    lag/lead neighbors, first/last/nth order per customer, ntile
    quartile, percent_rank and cume_dist — the full ANSI analytic
    toolkit a reference user expects, demonstrated over a UNIQUE
    per-customer total order (date + key tie-break) so every value is
    deterministic. percent_rank/cume_dist are re-derived from the
    exact integer rank ((rk−1)·1e6 DIV (n−1), rk·1e6 DIV n) instead
    of the engines' float implementations — integer-exact, engine-
    portable (the CLAUDE.md ROUND-on-division gotcha avoided at the
    root). ONE shuffle on o_custkey feeds every function; all frames
    are per-customer (bounded), no global window anywhere."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    wf = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1))
        .over(Window.partitionBy("o_custkey"))
        .alias("n"),
        F.row_number().over(w).alias("rk"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wf).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        "prev_order",
        "next_order",
        "first_order",
        "last_order",
        "second_order",
        "quartile",
        F.expr("(rk - 1) * 1000000 DIV GREATEST(n - 1, 1)")
        .cast("long")
        .alias("pctrank_x1e6"),
        F.expr("rk * 1000000 DIV n").cast("long").alias("cume_x1e6"),
    )
    # no terminal sort: the gate's hash is order-insensitive, and a
    # global range sort of the 15M-row (at 100x) ladder output was a
    # full extra exchange + the range-sampling re-evaluation
    # (guide §2.4: "an orderBy used only to make output deterministic")


@register(
    "weighted_median_price",
    oracle="""
    WITH d AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT v, w,
             SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw
      FROM d
    ),
    t AS (SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM d)
    SELECT t.total_w,
           CAST(MIN(CASE WHEN c.cw * 2 >= t.total_w THEN c.v END)
                AS BIGINT) AS median_cents
    FROM c, t GROUP BY t.total_w
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price — "the price the median
    SHIPPED UNIT carried", which diverges from the row median whenever
    cheap items ship in bulk (the inventory-pricing statistic plain
    percentile() cannot express; neither engine has a weighted
    quantile builtin). Definition: smallest value whose cumulative
    weight reaches half the total, compared as cw·2 ≥ total so
    half-integers never materialize — exact integer math end-to-end.

    Scale shape: one combinable groupBy to distinct price points
    (weights pre-summed map-side), cumulative weights via
    operators.ranking.global_cumsum (range-partitioned, no global
    window), and the selection is a combinable conditional MIN. The
    same frame yields any weighted quantile by changing the ×2
    comparison."""
    from dbeam_spark.operators.ranking import global_cumsum

    li = _t(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
    ).agg(
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("w")
    )
    c = global_cumsum(d, [F.col("v").asc()], ["w"])
    return (
        c.crossJoin(
            F.broadcast(
                d.agg(F.sum("w").cast("long").alias("total_w"))
            )
        )
        .groupBy("total_w")
        .agg(
            F.min(
                F.when(
                    F.col("_cum_w") * 2 >= F.col("total_w"), F.col("v")
                )
            )
            .cast("long")
            .alias("median_cents")
        )
    )


@register(
    "lorenz_deciles_customers",
    oracle="""
    WITH pc AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    dec AS (
      SELECT cents,
             CAST(NTILE(10) OVER (ORDER BY cents, o_custkey)
                  AS BIGINT) AS decile
      FROM pc
    ),
    g AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM dec GROUP BY 1
    )
    SELECT decile, n_customers, cents,
           -- cum*1e6 overflows int64 once corpus cents pass ~9e12
           -- (the 10x probe caught this in ANSI mode): multiply path
           -- below the threshold (full 1e-6 precision), divide-the-
           -- total-first above it (still exact to ~1e-6 there since
           -- tot//1e6 > 9e6)
           CAST(CASE WHEN (SELECT SUM(cents) FROM g) <= 9000000000000
                THEN SUM(cents) OVER w * 1000000
                     // (SELECT SUM(cents) FROM g)
                ELSE SUM(cents) OVER w
                     // GREATEST((SELECT SUM(cents) FROM g)
                                 // 1000000, 1)
                END AS BIGINT) AS cum_share_x1e6
    FROM g
    WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    ORDER BY decile
    """,
)
def lorenz_deciles_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lorenz curve of customer spend by decile — the concentration
    table behind the Gini coefficient (customer_gini reports the
    scalar; this shows WHERE the curve bends: 'the top decile carries
    N% of revenue'). Deciles are cut on the exact integer rank from
    operators.ranking.global_ranked over a UNIQUE total order
    (cents, custkey), so bucket edges are engine-exact — no
    interpolated quantiles; shares are ×1e6 integer-quantized floor
    divisions of exact cent sums.

    Scale shape: one combinable per-customer rollup, a
    range-partitioned global rank (no single-task window), a 10-group
    combinable rollup; the final cumulative share runs over the
    10-row decile frame (bounded_grain_window — bounded by the decile
    enum, not the data)."""
    from dbeam_spark.operators.ranking import (
        global_ranked,
        ntile_from_rank,
    )

    orders = _t(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked, n = global_ranked(
        pc, [F.col("cents").asc(), F.col("o_custkey").asc()]
    )
    g = (
        ranked.select(
            ntile_from_rank(F.col("_rank"), n, 10).alias("decile"),
            "cents",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    # cumulative share over the 10-row decile frame — bounded by the
    # decile enum, not the data (WindowExec WARN squelched in session)
    return (
        g.crossJoin(
            F.broadcast(g.agg(F.sum("cents").cast("long").alias("tot")))
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_customers",
            "cents",
            # cum*1e6 overflows int64 past ~9e12 corpus cents (10x
            # probe, ANSI mode): multiply path under the threshold,
            # divide-the-total-first above it
            F.expr(
                "CASE WHEN tot <= 9000000000000 THEN "
                "SUM(cents) OVER (ORDER BY decile "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "* 1000000 DIV tot ELSE "
                "SUM(cents) OVER (ORDER BY decile "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "DIV GREATEST(tot DIV 1000000, 1) END"
            )
            .cast("long")
            .alias("cum_share_x1e6"),
        )
        .orderBy("decile")
    )


@register(
    "bootstrap_median_ci",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    grid AS (
      SELECT b, d.day_us, d.cents,
             ('0x' || substr(md5(b || '-' || d.day_us), 1, 8))::BIGINT
               % 1000000 AS u
      FROM range(0, 100) t(b) CROSS JOIN daily d
    ),
    wtd AS (
      SELECT b, cents,
             CASE WHEN u < 367879 THEN 0
                  WHEN u < 735759 THEN 1
                  WHEN u < 919699 THEN 2
                  WHEN u < 981012 THEN 3
                  ELSE 4 END AS w
      FROM grid
    ),
    cum AS (
      SELECT b, cents, w,
             SUM(w) OVER (PARTITION BY b ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY b) AS tw
      FROM wtd WHERE w > 0
    ),
    med AS (
      SELECT b, MIN(CASE WHEN cw * 2 >= tw THEN cents END) AS m
      FROM cum GROUP BY b
    ),
    ordered AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM med
    ),
    point AS (
      SELECT MIN(CASE WHEN cw * 2 >= tw THEN cents END) AS m FROM (
        SELECT cents,
               SUM(1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                 AS cw,
               COUNT(*) OVER () AS tw
        FROM daily)
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST(100 AS BIGINT) AS n_resamples,
           CAST((SELECT m FROM point) AS BIGINT) AS median_cents,
           CAST(MAX(CASE WHEN rn = 5 THEN m END) AS BIGINT)
             AS ci_lo_cents,
           CAST(MAX(CASE WHEN rn = 95 THEN m END) AS BIGINT)
             AS ci_hi_cents
    FROM ordered
    """,
)
def bootstrap_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 90% confidence interval for the median daily revenue
    — the Poisson bootstrap (each observation enters resample b with
    weight ~ Poisson(1), the at-scale bootstrap used when you cannot
    index into the sample), made fully DETERMINISTIC: weights come
    from md5(b, day) through the exact integer inverse-CDF thresholds
    (367879 / 735759 / 919699 / 981012 ppm, tail capped at 4), so no
    RNG, and every resample is reproducible in both engines.
    Per-resample medians use the weighted-median rule (smallest value
    whose doubled cumulative weight reaches the total); the CI is the
    5th/95th order statistic of the 100 resample medians. Exact
    integer arithmetic end-to-end — a hash-gated bootstrap.

    Scale shape: the fact table collapses through ONE combinable
    daily rollup; the bootstrap grid is B × calendar days (bounded by
    the CALENDAR, not the data — 100 resamples of a 10-year daily
    series is 365k rows at any corpus size), partitioned per resample
    for the cumulative pass. The unpartitioned point-estimate window
    runs over the same calendar-bounded frame."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.unix_micros(F.date_trunc("day", "o_orderdate")).alias("day_us")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    grid = daily.crossJoin(
        spark.range(0, 100).select(F.col("id").alias("b"))
    ).select(
        "b",
        "cents",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "-",
                            F.col("b").cast("string"),
                            F.col("day_us").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1_000_000
        ).alias("u"),
    )
    wtd = grid.select(
        "b",
        "cents",
        F.when(F.col("u") < 367879, 0)
        .when(F.col("u") < 735759, 1)
        .when(F.col("u") < 919699, 2)
        .when(F.col("u") < 981012, 3)
        .otherwise(4)
        .alias("w"),
    ).where(F.col("w") > 0)
    wb = Window.partitionBy("b").orderBy("cents")
    cum = wtd.select(
        "b",
        "cents",
        F.sum("w").over(wb.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(Window.partitionBy("b")).alias("tw"),
    )
    med = cum.groupBy("b").agg(
        F.min(
            F.when(F.col("cw") * 2 >= F.col("tw"), F.col("cents"))
        ).alias("m")
    )
    ordered = med.select(
        "m",
        F.row_number()
        .over(bounded_grain_window(F.col("m").asc()))
        .alias("rn"),
    )
    # point estimate: unweighted median over the calendar-bounded
    # daily frame (same doubled-cum rule, w = 1)
    pcum = daily.select(
        "cents",
        F.sum(F.lit(1))
        .over(
            bounded_grain_window(F.col("cents").asc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cw"),
        F.count(F.lit(1))
        .over(Window.partitionBy(F.lit(0)))
        .alias("tw"),
    )
    point = pcum.agg(
        F.min(
            F.when(F.col("cw") * 2 >= F.col("tw"), F.col("cents"))
        )
        .cast("long")
        .alias("median_cents")
    )
    n_days = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ci = ordered.agg(
        F.max(F.when(F.col("rn") == 5, F.col("m")))
        .cast("long")
        .alias("ci_lo_cents"),
        F.max(F.when(F.col("rn") == 95, F.col("m")))
        .cast("long")
        .alias("ci_hi_cents"),
    )
    return (
        n_days.crossJoin(
            F.broadcast(
                spark.range(1).select(
                    F.lit(100).cast("long").alias("n_resamples")
                )
            )
        )
        .crossJoin(F.broadcast(point))
        .crossJoin(F.broadcast(ci))
        .select(
            "n_days",
            "n_resamples",
            "median_cents",
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )


@register(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT (b.cents - a.cents) * 100
               // date_diff('day', a.day, b.day) AS slope_q,
             CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    g AS (
      SELECT slope_q, CAST(COUNT(*) AS BIGINT) AS c
      FROM pairs GROUP BY 1
    ),
    cum AS (
      SELECT slope_q, c,
             SUM(c) OVER (ORDER BY slope_q ROWS UNBOUNDED PRECEDING)
               AS cw
      FROM g
    ),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_pairs FROM g)
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           t.n_pairs,
           CAST((SELECT SUM(sgn) FROM pairs) AS BIGINT) AS mk_s,
           CAST(MIN(CASE WHEN cw * 2 >= t.n_pairs THEN slope_q END)
                AS BIGINT) AS median_slope_x100
    FROM cum, t GROUP BY t.n_pairs
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope + Mann-Kendall S over daily revenue —
    the standard outlier-resistant trend pair (one monster sales day
    cannot move the median pairwise slope the way it drags OLS in
    brand_trend_slope). Slope per day pair = Δcents/Δdays, quantized
    ×100 with TRUNCATING integer division (Spark DIV and DuckDB //
    both truncate toward zero — the revenue_autocorr sign gotcha);
    the reported slope is the lower median (smallest slope whose
    cumulative pair count doubles past the total, the exact
    weighted_median selection — no interpolation). Mann-Kendall
    S = Σ sign(Δ) is a plain integer sum over the same pairs.

    Scale shape: the fact table collapses through ONE map-side-
    combinable daily rollup; the pairwise frame is CALENDAR-bounded
    (~2.4k days → ~3M pairs regardless of SF — identical at 100 TB),
    built as a broadcast-nested-loop self-join of the tiny daily
    frame, then one combinable slope histogram + a range-partitioned
    cumulative sum (operators.ranking.global_cumsum, no single-task
    global window)."""
    from dbeam_spark.operators.ranking import global_cumsum

    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    a = daily.select(
        F.col("day").alias("day_a"), F.col("cents").alias("c_a")
    )
    b = daily.select(
        F.col("day").alias("day_b"), F.col("cents").alias("c_b")
    )
    # the daily frame lands in ONE post-agg partition (AQE coalesces
    # the tiny shuffle), which would serialize the O(days²) pair
    # comparison onto a single task — spread the probe side first
    # (2.4k-row shuffle, negligible) so the BNLJ fans out across
    # however many cores the session actually has
    pairs = b.repartition(
        b.sparkSession.sparkContext.defaultParallelism
    ).join(
        F.broadcast(a), F.col("day_b") > F.col("day_a")
    ).select(
        F.expr(
            "(c_b - c_a) * 100 DIV datediff(day_b, day_a)"
        ).alias("slope_q"),
        F.when(F.col("c_b") > F.col("c_a"), 1)
        .when(F.col("c_b") < F.col("c_a"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    tot = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("sgn").cast("long").alias("mk_s"),
    )
    g = pairs.groupBy("slope_q").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = global_cumsum(g, [F.col("slope_q").asc()], ["c"])
    med = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_pairs", "mk_s")
        .agg(
            F.min(
                F.when(
                    F.col("_cum_c") * 2 >= F.col("n_pairs"),
                    F.col("slope_q"),
                )
            )
            .cast("long")
            .alias("median_slope_x100")
        )
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return med.crossJoin(F.broadcast(n_days)).select(
        "n_days", "n_pairs", "mk_s", "median_slope_x100"
    )


@register(
    "welch_ttest_priority",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g,
             CAST(ROUND(o_totalprice) AS HUGEINT) AS v
      FROM orders
    ),
    a AS (
      SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(v) AS s, SUM(v * v) AS q
      FROM s GROUP BY g
    ),
    w AS (
      SELECT
        MAX(CASE WHEN g = 1 THEN n END) AS n1,
        MAX(CASE WHEN g = 1 THEN s END) AS s1,
        MAX(CASE WHEN g = 1 THEN q END) AS q1,
        MAX(CASE WHEN g = 0 THEN n END) AS n2,
        MAX(CASE WHEN g = 0 THEN s END) AS s2,
        MAX(CASE WHEN g = 0 THEN q END) AS q2
      FROM a
    )
    SELECT CAST(n1 AS BIGINT) AS n_hi,
           CAST(n2 AS BIGINT) AS n_lo,
           CAST(CASE WHEN s1 * n2 - s2 * n1 >= 0
                THEN (s1 * n2 - s2 * n1) * 100 // (n1 * n2)
                ELSE -((s2 * n1 - s1 * n2) * 100 // (n1 * n2))
                END AS BIGINT) AS mean_diff_x100,
           CAST((s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1) * 100
                * (n1 - 1) * (n2 - 1)
                // ((q1 * n1 - s1 * s1) * n2 * n2 * (n2 - 1)
                    + (q2 * n2 - s2 * s2) * n1 * n1 * (n1 - 1))
                AS BIGINT) AS t2_x100
    FROM w
    """,
)
def welch_ttest_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between urgent-priority and
    other order values — the PARAMETRIC member of the two-sample trio
    (ks_price_by_priority tests the whole distribution, mannwhitney
    the rank order, this the means). Cancelling the (n1n2)² factor
    gives t² = (S1n2−S2n1)²(n1−1)(n2−1) / [(Q1n1−S1²)n2²(n2−1) +
    (Q2n2−S2²)n1²(n1−1)] — a single exact integer ratio over the
    sufficient statistics (n, Σv, Σv²), floor-quantized ×100. Values
    are whole dollars (integer ROUND ties only on exactly-
    representable .5 doubles — the q2 precedent) so Σv² stays in
    int64 past the 100× probe (≤4.5e18); the oracle's HUGEINT
    intermediates bound the gate SFs with ~500× margin.

    Scale shape: the fact table collapses through ONE map-side-
    combinable 2-group rollup; the driver does O(1) big-int algebra
    on the collected 2-row frame (the revenue_autocorr bounded-
    scalar pattern), so there is nothing left to shuffle."""
    ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    a = (
        orders.select(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("g"),
            F.round("o_totalprice").cast("long").alias("v"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
        )
        .collect()
    )
    by_g = {int(r["g"]): (int(r["n"]), int(r["s"]), int(r["q"])) for r in a}
    n1, s1, q1 = by_g[1]
    n2, s2, q2 = by_g[0]
    md_num = s1 * n2 - s2 * n1
    nn = n1 * n2
    # TRUNCATING signed division (DuckDB // truncates toward zero;
    # python // floors — the revenue_autocorr gotcha)
    mq = abs(md_num) * 100 // nn
    mean_diff_x100 = -mq if md_num < 0 else mq
    den = (q1 * n1 - s1 * s1) * n2 * n2 * (n2 - 1) + (
        q2 * n2 - s2 * s2
    ) * n1 * n1 * (n1 - 1)
    t2_x100 = md_num * md_num * 100 * (n1 - 1) * (n2 - 1) // den
    return spark.createDataFrame(
        [(n1, n2, mean_diff_x100, t2_x100)],
        "n_hi long, n_lo long, mean_diff_x100 long, t2_x100 long",
    )


def _lc_sign(p: tuple[int, ...]) -> int:
    s = 1
    q = list(p)
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            if q[i] > q[j]:
                s = -s
    return s


def _det4_terms(repl_col: int | None = None):
    """Permutation expansion of a symmetric 4x4 moment matrix det,
    with column `repl_col` optionally replaced by the v vector
    (Cramer numerators). Returns (sign, [entry-name x4]) terms; the
    SAME structure feeds the SQL oracle text and the Python fold so
    the 24-term algebra can never drift between engines."""
    import itertools

    terms = []
    for p in itertools.permutations(range(4)):
        s = _lc_sign(p)
        names = []
        for row in range(4):
            col = p[row]
            if repl_col is not None and col == repl_col:
                names.append(f"v{row}")
            else:
                a, b = min(row, col), max(row, col)
                names.append(f"m{a}{b}")
        terms.append((s, names))
    return terms


def _det4_sql(repl_col: int | None = None) -> str:
    return " + ".join(
        f"({'' if s > 0 else '-'}{' * '.join(names)})"
        for s, names in _det4_terms(repl_col)
    )


def _det4_eval(vals: dict[str, int], repl_col: int | None = None) -> int:
    tot = 0
    for s, names in _det4_terms(repl_col):
        prod = s
        for n in names:
            prod *= vals[n]
        tot += prod
    return tot


_OLS_COEF_SQL = """
           CAST(CASE WHEN (d{i} < 0) <> (det < 0) THEN -1 ELSE 1 END
                * (CASE WHEN ABS(d{i})
                        <= 160000000000000000000000000000000
                   THEN ABS(d{i}) * 1000000 // ABS(det)
                   ELSE ABS(d{i})
                        // GREATEST(ABS(det) // 1000000, 1) END)
                AS BIGINT) AS {name}
"""


@register(
    "ols_multifeature",
    oracle=f"""
    WITH r AS (
      SELECT CAST(ROUND(l_quantity) AS HUGEINT) AS a,
             CAST(ROUND(l_discount * 100) AS HUGEINT) AS b,
             CAST(ROUND(l_tax * 100) AS HUGEINT) AS c,
             CAST(ROUND(l_extendedprice) AS HUGEINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT COUNT(*)::HUGEINT AS m00,
             SUM(a) AS m01, SUM(b) AS m02, SUM(c) AS m03,
             SUM(a * a) AS m11, SUM(a * b) AS m12, SUM(a * c) AS m13,
             SUM(b * b) AS m22, SUM(b * c) AS m23, SUM(c * c) AS m33,
             SUM(y) AS v0, SUM(a * y) AS v1,
             SUM(b * y) AS v2, SUM(c * y) AS v3
      FROM r
    ),
    d AS (
      SELECT m00 AS n_rows,
             {_det4_sql(None)} AS det,
             {_det4_sql(0)} AS d0,
             {_det4_sql(1)} AS d1,
             {_det4_sql(2)} AS d2,
             {_det4_sql(3)} AS d3
      FROM m
    )
    SELECT CAST(n_rows AS BIGINT) AS n_rows,
           {_OLS_COEF_SQL.format(i=0, name="intercept_x1e6")},
           {_OLS_COEF_SQL.format(i=1, name="coef_qty_x1e6")},
           {_OLS_COEF_SQL.format(i=2, name="coef_disc_x1e6")},
           {_OLS_COEF_SQL.format(i=3, name="coef_tax_x1e6")}
    FROM d
    """,
)
def ols_multifeature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression price ~ quantity + discount + tax,
    solved EXACTLY from one pass of sufficient statistics — the
    distributed closed-form OLS shape (normal equations X'X β = X'y;
    brand_trend_slope is the 1-feature case). The 4×4 system is
    solved by Cramer's rule over the integer moment matrix; the
    24-term permutation expansions are GENERATED (same code emits the
    SQL text and folds the collected moments), so the two engines
    share one algebra by construction. Coefficients are ×1e6
    truncating quantizations with the staged division (lorenz
    pattern, thresholds sized for HUGEINT numerators ~1e33 at gate
    SFs).

    Scale shape: the fact table collapses through ONE map-side-
    combinable 14-moment rollup (ints sized to stay in int64 past
    the 100× probe: dollars × small ints); the solve is O(1) big-int
    work on the collected 1-row frame — nothing shuffles but
    partial sums."""
    ensure_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    r = li.select(
        F.round("l_quantity").cast("long").alias("a"),
        F.round(F.col("l_discount") * 100).cast("long").alias("b"),
        F.round(F.col("l_tax") * 100).cast("long").alias("c"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    mrow = r.agg(
        F.count(F.lit(1)).cast("long").alias("m00"),
        F.sum("a").cast("long").alias("m01"),
        F.sum("b").cast("long").alias("m02"),
        F.sum("c").cast("long").alias("m03"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("m11"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("m12"),
        F.sum(F.col("a") * F.col("c")).cast("long").alias("m13"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("m22"),
        F.sum(F.col("b") * F.col("c")).cast("long").alias("m23"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("m33"),
        F.sum("y").cast("long").alias("v0"),
        F.sum(F.col("a") * F.col("y")).cast("long").alias("v1"),
        F.sum(F.col("b") * F.col("y")).cast("long").alias("v2"),
        F.sum(F.col("c") * F.col("y")).cast("long").alias("v3"),
    ).collect()[0]
    vals = {k: int(mrow[k]) for k in mrow.asDict()}
    det = _det4_eval(vals, None)

    def coef(i: int) -> int:
        d_i = _det4_eval(vals, i)
        neg = (d_i < 0) != (det < 0)
        if abs(d_i) <= 160000000000000000000000000000000:
            q = abs(d_i) * 1000000 // abs(det)
        else:
            q = abs(d_i) // max(abs(det) // 1000000, 1)
        return -q if neg else q

    return spark.createDataFrame(
        [(vals["m00"], coef(0), coef(1), coef(2), coef(3))],
        "n_rows long, intercept_x1e6 long, coef_qty_x1e6 long, "
        "coef_disc_x1e6 long, coef_tax_x1e6 long",
    )


@register(
    "spearman_spend_balance",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c,
             CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS spend_c
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
    ),
    ranked AS (
      SELECT c_nationkey,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
               ORDER BY bal_c, c_custkey) AS rx,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
               ORDER BY spend_c, c_custkey) AS ry
      FROM spend
    ),
    s AS (
      SELECT c_nationkey,
             COUNT(*) AS n,
             CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
      FROM ranked GROUP BY c_nationkey
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(n AS BIGINT) AS n_customers,
           sum_d2,
           CAST(1000000 - 6000000 * sum_d2 // (n * (n * n - 1))
                AS BIGINT) AS rho_x1e6
    FROM s WHERE n >= 3 ORDER BY nationkey
    """,
)
def spearman_spend_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance
    and their total spend, per nation — the robust (outlier-immune)
    complement of stats_correlation's Pearson. Ranks are ROW_NUMBER
    permutations with c_custkey tie-breaks, so both engines hold the
    IDENTICAL permutation and ρ = 1 − 6Σd²/(n(n²−1)) evaluates in
    exact integer arithmetic (×1e6, truncated identically).

    Shape: one customer⋈orders rollup (combinable), two ranking
    windows on the SAME nation partitioning (one exchange), one
    per-nation reduce. n(n²−1) stays under int64 to ~2M customers
    per nation ×1e6 scale; restage the quotient before that."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("spend_c")
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
            "spend_c",
        )
    )
    wx = Window.partitionBy("c_nationkey").orderBy("bal_c", "c_custkey")
    wy = Window.partitionBy("c_nationkey").orderBy("spend_c", "c_custkey")
    ranked = spend.select(
        "c_nationkey",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    d = F.col("rx") - F.col("ry")
    s = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d * d).cast("long").alias("sum_d2"),
    )
    return (
        s.filter(F.col("n") >= 3)
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("n").cast("long").alias("n_customers"),
            "sum_d2",
            F.expr(
                "CAST(1000000 - 6000000 * sum_d2"
                " DIV (n * (n * n - 1)) AS LONG)"
            ).alias("rho_x1e6"),
        )
        .orderBy("nationkey")
    )
