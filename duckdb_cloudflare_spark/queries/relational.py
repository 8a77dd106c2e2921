"""Layer-B relational surface (SURVEY.md §2A/§2B).

The reference delivers the classic relational operators through DuckDB core
(joins, aggregation, windows, sorts, set ops, scalar functions — see SURVEY §2
"layer B", evidence at reference README.md:156-176, docs/INTERNET_ARCHIVE.md:203-223).
This module declares that surface as Spark DataFrame plans, each paired with a
DuckDB oracle.

Conventions:
- Float aggregates rounded to 4 decimals on both sides (double summation order
  differs between engines; 4 dp is far above the ~1e-7 relative error at sf0.01).
- Every output column aliased identically on both sides (driver sorts columns
  by name before hashing).
- Deterministic LIMIT/OFFSET/top-k: always totally ordered via a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from duckdb_cloudflare_spark.queries import load, register

# ---------------------------------------------------------------------------
# Aggregation over a filtered scan (TPC-H Q1 shape) — the flagship query.
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="filter → groupBy → multi-agg (TPC-H Q1 shape)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Predicate catalogue: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL, CASE.
# Mirrors the reference's pushdown predicate shapes (SURVEY §2A) applied to
# local data — Catalyst pushes these into the parquet scan.
# ---------------------------------------------------------------------------


@register(
    "q02_predicate_filters",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size,
           CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class
    FROM part
    WHERE (p_type IN ('ECONOMY', 'PROMO') OR p_brand = 'Brand#13')
      AND p_size BETWEEN 5 AND 40
      AND p_name LIKE '%widget%'
      AND NOT (p_retailprice IS NULL)
      AND p_name NOT LIKE 'cold%'
    """,
    description="WHERE with AND/OR/NOT, IN, BETWEEN, LIKE, NOT LIKE, IS NULL, CASE",
)
def q02_predicate_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.filter(
            (F.col("p_type").isin("ECONOMY", "PROMO") | (F.col("p_brand") == "Brand#13"))
            & F.col("p_size").between(5, 40)
            & F.col("p_name").like("%widget%")
            & F.col("p_retailprice").isNotNull()
            & ~F.col("p_name").like("cold%")
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_size",
            F.when(F.col("p_size") < 10, "small")
            .when(F.col("p_size") < 30, "medium")
            .otherwise("large")
            .alias("size_class"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (inner multi-way, left, right, full outer, semi, anti, cross, theta).
# ---------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="3-way inner join → group → deterministic top-k (TPC-H Q3 shape)",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    # Broadcast the BUILDING-segment customer slice (a dim-sized fraction of
    # customers) into orders, project the join down to (o_orderkey,
    # o_orderdate), and broadcast THAT into lineitem: lineitem — the big
    # side — is never shuffled and never hash-table-built (AQE left alone
    # picks lineitem as the build side here, a 12x-larger hashed relation).
    # The o⋈c slice is a doubly-filtered 2-column relation; at a scale where
    # it outgrows broadcast, drop the outer hint and AQE falls back to a
    # shuffle join with the same join order (classic TPC-H Q3).
    oc = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(broadcast(oc), li.l_orderkey == oc.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    description="EXISTS → left-semi join, count by group (TPC-H Q4 shape)",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return o.join(li, cond, "left_semi").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    description="6-way join with broadcast dims, group by nation (TPC-H Q5 shape)",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="pure filter + global agg, no grouping (TPC-H Q6 shape)",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q07_left_join_nulls",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)                       AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 4) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    """,
    description="left outer join with join-side filter, COUNT(col) null semantics, COALESCE",
)
def q07_left_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spend"),
        )
    )


@register(
    "q08_full_outer_join",
    oracle="""
    WITH cust_nations AS (
        SELECT c_nationkey AS nationkey, count(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    supp_nations AS (
        SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM cust_nations c FULL OUTER JOIN supp_nations s ON c.nationkey = s.nationkey
    """,
    description="full outer join of two aggregates with COALESCE on both sides",
)
def q08_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, cust.nationkey == supp.nationkey, "full_outer")
        .select(
            F.coalesce(cust.nationkey, supp.nationkey).alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="NOT EXISTS → left-anti join",
)
def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q10_cross_join",
    oracle="""
    SELECT r_name, seg.c_mktsegment AS mktsegment
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
    description="cross join of two small relations",
)
def q10_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    seg = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("mktsegment")
    ).distinct()
    return r.crossJoin(seg)


@register(
    "q11_theta_join",
    oracle="""
    SELECT s1.s_suppkey AS suppkey_lo, s2.s_suppkey AS suppkey_hi
    FROM supplier s1 JOIN supplier s2
      ON s1.s_acctbal > s2.s_acctbal AND s1.s_nationkey = s2.s_nationkey
    """,
    description="non-equi (theta) self-join banded by an equi key",
)
def q11_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = load(spark, sf_dir, "supplier").alias("s1")
    s2 = load(spark, sf_dir, "supplier").alias("s2")
    cond = (F.col("s1.s_acctbal") > F.col("s2.s_acctbal")) & (
        F.col("s1.s_nationkey") == F.col("s2.s_nationkey")
    )
    return s1.join(s2, cond).select(
        F.col("s1.s_suppkey").alias("suppkey_lo"), F.col("s2.s_suppkey").alias("suppkey_hi")
    )


# ---------------------------------------------------------------------------
# Aggregation variants: HAVING, DISTINCT aggs, ROLLUP / CUBE / GROUPING SETS.
# ---------------------------------------------------------------------------


@register(
    "q12_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 5 AND sum(o_totalprice) > 100000
    """,
    description="GROUP BY + HAVING on two aggregates",
)
def q12_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_spend_raw"),
        )
        .filter((F.col("n_orders") > 5) & (F.col("_spend_raw") > 100000))
        .select("o_custkey", "n_orders", F.round("_spend_raw", 4).alias("spend"))
    )


@register(
    "q13_distinct_aggs",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey)  AS n_orders,
           count(DISTINCT l_partkey)   AS n_parts,
           count(*)                    AS n_rows,
           round(sum(DISTINCT l_quantity), 4) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="multiple COUNT(DISTINCT) + SUM(DISTINCT) in one aggregation",
)
def q13_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum_distinct(F.col("l_quantity")), 4).alias("sum_distinct_qty"),
    )


@register(
    "q14_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="GROUP BY ROLLUP with subtotal + grand-total rows",
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@register(
    "q15_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="GROUP BY CUBE over two dimensions",
)
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "q16_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    description="explicit GROUPING SETS",
)
def q16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q16_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM q16_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Set operations and DISTINCT.
# ---------------------------------------------------------------------------


@register(
    "q17_union_all",
    oracle="""
    SELECT k, src FROM (
        SELECT o_custkey AS k, 'orders' AS src FROM orders WHERE o_totalprice > 50000
        UNION ALL
        SELECT c_custkey AS k, 'customer' AS src FROM customer WHERE c_acctbal > 5000
    )
    """,
    description="UNION ALL of two differently-sourced relations",
)
def q17_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 50000)
        .select(F.col("o_custkey").alias("k"), F.lit("orders").alias("src"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"), F.lit("customer").alias("src"))
    )
    return o.unionAll(c)


@register(
    "q18_union_distinct",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000
    UNION
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    """,
    description="UNION (distinct)",
)
def q18_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 50000)
        .select(F.col("o_custkey").alias("k"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    return o.union(c).distinct()


@register(
    "q19_intersect",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    """,
    description="INTERSECT (distinct) of two filtered scans",
)
def q19_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@register(
    "q20_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
    description="EXCEPT (distinct)",
)
def q20_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.exceptAll(o).distinct()


@register(
    "q21_distinct_on",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_name, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn = 1
    """,
    description="deterministic DISTINCT ON(k): top row per key via row_number "
    "(the reference pushes DISTINCT ON into CDX collapse=; SURVEY §4.1)",
)
def q21_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Sort / limit / offset.
# ---------------------------------------------------------------------------


@register(
    "q22_sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
    description="multi-key ORDER BY + LIMIT + OFFSET, deterministic via unique key",
)
def q22_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Scalar functions: string / date / JSON / math / conditional.
# The reference's scalar surface is SURVEY §2B (substr, octet_length, LIKE
# specializations, year/month, JSON key extraction, struct/map access).
# ---------------------------------------------------------------------------


@register(
    "q23_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           lower(p_brand)                                  AS brand_lower,
           substr(p_name, 1, 5)                            AS name_prefix,
           length(p_name)                                  AS name_len,
           strlen(p_name)                                  AS name_bytes,
           concat(p_brand, ':', p_type)                    AS brand_type,
           replace(p_name, ' ', '_')                       AS name_snake,
           CAST(starts_with(p_name, 'small') AS BOOLEAN)   AS is_small,
           CAST(p_name LIKE '%bolt' AS BOOLEAN)            AS is_bolt,
           CAST(contains(p_name, 'id') AS BOOLEAN)         AS has_id,
           CAST(regexp_matches(p_name, '^[a-z]+ (widget|bolt)$') AS BOOLEAN) AS re_match,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2)  AS second_word,
           trim(concat('  ', p_name, '  '))                AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           split_part(p_name, ' ', 1)                      AS first_word,
           reverse(p_brand)                                AS brand_rev
    FROM part
    """,
    description="string function catalogue: case, substr, length/octet_length, concat, "
    "replace, prefix/suffix/contains, regexp match/extract, trim, pad, split, reverse",
)
def q23_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.octet_length("p_name").alias("name_bytes"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_name").endswith("bolt").alias("is_bolt"),
        F.col("p_name").contains("id").alias("has_id"),
        F.col("p_name").rlike("^[a-z]+ (widget|bolt)$").alias("re_match"),
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@register(
    "q24_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)      AS order_year,
           CAST(month(o_orderdate) AS INTEGER)     AS order_month,
           CAST(day(o_orderdate) AS INTEGER)       AS order_day,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS order_dow,
           CAST(quarter(o_orderdate) AS INTEGER)   AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE)               AS order_date,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS date_str
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
    """,
    description="date/time extraction, truncation, arithmetic, formatting, casts",
)
def q24_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → subtract 1.
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
    )


@register(
    "q25_json_extract",
    oracle="""
    WITH j AS (
        SELECT event_id, event_type,
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS ks
        FROM events
    )
    SELECT event_id, event_type,
           TRY_CAST(CASE WHEN regexp_matches(ks, '^-?[0-9]+$') THEN ks END
                    AS BIGINT) AS k_value
    FROM j WHERE ks IS NOT NULL
    """,
    description="JSON key extraction from a string column "
    "(reference ExtractJSONValue, web_archive_utils.cpp:160-177)",
)
def q25_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    # integral-string guard, not a bare cast: ANSI cast throws on
    # non-numeric $.k (dirty-parity find) and DuckDB TRY_CAST ROUNDS
    # decimals where Spark's yields NULL (review find) — so k_value is
    # defined for integral JSON numbers only, NULL otherwise, in BOTH
    # engines. try_cast/TRY_CAST behind the regex (ADVICE r10): the guard
    # admits integral strings that overflow int64 (a 20-digit $.k), where
    # a plain CAST throws AT RUNTIME in both engines; try_cast turns
    # dirty-but-plausible JSON into NULL instead of a crash, and the regex
    # has already ruled out the decimal-rounding divergence TRY_CAST alone
    # would reintroduce.
    kv = F.when(k.rlike(r"^-?[0-9]+$"), k).try_cast("bigint")
    return e.filter(k.isNotNull()).select(
        "event_id", "event_type", kv.alias("k_value")
    )


@register(
    "q26_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 1000.0), 4)       AS abs_diff,
           CAST(ceil(l_quantity) AS BIGINT)              AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
           round(sqrt(l_extendedprice), 4)               AS price_sqrt,
           round(ln(l_extendedprice + 1), 4)             AS price_ln,
           round(log10(l_extendedprice + 1), 4)          AS price_log10,
           round(power(l_discount, 2), 4)                AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT)                AS key_mod,
           round(greatest(l_discount, l_tax), 4)         AS max_rate,
           round(least(l_discount, l_tax), 4)            AS min_rate,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    description="math scalar catalogue: abs/ceil/floor/sqrt/ln/log10/power/mod/greatest/least/sign",
)
def q26_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 4).alias("abs_diff"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 4).alias("price_log10"),
        F.round(F.pow("l_discount", F.lit(2)), 4).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 30000).alias("price_sign"),
    )


@register(
    "q27_struct_map_access",
    oracle="""
    SELECT event_id,
           event_type AS meta_type,
           round(value, 4) AS meta_value,
           CASE WHEN event_type IN ('click','view') THEN 'engagement' ELSE 'other' END AS kind
    FROM events
    WHERE event_id % 10 = 0
    """,
    description="struct construction + field access + map subscript with NULL-on-missing "
    "(reference headers['Content-Type'] semantics, common_crawl_errors.test:47-51)",
)
def q27_struct_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    # Build a struct and a map mid-plan, then access fields/keys — output scalars so
    # the oracle compares values, not nested-type encodings.
    structured = e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("type"), F.col("value").alias("value")
        ).alias("meta"),
        F.create_map(
            F.lit("click"), F.lit("engagement"), F.lit("view"), F.lit("engagement")
        ).alias("kind_map"),
    )
    return structured.select(
        "event_id",
        F.col("meta.type").alias("meta_type"),
        F.round(F.col("meta.value"), 4).alias("meta_value"),
        F.coalesce(F.col("kind_map")[F.col("meta.type")], F.lit("other")).alias("kind"),
    )


@register(
    "q28_time_bucket",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY bucket_start, event_type
    """,
    description="tumbling time-window aggregation (F.window ≡ time_bucket)",
)
def q28_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q29_subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
    description="scalar subquery in WHERE",
)
def q29_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    c.createOrReplaceTempView("q29_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
        FROM q29_customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM q29_customer)
        """
    )


@register(
    "q30_correlated_subquery",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    description="correlated scalar subquery (decorrelated by Catalyst into an aggregate join)",
)
def q30_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("q30_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
        FROM q30_orders o
        WHERE o_totalprice > (
            SELECT 2 * avg(o2.o_totalprice) FROM q30_orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "q31_approx_distinct",
    # PERMANENTLY rows-only (r6 experiment, verdict item 6): at sf0.01 with
    # rsd=0.01 Spark's HLL++ and DuckDB's approx_count_distinct return
    # DIFFERENT estimates for the same input (e.g. l_partkey per returnflag:
    # Spark 2013 vs DuckDB 1991, exact 2000) — the sketches hash with
    # different functions, so no deterministic cross-engine oracle exists.
    # pytest pins <2% error vs exact on both engines instead.
    # The FAMILY gap is closed by p79_hll_source_distinct (r8): a
    # deterministic md5-hashed HyperLogLog whose register fold is an exact
    # integer sum, giving the distinct-count sketch an exact oracle —
    # this entry stays to cover the ENGINE-NATIVE function's surface.
    oracle=None,
    description="approx_count_distinct (HyperLogLog++) per group — the cardinality "
    "sketch that replaces COUNT(DISTINCT)'s full shuffle at 100 TB (partial sketches "
    "merge map-side; state is KB per group instead of the distinct-key set)",
)
def q31_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )


@register(
    "q32_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05)            AS n_discounted,
           round(sum(l_extendedprice) FILTER (WHERE l_tax > 0.04), 4) AS taxed_price,
           round(avg(CASE WHEN l_quantity > 25 THEN l_extendedprice END), 4) AS avg_bulk_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="conditional aggregation: FILTER clauses / CASE-gated aggregates "
    "(one pass, no self-joins)",
)
def q32_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 4
        ).alias("taxed_price"),
        F.round(
            F.avg(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 4
        ).alias("avg_bulk_price"),
    )


@register(
    "q33_string_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    description="ordered string aggregation (string_agg / listagg ... within group)",
)
def q33_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = n.join(r, n.n_regionkey == r.r_regionkey)
    # deterministic ordered concat: collect -> sort -> join (listagg's
    # WITHIN GROUP ordering, expressed with array functions)
    return joined.groupBy("r_name").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "q34_pivot",
    oracle="""
    SELECT o_orderpriority,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 4) AS status_f,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 4) AS status_o,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 4) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="pivot: groupBy().pivot() over order status (oracle expresses the "
    "same contract as portable CASE aggregation)",
)
def q34_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4))
    )
    return (
        pivoted.withColumnRenamed("F", "status_f")
        .withColumnRenamed("O", "status_o")
        .withColumnRenamed("P", "status_p")
        .na.fill(0.0, ["status_f", "status_o", "status_p"])
    )


@register(
    "q35_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS q1_qty,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity), 4) AS median_qty,
           round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_price,
           round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity), 4) AS med_disc_qty,
           round(median(l_discount), 4) AS med_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="exact ordered-set aggregates: percentile_cont (interpolated), "
    "percentile_disc, median — WITHIN GROUP syntax on both engines; Spark "
    "computes these with a sort-based aggregate (one shuffle, partial sort)",
)
def q35_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q35_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS q1_qty,
               round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity), 4) AS median_qty,
               round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_price,
               round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity), 4) AS med_disc_qty,
               round(median(l_discount), 4) AS med_discount
        FROM q35_lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "q37_regex_functions",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           regexp_extract(text, '([0-9]+)', 1) AS first_number,
           length(regexp_replace(text, '[aeiouAEIOU]', '', 'g')) AS len_no_vowels,
           CAST(regexp_matches(text, '[.!?]\z') AS INT) AS ends_sentence
    FROM documents
    """,
    description="regular-expression scalar functions: regexp_extract (group, "
    "'' on no-match in both engines), global regexp_replace (DuckDB needs the "
    "'g' flag, Spark replaces all by default), boolean regex match",
)
def q37_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_extract("text", r"([0-9]+)", 1).alias("first_number"),
        F.length(F.regexp_replace("text", r"[aeiouAEIOU]", "")).alias("len_no_vowels"),
        F.col("text").rlike(r"[.!?]\z").cast("int").alias("ends_sentence"),
    )


@register(
    "q51_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'click'    THEN ts END) AS first_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, first_click, first_purchase,
           CASE WHEN first_click IS NOT NULL AND first_purchase IS NOT NULL
                     AND first_purchase >= first_click
                THEN 1 ELSE 0 END AS converted,
           CASE WHEN first_click IS NOT NULL AND first_purchase IS NOT NULL
                     AND first_purchase >= first_click
                THEN (epoch_us(first_purchase) - epoch_us(first_click)) // 1000000
                END AS secs_to_convert
    FROM firsts
    """,
    description="funnel analysis: per-user first click vs first purchase, "
    "conversion flag, whole-second time-to-convert (floor of the microsecond "
    "delta on both engines) — one shuffle with map-side partial min",
)
def q51_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = (
        F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_click"))
    )
    delta = (
        F.unix_micros("first_purchase") - F.unix_micros("first_click")
    ) / F.lit(1_000_000)
    return firsts.select(
        "user_id",
        "first_click",
        "first_purchase",
        converted.cast("int").alias("converted"),
        F.when(converted, F.floor(delta)).alias("secs_to_convert"),
    )


@register(
    "q36_qualify_dialect",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY acctbal DESC, c_custkey) <= 3
    """,
    description="DuckDB QUALIFY clause routed through the duck_sql dialect "
    "layer (compat.rewrite_qualify) as a first-class engine query — the "
    "oracle runs the identical statement natively; the Spark side rewrites "
    "QUALIFY into a ranked subquery. Top-3-per-group also exercises the "
    "WindowGroupLimit partial top-N pushdown.",
)
def q36_qualify_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_cloudflare_spark.compat import duck_sql

    # Internal view name: registering plain "customer" would clobber any
    # user-registered temp view of that name as a query side effect (ADVICE r3).
    load(spark, sf_dir, "customer").createOrReplaceTempView("__q36_customer")
    return duck_sql(
        spark,
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal
        FROM __q36_customer
        QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY acctbal DESC, c_custkey) <= 3
        """,
    )


@register(
    "q38_boolean_aggs",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_orderstatus = 'F')    AS any_final,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="boolean/conditional aggregates: bool_and, bool_or, count_if "
    "— single-shuffle partial-aggregated group by. The oracle casts count_if "
    "to BIGINT: DuckDB's count_if returns HUGEINT, which pandas renders as "
    "float64 (2129.0 vs Spark's int64 2129) and fails the driver's "
    "dtype-sensitive value hash (r5 driver red, values identical).",
)
def q38_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
    )


@register(
    "q39_stat_aggs",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 4)                      AS med_qty,
           round(stddev_samp(l_extendedprice), 4)            AS sd_price,
           round(var_samp(l_discount), 6)                    AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="statistical aggregates: median (exact), sample stddev/variance, "
    "correlation, sample covariance — one partial-aggregated shuffle; exact "
    "median is the one holistic aggregate (needs the group's values), which "
    "at 100 TB degrades to approx_percentile or a two-pass count+nth-element",
)
def q39_stat_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@register(
    "q52_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)       AS order_month,
           date_diff('day', o_orderdate, TIMESTAMP '1998-01-01')     AS days_to_ref,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)               AS dow,
           o_orderdate + INTERVAL 3 MONTH                            AS plus_3m
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    description="date/interval arithmetic: month truncation, signed day "
    "difference to a reference date, day-of-week (normalized to Spark's "
    "1=Sunday convention), +3 months with end-of-month clamping — all "
    "map-only codegen expressions",
)
def q52_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    ref = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.datediff(F.to_date(ref), F.to_date("o_orderdate")).cast("long").alias("days_to_ref"),
        F.dayofweek("o_orderdate").alias("dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
    )


@register(
    "q53_array_aggregation",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
           CAST(len(list(l_linenumber)) AS INTEGER)    AS n_lines,
           list_contains(list(l_linenumber), 1)        AS has_first_line,
           round(list_aggregate(list(l_quantity), 'sum'), 4) AS qty_sum
    FROM lineitem
    WHERE l_orderkey % 101 = 0
    GROUP BY l_orderkey
    """,
    description="array aggregation: per-order sorted line-number arrays, "
    "membership test, and an array-fold sum — collect_list/sort_array/"
    "array_contains/aggregate, one partial-aggregated shuffle. The sorted "
    "array is emitted as a ','-joined string: raw list columns are "
    "unhashable in the driver's pandas canonicalizer (r5 driver error — "
    "`sort_values` → `unhashable type: 'list'` — despite value-identical "
    "results), so windowed outputs must be scalar-only.",
)
def q53_array_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    sorted_lines = F.sort_array(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(sorted_lines, lambda x: x.cast("string")), ","
        ).alias("line_numbers"),
        F.size(F.collect_list("l_linenumber")).alias("n_lines"),
        F.array_contains(F.collect_list("l_linenumber"), 1).alias("has_first_line"),
        F.round(
            F.aggregate(
                F.collect_list("l_quantity"), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("qty_sum"),
    )


@register(
    "q54_recursive_cte",
    oracle="""
    WITH RECURSIVE bounds AS (
        SELECT date_trunc('month', min(o_orderdate)) AS lo,
               date_trunc('month', max(o_orderdate)) AS hi
        FROM orders
    ), spine(m) AS (
        SELECT lo FROM bounds WHERE lo IS NOT NULL
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM spine, bounds WHERE m < hi
    ), cnt AS (
        SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT CAST(spine.m AS DATE) AS month,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(revenue, 0.0) AS revenue
    FROM spine LEFT JOIN cnt ON cnt.m = spine.m
    """,
    description="recursive CTE (Spark 4's WITH RECURSIVE — new engine "
    "surface): a month calendar spine generated recursively from the order "
    "date bounds, left-joined to per-month counts so EMPTY months appear "
    "as zero rows — the gaps-aware time series every reporting layer "
    "needs. The recursion depth is the month span (tiny and bounded); the "
    "corpus-side aggregate is one partial-aggregated shuffle. DuckDB runs "
    "the identical recursive SQL as the oracle.",
)
def q54_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("__q54_orders")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT date_trunc('month', min(o_orderdate)) AS lo,
                   date_trunc('month', max(o_orderdate)) AS hi
            FROM __q54_orders
        ), spine(m) AS (
            SELECT lo FROM bounds WHERE lo IS NOT NULL
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM spine, bounds WHERE m < hi
        ), cnt AS (
            SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM __q54_orders GROUP BY 1
        )
        SELECT CAST(spine.m AS DATE) AS month,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(revenue, 0.0) AS revenue
        FROM spine LEFT JOIN cnt ON cnt.m = spine.m
        """
    )


@register(
    "q55_lateral_topk",
    oracle="""
    SELECT n.n_name, top.c_name, top.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, round(c_acctbal, 2) AS c_acctbal
        FROM customer c WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c.c_acctbal DESC, c_name LIMIT 2
    ) top
    """,
    description="correlated LATERAL subquery with per-row ORDER BY + LIMIT "
    "(top-2 customers by balance per nation) — the lateral top-N idiom "
    "DuckDB users write instead of a window+filter. Spark plans the "
    "correlation as a join + per-group limit; the window-rank formulation "
    "(q45's family) remains the preferred shape at scale, this entry pins "
    "that the LATERAL spelling itself works and agrees with DuckDB.",
)
def q55_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("__q55_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("__q55_customer")
    return spark.sql(
        """
        SELECT n.n_name, top.c_name, top.c_acctbal
        FROM __q55_nation n, LATERAL (
            SELECT c_name, round(c_acctbal, 2) AS c_acctbal
            FROM __q55_customer c WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c.c_acctbal DESC, c_name LIMIT 2
        ) top
        """
    )
