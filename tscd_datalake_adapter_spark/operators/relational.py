"""Relational operator inventory (SURVEY.md §2.2: joins, aggregations,
windows, sorts/limits, set ops) over the fixture star schema.

Every query here generalizes the reference's tiny surface to real analytics:
the reference's one query pipeline — scan → filter → project → distinct →
sort (``S3DatalakeStorage.java:89-119``) — and its existence probe
(``S3DatalakeStorage.java:64-86``) appear as ``list_distinct_custkeys`` and
``exists_probe``; everything else is the declared Spark-first extension.

Determinism contract (BASELINE.md): double aggregates go through exact
decimal sums (see :mod:`..functions`), every float output is rounded, every
integer output is BIGINT in both engines, dates become formatted strings, and
every result is fully ordered by a unique key.

Scale notes (100 TB): dimension joins (region/nation/supplier/customer-side
lookups) are explicitly broadcast; fact-fact joins shuffle on their join key
and rely on AQE for skew; aggregations are partial+final hash aggregates
(map-side combine) by construction; no query collects unbounded results —
per-row outputs are bounded by key filters or top-k windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    dec_avg,
    dec_std_samp,
    dec_sum,
    dec_var_samp,
    oracle_dec_avg,
    oracle_dec_std_samp,
    oracle_dec_sum,
    oracle_dec_var_samp,
    r2,
    r6,
    spread,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    headline=True,
    tags=("agg",),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dec_sum('l_quantity')} AS sum_qty,
           {oracle_dec_sum('l_extendedprice')} AS sum_base_price,
           {oracle_dec_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {oracle_dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           round({oracle_dec_avg('l_quantity')}, 6) AS avg_qty,
           round({oracle_dec_avg('l_extendedprice')}, 6) AS avg_price,
           round({oracle_dec_avg('l_discount')}, 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary: the flagship scan→filter→agg→sort.

    Map-side partial aggregation on (returnflag, linestatus) — 6 groups —
    means the shuffle moves 6 rows per input partition regardless of scale.
    The seven decimal folds per row are the measured cost, so the filtered
    7-column projection is spread() first — a no-op on a well-split
    cluster scan (the guard in ``functions.spread``), locally it lifts the
    fold stage off the file-count partitions onto every core.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        spread(
            li.where(
                F.col("l_shipdate")
                <= F.lit("2000-12-01 00:00:00").cast("timestamp")
            ).select(
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            r6(dec_avg("l_quantity")).alias("avg_qty"),
            r6(dec_avg("l_extendedprice")).alias("avg_price"),
            r6(dec_avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "global_agg",
    tags=("agg",),
    oracle=f"""
    SELECT count(*) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           {oracle_dec_sum('l_extendedprice')} AS total_price,
           round(min(l_quantity), 6) AS min_qty,
           round(max(l_quantity), 6) AS max_qty,
           strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
           strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
    FROM lineitem
    """,
)
def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dec_sum("l_extendedprice").alias("total_price"),
        r6(F.min("l_quantity")).alias("min_qty"),
        r6(F.max("l_quantity")).alias("max_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


@register(
    "count_distinct_by_status",
    tags=("agg",),
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def count_distinct_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "rollup_counts",
    tags=("agg",),
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "cube_counts",
    tags=("agg",),
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
        .orderBy("status", "priority")
    )


@register(
    "distinct_segments",
    tags=("agg",),
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")
    )


@register(
    "stats_by_returnflag",
    tags=("agg",),
    oracle=f"""
    SELECT l_returnflag,
           round({oracle_dec_std_samp('l_extendedprice')}, 4) AS std_price,
           round({oracle_dec_var_samp('l_discount')}, 8) AS var_disc,
           round({oracle_dec_avg('l_extendedprice')}, 6) AS avg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance from exact decimal moments — engine-independent
    (built-in ``stddev_samp`` is order-dependent on doubles and would not
    hash-match any other engine)."""
    # ~10 decimal-cast folds per row: repartition the 3-column projection
    # first or the whole map-side combine runs at scan file-count
    # parallelism (functions.spread docstring; decimal sums are order-free)
    li = spread(
        _t(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice", "l_discount"
        )
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(dec_std_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(dec_var_samp("l_discount"), 8).alias("var_disc"),
            r6(dec_avg("l_extendedprice")).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "collect_sorted_segments",
    tags=("agg",),
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
           count(*) AS n_customers
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def collect_sorted_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set made deterministic by sort_array (determinism rule:
    unsorted collect_* may not appear in checked output)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias(
                "segments"
            ),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "revenue_by_segment",
    tags=("join",),
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           {oracle_dec_sum('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dimension. Customer scales with SF (unlike
    nation/region), so no forced broadcast: AQE broadcasts it while it fits
    under the threshold and falls back to shuffle join beyond — a forced
    hint would OOM at 100 TB."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("revenue"))
        .orderBy("c_mktsegment")
    )


@register(
    "local_supplier_volume",
    headline=True,
    tags=("join",),
    oracle=f"""
    SELECT n.n_name,
           {oracle_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
                   AND s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. Only the fixed-cardinality dims
    (nation=25, region=5) carry broadcast hints; customer/supplier scale
    with SF, so AQE picks their join strategy (broadcast at small SF,
    shuffle beyond the threshold — never a forced driver OOM)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("n_name")
    )


@register(
    "customer_order_histogram",
    headline=True,
    tags=("join",),
    oracle="""
    SELECT order_count, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS order_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) GROUP BY order_count ORDER BY order_count
    """,
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + two-level aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # Pre-aggregate orders before the join: the join then carries one row
    # per customer instead of one per order — at 100 TB this turns a
    # fact-sized shuffle into a dimension-sized one.
    counts = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("cnt")
    )
    per_cust = c.join(counts, "c_custkey", "left").select(
        F.coalesce("cnt", F.lit(0)).alias("order_count")
    )
    return (
        per_cust.groupBy("order_count")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("order_count")
    )


@register(
    "semi_join_customers",
    tags=("join",),
    oracle="""
    SELECT c_mktsegment, count(*) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: the set form of the reference's existence probe R5
    (``S3DatalakeStorage.java:64-86``)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


@register(
    "anti_join_customers",
    tags=("join",),
    oracle="""
    SELECT c_nationkey, count(*) AS n_idle
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_idle"))
        .orderBy("c_nationkey")
    )


@register(
    "theta_join_part_pairs",
    tags=("join",),
    oracle="""
    SELECT p1.p_size AS size, count(*) AS n_pairs
    FROM part p1 JOIN part p2
      ON p1.p_size = p2.p_size AND p1.p_partkey < p2.p_partkey
    GROUP BY p1.p_size ORDER BY size
    """,
)
def theta_join_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta condition: the non-equi predicate rides on the hash join
    (post-join filter), so this stays a shuffled hash join, not a nested loop."""
    p1 = _t(spark, sf_dir, "part").alias("p1")
    p2 = _t(spark, sf_dir, "part").alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p1.p_size") == F.col("p2.p_size"))
            & (F.col("p1.p_partkey") < F.col("p2.p_partkey")),
        )
        .groupBy(F.col("p1.p_size").alias("size"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("size")
    )


@register(
    "cross_join_region_status",
    tags=("join",),
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    ORDER BY r.r_name, s.o_orderstatus
    """,
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).orderBy("r_name", "o_orderstatus")


@register(
    "customers_per_region",
    tags=("join",),
    oracle="""
    SELECT r.r_name, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)
def customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of both dimension tables: zero shuffle on the
    customer side until the 5-group aggregate."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name")
    )


@register(
    "full_outer_nation_counts",
    tags=("join",),
    oracle="""
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(c.n_cust, 0) AS n_customers,
           coalesce(s.n_supp, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    ORDER BY nationkey
    """,
)
def full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
            F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@register(
    "shipping_priority",
    headline=True,
    tags=("join",),
    oracle=f"""
    SELECT o.o_orderkey,
           {oracle_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + agg + global top-k (TakeOrderedAndProject).
    Customer scales with SF — no forced broadcast; AQE decides."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # Aggregate lineitem to one row per order *before* joining (the final
    # grouping key is order-level, so the partial sum commutes with the
    # join): the join input shrinks from line-items to orders.
    li_per_order = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    return (
        li_per_order.join(o, "o_orderkey")
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "revenue_forecast",
    tags=("agg",),
    oracle=f"""
    SELECT {oracle_dec_sum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg. All four predicates push
    down to the parquet scan (verify: PushedFilters in explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@register(
    "returned_items",
    headline=True,
    tags=("join",),
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {oracle_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           round(c.c_acctbal, 2) AS acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    # Two-level exact aggregation: per-order decimal sums first (map-side
    # combine shrinks the shuffle ~4x), then the customer-level rollup.
    # Decimal sums are exactly associative, so the result is bit-identical
    # to the single-level form the oracle computes.
    li_per_order = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("rev_dec")
    )
    return (
        li_per_order.join(o, "o_orderkey")
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("rev_dec").cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            r2(F.col("c_acctbal")).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_rank_orders",
    tags=("window",),
    oracle="""
    SELECT * FROM (
        SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS totalprice,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(rank()       OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3 ORDER BY o_orderstatus, rn
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio over a deterministic total order (price desc, key asc) —
    the top-k-per-group pattern."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            r2(F.col("o_totalprice")).alias("totalprice"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_orderstatus", "rn")
    )


@register(
    "window_lag_orders",
    tags=("window",),
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(lag(o_totalprice)  OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
               AS days_since_prev
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        r2(F.lag("o_totalprice").over(w)).alias("prev_price"),
        r2(F.lead("o_totalprice").over(w)).alias("next_price"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_running_sum",
    headline=True,
    tags=("window",),
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals + moving average over row frames, decimal-exact."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(38,6)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(run).cast("double").alias("running_total"),
        F.round(
            F.sum(dec).over(mov).cast("double") / F.count("*").over(mov), 6
        ).alias("moving_avg3"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_ntile_customers",
    tags=("window",),
    oracle=f"""
    SELECT tile, count(*) AS n,
           {oracle_dec_sum('c_acctbal')} AS tile_balance
    FROM (
        SELECT c_acctbal,
               CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS tile
        FROM customer
    ) GROUP BY tile ORDER BY tile
    """,
)
def window_ntile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over every customer WITHOUT a global per-row window (the
    naive ``Window.orderBy(...)`` funnels the whole table through one
    partition — unacceptable at 100 TB). Exact two-pass boundary form:

    1. ``groupBy(c_acctbal)`` → (cnt, exact decimal sum). Cardinality is
       bounded by the VALUE DOMAIN (cents in ~[-100k, 1M) → ≤1.1M distinct
       values) regardless of SF, so the cumulative-rank window in step 2
       runs over a bounded aggregate — same class as the 7-row window in
       ``yoy_revenue_growth`` — never over base-table rows.
    2. A window over that bounded table gives each value its global start
       rank; exact integer ntile arithmetic (``div``, no double division —
       safe to 2^63 rows) then assigns whole value-groups to tiles, and
       their counts/sums aggregate WITHOUT touching per-row data.
    3. Only value-groups straddling a tile boundary (≤ ntiles-1 of them, ≤3
       here) return to per-row work: broadcast-join those values against
       customer and ``row_number`` partitioned BY VALUE (tiebreak
       c_custkey), matching ntile's ORDER BY (c_acctbal, c_custkey).
       Worst case one value owns every row; the docstring contract is the
       bounded-domain + low-tie profile of an account-balance column.

    Decimal partial sums are exact and associative, so whole-group sums +
    straddling-row sums re-aggregate to the identical ``dec_sum`` total.
    """
    c = _t(spark, sf_dir, "customer")
    return ntile_counts_two_pass(c, "c_acctbal", "c_custkey", 4)


def ntile_counts_two_pass(
    df: DataFrame, value_col: str, key_col: str, nt: int
) -> DataFrame:
    """Exact distributed ntile aggregation: (tile, n, tile_balance) matching
    ``ntile(nt) OVER (ORDER BY value_col, key_col)`` followed by a per-tile
    count/decimal-sum — computed WITHOUT a global per-row window (see
    :func:`window_ntile_customers` for the scale argument). Equivalence to
    the native global-window form, including tie and N % nt edge cases, is
    pinned in ``tests/test_llm_ops.py::test_ntile_two_pass_matches_native``.
    """
    # the bounded per-value table anchors the rank window, the total, the
    # whole-group tile sums, and the straddle detection — checkpoint so
    # the base aggregation runs once (executed-plan audit: 4 scans)
    per_val = df.groupBy(value_col).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("val_sum"),
    ).localCheckpoint()
    wv = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
    per_val = per_val.withColumn(
        "rank0", F.coalesce(F.sum("cnt").over(wv), F.lit(0)).cast("long")
    )
    tot = per_val.groupBy().agg(F.sum("cnt").cast("long").alias("n_total"))
    pv = (
        per_val.join(F.broadcast(tot))
        .withColumn("base", F.expr(f"n_total div {nt}"))
        .withColumn("rem", F.col("n_total") % nt)
    )

    # Exact integer tile-of-rank: first `rem` tiles hold base+1 rows, the
    # rest hold base. ceil(a/b) == (a + b - 1) div b, all in int64.
    def tile_of(rank_expr: str) -> F.Column:
        return F.expr(
            f"CASE WHEN ({rank_expr}) <= rem * (base + 1)"
            f" THEN (({rank_expr}) + base) div (base + 1)"
            f" ELSE rem + (({rank_expr}) - rem * (base + 1)"
            f"            + greatest(base, 1) - 1) div greatest(base, 1) END"
        ).cast("long")

    pv = pv.withColumn("tile_first", tile_of("rank0 + 1")).withColumn(
        "tile_last", tile_of("rank0 + cnt")
    )

    whole = (
        pv.where(F.col("tile_first") == F.col("tile_last"))
        .groupBy(F.col("tile_first").alias("tile"))
        .agg(F.sum("cnt").alias("n_part"), F.sum("val_sum").alias("bal_part"))
    )
    straddle = pv.where(F.col("tile_first") != F.col("tile_last")).select(
        value_col, "rank0", "base", "rem"
    )
    wrow = Window.partitionBy(value_col).orderBy(key_col)
    straddle_rows = (
        df.join(F.broadcast(straddle), value_col)
        .withColumn("rn", F.row_number().over(wrow))
        .withColumn("tile", tile_of("rank0 + rn"))
        .groupBy("tile")
        .agg(
            F.count("*").alias("n_part"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("bal_part"),
        )
    )
    return (
        whole.unionByName(straddle_rows)
        .groupBy("tile")
        .agg(
            F.sum("n_part").cast("long").alias("n"),
            F.sum("bal_part").cast("double").alias("tile_balance"),
        )
        .orderBy("tile")
    )


@register(
    "window_range_frame",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS BIGINT)
               AS n_similar_price
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a value axis: peers within ±100 of each order's price."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-100, 100)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.count("*").over(w).cast("long").alias("n_similar_price"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Sorts / limits / existence — the reference's own query shapes
# ---------------------------------------------------------------------------


@register(
    "topk_orders_global",
    tags=("sort",),
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    no full sort, no full shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", r2(F.col("o_totalprice")).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "exists_probe",
    tags=("sort",),
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_hits,
           count(*) > 0 AS available
    FROM orders WHERE o_orderkey = 1
    """,
)
def exists_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R5 (`exists()`, ``S3DatalakeStorage.java:64-86``) as a
    predicate-pushdown point lookup instead of an O(N) key scan."""
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") == 1).agg(
        F.count("*").alias("n_hits"), (F.count("*") > 0).alias("available")
    )


@register(
    "list_distinct_custkeys",
    tags=("sort",),
    oracle="""
    SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey
    """,
)
def list_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R6 (`listBooks()`, ``S3DatalakeStorage.java:89-119``):
    scan → project → distinct → ascending sort, as a two-phase distributed
    hash aggregate reading a single column."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_custkey").distinct().orderBy("o_custkey")


@register(
    "sort_multi_key_nulls",
    tags=("sort",),
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal
    FROM customer
    WHERE c_custkey < 200
    ORDER BY c_mktsegment ASC, bal DESC NULLS LAST, c_custkey
    """,
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST placement."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.round(F.col("c_acctbal"), 2)
    )
    return c.select("c_custkey", "c_mktsegment", bal.alias("bal")).orderBy(
        F.col("c_mktsegment").asc(),
        F.col("bal").desc_nulls_last(),
        F.col("c_custkey"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "union_all_overlap",
    tags=("set",),
    oracle="""
    SELECT c_custkey, count(*) AS n_appearances FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    ) GROUP BY c_custkey HAVING count(*) > 1 ORDER BY c_custkey
    """,
)
def union_all_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        a.unionByName(b)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_appearances"))
        .where(F.col("n_appearances") > 1)
        .orderBy("c_custkey")
    )


@register(
    "union_distinct_count",
    tags=("set",),
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    """,
)
def union_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.unionByName(b).distinct().agg(F.count("*").alias("n"))


@register(
    "intersect_custkeys",
    tags=("set",),
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
)
def intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op).orderBy("o_custkey")


@register(
    "except_custkeys",
    tags=("set",),
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
)
def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op).orderBy("o_custkey")


@register(
    "range_join_binned",
    headline=True,
    tags=("join",),
    oracle=f"""
    WITH win AS (
        SELECT i AS window_id,
               TIMESTAMP '2024-01-01 00:00:00' + to_hours(73 * i) AS ws,
               TIMESTAMP '2024-01-01 00:00:00' + to_hours(73 * i + 8) AS we
        FROM (SELECT unnest(range(0, 10)) AS i)
    )
    SELECT w.window_id, count(*) AS n_events,
           {oracle_dec_sum('e.value')} AS total_value
    FROM win w JOIN events e ON e.ts >= w.ws AND e.ts < w.we
    GROUP BY w.window_id ORDER BY w.window_id
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-point range join via bucketing — the scale path for the
    join Spark would otherwise plan as BroadcastNestedLoopJoin.

    Ten 8-hour maintenance windows (one per 73 h, deterministic) join
    against event timestamps. Naively ``e.ts >= ws AND e.ts < we`` is a
    pure-inequality join: O(|windows|·|events|) comparisons and, with a
    large build side, a nested loop. The binned rewrite quantizes time into
    8-hour buckets (bucket width >= max window length, so a window overlaps
    at most 2 buckets): each window explodes to its covered buckets, events
    map to exactly one bucket, and the join becomes an EQUI join on bucket
    with the range predicate as a residual filter. At 100 TB that is one
    hash shuffle (or broadcast of the tiny exploded window side) instead of
    a quadratic loop — the same technique behind Databricks' range-join
    bin hints.

    Generalizes the reference's time-partitioned key layout
    (``S3DatalakeStorage.java:145-150``) into time-range query capability
    it never had.
    """
    bucket_s = 8 * 3600
    win = (
        spark.range(10)
        .select(
            F.col("id").alias("window_id"),
            F.expr(
                "timestamp'2024-01-01 00:00:00'"
                " + make_interval(0, 0, 0, 0, cast(73 * id as int), 0, 0)"
            ).alias("ws"),
            F.expr(
                "timestamp'2024-01-01 00:00:00'"
                " + make_interval(0, 0, 0, 0, cast(73 * id + 8 as int), 0, 0)"
            ).alias("we"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.unix_timestamp("ws") / bucket_s).cast("long"),
                    (F.unix_timestamp("we") / bucket_s).cast("long"),
                )
            ),
        )
    )
    e = load_table(spark, sf_dir, "events").withColumn(
        "bucket", (F.unix_timestamp("ts") / bucket_s).cast("long")
    )
    return (
        e.join(F.broadcast(win), "bucket")
        .where((F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we")))
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .orderBy("window_id")
    )


@register(
    "window_percent_rank",
    tags=("window",),
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM customer
    WHERE c_custkey <= 200
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics: percent_rank and cume_dist per market
    segment, ordered by account balance with the key as deterministic
    tie-break. Both are rank arithmetic over one per-partition sort — the
    same single shuffle as row_number at any scale."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("c_custkey")
    )


@register(
    "yoy_revenue_growth",
    tags=("agg", "window"),
    oracle=f"""
    WITH yearly AS (
        SELECT strftime(o_orderdate, '%Y') AS yr,
               {oracle_dec_sum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT yr, revenue,
           round(100.0 * (revenue - lag(revenue) OVER (ORDER BY yr))
                 / lag(revenue) OVER (ORDER BY yr), 6) AS yoy_pct
    FROM yearly ORDER BY yr
    """,
)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: a window (lag + ratio) OVER an
    aggregate — the composition every BI rollup ends in. The window input
    is year-cardinality (tiny regardless of fact size), so the lag runs on
    a single post-aggregation partition; the only fact-sized work is the
    partial+final sum. First year's growth is NULL by construction."""
    o = _t(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.date_format("o_orderdate", "yyyy").alias("yr")
    ).agg(dec_sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "yr",
        "revenue",
        F.round(100.0 * (F.col("revenue") - prev) / prev, 6).alias("yoy_pct"),
    ).orderBy("yr")
