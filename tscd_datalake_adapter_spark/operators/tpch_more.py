"""Remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q15/Q19/Q20/Q21 analogues),
adapted to the fixture star schema (FIXTURES.md — no ``partsupp``, no
``l_shipmode``/``l_commitdate``/``l_receiptdate``; adaptations are noted per
query and kept semantically faithful to the planner features each TPC-H query
exists to exercise: nation-pair self-joins, conditional-ratio aggregation,
disjunctive multi-table predicates, derived-view scalar subqueries,
exists/not-exists multi-way correlation, and correlated argmax).

The reference implements none of these (SURVEY.md §2.1 absence list) — this
module is part of the declared Spark-first extension (SURVEY.md §2.2 [TD]
rows), generalizing its single scan→filter→project→distinct→sort pipeline
(``S3DatalakeStorage.java:89-119``) to full analytic SQL shapes.

Scale notes (100 TB) applied throughout: every dimension side is explicitly
broadcast; fact-fact correlation (Q21) is rewritten from three lineitem
self-joins into window aggregates over ONE fact join (single lineitem scan,
plan-tested); derived-view maxima (Q15) reduce to a 1-row broadcast instead
of a global sort; all money sums go through exact decimal(38,6) (see
functions/__init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    DEC,
    oracle_dec_sum,
    dec_sum,
    r2,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "volume_shipping",
    tags=("join",),
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {oracle_dec_sum('volume')} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               strftime(l.l_shipdate, '%Y') AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between a nation pair by year.

    The nation table joins twice under different roles (supplier-side,
    customer-side) with a disjunctive pair predicate. Only the two nation
    lookups (fixed cardinality 25) are force-broadcast; supplier/customer
    scale with SF, so AQE picks their strategy — broadcast while small,
    shuffle join at 100 TB instead of an OOM.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "market_share",
    headline=True,
    tags=("join", "agg"),
    oracle=f"""
    SELECT o_year,
           round(100.0 *
               {oracle_dec_sum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END")}
               / {oracle_dec_sum('volume')}, 6) AS mkt_share_pct
    FROM (
        SELECT strftime(o.o_orderdate, '%Y') AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    )
    GROUP BY o_year ORDER BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year —
    a conditional-sum ratio over an 8-way star join.

    Only the fixed-cardinality dims (nation ×2, region) carry broadcast
    hints; part/supplier/customer scale with SF and are left to AQE. The
    part filter (p_type) still prunes the fact stream early wherever the
    optimizer places that join.
    """
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_volume = F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(
            F.round(100.0 * dec_sum(nat_volume) / dec_sum(volume), 6).alias(
                "mkt_share_pct"
            )
        )
        .orderBy("o_year")
    )


@register(
    "product_profit",
    headline=True,
    tags=("join", "agg"),
    oracle=f"""
    SELECT nation, o_year, {oracle_dec_sum('amount')} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               strftime(o.o_orderdate, '%Y') AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - 0.1 * p.p_retailprice * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%bolt%'
    )
    GROUP BY nation, o_year ORDER BY nation, o_year
    """,
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for a product
    family selected by LIKE on p_name.

    Adaptation: the fixture schema has no partsupp/ps_supplycost, so unit
    cost is proxied as ``0.1 * p_retailprice`` (documented, deterministic).
    The LIKE filter prunes part before its join; only nation (25 rows) is
    force-broadcast — part/supplier sizes scale with SF, AQE decides.
    """
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg(dec_sum(amount).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "important_parts",
    tags=("agg", "subquery"),
    oracle=f"""
    SELECT l_partkey, {oracle_dec_sum('l_extendedprice')} AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) >
           (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                   * 2.0 / COUNT(DISTINCT l_partkey)
            FROM lineitem)
    ORDER BY part_value DESC, l_partkey
    """,
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total traded value exceeds a fraction of
    the global total — HAVING against an uncorrelated scalar subquery.

    The threshold is a 1-row aggregate broadcast into the HAVING filter; the
    per-part aggregate and the global aggregate share one scan of lineitem
    (adaptations: value from l_extendedprice since there is no partsupp, and
    the fraction is 2× the average per-part share — TPC-H scales its
    0.0001 fraction by 1/SF for the same reason: a fixed fraction selects
    nothing as the part count grows).
    """
    from tscd_datalake_adapter_spark.functions import persist_corpus

    li = _t(spark, sf_dir, "lineitem")
    # the per-part view yields the threshold too (Σ v_dec = global total,
    # count(*) = distinct part count) — one lineitem scan, as the
    # docstring promises; per-part = catalog volume, so persist
    per_part = persist_corpus(
        li.groupBy("l_partkey").agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("v_dec")
        )
    )
    thr = per_part.agg(
        (
            F.sum("v_dec").cast("double") * 2.0 / F.count("*")
        ).alias("thr")
    )
    return (
        per_part.join(F.broadcast(thr))
        .where(F.col("v_dec").cast("double") > F.col("thr"))
        .select("l_partkey", F.col("v_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "top_supplier",
    tags=("join", "subquery"),
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                   AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(CAST(r.total_rev AS DOUBLE), 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly revenue —
    a derived revenue view compared against its own max.

    The max is a 1-row aggregate broadcast against the view (no global sort);
    equality is exact because both sides stay decimal(38,6) until output.
    The post-max filtered side (≈1 row) is broadcast into the supplier join.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    from tscd_datalake_adapter_spark.functions import persist_corpus

    # the revenue view feeds its own max AND the argmax filter — persist
    # so the quarter's lineitem slice scans once (per-supplier = catalog
    # volume, so persist, not checkpoint)
    rev = persist_corpus(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    best = rev.join(F.broadcast(mx), rev.total_rev == F.col("mx")).drop("mx")
    return (
        s.join(F.broadcast(best), s.s_suppkey == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            r2(F.col("total_rev").cast("double")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "disjunctive_part_revenue",
    tags=("join",),
    oracle=f"""
    SELECT {oracle_dec_sum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 3 AND 12)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 5 AND 15)
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjuncts mixing columns from both join sides.

    Catalyst cannot push the cross-table disjunction below the join, but it
    does extract the common single-table residues (p_brand IN (...),
    p_size/l_quantity range hulls) as pushed-down pre-filters; the full
    disjunction applies after the join (AQE-chosen strategy — part scales
    with SF, so no forced broadcast).
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 10)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(3, 12)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(5, 15)
    )
    return j.where(cond).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "promo_heavy_suppliers",
    tags=("join", "subquery"),
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300
    )
    ORDER BY s_suppkey
    """,
)
def promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of a product
    family in a year — IN over an aggregated-with-HAVING subquery.

    Adaptation: no partsupp, so the availability predicate becomes a shipped-
    quantity threshold over lineitem⋈part. The qualifying-supplier set is
    aggregated first (supplier-cardinality), then semi-joined — the build
    side is the aggregate, never lineitem; its size still scales with SF,
    so AQE (not a forced hint) decides broadcast vs shuffle.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    qualifying = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "waiting_suppliers",
    headline=True,
    tags=("join", "subquery"),
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* late shipper on
    multi-supplier finalized orders (late := shipped >60 days after order
    date; the fixture has no receipt/commit dates).

    Spark-first rewrite: instead of the SQL's two correlated lineitem
    self-joins (three fact shuffles and three fact scans), join the fact
    tables ONCE and compute the per-order supplier sets as window
    aggregates over ``l_orderkey`` — ``n_supp = size(collect_set(supp))``,
    ``n_late_supp = size(collect_set(supp | late))`` (collect_set skips the
    null of the when()). A late line qualifies iff its order has ≥2
    suppliers and exactly 1 late supplier (necessarily its own): pointwise
    equivalent to EXISTS(other supplier) ∧ NOT EXISTS(other late supplier).
    One scan of lineitem, one fact shuffle for the join plus one window
    shuffle on order key; the per-order set state is bounded by suppliers
    per order (~7), safe at any scale.
    """
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = _t(spark, sf_dir, "supplier")
    lo = li.join(o, li.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    w = Window.partitionBy("l_orderkey")
    flagged = lo.withColumn("is_late", late).withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(
            F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    return (
        flagged.where(
            F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "best_supplier_per_part",
    tags=("join", "subquery"),
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eu AS (SELECT s_suppkey, s_name, s_acctbal
                FROM supplier, nation, region
                WHERE s_nationkey = n_nationkey
                  AND n_regionkey = r_regionkey
                  AND r_name = 'EUROPE')
    SELECT p.p_partkey, p.p_name, eu.s_suppkey, eu.s_name,
           round(eu.s_acctbal, 2) AS acctbal
    FROM part p, ps, eu
    WHERE p.p_partkey = ps.l_partkey
      AND eu.s_suppkey = ps.l_suppkey
      AND p.p_type = 'STANDARD' AND p.p_size <= 10
      AND eu.s_acctbal = (SELECT max(e2.s_acctbal)
                          FROM ps ps2, eu e2
                          WHERE ps2.l_partkey = p.p_partkey
                            AND e2.s_suppkey = ps2.l_suppkey)
    ORDER BY p.p_partkey, eu.s_suppkey
    """,
)
def best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the best-standing supplier in a region —
    a correlated argmax subquery.

    Adaptation: the part↔supplier association comes from distinct lineitem
    (partkey, suppkey) pairs (no partsupp), and "best" is max s_acctbal (no
    ps_supplycost). Spark-first rewrite of the correlated max: a window max
    over partkey on the joined candidates, then an equality filter — one
    shuffle on partkey instead of a correlated re-scan per outer row. The
    equality compares unmodified double values read from parquet, so it is
    engine-exact.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    cand = ps.join(eu, ps.l_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("l_partkey")
    best = cand.withColumn("mx", F.max("s_acctbal").over(w)).where(
        F.col("s_acctbal") == F.col("mx")
    )
    return (
        best.join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            r2(F.col("s_acctbal")).alias("acctbal"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )
