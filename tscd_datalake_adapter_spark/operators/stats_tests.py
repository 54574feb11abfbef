"""Classical statistical tests as distributed queries: rank correlations
(Spearman, Kendall tau-b), the Mann-Whitney U rank-sum test, McNemar's
paired-classifier test, Cramér's V association, and a t-closeness EMD
privacy audit.

These are the hypothesis-test / association-measure face of the eval tier
(ROC/AUC, KS, chi² keyness, Cohen's kappa live elsewhere). The common
determinism recipe: every statistic is reduced to INTEGER sufficient
statistics first (rank sums via the value-histogram cumulative trick,
concordant/discordant pair counts, contingency cells), so the only
floating-point steps are final IEEE divisions/sqrts on exact integers —
bit-identical across engines without any rounding gymnastics. Where a
float sum over many cells is unavoidable (chi² cell terms), the repo's
round-12 + DECIMAL(38,12) order-free sum recipe applies.

Scale shapes, per operator, are in the docstrings; the common theme is
that every test statistic aggregates a BOUNDED intermediate (a calendar
of days, a value histogram, a 25-cell contingency grid) — the corpus-
sized work is always one map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    dec_sum,
    h60,
    oracle_dec_sum,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.operators.text import LANG_PROFILES
from tscd_datalake_adapter_spark.sources import load_table

# Word-marker profiles for the SECOND language classifier (McNemar needs
# two classifiers that sometimes disagree; the fixture corpus shares one
# vocabulary across langs, so marker words fire on every lang — a
# deliberately-different error profile from the bigram classifier).
WORD_PROFILES = {
    "en": ((" the ", 3), (" and ", 1)),
    "de": ((" und ", 3), (" der ", 1)),
    "es": ((" los ", 3), (" una ", 1)),
    "fr": ((" les ", 3), (" une ", 1)),
}

_LANGS = ("en", "de", "es", "fr")


def _daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event count + decimal-exact purchase revenue — the bounded
    (calendar-sized) series the rank/trend/outlier tests run on.

    Returned CHECKPOINTED: every consumer feeds the series to a moment
    aggregate AND a residual/deviation/pair pass, and each branch would
    re-run the corpus aggregation (the exchange-reuse gap)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("idx")
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.round(
            dec_sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ),
            6,
        )
        .cast("double")
        .alias("y"),
    ).localCheckpoint()


_ORACLE_DAILY = f"""
    SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                AS BIGINT) AS idx,
           CAST(count(*) AS BIGINT) AS x,
           round({oracle_dec_sum(
               "CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END"
           )}, 6) AS y
    FROM events GROUP BY 1
"""


@register(
    "spearman_corr_daily",
    tags=("analytics", "stats"),
    defer=True,
    oracle=f"""
    WITH daily AS ({_ORACLE_DAILY}),
    ranked AS (
        SELECT
            2 * rank() OVER (ORDER BY x)
              + count(*) OVER (PARTITION BY x) - 1 AS rx2,
            2 * rank() OVER (ORDER BY y)
              + count(*) OVER (PARTITION BY y) - 1 AS ry2
        FROM daily
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rx2) AS BIGINT) AS sx,
               CAST(sum(ry2) AS BIGINT) AS sy,
               CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
               CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
               CAST(sum(rx2 * ry2) AS BIGINT) AS sxy
        FROM ranked
    )
    SELECT n AS n_days,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS spearman_rho
    FROM s
    """,
)
def spearman_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily event volume and daily
    purchase revenue. Ties take average ranks via the integer trick
    ``2·avgrank = 2·minrank + tiecount − 1``, so every sufficient
    statistic (rank sums, squares, cross products) is an exact BIGINT and
    the only floats are the final Pearson-on-ranks divisions — identical
    IEEE operations on identical operands in both engines.

    Scale shape: ranks are windows over the DAILY AGGREGATE (bounded by
    the calendar regardless of event volume — the exempt global-window
    class); the corpus-sized work is one map-side-combined groupBy(day).
    The two sqrt factors are taken separately so no intermediate exceeds
    2^53 (n·Sxx ≲ 1e14 for a century of days)."""
    daily = _daily_events(spark, sf_dir)
    rx = Window.orderBy("x")
    ry = Window.orderBy("y")
    ranked = daily.select(
        (
            2 * F.rank().over(rx)
            + F.count("*").over(Window.partitionBy("x"))
            - 1
        ).alias("rx2"),
        (
            2 * F.rank().over(ry)
            + F.count("*").over(Window.partitionBy("y"))
            - 1
        ).alias("ry2"),
    )
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    return s.select(
        n.alias("n_days"), F.round(num / den, 6).alias("spearman_rho")
    )


@register(
    "kendall_tau_daily",
    tags=("analytics", "stats"),
    defer=True,
    oracle=f"""
    WITH daily AS ({_ORACLE_DAILY}),
    p AS (
        SELECT
            CAST(sum(CASE WHEN (b.x > a.x AND b.y > a.y)
                            OR (b.x < a.x AND b.y < a.y)
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN (b.x > a.x AND b.y < a.y)
                            OR (b.x < a.x AND b.y > a.y)
                     THEN 1 ELSE 0 END) AS BIGINT) AS d,
            CAST(sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            CAST(sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT)
                AS n2
        FROM daily a JOIN daily b ON a.idx < b.idx
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
    SELECT nn.n AS n_days, p.c AS concordant, p.d AS discordant,
           round(CAST(p.c - p.d AS DOUBLE)
                 / sqrt(CAST((nn.n * (nn.n - 1) / 2 - p.n1)
                             * (nn.n * (nn.n - 1) / 2 - p.n2)
                        AS DOUBLE)), 6) AS kendall_tau_b
    FROM p CROSS JOIN nn
    """,
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (tie-corrected) between daily event volume and daily
    purchase revenue: concordant/discordant/tied pair counts over the
    day-pair join, all integers until one final division and sqrt.

    Scale shape: the pair join is over the daily aggregate — bounded by
    the calendar (~366 days → ~67k pairs at every SF), the same deliberate
    bounded-nested-loop shape as ``theil_sen_daily_trend``; raw events are
    touched exactly once by the groupBy. The tie-corrected denominator
    factors stay BIGINT (≤ n²/2 each) and their product ≲ 4.5e9 for a
    year of days — exact in the double that feeds sqrt."""
    daily = _daily_events(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    ax, bx = F.col("a.x"), F.col("b.x")
    ay, by = F.col("a.y"), F.col("b.y")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    p = a.join(b, F.col("a.idx") < F.col("b.idx")).agg(
        one((bx > ax) & (by > ay) | (bx < ax) & (by < ay)).alias("c"),
        one((bx > ax) & (by < ay) | (bx < ax) & (by > ay)).alias("d"),
        one(bx == ax).alias("n1"),
        one(by == ay).alias("n2"),
    )
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    n = F.col("n")
    n0 = (n * (n - 1) / 2).cast("long")
    tau = F.round(
        (F.col("c") - F.col("d")).cast("double")
        / F.sqrt(((n0 - F.col("n1")) * (n0 - F.col("n2"))).cast("double")),
        6,
    )
    return (
        p.crossJoin(F.broadcast(nn))
        .select(
            n.alias("n_days"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            tau.alias("kendall_tau_b"),
        )
    )


@register(
    "mann_whitney_u_segments",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH c AS (
        SELECT CAST(floor(c_acctbal) AS BIGINT) AS v,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ),
    hist AS (
        SELECT v, CAST(sum(isa) AS BIGINT) AS na_v,
               CAST(count(*) AS BIGINT) AS n_v
        FROM c GROUP BY v
    ),
    cum AS (
        SELECT na_v, n_v,
               sum(n_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - n_v
                   AS cum_before
        FROM hist
    ),
    s AS (
        SELECT CAST(sum(na_v * (2 * cum_before + n_v + 1)) AS BIGINT)
                   AS two_ra,
               CAST(sum(na_v) AS BIGINT) AS na,
               CAST(sum(n_v - na_v) AS BIGINT) AS nb,
               CAST(sum(n_v * n_v * n_v - n_v) AS BIGINT) AS tie_term
        FROM cum
    )
    SELECT na AS n_building, nb AS n_automobile,
           CAST(two_ra - na * (na + 1) AS BIGINT) AS two_u_a,
           round(CAST(two_ra - na * (na + 1) - na * nb AS DOUBLE)
                 / (2.0 * sqrt(CAST(na * nb AS DOUBLE)
                     * ((CAST(na + nb AS DOUBLE) + 1.0)
                        - CAST(tie_term AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * (CAST(na + nb AS DOUBLE) - 1.0)))
                     / 12.0)), 6) AS z_score
    FROM s
    """,
)
def mann_whitney_u_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do BUILDING and AUTOMOBILE customers
    draw account balances from the same distribution? Rank sums come from
    the value-histogram cumulative trick (the ``roc_auc_eval`` recipe):
    per distinct whole-dollar balance, ``2·avgrank = 2·cum_before + n_v
    + 1`` keeps the doubled rank sum an exact BIGINT; the normal
    approximation applies the standard tie correction
    ``σ² = na·nb/12·((N+1) − Σ(t³−t)/(N(N−1)))``.

    Scale shape: one map-side-combined groupBy onto the whole-dollar
    histogram (bounded by the balance domain, ~11k bins, NOT by customer
    count), one ordered window over that bounded histogram, one global
    fold. No per-row ranks are ever materialized."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(
            F.floor("c_acctbal").cast("long").alias("v"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("isa"),
        )
    )
    hist = c.groupBy("v").agg(
        F.sum("isa").cast("long").alias("na_v"),
        F.count("*").cast("long").alias("n_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "na_v",
        "n_v",
        (F.sum("n_v").over(w) - F.col("n_v")).alias("cum_before"),
    )
    nv = F.col("n_v")
    s = cum.agg(
        F.sum(F.col("na_v") * (2 * F.col("cum_before") + nv + 1))
        .cast("long")
        .alias("two_ra"),
        F.sum("na_v").cast("long").alias("na"),
        F.sum(nv - F.col("na_v")).cast("long").alias("nb"),
        F.sum(nv * nv * nv - nv).cast("long").alias("tie_term"),
    )
    na, nb = F.col("na"), F.col("nb")
    two_ua = (F.col("two_ra") - na * (na + 1)).cast("long")
    nd = (na + nb).cast("double")
    var_u = (
        (na * nb).cast("double")
        * ((nd + 1.0) - F.col("tie_term").cast("double") / (nd * (nd - 1.0)))
        / 12.0
    )
    z = F.round(
        (two_ua - na * nb).cast("double") / (2.0 * F.sqrt(var_u)), 6
    )
    return s.select(
        na.alias("n_building"),
        nb.alias("n_automobile"),
        two_ua.alias("two_u_a"),
        z.alias("z_score"),
    )


def _score_sql(profiles: dict, lang: str) -> str:
    terms = [
        f"(length(text) - length(replace(text, '{ng}', ''))) / {len(ng)}"
        f" * {w}"
        for ng, w in profiles[lang]
    ]
    return " + ".join(terms)


def _pred_sql(profiles: dict) -> str:
    s = {lg: f"({_score_sql(profiles, lg)})" for lg in _LANGS}
    return f"""CASE
        WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['es']}
             AND {s['en']} >= {s['fr']} THEN 'en'
        WHEN {s['de']} >= {s['es']} AND {s['de']} >= {s['fr']} THEN 'de'
        WHEN {s['es']} >= {s['fr']} THEN 'es'
        ELSE 'fr' END"""


def _pred_col(profiles: dict):
    def score(lang: str):
        total = F.lit(0)
        for ng, w in profiles[lang]:
            total = total + (
                (
                    F.length("text")
                    - F.length(F.replace(F.col("text"), F.lit(ng), F.lit("")))
                )
                / len(ng)
            ) * w
        return total

    s = {lg: score(lg) for lg in _LANGS}
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )


@register(
    "mcnemar_langid_classifiers",
    tags=("llm", "text", "stats"),
    defer=True,
    oracle=f"""
    WITH pred AS (
        SELECT lang,
               {_pred_sql(LANG_PROFILES)} AS pa,
               {_pred_sql(WORD_PROFILES)} AS pb
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN pa = lang THEN 1 ELSE 0 END) AS BIGINT)
                   AS a_correct,
               CAST(sum(CASE WHEN pb = lang THEN 1 ELSE 0 END) AS BIGINT)
                   AS b_correct,
               CAST(sum(CASE WHEN pa = lang AND pb != lang
                        THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
               CAST(sum(CASE WHEN pa != lang AND pb = lang
                        THEN 1 ELSE 0 END) AS BIGINT) AS only_b
        FROM pred
    )
    SELECT n_docs, a_correct, b_correct, only_a, only_b,
           CASE WHEN only_a + only_b = 0 THEN 0.0
                ELSE round(CAST((only_a - only_b) * (only_a - only_b)
                                AS DOUBLE)
                           / CAST(only_a + only_b AS DOUBLE), 6)
           END AS mcnemar_chi2
    FROM s
    """,
)
def mcnemar_langid_classifiers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """McNemar's test for PAIRED classifiers: the bigram-profile language
    classifier (``language_id``) vs a word-marker classifier on the same
    documents. Only the discordant cells matter — ``only_a`` (bigram
    right, marker wrong) vs ``only_b`` — and the statistic
    ``(b−c)²/(b+c)`` is integer arithmetic until one division.

    Scale shape: embarrassingly parallel per-document scoring (pure
    length/replace integer arithmetic, whole-stage codegen) into one
    global fold; no shuffle wider than the 1-row aggregate."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    pred = d.select(
        "lang",
        _pred_col(LANG_PROFILES).alias("pa"),
        _pred_col(WORD_PROFILES).alias("pb"),
    )
    lang = F.col("lang")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    s = pred.agg(
        F.count("*").cast("long").alias("n_docs"),
        cnt(F.col("pa") == lang).alias("a_correct"),
        cnt(F.col("pb") == lang).alias("b_correct"),
        cnt((F.col("pa") == lang) & (F.col("pb") != lang)).alias("only_a"),
        cnt((F.col("pa") != lang) & (F.col("pb") == lang)).alias("only_b"),
    )
    oa, ob = F.col("only_a"), F.col("only_b")
    stat = F.when(oa + ob == 0, F.lit(0.0)).otherwise(
        F.round(
            ((oa - ob) * (oa - ob)).cast("double") / (oa + ob).cast("double"),
            6,
        )
    )
    return s.select(
        "n_docs",
        "a_correct",
        "b_correct",
        "only_a",
        "only_b",
        stat.alias("mcnemar_chi2"),
    )


@register(
    "cramers_v_priority_segment",
    tags=("analytics", "stats"),
    defer=True,
    oracle=f"""
    WITH j AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT seg, pri, CAST(count(*) AS BIGINT) AS o
        FROM j GROUP BY seg, pri
    ),
    grid AS (
        SELECT s.seg, p.pri, COALESCE(c.o, 0) AS o
        FROM (SELECT DISTINCT seg FROM j) s
        CROSS JOIN (SELECT DISTINCT pri FROM j) p
        LEFT JOIN cells c ON c.seg = s.seg AND c.pri = p.pri
    ),
    rc AS (
        SELECT CAST(count(DISTINCT seg) AS BIGINT) AS r,
               CAST(count(DISTINCT pri) AS BIGINT) AS c
        FROM grid
    ),
    m AS (
        SELECT o,
               sum(o) OVER (PARTITION BY seg) AS rt,
               sum(o) OVER (PARTITION BY pri) AS ct,
               sum(o) OVER () AS n
        FROM grid
    ),
    terms AS (
        SELECT n,
               round(CAST(CAST(o * n - rt * ct AS DECIMAL(38,0))
                          * CAST(o * n - rt * ct AS DECIMAL(38,0))
                     AS DOUBLE)
                     / CAST(rt AS DOUBLE) / CAST(ct AS DOUBLE)
                     / CAST(n AS DOUBLE), 12) AS term
        FROM m
    )
    SELECT CAST(max(t.n) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(t.term AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS chi2,
           round(sqrt(CAST(sum(CAST(t.term AS DECIMAL(38,12))) AS DOUBLE)
                      / (CAST(max(t.n) AS DOUBLE)
                         * least(max(rc.r) - 1, max(rc.c) - 1))), 6)
               AS cramers_v
    FROM terms t CROSS JOIN rc
    """,
)
def cramers_v_priority_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cramér's V association between customer market segment and order
    priority: chi² over the full (including empty-cell) contingency grid,
    normalized to [0,1]. Each cell term uses the cross-multiplied integer
    form ``(o·n − rt·ct)²/(rt·ct·n)`` with the square taken in
    DECIMAL(38,0) — BIGINT would overflow at ~2e10 observed counts, and
    Spark wraps silently where DuckDB raises, so the decimal square is
    the 100-TB-safe form. Cell terms are round-12 + DECIMAL(38,12)
    summed (order-free).

    Scale shape: one shuffle for the orders⋈customer key join, one
    map-side-combined groupBy onto the r×c cell grid (25 rows); every
    window thereafter is over that bounded grid."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
    )
    # the r×c cell grid anchors everything downstream; the axis domains
    # come from the CELLS (every observed seg/pri appears in some cell),
    # so the orders⋈customer join runs exactly once — checkpoint the
    # bounded tables (executed-plan audit: 2 scans of each table without)
    cells = (
        j.groupBy("seg", "pri")
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint()
    )
    segs = cells.select("seg").distinct()
    pris = cells.select("pri").distinct()
    grid = (
        segs.crossJoin(pris)
        .join(cells, ["seg", "pri"], "left")
        .select("seg", "pri", F.coalesce(F.col("o"), F.lit(0)).alias("o"))
        .localCheckpoint()
    )
    rc = grid.agg(
        F.countDistinct("seg").cast("long").alias("r"),
        F.countDistinct("pri").cast("long").alias("c"),
    )
    m = grid.select(
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("rt"),
        F.sum("o").over(Window.partitionBy("pri")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    num = (F.col("o") * F.col("n") - F.col("rt") * F.col("ct")).cast(
        "decimal(38,0)"
    )
    term = F.round(
        (num * num).cast("double")
        / F.col("rt").cast("double")
        / F.col("ct").cast("double")
        / F.col("n").cast("double"),
        12,
    )
    terms = m.select("n", term.alias("term")).crossJoin(F.broadcast(rc))
    chi2 = F.sum(F.col("term").cast("decimal(38,12)")).cast("double")
    agg = terms.agg(
        F.max("n").cast("long").alias("n_orders"),
        chi2.alias("chi2_raw"),
        F.max("r").alias("r"),
        F.max("c").alias("c"),
    )
    return agg.select(
        "n_orders",
        F.round(F.col("chi2_raw"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2_raw")
                / (
                    F.col("n_orders").cast("double")
                    * F.least(F.col("r") - 1, F.col("c") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "t_closeness_emd_audit",
    tags=("pipeline", "privacy", "stats"),
    defer=True,
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nat,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bin
        FROM customer
    ),
    gb AS (SELECT bin, CAST(count(*) AS BIGINT) AS gcount
           FROM c GROUP BY bin),
    tot AS (SELECT CAST(sum(gcount) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS m FROM gb),
    nats AS (SELECT nat, CAST(count(*) AS BIGINT) AS ng
             FROM c GROUP BY nat),
    cell AS (SELECT nat, bin, CAST(count(*) AS BIGINT) AS g
             FROM c GROUP BY nat, bin),
    grid AS (
        SELECT n.nat, n.ng, b.bin, b.gcount, COALESCE(cl.g, 0) AS g
        FROM nats n CROSS JOIN gb b
        LEFT JOIN cell cl ON cl.nat = n.nat AND cl.bin = b.bin
    ),
    cums AS (
        SELECT nat, ng,
               sum(g) OVER (PARTITION BY nat ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cg,
               sum(gcount) OVER (PARTITION BY nat ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS cgl
        FROM grid
    ),
    emd AS (
        SELECT nat, ng,
               CAST(sum(abs(cg * t.n - cgl * ng)) AS BIGINT) AS s,
               CAST(max(t.n) AS BIGINT) AS n, CAST(max(t.m) AS BIGINT) AS m
        FROM cums CROSS JOIN tot t
        GROUP BY nat, ng
    )
    SELECT na.n_name AS nation, e.ng AS n_customers,
           round(CAST(e.s AS DOUBLE)
                 / (CAST(e.ng * e.n AS DOUBLE) * (e.m - 1.0)), 6) AS emd
    FROM emd e JOIN nation na ON na.n_nationkey = e.nat
    ORDER BY emd DESC, nation LIMIT 10
    """,
)
def t_closeness_emd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness privacy audit: for each nation (the quasi-identifier
    group), the Earth Mover's Distance between its account-balance
    distribution and the global one over ordered $1000 bins — the
    sensitive-attribute-skew measure k-anonymity and l-diversity
    (``k_anonymity_audit``/``l_diversity_audit``) cannot see. Ordered-bin
    EMD is the cumulative-difference sum, cross-multiplied so every term
    is an exact integer: ``Σ_bins |cum_g·N − cum_G·n_g| / (n_g·N·(m−1))``.

    Scale shape: two map-side-combined groupBys onto (bin) and (nation,
    bin) histograms bounded by the value domain × 25 nations; the grid,
    windows, and fold all run over those bounded aggregates. The nation
    name join is a broadcast dim join."""
    nation = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bin"),
    )
    # ONE corpus pass: the (nation, bin) cell table is checkpointed and
    # the global-bin and per-nation histograms both derive from it
    # (executed-plan audit: 3 scans of customer without)
    cell = (
        c.groupBy("nat", "bin")
        .agg(F.count("*").cast("long").alias("g"))
        .localCheckpoint()
    )
    gb = cell.groupBy("bin").agg(F.sum("g").cast("long").alias("gcount"))
    tot = gb.agg(
        F.sum("gcount").cast("long").alias("n"),
        F.count("*").cast("long").alias("m"),
    )
    nats = cell.groupBy("nat").agg(F.sum("g").cast("long").alias("ng"))
    grid = (
        nats.crossJoin(gb)
        .join(cell, ["nat", "bin"], "left")
        .select(
            "nat",
            "ng",
            "bin",
            "gcount",
            F.coalesce(F.col("g"), F.lit(0)).alias("g"),
        )
    )
    w = Window.partitionBy("nat").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cums = grid.select(
        "nat",
        "ng",
        F.sum("g").over(w).alias("cg"),
        F.sum("gcount").over(w).alias("cgl"),
    )
    emd = (
        cums.crossJoin(F.broadcast(tot))
        .groupBy("nat", "ng")
        .agg(
            F.sum(
                F.abs(F.col("cg") * F.col("n") - F.col("cgl") * F.col("ng"))
            )
            .cast("long")
            .alias("s"),
            F.max("n").cast("long").alias("n"),
            F.max("m").cast("long").alias("m"),
        )
    )
    out = emd.join(
        F.broadcast(nation), nation.n_nationkey == emd.nat
    ).select(
        F.col("n_name").alias("nation"),
        F.col("ng").alias("n_customers"),
        F.round(
            F.col("s").cast("double")
            / (
                (F.col("ng") * F.col("n")).cast("double")
                * (F.col("m") - 1.0)
            ),
            6,
        ).alias("emd"),
    )
    return out.orderBy(F.col("emd").desc(), "nation").limit(10)


@register(
    "hill_tail_index",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH topk AS (
        SELECT o_totalprice AS v
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 101
    ),
    ref AS (SELECT min(v) AS x_ref, count(*) - 1 AS k FROM topk),
    terms AS (
        SELECT round(ln(t.v / r.x_ref), 12) AS term
        FROM topk t CROSS JOIN ref r
        WHERE t.v > r.x_ref
    ),
    s AS (
        SELECT CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS ssum
        FROM terms
    )
    SELECT CAST(r.k AS BIGINT) AS k, round(r.x_ref, 6) AS x_ref,
           round(CAST(r.k AS DOUBLE) / s.ssum, 6) AS hill_alpha
    FROM s CROSS JOIN ref r
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index for order values:
    ``α̂ = k / Σ ln(X_(i)/X_(k+1))`` over the top k=100 order statistics —
    the heavy-tail diagnostic that decides whether means/variances of a
    value column are even finite-sample-stable (α ≤ 2 means variance
    blow-ups; a skew warning for any Σvalue aggregate at 100 TB).

    Determinism: the top-101 VALUE multiset is engine-independent (ties
    beyond position 101 cannot change the multiset of kept values when
    ranked value-first), each ln term is round-12 and the sum decimal
    (order-free). k is FIXED at 100 = |top-101| − 1 (the conventional
    estimator): top-100 values tied with the reference X_(101) contribute
    ln(1)=0 to the sum but still count in k, so ties crossing the boundary
    do not change the statistic's meaning.

    Scale shape: one TakeOrderedAndProject(101) over the scan — the
    bounded-order-statistics pattern; no global sort."""
    o = load_table(spark, sf_dir, "orders")
    # the 101-row top-k feeds the reference aggregate and the term pass —
    # checkpoint so the TakeOrdered scan runs once
    topk = (
        o.select(F.col("o_totalprice").alias("v"), "o_orderkey")
        .orderBy(F.col("v").desc(), "o_orderkey")
        .limit(101)
        .select("v")
        .localCheckpoint()
    )
    ref = topk.agg(
        F.min("v").alias("x_ref"),
        (F.count("*") - 1).cast("long").alias("k"),
    )
    terms = (
        topk.crossJoin(F.broadcast(ref))
        .where(F.col("v") > F.col("x_ref"))
        .select(F.round(F.log(F.col("v") / F.col("x_ref")), 12).alias("term"))
    )
    s = terms.agg(
        F.sum(F.col("term").cast("decimal(38,12)"))
        .cast("double")
        .alias("ssum"),
    )
    return s.crossJoin(F.broadcast(ref)).select(
        "k",
        F.round("x_ref", 6).alias("x_ref"),
        F.round(F.col("k").cast("double") / F.col("ssum"), 6).alias(
            "hill_alpha"
        ),
    )


@register(
    "cramer_von_mises_segments",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH c AS (
        SELECT CAST(floor(c_acctbal) AS BIGINT) AS v,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ),
    hist AS (
        SELECT v, CAST(sum(isa) AS BIGINT) AS na_v,
               CAST(count(*) AS BIGINT) AS n_v
        FROM c GROUP BY v
    ),
    cum AS (
        SELECT n_v,
               sum(na_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
               sum(n_v - na_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cb
        FROM hist
    ),
    tot AS (
        SELECT CAST(sum(na_v) AS BIGINT) AS na,
               CAST(sum(n_v - na_v) AS BIGINT) AS nb
        FROM hist
    ),
    s AS (
        SELECT CAST(sum(CAST(n_v AS DECIMAL(38,0))
                        * CAST(ca * t.nb - cb * t.na AS DECIMAL(38,0))
                        * CAST(ca * t.nb - cb * t.na AS DECIMAL(38,0)))
                    AS DOUBLE) AS num,
               CAST(max(t.na) AS BIGINT) AS na,
               CAST(max(t.nb) AS BIGINT) AS nb
        FROM cum CROSS JOIN tot t
    )
    SELECT na AS n_building, nb AS n_automobile,
           round(num / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                        * CAST(na + nb AS DOUBLE)
                        * CAST(na + nb AS DOUBLE)), 6) AS t_cvm
    FROM s
    """,
)
def cramer_von_mises_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between BUILDING and
    AUTOMOBILE balances: ``T = (nm/N²)·Σ w_i (F_i − G_i)²`` over the
    pooled whole-dollar histogram — the integrated-squared companion of
    ``ks_test_two_sample``'s max statistic (KS sees the worst point; CvM
    sees the whole ECDF gap). Cross-multiplied so every term is the
    integer ``w·(cumA·nb − cumB·na)²`` (squared in DECIMAL(38,0) —
    BIGINT would overflow beyond ~3e9 such cross terms), one division
    at output.

    Scale shape: identical to the Mann-Whitney recipe — one map-side-
    combined groupBy onto the bounded value histogram, one ordered
    window over it, one global fold."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(
            F.floor("c_acctbal").cast("long").alias("v"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("isa"),
        )
    )
    hist = c.groupBy("v").agg(
        F.sum("isa").cast("long").alias("na_v"),
        F.count("*").cast("long").alias("n_v"),
    ).localCheckpoint()  # feeds the ECDF walk AND the group totals
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "n_v",
        F.sum("na_v").over(w).alias("ca"),
        F.sum(F.col("n_v") - F.col("na_v")).over(w).alias("cb"),
    )
    tot = hist.agg(
        F.sum("na_v").cast("long").alias("na"),
        F.sum(F.col("n_v") - F.col("na_v")).cast("long").alias("nb"),
    )
    diff = (
        F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
    ).cast("decimal(38,0)")
    s = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.col("n_v").cast("decimal(38,0)") * diff * diff)
            .cast("double")
            .alias("num"),
            F.max("na").cast("long").alias("na"),
            F.max("nb").cast("long").alias("nb"),
        )
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    return s.select(
        F.col("na").alias("n_building"),
        F.col("nb").alias("n_automobile"),
        F.round(
            F.col("num") / (na * nb * (na + nb) * (na + nb)), 6
        ).alias("t_cvm"),
    )


@register(
    "permutation_test_signflip",
    tags=("analytics", "stats", "experiment"),
    defer=True,
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                                   AND ts >= TIMESTAMP '2024-01-16'
                             THEN value ELSE 0.0 END AS DECIMAL(38,6)))
                    - SUM(CAST(CASE WHEN event_type = 'purchase'
                                     AND ts < TIMESTAMP '2024-01-16'
                               THEN value ELSE 0.0 END AS DECIMAL(38,6)))
                    AS DECIMAL(38,6)) AS d
        FROM events WHERE user_id < 300 GROUP BY user_id
    ),
    obs AS (
        SELECT CAST(sum(d) AS DOUBLE) AS t_obs,
               CAST(count(*) AS BIGINT) AS n_users
        FROM per_user
    ),
    flips AS (
        SELECT b.b,
               CAST(sum(CASE WHEN
                   (('0x' || substr(md5('perm:' || CAST(b.b AS VARCHAR)
                        || ':' || CAST(p.user_id AS VARCHAR)), 1, 15))
                        ::BIGINT) % 2 = 0
                   THEN p.d ELSE -p.d END) AS DOUBLE) AS t_b
        FROM per_user p
        CROSS JOIN (SELECT unnest(generate_series(1, 199)) AS b) b
        GROUP BY b.b
    ),
    cnt AS (
        SELECT CAST(sum(CASE WHEN abs(f.t_b) >= abs(o.t_obs)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
               CAST(count(*) AS BIGINT) AS n_perm
        FROM flips f CROSS JOIN obs o
    )
    SELECT o.n_users, round(o.t_obs, 6) AS t_obs, c.n_perm, c.n_ge,
           round(CAST(1 + c.n_ge AS DOUBLE) / (c.n_perm + 1), 6)
               AS p_value
    FROM obs o CROSS JOIN cnt c
    """,
)
def permutation_test_signflip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-flip randomization test for the paired pre/post purchase
    uplift: per user, d = post-period − pre-period purchase value; under
    H0 (no period effect, symmetric d) each d's sign is exchangeable, so
    the null distribution is T_b = Σ s_{b,u}·d_u over deterministic h60
    sign patterns, and the Monte-Carlo p-value is (1 + #{|T_b| ≥
    |T_obs|})/(B+1) — exact-level inference with NO distributional
    assumptions, complementing the parametric ``ab_test_zscore``.

    Determinism: d is a decimal difference; each T_b is a decimal sum of
    ±d (order-free, exactly representable), signs from the cross-engine
    h60 — the flip table is the ``poisson_bootstrap_ci`` pattern: the
    B=199 crossJoin PIPELINES through the map-side partial aggregate, so
    the expansion never materializes.

    Scale shape: one groupBy(user), one pipelined replicate aggregate
    (B·users partial rows folded map-side), two 1-row folds."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 300)
    split = F.lit("2024-01-16").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        (
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= split),
                    F.col("value"),
                )
                .otherwise(0.0)
                .cast("decimal(38,6)")
            )
            - F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < split),
                    F.col("value"),
                )
                .otherwise(0.0)
                .cast("decimal(38,6)")
            )
        )
        .cast("decimal(38,6)")
        .alias("d")
    ).localCheckpoint()  # feeds T_obs AND the B=199 flip replicates
    obs = per_user.agg(
        F.sum("d").cast("double").alias("t_obs"),
        F.count("*").cast("long").alias("n_users"),
    )
    bs = spark.range(1, 200).select(F.col("id").alias("b"))
    sign_key = h60(
        F.concat(
            F.lit("perm:"),
            F.col("b").cast("string"),
            F.lit(":"),
            F.col("user_id").cast("string"),
        )
    )
    flips = (
        per_user.crossJoin(bs)
        .groupBy("b")
        .agg(
            F.sum(
                F.when(sign_key % 2 == 0, F.col("d")).otherwise(-F.col("d"))
            )
            .cast("double")
            .alias("t_b")
        )
    )
    cnt = flips.crossJoin(F.broadcast(obs.select("t_obs"))).agg(
        F.sum(
            F.when(F.abs(F.col("t_b")) >= F.abs(F.col("t_obs")), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_ge"),
        F.count("*").cast("long").alias("n_perm"),
    )
    return obs.crossJoin(F.broadcast(cnt)).select(
        "n_users",
        F.round("t_obs", 6).alias("t_obs"),
        "n_perm",
        "n_ge",
        F.round(
            (1 + F.col("n_ge")).cast("double") / (F.col("n_perm") + 1), 6
        ).alias("p_value"),
    )


@register(
    "anova_oneway_segments",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH g AS (
        SELECT c_mktsegment AS seg,
               CAST(count(*) AS BIGINT) AS ng,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sg,
               CAST(sum(CAST(round(c_acctbal * c_acctbal, 12)
                        AS DECIMAL(38,12))) AS DOUBLE) AS sg2
        FROM customer GROUP BY c_mktsegment
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(CAST(sg AS DECIMAL(38,6))) AS DOUBLE) AS s
        FROM g
    ),
    terms AS (
        SELECT t.k, t.n,
               round(g.ng * (g.sg / g.ng - t.s / t.n)
                          * (g.sg / g.ng - t.s / t.n), 6) AS tb,
               round(g.sg2 - g.sg * g.sg / g.ng, 6) AS tw
        FROM g CROSS JOIN t
    ),
    f AS (
        SELECT max(k) AS k, max(n) AS n,
               CAST(sum(CAST(tb AS DECIMAL(38,6))) AS DOUBLE) AS ssb,
               CAST(sum(CAST(tw AS DECIMAL(38,6))) AS DOUBLE) AS ssw
        FROM terms
    )
    SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_customers,
           round(ssb, 6) AS ss_between,
           round(ssw, 6) AS ss_within,
           round((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
           round(ssb / (ssb + ssw), 6) AS eta_squared
    FROM f
    """,
)
def anova_oneway_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across the five market segments on account balance:
    F = (SSB/(k−1))/(SSW/(N−k)) with effect size η² = SSB/SST — the
    parametric k-group mean comparison completing the two-group tests
    (``ab_test_zscore``, ``mann_whitney_u_segments``). Sums of squares
    use the GROUP-MEAN form ``SSB = Σ n_g(m_g − m)²`` rather than the
    raw-moment form ``Σ S_g²/n_g − S²/N``: the latter subtracts ~1e13
    quantities to get a ~1e7 answer, and round-12 is no longer a
    determinism no-op at 1e13 magnitudes (value·10¹² overflows the exact
    double range) — the cancellation amplified the per-engine rounding
    ulps straight into the output. Group terms are small, round-6-exact,
    and DECIMAL(38,6)-summed; SST = SSB + SSW by construction.

    Scale shape: one map-side-combined groupBy(segment) then a k-row
    fold — the ANOVA never sees rows twice."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").cast("long").alias("ng"),
        F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
        .cast("double")
        .alias("sg"),
        F.sum(
            F.round(F.col("c_acctbal") * F.col("c_acctbal"), 12).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("sg2"),
    ).localCheckpoint()  # the k-row moments feed the totals AND the terms
    t = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(F.col("sg").cast("decimal(38,6)")).cast("double").alias("s"),
    )
    dev = F.col("sg") / F.col("ng") - F.col("s") / F.col("n")
    terms = g.crossJoin(F.broadcast(t)).select(
        "k",
        "n",
        F.round(F.col("ng") * dev * dev, 6).alias("tb"),
        F.round(
            F.col("sg2") - F.col("sg") * F.col("sg") / F.col("ng"), 6
        ).alias("tw"),
    )
    f = terms.agg(
        F.max("k").alias("k"),
        F.max("n").alias("n"),
        F.sum(F.col("tb").cast("decimal(38,6)")).cast("double").alias("ssb"),
        F.sum(F.col("tw").cast("decimal(38,6)")).cast("double").alias("ssw"),
    )
    return f.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_customers"),
        F.round("ssb", 6).alias("ss_between"),
        F.round("ssw", 6).alias("ss_within"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(
            F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6
        ).alias("eta_squared"),
    )


@register(
    "kruskal_wallis_segments",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH c AS (
        SELECT CAST(floor(c_acctbal) AS BIGINT) AS v, c_mktsegment AS seg
        FROM customer
    ),
    hist AS (
        SELECT v, seg, CAST(count(*) AS BIGINT) AS n_gv
        FROM c GROUP BY v, seg
    ),
    vt AS (
        SELECT v, CAST(sum(n_gv) AS BIGINT) AS n_v FROM hist GROUP BY v
    ),
    cum AS (
        SELECT v, n_v,
               sum(n_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - n_v
                   AS cum_before
        FROM vt
    ),
    rg AS (
        SELECT h.seg,
               CAST(sum(h.n_gv * (2 * c.cum_before + c.n_v + 1))
                    AS BIGINT) AS two_r,
               CAST(sum(h.n_gv) AS BIGINT) AS ng
        FROM hist h JOIN cum c ON h.v = c.v
        GROUP BY h.seg
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(CAST(round(
                   CAST(CAST(two_r AS DECIMAL(38,0))
                        * CAST(two_r AS DECIMAL(38,0)) AS DOUBLE)
                   / (4.0 * ng), 12) AS DECIMAL(38,12))) AS DOUBLE) AS sr2
        FROM rg
    ),
    ties AS (
        SELECT CAST(sum(n_v * n_v * n_v - n_v) AS BIGINT) AS tie_term
        FROM vt
    )
    SELECT t.k AS n_groups, t.n AS n_customers,
           round(12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * t.sr2
                 - 3.0 * (t.n + 1), 6) AS h_stat,
           round((12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * t.sr2
                  - 3.0 * (t.n + 1))
                 / (1.0 - CAST(ti.tie_term AS DOUBLE)
                    / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)), 6)
               AS h_stat_tie_adj
    FROM tot t CROSS JOIN ties ti
    """,
)
def kruskal_wallis_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank ANOVA across all five market segments — the
    nonparametric companion of ``anova_oneway_segments`` (H is the
    rank-variance statistic; with k=2 it reduces to Mann-Whitney). Rank
    sums come from the pooled whole-dollar value histogram (the
    2·avgrank integer trick per distinct value), each group's Rg² taken
    in DECIMAL(38,0) before the /4ng division ((2R)² exceeds 2^53 on
    ~100k-row groups), with the standard tie correction
    1 − Σ(t³−t)/(N³−N).

    Scale shape: one groupBy onto the (value, segment) histogram, one
    ordered window over the bounded value spine, one k-row fold."""
    c = load_table(spark, sf_dir, "customer").select(
        F.floor("c_acctbal").cast("long").alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    # the (value, segment) histogram feeds the pooled spine AND the rank
    # join; the spine feeds the ranks AND the tie term — checkpoint both
    # so customer scans once (executed-plan audit: 3 scans without)
    hist = c.groupBy("v", "seg").agg(
        F.count("*").cast("long").alias("n_gv")
    ).localCheckpoint()
    vt = (
        hist.groupBy("v")
        .agg(F.sum("n_gv").cast("long").alias("n_v"))
        .localCheckpoint()
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vt.select(
        "v",
        "n_v",
        (F.sum("n_v").over(w) - F.col("n_v")).alias("cum_before"),
    )
    rg = (
        hist.join(cum, "v")
        .groupBy("seg")
        .agg(
            F.sum(
                F.col("n_gv") * (2 * F.col("cum_before") + F.col("n_v") + 1)
            )
            .cast("long")
            .alias("two_r"),
            F.sum("n_gv").cast("long").alias("ng"),
        )
    )
    two_r_dec = F.col("two_r").cast("decimal(38,0)")
    tot = rg.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(
            F.round(
                (two_r_dec * two_r_dec).cast("double") / (4.0 * F.col("ng")),
                12,
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("sr2"),
    )
    ties = vt.agg(
        F.sum(F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v"))
        .cast("long")
        .alias("tie_term")
    )
    nd = F.col("n").cast("double")
    h = 12.0 / (nd * (F.col("n") + 1)) * F.col("sr2") - 3.0 * (F.col("n") + 1)
    corr = 1.0 - F.col("tie_term").cast("double") / (nd * F.col("n") * F.col("n") - F.col("n"))
    return tot.crossJoin(F.broadcast(ties)).select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_customers"),
        F.round(h, 6).alias("h_stat"),
        F.round(h / corr, 6).alias("h_stat_tie_adj"),
    )


_BENFORD_P = {
    1: "0.301029995664", 2: "0.176091259056", 3: "0.124938736608",
    4: "0.096910013008", 5: "0.079181246048", 6: "0.066946789631",
    7: "0.057991946978", 8: "0.051152522447", 9: "0.045757490561",
}


def _benford_case_sql() -> str:
    whens = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
    )
    return f"CASE d {whens} END"


@register(
    "benford_gof_chi2",
    tags=("tpch", "analytics", "stats"),
    defer=True,
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT d, CAST(count(*) AS BIGINT) AS o FROM digits GROUP BY d
    ),
    grid AS (
        SELECT g.d, COALESCE(c.o, 0) AS o, {_benford_case_sql().replace('CASE d', 'CASE g.d')} AS p
        FROM (SELECT unnest(generate_series(1, 9)) AS d) g
        LEFT JOIN counts c ON c.d = g.d
    ),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM grid),
    terms AS (
        SELECT round((o - t.n * p) * (o - t.n * p) / (t.n * p), 12)
                   AS term, t.n
        FROM grid CROSS JOIN tot t
    )
    SELECT CAST(max(n) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS chi2_gof,
           CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE) > 15.507
               AS reject_benford_05
    FROM terms
    """,
)
def benford_gof_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of order-value first digits to
    Benford's law — the decision-rule companion of
    ``benford_first_digit``'s descriptive profile: χ² = Σ_d (o_d −
    n·p_d)²/(n·p_d) over all nine digits (zero-count digits included via
    the digit grid) against the df=8, α=0.05 critical value 15.507. The
    p_d are shared 12-dp literals (no per-engine log10 calls), so every
    term is deterministic IEEE arithmetic, round-12 + decimal-summed.

    Scale shape: one string-extracted digit groupBy (9 rows) and a 9-row
    fold."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").cast("long").alias("o"))
    grid_base = spark.range(1, 10).select(F.col("id").alias("d"))
    p_expr = F.lit(None).cast("double")
    for dd, pp in _BENFORD_P.items():
        p_expr = F.when(F.col("d") == dd, F.lit(float(pp))).otherwise(p_expr)
    # the 9-row grid feeds the total AND the term fold — checkpoint so
    # orders scans once
    grid = grid_base.join(counts, "d", "left").select(
        "d", F.coalesce(F.col("o"), F.lit(0)).alias("o"), p_expr.alias("p")
    ).localCheckpoint()
    tot = grid.agg(F.sum("o").cast("long").alias("n"))
    terms = grid.crossJoin(F.broadcast(tot)).select(
        "n",
        F.round(
            (F.col("o") - F.col("n") * F.col("p"))
            * (F.col("o") - F.col("n") * F.col("p"))
            / (F.col("n") * F.col("p")),
            12,
        ).alias("term"),
    )
    chi2 = F.sum(F.col("term").cast("decimal(38,12)")).cast("double")
    return terms.agg(
        F.max("n").cast("long").alias("n_orders"),
        F.round(chi2, 6).alias("chi2_gof"),
        (chi2 > 15.507).alias("reject_benford_05"),
    )


@register(
    "partial_correlation_daily",
    tags=("analytics", "stats"),
    defer=True,
    oracle=f"""
    WITH daily AS ({_ORACLE_DAILY.replace("AS y", "AS y")}),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   AS sy,
               CAST(sum(CAST(round(y * y, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS syy,
               CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS sxy,
               CAST(sum(idx) AS BIGINT) AS sz,
               CAST(sum(idx * idx) AS BIGINT) AS szz,
               CAST(sum(x * idx) AS BIGINT) AS sxz,
               CAST(sum(CAST(round(y * idx, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS syz
        FROM daily
    ),
    r AS (
        SELECT n,
               (n * sxy - sx * sy)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(n * syy - sy * sy)) AS rxy,
               CAST(n * sxz - sx * sz AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS rxz,
               (n * syz - sy * sz)
               / (sqrt(n * syy - sy * sy)
                  * sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS ryz
        FROM m
    )
    SELECT n AS n_days,
           round(rxy, 6) AS r_xy,
           round(rxz, 6) AS r_xtime,
           round(ryz, 6) AS r_ytime,
           round((rxy - rxz * ryz)
                 / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz)), 6)
               AS partial_r_xy_given_time
    FROM r
    """,
)
def partial_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of daily event volume and purchase revenue
    CONTROLLING FOR TIME (the day index): ``r_xy·z = (r_xy − r_xz·r_zy) /
    √((1−r_xz²)(1−r_zy²))`` — the de-trended association, separating "busy
    days earn more" from "both just grew over the month". Every Pearson r
    comes from the same exact integer/decimal moments as
    ``spearman_corr_daily``'s machinery; the partial-r formula is a
    handful of IEEE ops spelled identically in both engines.

    Scale shape: one map-side-combined groupBy(day) and a 1-row fold."""
    daily = _daily_events(spark, sf_dir)
    x, y, z = F.col("x"), F.col("y"), F.col("idx")
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(F.round(y, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sy"),
        F.sum(F.round(y * y, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.round(x * y, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum(z).cast("long").alias("sz"),
        F.sum(z * z).cast("long").alias("szz"),
        F.sum(x * z).cast("long").alias("sxz"),
        F.sum(F.round(y * z, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("syz"),
    )
    n = F.col("n")
    sxx_c = F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    syy_c = F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    szz_c = F.sqrt((n * F.col("szz") - F.col("sz") * F.col("sz")).cast("double"))
    rxy = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (sxx_c * syy_c)
    rxz = (n * F.col("sxz") - F.col("sx") * F.col("sz")).cast("double") / (
        sxx_c * szz_c
    )
    ryz = (n * F.col("syz") - F.col("sy") * F.col("sz")) / (syy_c * szz_c)
    r = m.select(
        n.alias("n"),
        rxy.alias("rxy"),
        rxz.alias("rxz"),
        ryz.alias("ryz"),
    )
    part = (F.col("rxy") - F.col("rxz") * F.col("ryz")) / (
        F.sqrt(1.0 - F.col("rxz") * F.col("rxz"))
        * F.sqrt(1.0 - F.col("ryz") * F.col("ryz"))
    )
    return r.select(
        F.col("n").alias("n_days"),
        F.round("rxy", 6).alias("r_xy"),
        F.round("rxz", 6).alias("r_xtime"),
        F.round("ryz", 6).alias("r_ytime"),
        F.round(part, 6).alias("partial_r_xy_given_time"),
    )


@register(
    "two_proportion_ztest_weekend",
    tags=("analytics", "stats", "experiment"),
    defer=True,
    oracle="""
    WITH e AS (
        SELECT CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END
                   AS is_weekend,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ),
    s AS (
        SELECT CAST(sum(is_weekend) AS BIGINT) AS n1,
               CAST(sum(is_weekend * conv) AS BIGINT) AS c1,
               CAST(sum(1 - is_weekend) AS BIGINT) AS n2,
               CAST(sum((1 - is_weekend) * conv) AS BIGINT) AS c2
        FROM e
    )
    SELECT n1 AS n_weekend, c1 AS conv_weekend,
           n2 AS n_weekday, c2 AS conv_weekday,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS p_weekend,
           round(CAST(c2 AS DOUBLE) / n2, 6) AS p_weekday,
           round((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
                 / sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                        * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 6) AS z_score
    FROM s
    """,
)
def two_proportion_ztest_weekend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-proportion z-test: is the purchase-event rate different on
    weekends? Pooled-variance z on exact integer counts — the
    proportion-metric member of the test family (means:
    ``ab_test_zscore``; ranks: ``mann_whitney_u_segments``; paired:
    ``mcnemar_langid_classifiers``). ``weekday()+1`` mirrors DuckDB's
    isodow (the ``seasonal_decompose_daily`` lesson).

    Scale shape: one global integer fold; no shuffle wider than 1 row."""
    e = load_table(spark, sf_dir, "events")
    is_we = F.when(F.weekday(F.to_date("ts")) + 1 >= 6, 1).otherwise(0)
    conv = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    s = e.select(is_we.alias("w"), conv.alias("c")).agg(
        F.sum("w").cast("long").alias("n1"),
        F.sum(F.col("w") * F.col("c")).cast("long").alias("c1"),
        F.sum(1 - F.col("w")).cast("long").alias("n2"),
        F.sum((1 - F.col("w")) * F.col("c")).cast("long").alias("c2"),
    )
    n1, c1 = F.col("n1").cast("double"), F.col("c1").cast("double")
    n2, c2 = F.col("n2").cast("double"), F.col("c2").cast("double")
    pool = (c1 + c2) / (n1 + n2)
    z = (c1 / n1 - c2 / n2) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / n1 + 1.0 / n2)
    )
    return s.select(
        F.col("n1").alias("n_weekend"),
        F.col("c1").alias("conv_weekend"),
        F.col("n2").alias("n_weekday"),
        F.col("c2").alias("conv_weekday"),
        F.round(c1 / n1, 6).alias("p_weekend"),
        F.round(c2 / n2, 6).alias("p_weekday"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "moods_median_test_segments",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH c AS (
        SELECT CAST(floor(c_acctbal) AS BIGINT) AS v, c_mktsegment AS seg
        FROM customer
    ),
    vt AS (SELECT v, CAST(count(*) AS BIGINT) AS n_v FROM c GROUP BY v),
    tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n FROM vt),
    med AS (
        SELECT min(v) AS m FROM (
            SELECT v,
                   sum(n_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS cum
            FROM vt
        ) CROSS JOIN tot WHERE cum >= (n + 1) // 2
    ),
    cells AS (
        SELECT seg,
               CAST(sum(CASE WHEN v > m THEN 1 ELSE 0 END) AS BIGINT)
                   AS above,
               CAST(count(*) AS BIGINT) AS ng
        FROM c CROSS JOIN med GROUP BY seg
    ),
    m2 AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(above) AS BIGINT) AS ta
        FROM cells
    ),
    terms AS (
        SELECT m2.k, m2.n,
               round(CAST(CAST(above * m2.n - ng * m2.ta AS DECIMAL(38,0))
                          * CAST(above * m2.n - ng * m2.ta AS DECIMAL(38,0))
                     AS DOUBLE)
                     / CAST(ng AS DOUBLE) / m2.ta
                     / (m2.n - m2.ta), 12) AS term
        FROM cells CROSS JOIN m2
    )
    SELECT CAST(max(k) AS BIGINT) AS n_groups,
           CAST(max(n) AS BIGINT) AS n_customers,
           (SELECT CAST(m AS BIGINT) FROM med) AS pooled_median,
           round(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS chi2_median_test
    FROM terms
    """,
)
def moods_median_test_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mood's median test: do the five market segments share one median
    balance? The pooled (lower) median comes exactly from the value
    histogram (rank ``(N+1) DIV 2`` — the ``length_percentile_filter``
    recipe); each group's above-median count feeds the k×2 chi² in the
    cross-multiplied integer form ``Σ_g (a_g·N − n_g·A)² / (n_g·A·(N−A))``
    (squares in DECIMAL(38,0); algebraically the standard (o−e)²/e summed
    over both columns of each group's row — collapsing both cells of row g
    gives ((a_g·N − n_g·A)/N)² · N²/(n_g·A·(N−A)), the N² cancels).

    Scale shape: one histogram groupBy, one window over the bounded value
    spine for the median, one groupBy(segment), a k-row fold."""
    c = load_table(spark, sf_dir, "customer").select(
        F.floor("c_acctbal").cast("long").alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    # ONE corpus pass: the (value, segment) histogram is checkpointed and
    # feeds both the pooled-median walk and the per-segment cells (the
    # executed-plan audit measured 6 scans of customer when raw rows were
    # re-aggregated per branch)
    histc = (
        c.groupBy("v", "seg")
        .agg(F.count("*").cast("long").alias("n_c"))
        .localCheckpoint()
    )
    vt = histc.groupBy("v").agg(F.sum("n_c").cast("long").alias("n_v"))
    tot = vt.agg(F.sum("n_v").cast("long").alias("n"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        vt.select("v", F.sum("n_v").over(w).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cum") >= F.expr("(n + 1) DIV 2"))
        .agg(F.min("v").alias("m"))
    )
    cells = (
        histc.crossJoin(F.broadcast(med))
        .groupBy("seg")
        .agg(
            F.sum(F.when(F.col("v") > F.col("m"), F.col("n_c")).otherwise(0))
            .cast("long")
            .alias("above"),
            F.sum("n_c").cast("long").alias("ng"),
        )
    )
    m2 = cells.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("above").cast("long").alias("ta"),
    )
    num = (
        F.col("above") * F.col("n") - F.col("ng") * F.col("ta")
    ).cast("decimal(38,0)")
    term = F.round(
        (num * num).cast("double")
        / F.col("ng").cast("double")
        / F.col("ta")
        / (F.col("n") - F.col("ta")),
        12,
    )
    terms = cells.crossJoin(F.broadcast(m2)).select(
        "k", "n", term.alias("term")
    )
    chi2 = F.sum(F.col("term").cast("decimal(38,12)")).cast("double")
    return (
        terms.agg(
            F.max("k").cast("long").alias("n_groups"),
            F.max("n").cast("long").alias("n_customers"),
            F.round(chi2, 6).alias("chi2_median_test"),
        )
        .crossJoin(F.broadcast(med))
        .select(
            "n_groups",
            "n_customers",
            F.col("m").cast("long").alias("pooled_median"),
            "chi2_median_test",
        )
        .select(
            "n_groups", "n_customers", "pooled_median", "chi2_median_test"
        )
    )


@register(
    "cochran_q_classifiers",
    tags=("llm", "text", "stats"),
    defer=True,
    oracle=f"""
    WITH pred AS (
        SELECT lang,
               CASE WHEN ({_pred_sql(LANG_PROFILES)}) = lang
                    THEN 1 ELSE 0 END AS xa,
               CASE WHEN ({_pred_sql(WORD_PROFILES)}) = lang
                    THEN 1 ELSE 0 END AS xb,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS xc
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(xa) AS BIGINT) AS ga,
               CAST(sum(xb) AS BIGINT) AS gb,
               CAST(sum(xc) AS BIGINT) AS gc,
               CAST(sum(xa + xb + xc) AS BIGINT) AS sl,
               CAST(sum((xa + xb + xc) * (xa + xb + xc)) AS BIGINT) AS sl2
        FROM pred
    )
    SELECT n_docs, ga AS correct_bigram, gb AS correct_marker,
           gc AS correct_majority,
           CASE WHEN 3 * sl - sl2 = 0 THEN 0.0
                ELSE round(2.0 * CAST(3 * (ga * ga + gb * gb + gc * gc)
                                      - sl * sl AS DOUBLE)
                           / CAST(3 * sl - sl2 AS DOUBLE), 6)
           END AS cochran_q
    FROM s
    """,
)
def cochran_q_classifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q for k=3 PAIRED classifiers on the same documents — the
    k-treatment generalization of McNemar (``mcnemar_langid_classifiers``):
    bigram-profile vs word-marker vs the always-'en' majority baseline,
    ``Q = (k−1)·(k·ΣG_j² − (ΣG_j)²) / (k·ΣL_i − ΣL_i²)`` with G_j =
    per-classifier correct totals and L_i = per-document correct counts —
    every quantity an exact BIGINT, one division at output (the
    all-classifiers-agree degenerate denominator maps to Q=0 in both
    engines).

    Scale shape: embarrassingly parallel scoring, one global integer
    fold."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    lang = F.col("lang")
    pred = d.select(
        F.when(_pred_col(LANG_PROFILES) == lang, 1).otherwise(0).alias("xa"),
        F.when(_pred_col(WORD_PROFILES) == lang, 1).otherwise(0).alias("xb"),
        F.when(lang == "en", 1).otherwise(0).alias("xc"),
    )
    li = F.col("xa") + F.col("xb") + F.col("xc")
    s = pred.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("xa").cast("long").alias("ga"),
        F.sum("xb").cast("long").alias("gb"),
        F.sum("xc").cast("long").alias("gc"),
        F.sum(li).cast("long").alias("sl"),
        F.sum(li * li).cast("long").alias("sl2"),
    )
    ga, gb, gc = F.col("ga"), F.col("gb"), F.col("gc")
    sl, sl2 = F.col("sl"), F.col("sl2")
    q = F.when(3 * sl - sl2 == 0, F.lit(0.0)).otherwise(
        F.round(
            2.0
            * (3 * (ga * ga + gb * gb + gc * gc) - sl * sl).cast("double")
            / (3 * sl - sl2).cast("double"),
            6,
        )
    )
    return s.select(
        "n_docs",
        ga.alias("correct_bigram"),
        gb.alias("correct_marker"),
        gc.alias("correct_majority"),
        q.alias("cochran_q"),
    )


@register(
    "durbin_watson_daily",
    tags=("analytics", "stats", "timeseries"),
    defer=True,
    oracle=f"""
    WITH daily AS ({_ORACLE_DAILY}),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(idx) AS BIGINT) AS st,
               CAST(sum(idx * idx) AS BIGINT) AS stt,
               CAST(sum(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   AS sy,
               CAST(sum(CAST(round(idx * y, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS sty
        FROM daily
    ),
    coef AS (
        SELECT n,
               (n * sty - st * sy)
               / CAST(n * stt - st * st AS DOUBLE) AS beta,
               (sy - (n * sty - st * sy)
                     / CAST(n * stt - st * st AS DOUBLE) * st) / n
                   AS alpha
        FROM m
    ),
    resid AS (
        SELECT d.idx, d.y - c.alpha - c.beta * d.idx AS e, c.n, c.beta
        FROM daily d CROSS JOIN coef c
    ),
    lagged AS (
        SELECT e, lag(e) OVER (ORDER BY idx) AS ep, n, beta
        FROM resid
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           round(max(beta), 6) AS ols_slope,
           round(CAST(sum(CASE WHEN ep IS NULL THEN NULL
                          ELSE CAST(round((e - ep) * (e - ep), 12)
                               AS DECIMAL(38,12)) END) AS DOUBLE)
                 / CAST(sum(CAST(round(e * e, 12) AS DECIMAL(38,12)))
                        AS DOUBLE), 6) AS durbin_watson
    FROM lagged
    """,
)
def durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson residual-autocorrelation statistic for the OLS trend
    of daily purchase revenue: ``DW = Σ(e_t − e_{t−1})² / Σe_t²`` (≈2 means
    uncorrelated residuals; <2 positive autocorrelation — the standard
    check that a fitted daily trend hasn't left serial structure the
    forecasting operators should model instead). The OLS fit comes from
    exact integer/decimal moments; residuals are deterministic per-row
    IEEE arithmetic against the broadcast 1-row coefficients; both
    quadratic sums are round-12 + decimal (order-free).

    Scale shape: one groupBy(day), a broadcast coefficient join, one lag
    window over the bounded calendar aggregate, one fold."""
    daily = _daily_events(spark, sf_dir)
    t, y = F.col("idx"), F.col("y")
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(t).cast("long").alias("st"),
        F.sum(t * t).cast("long").alias("stt"),
        F.sum(F.round(y, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sy"),
        F.sum(F.round(t * y, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sty"),
    )
    n = F.col("n")
    beta = (n * F.col("sty") - F.col("st") * F.col("sy")) / (
        n * F.col("stt") - F.col("st") * F.col("st")
    ).cast("double")
    coef = m.select(
        n.alias("n"),
        beta.alias("beta"),
        ((F.col("sy") - beta * F.col("st")) / n).alias("alpha"),
    )
    resid = daily.crossJoin(F.broadcast(coef)).select(
        "idx",
        (y - F.col("alpha") - F.col("beta") * t).alias("e"),
        "n",
        "beta",
    )
    w = Window.orderBy("idx")
    lagged = resid.select(
        "e", F.lag("e").over(w).alias("ep"), "n", "beta"
    )
    num = F.sum(
        F.when(F.col("ep").isNull(), None).otherwise(
            F.round(
                (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep")), 12
            ).cast("decimal(38,12)")
        )
    ).cast("double")
    den = F.sum(
        F.round(F.col("e") * F.col("e"), 12).cast("decimal(38,12)")
    ).cast("double")
    return lagged.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.max("beta"), 6).alias("ols_slope"),
        F.round(num / den, 6).alias("durbin_watson"),
    )


@register(
    "mcc_binary_langid",
    tags=("llm", "text", "stats"),
    defer=True,
    oracle=f"""
    WITH pred AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
               CASE WHEN ({_pred_sql(LANG_PROFILES)}) = 'en'
                    THEN 1 ELSE 0 END AS p
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT CAST(sum(t * p) AS BIGINT) AS tp,
               CAST(sum((1 - t) * (1 - p)) AS BIGINT) AS tn,
               CAST(sum((1 - t) * p) AS BIGINT) AS fp,
               CAST(sum(t * (1 - p)) AS BIGINT) AS fn
        FROM pred
    )
    SELECT tp, tn, fp, fn,
           CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) = 0
                THEN 0.0
                ELSE round(CAST(tp * tn - fp * fn AS DOUBLE)
                     / (sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE))
                        * sqrt(CAST((tn + fp) * (tn + fn) AS DOUBLE))), 6)
           END AS mcc
    FROM s
    """,
)
def mcc_binary_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient for the binary is-English
    detection task (bigram classifier vs the fixture label) — the
    class-imbalance-robust single-number binary metric the accuracy/F1
    family lacks: MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)),
    exactly the Pearson correlation of the two binary variables. All
    confusion cells are exact integers; the four-factor product splits
    into two sqrt factors so nothing exceeds 2^53; degenerate margins
    map to 0 identically in both engines.

    Scale shape: embarrassingly parallel scoring, one 1-row integer
    fold."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    t = F.when(F.col("lang") == "en", 1).otherwise(0)
    p = F.when(_pred_col(LANG_PROFILES) == "en", 1).otherwise(0)
    s = d.select(t.alias("t"), p.alias("p")).agg(
        F.sum(F.col("t") * F.col("p")).cast("long").alias("tp"),
        F.sum((1 - F.col("t")) * (1 - F.col("p"))).cast("long").alias("tn"),
        F.sum((1 - F.col("t")) * F.col("p")).cast("long").alias("fp"),
        F.sum(F.col("t") * (1 - F.col("p"))).cast("long").alias("fn"),
    )
    tp, tn, fp, fn = F.col("tp"), F.col("tn"), F.col("fp"), F.col("fn")
    mcc = F.when(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) == 0, F.lit(0.0)
    ).otherwise(
        F.round(
            (tp * tn - fp * fn).cast("double")
            / (
                F.sqrt(((tp + fp) * (tp + fn)).cast("double"))
                * F.sqrt(((tn + fp) * (tn + fn)).cast("double"))
            ),
            6,
        )
    )
    return s.select("tp", "tn", "fp", "fn", mcc.alias("mcc"))


@register(
    "cohens_d_weekend_value",
    tags=("analytics", "stats", "experiment"),
    defer=True,
    oracle="""
    WITH e AS (
        SELECT CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END
                   AS w,
               value AS v
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s,
               CAST(sum(CAST(round(v * v, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS s2
        FROM e GROUP BY w
    ),
    sides AS (
        SELECT max(CASE WHEN w = 1 THEN n END) AS n1,
               max(CASE WHEN w = 1 THEN s END) AS s1,
               max(CASE WHEN w = 1 THEN s2 END) AS s21,
               max(CASE WHEN w = 0 THEN n END) AS n2,
               max(CASE WHEN w = 0 THEN s END) AS s2_,
               max(CASE WHEN w = 0 THEN s2 END) AS s22
        FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT) AS n_weekday,
           round(s1 / n1 - s2_ / n2, 6) AS mean_diff,
           round((s1 / n1 - s2_ / n2)
                 / sqrt(((s21 - s1 * s1 / n1) + (s22 - s2_ * s2_ / n2))
                        / (n1 + n2 - 2)), 6) AS cohens_d
    FROM sides
    """,
)
def cohens_d_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size for weekend vs weekday purchase
    values — the practical-significance companion of the z/permutation
    tests (a tiny p-value with d≈0 is a large-sample artifact, not an
    effect). Pooled SD from per-group decimal moments, one division and
    sqrt at output.

    Scale shape: one map-side-combined groupBy(flag) then a 2-row
    pivot fold."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = F.when(F.weekday(F.to_date("ts")) + 1 >= 6, 1).otherwise(0)
    g = e.select(w.alias("w"), F.col("value").alias("v")).groupBy("w").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("s"),
        F.sum(F.round(F.col("v") * F.col("v"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2"),
    )
    pick = lambda w_, c: F.max(F.when(F.col("w") == w_, F.col(c)))  # noqa: E731
    sides = g.agg(
        pick(1, "n").alias("n1"),
        pick(1, "s").alias("s1"),
        pick(1, "s2").alias("s21"),
        pick(0, "n").alias("n2"),
        pick(0, "s").alias("s2_"),
        pick(0, "s2").alias("s22"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1") / n1
    m2 = F.col("s2_") / n2
    pooled = F.sqrt(
        (
            (F.col("s21") - F.col("s1") * F.col("s1") / n1)
            + (F.col("s22") - F.col("s2_") * F.col("s2_") / n2)
        )
        / (n1 + n2 - 2)
    )
    return sides.select(
        n1.cast("long").alias("n_weekend"),
        n2.cast("long").alias("n_weekday"),
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round((m1 - m2) / pooled, 6).alias("cohens_d"),
    )


@register(
    "grubbs_outlier_daily",
    tags=("analytics", "stats"),
    defer=True,
    oracle=f"""
    WITH daily AS ({_ORACLE_DAILY}),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(y, 12) AS DECIMAL(38,12))) AS DOUBLE)
                   AS sy,
               CAST(sum(CAST(round(y * y, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS syy
        FROM daily
    ),
    dev AS (
        SELECT d.idx, d.y, m.n,
               abs(d.y - m.sy / m.n) AS adev,
               sqrt((m.syy - m.sy * m.sy / m.n) / (m.n - 1)) AS s
        FROM daily d CROSS JOIN m
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(idx AS BIGINT) AS outlier_day_idx,
           round(y, 6) AS outlier_value,
           round(adev / s, 6) AS grubbs_g
    FROM dev ORDER BY round(adev / s, 6) DESC, idx LIMIT 1
    """,
)
def grubbs_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' test statistic for the single most extreme day of purchase
    revenue: ``G = max|y − ȳ|/s`` — the classical single-outlier screen
    (compare to the MAD-based ``mad_outlier_days``, which is robust to
    the outlier inflating s itself). Mean and sample SD from round-12
    decimal moments; the argmax day is a TakeOrdered(1) on the rounded
    statistic with the day as tiebreak.

    Scale shape: one groupBy(day), a broadcast moment join, a
    TakeOrderedAndProject(1) over the bounded calendar aggregate."""
    daily = _daily_events(spark, sf_dir)
    y = F.col("y")
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.round(y, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sy"),
        F.sum(F.round(y * y, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "idx",
        "y",
        "n",
        F.abs(y - F.col("sy") / F.col("n")).alias("adev"),
        F.sqrt(
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("s"),
    )
    g = F.round(F.col("adev") / F.col("s"), 6)
    return (
        dev.select(
            F.col("n").alias("n_days"),
            F.col("idx").cast("long").alias("outlier_day_idx"),
            F.round("y", 6).alias("outlier_value"),
            g.alias("grubbs_g"),
        )
        .orderBy(F.col("grubbs_g").desc(), "outlier_day_idx")
        .limit(1)
    )


@register(
    "markov_conditional_entropy",
    tags=("history", "stats", "mining"),
    defer=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (
        SELECT event_type AS prev, nxt,
               CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    ),
    margins AS (
        SELECT prev, CAST(sum(c) AS BIGINT) AS cp FROM pairs GROUP BY prev
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pairs),
    terms AS (
        SELECT round((CAST(p.c AS DOUBLE) / t.n)
                     * ln(CAST(m.cp AS DOUBLE) / p.c), 12) AS term
        FROM pairs p
        JOIN margins m ON m.prev = p.prev
        CROSS JOIN tot t
    )
    SELECT (SELECT n FROM tot) AS n_transitions,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_observed_cells,
           round(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS conditional_entropy_nats
    FROM terms
    """,
)
def markov_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(next | current) of the per-user event-type
    chain — the entropy RATE of the empirical Markov process (how
    predictable the next action is given the current one; 0 would mean
    deterministic journeys, ln(k) a uniform walk). ``H = Σ (c_ij/N)·
    ln(c_i·/c_ij)`` with every probability ratio an exact integer
    quotient inside the round-12 ln terms, decimal-summed — the
    information-theoretic companion of ``event_transition_matrix`` and
    ``markov_stationary_distribution``.

    Scale shape: per-user lead windows, one groupBy onto the k² pair
    table, bounded joins thereafter."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    # the k² pair table anchors margins, the total, the cell count, and
    # the term join — checkpoint so the per-user lead pass runs once
    # (executed-plan audit: 4 scans without)
    pairs = seq.groupBy(
        F.col("event_type").alias("prev"), "nxt"
    ).agg(F.count("*").cast("long").alias("c")).localCheckpoint()
    margins = pairs.groupBy("prev").agg(F.sum("c").cast("long").alias("cp"))
    tot = pairs.agg(F.sum("c").cast("long").alias("n"))
    ncells = pairs.agg(F.count("*").cast("long").alias("n_observed_cells"))
    terms = (
        pairs.join(margins, "prev")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("c").cast("double") / F.col("n"))
                * F.log(F.col("cp").cast("double") / F.col("c")),
                12,
            ).alias("term"),
            "n",
        )
    )
    h = F.sum(F.col("term").cast("decimal(38,12)")).cast("double")
    return (
        terms.agg(
            F.max("n").cast("long").alias("n_transitions"),
            F.round(h, 6).alias("conditional_entropy_nats"),
        )
        .crossJoin(F.broadcast(ncells))
        .select(
            "n_transitions", "n_observed_cells", "conditional_entropy_nats"
        )
    )


@register(
    "tukey_hsd_segments",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH g AS (
        SELECT c_mktsegment AS seg,
               CAST(count(*) AS BIGINT) AS ng,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sg,
               CAST(sum(CAST(round(c_acctbal * c_acctbal, 12)
                        AS DECIMAL(38,12))) AS DOUBLE) AS sg2
        FROM customer GROUP BY c_mktsegment
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(CAST(round(sg2 - sg * sg / ng, 6)
                        AS DECIMAL(38,6))) AS DOUBLE) AS ssw
        FROM g
    ),
    pairs AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b,
               a.sg / a.ng - b.sg / b.ng AS diff,
               a.ng AS na, b.ng AS nb, t.ssw / (t.n - t.k) AS msw
        FROM g a JOIN g b ON a.seg < b.seg CROSS JOIN t
    )
    SELECT seg_a, seg_b,
           round(diff, 6) AS mean_diff,
           round(diff / sqrt(msw / 2.0 * (1.0 / na + 1.0 / nb)), 6)
               AS tukey_q
    FROM pairs ORDER BY seg_a, seg_b
    """,
)
def tukey_hsd_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc q statistics for every segment pair — the step
    after ``anova_oneway_segments`` rejects: which pairs actually differ?
    ``q = (m_a − m_b)/√(MSW/2·(1/n_a + 1/n_b))`` (the Tukey-Kramer
    unequal-n form) with MSW from the same round-6-exact within-group
    sums of squares as the ANOVA. Ten pair rows over the 5-group
    aggregate.

    Scale shape: one groupBy(segment), a bounded k×k pair join, all
    arithmetic row-local after one 1-row fold."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").cast("long").alias("ng"),
        F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
        .cast("double")
        .alias("sg"),
        F.sum(
            F.round(F.col("c_acctbal") * F.col("c_acctbal"), 12).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("sg2"),
    ).localCheckpoint()  # the k-row moments feed the totals AND the terms
    t = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(
            F.round(
                F.col("sg2") - F.col("sg") * F.col("sg") / F.col("ng"), 6
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("ssw"),
    )
    a = g.select(
        F.col("seg").alias("seg_a"),
        F.col("ng").alias("na"),
        F.col("sg").alias("sa"),
    )
    b = g.select(
        F.col("seg").alias("seg_b"),
        F.col("ng").alias("nb"),
        F.col("sg").alias("sb"),
    )
    pairs = (
        a.join(b, F.col("seg_a") < F.col("seg_b"))
        .crossJoin(F.broadcast(t))
        .select(
            "seg_a",
            "seg_b",
            (F.col("sa") / F.col("na") - F.col("sb") / F.col("nb")).alias(
                "diff"
            ),
            "na",
            "nb",
            (F.col("ssw") / (F.col("n") - F.col("k"))).alias("msw"),
        )
    )
    q = F.col("diff") / F.sqrt(
        F.col("msw") / 2.0 * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return pairs.select(
        "seg_a",
        "seg_b",
        F.round("diff", 6).alias("mean_diff"),
        F.round(q, 6).alias("tukey_q"),
    ).orderBy("seg_a", "seg_b")


@register(
    "brown_forsythe_levene",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH c AS (
        SELECT CAST(floor(c_acctbal) AS BIGINT) AS v, c_mktsegment AS seg
        FROM customer
    ),
    hist AS (
        SELECT seg, v, CAST(count(*) AS BIGINT) AS n_v
        FROM c GROUP BY seg, v
    ),
    gmed AS (
        SELECT seg, min(v) AS med FROM (
            SELECT seg, v,
                   sum(n_v) OVER (PARTITION BY seg ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(n_v) OVER (PARTITION BY seg) AS ng
            FROM hist
        ) WHERE cum >= (ng + 1) // 2 GROUP BY seg
    ),
    z AS (
        SELECT c.seg, abs(c.v - m.med) AS z
        FROM c JOIN gmed m ON m.seg = c.seg
    ),
    g AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(z) AS BIGINT) AS sz,
               CAST(sum(z * z) AS BIGINT) AS sz2
        FROM z GROUP BY seg
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(sz) AS BIGINT) AS s
        FROM g
    ),
    terms AS (
        SELECT t.k, t.n,
               round(g.ng * (CAST(g.sz AS DOUBLE) / g.ng
                             - CAST(t.s AS DOUBLE) / t.n)
                          * (CAST(g.sz AS DOUBLE) / g.ng
                             - CAST(t.s AS DOUBLE) / t.n), 6) AS tb,
               round(CAST(g.sz2 AS DOUBLE)
                     - CAST(g.sz AS DOUBLE) * g.sz / g.ng, 6) AS tw
        FROM g CROSS JOIN t
    )
    SELECT CAST(max(k) AS BIGINT) AS n_groups,
           CAST(max(n) AS BIGINT) AS n_customers,
           round((CAST(sum(CAST(tb AS DECIMAL(38,6))) AS DOUBLE)
                  / (max(k) - 1))
                 / (CAST(sum(CAST(tw AS DECIMAL(38,6))) AS DOUBLE)
                    / (max(n) - max(k))), 6) AS levene_w
    FROM terms
    """,
)
def brown_forsythe_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test for variance
    homogeneity across segments — the assumption check behind
    ``anova_oneway_segments`` (ANOVA's F is only calibrated under equal
    variances): one-way ANOVA on z = |v − median_g|, with each group's
    median taken EXACTLY from its whole-dollar histogram and the
    deviations therefore integers — every moment a BIGINT until the
    final F ratio (group-mean SS form, per the ANOVA cancellation
    lesson).

    Scale shape: per-group histogram + median window over the bounded
    value spine, one re-scan joined against the k-row medians, one k-row
    fold."""
    c = load_table(spark, sf_dir, "customer").select(
        F.floor("c_acctbal").cast("long").alias("v"),
        F.col("c_mktsegment").alias("seg"),
    )
    # ONE corpus pass: the (segment, value) histogram is checkpointed and
    # feeds the median walk AND the deviation moments (the z moments are
    # derived from histogram cells — n_v·|v−med| — never a re-scan of raw
    # rows; executed-plan audit: 4 scans of customer without)
    hist = (
        c.groupBy("seg", "v")
        .agg(F.count("*").cast("long").alias("n_v"))
        .localCheckpoint()
    )
    wcum = Window.partitionBy("seg").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gmed = (
        hist.select(
            "seg",
            "v",
            F.sum("n_v").over(wcum).alias("cum"),
            F.sum("n_v").over(Window.partitionBy("seg")).alias("ng"),
        )
        .where(F.col("cum") >= F.expr("(ng + 1) DIV 2"))
        .groupBy("seg")
        .agg(F.min("v").alias("med"))
    )
    z = hist.join(F.broadcast(gmed), "seg").select(
        "seg", "n_v", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    g = z.groupBy("seg").agg(
        F.sum("n_v").cast("long").alias("ng"),
        F.sum(F.col("n_v") * F.col("z")).cast("long").alias("sz"),
        F.sum(F.col("n_v") * F.col("z") * F.col("z"))
        .cast("long")
        .alias("sz2"),
    )
    t = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sz").cast("long").alias("s"),
    )
    dev = F.col("sz").cast("double") / F.col("ng") - F.col("s").cast(
        "double"
    ) / F.col("n")
    terms = g.crossJoin(F.broadcast(t)).select(
        "k",
        "n",
        F.round(F.col("ng") * dev * dev, 6).alias("tb"),
        F.round(
            F.col("sz2").cast("double")
            - F.col("sz").cast("double") * F.col("sz") / F.col("ng"),
            6,
        ).alias("tw"),
    )
    ssb = F.sum(F.col("tb").cast("decimal(38,6)")).cast("double")
    ssw = F.sum(F.col("tw").cast("decimal(38,6)")).cast("double")
    return terms.agg(
        F.max("k").cast("long").alias("n_groups"),
        F.max("n").cast("long").alias("n_customers"),
        F.round(
            (ssb / (F.max("k") - 1)) / (ssw / (F.max("n") - F.max("k"))), 6
        ).alias("levene_w"),
    )


@register(
    "friedman_test_event_types",
    tags=("analytics", "stats"),
    defer=True,
    oracle="""
    WITH cell AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT day, event_type,
               2 * rank() OVER (PARTITION BY day ORDER BY c)
                 + count(*) OVER (PARTITION BY day, c) - 1 AS r2
        FROM cell
    ),
    rsum AS (
        SELECT event_type, CAST(sum(r2) AS BIGINT) AS two_r
        FROM ranked GROUP BY event_type
    ),
    dims AS (
        SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS k
        FROM cell
    )
    SELECT d.n AS n_days, d.k AS n_treatments,
           round(12.0 / (CAST(d.n AS DOUBLE) * d.k * (d.k + 1))
                 * sum(CAST(r.two_r AS DOUBLE) * r.two_r / 4.0)
                 - 3.0 * d.n * (d.k + 1), 6) AS friedman_chi2
    FROM rsum r CROSS JOIN dims d
    GROUP BY d.n, d.k
    """,
)
def friedman_test_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test for the blocked design days×event-types: within each
    day (the block), the k event types are ranked by volume; χ²_F =
    12/(nk(k+1))·ΣR_j² − 3n(k+1) detects systematic type ordering across
    days — the repeated-measures nonparametric ANOVA completing the
    family (independent groups: Kruskal-Wallis; two paired: sign/McNemar
    variants). Average ranks via the 2·minrank+ties−1 integer trick
    within each bounded block; (2R)² ≤ (2·30·10)² stays far inside exact
    doubles here (widen to DECIMAL at ~1e8 blocks, the KW note).

    Scale shape: one groupBy onto the days×types cell table (bounded by
    calendar × type vocabulary); ranks partition by day."""
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").cast("long").alias("c")).localCheckpoint()
    # ^ the bounded cell table feeds the rank pass AND the dims aggregate
    wr = Window.partitionBy("day").orderBy("c")
    wt = Window.partitionBy("day", "c")
    ranked = cell.select(
        "day",
        "event_type",
        (2 * F.rank().over(wr) + F.count("*").over(wt) - 1).alias("r2"),
    )
    rsum = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("two_r")
    )
    dims = cell.agg(
        F.countDistinct("day").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("k"),
    )
    nd = F.col("n").cast("double")
    chi2 = (
        12.0
        / (nd * F.col("k") * (F.col("k") + 1))
        * F.sum(F.col("two_r").cast("double") * F.col("two_r") / 4.0)
        - 3.0 * F.col("n") * (F.col("k") + 1)
    )
    return (
        rsum.crossJoin(F.broadcast(dims))
        .groupBy("n", "k")
        .agg(F.round(chi2, 6).alias("friedman_chi2"))
        .select(
            F.col("n").alias("n_days"),
            F.col("k").alias("n_treatments"),
            "friedman_chi2",
        )
    )


@register(
    "sign_test_paired_uplift",
    tags=("analytics", "stats", "experiment"),
    defer=True,
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                                   AND ts >= TIMESTAMP '2024-01-16'
                             THEN value ELSE 0.0 END AS DECIMAL(38,6)))
                    - SUM(CAST(CASE WHEN event_type = 'purchase'
                                     AND ts < TIMESTAMP '2024-01-16'
                               THEN value ELSE 0.0 END AS DECIMAL(38,6)))
                    AS DECIMAL(38,6)) AS d
        FROM events WHERE user_id < 300 GROUP BY user_id
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos,
               CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_neg,
               CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero
        FROM per_user
    )
    SELECT n_pos, n_neg, n_zero,
           round(CAST(n_pos - n_neg AS DOUBLE)
                 / sqrt(CAST(n_pos + n_neg AS DOUBLE)), 6) AS sign_z
    FROM s
    """,
)
def sign_test_paired_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paired SIGN test on the pre/post purchase uplift — the
    assumption-free floor of the paired family (uses only the SIGN of
    each user's difference, so it is valid under any symmetric-or-not
    continuous alternative; the sign-flip permutation test and CUPED use
    the same pairs with more power under stronger assumptions). Exact
    decimal differences make the zero class engine-identical; the normal
    approximation z = (P−N)/√(P+N) is one integer division.

    Scale shape: one groupBy(user), one 1-row integer fold."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 300)
    split = F.lit("2024-01-16").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        (
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= split),
                    F.col("value"),
                )
                .otherwise(0.0)
                .cast("decimal(38,6)")
            )
            - F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < split),
                    F.col("value"),
                )
                .otherwise(0.0)
                .cast("decimal(38,6)")
            )
        )
        .cast("decimal(38,6)")
        .alias("d")
    )
    s = per_user.agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
    )
    z = F.round(
        (F.col("n_pos") - F.col("n_neg")).cast("double")
        / F.sqrt((F.col("n_pos") + F.col("n_neg")).cast("double")),
        6,
    )
    return s.select("n_pos", "n_neg", "n_zero", z.alias("sign_z"))
