"""Deterministic sampling & split operators (north-star LLM-pipeline block).

At 100 TB, ``df.sample(fraction, seed)`` is the WRONG tool for pipeline
sampling: its output depends on partitioning (a repartition or AQE re-plan
changes which rows are picked), so reruns are not reproducible and no other
engine can verify the result. The production-correct pattern — used by every
large training-data pipeline — is **content-hash sampling**: a row is in the
sample iff ``hash(stable_key) % N < k``. That is partition-invariant,
rerun-stable, engine-portable (the oracle replicates it bit-exactly via
``functions.h60``), and embarrassingly parallel with zero shuffle: the
sampling predicate is evaluated map-side and pushed into the scan pipeline.

The reference has no sampling surface at all (SURVEY.md §2.1 absence list);
these generalize its hash-free key-suffix filtering
(``S3DatalakeStorage.java:67,103``) into principled hash predicates.

Three tiers:
- ``deterministic_sample`` — Bernoulli p=10% over orders by key hash.
- ``stratified_sample_counts`` — per-stratum rates (the ``sampleBy``
  shape, but deterministic): rebalancing class mixes in training data.
- ``train_test_split_counts`` — the canonical hash-mod train/holdout
  split over documents, leakage-free by construction (a document's split
  follows it everywhere, independent of corpus growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    dec_sum,
    h60,
    oracle_dec_sum,
    oracle_h60,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


@register(
    "deterministic_sample",
    tags=("sampling", "llm"),
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n,
           {oracle_dec_sum('o_totalprice')} AS total
    FROM orders
    WHERE {oracle_h60("o_orderkey::VARCHAR")} % 100 < 10
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% Bernoulli sample of orders by key-hash predicate, aggregated.

    ``h60(o_orderkey) % 100 < 10`` — no shuffle, no RNG state, identical
    row set on every rerun and on every engine. Compare ``df.sample``:
    partition-order-dependent and unverifiable.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(h60(F.col("o_orderkey").cast("string")) % 100 < 10)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dec_sum("o_totalprice").alias("total"))
        .orderBy("o_orderstatus")
    )


@register(
    "stratified_sample_counts",
    tags=("sampling", "llm"),
    oracle=f"""
    SELECT l_returnflag, count(*) AS n_sampled,
           {oracle_dec_sum('l_quantity')} AS qty
    FROM lineitem
    WHERE {oracle_h60("l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR")}
          % 100 <
          CASE l_returnflag WHEN 'A' THEN 5 WHEN 'N' THEN 10 ELSE 20 END
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-class rates (A 5%, N 10%,
    R 20%) via one hash predicate — the ``sampleBy`` shape without its
    partition-dependence. Rebalancing skewed class mixes this way costs one
    map-side filter; the per-stratum rate table would be a broadcast join at
    scale (here an inline CASE).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rate = (
        F.when(F.col("l_returnflag") == "A", 5)
        .when(F.col("l_returnflag") == "N", 10)
        .otherwise(20)
    )
    key = F.concat_ws(
        ":",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return (
        li.where(h60(key) % 100 < rate)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_sampled"),
            dec_sum("l_quantity").alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "train_test_split_counts",
    tags=("sampling", "llm"),
    oracle=f"""
    SELECT CASE WHEN {oracle_h60("doc_id::VARCHAR")} % 10 = 0
                THEN 'test' ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1 ORDER BY split
    """,
)
def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical hash-mod train/holdout split (10% test) over documents.

    The split is a pure function of doc_id, so it is stable under corpus
    growth, shards, reorders, and engine changes — the property that makes
    it leakage-free for LLM training pipelines (a near-dup cluster can then
    be forced into one side by hashing the cluster representative instead).
    """
    d = load_table(spark, sf_dir, "documents")
    split = F.when(
        h60(F.col("doc_id").cast("string")) % 10 == 0, "test"
    ).otherwise("train")
    return (
        d.groupBy(split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "temperature_sampling_counts",
    tags=("sampling", "llm"),
    oracle=f"""
    WITH stats AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM stats),
    langq AS (
        SELECT lang, n_docs,
               round(pow(CAST(n_docs AS DOUBLE) / n, 0.3), 6) AS q
        FROM stats CROSS JOIN tot
    ),
    z AS (SELECT CAST(sum(CAST(q AS DECIMAL(38,6))) AS DOUBLE) AS z FROM langq),
    rates AS (
        SELECT lang, n_docs,
               CAST(floor(least(1.0, 0.5 * n * (q / z) / n_docs) * 1000000)
                    AS BIGINT) AS thr
        FROM langq CROSS JOIN z CROSS JOIN tot
    ),
    kept AS (
        SELECT d.lang, count(*) AS n_sampled
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE {oracle_h60("doc_id::VARCHAR")} % 1000000 < r.thr
        GROUP BY d.lang
    )
    SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs,
           round(thr / 1000000.0, 6) AS rate,
           CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM rates r LEFT JOIN kept k USING (lang)
    ORDER BY r.lang
    """,
)
def temperature_sampling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced multilingual sampling (XLM-R / mBERT style,
    alpha = 0.3): up-weight low-resource languages by sampling language l
    with probability proportional to p_l^alpha instead of p_l, targeting
    half the corpus overall. The per-language Bernoulli rate is realized as
    a deterministic content-hash predicate, so the sample is rerun-stable,
    partition-invariant, and engine-verifiable like every sampler here.

    Scale shape: language statistics are one |langs|-row aggregate; the
    rate table is fixed-cardinality (broadcast by construction); the doc
    scan applies the hash predicate map-side with zero extra shuffle. The
    normalizer Z folds the per-language q values through decimal(38,6) so
    the rates are order-independent doubles, and each rate is floored to an
    integer per-million threshold so the keep decision is pure integer
    comparison — no float boundary ambiguity at any scale.
    """
    from tscd_datalake_adapter_spark.functions import DEC

    d = load_table(spark, sf_dir, "documents")
    # the |langs|-row stats table anchors the whole rate derivation chain
    # (total, q, Z, rates, final readout) — checkpoint it so the corpus
    # scans exactly twice: once for stats, once applying the rates
    # (executed-plan audit: 7 scans without)
    stats = (
        d.groupBy("lang").agg(F.count("*").alias("n_docs")).localCheckpoint()
    )
    tot = stats.agg(F.sum("n_docs").cast("long").alias("n"))
    langq = stats.crossJoin(F.broadcast(tot)).withColumn(
        "q",
        F.round(F.pow(F.col("n_docs").cast("double") / F.col("n"), 0.3), 6),
    )
    z = langq.agg(F.sum(F.col("q").cast(DEC)).cast("double").alias("z"))
    rates = langq.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                * F.col("n")
                * (F.col("q") / F.col("z"))
                / F.col("n_docs"),
            )
            * 1000000
        )
        .cast("long")
        .alias("thr"),
    )
    kept = (
        d.join(F.broadcast(rates), "lang")
        .where(h60(F.col("doc_id").cast("string")) % 1000000 < F.col("thr"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        # kept is bounded by |langs| rows — fixed-cardinality, safe to hint
        rates.join(F.broadcast(kept), "lang", "left")
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("thr") / 1000000.0, 6).alias("rate"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
        .orderBy("lang")
    )


@register(
    "domain_grouped_split",
    tags=("sampling", "llm"),
    oracle=f"""
    SELECT split, count(*) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT CASE WHEN {oracle_h60('source')} % 10 < 8
                    THEN 'train' ELSE 'holdout' END AS split,
               source, n_chars
        FROM documents
    )
    GROUP BY split ORDER BY split
    """,
)
def domain_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUPED train/holdout split: the split decision hashes
    the document's SOURCE (domain), not the document, so every document
    from one domain lands on the same side — near-duplicate pages from the
    same site can never straddle the boundary and leak holdout content into
    training (the standard web-corpus failure ``train_test_split_counts``'s
    per-document hash cannot prevent).

    Scale shape: identical to the per-doc splitter — a map-side hash
    predicate on an existing column, zero extra shuffle beyond the final
    2-row aggregate; partition-invariant and rerun-stable at any corpus
    size, and new documents from a known domain always join their side.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.when(h60(F.col("source")) % 10 < 8, "train")
            .otherwise("holdout")
            .alias("split"),
            "source",
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "dataset_mixture_plan",
    tags=("sampling", "llm"),
    oracle="""
    WITH per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS sq
        FROM documents GROUP BY source
    ),
    z AS (
        SELECT CAST(sum(CAST(sq AS DECIMAL(38,6))) AS DOUBLE) AS z
        FROM per_src
    ),
    planned AS (
        SELECT source, n_docs,
               round(sq / z, 6) AS weight,
               CAST(round((sq / z) * 1000, 0) AS BIGINT) AS target_docs
        FROM per_src CROSS JOIN z
    )
    SELECT source, n_docs, weight, target_docs,
           round(CAST(target_docs AS DOUBLE) / n_docs, 6) AS sample_rate,
           (target_docs + n_docs - 1) // n_docs AS n_epochs
    FROM planned ORDER BY source
    """,
)
def dataset_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planner: square-root-scaled source weights (the
    sqrt-rebalancing used to keep giant web crawls from drowning small
    high-quality sources; alpha=0.5 sibling of ``temperature_sampling``'s
    alpha=0.3 language form) turned into an executable plan — per source:
    mixture weight, target document count for a 1000-doc budget, the
    sampling rate to apply, and how many epochs (full passes) an
    under-sized source must repeat to meet its target.

    Scale shape: one groupBy(source) aggregate (|sources| rows — bounded by
    the catalog, not the corpus), a broadcast scalar normalizer, then pure
    per-row arithmetic. The sqrt weights fold through decimal(38,6) after
    rounding so the normalizer is order-independent; all divisions and the
    epoch ceil are mirrored integer/double ops on both engines.
    """
    from tscd_datalake_adapter_spark.functions import DEC, checkpoint_bounded

    d = load_table(spark, sf_dir, "documents")
    # the |sources|-row table feeds the normalizer AND the plan readout —
    # checkpoint so documents aggregates once (executed-plan audit: 2
    # scans without)
    per_src = checkpoint_bounded(
        d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs")),
        bound="one row per source catalog entry",
    )
    per_src = per_src.withColumn(
        "sq", F.round(F.sqrt(F.col("n_docs").cast("double")), 6)
    )
    z = per_src.agg(F.sum(F.col("sq").cast(DEC)).cast("double").alias("z"))
    planned = per_src.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(F.col("sq") / F.col("z"), 6).alias("weight"),
        F.round((F.col("sq") / F.col("z")) * 1000, 0)
        .cast("long")
        .alias("target_docs"),
    )
    return planned.select(
        "source",
        "n_docs",
        "weight",
        "target_docs",
        F.round(F.col("target_docs").cast("double") / F.col("n_docs"), 6).alias(
            "sample_rate"
        ),
        F.expr("(target_docs + n_docs - 1) div n_docs").alias("n_epochs"),
    ).orderBy("source")


@register(
    "weighted_sample_topk",
    tags=("sampling", "llm"),
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               pow({oracle_h60("'ws:' || CAST(doc_id AS VARCHAR)")}
                     / 1152921504606846976.0,
                   1.0 / n_chars) AS k
        FROM documents WHERE n_chars > 0
    ),
    ranked AS (
        SELECT doc_id, w, k,
               row_number() OVER (ORDER BY round(k, 12) DESC, doc_id) AS rk
        FROM keyed
    )
    SELECT doc_id, w, round(k, 6) AS sample_key,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 20 ORDER BY rk
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res, 2006): each doc draws u = h60('ws:'||id)/2^60 in [0,1)
    and competes with key u^(1/w) (w = n_chars); the top-20 keys are the
    sample, inclusion probability proportional to weight. Because u comes
    from the content hash instead of an RNG, the "random" sample is
    partition-invariant, rerun-stable, and cross-engine reproducible — the
    same reasons the plain hash-mod sampler above beats ``df.sample``.

    Ranking uses round(key, 12) with a doc_id tiebreak: pow() may differ
    by ~1 ulp between libm implementations, and adjacent sample keys are
    ~1/n apart, so a 1e-12 quantization can never reorder distinct keys
    but makes any exactly-tied rounding deterministic. TakeOrdered top-20:
    per-partition heads, no global sort. Scale: zero data shuffle — the
    key is map-side arithmetic on the scan."""
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = h60(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) / F.lit(
        float(1 << 60)
    )
    keyed = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        F.pow(u, F.lit(1.0) / F.col("n_chars")).alias("k"),
    )
    ranked = keyed.orderBy(
        F.round("k", 12).desc(), F.col("doc_id")
    ).limit(20)
    from pyspark.sql import Window as _W

    wr = _W.orderBy(F.round("k", 12).desc(), F.col("doc_id"))
    return (
        ranked.withColumn("rk", F.row_number().over(wr).cast("long"))
        .select("doc_id", "w", F.round("k", 6).alias("sample_key"), "rk")
        .orderBy("rk")
    )
