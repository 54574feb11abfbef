"""Composite training-data curation pipeline (north-star: 'the operations a
large-scale training-data pipeline would need', as one coherent flow).

``corpus_curation`` chains the individual operators the way a real 100 TB
pre-training data job would: quality filter → exact dedup (keep lowest id) →
language allow-list → per-language stats of the surviving corpus. Every stage
is the already-oracle-checked building block, so the composite itself is
SQL-expressible and hash-verified end-to-end.

Scale shape: one shuffle for the dedup hash-group, one for the final stats
aggregate; the quality/language filters are map-side; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    checkpoint_bounded,
    dec_sum,
    h60,
    oracle_dec_sum,
    oracle_h60,
    persist_corpus,
    spread,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.operators.text import STOPWORDS
from tscd_datalake_adapter_spark.sources import load_table

ALLOWED_LANGS = ("en", "de", "es", "fr")
MIN_QUALITY = 0.55


def curate(docs: DataFrame) -> DataFrame:
    """The reusable curation flow on any documents-shaped DataFrame:
    returns the surviving rows with their quality score attached."""
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "long"
    )
    stop_ratio = n_stop.cast("double") / n_tokens
    quality = (
        F.least(n_tokens.cast("double") / 50.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - stop_ratio) * 0.5
    )
    scored = docs.withColumn("quality_score", F.round(quality, 6))
    filtered = scored.where(
        (F.col("quality_score") >= MIN_QUALITY)
        & (F.col("lang").isin(*ALLOWED_LANGS))
    )
    # exact dedup, deterministic keep-lowest-id
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    return (
        filtered.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "corpus_curation",
    headline=True,
    tags=("llm", "pipeline"),
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text, lang, n_chars,
               round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0) * 0.5
                     + (1.0 - CAST(len(list_filter(string_split(text, ' '),
                           t -> t IN ({', '.join(f"'{w}'" for w in STOPWORDS)})))
                           AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 6)
                   AS quality_score
        FROM documents
    ),
    filtered AS (
        SELECT * FROM scored
        WHERE quality_score >= {MIN_QUALITY}
          AND lang IN ({', '.join(f"'{lang}'" for lang in ALLOWED_LANGS)})
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                         ORDER BY doc_id) AS rn
            FROM filtered
        ) WHERE rn = 1
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           round({oracle_dec_sum('quality_score')} / count(*), 6) AS avg_quality
    FROM deduped GROUP BY lang ORDER BY lang
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: quality-filter → language allow-list → exact
    dedup → per-language corpus stats. The composite of the individually
    verified operators, itself hash-verified."""
    docs = load_table(spark, sf_dir, "documents")
    kept = curate(docs)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(
                F.sum(F.col("quality_score").cast("decimal(38,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@register(
    "repetition_filter",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bi AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
           FROM toks, UNNEST(range(1, len(t))) u(i)),
    bis AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                   round(max(cnt) * 1.0 / sum(cnt), 6) AS top_bigram_frac
            FROM (SELECT doc_id, g, count(*) AS cnt FROM bi GROUP BY 1, 2)
            GROUP BY doc_id),
    tri AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
            FROM toks, UNNEST(range(1, len(t) - 1)) u(i)),
    tris AS (SELECT doc_id,
                    round(1.0 - count(DISTINCT g) * 1.0 / count(*), 6)
                        AS dup_trigram_frac
             FROM tri GROUP BY doc_id)
    SELECT doc_id, n_bigrams, top_bigram_frac, dup_trigram_frac,
           top_bigram_frac <= 0.06 AND dup_trigram_frac <= 0.02 AS keep
    FROM bis JOIN tris USING (doc_id) ORDER BY doc_id
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021 §A1.1): flag
    documents dominated by a single 2-gram or by duplicated 3-grams — the
    boilerplate/SEO-spam signature in web-scale pre-training corpora.

    Per doc: top-bigram fraction (most frequent token 2-gram's share of all
    2-gram instances) and duplicate-trigram fraction (1 − distinct/total
    3-grams); ``keep`` applies fixed thresholds. Scale shape: explode →
    two-level aggregate per n-gram branch, partial aggregation map-side, the
    shuffle keyed on doc_id — never wider than the corpus's n-gram multiset,
    and embarrassingly parallel across docs."""
    d = load_table(spark, sf_dir, "documents")
    # base feeds the bigram AND trigram branches — cache the token
    # arrays so the corpus splits once. persist, not localCheckpoint:
    # the token-array table is O(corpus) — keep a recompute path.
    base = persist_corpus(
        d.select("doc_id", F.split("text", " ").alias("t")).where(
            F.size("t") >= 3
        )
    )
    bi = base.select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(0, size(t)-2),"
            " i -> concat(t[i], ' ', t[i+1])))"
        ).alias("g"),
    )
    bis = (
        bi.groupBy("doc_id", "g")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.round(F.max("cnt") * 1.0 / F.sum("cnt"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )
    tri = base.select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(0, size(t)-3),"
            " i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))"
        ).alias("g"),
    )
    tris = tri.groupBy("doc_id").agg(
        F.round(1.0 - F.countDistinct("g") * 1.0 / F.count("*"), 6).alias(
            "dup_trigram_frac"
        )
    )
    return (
        bis.join(tris, "doc_id")
        .select(
            "doc_id",
            "n_bigrams",
            "top_bigram_frac",
            "dup_trigram_frac",
            (
                (F.col("top_bigram_frac") <= 0.06)
                & (F.col("dup_trigram_frac") <= 0.02)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-\d{4}\b"


@register(
    "pii_redaction",
    tags=("llm", "text"),
    oracle=f"""
    WITH synth AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || doc_id || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 0
                       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS t
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM synth ORDER BY doc_id
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: count and redact email addresses
    and phone numbers with built-in regex expressions — map-side only, zero
    shuffle, whole-stage codegen (the pattern scales to 100 TB trivially).

    The fixture corpus carries no real PII, so deterministic synthetic
    contacts are appended first (doc_id-derived, recomputed identically in
    the oracle); the regexes use only syntax Java regex and RE2 interpret
    the same way, so redaction is bit-identical cross-engine."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    synth = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(synth, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(synth, F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(synth, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    ).orderBy("doc_id")


@register(
    "benchmark_decontamination",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (SELECT DISTINCT doc_id,
                     t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
              FROM toks, UNNEST(range(1, len(t) - 2)) u(i)),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0),
    hits AS (SELECT grams.doc_id, count(*) AS n
             FROM grams JOIN bench USING (g)
             WHERE grams.doc_id % 29 != 0 GROUP BY grams.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_overlap_4grams,
           coalesce(h.n, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 29 != 0 ORDER BY d.doc_id
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 §C / PaLM style): flag training
    documents sharing any token 4-gram with a held-out benchmark set (here
    the doc_id % 29 == 0 slice stands in for the benchmark suite).

    Scale shape: distinct per-doc 4-grams on both sides, then an equi-join
    keyed on the gram — candidates only, never doc×doc. The benchmark gram
    set is bounded by the (fixed-size) benchmark suite, so AQE broadcasts
    it at any corpus scale; no forced hint. Contamination counts come from
    one groupBy(doc_id) on the join output, and clean docs are restored
    with a left join against the doc list."""
    d = load_table(spark, sf_dir, "documents")
    grams = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size("t") >= 4)
        .select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(0, size(t)-4),"
                " i -> concat(t[i], ' ', t[i+1], ' ', t[i+2], ' ', t[i+3])))"
            ).alias("g"),
        )
        .distinct()
    )
    # the gram table feeds BOTH the benchmark slice and the training side
    # of the overlap join — cache it so the corpus 4-gram-explodes once
    # (audited r7: 3 scans -> 2; the remainder is the pruned doc-id list).
    # persist: O(corpus 4-grams).
    grams = persist_corpus(grams)
    bench = grams.where(F.col("doc_id") % 29 == 0).select("g").distinct()
    hits = (
        grams.where(F.col("doc_id") % 29 != 0)
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        d.where(F.col("doc_id") % 29 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias(
                "n_overlap_4grams"
            ),
            (F.coalesce(F.col("n"), F.lit(0)) >= 1).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


_BLOCKED_DOMAINS = ("src7.example.com", "src13.example.com")


@register(
    "domain_curation",
    tags=("llm", "text"),
    oracle=f"""
    WITH urls AS (
        SELECT doc_id, n_chars,
               'https://' || source || '.example.com/docs/' || doc_id AS url
        FROM documents
    ),
    parsed AS (
        SELECT doc_id, n_chars, url,
               regexp_extract(url, 'https?://([^/]+)/', 1) AS domain
        FROM urls
    ),
    ranked AS (
        SELECT doc_id, domain, url,
               row_number() OVER (PARTITION BY domain
                                  ORDER BY n_chars DESC, doc_id) AS domain_rank
        FROM parsed
        WHERE domain NOT IN {_BLOCKED_DOMAINS!r}
    )
    SELECT doc_id, domain, url, CAST(domain_rank AS BIGINT) AS domain_rank,
           domain_rank <= 10 AS kept
    FROM ranked ORDER BY doc_id
    """,
)
def domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain-based corpus curation (the CommonCrawl-pipeline staple):
    parse the domain out of each document's URL, drop blocklisted domains,
    and cap each surviving domain's contribution (top-10 docs by length,
    deterministic doc_id tiebreak) so no single site dominates the corpus.

    Fixture documents carry no URL, so one is synthesized from ``source``
    (recomputed identically in the oracle); the operator shape — regex
    domain extraction map-side, blocklist as an IN filter the scanner can
    push, per-domain ranking as one window shuffle keyed on domain — is the
    scale path: state per task is one domain's doc list, and the cap means
    downstream stages see at most ``cap × |domains|`` rows."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
    )
    parsed = d.select(
        "doc_id", "n_chars", url.alias("url")
    ).withColumn("domain", F.regexp_extract("url", r"https?://([^/]+)/", 1))
    ranked = (
        parsed.where(~F.col("domain").isin(*_BLOCKED_DOMAINS))
        .withColumn(
            "domain_rank",
            F.row_number().over(
                Window.partitionBy("domain").orderBy(
                    F.col("n_chars").desc(), F.col("doc_id")
                )
            ),
        )
    )
    return ranked.select(
        "doc_id",
        "domain",
        "url",
        F.col("domain_rank").cast("long").alias("domain_rank"),
        (F.col("domain_rank") <= 10).alias("kept"),
    ).orderBy("doc_id")


@register(
    "context_packing",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id,
           CAST(cum - n_tokens - 512 * floor((cum - n_tokens) / 512) AS BIGINT)
               AS pack_offset
    FROM packed ORDER BY source, doc_id
    """,
)
def context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing for pre-training batches: stream each source's
    documents in a deterministic order and assign every doc to a 512-token
    pack by its running token offset (offset-based packing — docs may
    straddle a boundary and be split at tokenization time; the pack id and
    intra-pack offset computed here are what the loader needs).

    Scale shape: ONE window shuffle keyed on ``source`` (the natural
    packing unit — corpora pack per-shard, never globally), running sum in
    a single pass, everything else map-side arithmetic. A global ORDER BY
    cumsum would serialize the corpus; partitioning by shard is what makes
    packing embarrassingly parallel at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / 512).cast("long").alias("pack_id"),
        (start - 512 * F.floor(start / 512)).cast("long").alias("pack_offset"),
    ).orderBy("source", "doc_id")


@register(
    "unpivot_lineitem_metrics",
    tags=("agg",),
    oracle=f"""
    SELECT metric,
           {oracle_dec_sum('value')} AS total,
           count(*) AS n
    FROM (
        SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT 'discount' AS metric, l_discount AS value FROM lineitem
        UNION ALL
        SELECT 'tax' AS metric, l_tax AS value FROM lineitem
    )
    GROUP BY metric ORDER BY metric
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via ``stack``, then aggregate per metric."""
    li = load_table(spark, sf_dir, "lineitem")
    from tscd_datalake_adapter_spark.functions import dec_sum

    long_df = li.select(
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, "
            "'tax', l_tax) AS (metric, value)"
        )
    )
    return (
        long_df.groupBy("metric")
        .agg(dec_sum("value").alias("total"), F.count("*").alias("n"))
        .orderBy("metric")
    )


@register(
    "lm_perplexity_filter",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM toks, UNNEST(range(1, len(t))) u(i)
        WHERE len(t) >= 2
    ),
    train AS (SELECT w1, w2 FROM bg WHERE doc_id % 7 = 0),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM train GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY w1),
    vocab AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id % 7 = 0)
    ),
    scored AS (
        SELECT bg.doc_id,
               round(ln((coalesce(c2.c2, 0) + 0.5)
                        / (coalesce(c1.c1, 0) + 0.5 * v)), 6) AS logp
        FROM bg CROSS JOIN vocab
        LEFT JOIN c2 USING (w1, w2)
        LEFT JOIN c1 USING (w1)
        WHERE bg.doc_id % 7 != 0
    ),
    perdoc AS (
        SELECT doc_id, count(*) AS n_bigrams,
               round(CAST(sum(CAST(logp AS DECIMAL(38,6))) AS DOUBLE)
                     / count(*), 6) AS avg_logprob
        FROM scored GROUP BY doc_id
    ),
    cuts AS (
        SELECT quantile_cont(avg_logprob, 1.0/3) AS q1,
               quantile_cont(avg_logprob, 2.0/3) AS q2
        FROM perdoc
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, avg_logprob,
           round(exp(-avg_logprob), 6) AS ppl,
           CASE WHEN avg_logprob >= q2 THEN 'head'
                WHEN avg_logprob >= q1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM perdoc CROSS JOIN cuts
    ORDER BY doc_id
    """,
)
def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM perplexity filter (Wenzek et al., 2020): train
    an add-k-smoothed bigram model on a trusted reference slice (here the
    ``doc_id % 7 == 0`` docs stand in for Wikipedia), score every other
    document by average token log-probability, and bucket the corpus into
    head / middle / tail perplexity terciles — the standard quality gate in
    large-scale pre-training data pipelines.

    Scale shape: scoring is joins over the exploded bigram stream plus one
    groupBy(doc_id) shuffle folding scores per document (decimal-exact sums,
    so the average is order-independent and engine-portable). The tercile
    cutoffs come from a two-scalar percentile aggregate broadcast back over
    the docs — NOT a global ntile() window, which would funnel every row
    through one partition at 100 TB.

    Two deliberate non-scale choices keep THIS form oracle-exact, with the
    production form in :func:`lm_perplexity_filter_scaled`:

    - the reference slice is ``doc_id % 7 == 0`` — 1/7 of the corpus, so the
      c1/c2 model tables GROW with the data (the joins still shuffle fine;
      they just stop being broadcastable). The scaled variant bounds the
      reference to a fixed-N doc set via deterministic content-hash top-N.
    - ``percentile()`` is exact: it buffers every per-doc score in one
      aggregation state (~16 bytes x n_docs on one executor — fine to ~1e8
      docs, not beyond). The scaled variant uses ``approx_percentile``,
      whose sketch is constant-size.

    Per-bigram log-probs are rounded to 6 decimals before the decimal-sum
    fold (``functions`` module determinism recipe), keeping the whole score
    pipeline cross-engine hash-exact despite the ln/exp double math.
    """
    from tscd_datalake_adapter_spark.functions import DEC

    d = load_table(spark, sf_dir, "documents")
    # the bigram transform+explode is the CPU-heavy map stage — spread the
    # narrow projection off the file-count scan partitions first
    toks = spread(d.select("doc_id", "text")).select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x != '')").alias("t")
    )
    bg = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(0, size(t)-2),"
                " i -> struct(t[i] AS w1, t[i+1] AS w2)))"
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # bg feeds c2, c1 (train slice) AND the scored slice — cache it so the
    # corpus bigram-explodes once (same move as the scaled variant,
    # audited r7: 3 scans -> 2). persist: O(corpus bigrams).
    bg = persist_corpus(bg)
    train = bg.where(F.col("doc_id") % 7 == 0)
    c2 = train.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # r11 (guide §2.3): c1 is algebraically Σ_w2 c2 — derive it from the
    # (train-vocab-bounded) c2 table instead of a SECOND groupBy pass
    # over the corpus-sized train bigram stream; c2 is persisted because
    # both the derivation and the scoring join consume it
    c2 = persist_corpus(c2)
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        toks.where(F.col("doc_id") % 7 == 0)
        .select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bg.where(F.col("doc_id") % 7 != 0)
        .crossJoin(F.broadcast(vocab))
        .join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce("c2", F.lit(0)) + 0.5)
                    / (F.coalesce("c1", F.lit(0)) + 0.5 * F.col("v"))
                ),
                6,
            ).alias("logp"),
        )
    )
    perdoc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("logp").cast(DEC)).cast("double") / F.count("*"), 6
        ).alias("avg_logprob"),
    )
    # perdoc (one row per scored doc) feeds BOTH the cutoff aggregate and
    # the final bucketing, and AQE's ReusedExchange does NOT cover the
    # duplicated subtree here (measured: ~2x score-pipeline cost without
    # this) — cache the per-doc table so it executes once. persist, not
    # localCheckpoint: one row per doc is corpus volume.
    perdoc = persist_corpus(perdoc)
    cuts = perdoc.agg(
        F.expr("percentile(avg_logprob, 1.0/3)").alias("q1"),
        F.expr("percentile(avg_logprob, 2.0/3)").alias("q2"),
    )
    return (
        perdoc.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "n_bigrams",
            "avg_logprob",
            F.round(F.exp(-F.col("avg_logprob")), 6).alias("ppl"),
            F.when(F.col("avg_logprob") >= F.col("q2"), "head")
            .when(F.col("avg_logprob") >= F.col("q1"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


@register(
    "lm_perplexity_filter_scaled",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents
    ),
    ref AS (
        SELECT doc_id
        FROM documents
        ORDER BY (('0x' || substr(md5(text), 1, 15))::BIGINT), doc_id
        LIMIT 40
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM toks, UNNEST(range(1, len(t))) u(i)
        WHERE len(t) >= 2
    ),
    train AS (
        SELECT w1, w2 FROM bg WHERE doc_id IN (SELECT doc_id FROM ref)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM train GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY w1),
    vocab AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(t) AS tok FROM toks
              WHERE doc_id IN (SELECT doc_id FROM ref))
    ),
    scored AS (
        SELECT bg.doc_id,
               round(ln((coalesce(c2.c2, 0) + 0.5)
                        / (coalesce(c1.c1, 0) + 0.5 * v)), 6) AS logp
        FROM bg CROSS JOIN vocab
        LEFT JOIN c2 USING (w1, w2)
        LEFT JOIN c1 USING (w1)
        WHERE bg.doc_id NOT IN (SELECT doc_id FROM ref)
    ),
    perdoc AS (
        SELECT doc_id, count(*) AS n_bigrams,
               round(CAST(sum(CAST(logp AS DECIMAL(38,6))) AS DOUBLE)
                     / count(*), 6) AS avg_logprob
        FROM scored GROUP BY doc_id
    ),
    cum AS (
        SELECT avg_logprob,
               sum(cnt) OVER (ORDER BY avg_logprob
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT avg_logprob, count(*) AS cnt
              FROM perdoc GROUP BY avg_logprob)
    ),
    tot AS (SELECT count(*) AS n FROM perdoc),
    cuts AS (
        SELECT min(CASE WHEN cum >= (n + 2) // 3
                        THEN avg_logprob END) AS q1,
               min(CASE WHEN cum >= (2 * n + 2) // 3
                        THEN avg_logprob END) AS q2
        FROM cum CROSS JOIN tot
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, avg_logprob,
           round(exp(-avg_logprob), 6) AS ppl,
           CASE WHEN avg_logprob >= q2 THEN 'head'
                WHEN avg_logprob >= q1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM perdoc CROSS JOIN cuts
    ORDER BY doc_id
    """,
)
def lm_perplexity_filter_scaled_demo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oracle-checkable demo of the production perplexity form — the exact
    same scale shape as :func:`lm_perplexity_filter_scaled` (bounded top-N
    reference set via TakeOrdered over the h60 content hash, broadcast
    model tables, map-side scoring) with the one sketch swapped out: the
    tercile cutoffs come from the integer rank-based value-histogram
    recipe (the ``length_percentile_filter`` pattern — all-integer
    thresholds, no interpolation) instead of ``approx_percentile``,
    earning the full cross-engine hash gate. The sketch-cutoff production
    variant stays pytest-pinned in
    ``test_lm_perplexity_scaled_is_bounded_and_sketched``.

    Reference set = the 40 documents with the smallest h60(text) — an
    absolute N exactly like a real deployment's fixed trusted slice, fully
    deterministic and partition-invariant, planned as
    TakeOrderedAndProject (per-partition top-N, no global sort)."""
    from tscd_datalake_adapter_spark.functions import checkpoint_bounded, h60

    d = load_table(spark, sf_dir, "documents")
    # checkpoint the bounded id set (r12): it feeds THREE broadcast sites
    # plus the persisted c2 build — materialized once, the corpus top-N
    # scan runs exactly once instead of once per broadcast-build job
    ref_ids = checkpoint_bounded(
        d.select("doc_id", h60(F.col("text")).alias("hk"))
        .orderBy("hk", "doc_id")
        .limit(40)
        .select("doc_id"),
        bound="top-40 reference doc ids",
    )
    return _lm_perplexity_scaled_body(
        spark, sf_dir, ref_ids, exact_cuts=True
    )


def lm_perplexity_filter_scaled(
    spark: SparkSession, sf_dir: str, ref_docs: int = 10_000
) -> DataFrame:
    """Production-scale form of :func:`lm_perplexity_filter` (this exact
    sketch-cutoff variant is pinned by plan + behavior tests; the
    registered ``lm_perplexity_filter_scaled`` entry is the same body with
    exact-percentile cutoffs, which IS oracle-checked).

    Differences from the oracle form, both sized for 100 TB:

    - **Fixed-size reference set**: the ``ref_docs`` documents with the
      smallest content hash (deterministic, partition-invariant; computed
      with ``TakeOrdered``-style bounded top-N, never a global sort). The
      c1/c2/vocab model tables are therefore bounded regardless of corpus
      size, and the scoring joins are hinted broadcasts — the whole scoring
      pass is map-side.
    - **Sketch cutoffs**: ``approx_percentile`` (constant-size sketch,
      default accuracy 1e-4 relative rank error) instead of exact
      ``percentile``'s buffer-every-score aggregation state.
    """
    from tscd_datalake_adapter_spark.functions import checkpoint_bounded, h60

    d = load_table(spark, sf_dir, "documents")
    # Bounded deterministic reference: top-N by content hash. limit() over
    # an ordered frame plans as TakeOrderedAndProject: per-partition top-N,
    # single merge of N*partitions candidates — no full sort, no shuffle of
    # the corpus. Checkpointed (bounded at ref_docs rows) so the three
    # broadcast sites + the c2 cache build share ONE materialization.
    ref_ids = checkpoint_bounded(
        d.select("doc_id", h60(F.col("text")).alias("hk"))
        .orderBy("hk", "doc_id")
        .limit(ref_docs)
        .select("doc_id"),
        bound="top-ref_docs reference doc ids",
    )
    return _lm_perplexity_scaled_body(spark, sf_dir, ref_ids)


def _lm_perdoc_scores(
    spark: SparkSession, sf_dir: str, ref_ids: DataFrame
) -> DataFrame:
    """The scoring pipeline of the scaled perplexity filter, PRE-checkpoint:
    train the bigram model on ``ref_ids`` (bounded, broadcast), score every
    other document, fold to one (doc_id, n_bigrams, avg_logprob) row per
    doc. Exposed separately so plan tests can pin the pipeline's shape
    (top-N reference, broadcast-only joins, no windows) — the caller
    checkpoints the result, which truncates the visible plan."""
    from tscd_datalake_adapter_spark.functions import DEC

    d = load_table(spark, sf_dir, "documents")
    # same file-count-trap fix as lm_perplexity_filter: spread before the
    # bigram explode
    toks = spread(d.select("doc_id", "text")).select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x != '')").alias("t")
    )
    bg = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(0, size(t)-2),"
                " i -> struct(t[i] AS w1, t[i+1] AS w2)))"
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # bg feeds c2, c1 (train side) AND the scored side — cache it so the
    # corpus bigram-explodes once, not once per consumer (audited r7:
    # 4 scans of documents -> 3; the remaining two are the reference
    # top-N and the vocab unigram pass). persist: O(corpus bigrams).
    bg = persist_corpus(bg)
    train = bg.join(F.broadcast(ref_ids), "doc_id", "semi")
    # r12 (guide §2.3, the same derivation r11 applied to
    # lm_perplexity_filter): c1 is algebraically Σ_w2 c2, so derive it
    # from the bounded c2 table instead of a SECOND pass over the train
    # bigram stream; c2 is persisted because both the derivation and its
    # own broadcast consume it
    c2 = persist_corpus(
        train.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        toks.join(F.broadcast(ref_ids), "doc_id", "semi")
        .select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bg.join(F.broadcast(ref_ids), "doc_id", "anti")
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce("c2", F.lit(0)) + 0.5)
                    / (F.coalesce("c1", F.lit(0)) + 0.5 * F.col("v"))
                ),
                6,
            ).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("logp").cast(DEC)).cast("double") / F.count("*"), 6
        ).alias("avg_logprob"),
    )


def _lm_perplexity_scaled_body(
    spark: SparkSession,
    sf_dir: str,
    ref_ids: DataFrame,
    exact_cuts: bool = False,
) -> DataFrame:
    """Shared scoring body: train bigram model on ``ref_ids`` (a bounded
    doc_id set, broadcast), score the rest, bucket by percentile cutoffs —
    ``approx_percentile``'s constant-size sketch by default (the 100 TB
    path), exact ``percentile`` when ``exact_cuts`` (the oracle-checkable
    registered demo)."""
    # checkpoint: perdoc feeds the cutoff derivation AND the final
    # bucketing — one execution of the score pipeline, not two (AQE
    # ReusedExchange does not cover this shape; measured ~2x without).
    # The pre-cache pipeline shape stays pinned via _lm_perdoc_scores.
    # persist, not localCheckpoint: one row per doc is corpus volume.
    perdoc = persist_corpus(_lm_perdoc_scores(spark, sf_dir, ref_ids))
    if exact_cuts:
        # Integer rank-based terciles over the value histogram (the
        # length_percentile_filter recipe): q_j = smallest avg_logprob whose
        # cumulative count reaches ceil(j*n/3). All-integer thresholds, no
        # interpolation — interpolated percentile position arithmetic is
        # NOT cross-engine stable when p*(n-1) lands on an integer boundary
        # (Spark and DuckDB round the fractional position differently).
        hist = perdoc.groupBy("avg_logprob").agg(F.count("*").alias("cnt"))
        wcum = Window.orderBy("avg_logprob").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = hist.select(
            "avg_logprob", F.sum("cnt").over(wcum).alias("cum")
        )
        tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
        cuts = cum.crossJoin(F.broadcast(tot)).agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n + 2) DIV 3"),
                    F.col("avg_logprob"),
                )
            ).alias("q1"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(2 * n + 2) DIV 3"),
                    F.col("avg_logprob"),
                )
            ).alias("q2"),
        )
    else:
        cuts = perdoc.agg(
            F.expr("approx_percentile(avg_logprob, 1.0/3, 10000)").alias(
                "q1"
            ),
            F.expr("approx_percentile(avg_logprob, 2.0/3, 10000)").alias(
                "q2"
            ),
        )
    return (
        perdoc.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "n_bigrams",
            "avg_logprob",
            F.round(F.exp(-F.col("avg_logprob")), 6).alias("ppl"),
            F.when(F.col("avg_logprob") >= F.col("q2"), "head")
            .when(F.col("avg_logprob") >= F.col("q1"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


@register(
    "length_percentile_filter",
    tags=("llm", "text"),
    oracle="""
    WITH lens AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    hist AS (
        SELECT n_tokens, CAST(count(*) AS BIGINT) AS cnt
        FROM lens GROUP BY n_tokens
    ),
    cum AS (
        SELECT n_tokens, cnt,
               sum(cnt) OVER (ORDER BY n_tokens
                              ROWS UNBOUNDED PRECEDING) AS cum_cnt
        FROM hist
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
    cuts AS (
        SELECT min(CASE WHEN cum_cnt >= (5 * n + 99) // 100
                        THEN n_tokens END) AS p5,
               min(CASE WHEN cum_cnt >= (95 * n + 99) // 100
                        THEN n_tokens END) AS p95
        FROM cum CROSS JOIN tot
    )
    SELECT p5, p95, n AS n_total,
           (SELECT CAST(count(*) AS BIGINT) FROM lens, cuts
            WHERE n_tokens >= p5 AND n_tokens <= p95) AS n_kept,
           (SELECT CAST(count(*) AS BIGINT) FROM lens, cuts
            WHERE n_tokens < p5) AS n_short,
           (SELECT CAST(count(*) AS BIGINT) FROM lens, cuts
            WHERE n_tokens > p95) AS n_long
    FROM cuts CROSS JOIN tot
    """,
)
def length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length outlier filter with EXACT percentile-disc cutoffs
    computed from a bounded value histogram — the scale-correct form of
    exact percentiles. ``percentile()`` buffers every row's value in one
    aggregation state; here the state is ``groupBy(n_tokens)`` — bounded by
    the token-length DOMAIN (a document length in tokens), not the corpus —
    and the cumulative scan runs over that bounded histogram (same class
    as the two-pass ntile). Cutoff rank is integer ``ceil(q*N)``
    (percentile-disc semantics), so every value out of this operator is an
    exact integer — nothing to round, bit-equal on any engine.

    Returns the 1-row summary (p5/p95 cutoffs, kept/dropped counts) a
    pipeline would use to gate the actual filter pass.
    """
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
        .cast("long")
        .alias("n_tokens"),
    )
    # ONE corpus pass: the length histogram is checkpointed and feeds the
    # cumulative cutoff walk, the total, AND the kept/dropped counts (the
    # kept count is Σ cnt over in-range cells — no re-scan of raw lengths;
    # executed-plan audit: 4 scans of documents without)
    hist = (
        lens.groupBy("n_tokens")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    wcum = Window.orderBy("n_tokens").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum_cnt", F.sum("cnt").over(wcum))
    tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
    cuts = (
        cum.join(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("cum_cnt") >= F.expr("(5 * n + 99) div 100"),
                    F.col("n_tokens"),
                )
            ).alias("p5"),
            F.min(
                F.when(
                    F.col("cum_cnt") >= F.expr("(95 * n + 99) div 100"),
                    F.col("n_tokens"),
                )
            ).alias("p95"),
        )
    )
    tagged = hist.join(F.broadcast(cuts))
    return (
        tagged.join(F.broadcast(tot))
        .agg(
            F.first("p5").alias("p5"),
            F.first("p95").alias("p95"),
            F.first("n").alias("n_total"),
            F.sum(
                F.when(
                    (F.col("n_tokens") >= F.col("p5"))
                    & (F.col("n_tokens") <= F.col("p95")),
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
            F.sum(
                F.when(F.col("n_tokens") < F.col("p5"), F.col("cnt"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_short"),
            F.sum(
                F.when(F.col("n_tokens") > F.col("p95"), F.col("cnt"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_long"),
        )
    )


@register(
    "dsir_importance_weights",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents
    ),
    ex AS (SELECT doc_id, lang, unnest(t) AS tok FROM toks),
    vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM ex),
    target AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS ct FROM ex
        WHERE lang = 'en' GROUP BY tok
    ),
    raw AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cr FROM ex GROUP BY tok
    ),
    tot AS (
        SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM target) AS nt,
               (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr
    ),
    scored AS (
        SELECT ex.doc_id, ex.lang,
               round(ln((coalesce(t.ct, 0) + 1.0) / (nt + v))
                     - ln((r.cr + 1.0) / (nr + v)), 6) AS lw
        FROM ex
        LEFT JOIN target t USING (tok)
        JOIN raw r USING (tok)
        CROSS JOIN tot CROSS JOIN vocab
    ),
    perdoc AS (
        SELECT doc_id, lang,
               round(CAST(sum(CAST(lw AS DECIMAL(38,6))) AS DOUBLE)
                     / count(*), 6) AS avg_logweight
        FROM scored GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, avg_logweight FROM perdoc
    ORDER BY avg_logweight DESC, doc_id LIMIT 50
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public method): score every
    document by how much its unigram distribution looks like the TARGET
    domain (here the English slice) versus the RAW corpus,
    ``avg_t[ln p_target(t) - ln p_raw(t)]`` with add-1 smoothing over the
    shared vocab; the top-weighted docs are what importance resampling
    would draw first for domain-targeted pre-training selection.

    Scale shape: identical machinery to ``lm_perplexity_filter`` — ONE
    vocab-bounded count table (raw + conditional target counts from a
    single groupBy(tok) pass, r11) broadcast onto the exploded token
    stream, one groupBy(doc) decimal-exact fold, TakeOrdered top-k. No
    windows, no collect."""
    from tscd_datalake_adapter_spark.functions import DEC

    d = load_table(spark, sf_dir, "documents")
    # the exploded token stream feeds the vocab, target, raw, and scoring
    # branches — spread the narrow projection before the explode (file-
    # count trap) and checkpoint so the corpus tokenizes exactly once
    # (executed-plan audit: 3 scans without)
    ex = (
        spread(d.select("doc_id", "lang", "text"))
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("tok"),
        )
    )
    ex = persist_corpus(ex)  # exploded token stream: O(corpus tokens)
    # r11 (guide §2.3 "aggregate before you shuffle" + §2.4): the raw
    # counts, target counts AND vocab size all come out of ONE
    # groupBy(tok) pass — previously vocab (countDistinct), target
    # (en-filtered groupBy) and raw (groupBy) were three separate
    # shuffled passes over the cached token stream, and scoring paid two
    # joins. ct is a conditional count, so sum-when replaces the
    # separate en-only table (0, never NULL, exactly the old
    # coalesce(ct, 0)); the token totals and vocab size are one further
    # agg over the vocab-bounded count table, checkpointed because four
    # consumers read it.
    counts = checkpoint_bounded(
        ex.groupBy("tok").agg(
            F.count("*").cast("long").alias("cr"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("ct"),
        ),
        bound="vocab-bounded unigram count table",
    )
    stats = counts.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cr").cast("long").alias("nr"),
        F.count("*").cast("long").alias("v"),
    )
    # no forced broadcast on the count table (r11 ADVICE): unigram vocab
    # grows with corpus, so a pinned broadcast could exceed memory at the
    # 100 TB design point — AQE picks broadcast when the table measures
    # small (it does at every test SF) and falls back to a shuffle join
    # when it doesn't; the 1-row stats frame stays hinted
    scored = (
        ex.join(counts, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "lang",
            F.round(
                F.log(
                    (F.col("ct") + 1.0) / (F.col("nt") + F.col("v"))
                )
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + F.col("v"))),
                6,
            ).alias("lw"),
        )
    )
    return (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.sum(F.col("lw").cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("avg_logweight")
        )
        .orderBy(F.col("avg_logweight").desc(), "doc_id")
        .limit(50)
    )


@register(
    "curation_pipeline_summary",
    tags=("llm", "pipeline"),
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents
        WHERE doc_id < 30
    ),
    staged AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY sha256(coalesce(text, ''))
                                  ORDER BY doc_id) AS dup_rn,
               -- coalesce: a NULL text must count 0 tokens in BOTH engines
               -- (len(NULL) is NULL in DuckDB while Spark's size() yields
               -- -1; either way the CASE below would diverge), keeping the
               -- NULL/empty equivalence class the dedup window already uses
               len(list_filter(string_split(coalesce(text, ''), ' '),
                               x -> x != '')) AS n_tokens
        FROM corpus
    ),
    tagged AS (
        SELECT lang,
               CASE
                 WHEN lang NOT IN ('en', 'de', 'es', 'fr')
                      THEN 'lang_unsupported'
                 WHEN dup_rn > 1 THEN 'duplicate'
                 WHEN n_tokens < 25 THEN 'too_short'
                 WHEN n_tokens > 85 THEN 'too_long'
                 ELSE 'kept'
               END AS stage
        FROM staged
    )
    SELECT lang, stage, CAST(count(*) AS BIGINT) AS n_docs
    FROM tagged GROUP BY lang, stage ORDER BY lang, stage
    """,
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation funnel — the composed form of the
    individual gates this module provides (language filter -> exact dedup
    -> length gates), with FIRST-FAIL stage attribution per document: every
    doc lands in exactly one bucket (lang_unsupported, duplicate,
    too_short, too_long, kept), so the per-(lang, stage) counts read as a
    loss ledger — what each pipeline stage costs each language — the
    report every training-data curation run ships with.

    The corpus plants 30 shifted-id duplicates (the ``dedup_exact``
    pattern) so the dedup stage demonstrably fires. Stage order is the
    production order (cheap predicates before the dedup shuffle); the only
    corpus-wide shuffle is the dedup window on the 32-byte hash. All other
    stages are map-side predicates."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    corpus = d.unionByName(
        d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
        )
    )
    w = Window.partitionBy(
        F.sha2(F.coalesce("text", F.lit("")), 256)
    ).orderBy("doc_id")
    staged = corpus.select(
        "lang",
        F.row_number().over(w).alias("dup_rn"),
        # coalesce: size() on a NULL array returns -1 (would bucket NULL
        # text as too_short while the oracle's NULL falls through to kept)
        F.size(
            F.expr("filter(split(coalesce(text, ''), ' '), x -> x != '')")
        ).alias("n_tokens"),
    )
    stage = (
        F.when(
            ~F.col("lang").isin("en", "de", "es", "fr"), "lang_unsupported"
        )
        .when(F.col("dup_rn") > 1, "duplicate")
        .when(F.col("n_tokens") < 25, "too_short")
        .when(F.col("n_tokens") > 85, "too_long")
        .otherwise("kept")
    )
    return (
        staged.select("lang", stage.alias("stage"))
        .groupBy("lang", "stage")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "stage")
    )


@register(
    "span_corruption_masks",
    tags=("llm", "pipeline"),
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x != ''))
                   AS n_tokens
        FROM documents WHERE doc_id < 200
    ),
    blocks AS (
        SELECT doc_id, n_tokens,
               unnest(range(0, n_tokens // 6)) AS b
        FROM d WHERE n_tokens >= 6
    ),
    marked AS (
        SELECT doc_id, n_tokens, b,
               CASE WHEN {oracle_h60(
                   "concat('sc:', CAST(doc_id AS VARCHAR), ':', "
                   "CAST(b AS VARCHAR))")} % 4 = 0
                    THEN 1 ELSE 0 END AS sel
        FROM blocks
    )
    SELECT doc_id,
           CAST(min(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(sel) AS BIGINT) AS n_masked_spans,
           CAST(sum(sel) * 3 AS BIGINT) AS n_masked_tokens,
           round(sum(sel) * 3 / CAST(min(n_tokens) AS DOUBLE), 4)
               AS mask_ratio
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
)
def span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask PLANNING (Raffel et al. 2020): divide
    each document into 6-token blocks, deterministically select ~25% of
    blocks by content hash, and mask a 3-token span per selected block —
    non-overlapping spans, ~12.5% expected token mask rate. The output is
    the per-document mask ledger (span/token counts, realized ratio) a
    seq2seq pre-training data builder materializes alongside the corpus.

    Hash-derived selection instead of an RNG makes the masking rerun-
    stable, partition-invariant, and cross-engine reproducible — the same
    property every sampling operator in this repo relies on. Scale: one
    explode bounded by n_tokens/6 per doc, one groupBy(doc_id); map-side
    otherwise."""
    from tscd_datalake_adapter_spark.functions import h60

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("n_tokens"),
        )
    )
    blocks = d.where(F.col("n_tokens") >= 6).select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(F.lit(0), F.floor(F.col("n_tokens") / 6) - 1)
        ).alias("b"),
    )
    sel = F.when(
        h60(
            F.concat(
                F.lit("sc:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        )
        % 4
        == 0,
        1,
    ).otherwise(0)
    return (
        blocks.select("doc_id", "n_tokens", sel.alias("sel"))
        .groupBy("doc_id")
        .agg(
            F.min("n_tokens").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_blocks"),
            F.sum("sel").cast("long").alias("n_masked_spans"),
            (F.sum("sel") * 3).cast("long").alias("n_masked_tokens"),
            F.round(
                F.sum("sel") * 3 / F.min("n_tokens").cast("double"), 4
            ).alias("mask_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "dataset_card_summary",
    tags=("llm", "pipeline"),
    defer=True,
    oracle=f"""
    WITH per_doc AS (
        SELECT source, lang,
               coalesce(text, '') AS t,
               CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                                    x -> x != '')) AS BIGINT) AS toks,
               n_chars,
               round(CAST(len(regexp_extract_all(coalesce(text, ''),
                                                 '[A-Za-z]')) AS DOUBLE)
                     / greatest(1, len(coalesce(text, ''))), 9)
                   AS alpha_ratio
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT sha256(t)) AS BIGINT) AS n_distinct_texts,
           round(1.0 - CAST(count(DISTINCT sha256(t)) AS DOUBLE)
                 / count(*), 6) AS dup_rate,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           round(CAST(sum(toks) AS DOUBLE) / count(*), 6)
               AS avg_doc_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           round(CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS frac_short,
           round(CAST({oracle_dec_sum('alpha_ratio')} AS DOUBLE)
                 / count(*), 6) AS avg_alpha_ratio
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def dataset_card_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the one-screen summary a data release
    ships alongside the parquet: volume (docs, tokens), exact-duplicate
    rate (sha256 distinct vs total), language spread, short-document
    fraction, and alphabetic-character ratio (the crudest quality
    signal). Composes the corpus-health numbers that the curation/dedup
    tiers act on into a single audited artifact.

    Scale shape: one pass over documents computing per-row features in
    codegen, then one groupBy(source) whose count(DISTINCT sha) expands
    to the standard two-phase partial-distinct aggregate — no joins, no
    windows; NULL text is coalesced to '' before every length/split (the
    Spark size(NULL) = -1 trap)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    per_doc = d.select(
        "source",
        "lang",
        "n_chars",
        F.sha2(t, 256).alias("sha"),
        F.size(F.filter(F.split(t, " "), lambda x: x != "")).cast(
            "long"
        ).alias("toks"),
        F.round(
            F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]"), 0)).cast(
                "double"
            )
            / F.greatest(F.lit(1), F.length(t)),
            9,
        ).alias("alpha_ratio"),
    )
    n = F.count("*")
    nd = F.countDistinct("sha")
    return (
        per_doc.groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            nd.cast("long").alias("n_distinct_texts"),
            F.round(1.0 - nd.cast("double") / n, 6).alias("dup_rate"),
            F.sum("toks").cast("long").alias("total_tokens"),
            F.round(F.sum("toks").cast("double") / n, 6).alias(
                "avg_doc_tokens"
            ),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.round(
                F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0)).cast(
                    "double"
                )
                / n,
                6,
            ).alias("frac_short"),
            F.round(dec_sum("alpha_ratio").cast("double") / n, 6).alias(
                "avg_alpha_ratio"
            ),
        )
        .orderBy("source")
    )


@register(
    "randomized_response_debias",
    tags=("pipeline", "privacy"),
    defer=True,
    oracle="""
    WITH ev AS (
        SELECT event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS truth,
               (('0x' || substr(md5('rr1:' || CAST(event_id AS VARCHAR)),
                    1, 15))::BIGINT) % 3 AS keep_coin,
               (('0x' || substr(md5('rr2:' || CAST(event_id AS VARCHAR)),
                    1, 15))::BIGINT) % 2 AS rand_bit
        FROM events
    ),
    rr AS (
        SELECT truth,
               CASE WHEN keep_coin != 0 THEN truth ELSE rand_bit END
                   AS reported
        FROM ev
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(truth) AS BIGINT) AS n_true,
               CAST(sum(reported) AS BIGINT) AS n_reported
        FROM rr
    )
    SELECT n, n_true, n_reported,
           round(CAST(n_true AS DOUBLE) / n, 6) AS true_rate,
           round(CAST(n_reported AS DOUBLE) / n, 6) AS reported_rate,
           round(1.5 * (CAST(n_reported AS DOUBLE) / n) - 0.25, 6)
               AS debiased_rate,
           round(1.5 * (CAST(n_reported AS DOUBLE) / n) - 0.25
                 - CAST(n_true AS DOUBLE) / n, 6) AS estimate_error
    FROM s
    """,
)
def randomized_response_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response (Warner) with debiasing: each event reports its
    true purchase flag with probability 2/3 and a fair random bit
    otherwise (both coins deterministic h60 draws, so the mechanism is
    replayable cross-engine), giving plausible deniability per row; the
    unbiased estimator inverts the mixture: E[obs] = (2/3)π + (1/3)(1/2)
    → π̂ = 1.5·obs − 0.25. The query reports the true rate, perturbed
    rate, debiased estimate, and realized estimator error — the
    local-DP collection pattern complementing ``dp_laplace_histogram``'s
    central-DP release.

    Scale shape: embarrassingly parallel per-row coins, one global
    integer fold."""
    e = load_table(spark, sf_dir, "events")
    keep = h60(F.concat(F.lit("rr1:"), F.col("event_id").cast("string"))) % 3
    rand_bit = (
        h60(F.concat(F.lit("rr2:"), F.col("event_id").cast("string"))) % 2
    )
    truth = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    rr = e.select(
        truth.alias("truth"),
        F.when(keep != 0, truth).otherwise(rand_bit).alias("reported"),
    )
    s = rr.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("truth").cast("long").alias("n_true"),
        F.sum("reported").cast("long").alias("n_reported"),
    )
    nd = F.col("n").cast("double")
    true_rate = F.col("n_true").cast("double") / nd
    rep_rate = F.col("n_reported").cast("double") / nd
    return s.select(
        "n",
        "n_true",
        "n_reported",
        F.round(true_rate, 6).alias("true_rate"),
        F.round(rep_rate, 6).alias("reported_rate"),
        F.round(1.5 * rep_rate - 0.25, 6).alias("debiased_rate"),
        F.round(1.5 * rep_rate - 0.25 - true_rate, 6).alias(
            "estimate_error"
        ),
    )
