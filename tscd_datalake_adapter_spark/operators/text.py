"""Text-analysis operators (SURVEY.md §2.2 LLM block): per-document stats,
term frequencies, quality scoring, regex token counting, language-ID
heuristic, and rolling-hash fingerprinting.

All hot paths are built-in expressions (whole-stage codegen); nothing here
uses a Python UDF. The documents fixture is word-soup from a 31-word
vocabulary (FIXTURES.md), so the language-ID operator is validated for
*determinism* (exact SQL twin), not accuracy — its bigram profiles are
engine-internal constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    persist_corpus,
    H60_SQLEXPR,
    dec_sum,
    h60,
    oracle_dec_sum,
    oracle_h60,
    spread,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table

# A fixed stopword list (subset of the fixture vocabulary plus common English
# stopwords) used by quality scoring — an engine constant, same in oracles.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "value", "data")

# Language-ID character-bigram profiles: (lang, bigram, weight). Tiny,
# deterministic, and embedded identically in the SQL twin. A real deployment
# would load trained profiles; the *operator shape* (profile scoring + argmax)
# is what scales.
LANG_PROFILES = {
    "en": (("th", 3), ("he", 2), ("an", 1)),
    "de": (("ch", 3), ("ei", 2), ("de", 1)),
    "es": (("ll", 3), ("os", 2), ("de", 1)),
    "fr": (("ou", 3), ("le", 2), ("es", 1)),
}


def _count_occurrences(col, needle: str):
    """Occurrences of `needle` in `col` via length arithmetic — identical
    integer math in any engine."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / len(needle)


@register(
    "text_stats",
    tags=("llm", "text"),
    oracle="""
    SELECT doc_id, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           n_chars AS n_chars_stored,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct_tokens,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS type_token_ratio,
           round(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
                 / length(text), 6) AS space_ratio
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics, incl. the stored-vs-computed
    n_chars cross-check."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_stored"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("type_token_ratio"),
        F.round(
            _count_occurrences(F.col("text"), " ").cast("double")
            / F.length("text"),
            6,
        ).alias("space_ratio"),
    ).orderBy("doc_id")


@register(
    "term_frequencies",
    headline=True,
    tags=("llm", "text"),
    oracle="""
    SELECT tok, count(*) AS tf,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    WHERE tok != ''
    GROUP BY tok ORDER BY tf DESC, tok LIMIT 20
    """,
)
def term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term + document frequencies, top-20. The classic explode →
    two-level aggregate; partial aggregation makes the shuffle carry at most
    |vocab| rows per partition."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("tf").desc(), "tok")
        .limit(20)
    )


def _stopword_sql_list() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "quality_scores",
    tags=("llm", "text"),
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents
        WHERE doc_id < 100
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks, t -> t IN ({_stopword_sql_list()})))
                    AS BIGINT) AS n_stop,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM tok
    )
    SELECT doc_id, n_tokens,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_span,
           round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.5
                 + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.5, 6)
               AS quality_score
    FROM m ORDER BY doc_id
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation + stopword penalty —
    the shape of C4/Gopher-style quality filters, engine-deterministic."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("long")
    stop_ratio = n_stop.cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.length("text").cast("double") / n_tokens, 6).alias(
            "avg_token_span"
        ),
        F.round(
            F.least(n_tokens.cast("double") / 50.0, F.lit(1.0)) * 0.5
            + (F.lit(1.0) - stop_ratio) * 0.5,
            6,
        ).alias("quality_score"),
    ).orderBy("doc_id")


@register(
    "token_count_regex",
    tags=("llm", "text"),
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]{4,}')) AS BIGINT) AS n_long_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting + the chars/4 BPE approximation rule."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[a-z]+")).cast("long").alias("n_word_tokens"),
        F.regexp_count("text", F.lit("[a-z]{4,}"))
        .cast("long")
        .alias("n_long_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("approx_bpe_tokens"),
    ).orderBy("doc_id")


def _lang_score_sql(lang: str) -> str:
    terms = [
        f"(length(text) - length(replace(text, '{bg}', ''))) / 2 * {w}"
        for bg, w in LANG_PROFILES[lang]
    ]
    return " + ".join(terms)


@register(
    "language_id",
    tags=("llm", "text"),
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               CAST({_lang_score_sql('en')} AS BIGINT) AS score_en,
               CAST({_lang_score_sql('de')} AS BIGINT) AS score_de,
               CAST({_lang_score_sql('es')} AS BIGINT) AS score_es,
               CAST({_lang_score_sql('fr')} AS BIGINT) AS score_fr
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, score_en, score_de, score_es, score_fr,
           CASE
             WHEN score_en >= score_de AND score_en >= score_es
                  AND score_en >= score_fr THEN 'en'
             WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_es >= score_fr THEN 'es'
             ELSE 'fr'
           END AS predicted_lang
    FROM scored ORDER BY doc_id
    """,
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram-profile language ID: per-language weighted bigram
    occurrence score, argmax with a fixed preference order. Pure length/
    replace arithmetic — identical in any engine (validated for determinism;
    the fixture corpus shares one vocabulary across langs, FIXTURES.md)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)

    def score(lang: str):
        total = F.lit(0)
        for bg, w in LANG_PROFILES[lang]:
            total = total + _count_occurrences(F.col("text"), bg) * w
        return total.cast("long")

    scored = d.select(
        "doc_id",
        score("en").alias("score_en"),
        score("de").alias("score_de"),
        score("es").alias("score_es"),
        score("fr").alias("score_fr"),
    )
    return scored.select(
        "*",
        F.when(
            (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_fr")),
            "en",
        )
        .when(
            (F.col("score_de") >= F.col("score_es"))
            & (F.col("score_de") >= F.col("score_fr")),
            "de",
        )
        .when(F.col("score_es") >= F.col("score_fr"), "es")
        .otherwise("fr")
        .alias("predicted_lang"),
    ).orderBy("doc_id")


@register(
    "tfidf_top_terms",
    tags=("llm", "text"),
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM tok
        WHERE tok != '' GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE tok != '' GROUP BY tok
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, tok, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, tok) AS BIGINT) AS rk
        FROM scored
    )
    SELECT doc_id, tok, tfidf, rk FROM ranked
    WHERE rk <= 3 AND doc_id < 50
    ORDER BY doc_id, rk
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: per-document top-3 terms by tf · ln(N/df). Classic two-pass
    term weighting — tf and df are separate aggregates joined on token, the
    per-doc top-k is a window. Ranking on the rounded score with a token
    tiebreak keeps ordering engine-independent."""
    d = load_table(spark, sf_dir, "documents")
    # tf and df both consume the exploded stream — cache it so the corpus
    # tokenizes once (audited r7: 3 scans -> 2; the remaining extra is the
    # N count, a parquet-metadata-only aggregate-pushdown scan)
    tok = persist_corpus(
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        ).where(F.col("tok") != "")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    # N as a broadcast 1-row aggregate crossJoin (scalar-subquery pattern,
    # cf. scalar_subquery_above_avg): keeps the whole query one DAG — no
    # driver-side count() job. The tf⋈df token join carries no hint: the
    # df side scales with vocabulary, so AQE picks broadcast vs shuffle.
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where((F.col("rk") <= 3) & (F.col("doc_id") < 50))
        .orderBy("doc_id", "rk")
    )


@register(
    "doc_fingerprints",
    tags=("llm", "text"),
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 4, 1) + 1),
                   i -> {oracle_h60(
                       "array_to_string("
                       "list_slice(string_split(text, ' '), i, i + 4), ' ')"
                   )}) AS hs
        FROM documents
    ),
    wins AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(hs) - 3, 1) + 1),
                   i -> list_min(list_slice(hs, i, i + 3)))) AS fps
        FROM sh
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
           min(fp) AS min_fp, max(fp) AS max_fp
    FROM (SELECT doc_id, unnest(fps) AS fp FROM wins)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 shape):
    5-gram rolling window of token hashes, minimum per window of 4, distinct
    mins = the document's fingerprint set. Expression-only implementation:
    sequence → transform → explode → groupBy. The shingle hash is the
    cross-engine ``functions.h60``, so the full fingerprint set is
    oracle-checked bit-exactly (not just determinism-tested)."""
    # per-shingle md5 is ~1us/row-token of map work ahead of the doc_id
    # exchange — spread the narrow projection or the whole hash stage runs
    # on the scan's file-count partitions (functions.spread docstring)
    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = F.split("text", " ")
    # hash each 5-token shingle: h60 of the joined shingle
    shingle_h = H60_SQLEXPR.format(
        x="concat_ws(' ', slice(split(text, ' '), i, 5))"
    )
    shingles = F.expr(
        "transform(sequence(1, greatest(size(split(text, ' ')) - 4, 1)), "
        f"i -> {shingle_h})"
    )
    windows = F.expr(
        "transform(sequence(1, greatest(size(shingle_hashes) - 3, 1)), "
        "i -> array_min(slice(shingle_hashes, i, 4)))"
    )
    return (
        d.select("doc_id", shingles.alias("shingle_hashes"))
        .select("doc_id", F.explode(F.array_distinct(windows)).alias("fp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


_BM25_TERMS = ("spark", "merge", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


@register(
    "bm25_topk",
    headline=True,
    tags=("llm", "text"),
    oracle=f"""
    WITH docs AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents
    ),
    dl AS (SELECT doc_id, len(t) AS dl, t FROM docs),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS sum_dl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS tok FROM dl)
        WHERE tok IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
        GROUP BY doc_id, dl, tok
    ),
    dft AS (
        SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS dft
        FROM tf GROUP BY tok
    ),
    per_term AS (
        SELECT doc_id,
               round(ln(1.0 + ((n_docs - dft + 0.5) / (dft + 0.5)))
                     * ((CAST(tf AS DOUBLE) * ({_BM25_K1} + 1.0))
                        / (tf + ({_BM25_K1} * (1.0 - {_BM25_B}
                           + ({_BM25_B} * (dl / (CAST(sum_dl AS DOUBLE)
                                                 / n_docs))))))), 6) AS s
        FROM tf JOIN dft USING (tok) CROSS JOIN stats
    )
    SELECT doc_id,
           round(CAST(sum(CAST(s AS DECIMAL(38,6))) AS DOUBLE), 6) AS bm25
    FROM per_term
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Lucene formulation: ``idf = ln(1 +
    (N - df + 0.5)/(df + 0.5))``, k1=1.2, b=0.75) for a fixed query-term
    set over the document corpus — the classic sparse-retrieval sibling of
    ``cosine_topk`` for RAG-style data pipelines.

    Scale shape: tokenize → explode → filter to the query terms BEFORE any
    shuffle (the token stream shrinks to matches only), then one
    groupBy(doc_id, dl, tok) for term frequencies. Document-frequency and
    corpus stats are tiny aggregates joined back as broadcasts, and the
    final top-k is an ORDER BY ... LIMIT — planned as TakeOrdered
    (per-partition heap + driver merge of k·partitions candidates), never a
    global sort. Determinism: per-term scores rounded to 6 decimals, summed
    exactly through decimal(38,6), doc_id tiebreak on the k boundary.
    """
    from tscd_datalake_adapter_spark.functions import DEC

    d = load_table(spark, sf_dir, "documents")
    dl = d.select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x != '')").alias("t")
    ).select("doc_id", F.size("t").cast("long").alias("dl"), "t")
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    # tf feeds the document frequencies AND the per-term scores. Measured
    # r7 (sf0.1, min-of-3, cleared cache): persist_corpus(tf) made the
    # query ~0.7s SLOWER (cache build + lost whole-stage fusion exceed the
    # extra filtered-explode pass it saves here), so the duplicate pass is
    # kept deliberately — both derivations filter to the <=16 query terms
    # before any shuffle, so even at 100 TB each pass moves only matching
    # tokens; swap persist_corpus(tf) in if the term list grows large.
    tf = (
        dl.select("doc_id", "dl", F.explode("t").alias("tok"))
        .where(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dft = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("long").alias("dft")
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
    )
    tf_part = (F.col("tf").cast("double") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + (_BM25_K1 * (1.0 - _BM25_B + (_BM25_B * (F.col("dl") / avgdl))))
    )
    per_term = (
        tf.join(F.broadcast(dft), "tok")
        .join(F.broadcast(stats))
        .select("doc_id", F.round(idf * tf_part, 6).alias("s"))
    )
    return (
        per_term.groupBy("doc_id")
        .agg(F.round(F.sum(F.col("s").cast(DEC)).cast("double"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


_VOCAB_SIZE = 100


@register(
    "tokenizer_vocab_coverage",
    tags=("llm", "text"),
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents
    ),
    exploded AS (SELECT doc_id, lang, unnest(t) AS tok FROM toks),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS cnt FROM exploded GROUP BY tok
        ) ORDER BY cnt DESC, tok LIMIT {_VOCAB_SIZE}
    ),
    perdoc AS (
        SELECT doc_id, lang,
               CAST(count(*) AS BIGINT) AS n_tok,
               CAST(count(*) FILTER (tok IN (SELECT tok FROM vocab))
                    AS BIGINT) AS n_in
        FROM exploded GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(round(1.0 - CAST(n_in AS DOUBLE) / n_tok, 6)
                     AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
               AS avg_oov_rate
    FROM perdoc GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV-rate analysis: build the top-K token vocab
    from the corpus itself (count desc, token tiebreak — deterministic),
    then measure each document's out-of-vocabulary token rate and average
    it per language — the standard pre-tokenizer health check before
    committing a vocab to a training run (high OOV languages get shredded
    into bytes and under-train).

    Scale shape: one token-count shuffle with map-side partial aggregation;
    the vocab itself is a TakeOrdered top-K (bounded: K rows) joined back
    as a broadcast; per-doc and per-lang aggregates shuffle on doc_id/lang.
    Per-doc rates are rounded then decimal-folded so the per-language mean
    is order-independent.
    """
    from tscd_datalake_adapter_spark.functions import DEC

    d = load_table(spark, sf_dir, "documents")
    # the exploded token stream feeds the vocab build AND the per-doc OOV
    # join — corpus-volume, persist so the corpus tokenizes once
    exploded = persist_corpus(
        d.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("tok"),
        )
    )
    vocab = (
        exploded.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(_VOCAB_SIZE)
        .select("tok")
    )
    in_vocab = F.when(F.col("v_tok").isNotNull(), 1).otherwise(0)
    perdoc = (
        exploded.join(
            F.broadcast(vocab.withColumnRenamed("tok", "v_tok")),
            exploded["tok"] == F.col("v_tok"),
            "left",
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_tok"),
            F.sum(in_vocab).cast("long").alias("n_in"),
        )
    )
    oov = F.round(1.0 - F.col("n_in").cast("double") / F.col("n_tok"), 6)
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.sum(oov.cast(DEC)).cast("double") / F.count("*"), 6
            ).alias("avg_oov_rate"),
        )
        .orderBy("lang")
    )


@register(
    "text_normalize_stats",
    tags=("llm", "text"),
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS n_text
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(length(n_text) AS BIGINT) AS n_chars_norm,
           CAST(len(list_filter(string_split(n_text, ' '), x -> x != ''))
                AS BIGINT) AS n_tokens_norm,
           md5(n_text) AS norm_fingerprint
    FROM norm ORDER BY doc_id
    """,
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the dedup-preprocessing standard:
    lowercase → strip non-alphanumerics → collapse whitespace → trim) with
    a cross-engine md5 fingerprint of the normalized form — the key you
    actually dedup on when byte-identical matching is too strict.
    Restricted to ASCII character classes so Java-regex (Spark) and RE2
    (DuckDB) semantics coincide exactly. Map-side only — normalization
    adds zero shuffles to whatever pipeline consumes it."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    n_text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    norm = d.select("doc_id", n_text.alias("n_text"))
    return norm.select(
        "doc_id",
        F.length("n_text").cast("long").alias("n_chars_norm"),
        F.size(F.expr("filter(split(n_text, ' '), x -> x != '')"))
        .cast("long")
        .alias("n_tokens_norm"),
        F.md5(F.col("n_text").cast("binary")).alias("norm_fingerprint"),
    ).orderBy("doc_id")


@register(
    "langid_confusion",
    tags=("llm", "text"),
    oracle=f"""
    WITH scored AS (
        SELECT d.doc_id, d.lang AS actual,
               CAST({_lang_score_sql('en')} AS BIGINT) AS s_en,
               CAST({_lang_score_sql('de')} AS BIGINT) AS s_de,
               CAST({_lang_score_sql('es')} AS BIGINT) AS s_es,
               CAST({_lang_score_sql('fr')} AS BIGINT) AS s_fr
        FROM documents d WHERE doc_id < 100
    ),
    pred AS (
        SELECT actual,
               CASE
                 WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                 WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                 WHEN s_es >= s_fr THEN 'es'
                 ELSE 'fr'
               END AS predicted
        FROM scored
    )
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY actual, predicted ORDER BY actual, predicted
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the classifier-evaluation face of
    ``language_id`` — predicted vs fixture-labelled language counts. (The
    toy bigram profiles only know en/de/es/fr, so zh rows all land in a
    predicted-latin bucket — exactly the kind of systematic blind spot a
    confusion matrix exists to expose.) Composition of the already-
    verified scorer plus one bounded aggregation."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("actual")
    )
    pred = language_id(spark, sf_dir).select("doc_id", "predicted_lang")
    return (
        pred.join(d, "doc_id")
        .groupBy("actual", F.col("predicted_lang").alias("predicted"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


@register(
    "bpe_merge_candidates",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x != ''))
                   AS tok
        FROM documents
    ),
    tokc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
             FROM toks GROUP BY tok),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(tok)),
                      i -> substr(tok, i, 2))) AS pair, c
        FROM tokc WHERE length(tok) >= 2
    ),
    merged AS (
        SELECT pair, CAST(sum(c) AS BIGINT) AS n_occurrences
        FROM pairs GROUP BY pair
    )
    SELECT pair, n_occurrences FROM merged
    ORDER BY n_occurrences DESC, pair LIMIT 20
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE-training step (Sennrich et al. 2016): count adjacent
    character pairs across the corpus, weighted by word frequency — the
    top pair is the next merge a BPE tokenizer would learn. The top-20
    candidates are reported.

    Scale shape: pair counting runs over the VOCABULARY (distinct tokens x
    their counts), not over raw text — the word-count aggregation collapses
    the corpus first, so the explode factor is token length over a
    vocabulary-sized frame. This is exactly how production BPE trainers
    structure the count (word-frequency dict, then pair statistics)."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.expr("filter(split(text, ' '), x -> x != '')")
        ).alias("tok")
    )
    tokc = toks.groupBy("tok").agg(F.count("*").alias("c"))
    pairs = tokc.where(F.length("tok") >= 2).select(
        "c",
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(20)
    )


@register(
    "pmi_cooccurrence_topk",
    tags=("llm", "text"),
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
    dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY tok),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               CAST(count(*) AS BIGINT) AS c_ab
        FROM dt a JOIN dt b
          ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING count(*) >= 20
    )
    SELECT tok_a, tok_b, c_ab,
           round(ln((n.n_docs * c_ab) / CAST(ca.c * cb.c AS DOUBLE)), 6)
               AS pmi
    FROM pairs
    JOIN dfreq ca ON tok_a = ca.tok
    JOIN dfreq cb ON tok_b = cb.tok
    CROSS JOIN n
    ORDER BY pmi DESC, tok_a, tok_b LIMIT 20
    """,
)
def pmi_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information collocation mining: for token pairs
    co-occurring in >= 20 documents, PMI = ln(N·c_ab / (c_a·c_b)) over
    document-level co-occurrence; top-20 by (PMI DESC, pair) — the classic
    corpus-linguistics measure of "appear together more than chance".

    Scale shape: the pair join is the inverted-index self-join keyed on
    doc_id (pairs bounded by per-doc distinct-token count squared, never
    corpus x corpus); document frequencies join back broadcast-sized at
    vocabulary cardinality; N arrives via a broadcast 1-row aggregate —
    single DAG, no driver count. The integer products N·c_ab and c_a·c_b
    are exact longs, so the one double division + log sees identical
    operands in both engines."""
    dt = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr("filter(split(text, ' '), x -> x != '')")
                )
            ).alias("tok"),
        )
        .distinct()
    )
    # dt feeds N, the doc frequencies, and both pair-join sides — cache so
    # the corpus tokenizes once (executed-plan audit: 3 scans without; the
    # self-join pair already reuses). persist, not localCheckpoint: the
    # distinct (doc, token) table is O(corpus tokens).
    dt = persist_corpus(dt)
    n = dt.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    dfreq = dt.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    a = dt.select(F.col("doc_id"), F.col("tok").alias("tok_a"))
    b = dt.select(F.col("doc_id"), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, ["doc_id"])
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= 20)
    )
    return (
        pairs.join(
            dfreq.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca")),
            "tok_a",
        )
        .join(
            dfreq.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb")),
            "tok_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("n_docs") * F.col("c_ab"))
                    / (F.col("ca") * F.col("cb")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "tok_a", "tok_b")
        .limit(20)
    )


@register(
    "chi2_keyness_topk",
    tags=("llm", "text"),
    oracle="""
    WITH toks AS (
        SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'rest' END AS grp,
               unnest(list_filter(string_split(text, ' '), x -> x != ''))
                   AS tok
        FROM documents
    ),
    counts AS (
        SELECT tok,
               CAST(sum(CASE WHEN grp = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(sum(CASE WHEN grp = 'rest' THEN 1 ELSE 0 END)
                    AS BIGINT) AS b
        FROM toks GROUP BY tok
    ),
    totals AS (
        SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
        FROM counts
    ),
    scored AS (
        SELECT c.tok, c.a, c.b,
               round(
                 (CAST(t.ta AS DOUBLE) + CAST(t.tb AS DOUBLE))
                 * (CAST(c.a AS DOUBLE) * CAST(t.tb - c.b AS DOUBLE)
                    - CAST(c.b AS DOUBLE) * CAST(t.ta - c.a AS DOUBLE))
                 * (CAST(c.a AS DOUBLE) * CAST(t.tb - c.b AS DOUBLE)
                    - CAST(c.b AS DOUBLE) * CAST(t.ta - c.a AS DOUBLE))
                 / (CAST(c.a + c.b AS DOUBLE)
                    * CAST(t.ta + t.tb - c.a - c.b AS DOUBLE)
                    * CAST(t.ta AS DOUBLE) * CAST(t.tb AS DOUBLE)), 4)
                   AS chi2
        FROM counts c CROSS JOIN totals t
        WHERE c.a + c.b >= 50
    )
    SELECT tok, a AS n_en, b AS n_rest, chi2
    FROM scored ORDER BY chi2 DESC, tok LIMIT 20
    """,
)
def chi2_keyness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared keyness (corpus linguistics / feature selection): which
    tokens are most over- or under-represented in English documents vs the
    rest of the corpus, by the 2x2 contingency chi² statistic over token
    occurrence counts (min frequency 50). The standard keyword-extraction
    and feature-selection measure for labelled corpora.

    Determinism: the contingency cells are exact integers; every double
    conversion is exact (< 2^53) and the product/division sequence is
    written in the same order in both engines (the numerator would
    overflow int64 if computed integrally, so BOTH engines do the
    identical double arithmetic). One token aggregation shuffle + a
    broadcast 1-row totals crossJoin — single DAG."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", "en").otherwise("rest").alias("grp"),
        F.explode(
            F.expr("filter(split(text, ' '), x -> x != '')")
        ).alias("tok"),
    )
    # the vocab-bounded count table feeds the totals AND the scored
    # readout — checkpoint so the corpus tokenizes once
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("grp") == "en", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("grp") == "rest", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    ).localCheckpoint()
    totals = counts.agg(
        F.sum("a").cast("long").alias("ta"), F.sum("b").cast("long").alias("tb")
    )
    d = lambda c: c.cast("double")  # noqa: E731
    num_half = d(F.col("a")) * d(F.col("tb") - F.col("b")) - d(
        F.col("b")
    ) * d(F.col("ta") - F.col("a"))
    chi2 = (
        (d(F.col("ta")) + d(F.col("tb")))
        * num_half
        * num_half
        / (
            d(F.col("a") + F.col("b"))
            * d(F.col("ta") + F.col("tb") - F.col("a") - F.col("b"))
            * d(F.col("ta"))
            * d(F.col("tb"))
        )
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .where(F.col("a") + F.col("b") >= 50)
        .select(
            "tok",
            F.col("a").alias("n_en"),
            F.col("b").alias("n_rest"),
            F.round(chi2, 4).alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), "tok")
        .limit(20)
    )


def _cooccurrence_edges(
    spark: SparkSession, sf_dir: str, min_docs: int = 100
) -> DataFrame:
    """Ordered (ta < tb) token co-occurrence edge list — token pairs
    sharing >= ``min_docs`` documents — shared by the graph operators
    (triangles, local clustering coefficient). Ordering each edge
    low<high means downstream triangle joins fan out from each node's
    FORWARD adjacency only, the standard mitigation for high-degree skew.

    Returned PERSISTED (``persist_corpus``): every caller consumes the
    edge list several times (triangle legs, degree unions, node counts),
    and without a materialization each consumer re-executes the corpus
    explode + co-occurrence self-join — the executed-plan audit measured
    22 scans of documents in local_clustering_coefficient before this.
    Persist, not checkpoint: the w>=min_docs edge list is
    threshold-derived and scales with corpus co-occurrence density (up
    to vocab² in the limit), so pinning it executor-local with no
    recompute path is the exact class ``persist_corpus`` exists for
    (r7 ADVICE). Verified at conversion: every caller's executed plan
    still materializes the cache once (union/self-join arms all
    substitute — the DeduplicateRelations gotcha does not bite here
    because callers reference this one returned DataFrame object)."""
    dt = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr("filter(split(text, ' '), x -> x != '')")
                )
            ).alias("tok"),
        )
        .distinct()
    )
    a = dt.select("doc_id", F.col("tok").alias("ta"))
    b = dt.select("doc_id", F.col("tok").alias("tb"))
    return persist_corpus(
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= min_docs)
        .select("ta", "tb")
    )


@register(
    "token_graph_triangles",
    tags=("llm", "text", "graph"),
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    edges AS (
        SELECT a.tok AS ta, b.tok AS tb
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING count(*) >= 100
    ),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e1.tb = e2.ta
        JOIN edges e3 ON e3.ta = e1.ta AND e3.tb = e2.tb
    ),
    nodes AS (
        SELECT count(DISTINCT t) AS n_nodes FROM (
            SELECT ta AS t FROM edges UNION SELECT tb FROM edges
        )
    )
    SELECT CAST(n.n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(t.n_triangles AS BIGINT) AS n_triangles
    FROM nodes n CROSS JOIN tri t
    """,
)
def token_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the token co-occurrence graph (edges = token
    pairs sharing >= 100 documents, ordered ta < tb so each triangle is
    counted once as (a<b<c)) — the canonical distributed-graph primitive
    (clustering coefficient, community density) expressed as two
    self-joins on the ordered edge list (``_cooccurrence_edges``,
    checkpointed — six consumers below). Edge and triangle counts are
    integers — exact."""
    edges = _cooccurrence_edges(spark, sf_dir)
    e1 = edges.select(F.col("ta").alias("x"), F.col("tb").alias("y"))
    e2 = edges.select(F.col("ta").alias("y"), F.col("tb").alias("z"))
    e3 = edges.select(F.col("ta").alias("x"), F.col("tb").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("ta").alias("t"))
        .union(edges.select(F.col("tb").alias("t")))
        .distinct()
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def _pagerank_oracle(n_iters: int = 5) -> str:
    """Unrolled-iteration DuckDB twin of ``pagerank_token_graph``: each
    iteration's ranks are rounded to 9 decimals, which is what makes the
    float recursion cross-engine exact (see the operator docstring)."""
    prev = "pr0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""
    pr{i} AS (
        SELECT n.t,
               round(0.15 / (SELECT CAST(count(*) AS DOUBLE) FROM nodes)
                     + 0.85 * coalesce((
                         SELECT sum(p.pr / d.deg)
                         FROM edges2 e
                         JOIN {prev} p ON p.t = e.src
                         JOIN degs d ON d.t = e.src
                         WHERE e.dst = n.t), 0.0), 9) AS pr
        FROM nodes n
    )""")
        prev = f"pr{i}"
    return f"""
    WITH dt AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    edges AS (
        SELECT a.tok AS ta, b.tok AS tb
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING count(*) >= 100
    ),
    edges2 AS (
        SELECT ta AS src, tb AS dst FROM edges
        UNION ALL SELECT tb, ta FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS t FROM edges2),
    degs AS (SELECT src AS t, CAST(count(*) AS DOUBLE) AS deg
             FROM edges2 GROUP BY src),
    pr0 AS (
        SELECT t, round(1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM nodes),
                        9) AS pr
        FROM nodes
    ),{",".join(iters)}
    SELECT t AS token, pr AS pagerank FROM {prev}
    ORDER BY pagerank DESC, token LIMIT 15
    """


@register(
    "pagerank_token_graph",
    tags=("llm", "text", "graph"),
    oracle=_pagerank_oracle(5),
)
def pagerank_token_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 power iterations, damping 0.85) over the undirected
    token co-occurrence graph — the iterative-graph-algorithm tier,
    DataFrame-native: each iteration is one join + one aggregation, the
    loop unrolled in the driver as plan construction (NOT execution; the
    whole 5-iteration lineage is one lazy DAG, and Spark executes it as a
    single job).

    Cross-engine float determinism for an ITERATIVE recursion: each
    iteration's ranks are rounded to 9 decimals before feeding the next.
    Within an iteration the contribution sum is a per-node sum of ~degree
    doubles (fp error ~1e-15, far below the 5e-10 rounding quantum), so
    both engines produce identical rounded ranks every iteration and the
    error cannot compound. Scale: per-iteration cost is one shuffle keyed
    on dst over the edge list — the standard Pregel-equivalent shape; the
    rank state is one double per node."""
    dt = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr("filter(split(text, ' '), x -> x != '')")
                )
            ).alias("tok"),
        )
        .distinct()
    )
    a = dt.select("doc_id", F.col("tok").alias("ta"))
    b = dt.select("doc_id", F.col("tok").alias("tb"))
    # Symmetrize IN-PLAN (explode both orientations of each edge) instead
    # of a self-union: one linear plan, one token self-join, no union arms
    # to re-derive (the DeduplicateRelations cache-substitution gotcha) and
    # no hidden construction-time re-execution. The edge list is
    # threshold-derived (w>=100 co-occurrence) so it scales with corpus
    # density, not a fixed value domain — persist_corpus (spillable,
    # lineage kept), NOT a checkpoint that pins O(edges) rows
    # executor-local with no recompute path (r7 ADVICE).
    # r12 (guide §2.4/§5): the out-degree is attached to the cached edge
    # row ONCE, via a src-partitioned count window INSIDE the cache build
    # — each of the 5 unrolled iterations previously re-joined a separate
    # checkpointed degs table onto the edges (5 extra node-keyed joins);
    # at 100 TB those are 5 removed edge-table shuffles. The window's
    # exchange also leaves the CACHED edges hash-partitioned by src, the
    # very key every iteration's rank join uses.
    edges2 = persist_corpus(
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 100)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("ta").alias("src"), F.col("tb").alias("dst")
                    ),
                    F.struct(
                        F.col("tb").alias("src"), F.col("ta").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .withColumn(
            "deg",
            F.count("*").over(Window.partitionBy("src")).cast("double"),
        )
    )
    nodes = edges2.select(F.col("src").alias("t")).distinct().localCheckpoint(
        eager=True
    )
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n"))
    pr = (
        nodes.crossJoin(F.broadcast(n_nodes))
        .select("t", F.round(F.lit(1.0) / F.col("n"), 9).alias("pr"))
    )
    for _ in range(5):
        contrib = (
            edges2.join(
                pr.withColumnRenamed("t", "src"), "src"
            )
            .groupBy(F.col("dst").alias("t"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("inflow"))
        )
        pr = (
            nodes.join(contrib, "t", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "t",
                F.round(
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85) * F.coalesce("inflow", F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
        )
    return (
        pr.select(F.col("t").alias("token"), F.col("pr").alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "token")
        .limit(15)
    )


@register(
    "token_neighbor_jaccard",
    tags=("llm", "text", "graph"),
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    edges AS (
        SELECT a.tok AS ta, b.tok AS tb
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING count(*) >= 100
    ),
    adj AS (
        SELECT ta AS t, tb AS nbr FROM edges
        UNION ALL
        SELECT tb AS t, ta AS nbr FROM edges
    ),
    sizes AS (SELECT t, count(*) AS n FROM adj GROUP BY t),
    inter AS (
        SELECT a.t AS tok_a, b.t AS tok_b, count(*) AS inter
        FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.t < b.t
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT tok_a, tok_b,
               round(CAST(inter AS DOUBLE)
                     / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON tok_a = sa.t
        JOIN sizes sb ON tok_b = sb.t
    )
    SELECT tok_a, tok_b, jaccard FROM scored
    ORDER BY jaccard DESC, tok_a, tok_b LIMIT 15
    """,
)
def token_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural similarity on the token co-occurrence graph: Jaccard of
    the two tokens' NEIGHBOR sets (same ≥100-doc edges as
    ``token_graph_triangles``, symmetrized) — tokens are structurally
    similar when they co-occur with the same other tokens even if they
    never co-occur with each other, the distributional-similarity signal
    PMI (direct co-occurrence) cannot see.

    Implementation is :func:`~tscd_datalake_adapter_spark.operators.dedup.
    exact_jaccard_pairs` applied to the adjacency list instead of the
    document-token list — the inverted-index candidate join keyed on the
    shared neighbor, sizes joined after, never all token pairs. The graph
    is vocabulary-bounded, so every stage after edge construction is
    vocab²-bounded regardless of corpus size. The edge list is the shared
    persisted ``_cooccurrence_edges`` — the inverted-index pipeline
    consumes the adjacency several times, and without a materialization
    each consumption re-ran the corpus-scale edge build (measured 20
    scans of documents in the executed plan)."""
    from tscd_datalake_adapter_spark.operators.dedup import (
        exact_jaccard_pairs,
    )

    edges = _cooccurrence_edges(spark, sf_dir)
    adj = edges.select(
        F.col("ta").alias("doc_id"), F.col("tb").alias("tok")
    ).unionByName(
        edges.select(F.col("tb").alias("doc_id"), F.col("ta").alias("tok"))
    )
    pairs = exact_jaccard_pairs(adj)
    return (
        pairs.select(
            F.col("doc_a").alias("tok_a"),
            F.col("doc_b").alias("tok_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "tok_a", "tok_b")
        .limit(15)
    )


@register(
    "zipf_fit_tokens",
    tags=("llm", "text"),
    oracle="""
    WITH tok AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x != ''))
            AS tok
        FROM documents
    ),
    freq AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY tok
    ),
    ranked AS (
        SELECT CAST(row_number() OVER (ORDER BY f DESC, tok) AS BIGINT)
                   AS rnk,
               f
        FROM freq ORDER BY f DESC, tok LIMIT 50
    ),
    terms AS (
        SELECT CAST(round(ln(rnk), 12) AS DECIMAL(38, 12)) AS x,
               CAST(round(ln(f), 12) AS DECIMAL(38, 12)) AS y,
               CAST(round(ln(rnk) * ln(rnk), 12) AS DECIMAL(38, 12)) AS xx,
               CAST(round(ln(rnk) * ln(f), 12) AS DECIMAL(38, 12)) AS xy
        FROM ranked
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(xx) AS DOUBLE) AS sxx,
               CAST(sum(xy) AS DOUBLE) AS sxy
        FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS zipf_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept
    FROM s
    """,
)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-50 token frequencies: OLS slope of
    ln(freq) on ln(rank) — the corpus-statistics health check (natural
    text sits near slope −1; a synthetic or deduplicated corpus drifts,
    making this a cheap distribution-shift probe for training data).

    Float recipe: each regression ingredient (ln terms and their
    products) is rounded to 12 decimals and decimal-summed — the
    libm-ulp-proof fold recipe (NDCG/PSI/MI) — and the slope/intercept
    derive once from those sums. The rank window runs over the
    vocabulary-bounded frequency table, TakeOrdered-limited to 50."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    freq = tok.groupBy("tok").agg(F.count("*").cast("long").alias("f"))
    ranked = (
        freq.orderBy(F.col("f").desc(), F.col("tok"))
        .limit(50)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("f").desc(), F.col("tok")))
            .cast("long")
            .alias("rnk"),
            "f",
        )
    )
    dec = lambda c: F.round(c, 12).cast("decimal(38,12)")  # noqa: E731
    lx, ly = F.log(F.col("rnk")), F.log(F.col("f"))
    terms = ranked.select(
        dec(lx).alias("x"),
        dec(ly).alias("y"),
        dec(lx * lx).alias("xx"),
        dec(lx * ly).alias("xy"),
    )
    s = terms.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        n.cast("long").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "intercept"
        ),
    )


@register(
    "token_graph_khop_bfs",
    tags=("llm", "text", "graph"),
    oracle="""
    WITH RECURSIVE dt AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    edges AS (
        SELECT a.tok AS ta, b.tok AS tb
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING count(*) >= 100
    ),
    edges2 AS (
        SELECT ta AS src, tb AS dst FROM edges
        UNION ALL SELECT tb, ta FROM edges
    ),
    degs AS (SELECT src AS tok, count(*) AS deg FROM edges2 GROUP BY src),
    root AS (SELECT tok FROM degs ORDER BY deg DESC, tok LIMIT 1),
    reach(tok, dist) AS (
        SELECT tok, 0 FROM root
        UNION
        SELECT e.dst, r.dist + 1
        FROM reach r JOIN edges2 e ON e.src = r.tok
        WHERE r.dist < 3
    ),
    best AS (SELECT tok, min(dist) AS dist FROM reach GROUP BY tok)
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_tokens,
           min(tok) AS first_tok
    FROM best GROUP BY dist ORDER BY dist
    """,
)
def token_graph_khop_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS from the highest-degree token of the co-occurrence graph
    (same ≥100-doc edge set as the triangle/PageRank queries): per-level
    reach histogram — the neighborhood-expansion primitive behind
    related-term discovery and graph-radius profiling.

    Spark side is the distributed frontier expansion every Pregel-style
    system performs: three unrolled rounds of frontier ⋈ edges with an
    anti-join against the visited set (so each node is labeled with its
    FIRST discovery level = its shortest distance); all joins are keyed
    on the token, integers only. The oracle is DuckDB's recursive CTE
    fixpoint over the same edges — a declarative shortest-path twin of
    the iterative plan, the dedup_clusters verification pattern applied
    to traversal."""
    dt = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr("filter(split(text, ' '), x -> x != '')")
                )
            ).alias("tok"),
        )
        .distinct()
    )
    a = dt.select("doc_id", F.col("tok").alias("ta"))
    b = dt.select("doc_id", F.col("tok").alias("tb"))
    # Symmetrize IN-PLAN (explode both edge orientations) instead of a
    # self-union: one linear plan, one token self-join, no union arms to
    # re-derive. Threshold-derived edge list (w>=100) scales with corpus
    # density → persist_corpus, not an executor-pinned checkpoint
    # (r7 ADVICE; same restructure as pagerank_token_graph).
    edges2 = persist_corpus(
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 100)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("ta").alias("src"), F.col("tb").alias("dst")
                    ),
                    F.struct(
                        F.col("tb").alias("src"), F.col("ta").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    degs = edges2.groupBy(F.col("src").alias("tok")).agg(
        F.count("*").alias("deg")
    )
    root = (
        degs.orderBy(F.col("deg").desc(), "tok")
        .limit(1)
        .select("tok", F.lit(0).cast("int").alias("dist"))
    )
    # Same exponential-lineage trap as mmr_diversified_topk: each round
    # references the previous visited/frontier twice, so without lineage
    # truncation the lazy plan recomputes the (expensive) edge pipeline
    # 2^k times. localCheckpoint pins each tiny frontier; the cached edge
    # list is built once.
    visited = root.localCheckpoint()
    frontier = visited.select("tok")
    for d in range(1, 4):
        nxt = (
            frontier.join(edges2, frontier.tok == edges2.src)
            .select(F.col("dst").alias("tok"))
            .distinct()
            .join(visited.select("tok"), "tok", "left_anti")
            .select("tok", F.lit(d).cast("int").alias("dist"))
            .localCheckpoint()
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("tok")
    return (
        visited.groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.min("tok").alias("first_tok"),
        )
        .orderBy("dist")
    )


@register(
    "kneser_ney_bigram_lm",
    tags=("llm", "text"),
    defer=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents
    ),
    idx AS (
        SELECT doc_id, t,
               unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2
    ),
    bg AS (
        SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c
        FROM idx GROUP BY 1, 2
    ),
    w1a AS (
        SELECT w1 AS w1k, CAST(sum(c) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n_follow
        FROM bg GROUP BY w1
    ),
    w2a AS (
        SELECT w2 AS w2k, CAST(count(*) AS BIGINT) AS n_prec
        FROM bg GROUP BY w2
    ),
    t_types AS (SELECT CAST(count(*) AS DOUBLE) AS t_total FROM bg)
    SELECT bg.w1, bg.w2, CAST(bg.c AS BIGINT) AS c,
           round(greatest(bg.c - 0.75, 0) / w1a.c1
                 + (0.75 * w1a.n_follow / w1a.c1)
                   * (w2a.n_prec / t_types.t_total), 6) AS p_kn
    FROM bg
    JOIN w1a ON bg.w1 = w1a.w1k
    JOIN w2a ON bg.w2 = w2a.w2k
    CROSS JOIN t_types
    ORDER BY c DESC, w1, w2 LIMIT 30
    """,
)
def kneser_ney_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed bigram language model estimated over the corpus
    — the classic cluster-scale n-gram LM job (Brants et al., "Large
    Language Models in Machine Translation", 2007, ran exactly this shape
    on MapReduce). Absolute discount d=0.75; the lower-order distribution
    is the proper KN continuation probability N1+(·w2)/|bigram types|,
    not the raw unigram frequency.

    Every model quantity is an integer count aggregated from ONE bigram
    extraction pass (bigram counts; per-w1 totals and follower-type
    counts derive from the COUNTED pair table, never a second corpus
    scan); the only doubles are final divisions of those integers in
    identical order on both engines, so the smoothed probabilities are
    hash-exact. Scale shape: bigram generation is a per-document array
    transform (no shuffle), then one groupBy(w1,w2); the three model
    tables join back on w1/w2 — all equi-joins on the (small) type
    vocabulary, with the type-total crossed in as a broadcast 1-row
    frame. Top-30 by raw count via TakeOrdered."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.expr("filter(split(text, ' '), x -> x != '')").alias("t")
    ).where(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (x, i) -> struct(x AS w1, element_at(t, i + 2) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    # the counted pair table anchors all three model tables AND the final
    # join — checkpoint so the bigram extraction really is ONE pass (the
    # docstring's claim; executed-plan audit: 4 scans without)
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c")).localCheckpoint()
    w1a = bg.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n_follow"),
    )
    w2a = bg.groupBy("w2").agg(F.count("*").cast("long").alias("n_prec"))
    t_types = bg.agg(F.count("*").cast("double").alias("t_total"))
    return (
        bg.join(w1a, "w1")
        .join(w2a, "w2")
        .crossJoin(F.broadcast(t_types))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("c"),
            F.round(
                F.greatest(F.col("c") - 0.75, F.lit(0)) / F.col("c1")
                + (0.75 * F.col("n_follow") / F.col("c1"))
                * (F.col("n_prec") / F.col("t_total")),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(30)
    )


@register(
    "naive_bayes_lang_confusion",
    tags=("llm", "text", "mlprep"),
    defer=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '), x -> x != ''))
                   AS tok
        FROM documents
    ),
    cnt AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    langs AS (
        SELECT lang, CAST(sum(c) AS BIGINT) AS c_lang FROM cnt GROUP BY lang
    ),
    nl AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM langs),
    vocab AS (SELECT DISTINCT tok FROM cnt),
    vsize AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    priors AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY 1
    ),
    ndocs AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
    probs AS (
        SELECT l.lang, vo.tok,
               round(ln((coalesce(c.c, 0) + 1.0) / (l.c_lang + v.v)), 12)
                   AS lp
        FROM vocab vo
        CROSS JOIN langs l
        CROSS JOIN vsize v
        LEFT JOIN cnt c ON c.lang = l.lang AND c.tok = vo.tok
    ),
    dtc AS (
        SELECT doc_id, lang AS true_lang, tok, CAST(count(*) AS BIGINT) AS tc
        FROM toks GROUP BY 1, 2, 3
    ),
    scores AS (
        SELECT d.doc_id, d.true_lang, p.lang,
               round(CAST(
                   sum(CAST(round(d.tc * p.lp, 12) AS DECIMAL(38,12)))
                   AS DOUBLE)
                   + round(ln((pr.nd + 1.0) / (nd2.nn + nl.k)), 12),
                   9) AS score
        FROM dtc d
        JOIN probs p ON d.tok = p.tok
        JOIN priors pr ON p.lang = pr.lang
        CROSS JOIN ndocs nd2
        CROSS JOIN nl
        GROUP BY d.doc_id, d.true_lang, p.lang, pr.nd, nd2.nn, nl.k
    ),
    pred AS (
        SELECT doc_id, true_lang, lang AS pred_lang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang) AS rk
        FROM scores
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM pred WHERE rk = 1
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier TRAINED IN-ENGINE
    (add-1 smoothing over the corpus vocabulary, log-space scoring) and
    evaluated on the corpus as a confusion matrix — the trained-model
    counterpart of the heuristic ``language_id``/``langid_confusion``
    pair, and the canonical "train a counts-based model with a groupBy"
    job. Training is two aggregations (token counts per lang, totals);
    scoring joins each document's token-count vector against the dense
    (vocab x lang) log-probability table — an equi-join on tok, the
    shuffle bounded by corpus token count x n_langs.

    Determinism: every ln() term is rounded to 12dp and decimal-summed
    (the repo's libm recipe); per-document argmax ranks on the rounded
    score with the language as tiebreak. Self-evaluation on the training
    corpus is intentional (no split) — the query demonstrates the
    train/score shape, not generalization."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE: the explode is the CPU-heavy map stage, so spread the
    # narrow projection first (file-count trap), fold to per-doc token
    # counts, and derive the training counts from those — the corpus text
    # is scanned and split exactly one time for both train and score.
    toks = spread(d.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "tok"
        ),
    )
    # per_doc feeds training (via cnt) and scoring; cnt feeds the language
    # totals, the vocab, and the log-prob table. Branches that aggregate a
    # shared parent differently re-execute it (no exchange reuse), so both
    # bounded tables are checkpointed: the corpus is tokenized exactly once.
    per_doc = persist_corpus(
        toks.groupBy("doc_id", "lang", "tok").agg(
            F.count("*").cast("long").alias("tc")
        )
    )  # doc-keyed: O(corpus tokens) — persist, keep lineage
    cnt = per_doc.groupBy("lang", "tok").agg(
        F.sum("tc").cast("long").alias("c")
    ).localCheckpoint()
    langs = cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("c_lang"))
    nl = langs.agg(F.count("*").cast("double").alias("k"))
    vocab = cnt.select("tok").distinct()
    vsize = vocab.agg(F.count("*").cast("long").alias("v"))
    priors = d.groupBy("lang").agg(F.count("*").cast("long").alias("nd"))
    ndocs = d.agg(F.count("*").cast("long").alias("nn"))
    probs = (
        vocab.crossJoin(F.broadcast(langs))
        .crossJoin(F.broadcast(vsize))
        .join(cnt, ["lang", "tok"], "left")
        .select(
            "lang",
            "tok",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.col("c_lang") + F.col("v"))
                ),
                12,
            ).alias("lp"),
        )
    )
    dtc = per_doc.select(
        "doc_id", F.col("lang").alias("true_lang"), "tok", "tc"
    )
    scores = (
        dtc.join(probs.withColumnRenamed("lang", "cand_lang"), "tok")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(
            F.sum(
                F.round(F.col("tc") * F.col("lp"), 12).cast("decimal(38,12)")
            ).alias("tok_lp")
        )
        .join(F.broadcast(priors.withColumnRenamed("lang", "cand_lang")),
              "cand_lang")
        .crossJoin(F.broadcast(ndocs))
        .crossJoin(F.broadcast(nl))
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            F.round(
                F.col("tok_lp").cast("double")
                + F.round(
                    F.log((F.col("nd") + 1.0) / (F.col("nn") + F.col("k"))),
                    12,
                ),
                9,
            ).alias("score"),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), "cand_lang"
    )
    pred = scores.withColumn("rk", F.row_number().over(w_doc)).where(
        F.col("rk") == 1
    )
    return (
        pred.groupBy("true_lang", F.col("cand_lang").alias("pred_lang"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "flesch_readability_by_lang",
    tags=("llm", "text", "quality"),
    defer=True,
    oracle=f"""
    WITH per_doc AS (
        SELECT lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                    AS BIGINT) AS w,
               greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
                                AS BIGINT)) AS s,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS syl
        FROM documents
    ),
    scored AS (
        SELECT lang, w, s, syl,
               round(CAST(w AS DOUBLE) / s, 9) AS wps,
               round(CAST(syl AS DOUBLE) / w, 9) AS spw,
               round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                     - 84.6 * (CAST(syl AS DOUBLE) / w), 9) AS fre
        FROM per_doc WHERE w > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST({oracle_dec_sum('wps')} AS DOUBLE) / count(*), 6)
               AS avg_words_per_sentence,
           round(CAST({oracle_dec_sum('spw')} AS DOUBLE) / count(*), 6)
               AS avg_syllables_per_word,
           round(CAST({oracle_dec_sum('fre')} AS DOUBLE) / count(*), 6)
               AS avg_flesch,
           CAST(sum(CASE WHEN fre < 30.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_very_hard
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def flesch_readability_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring — the classic readability heuristic a
    text-quality tier runs beside Gopher rules: per document, words =
    non-empty whitespace tokens, sentences = runs of terminal punctuation
    (clamped to >= 1), syllables = vowel-group count (the standard
    dictionary-free approximation), FRE = 206.835 − 1.015·(W/S) −
    84.6·(Syl/W); aggregated per language with a "very hard" (< 30)
    tally.

    Scale shape: one corpus pass (three regex/split counts per row, all
    JVM codegen — no UDF), one map-side-combined groupBy(lang). Per-doc
    ratios are round-9 then decimal-summed so the per-lang means are
    cross-engine exact; the Java-vs-RE2 regex dialects agree on these
    character-class patterns by construction."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(F.expr("filter(split(text, ' '), x -> x != '')")).cast(
            "long"
        ).alias("w"),
        F.greatest(
            F.lit(1).cast("long"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
            .cast("long"),
        ).alias("s"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
        ).cast("long").alias("syl"),
    )
    wps = F.col("w").cast("double") / F.col("s")
    spw = F.col("syl").cast("double") / F.col("w")
    scored = per_doc.where(F.col("w") > 0).select(
        "lang",
        F.round(wps, 9).alias("wps"),
        F.round(spw, 9).alias("spw"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 9).alias("fre"),
    )
    n = F.count("*")
    return (
        scored.groupBy("lang")
        .agg(
            n.cast("long").alias("n_docs"),
            F.round(dec_sum("wps").cast("double") / n, 6).alias(
                "avg_words_per_sentence"
            ),
            F.round(dec_sum("spw").cast("double") / n, 6).alias(
                "avg_syllables_per_word"
            ),
            F.round(dec_sum("fre").cast("double") / n, 6).alias("avg_flesch"),
            F.sum(F.when(F.col("fre") < 30.0, 1).otherwise(0))
            .cast("long")
            .alias("n_very_hard"),
        )
        .orderBy("lang")
    )


@register(
    "graph_degree_distribution",
    tags=("llm", "text", "graph"),
    defer=True,
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    edges AS (
        SELECT a.tok AS ta, b.tok AS tb
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING count(*) >= 100
    ),
    deg AS (
        SELECT t, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT ta AS t FROM edges UNION ALL SELECT tb FROM edges
        ) GROUP BY t
    ),
    bucketed AS (
        SELECT t, d,
               CASE WHEN d <= 1 THEN 1 WHEN d <= 2 THEN 2
                    WHEN d <= 4 THEN 4 WHEN d <= 8 THEN 8
                    WHEN d <= 16 THEN 16 WHEN d <= 32 THEN 32
                    WHEN d <= 64 THEN 64 WHEN d <= 128 THEN 128
                    WHEN d <= 256 THEN 256 WHEN d <= 512 THEN 512
                    WHEN d <= 1024 THEN 1024 WHEN d <= 2048 THEN 2048
                    WHEN d <= 4096 THEN 4096 WHEN d <= 8192 THEN 8192
                    ELSE 16384 END AS bucket
        FROM deg
    )
    SELECT CAST(bucket AS BIGINT) AS degree_le,
           CAST(count(*) AS BIGINT) AS n_tokens,
           min(d) AS min_degree, max(d) AS max_degree
    FROM bucketed GROUP BY bucket ORDER BY degree_le
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the token co-occurrence graph (same >= 100
    shared-docs edge list as ``token_graph_triangles``), bucketed into
    powers of two — the heavy-tail profile that decides whether a graph
    algorithm needs skew mitigation (a max-degree node thousands of times
    the median is exactly what the ordered-edge triangle trick and
    PageRank salting defend against; this query measures the threat).

    Scale shape: the edge list is the proven inverted-index join; degrees
    are one groupBy over the (symmetrized via UNION ALL) endpoints; the
    pow2 bucket is a literal CASE chain — NEVER ceil(log2(d)), whose libm
    form mis-buckets exact powers (the ``length_bucketed_batching``
    lesson). The edge list is the shared persisted
    ``_cooccurrence_edges`` (the degree union consumes it twice)."""
    edges = _cooccurrence_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("ta").alias("t"))
        .unionAll(edges.select(F.col("tb").alias("t")))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("d"))
    )
    bucket = F.lit(16384)
    for p in (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        bucket = F.when(F.col("d") <= p, p).otherwise(bucket)
    return (
        deg.withColumn("bucket", bucket)
        .groupBy(F.col("bucket").cast("long").alias("degree_le"))
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.min("d").alias("min_degree"),
            F.max("d").alias("max_degree"),
        )
        .orderBy("degree_le")
    )


@register(
    "cross_entropy_between_sources",
    tags=("llm", "text"),
    defer=True,
    oracle=f"""
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split(text, ' '), x -> x != ''))
                   AS tok
        FROM documents
    ),
    cnt AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2
    ),
    totals AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1
    ),
    vsize AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cnt),
    lnq AS (
        SELECT c.source, c.tok,
               round(ln((c.c + 1.0) / (t.ct + v.v)), 12) AS lq,
               round(ln(1.0 / (t.ct + v.v)), 12) AS lq0
        FROM cnt c JOIN totals t ON c.source = t.source CROSS JOIN vsize v
    ),
    ln0 AS (
        SELECT source, round(ln(1.0 / (ct + (SELECT v FROM vsize))), 12)
                   AS lq0
        FROM totals
    ),
    overlap AS (
        SELECT a.source AS src_a, q.source AS src_b,
               {oracle_dec_sum('round(a.c * (q.lq - q.lq0), 12)')} AS s
        FROM cnt a JOIN lnq q ON a.tok = q.tok AND a.source != q.source
        GROUP BY 1, 2
    )
    SELECT o.src_a, o.src_b,
           round(-(CAST(o.s AS DOUBLE) + ta.ct * z.lq0) / ta.ct, 6)
               AS cross_entropy
    FROM overlap o
    JOIN totals ta ON o.src_a = ta.source
    JOIN ln0 z ON o.src_b = z.source
    ORDER BY src_a, src_b
    """,
)
def cross_entropy_between_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise unigram cross-entropy H(P_A, Q_B) between source corpora
    — the distributional-similarity matrix behind data-mixture design
    (a source whose text is cheap to predict under another's language
    model is redundant; ``source_overlap_matrix`` measures vocabulary
    overlap, this measures the full distribution). Q_B is add-1 smoothed
    over the corpus vocabulary, so H is finite even for disjoint sources.

    The sum over A's vocabulary decomposes as ct_A·ln q0_B (the
    all-tokens-unseen floor) plus corrections only where A and B overlap
    — so the join is cnt_A ⋈ cnt_B on token (bounded by n_sources² rows
    per token), never vocab × sources. Every ln term is round-12 and the
    corrections decimal-summed (the libm recipe)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "tok"
        ),
    )
    # the (source, tok) count table anchors totals, vocab size, the
    # smoothed log-probs, and the overlap join's A side — checkpoint so
    # the corpus tokenizes once (executed-plan audit: 5 scans without)
    cnt = toks.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint()
    totals = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("ct"))
    vsize = cnt.agg(F.countDistinct("tok").cast("long").alias("v"))
    lnq = (
        cnt.join(totals, "source")
        .crossJoin(F.broadcast(vsize))
        .select(
            "source",
            "tok",
            F.round(
                F.log((F.col("c") + 1.0) / (F.col("ct") + F.col("v"))), 12
            ).alias("lq"),
            F.round(F.log(1.0 / (F.col("ct") + F.col("v"))), 12).alias(
                "lq0"
            ),
        )
    )
    ln0 = totals.crossJoin(F.broadcast(vsize)).select(
        "source",
        F.round(F.log(1.0 / (F.col("ct") + F.col("v"))), 12).alias("lq0"),
    )
    a = cnt.select(
        F.col("source").alias("src_a"),
        F.col("tok").alias("tok_a"),
        F.col("c").alias("ca"),
    )
    q = lnq.select(
        F.col("source").alias("src_b"), "tok", "lq", "lq0"
    )
    overlap = (
        a.join(
            q,
            (F.col("tok_a") == F.col("tok"))
            & (F.col("src_a") != F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(
            dec_sum(
                F.round(F.col("ca") * (F.col("lq") - F.col("lq0")), 12)
            ).alias("s")
        )
    )
    return (
        overlap.join(
            F.broadcast(
                totals.select(F.col("source").alias("src_a"), "ct")
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                ln0.select(F.col("source").alias("src_b"), "lq0")
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.round(
                -(F.col("s").cast("double") + F.col("ct") * F.col("lq0"))
                / F.col("ct"),
                6,
            ).alias("cross_entropy"),
        )
        .orderBy("src_a", "src_b")
    )


@register(
    "vocab_growth_heaps_law",
    tags=("llm", "text"),
    defer=True,
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    firsts AS (SELECT tok, min(doc_id) AS fo FROM tok GROUP BY tok),
    mx AS (SELECT max(doc_id) AS m FROM documents),
    cuts AS (
        SELECT i, (SELECT m FROM mx) * i // 10 AS cut
        FROM (SELECT unnest(range(1, 11)) AS i)
    ),
    curve AS (
        SELECT c.i AS decile, c.cut,
               (SELECT CAST(count(*) AS BIGINT) FROM documents d
                WHERE d.doc_id <= c.cut) AS n_docs,
               (SELECT CAST(count(*) AS BIGINT) FROM firsts f
                WHERE f.fo <= c.cut) AS vocab_size
        FROM cuts c
    ),
    pts AS (
        SELECT round(ln(CAST(n_docs AS DOUBLE)), 12) AS x,
               round(ln(CAST(vocab_size AS DOUBLE)), 12) AS y
        FROM curve WHERE n_docs > 0 AND vocab_size > 0
    ),
    fit AS (
        SELECT (sum(x * y) - sum(x) * sum(y) / count(*))
               / (sum(x * x) - sum(x) * sum(x) / count(*)) AS beta,
               (sum(y) - (sum(x * y) - sum(x) * sum(y) / count(*))
                / (sum(x * x) - sum(x) * sum(x) / count(*)) * sum(x))
               / count(*) AS lnk
        FROM pts
    )
    SELECT CAST(c.decile AS BIGINT) AS decile, c.n_docs, c.vocab_size,
           round(f.beta, 6) + 0.0 AS heaps_beta,
           round(exp(f.lnk), 6) AS heaps_k
    FROM curve c CROSS JOIN fit f
    ORDER BY decile
    """,
)
def vocab_growth_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve + Heaps' law fit (V ≈ K·Nᵝ): distinct
    vocabulary size at each decile of the corpus (in doc_id order), with
    the log-log OLS exponent — the corpus statistic that predicts how a
    tokenizer's OOV rate and an index's term dictionary scale from a 1%
    sample to the full 100 TB crawl (β≈0.5 typical for natural text; β
    near 1 flags an id-like token leak, β near 0 a closed vocabulary).

    Scale shape: vocabulary first-occurrences are one (token → min doc)
    aggregate; each decile's vocab count joins the 10-row cutoff table
    against that bounded vocab table (broadcast, ≤10× vocab fan-out) —
    never a rescan of documents per decile. The fit runs over 10 points
    with round-12 log coordinates."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr("filter(split(text, ' '), x -> x != '')"))
        ).alias("tok"),
    )
    firsts = tok.groupBy("tok").agg(F.min("doc_id").alias("fo"))
    mx = d.agg(F.max("doc_id").alias("m"))
    cuts = (
        spark.range(1, 11)
        .select(F.col("id").alias("decile"))
        .crossJoin(F.broadcast(mx))
        .select(
            "decile",
            F.floor(F.col("m") * F.col("decile") / 10).cast("long").alias(
                "cut"
            ),
        )
    )
    n_docs = (
        d.select("doc_id")
        .crossJoin(F.broadcast(cuts))
        .where(F.col("doc_id") <= F.col("cut"))
        .groupBy("decile", "cut")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    vocab = (
        firsts.crossJoin(F.broadcast(cuts))
        .where(F.col("fo") <= F.col("cut"))
        .groupBy(F.col("decile").alias("vd"))
        .agg(F.count("*").cast("long").alias("vocab_size"))
    )
    # the 10-row curve feeds the OLS fit AND the final readout —
    # checkpoint so the first-occurrence aggregation runs once
    curve = n_docs.join(vocab, F.col("decile") == F.col("vd")).select(
        "decile", "n_docs", "vocab_size"
    ).localCheckpoint()
    pts = curve.where(
        (F.col("n_docs") > 0) & (F.col("vocab_size") > 0)
    ).select(
        F.round(F.log(F.col("n_docs").cast("double")), 12).alias("x"),
        F.round(F.log(F.col("vocab_size").cast("double")), 12).alias("y"),
    )
    n = F.count("*")
    beta = (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / n) / (
        F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n
    )
    fit = pts.agg(
        beta.alias("beta"),
        ((F.sum("y") - beta * F.sum("x")) / n).alias("lnk"),
    )
    return (
        curve.crossJoin(F.broadcast(fit))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_docs",
            "vocab_size",
            # + 0.0 canonicalizes IEEE negative zero (a saturated
            # vocabulary fits beta = -0.0 in one engine, +0.0 in the other)
            (F.round("beta", 6) + F.lit(0.0)).alias("heaps_beta"),
            F.round(F.exp("lnk"), 6).alias("heaps_k"),
        )
        .orderBy("decile")
    )


_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "rake_keyword_extraction",
    tags=("llm", "text"),
    defer=True,
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS w,
               generate_subscripts(string_split_regex(lower(text),
                                   '[^a-z]+'), 1) AS pos
        FROM documents WHERE doc_id < 300
    ),
    nt AS MATERIALIZED (
        SELECT doc_id, w, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM tok WHERE w != '' AND w NOT IN ({_RAKE_STOP_SQL})
    ),
    ph AS MATERIALIZED (
        SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS plen,
               string_agg(w, ' ' ORDER BY pos) AS phrase
        FROM nt GROUP BY doc_id, grp
    ),
    wstat AS MATERIALIZED (
        SELECT nt.w,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(ph.plen) AS BIGINT) AS deg
        FROM nt JOIN ph ON nt.doc_id = ph.doc_id AND nt.grp = ph.grp
        GROUP BY nt.w
    ),
    scored AS (
        SELECT ph.doc_id, ph.phrase, ph.plen AS n_words,
               round({oracle_dec_sum(
                   "round(CAST(deg AS DOUBLE) / freq, 12)")}, 6)
                   AS score
        FROM nt
        JOIN ph ON nt.doc_id = ph.doc_id AND nt.grp = ph.grp
        JOIN wstat ON wstat.w = nt.w
        GROUP BY ph.doc_id, ph.grp, ph.phrase, ph.plen
    )
    SELECT doc_id, phrase, n_words, score FROM scored
    ORDER BY score DESC, doc_id, phrase LIMIT 20
    """,
)
def rake_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction): candidate phrases are
    maximal stopword-free token runs (punctuation treated as whitespace —
    the documented simplification); each word scores deg(w)/freq(w) with
    deg(w) = Σ length of phrases containing each occurrence, and a phrase
    scores the sum of its words' scores. Top-20 phrases corpus-wide —
    the cheap unsupervised keyword tier a curation pipeline runs where a
    model-based extractor is too expensive.

    Determinism: per-word scores round-12 then decimal-sum per phrase
    (order-free), output round-6; ranking ties break on (doc_id, phrase).

    Scale shape: tokenization explodes map-side; the phrase islands come
    from a per-document window (gaps-and-islands: pos − row_number);
    word stats aggregate with map-side combine; the phrase-score join is
    token→(broadcastable) word-stat table. Output is TakeOrdered-bounded.
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
            "pos", "w"
        ),
    )
    # nt feeds the phrase fold and both score joins; ph feeds the word
    # stats and the scoring — checkpoint both so the tokenize + islands
    # window runs once (executed-plan audit: 4 scans without)
    nt = (
        tok.where(
            (F.col("w") != "") & ~F.col("w").isin(*STOPWORDS)
        )
        .withColumn(
            "grp",
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            ),
        )
    )
    nt = persist_corpus(nt)  # O(corpus tokens) — persist, keep lineage
    ph = nt.groupBy("doc_id", "grp").agg(
        F.count("*").cast("long").alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s.getField("w"),
            ),
            " ",
        ).alias("phrase"),
    )
    ph = persist_corpus(ph)  # doc-keyed phrase table: O(corpus)
    wstat = (
        nt.join(ph, ["doc_id", "grp"])
        .groupBy("w")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    scored = (
        nt.join(ph, ["doc_id", "grp"])
        .join(F.broadcast(wstat), ["w"])
        .groupBy("doc_id", "grp", "phrase", "plen")
        .agg(
            F.round(
                dec_sum(
                    F.round(
                        F.col("deg").cast("double") / F.col("freq"), 12
                    )
                ),
                6,
            ).alias("score")
        )
    )
    return (
        scored.select(
            "doc_id",
            "phrase",
            F.col("plen").alias("n_words"),
            "score",
        )
        .orderBy(F.col("score").desc(), "doc_id", "phrase")
        .limit(20)
    )


@register(
    "skipgram_training_pairs",
    tags=("llm", "text"),
    defer=True,
    oracle=f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, w, pos FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS w,
                   generate_subscripts(string_split_regex(lower(text),
                                       '[^a-z]+'), 1) AS pos
            FROM documents WHERE doc_id < 120
        ) WHERE w != ''
    ),
    vocab AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS freq,
               CAST(row_number() OVER (ORDER BY count(*) DESC, w)
                    AS BIGINT) - 1 AS widx
        FROM tok GROUP BY w
    ),
    vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    pairs AS MATERIALIZED (
        SELECT c.doc_id, c.w AS center, o.w AS context,
               o.pos - c.pos AS offset
        FROM tok c JOIN tok o
          ON c.doc_id = o.doc_id
         AND o.pos BETWEEN c.pos - 2 AND c.pos + 2
         AND o.pos != c.pos
    ),
    neg AS (
        SELECT p.center, p.context,
               nv.w AS negative
        FROM pairs p
        CROSS JOIN vn
        JOIN vocab nv
          ON nv.widx = {oracle_h60(
              "'neg:' || p.center || ':' || p.context || ':'"
              " || CAST(p.offset AS VARCHAR) || ':' || p.doc_id")} % vn.v
    )
    SELECT center, context, negative,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM neg GROUP BY center, context, negative
    ORDER BY n_pairs DESC, center, context, negative LIMIT 25
    """,
)
def skipgram_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram-with-negative-sampling training-pair generation (the
    word2vec/embedding-pretraining data shape): (center, context) pairs
    from a ±2 token window, each assigned a deterministic negative drawn
    from the frequency-ranked vocabulary by h60 — "random" negatives that
    replay identically in both engines and across retries, which is
    exactly what a resumable 100 TB pair-generation job needs. Output is
    the top-25 most frequent triples.

    Scale shape: the context join is an equi-join on doc_id with a ±2
    band predicate (positions are dense per document, so the band rides
    the join — never a cross join); the vocabulary (bounded) broadcasts
    for the negative lookup; pair counts aggregate map-side."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    # tok feeds the vocab and both window-pair sides; vocab feeds its size
    # and the negative lookup — checkpoint both so the slice tokenizes
    # once (executed-plan audit: 4 scans without)
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
            "pos", "w"
        ),
    ).where(F.col("w") != "")
    tok = persist_corpus(tok)  # exploded token stream: O(corpus tokens)
    # DuckDB generate_subscripts is 1-based; Spark posexplode 0-based —
    # offsets and windows are position-difference-based, so the base
    # cancels everywhere (offset = o.pos - c.pos in both engines).
    vocab = tok.groupBy("w").agg(F.count("*").cast("long").alias("freq"))
    vocab = vocab.select(
        "w",
        "freq",
        (
            F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("w"))
            )
            - 1
        )
        .cast("long")
        .alias("widx"),
    ).localCheckpoint()
    c = tok.select(
        "doc_id", F.col("w").alias("center"), F.col("pos").alias("cpos")
    )
    o = tok.select(
        "doc_id", F.col("w").alias("context"), F.col("pos").alias("opos")
    )
    pairs = c.join(o, ["doc_id"]).where(
        (F.col("opos") >= F.col("cpos") - 2)
        & (F.col("opos") <= F.col("cpos") + 2)
        & (F.col("opos") != F.col("cpos"))
    ).select(
        "doc_id",
        "center",
        "context",
        (F.col("opos") - F.col("cpos")).alias("offset"),
    )
    vn = vocab.agg(F.count("*").cast("long").alias("v"))
    keyed = pairs.crossJoin(F.broadcast(vn)).select(
        "center",
        "context",
        (
            h60(
                F.concat(
                    F.lit("neg:"),
                    F.col("center"),
                    F.lit(":"),
                    F.col("context"),
                    F.lit(":"),
                    F.col("offset").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            )
            % F.col("v")
        ).alias("widx"),
    )
    neg = keyed.join(
        F.broadcast(vocab.select("widx", F.col("w").alias("negative"))),
        ["widx"],
    )
    return (
        neg.groupBy("center", "context", "negative")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy(
            F.col("n_pairs").desc(), "center", "context", "negative"
        )
        .limit(25)
    )


@register(
    "macro_f1_language_id",
    tags=("llm", "text", "eval"),
    defer=True,
    oracle=f"""
    WITH scored AS (
        SELECT d.doc_id, d.lang AS actual,
               CAST({{s_en}} AS BIGINT) AS s_en,
               CAST({{s_de}} AS BIGINT) AS s_de,
               CAST({{s_es}} AS BIGINT) AS s_es,
               CAST({{s_fr}} AS BIGINT) AS s_fr
        FROM documents d WHERE doc_id < 100
    ),
    pred AS (
        SELECT actual,
               CASE
                 WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                 WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                 WHEN s_es >= s_fr THEN 'es'
                 ELSE 'fr'
               END AS predicted
        FROM scored
    ),
    langs AS (
        SELECT DISTINCT actual AS lang FROM pred
        UNION
        SELECT DISTINCT predicted FROM pred
    ),
    nt AS (SELECT actual AS lang, CAST(count(*) AS BIGINT) AS n_true
           FROM pred GROUP BY 1),
    np AS (SELECT predicted AS lang, CAST(count(*) AS BIGINT) AS n_pred
           FROM pred GROUP BY 1),
    tps AS (SELECT actual AS lang, CAST(count(*) AS BIGINT) AS tp
            FROM pred WHERE actual = predicted GROUP BY 1),
    per0 AS (
        SELECT l.lang,
               COALESCE(nt.n_true, 0) AS n_true,
               COALESCE(np.n_pred, 0) AS n_pred,
               COALESCE(tps.tp, 0) AS tp
        FROM langs l
        LEFT JOIN nt USING (lang)
        LEFT JOIN np USING (lang)
        LEFT JOIN tps USING (lang)
    ),
    per AS (
        SELECT lang, n_true, n_pred, tp,
               round(CASE WHEN n_pred = 0 THEN 0.0
                          ELSE CAST(tp AS DOUBLE) / n_pred END, 6) + 0.0
                   AS precision_v,
               round(CASE WHEN n_true = 0 THEN 0.0
                          ELSE CAST(tp AS DOUBLE) / n_true END, 6) + 0.0
                   AS recall_v,
               round(CASE WHEN n_pred + n_true = 0 THEN 0.0
                          ELSE 2.0 * tp / (n_pred + n_true) END, 6) + 0.0
                   AS f1
        FROM per0
    )
    SELECT * FROM (
        SELECT lang, n_true, n_pred, tp, precision_v, recall_v, f1 FROM per
        UNION ALL
        SELECT '__macro__',
               CAST(sum(n_true) AS BIGINT), CAST(sum(n_pred) AS BIGINT),
               CAST(sum(tp) AS BIGINT),
               round(CAST(SUM(CAST(precision_v AS DECIMAL(38,6)))
                          AS DOUBLE) / count(*), 6) + 0.0,
               round(CAST(SUM(CAST(recall_v AS DECIMAL(38,6)))
                          AS DOUBLE) / count(*), 6) + 0.0,
               round(CAST(SUM(CAST(f1 AS DECIMAL(38,6)))
                          AS DOUBLE) / count(*), 6) + 0.0
        FROM per
    ) ORDER BY lang
    """.format(
        s_en=_lang_score_sql("en"),
        s_de=_lang_score_sql("de"),
        s_es=_lang_score_sql("es"),
        s_fr=_lang_score_sql("fr"),
    ),
)
def macro_f1_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 plus macro averages for the bigram
    language-ID classifier — the summary-metric face of
    ``langid_confusion`` (which emits the raw matrix). Classes are the
    UNION of actual and predicted labels, so systematically-missed
    classes (zh: never predictable by the latin-only profiles) appear
    with recall 0 and drag macro-F1 down — exactly what macro averaging
    is for. The ``__macro__`` row carries count SUMS and UNWEIGHTED means
    of the per-class metrics (means of the round-6 values via exact
    decimal sums, so the average is order-free).

    Scale shape: composition of the verified scorer with three bounded
    groupBys and a |classes|-row join — evaluation cost is classifier
    cost."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 100
    ).select("doc_id", F.col("lang").alias("actual"))
    pred = (
        language_id(spark, sf_dir)
        .select("doc_id", F.col("predicted_lang").alias("predicted"))
        .join(d, "doc_id")
        .select("actual", "predicted")
    )
    # tiny frame referenced by four aggregations below — one eager cut
    # (the conformal/MMR recipe) instead of four scorer re-executions
    pred = pred.localCheckpoint()
    langs = (
        pred.select(F.col("actual").alias("lang"))
        .union(pred.select("predicted"))
        .distinct()
    )
    nt = pred.groupBy(F.col("actual").alias("lang")).agg(
        F.count("*").cast("long").alias("n_true")
    )
    np_ = pred.groupBy(F.col("predicted").alias("lang")).agg(
        F.count("*").cast("long").alias("n_pred")
    )
    tps = (
        pred.where(F.col("actual") == F.col("predicted"))
        .groupBy(F.col("actual").alias("lang"))
        .agg(F.count("*").cast("long").alias("tp"))
    )
    per0 = (
        langs.join(nt, "lang", "left")
        .join(np_, "lang", "left")
        .join(tps, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    per = per0.select(
        "lang",
        "n_true",
        "n_pred",
        "tp",
        (
            F.round(
                F.when(F.col("n_pred") == 0, 0.0).otherwise(
                    F.col("tp").cast("double") / F.col("n_pred")
                ),
                6,
            )
            + 0.0
        ).alias("precision_v"),
        (
            F.round(
                F.when(F.col("n_true") == 0, 0.0).otherwise(
                    F.col("tp").cast("double") / F.col("n_true")
                ),
                6,
            )
            + 0.0
        ).alias("recall_v"),
        (
            F.round(
                F.when(F.col("n_pred") + F.col("n_true") == 0, 0.0).otherwise(
                    2.0 * F.col("tp") / (F.col("n_pred") + F.col("n_true"))
                ),
                6,
            )
            + 0.0
        ).alias("f1"),
    )

    def dmean(c):
        return (
            F.round(
                F.sum(F.col(c).cast("decimal(38,6)")).cast("double")
                / F.count("*"),
                6,
            )
            + 0.0
        ).alias(c)

    macro = per.agg(
        F.sum("n_true").cast("long").alias("n_true"),
        F.sum("n_pred").cast("long").alias("n_pred"),
        F.sum("tp").cast("long").alias("tp"),
        dmean("precision_v"),
        dmean("recall_v"),
        dmean("f1"),
    ).select(F.lit("__macro__").alias("lang"), "*")
    return per.unionByName(macro).orderBy("lang")


_SENT_POS = ("fast", "big")
_SENT_NEG = ("slow", "dup")


@register(
    "sentiment_lexicon_by_source",
    tags=("llm", "text"),
    defer=True,
    oracle=f"""
    WITH toks AS (
        SELECT source,
               list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents
    ),
    scored AS (
        SELECT source,
               CAST(len(t) AS BIGINT) AS n_tok,
               CAST(len(list_filter(t, x -> x IN
                   ({", ".join(repr(w) for w in _SENT_POS)}))) AS BIGINT)
                   AS n_pos,
               CAST(len(list_filter(t, x -> x IN
                   ({", ".join(repr(w) for w in _SENT_NEG)}))) AS BIGINT)
                   AS n_neg
        FROM toks WHERE len(t) > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_pos) AS BIGINT) AS pos_hits,
           CAST(sum(n_neg) AS BIGINT) AS neg_hits,
           round(CAST(SUM(CAST(round(
                     CAST(n_pos - n_neg AS DOUBLE) / n_tok, 12)
                 AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) + 0.0
               AS mean_sentiment,
           CAST(sum(CASE WHEN n_pos > n_neg THEN 1 ELSE 0 END) AS BIGINT)
               AS n_positive_docs,
           CAST(sum(CASE WHEN n_neg > n_pos THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative_docs
    FROM scored GROUP BY source ORDER BY source
    """,
)
def sentiment_lexicon_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment scoring aggregated by source — the
    classic distributed-sentiment shape (EDBT'16 "Large Scale Sentiment
    Analysis on Twitter with Spark"): per-document score =
    (pos_hits − neg_hits) / tokens against a fixed lexicon, rolled up to
    per-source means and polarity counts. The lexicon here is a toy
    domain pair (fast/big vs slow/dup — the words this synthetic corpus
    actually contains); a real run swaps in VADER/AFINN terms, the plan
    is identical.

    Determinism: per-doc ratios round-12 then decimal-sum (order-free);
    counts are integers. Scale shape: row-local array filters in the
    scan (no explode, no join against the lexicon — it's a literal
    IN-list), one groupBy by source."""
    d = load_table(spark, sf_dir, "documents")
    pos_list = ", ".join(repr(w) for w in _SENT_POS)
    neg_list = ", ".join(repr(w) for w in _SENT_NEG)
    scored = d.select(
        "source",
        F.expr("size(filter(split(text, ' '), x -> x != ''))")
        .cast("long")
        .alias("n_tok"),
        F.expr(
            f"size(filter(split(text, ' '), x -> x IN ({pos_list})))"
        )
        .cast("long")
        .alias("n_pos"),
        F.expr(
            f"size(filter(split(text, ' '), x -> x IN ({neg_list})))"
        )
        .cast("long")
        .alias("n_neg"),
    ).where(F.col("n_tok") > 0)
    ratio = F.round(
        (F.col("n_pos") - F.col("n_neg")).cast("double") / F.col("n_tok"), 12
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_pos").cast("long").alias("pos_hits"),
            F.sum("n_neg").cast("long").alias("neg_hits"),
            (
                F.round(
                    F.sum(ratio.cast("decimal(38,12)")).cast("double")
                    / F.count("*"),
                    6,
                )
                + 0.0
            ).alias("mean_sentiment"),
            F.sum(
                F.when(F.col("n_pos") > F.col("n_neg"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_positive_docs"),
            F.sum(
                F.when(F.col("n_neg") > F.col("n_pos"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_negative_docs"),
        )
        .orderBy("source")
    )


@register(
    "cohens_kappa_langid",
    tags=("llm", "text", "eval"),
    defer=True,
    oracle=f"""
    WITH scored AS (
        SELECT d.doc_id, d.lang AS actual,
               CAST({{s_en}} AS BIGINT) AS s_en,
               CAST({{s_de}} AS BIGINT) AS s_de,
               CAST({{s_es}} AS BIGINT) AS s_es,
               CAST({{s_fr}} AS BIGINT) AS s_fr
        FROM documents d WHERE doc_id < 100
    ),
    pred AS (
        SELECT actual,
               CASE
                 WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                 WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                 WHEN s_es >= s_fr THEN 'es'
                 ELSE 'fr'
               END AS predicted
        FROM scored
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END)
                      AS BIGINT) AS agree
          FROM pred),
    m AS (
        SELECT COALESCE(a.lang, p.lang) AS lang,
               COALESCE(a.na, 0) AS na, COALESCE(p.np, 0) AS np
        FROM (SELECT actual AS lang, CAST(count(*) AS BIGINT) AS na
              FROM pred GROUP BY 1) a
        FULL OUTER JOIN
             (SELECT predicted AS lang, CAST(count(*) AS BIGINT) AS np
              FROM pred GROUP BY 1) p
        ON a.lang = p.lang
    ),
    pe AS (SELECT CAST(sum(na * np) AS BIGINT) AS chance_num FROM m)
    SELECT n.n AS n_docs, n.agree AS n_agree,
           round(CAST(n.agree AS DOUBLE) / n.n, 6) + 0.0 AS p_observed,
           round(CAST(pe.chance_num AS DOUBLE) / (n.n * n.n), 6) + 0.0
               AS p_chance,
           round((CAST(n.agree AS DOUBLE) / n.n
                  - CAST(pe.chance_num AS DOUBLE) / (n.n * n.n))
                 / (1.0 - CAST(pe.chance_num AS DOUBLE) / (n.n * n.n)), 6)
               + 0.0 AS kappa
    FROM n CROSS JOIN pe
    """.format(
        s_en=_lang_score_sql("en"),
        s_de=_lang_score_sql("de"),
        s_es=_lang_score_sql("es"),
        s_fr=_lang_score_sql("fr"),
    ),
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the language-ID classifier against the gold
    labels — chance-corrected agreement, the honest headline number when
    classes are imbalanced (raw accuracy flatters any classifier that
    parrots the majority class; kappa subtracts the agreement the
    marginals alone would produce). Chance agreement comes from the
    exact integer marginal products (Σ n_actual·n_predicted / n²), so the
    whole statistic is three integer counts and row-local arithmetic.

    Scale shape: classifier pass + two bounded marginal groupBys; the
    kappa formula runs on a single joined row."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 100
    ).select("doc_id", F.col("lang").alias("actual"))
    pred = (
        language_id(spark, sf_dir)
        .select("doc_id", F.col("predicted_lang").alias("predicted"))
        .join(d, "doc_id")
        .select("actual", "predicted")
        .localCheckpoint()
    )
    n = pred.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(F.col("actual") == F.col("predicted"), 1).otherwise(0)
        )
        .cast("long")
        .alias("agree"),
    )
    na = pred.groupBy(F.col("actual").alias("lang")).agg(
        F.count("*").cast("long").alias("na")
    )
    np_ = pred.groupBy(F.col("predicted").alias("lang")).agg(
        F.count("*").cast("long").alias("np")
    )
    m = na.join(np_, "lang", "full_outer").select(
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("np", F.lit(0)).alias("np"),
    )
    pe = m.agg(
        F.sum(F.col("na") * F.col("np")).cast("long").alias("chance_num")
    )
    po = F.col("agree").cast("double") / F.col("n")
    pc = F.col("chance_num").cast("double") / (F.col("n") * F.col("n"))
    return (
        n.crossJoin(F.broadcast(pe))
        .select(
            F.col("n").alias("n_docs"),
            F.col("agree").alias("n_agree"),
            (F.round(po, 6) + 0.0).alias("p_observed"),
            (F.round(pc, 6) + 0.0).alias("p_chance"),
            (F.round((po - pc) / (1.0 - pc), 6) + 0.0).alias("kappa"),
        )
    )


@register(
    "local_clustering_coefficient",
    tags=("llm", "text", "graph"),
    defer=True,
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x != ''))) AS tok
        FROM documents
    ),
    edges AS (
        SELECT a.tok AS ta, b.tok AS tb
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING count(*) >= 100
    ),
    tri AS (
        SELECT e1.ta AS x, e1.tb AS y, e2.tb AS z
        FROM edges e1
        JOIN edges e2 ON e1.tb = e2.ta
        JOIN edges e3 ON e3.ta = e1.ta AND e3.tb = e2.tb
    ),
    tcount AS (
        SELECT t, CAST(count(*) AS BIGINT) AS tn FROM (
            SELECT x AS t FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY t
    ),
    deg AS (
        SELECT t, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT ta AS t FROM edges UNION ALL SELECT tb FROM edges
        ) GROUP BY t
    )
    SELECT deg.t AS tok, deg.d AS degree,
           COALESCE(tc.tn, 0) AS n_triangles,
           round(CAST(2 * COALESCE(tc.tn, 0) AS DOUBLE)
                 / CAST(deg.d * (deg.d - 1) AS DOUBLE), 6) AS lcc
    FROM deg LEFT JOIN tcount tc ON tc.t = deg.t
    WHERE deg.d >= 2
    ORDER BY lcc DESC, tok LIMIT 20
    """,
)
def local_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-node local clustering coefficient on the token co-occurrence
    graph: ``lcc(v) = 2·triangles(v) / (deg(v)·(deg(v)−1))`` — the
    node-level density measure behind community detection, built from the
    SAME ordered-edge triangle enumeration as ``token_graph_triangles``
    (each a<b<c triangle credits all three corners via UNION ALL, so no
    corner is double-counted and no unordered edge list is ever joined).

    Scale shape: inherits the forward-adjacency skew mitigation of the
    ordered triangle join (shared checkpointed ``_cooccurrence_edges`` —
    five consumers below); degree and triangle counts are integer
    groupBys; the final ratio of exact integers is correctly-rounded
    IEEE division (identical cross-engine), with a round-6 + token
    tiebreak TakeOrdered top-20."""
    edges = _cooccurrence_edges(spark, sf_dir)
    e1 = edges.select(F.col("ta").alias("x"), F.col("tb").alias("y"))
    e2 = edges.select(F.col("ta").alias("y"), F.col("tb").alias("z"))
    e3 = edges.select(F.col("ta").alias("x"), F.col("tb").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    tcount = (
        tri.select(F.col("x").alias("t"))
        .unionAll(tri.select(F.col("y").alias("t")))
        .unionAll(tri.select(F.col("z").alias("t")))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("tn"))
    )
    deg = (
        edges.select(F.col("ta").alias("t"))
        .unionAll(edges.select(F.col("tb").alias("t")))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("d"))
    )
    d = F.col("d")
    out = (
        deg.join(tcount, "t", "left")
        .where(d >= 2)
        .select(
            F.col("t").alias("tok"),
            d.alias("degree"),
            F.coalesce(F.col("tn"), F.lit(0)).alias("n_triangles"),
            F.round(
                (2 * F.coalesce(F.col("tn"), F.lit(0))).cast("double")
                / (d * (d - 1)).cast("double"),
                6,
            ).alias("lcc"),
        )
    )
    return out.orderBy(F.col("lcc").desc(), "tok").limit(20)


def tfidf_cosine_pairs(
    spark: SparkSession, sf_dir: str, max_doc_id: int = 120, df_cap: int = 90
) -> DataFrame:
    """TF-IDF document-pair cosine via the inverted-index join, with the
    hot-token guard IN CODE: tokens with document frequency above
    ``df_cap`` are dropped from index, dot products, AND norms (a
    consistent "rare-term cosine" definition), so the candidate join
    fans out only from discriminative tokens — the same doc-frequency
    cap the Jaccard prefix filter and ``item_item_cosine_recs`` apply.
    Weights are ``round(tf·ln(N/df), 12)``; products and squared norms
    round-12 then DECIMAL(38,12)-summed (order-free), so the oracle hash
    is exact despite the ln."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < max_doc_id
    )
    # tok feeds the tf and df aggregations; w feeds the norms and both
    # inverted-index sides — checkpoint both so the slice tokenizes once
    # (executed-plan audit: 8 scans without)
    tok = persist_corpus(
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        ).where(F.col("tok") != "")
    )  # exploded token stream: O(corpus tokens)
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = (
        tok.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") <= df_cap)
    )
    n = d.agg(F.count("*").alias("n_docs"))
    w = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df")
                ),
                12,
            ).alias("w"),
        )
    )
    w = persist_corpus(w)  # (doc, token) weight table: O(corpus tokens)
    norms = (
        w.select(
            "doc_id", F.round(F.col("w") * F.col("w"), 12).alias("w2")
        )
        .groupBy("doc_id")
        .agg(
            F.sqrt(
                F.sum(F.col("w2").cast("decimal(38,12)")).cast("double")
            ).alias("norm")
        )
    )
    wa = w.select(
        F.col("doc_id").alias("da"), "tok", F.col("w").alias("woa")
    )
    wb = w.select(
        F.col("doc_id").alias("db"), "tok", F.col("w").alias("wob")
    )
    dots = (
        wa.join(wb, "tok")
        .where(F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            F.round(F.col("woa") * F.col("wob"), 12).alias("p"),
        )
        .groupBy("da", "db")
        .agg(
            F.sum(F.col("p").cast("decimal(38,12)"))
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("doc_id").alias("da"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(
                F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6
            ).alias("cosine"),
        )
    )


@register(
    "tfidf_cosine_pairs_topk",
    tags=("llm", "text", "similarity"),
    defer=True,
    oracle="""
    WITH d AS (SELECT * FROM documents WHERE doc_id < 120),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d
    ),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM tok
        WHERE tok != '' GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE tok != '' GROUP BY tok HAVING count(DISTINCT doc_id) <= 90
    ),
    n AS (SELECT count(*) AS n_docs FROM d),
    w AS (
        SELECT tf.doc_id, tf.tok,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 12) AS w
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    ),
    norms AS (
        SELECT doc_id,
               sqrt(CAST(sum(CAST(round(w * w, 12) AS DECIMAL(38,12)))
                    AS DOUBLE)) AS norm
        FROM w GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(sum(CAST(round(a.w * b.w, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS dot
        FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT dots.da AS doc_a, dots.db AS doc_b,
           round(dots.dot / (na.norm * nb.norm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = dots.da
    JOIN norms nb ON nb.doc_id = dots.db
    ORDER BY cosine DESC, doc_a, doc_b LIMIT 20
    """,
)
def tfidf_cosine_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar document pairs by TF-IDF cosine over the
    capped (rare-term) vocabulary — the classic sparse-vector IR
    similarity, complementing the dense-embedding ``cosine_topk`` family.
    Fixture fact: the corpus shares one small vocabulary, so most tokens
    sit near df = N and carry ~zero idf; the df-cap both mitigates the
    hot-token fan-out AND drops only near-zero-weight terms here.

    Scale shape: see :func:`tfidf_cosine_pairs` — inverted-index join
    fanning out only from df-capped tokens, decimal-summed dot products,
    TakeOrdered top-20 on the rounded score with id tiebreaks."""
    return (
        tfidf_cosine_pairs(spark, sf_dir)
        .orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(20)
    )


@register(
    "g_test_keyness_topk",
    tags=("llm", "text", "stats"),
    defer=True,
    oracle="""
    WITH toks AS (
        SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'rest' END AS grp,
               unnest(list_filter(string_split(text, ' '), x -> x != ''))
                   AS tok
        FROM documents
    ),
    counts AS (
        SELECT tok,
               CAST(sum(CASE WHEN grp = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(sum(CASE WHEN grp = 'rest' THEN 1 ELSE 0 END)
                    AS BIGINT) AS b
        FROM toks GROUP BY tok
    ),
    totals AS (
        SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
        FROM counts
    ),
    cells AS (
        SELECT c.tok, c.a, c.b,
               t.ta - c.a AS c2, t.tb - c.b AS d2,
               CAST(t.ta AS DOUBLE) AS ta, CAST(t.tb AS DOUBLE) AS tb,
               CAST(c.a + c.b AS DOUBLE) AS r1,
               CAST(t.ta + t.tb - c.a - c.b AS DOUBLE) AS r2,
               CAST(t.ta + t.tb AS DOUBLE) AS n
        FROM counts c CROSS JOIN totals t
        WHERE c.a + c.b >= 50
    )
    SELECT tok, a AS n_en, b AS n_rest,
           round(2.0 * (
             (CASE WHEN a = 0 THEN 0.0
              ELSE round(a * ln(a / (r1 * ta / n)), 12) END)
           + (CASE WHEN b = 0 THEN 0.0
              ELSE round(b * ln(b / (r1 * tb / n)), 12) END)
           + (CASE WHEN c2 = 0 THEN 0.0
              ELSE round(c2 * ln(c2 / (r2 * ta / n)), 12) END)
           + (CASE WHEN d2 = 0 THEN 0.0
              ELSE round(d2 * ln(d2 / (r2 * tb / n)), 12) END)
           ), 6) AS g_stat
    FROM cells ORDER BY g_stat DESC, tok LIMIT 20
    """,
)
def g_test_keyness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood-ratio (G-test / Dunning LLR) keyness: the corpus-
    linguistics standard for keyword extraction between subcorpora (en vs
    rest), more reliable than χ² at small expected counts — G = 2·Σ
    o·ln(o/e) over the same 2×2 token table as ``chi2_keyness_topk``.
    Zero cells contribute 0 (the o·ln o → 0 limit), handled identically
    in both engines; each ln term is round-12 and the four-term sum is
    row-local fixed-order arithmetic.

    Scale shape: identical to the χ² twin — one token groupBy, a
    broadcast 1-row totals crossJoin, TakeOrdered top-20 on the rounded
    statistic with a token tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.when(F.col("lang") == "en", "en").otherwise("rest").alias("grp"),
        F.explode(
            F.expr("filter(split(text, ' '), x -> x != '')")
        ).alias("tok"),
    )
    # the vocab-bounded count table feeds the totals AND the scored
    # readout — checkpoint so the corpus tokenizes once
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("grp") == "en", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("grp") == "rest", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    ).localCheckpoint()
    totals = counts.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    )
    cells = (
        counts.crossJoin(F.broadcast(totals))
        .where(F.col("a") + F.col("b") >= 50)
        .select(
            "tok",
            "a",
            "b",
            (F.col("ta") - F.col("a")).alias("c2"),
            (F.col("tb") - F.col("b")).alias("d2"),
            F.col("ta").cast("double").alias("tad"),
            F.col("tb").cast("double").alias("tbd"),
            (F.col("a") + F.col("b")).cast("double").alias("r1"),
            (F.col("ta") + F.col("tb") - F.col("a") - F.col("b"))
            .cast("double")
            .alias("r2"),
            (F.col("ta") + F.col("tb")).cast("double").alias("n"),
        )
    )

    def term(o, row_tot, col_tot):
        return F.when(o == 0, F.lit(0.0)).otherwise(
            F.round(
                o * F.log(o / (row_tot * col_tot / F.col("n"))), 12
            )
        )

    g = 2.0 * (
        term(F.col("a"), F.col("r1"), F.col("tad"))
        + term(F.col("b"), F.col("r1"), F.col("tbd"))
        + term(F.col("c2"), F.col("r2"), F.col("tad"))
        + term(F.col("d2"), F.col("r2"), F.col("tbd"))
    )
    return (
        cells.select(
            "tok",
            F.col("a").alias("n_en"),
            F.col("b").alias("n_rest"),
            F.round(g, 6).alias("g_stat"),
        )
        .orderBy(F.col("g_stat").desc(), "tok")
        .limit(20)
    )


@register(
    "jsd_source_divergence_topk",
    tags=("llm", "text", "stats"),
    defer=True,
    oracle="""
    WITH tok AS (
        SELECT source, unnest(list_filter(string_split(text, ' '),
                                          x -> x != '')) AS tok
        FROM documents
    ),
    cnts AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY source, tok
    ),
    vocab AS (SELECT DISTINCT tok FROM cnts),
    srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot
             FROM cnts GROUP BY source),
    grid AS (
        SELECT s.source, s.tot, v.tok, COALESCE(c.c, 0) AS c
        FROM srcs s CROSS JOIN vocab v
        LEFT JOIN cnts c ON c.source = s.source AND c.tok = v.tok
    ),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(sum(CAST(
                 (CASE WHEN a.c = 0 THEN 0.0
                  ELSE round((CAST(a.c AS DOUBLE) / a.tot)
                       * ln(CAST(2 * a.c * b.tot AS DOUBLE)
                            / (a.c * b.tot + b.c * a.tot)), 12) END)
               + (CASE WHEN b.c = 0 THEN 0.0
                  ELSE round((CAST(b.c AS DOUBLE) / b.tot)
                       * ln(CAST(2 * b.c * a.tot AS DOUBLE)
                            / (a.c * b.tot + b.c * a.tot)), 12) END)
               AS DECIMAL(38,12))) AS DOUBLE) AS twice_jsd
        FROM grid a JOIN grid b ON a.tok = b.tok AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, round(twice_jsd / 2.0, 6) AS jsd_nats
    FROM pairs ORDER BY jsd_nats DESC, src_a, src_b LIMIT 10
    """,
)
def jsd_source_divergence_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jensen-Shannon divergence between source unigram distributions —
    the SYMMETRIC, bounded (≤ ln 2) divergence data-mixture tooling
    prefers over the asymmetric ``cross_entropy_between_sources``; the
    top-10 most-divergent source pairs are the mixture-rebalancing
    candidates. Each token term keeps the probability RATIOS inside ln
    as exact integer cross-products (``2·c_a·t_b / (c_a·t_b +
    c_b·t_a)``), round-12, DECIMAL(38,12)-summed; zero-count tokens
    contribute the defined 0 limit on their side only.

    Scale shape: one token groupBy per source, a bounded
    sources×vocabulary grid (the ``t_closeness`` grid trick), and the
    pair join fans out over that bounded grid — never over raw rows."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(
            F.expr("filter(split(text, ' '), x -> x != '')")
        ).alias("tok"),
    )
    # the (source, tok) counts anchor the vocab, the per-source totals,
    # and the grid join — checkpoint so the corpus tokenizes once
    # (executed-plan audit: 4 scans without)
    cnts = tok.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint()
    vocab = cnts.select("tok").distinct()
    srcs = cnts.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    grid = (
        srcs.crossJoin(vocab)
        .join(cnts, ["source", "tok"], "left")
        .select(
            "source", "tot", "tok", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    a = grid.select(
        F.col("source").alias("src_a"),
        F.col("tot").alias("ta"),
        "tok",
        F.col("c").alias("ca"),
    )
    b = grid.select(
        F.col("source").alias("src_b"),
        F.col("tot").alias("tb"),
        "tok",
        F.col("c").alias("cb"),
    )
    ca, cb, ta, tb = F.col("ca"), F.col("cb"), F.col("ta"), F.col("tb")
    denom = (ca * tb + cb * ta).cast("double")
    term_a = F.when(ca == 0, F.lit(0.0)).otherwise(
        F.round(
            (ca.cast("double") / ta)
            * F.log((2 * ca * tb).cast("double") / denom),
            12,
        )
    )
    term_b = F.when(cb == 0, F.lit(0.0)).otherwise(
        F.round(
            (cb.cast("double") / tb)
            * F.log((2 * cb * ta).cast("double") / denom),
            12,
        )
    )
    pairs = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum((term_a + term_b).cast("decimal(38,12)"))
            .cast("double")
            .alias("twice_jsd")
        )
    )
    return (
        pairs.select(
            "src_a",
            "src_b",
            F.round(F.col("twice_jsd") / 2.0, 6).alias("jsd_nats"),
        )
        .orderBy(F.col("jsd_nats").desc(), "src_a", "src_b")
        .limit(10)
    )
