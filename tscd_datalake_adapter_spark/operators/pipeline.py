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

from tscd_datalake_adapter_spark.functions import oracle_dec_sum
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
