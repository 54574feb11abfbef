"""Scalar function families (SURVEY.md §2.2): string, date/time, math,
conditional/null, cast-guard, array, map, JSON.

Each family gets one oracle-checked projection query over a key-bounded,
uniquely-ordered sample so results are deterministic and small. All
expressions are JVM-side built-ins (whole-stage codegen) — no Python UDFs in
any of these paths.

Dialect notes baked into the oracles (verified against DuckDB 1.0.0):
``regexp_replace`` needs the ``'g'`` flag to match Spark's replace-all;
``strpos`` == Spark ``instr``/``locate``; list indexing is 1-based in both;
DuckDB ``map[key]`` returns a single-element list (hence ``[1]``); DuckDB
``floor``/``sign`` need casts to match Spark's long output; date outputs are
``strftime``-formatted strings to avoid timestamp-precision skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


@register(
    "string_functions",
    tags=("scalar",),
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 5) AS name_head,
           concat_ws('-', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
           CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
           trim('  ' || p_type || ' ') AS type_trimmed,
           p_name LIKE '%bolt%' AS is_bolt,
           p_type SIMILAR TO '.*(ECO|PRO).*' AS is_eco_promo,
           starts_with(p_name, 'red') AS starts_red,
           p_name LIKE '%ring' AS ends_ring,
           contains(p_name, 'widget') AS has_widget
    FROM part WHERE p_partkey < 100 ORDER BY p_partkey
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family incl. the reference's own predicate shapes: suffix match
    (``S3DatalakeStorage.java:67,103`` endsWith) and substring id parsing
    (``S3DatalakeStorage.java:104-110``)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.instr("p_name", "e").cast("long").alias("first_e"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias(
            "type_trimmed"
        ),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
        F.col("p_type").rlike("(ECO|PRO)").alias("is_eco_promo"),
        F.col("p_name").startswith("red").alias("starts_red"),
        F.col("p_name").endswith("ring").alias("ends_ring"),
        F.col("p_name").contains("widget").alias("has_widget"),
    ).orderBy("p_partkey")


@register(
    "date_functions",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(o_orderdate, '%Y%m%d') AS date_compact,
           strftime(o_orderdate, '%H') AS hour_part,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS plus_30d,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
               AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(date_trunc('month', o_orderdate) AS DATE)::VARCHAR AS month_start,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family incl. the reference's partition derivations:
    ``yyyyMMdd`` and ``HH`` formats (``S3DatalakeStorage.java:21-22``)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("date_compact"),
        F.date_format("o_orderdate", "HH").alias("hour_part"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1.
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    ).orderBy("o_orderkey")


@register(
    "math_functions",
    tags=("scalar",),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_extendedprice - 1000.0) AS dist_1000,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(pow(l_discount, 2), 8) AS disc_sq,
           CAST(CAST(l_quantity AS BIGINT) % 5 AS BIGINT) AS qty_mod5,
           CAST(sign(l_extendedprice - 1000.0) AS BIGINT) AS sign_v,
           round(ln(l_extendedprice + 1.0), 6) AS log_price,
           round(exp(l_discount), 6) AS exp_disc,
           least(l_quantity, 10.0) AS qty_capped,
           greatest(l_discount, 0.02) AS disc_floor
    FROM lineitem WHERE l_orderkey < 40 ORDER BY l_orderkey, l_linenumber
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.abs(F.col("l_extendedprice") - 1000.0).alias("dist_1000"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow("l_discount", 2), 8).alias("disc_sq"),
        F.pmod(F.col("l_quantity").cast("long"), F.lit(5))
        .cast("long")
        .alias("qty_mod5"),
        F.signum(F.col("l_extendedprice") - 1000.0).cast("long").alias("sign_v"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("log_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.least("l_quantity", F.lit(10.0)).alias("qty_capped"),
        F.greatest("l_discount", F.lit(0.02)).alias("disc_floor"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "conditional_functions",
    tags=("scalar",),
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                ELSE 'cold' END AS urgency,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_mapped,
           CASE WHEN o_totalprice > 1500 THEN round(o_totalprice, 2) END AS big_price,
           if(o_orderstatus = 'F', 'final', 'open') AS finality
    FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey
    """,
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif — the engine form of the reference's
    validation/error mapping semantics (``Main.java:147-169``)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 120)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
        .alias("urgency"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_mapped"
        ),
        F.when(F.col("o_totalprice") > 1500, F.round("o_totalprice", 2)).alias(
            "big_price"
        ),
        F.when(F.col("o_orderstatus") == "F", "final")
        .otherwise("open")
        .alias("finality"),
    ).orderBy("o_orderkey")


@register(
    "cast_guard_functions",
    tags=("scalar",),
    oracle="""
    SELECT p_partkey,
           TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_id,
           TRY_CAST(p_type AS BIGINT) AS type_as_int,
           CAST(p_size AS DOUBLE) AS size_d,
           CAST(round(p_retailprice, 0) AS BIGINT) AS price_int
    FROM part WHERE p_partkey < 100 ORDER BY p_partkey
    """,
)
def cast_guard_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded parse: the reference silently drops unparseable ids
    (``S3DatalakeStorage.java:107-110``) — here that's an rlike-guarded cast
    yielding NULL instead of an exception (TRY_CAST twin)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    digits = F.regexp_extract("p_brand", r"([0-9]+)", 1)
    return p.select(
        "p_partkey",
        F.when(digits.rlike("^[0-9]+$"), digits.cast("long")).alias("brand_id"),
        F.when(F.col("p_type").rlike("^[0-9]+$"), F.col("p_type").cast("long")).alias(
            "type_as_int"
        ),
        F.col("p_size").cast("double").alias("size_d"),
        F.round("p_retailprice", 0).cast("long").alias("price_int"),
    ).orderBy("p_partkey")


@register(
    "array_functions",
    tags=("scalar", "llm"),
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           array_to_string(list_transform(list_slice(embedding, 1, 3),
                          x -> printf('%.4f', round(CAST(x AS DOUBLE), 4))), ',')
               AS head3_csv,
           round(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           CAST(label AS BIGINT) AS label
    FROM embeddings WHERE vec_id < 50 ORDER BY vec_id
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size/element_at/slice plus the
    higher-order transform+aggregate dot-product building block (used by the
    similarity operators).

    The registered output serializes the ``head3`` slice to a CSV string
    (``%.4f`` of the rounded doubles, same on both engines) because result
    canonicalizers that lexsort rows pandas-side cannot hash an array cell —
    the same shape fix as ``media_feature_extract``."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias(
            "first_component"
        ),
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.format_string("%.4f", F.round(x.cast("double"), 4)),
            ),
        ).alias("head3_csv"),
        F.round(sq, 6).alias("sq_norm"),
        F.col("label").cast("long").alias("label"),
    ).orderBy("vec_id")


@register(
    "map_functions",
    tags=("scalar",),
    oracle="""
    SELECT n_nationkey,
           map(['name', 'region'],
               [n_name, CAST(n_regionkey AS VARCHAR)])['name'][1] AS name_from_map,
           array_to_string(map_keys(
               map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)])), ',')
               AS keys_csv,
           array_to_string(map_values(
               map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)])), ',')
               AS values_csv
    FROM nation ORDER BY n_nationkey
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: create_map / element_at / map_keys / map_values. (DuckDB's
    ``map[key]`` yields a 1-element list, hence the ``[1]`` in the oracle.)"""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"),
        F.col("n_name"),
        F.lit("region"),
        F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("name_from_map"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
        F.concat_ws(",", F.map_values(m)).alias("values_csv"),
    ).orderBy("n_nationkey")


@register(
    "map_explode",
    tags=("scalar",),
    oracle="""
    SELECT n_nationkey, key, value FROM (
        SELECT n_nationkey, 'name' AS key, n_name AS value FROM nation
        UNION ALL
        SELECT n_nationkey, 'region' AS key, CAST(n_regionkey AS VARCHAR) AS value
        FROM nation
    ) ORDER BY n_nationkey, key
    """,
)
def map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(map) → (key, value) rows; the oracle enumerates the known
    keys algebraically."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"),
        F.col("n_name"),
        F.lit("region"),
        F.col("n_regionkey").cast("string"),
    )
    return n.select("n_nationkey", F.explode(m).alias("key", "value")).orderBy(
        "n_nationkey", "key"
    )


@register(
    "json_functions",
    tags=("scalar",),
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.missing') AS missing_key,
           coalesce(json_valid(props), false) AS is_valid
    FROM events WHERE event_id < 100 ORDER BY event_id
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over ``events.props``: path extraction + typed parse via
    ``from_json`` (schema'd struct, the scale-safe form). Validity is real
    parsing — ``try_parse_json(props) IS NOT NULL`` — which agrees with the
    oracle's ``json_valid`` on malformed strings and non-object JSON alike
    (a regex shape-check would not)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 100)
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
        F.expr("try_parse_json(props) IS NOT NULL").alias("is_valid"),
    ).orderBy("event_id")


@register(
    "variant_shredded_agg",
    tags=("scalars", "json"),
    defer=True,
    oracle="""
    WITH v AS (
        SELECT event_type,
               CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS ok,
               CASE WHEN json_valid(props)
                    THEN CAST(json_extract(props, '$.k') AS BIGINT)
               END AS k
        FROM events
    )
    SELECT event_type,
           CAST(sum(ok) AS BIGINT) AS n_valid,
           CAST(count(*) - sum(ok) AS BIGINT) AS n_invalid,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(count(DISTINCT k) AS BIGINT) AS distinct_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM v GROUP BY event_type ORDER BY event_type
    """,
)
def variant_shredded_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type: parse
    the raw JSON once with ``try_parse_json`` (malformed rows become NULL,
    never a task failure) and extract the typed field with
    ``variant_get(v, '$.k', 'bigint')`` — the open-schema path for
    payloads whose shape isn't known at write time, complementing
    ``json_functions``'s schema'd ``from_json`` (use from_json when the
    schema is fixed: it vectorizes and prunes; use VARIANT when it isn't).
    The aggregate shreds the variant into per-type stats, which is exactly
    what a lakehouse "shredding" materialization would persist.

    Scale shape: parse + extract are row-local expressions in the scan
    stage; one map-side-combined groupBy by type. The binary variant
    encoding decodes fields without re-tokenizing the JSON text per
    access, which is the point of the type at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.expr("try_parse_json(props)").alias("v"),
    ).select(
        "event_type",
        F.when(F.col("v").isNotNull(), 1).otherwise(0).alias("ok"),
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.sum("ok").cast("long").alias("n_valid"),
            (F.count("*") - F.sum("ok")).cast("long").alias("n_invalid"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("distinct_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "map_hof_functions",
    tags=("scalar",),
    defer=True,
    oracle="""
    WITH base AS (
        SELECT n_nationkey,
               n_name AS k1, CAST(n_regionkey AS VARCHAR) AS v1
        FROM nation
    )
    SELECT n_nationkey,
           lower(k1) || '=' || v1 || '0' AS transformed_entry,
           CASE WHEN CAST(v1 AS BIGINT) >= 2 THEN 1 ELSE 0 END
               AS kept_by_filter,
           CAST(v1 AS BIGINT) + length(k1) AS zipped_value
    FROM base ORDER BY n_nationkey
    """,
)
def map_hof_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: ``transform_keys`` (lowercase the key),
    ``transform_values`` (append a digit), ``map_filter`` (keep regionkey
    >= 2), ``map_zip_with`` (combine two maps sharing keys) — the HOF
    quartet the earlier map family (create/keys/values/element_at) left
    out. Maps are not hashable output cells (repo scalar-only rule), so
    each result map is reduced to a deterministic scalar; the oracle
    states the expected entry algebraically.

    Scale shape: per-row expressions, whole-stage codegen."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(F.col("n_name"), F.col("n_regionkey").cast("string"))
    m2 = F.create_map(F.col("n_name"), F.length(F.col("n_name")))
    transformed = F.transform_values(
        F.transform_keys(m, lambda k, v: F.lower(k)),
        lambda k, v: F.concat(v, F.lit("0")),
    )
    filtered = F.map_filter(m, lambda k, v: v.cast("long") >= 2)
    zipped = F.map_zip_with(
        m, m2, lambda k, v1, v2: v1.cast("long") + v2
    )
    return n.select(
        "n_nationkey",
        F.concat(
            F.element_at(F.map_keys(transformed), 1),
            F.lit("="),
            F.element_at(F.map_values(transformed), 1),
        ).alias("transformed_entry"),
        F.size(filtered).cast("long").alias("kept_by_filter"),
        F.element_at(F.map_values(zipped), 1).alias("zipped_value"),
    ).orderBy("n_nationkey")
