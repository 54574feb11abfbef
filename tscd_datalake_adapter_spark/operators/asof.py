"""As-of join — the time-series operator Spark SQL lacks natively
(SURVEY.md §4.2 custom-operator tier; driver north-star names it).

``asof_join(left, right, on, by)`` attaches to each left row the most recent
right row with ``right.ts <= left.ts`` within the same ``by`` key, with a
deterministic (ts, tiebreak-id) ordering.

Implementation is the union+window technique, not a range join: tag both
sides, sort within each ``by`` key by (ts, side, id), and carry the last seen
right row forward with ``last(..., ignorenulls)``. One shuffle on the key,
O(n log n) in the partition — no candidate-pair blow-up, which is what makes
it hold at 100 TB where an inequality join would quadratically explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import persist_corpus
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    left_id: str,
    right_id: str,
    right_payload: tuple[str, ...] = (),
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join. ``direction='backward'`` (default): for each
    left row, the right row with the greatest ``(on, right_id)`` such that
    ``right.on <= left.on`` and keys match — the most recent prior
    observation. ``direction='forward'``: the right row with the smallest
    ``(on, right_id)`` such that ``right.on >= left.on`` — the next
    observation (pandas ``merge_asof`` directions). Right-side columns
    come back prefixed ``asof_``.

    Both directions are the same union+window plan, only the traversal
    order flips: forward walks time descending, so the last right row
    seen at each left row is the nearest at-or-after one (ids ordered
    descending so equal-timestamp ties resolve to the MINIMUM right id,
    mirroring backward's maximum-id rule under ascending traversal)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    lt = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"), F.col(left_id).alias("_lid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in (right_id, *right_payload)],
    )
    # NULL-`on` guards (SQL as-of semantics: NULL compares with nothing):
    # a NULL-ts right row would otherwise sort NULLS-FIRST and be carried
    # as "most recent" for every row after it — drop it; NULL-ts left
    # rows are kept but their match columns are nulled below.
    rt = right.where(F.col(on).isNotNull()).select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
        *[F.col(c).alias(f"_r_{c}") for c in (right_id, *right_payload)],
    )
    unioned = lt.unionByName(rt)
    # Right rows sort before left rows at equal ts (side 0 < 1): <=/>=
    # inclusive semantics in either direction.
    if direction == "backward":
        order = [
            F.col(on),
            F.col("_side"),
            F.col(f"_r_{right_id}"),
            F.col("_lid"),
        ]
    else:
        order = [
            F.col(on).desc(),
            F.col("_side"),
            F.col(f"_r_{right_id}").desc(),
            F.col("_lid"),
        ]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        by,
        on,
        "_side",
        "_lid",
        *[
            F.last(
                F.when(F.col("_side") == 0, F.col(f"_r_{c}")), ignorenulls=True
            )
            .over(w)
            .alias(f"asof_{c}")
            for c in (right_id, *right_payload)
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        F.col(by),
        F.col(on),
        F.col("_lid").alias(left_id),
        *[
            F.when(F.col(on).isNotNull(), F.col(f"asof_{c}")).alias(
                f"asof_{c}"
            )
            for c in (right_id, *right_payload)
        ],
    )


@register(
    "asof_join_purchase_view",
    tags=("join", "streaming"),
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           v.event_id AS asof_view_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS seconds_since_view
    FROM events p
    LEFT JOIN LATERAL (
        SELECT event_id, ts FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
    ORDER BY p.user_id, purchase_id
    """,
)
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on the events stream: each purchase matched to the user's
    most recent view at-or-before it (ties → max event_id). The oracle is a
    deterministic lateral top-1 subquery; the Spark side never materializes
    candidate pairs."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        left_id="event_id",
        right_id="event_id",
        right_payload=("view_ts",),
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("asof_event_id").alias("asof_view_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_view_ts"))
        .cast("long")
        .alias("seconds_since_view"),
    ).orderBy("user_id", "purchase_id")


@register(
    "asof_join_forward_next_click",
    tags=("join", "streaming"),
    oracle="""
    SELECT s.user_id,
           s.event_id AS signup_id,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
           c.event_id AS asof_click_id,
           CAST(date_diff('second', s.ts, c.ts) AS BIGINT)
               AS seconds_to_click
    FROM events s
    LEFT JOIN LATERAL (
        SELECT event_id, ts FROM events c
        WHERE c.user_id = s.user_id AND c.event_type = 'click'
          AND c.ts >= s.ts
        ORDER BY c.ts ASC, c.event_id ASC LIMIT 1
    ) c ON TRUE
    WHERE s.event_type = 'signup'
    ORDER BY s.user_id, signup_id
    """,
)
def asof_join_forward_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each signup matched to the user's next click
    at-or-after it (ties → min event_id) — the time-to-first-action
    measurement every activation funnel needs. Same union+window plan as
    the backward form with the traversal order flipped; still one shuffle
    on the key, no candidate-pair blow-up."""
    e = load_table(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        signups,
        clicks,
        on="ts",
        by="user_id",
        left_id="event_id",
        right_id="event_id",
        right_payload=("click_ts",),
        direction="forward",
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("signup_ts"),
        F.col("asof_event_id").alias("asof_click_id"),
        (F.unix_timestamp("asof_click_ts") - F.unix_timestamp("ts"))
        .cast("long")
        .alias("seconds_to_click"),
    ).orderBy("user_id", "signup_id")


@register(
    "asof_join_tolerance",
    tags=("join", "streaming"),
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           v.event_id AS asof_view_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT)
               AS seconds_since_view
    FROM events p
    LEFT JOIN LATERAL (
        SELECT event_id, ts FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND v.ts <= p.ts
          AND v.ts >= p.ts - INTERVAL 2 HOUR
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
    ORDER BY p.user_id, purchase_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE band (pandas ``merge_asof(tolerance=)``):
    each purchase matched to the most recent view at most 2 hours before
    it; staler matches become NULL (an attribution window — a view from
    last week should not claim this purchase).

    The tolerance is applied as a post-filter on the backward as-of
    result (microsecond-exact comparison via ``unix_micros``, NOTES.md),
    which keeps the one-shuffle union+window plan; the match columns are
    nulled, not the rows dropped, preserving left cardinality exactly
    like the oracle's banded lateral."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        left_id="event_id",
        right_id="event_id",
        right_payload=("view_ts",),
    )
    in_band = F.unix_micros("asof_view_ts") >= (
        F.unix_micros("ts") - F.lit(2 * 3600 * 1000000)
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.when(in_band, F.col("asof_event_id")).alias("asof_view_id"),
        F.when(
            in_band,
            (F.unix_timestamp("ts") - F.unix_timestamp("asof_view_ts")).cast(
                "long"
            ),
        ).alias("seconds_since_view"),
    ).orderBy("user_id", "purchase_id")


@register(
    "asof_join_nearest",
    tags=("join", "streaming"),
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           v.event_id AS nearest_view_id,
           CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT)
               AS micros_delta
    FROM events p
    LEFT JOIN LATERAL (
        SELECT event_id, ts FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
        ORDER BY abs(date_diff('microsecond', v.ts, p.ts)) ASC,
                 (v.ts > p.ts) ASC, v.event_id ASC LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
    ORDER BY p.user_id, purchase_id
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction='nearest')``):
    each purchase matched to the temporally closest view in EITHER
    direction; exact-tie preference backward (the boolean ``v.ts > p.ts``
    sort key), then min event id.

    Composed from one backward and one forward as-of pass joined on the
    left key — still two key-shuffles total, no pair materialization.
    Distances compare in integer microseconds (``unix_micros``), so the
    direction choice is exact on both engines. The backward arm wins ties
    by max id and the forward arm by min id (each arm's canonical rule);
    the oracle's tiebreak only ranks BETWEEN arms, so the composed result
    is deterministic end-to-end."""
    e = load_table(spark, sf_dir, "events")
    # both arms (backward + forward) consume both sides — cache each
    # filtered projection so events scans once per side, not once per
    # side per arm (audited r7: 4 scans -> 2). persist, not checkpoint:
    # event rows are corpus volume. PROJECT BEFORE PERSIST: a cache
    # materializes its full schema and blocks column pruning through it
    # (the column-prune audit caught the unprojected form reading all 6
    # columns incl. props).
    purchases = persist_corpus(
        e.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
    )
    views = persist_corpus(
        e.where(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id", F.col("ts").alias("view_ts")
        )
    )
    common = dict(
        on="ts",
        by="user_id",
        left_id="event_id",
        right_id="event_id",
        right_payload=("view_ts",),
    )
    b = asof_join(purchases, views, **common).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.col("asof_event_id").alias("b_id"),
        F.col("asof_view_ts").alias("b_ts"),
    )
    f = asof_join(purchases, views, direction="forward", **common).select(
        F.col("event_id").alias("purchase_id"),
        F.col("asof_event_id").alias("f_id"),
        F.col("asof_view_ts").alias("f_ts"),
    )
    j = b.join(f, "purchase_id", "left")
    bd = F.unix_micros("pts") - F.unix_micros("b_ts")
    fd = F.unix_micros("f_ts") - F.unix_micros("pts")
    use_b = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (bd <= fd)
    )
    nearest_id = F.when(use_b, F.col("b_id")).otherwise(F.col("f_id"))
    delta = F.when(use_b, bd).otherwise(-fd)
    return j.select(
        "user_id",
        "purchase_id",
        nearest_id.alias("nearest_view_id"),
        delta.cast("long").alias("micros_delta"),
    ).orderBy("user_id", "purchase_id")


@register(
    "asof_join_interpolate",
    tags=("join", "streaming"),
    defer=True,
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT p.user_id,
           p.event_id AS purchase_id,
           b.event_id AS prev_view_id,
           f.event_id AS next_view_id,
           round(CASE
             WHEN b.event_id IS NOT NULL AND f.event_id IS NOT NULL THEN
               CASE WHEN date_diff('microsecond', b.ts, f.ts) = 0
                    THEN b.value
                    ELSE b.value + (f.value - b.value)
                         * (CAST(date_diff('microsecond', b.ts, p.ts)
                                 AS DOUBLE)
                            / CAST(date_diff('microsecond', b.ts, f.ts)
                                   AS DOUBLE))
               END
             WHEN b.event_id IS NOT NULL THEN b.value
             ELSE f.value
           END, 6) + 0.0 AS interp_value
    FROM p
    LEFT JOIN LATERAL (
        SELECT event_id, ts, value FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) b ON TRUE
    LEFT JOIN LATERAL (
        SELECT event_id, ts, value FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND v.ts >= p.ts
        ORDER BY v.ts ASC, v.event_id ASC LIMIT 1
    ) f ON TRUE
    ORDER BY p.user_id, purchase_id
    """,
)
def asof_join_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATING as-of join — the fourth member of the as-of family
    (backward / forward / nearest / interpolate, the pandas+QuestDB
    surface): each purchase gets the surrounding views' values LINEARLY
    INTERPOLATED at its timestamp, (t−t₀)/(t₁−t₀)-weighted in integer
    microseconds — the sensor-fusion shape (align a sparse series onto
    another clock) a telemetry lake needs constantly. One-sided
    neighborhoods fall back to the available side (LOCF/NOCB at the
    edges); a same-instant bracket degenerates to the backward value
    (0/0 guard).

    ONE scan and ONE key shuffle (r12, guide §2.4): both directions ride
    the same tagged union — the backward carry is a ``last(..,
    ignorenulls)`` over the ascending (ts, side, id) traversal and the
    forward carry the same over the descending traversal, two window
    specs over the SAME partitioning (one Exchange, two in-partition
    sorts, zero joins). Previously this was two separate union+window
    passes (each its own shuffle over both cached sides) re-joined on
    purchase_id — at 100 TB that join re-shuffles every purchase row a
    third time for values the first pass already had in hand. Tie
    semantics are byte-identical to the two-pass form: right rows sort
    before left rows at equal ts in both traversals (inclusive <=/>=),
    ids ascending under the ascending walk (backward ties → max id) and
    descending under the descending walk (forward ties → min id). The
    weight and the blend evaluate identical double operands in identical
    order cross-engine."""
    e = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    # the old right-side NULL-ts guard: a NULL-ts view must match nothing
    # (purchase rows keep their NULL ts; their matches are nulled below)
    u = e.where(
        (is_p | (F.col("event_type") == "view"))
        & (is_p | F.col("ts").isNotNull())
    ).select(
        "user_id",
        "ts",
        F.when(is_p, 1).otherwise(0).alias("_side"),
        F.when(is_p, F.col("event_id")).alias("_lid"),
        F.when(~is_p, F.col("event_id")).alias("_rid"),
        F.when(~is_p, F.col("ts")).alias("_rts"),
        F.when(~is_p, F.col("value")).alias("_rv"),
    )
    frame = (Window.unboundedPreceding, Window.currentRow)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("_side"), F.col("_rid"), F.col("_lid"))
        .rowsBetween(*frame)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(),
            F.col("_side"),
            F.col("_rid").desc(),
            F.col("_lid"),
        )
        .rowsBetween(*frame)
    )

    def carry(col: str, w) -> F.Column:
        return F.last(F.col(col), ignorenulls=True).over(w)

    carried = u.select(
        "user_id",
        "ts",
        "_side",
        "_lid",
        carry("_rid", wb).alias("bb_id"),
        carry("_rts", wb).alias("bb_ts"),
        carry("_rv", wb).alias("bb_v"),
        carry("_rid", wf).alias("ff_id"),
        carry("_rts", wf).alias("ff_ts"),
        carry("_rv", wf).alias("ff_v"),
    )
    # NULL-ts purchases keep their row but match nothing (SQL as-of
    # semantics, same guard as the generic asof_join)
    ok = F.col("ts").isNotNull()
    j = carried.where(F.col("_side") == 1).select(
        "user_id",
        F.col("_lid").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.when(ok, F.col("bb_id")).alias("prev_view_id"),
        F.when(ok, F.col("bb_ts")).alias("b_ts"),
        F.when(ok, F.col("bb_v")).alias("b_v"),
        F.when(ok, F.col("ff_id")).alias("next_view_id"),
        F.when(ok, F.col("ff_ts")).alias("f_ts"),
        F.when(ok, F.col("ff_v")).alias("f_v"),
    )
    span = F.unix_micros("f_ts") - F.unix_micros("b_ts")
    w = (
        (F.unix_micros("pts") - F.unix_micros("b_ts")).cast("double")
        / span.cast("double")
    )
    both = F.col("prev_view_id").isNotNull() & F.col(
        "next_view_id"
    ).isNotNull()
    interp = F.when(
        both,
        F.when(span == 0, F.col("b_v")).otherwise(
            F.col("b_v") + (F.col("f_v") - F.col("b_v")) * w
        ),
    ).otherwise(
        F.when(F.col("prev_view_id").isNotNull(), F.col("b_v")).otherwise(
            F.col("f_v")
        )
    )
    return j.select(
        "user_id",
        "purchase_id",
        "prev_view_id",
        "next_view_id",
        (F.round(interp, 6) + 0.0).alias("interp_value"),
    ).orderBy("user_id", "purchase_id")
