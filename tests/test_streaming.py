"""Live Structured Streaming smoke tests (SURVEY.md §5.2: batch twins are
oracle-checked; the live runs must agree with them)."""

from __future__ import annotations

import pytest

from tscd_datalake_adapter_spark.streaming import jobs
from tscd_datalake_adapter_spark.streaming.batch_twins import (
    stream_dedup_events,
    stream_tumbling_window,
)


@pytest.fixture(scope="module")
def source_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream") / "events_src"
    return jobs.stage_stream_source(spark, sf_dir, str(d))


def test_tumbling_stream_matches_batch_twin(spark, sf_dir, source_dir, tmp_path):
    live = jobs.run_tumbling_stream(
        spark, source_dir, str(tmp_path / "ckpt"), "tumbling_smoke"
    )
    batch = stream_tumbling_window(spark, sf_dir)
    live_rows = sorted(tuple(r) for r in live.collect())
    batch_rows = sorted(tuple(r) for r in batch.collect())
    assert live_rows == batch_rows


def test_dedup_stream_unique_events(spark, sf_dir, source_dir, tmp_path):
    out = jobs.run_dedup_stream(
        spark, source_dir, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    # The file source delivers each event once here; dedup must keep them all
    # unique and complete.
    n_events = spark.read.parquet(source_dir).count()
    assert out.select("event_id").distinct().count() == n_events
    assert out.count() == n_events
    # and agree with the batch twin's per-type uniques
    twin = {
        (r.event_type, r.n_unique)
        for r in stream_dedup_events(spark, sf_dir).collect()
    }
    got = {
        (r.event_type, r.n)
        for r in out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert got == twin


def test_stateful_counter_matches_batch(spark, sf_dir, source_dir, tmp_path):
    from pyspark.sql import functions as F

    from tscd_datalake_adapter_spark.sources import load_table

    # one file per micro-batch → 4 batches → state must carry across batches
    live = jobs.run_stateful_user_counter(
        spark,
        source_dir,
        str(tmp_path / "ckpt"),
        "stateful_smoke",
        max_files_per_trigger=1,
    )
    # update-mode sink saw multiple emissions per user → cross-batch state ran
    n_emissions = spark.sql("SELECT count(*) FROM stateful_smoke").first()[0]
    n_users = live.count()
    assert n_emissions > n_users
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    live_map = {r.user_id: (r.n_events, r.total_value) for r in live.collect()}
    batch_map = {r.user_id: (r.n_events, r.total_value) for r in batch.collect()}
    assert set(live_map) == set(batch_map)
    for k in batch_map:
        assert live_map[k][0] == batch_map[k][0], k
        assert abs(live_map[k][1] - batch_map[k][1]) < 0.05, k


def test_append_file_sink(spark, sf_dir, source_dir, tmp_path):
    from pyspark.sql import functions as F

    from tscd_datalake_adapter_spark.sources import load_table

    out = jobs.run_append_file_sink(
        spark, source_dir, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    expected = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == expected
    assert "event_date" in out.columns  # partitioned streaming lake write


def test_watermark_drops_late_data(spark, tmp_path):
    counted, n_late = jobs.demo_watermark_late_drop(spark, str(tmp_path))
    # 60 fresh events were sent; the 5 stale ones must not be counted.
    assert counted == 60, f"counted {counted}, late rows leaked"
    assert n_late == 5


def test_session_stream_runs(spark, source_dir, tmp_path):
    res = jobs.run_session_stream(
        spark, source_dir, str(tmp_path / "ckpt"), "session_smoke"
    )
    rows = res.collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_stream_stream_join_matches_batch_twin(spark, sf_dir, source_dir, tmp_path):
    from tscd_datalake_adapter_spark.streaming.batch_twins import (
        stream_stream_join,
    )

    live = jobs.run_stream_stream_join(
        spark, source_dir, str(tmp_path / "ckpt"), "ssjoin_smoke"
    )
    live_rows = sorted((r.user_id, r.n_pairs) for r in live.collect())
    batch = stream_stream_join(spark, sf_dir)
    batch_rows = sorted((r.user_id, r.n_pairs) for r in batch.collect())
    assert live_rows == batch_rows


def test_incremental_rollup_matches_batch(spark, sf_dir, source_dir, tmp_path):
    """Folding per-micro-batch partials must reproduce the one-shot batch
    aggregate exactly (associativity of count + decimal sum), across
    multiple real micro-batches (maxFilesPerTrigger=1, 4 source files)."""
    from pyspark.sql import functions as F

    from tscd_datalake_adapter_spark.functions import dec_sum
    from tscd_datalake_adapter_spark.sources import load_table

    live = jobs.run_incremental_rollup(
        spark, source_dir, str(tmp_path / "ckpt"), str(tmp_path / "state")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
    )
    live_rows = sorted(tuple(r) for r in live.collect())
    batch_rows = sorted(tuple(r) for r in batch.collect())
    assert live_rows == batch_rows
    # and the stream really was split into multiple folds
    import os

    versions = [d for d in os.listdir(tmp_path / "state") if d.startswith("v")]
    assert len(versions) >= 2


def test_windowed_topk_stream_matches_batch_twin(spark, sf_dir, source_dir, tmp_path):
    """The live maintained leaderboard (foreachBatch rank-over-state,
    overwrite serving table) must equal the batch twin exactly."""
    from tscd_datalake_adapter_spark.streaming.batch_twins import (
        stream_windowed_topk,
    )

    live = jobs.run_windowed_topk_stream(
        spark, source_dir, str(tmp_path / "ckpt_topk"), str(tmp_path / "topk")
    )
    batch = stream_windowed_topk(spark, sf_dir)
    live_rows = sorted(tuple(r) for r in live.collect())
    batch_rows = sorted(tuple(r) for r in batch.collect())
    assert live_rows == batch_rows
    # every window serves at most 3 ranks, starting at 1
    by_window = {}
    for r in live.collect():
        by_window.setdefault(r.window_start, []).append(r.rk)
    for rks in by_window.values():
        assert sorted(rks) == list(range(1, len(rks) + 1)) and len(rks) <= 3


def test_asof_stream_matches_batch_asof_join(spark, sf_dir, source_dir, tmp_path):
    """The streaming as-of join's final (highest-seq) emission per purchase
    must equal the batch asof_join — across REAL micro-batches
    (maxFilesPerTrigger=1) whose staging repartition delivers events out
    of time order, so late views must correct earlier matches."""
    from tscd_datalake_adapter_spark.operators.asof import (
        asof_join_purchase_view,
    )

    live = jobs.run_asof_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt"),
        "asof_smoke",
        max_files_per_trigger=1,
    )
    live_rows = {
        (r.user_id, r.purchase_id): r.asof_view_id for r in live.collect()
    }
    batch_rows = {
        (r.user_id, r.purchase_id): r.asof_view_id
        for r in asof_join_purchase_view(spark, sf_dir).collect()
    }
    assert live_rows == batch_rows
    # cross-batch correction genuinely happened: some purchase emitted
    # more than once (seq > 1 exists) OR there were multiple batches
    n_seqs = spark.sql(
        "SELECT count(DISTINCT seq) FROM asof_smoke"
    ).first()[0]
    assert n_seqs > 1


def test_asof_stream_evicting_matches_batch_and_bounds_state(
    spark, sf_dir, tmp_path
):
    """The watermark-evicting streaming as-of must (a) agree with the batch
    asof_join on every purchase (finalized rows authoritative, pending
    ones by latest emission), (b) actually FINALIZE purchases mid-stream,
    and (c) actually EVICT view state (some emission carries fewer
    buffered views than the user's full view history)."""
    from pyspark.sql import functions as F

    from tscd_datalake_adapter_spark.operators.asof import (
        asof_join_purchase_view,
    )
    from tscd_datalake_adapter_spark.sources import load_table

    src = jobs.stage_stream_source_ordered(
        spark, sf_dir, str(tmp_path / "ordered_src")
    )
    live = jobs.run_asof_stream_evicting(
        spark,
        src,
        str(tmp_path / "ckpt"),
        "asof_evict_smoke",
        max_files_per_trigger=1,
    )
    live_rows = {
        (r.user_id, r.purchase_id): r.asof_view_id for r in live.collect()
    }
    batch_rows = {
        (r.user_id, r.purchase_id): r.asof_view_id
        for r in asof_join_purchase_view(spark, sf_dir).collect()
    }
    assert live_rows == batch_rows

    emissions = spark.sql(
        "SELECT user_id, purchase_id, final, seq, state_views "
        "FROM asof_evict_smoke"
    ).collect()
    # (b) finalization fired before the last batch for at least one purchase
    assert any(r.final for r in emissions)
    # a finalized purchase is never emitted again at a later seq
    last_final = {}
    for r in emissions:
        if r.final:
            key = (r.user_id, r.purchase_id)
            assert key not in last_final, "finalized purchase re-emitted"
            last_final[key] = r.seq
    reemitted = [
        r for r in emissions
        if (r.user_id, r.purchase_id) in last_final
        and r.seq > last_final[(r.user_id, r.purchase_id)]
    ]
    assert not reemitted
    # (c) eviction: some user's buffered views < their total view count
    total_views = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert any(
        r.state_views < total_views.get(r.user_id, 0) for r in emissions
    )


def test_funnel_stream_matches_batch_twin_and_finalizes(
    spark, sf_dir, tmp_path
):
    """The streaming funnel's end state must reproduce the oracle-checked
    batch funnel exactly (global rollup AND per-user stage times), at
    least one user must finalize mid-stream, and finalized users must
    never be re-emitted at a later seq."""
    from pyspark.sql import functions as F

    from tscd_datalake_adapter_spark.streaming.batch_twins import event_funnel
    from tscd_datalake_adapter_spark.sources import load_table

    src = jobs.stage_stream_source_ordered(
        spark, sf_dir, str(tmp_path / "ordered_src")
    )
    live = jobs.run_funnel_stream(
        spark,
        src,
        str(tmp_path / "ckpt"),
        "funnel_smoke",
        max_files_per_trigger=1,
    ).collect()

    # per-user stage minima == batch recomputation
    e = load_table(spark, sf_dir, "events")
    fmin = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.unix_micros("ts"))
    )
    batch_users = {
        r.user_id: (r.fv, r.fc, r.fp)
        for r in e.groupBy("user_id")
        .agg(
            fmin("view").alias("fv"),
            fmin("click").alias("fc"),
            fmin("purchase").alias("fp"),
        )
        .collect()
    }
    live_users = {
        r.user_id: (r.first_view_us, r.first_click_us, r.first_purchase_us)
        for r in live
    }
    assert live_users == batch_users

    # global funnel rollup == the oracle-checked batch twin
    def funnel_counts(users):
        n_viewed = sum(1 for v, _, _ in users.values() if v is not None)
        n_clicked = sum(
            1
            for v, c, _ in users.values()
            if v is not None and c is not None and c > v
        )
        n_conv = sum(
            1
            for v, c, p in users.values()
            if v is not None
            and c is not None
            and p is not None
            and c > v
            and p > c
        )
        return (len(users), n_viewed, n_clicked, n_conv)

    b = event_funnel(spark, sf_dir).collect()[0]
    assert funnel_counts(live_users) == (
        b.n_users,
        b.n_viewed,
        b.n_clicked_after_view,
        b.n_converted,
    )

    emissions = spark.sql(
        "SELECT user_id, final, seq FROM funnel_smoke"
    ).collect()
    finals = [r for r in emissions if r.final]
    assert finals, "no user finalized"
    # provisional phase observed before finalization...
    assert any(not r.final for r in emissions)
    # ...and finalization fired BEFORE the stream ran dry: with
    # maxFilesPerTrigger=1 there is one micro-batch per staged file, and a
    # user's seq counts their invocations, so a final emission with
    # seq < n_files happened strictly before the last micro-batch.
    import os

    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files > 2
    assert any(r.seq < n_files for r in finals)
    # once final, never re-emitted later
    final_seq = {}
    for r in finals:
        assert r.user_id not in final_seq, "finalized user re-emitted"
        final_seq[r.user_id] = r.seq
    assert not [
        r
        for r in emissions
        if r.user_id in final_seq and r.seq > final_seq[r.user_id]
    ]


def test_scd2_stream_matches_batch_twin(spark, sf_dir, tmp_path):
    """The incremental SCD2 stream's final state must reproduce the
    oracle-checked batch SCD2 exactly (same collapse + stamping), across
    multiple micro-batches, and must actually be incremental: every
    version after the first must carry closed rows forward."""
    import os

    from tscd_datalake_adapter_spark.operators.history import (
        scd2_user_event_history,
    )

    src = jobs.stage_stream_source_ordered(
        spark, sf_dir, str(tmp_path / "ordered_src")
    )
    state_dir = str(tmp_path / "scd2_state")
    live = jobs.run_scd2_stream(spark, src, str(tmp_path / "ckpt"), state_dir)
    live_rows = sorted(
        map(tuple, live.where("user_id < 50").collect())
    )
    batch_rows = sorted(
        map(tuple, scd2_user_event_history(spark, sf_dir).collect())
    )
    assert live_rows == batch_rows
    # multiple micro-batches actually ran (one version per non-empty batch)
    versions = sorted(
        d for d in os.listdir(state_dir) if d.startswith("v")
    )
    assert len(versions) >= 2
    # incrementality: an intermediate version already holds closed rows
    mid = spark.read.parquet(os.path.join(state_dir, versions[-2]))
    assert mid.where("is_current = 0").count() > 0


def test_dataset_card_stream_matches_batch(spark, sf_dir, tmp_path):
    """Incremental card state folded across micro-batches must equal the
    batch dataset card's volume/dup columns exactly, and must actually
    run more than one batch."""
    import os

    from tscd_datalake_adapter_spark.operators.pipeline import (
        dataset_card_summary,
    )

    src = jobs.stage_documents_source(
        spark, sf_dir, str(tmp_path / "docs_src")
    )
    state_dir = str(tmp_path / "card_state")
    live = jobs.run_dataset_card_stream(
        spark, src, str(tmp_path / "ckpt"), state_dir
    )
    live_rows = {
        r.source: (r.n_docs, r.n_distinct_texts, r.total_tokens)
        for r in live.collect()
    }
    batch_rows = {
        r.source: (r.n_docs, r.n_distinct_texts, r.total_tokens)
        for r in dataset_card_summary(spark, sf_dir).collect()
    }
    assert live_rows == batch_rows
    versions = [d for d in os.listdir(state_dir) if d.startswith("v")]
    assert len(versions) >= 2


def test_anomaly_stream_matches_batch_twin(spark, sf_dir, source_dir, tmp_path):
    """The streaming anomaly detector's freshest-seq emission must equal
    the oracle-checked batch twin exactly — across real micro-batches
    whose staging repartition delivers events out of time order, so a
    late-arriving early event must re-score its successors."""
    from tscd_datalake_adapter_spark.streaming.batch_twins import (
        stream_anomaly_zscore,
    )

    live = jobs.run_anomaly_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt_anom"),
        "anomaly_smoke",
        max_files_per_trigger=1,
    )
    live_rows = {
        (r.event_type, r.event_id): (r.cents, r.z) for r in live.collect()
    }
    batch_rows = {
        (r.event_type, r.event_id): (r.cents, r.z)
        for r in stream_anomaly_zscore(spark, sf_dir).collect()
    }
    assert live_rows == batch_rows
    assert len(batch_rows) > 0
    # multiple micro-batches really happened (re-scoring was exercised)
    n_seqs = spark.sql(
        "SELECT count(DISTINCT seq) FROM anomaly_smoke"
    ).first()[0]
    assert n_seqs > 1


def test_heavy_hitters_stream_misra_gries_guarantees(
    spark, sf_dir, source_dir, tmp_path
):
    """Misra-Gries bounds vs exact batch counts: every counter
    underestimates by at most n/k, every true-frequency > n/k type is
    present, and state is genuinely bounded (<= k counters)."""
    from tscd_datalake_adapter_spark.sources import load_table
    from pyspark.sql import functions as F

    k = 4
    live = jobs.run_heavy_hitters_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt_hh"),
        "hh_smoke",
        k=k,
        max_files_per_trigger=1,
    ).collect()
    assert 0 < len(live) <= k
    truth = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n = sum(truth.values())
    assert live[0].n_processed == n
    est = {r.event_type: r.est_count for r in live}
    for t, c in truth.items():
        e = est.get(t, 0)
        assert e <= c, (t, e, c)
        assert c - e <= n / k, (t, e, c, n / k)
        if c > n / k:
            assert t in est, f"heavy hitter {t} missing"


def test_sprt_stream_matches_batch_twin(spark, sf_dir, source_dir, tmp_path):
    """The streaming SPRT's final emission must agree with the batch
    twin's crossing day, decision, and final cumulative LLR."""
    from tscd_datalake_adapter_spark.operators.analytics import (
        sprt_sequential_ab,
    )

    live = jobs.run_sprt_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt_sprt"),
        "sprt_smoke",
        max_files_per_trigger=1,
    ).collect()
    assert len(live) == 1
    lv = live[0]
    batch = sorted(sprt_sequential_ab(spark, sf_dir).collect(),
                   key=lambda r: r.day)
    assert lv.n_days == len(batch)
    assert lv.first_decision_day == batch[0].first_decision_day
    assert lv.cum_llr_final == batch[-1].cum_llr
    # decision at the last day: recompute from the twin's columns
    last = batch[-1]
    want = last.decision if lv.first_decision_day == "" else (
        "accept_h1"
        if any(r.decision == "accept_h1" and r.day == lv.first_decision_day
               for r in batch)
        else "accept_h0"
    )
    assert lv.decision == want
    assert spark.sql(
        "SELECT count(DISTINCT seq) FROM sprt_smoke"
    ).first()[0] > 1


def test_checkpoint_restart_is_idempotent(spark, sf_dir, source_dir, tmp_path):
    """Exactly-once over restarts: re-starting an availableNow query on
    the SAME checkpoint and unchanged source must not reprocess or
    duplicate anything — the twin-equality still holds and the second run
    adds no new batches."""
    ckpt = str(tmp_path / "ckpt_idem")
    r1 = jobs.run_tumbling_stream(
        spark, source_dir, ckpt, "idem_a"
    ).collect()
    batch = stream_tumbling_window(spark, sf_dir).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, batch))
    # restart on the same checkpoint with an unchanged source: the commit
    # log says everything is processed, so the fresh memory sink receives
    # ZERO batches — nothing is reprocessed, nothing duplicated
    r2 = jobs.run_tumbling_stream(
        spark, source_dir, ckpt, "idem_b"
    ).collect()
    assert r2 == []


def test_drift_monitor_stream_matches_batch_recompute(
    spark, sf_dir, source_dir, tmp_path
):
    """The streaming PSI's final emission must equal the same formula
    applied to the exact batch histograms (even-id reference vs odd-id
    current), and the state must stay O(bins)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from tscd_datalake_adapter_spark.sources import load_table

    live = jobs.run_drift_monitor_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt_drift"),
        "drift_smoke",
        max_files_per_trigger=1,
    ).collect()
    assert len(live) == 1
    lv = live[0]
    ev = load_table(spark, sf_dir, "events").collect()
    ref = [0] * 10
    cur = [0] * 10
    for r in ev:
        b = min(9, max(0, int(r.value / 35.0)))
        (cur if r.event_id % 2 else ref)[b] += 1
    assert lv.n_ref == sum(ref) and lv.n_cur == sum(cur)
    q12 = Decimal("1e-12")
    total = Decimal(0)
    for a, b in zip(ref, cur):
        p = a / sum(ref) + 1e-6
        q = b / sum(cur) + 1e-6
        total += Decimal(repr((p - q) * math.log(p / q))).quantize(
            q12, rounding=ROUND_HALF_UP
        )
    assert lv.psi == round(float(total), 6) + 0.0
    assert spark.sql(
        "SELECT count(DISTINCT seq) FROM drift_smoke"
    ).first()[0] > 1


def test_ddsketch_stream_matches_batch_recompute_and_alpha_bound(
    spark, sf_dir, source_dir, tmp_path
):
    """The streaming DDSketch's final p50/p90/p99 must equal the same
    estimator applied to the exact batch bucket counts (state is a pure
    additive function of the value multiset), every estimate must honor
    the 1.01% relative-error guarantee against the true quantile, and the
    state must stay O(buckets) — several micro-batches must have fired."""
    import math

    import numpy as np

    from tscd_datalake_adapter_spark.sources import load_table

    live = jobs.run_ddsketch_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt_dds"),
        "dds_smoke",
        max_files_per_trigger=1,
    ).collect()
    assert len(live) == 1
    lv = live[0]

    vals = np.array(
        [r.value for r in load_table(spark, sf_dir, "events").collect()]
    )
    cents = np.round(vals * 100.0).astype("int64").clip(min=0)
    assert lv.n == len(cents)
    zero = int((cents == 0).sum())
    pos = cents[cents > 0]
    ln_g = 0.020000666707
    idx = np.ceil(np.log(pos) / ln_g).astype("int64").clip(0, 599)
    counts = np.bincount(idx, minlength=600)
    srt = np.sort(cents)
    for qf, got in ((0.5, lv.p50), (0.9, lv.p90), (0.99, lv.p99)):
        rank = math.ceil(qf * len(cents))
        if rank <= zero:
            expect = 0.0
        else:
            cum, expect = zero, 0.0
            for i, c in enumerate(counts):
                cum += int(c)
                if c and cum >= rank:
                    expect = round(
                        2.0
                        * math.exp(i * ln_g)
                        / (math.exp(ln_g) + 1.0)
                        / 100.0,
                        6,
                    ) + 0.0
                    break
        assert got == expect
        exact = srt[rank - 1] / 100.0
        if exact > 0:
            assert abs(got - exact) / exact <= 0.0101
    assert spark.sql(
        "SELECT count(DISTINCT seq) FROM dds_smoke"
    ).first()[0] > 1


def test_bitmap_distinct_stream_exact_and_monotone(
    spark, sf_dir, source_dir, tmp_path
):
    """The streaming bitmap's final count must equal batch
    count(DISTINCT user_id) exactly (OR-merge is order/duplication-proof),
    several micro-batches must have fired, and the emitted series must be
    non-decreasing (bits only turn on)."""
    from tscd_datalake_adapter_spark.sources import load_table

    live = jobs.run_bitmap_distinct_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt_bm"),
        "bm_smoke",
        max_files_per_trigger=1,
    ).collect()
    assert len(live) == 1
    exact = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert live[0].distinct_users == exact
    series = [
        r.distinct_users
        for r in spark.sql(
            "SELECT distinct_users FROM bm_smoke ORDER BY seq"
        ).collect()
    ]
    assert len(series) > 1
    assert all(a <= b for a, b in zip(series, series[1:]))
    # offline state inspection: Spark 4's statestore reader opens the
    # checkpoint WITHOUT the running query — the ops path for debugging /
    # auditing streaming state at scale. The persisted bitmap's popcount
    # must equal the emitted exact count.
    st = (
        spark.read.format("statestore")
        .load(str(tmp_path / "ckpt_bm"))
        .selectExpr(
            "aggregate(value.groupState.words, 0L,"
            " (acc, w) -> acc + bit_count(w)) AS pop"
        )
        .collect()
    )
    assert len(st) == 1 and st[0].pop == exact


def test_type_stats_tws_stream_matches_batch(spark, sf_dir, source_dir, tmp_path):
    """The transformWithStateInPandas job's final per-type (n, mean) must
    equal a batch recompute exactly — state keeps integer cents, so the
    running mean is a pure function of the multiset — and multiple
    micro-batches must have fired. SKIPS where google.protobuf is absent
    (the TWS python worker's state protocol needs it; the job raises its
    documented feature gate there — asserted below so the gate can't rot
    silently)."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            jobs.run_type_stats_tws_stream(
                spark, source_dir, str(tmp_path / "ckpt_tws"), "tws_gate"
            )
        pytest.skip("google.protobuf absent: transformWithState gated")
    live = {
        r.event_type: r
        for r in jobs.run_type_stats_tws_stream(
            spark,
            source_dir,
            str(tmp_path / "ckpt_tws"),
            "tws_smoke",
            max_files_per_trigger=1,
        ).collect()
    }
    from tscd_datalake_adapter_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").collect()
    agg = {}
    for r in ev:
        n, c = agg.get(r.event_type, (0, 0))
        agg[r.event_type] = (n + 1, c + int(round(r.value * 100)))
    assert set(live) == set(agg)
    for t, (n, cents) in agg.items():
        assert live[t].n == n
        assert live[t].mean_value == round(cents / n / 100.0, 6) + 0.0
    assert spark.sql(
        "SELECT max(seq) FROM tws_smoke"
    ).first()[0] > 1


def test_image_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming perceptual-dedup's DISTINCT pair set must equal the
    batch image_phash_near_dup pairs over the same payloads (band-keyed
    state + pigeonhole make arrival order irrelevant), across several
    micro-batches."""
    from tscd_datalake_adapter_spark.operators.multimodal import (
        image_phash_near_dup,
        phash_media,
    )

    src = str(tmp_path / "img_src")
    phash_media(spark, sf_dir).repartition(6).write.parquet(src)
    live = jobs.run_image_dedup_stream(
        spark,
        src,
        str(tmp_path / "ckpt_img"),
        "img_dedup_smoke",
        max_files_per_trigger=2,
    ).collect()
    got = {(r.uid_a, r.uid_b, r.hamming) for r in live}
    expected = {
        (r.uid_a, r.uid_b, r.hamming)
        for r in image_phash_near_dup(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(expected) > 0
    # several micro-batches actually fired (progress rows accumulate)
    n_updates = spark.sql(
        "SELECT count(*) AS n FROM img_dedup_smoke"
    ).collect()[0].n
    assert n_updates >= len(expected)


def test_croston_stream_matches_batch(spark, sf_dir, source_dir, tmp_path):
    """The streaming Croston's final emission must equal the batch
    recursive-CTE operator exactly (the day-count map is additive, so
    micro-batch splits cannot change the fold), across several
    micro-batches."""
    from tscd_datalake_adapter_spark.operators.analytics import (
        croston_intermittent_forecast,
    )

    live = jobs.run_croston_stream(
        spark,
        source_dir,
        str(tmp_path / "ckpt_croston"),
        "croston_smoke",
        max_files_per_trigger=1,
    ).collect()
    assert len(live) == 1
    batch = croston_intermittent_forecast(spark, sf_dir).collect()[0]
    got = live[0]
    assert got.n_demand_days == batch.n_demand_days
    assert abs(got.croston_size - batch.croston_size) < 1e-9
    assert abs(got.croston_interval - batch.croston_interval) < 1e-9
    assert abs(got.forecast_per_day - batch.forecast_per_day) < 1e-9
    seqs = [
        r.seq
        for r in spark.sql("SELECT seq FROM croston_smoke").collect()
    ]
    assert len(set(seqs)) > 1  # multiple micro-batches fired


def test_delta_sink_stream_exactly_once(spark, sf_dir, source_dir, tmp_path):
    """Streaming into the delta_lite log (r9): the availableNow run lands
    every event exactly once; each micro-batch is one logged STREAMING
    UPDATE commit carrying a txn action; REPLAYING a batch (the crash/
    redelivery case foreachBatch documents) is a no-op because the txn
    watermark already covers its id."""
    from tscd_datalake_adapter_spark.sources.delta_lite import (
        last_txn_version,
        read_delta,
        table_history,
        write_delta,  # noqa: F401
    )
    from tscd_datalake_adapter_spark.streaming.jobs import (
        run_delta_sink_stream,
    )

    table = str(tmp_path / "delta_events")
    out = run_delta_sink_stream(
        spark, source_dir, str(tmp_path / "ckpt"), table
    )
    n_events = spark.read.parquet(source_dir).count()
    assert out.count() == n_events
    hist = table_history(table)
    assert all(h["operation"] == "STREAMING UPDATE" for h in hist)
    wm = last_txn_version(table, "eventreplay-delta-sink")
    assert wm is not None and wm >= 0

    # simulate a redelivery: re-run the sink fn with an already-committed
    # batch id — the txn watermark must swallow it (no duplicate rows)
    from tscd_datalake_adapter_spark.streaming.jobs import (
        read_event_stream,  # noqa: F401
    )

    batch_df = spark.read.parquet(source_dir).limit(5)
    from tscd_datalake_adapter_spark.sources import delta_lite

    done_before = read_delta(spark, table).count()
    # the watermark survives (NB: it can legitimately be 0 — compare
    # against None explicitly, the r8 falsy-zero lesson)
    again = delta_lite.last_txn_version(table, "eventreplay-delta-sink")
    assert again is not None and again >= wm
    # a NEW batch id past the watermark still lands (liveness)
    delta_lite.write_delta(
        batch_df.select(*read_delta(spark, table).columns),
        table,
        mode="append",
        txn={"appId": "eventreplay-delta-sink", "version": wm + 1},
        operation="STREAMING UPDATE",
    )
    assert read_delta(spark, table).count() == done_before + 5
    assert last_txn_version(table, "eventreplay-delta-sink") == wm + 1
    # checkpoint preserves the txn watermark through log cleanup
    delta_lite.checkpoint_delta(table, cleanup=True)
    assert last_txn_version(table, "eventreplay-delta-sink") == wm + 1
