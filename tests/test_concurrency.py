"""Concurrent query execution on one SparkSession — the driver may run
queries in parallel; shared temp views and temp dirs must not race."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tscd_datalake_adapter_spark.operators import load_all

NAMES = [
    "pricing_summary",
    "customers_per_region",
    "correlated_exists_urgent",  # uses register_views (shared temp views)
    "grouping_sets_sql",  # also register_views
    "csv_roundtrip_agg",  # writes a temp dir
    "term_frequencies",
    "window_rank_orders",
    "stream_tumbling_window",
]


def test_concurrent_queries_consistent(spark, sf_dir):
    registry = load_all()

    def run(name):
        return name, sorted(
            tuple(r) for r in registry[name].fn(spark, sf_dir).collect()
        )

    serial = dict(run(n) for n in NAMES)
    with ThreadPoolExecutor(max_workers=8) as ex:
        concurrent = dict(ex.map(run, NAMES))
    for n in NAMES:
        assert concurrent[n] == serial[n], f"{n} differs under concurrency"
