"""Corpus-volume-broadcast audit: flag broadcasts that grow with SF.

For every registry query, execute at a small and a large scale factor and
compare the rows built into each broadcast relation
(``plans.broadcast_build_rows`` — SQL-status-store metrics, the Spark-UI
source of truth). A build side that is bounded by construction (top-k,
value-domain histogram, fixed dim table, query-id slice) stays flat when
the corpus grows; one that scales with the corpus is a cluster-killer that
no fixture-sized correctness test can catch (the ``pq_adc_topk`` rerank
bug: an unfiltered embeddings broadcast, correct only because the join
key never matched the extra rows).

Default SF pair is sf0.01 -> sf0.1 because documents/embeddings are the
SAME size at sf0.001 and sf0.01 (fixture floor) — growth in the doc/
embedding families is only visible on the 0.01->0.1 edge.

Flag rule: some broadcast's build rows at the large SF exceed
``--min-rows`` (default 2000) AND exceed ``--growth`` (default 3x) times
the LARGEST broadcast at the small SF. Comparing against the small SF's
max (not a per-exchange pairing) keeps the rule robust to AQE picking
different plans per SF; classify flags by reading the query.

Usage:
  python scripts/broadcast_audit.py                  # full registry
  python scripts/broadcast_audit.py --names a,b,c    # subset
Writes per-query rows to .broadcast_audit.json; prints flagged queries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    ap.add_argument("--min-rows", type=int, default=2000)
    ap.add_argument("--growth", type=float, default=3.0)
    args = ap.parse_args()

    from tscd_datalake_adapter_spark import get_spark, plans
    from tscd_datalake_adapter_spark.operators import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "tscd-broadcast-audit",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Size-based broadcasts OFF (both the static planner's and AQE's):
    # at fixture scale AQE auto-broadcasts fact-side frames it would
    # never broadcast on a cluster — those are its job, not bugs. What
    # remains under -1 is exactly the EXPLICIT F.broadcast() hints, the
    # class this audit exists to check (forced_broadcast_base_tables
    # uses the same trick for plan pins).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    registry = load_all()
    names = (
        [n.strip() for n in args.names.split(",") if n.strip()]
        if args.names
        else sorted(registry)
    )

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in names:
        spec = registry[name]
        rec: dict = {}
        try:
            for key, sf_dir in (("small", args.small), ("big", args.big)):
                # thunk form: operator construction runs INSIDE the
                # measured window, so broadcasts in eager checkpoint /
                # cache-build jobs count too (the construction-time
                # blind spot)
                rec[key] = plans.broadcast_build_rows(
                    lambda d=sf_dir: spec.fn(spark, d)
                )
                # cache entries persist across the two runs of one query
                # and across queries — clear so each run builds its own
                spark.catalog.clearCache()
            small_max = max(rec["small"], default=0)
            big_max = max(rec["big"], default=0)
            rec["flag"] = bool(
                big_max >= args.min_rows
                and big_max > args.growth * max(small_max, 1)
            )
        except Exception:
            rec["err"] = traceback.format_exc(limit=2)
            rec["flag"] = False
        results[name] = rec
        if rec["flag"]:
            flagged.append(name)
            print(
                f"FLAG {name}: small={rec['small']} big={rec['big']}",
                flush=True,
            )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".broadcast_audit.json")
    # subset runs (--names) refresh their rows in place; only a full run
    # rewrites the file wholesale
    merged = {}
    if args.names and os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    errs = [n for n, r in results.items() if "err" in r]
    print(
        f"\n{len(flagged)} flagged of {len(names)} audited "
        f"({len(errs)} errors); per-query rows in {out}"
    )
    for n in errs:
        print(f"ERR  {n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
