"""Projection-pruning audit: flag executed scans that read a whole wide
table.

For every registry query, execute at sf0.001 (noop sink) and record each
FileSourceScan's read columns vs the table width
(``plans.executed_scan_columns``). A scan reading EVERY column of a wide
table means column pruning never fired — on columnar parquet at 100 TB
that multiplies scan bytes by the unused-column fraction. Flags are a
census for classification, not automatic failures: io round-trips,
schema-evolution demos, and data-quality audits legitimately read full
rows.

Found in r7: the asof family persisted its purchase side UNPROJECTED —
a cache materializes its full schema, so the persist blocked pruning and
every arm read all 6 events columns (incl. props). Rule: PROJECT BEFORE
PERSIST.

Limitation: the width threshold can't see byte-dominance — reading all 5
documents columns is usually legitimate (text IS the payload), while an
unused `text` in a 3-column read would be the real waste. Width is the
automatable proxy; classify flags by reading the query.

Usage:
  python scripts/column_prune_audit.py                 # full registry
  python scripts/column_prune_audit.py --names a,b,c   # subset (merges)
  python scripts/column_prune_audit.py --min-width 8   # flag threshold
Writes per-query scans to .column_prune_audit.json; prints flagged rows.
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
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--min-width",
        type=int,
        default=6,
        help="only flag full-width reads of tables at least this wide",
    )
    args = ap.parse_args()

    from tscd_datalake_adapter_spark import get_spark, plans
    from tscd_datalake_adapter_spark.operators import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "tscd-column-prune-audit",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = (
        [n.strip() for n in args.names.split(",") if n.strip()]
        if args.names
        else sorted(registry)
    )

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in names:
        rec: dict = {}
        try:
            df = registry[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            scans = plans.executed_scan_columns(df)
            rec["scans"] = [
                {
                    "table": s["table"],
                    "n_read": len(s["read"]),
                    "width": s["width"],
                }
                for s in scans
            ]
            full = [
                s
                for s in scans
                if len(s["read"]) >= s["width"] >= args.min_width
            ]
            rec["flag"] = bool(full)
            spark.catalog.clearCache()
        except Exception:
            rec["err"] = traceback.format_exc(limit=2)
            rec["flag"] = False
        results[name] = rec
        if rec["flag"]:
            flagged.append(name)
            print(f"FLAG {name}: {rec['scans']}", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".column_prune_audit.json",
    )
    merged: dict = {}
    if args.names and os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    errs = [n for n, r in results.items() if "err" in r]
    print(
        f"\n{len(flagged)} flagged of {len(names)} audited "
        f"({len(errs)} errors); per-query scans in {out}"
    )
    for n in errs:
        print(f"ERR  {n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
