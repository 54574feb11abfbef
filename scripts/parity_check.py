"""Local mirror of the round driver's correctness gate.

Runs ``__spark_entry__.entry`` as a smoke check, then every ``queries()``
entry against its ``oracle_sql()`` DuckDB twin on the same parquet tables,
comparing row count, column names, and values (order-insensitive, columns
sorted by name — stricter than a hash: exact cell equality after
normalization). Exit code 0 iff everything matches.

Usage: python scripts/parity_check.py [--sf /root/testdata/sf0.01] [-k filter]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    import datetime as dt
    from decimal import Decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        # exact-bit comparison: queries are designed to be bit-deterministic
        return ("float", repr(v))
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    return v


def _to_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in pdf.iterrows()]
    return cols, sorted(rows, key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-k", default="", help="comma-separated substring filters on query names")
    ap.add_argument("--skip-entry", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from tscd_datalake_adapter_spark import get_spark

    spark = get_spark("parity-check")

    if not args.skip_entry:
        t0 = time.time()
        df = entrymod.entry(spark)
        n = len(df.collect())
        print(f"entry(): {n} rows in {time.time() - t0:.1f}s  schema={df.schema.simpleString()[:120]}")
        assert n >= 0

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, weak = [], [], []
    for name, fn in queries.items():
        if args.k and not any(part in name for part in args.k.split(",")):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {str(exc)[:300]}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"weak {name}: rows={len(spdf)} ({time.time() - t0:.1f}s, no oracle)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"duckdb error: {exc}"))
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            continue
        scols, srows = _to_rows(spdf)
        ocols, orows = _to_rows(opdf)
        if scols != ocols:
            failed.append((name, f"columns {scols} != {ocols}"))
            print(f"FAIL {name}: columns {scols} != {ocols}")
            continue
        if len(srows) != len(orows):
            failed.append((name, f"rowcount {len(srows)} != {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        if srows != orows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            )
            failed.append((name, f"values differ at sorted row {diff[0]}"))
            print(f"FAIL {name}: first diff row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
            continue
        passed.append(name)
        print(f"ok   {name}: rows={len(srows)} ({time.time() - t0:.1f}s)")

    print(
        f"\n{len(passed)} exact-match, {len(weak)} weak (rows-only), "
        f"{len(failed)} FAILED of {len(queries)} queries"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
