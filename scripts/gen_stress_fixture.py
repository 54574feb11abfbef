"""Generate a LOCAL sf1 stress fixture (10x sf0.1) for scale testing.

The driver ships read-only fixtures up to sf0.1 (17 MB); every scale claim
in the tree is argued and audited but measured only there. This generator
reproduces the SAME schemas, dtypes, and value domains (FIXTURES.md §F1 —
verified against the sf0.1 parquet footers and DuckDB value sampling) at
10x the rows, so the headline bench can be re-run at sf1 and super-linear
constant factors surface (r8 verdict item 7). Seed 42, single-file parquet
per table, written OUTSIDE the repo's tracked tree (default
``/root/repo/.stress/sf1``; .gitignored).

Row counts (10x the sf0.1 column of FIXTURES.md):
customer 150k, supplier 10k, part 200k, orders 1.5M, lineitem ~6M,
events 1M, documents 50k, embeddings 20k; region/nation stay 5/25.

Usage: python scripts/gen_stress_fixture.py [target_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "red", "small", "warm", "young"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
BRANDS = [f"Brand#{i}" for i in range(1, 26)]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
LANG_W = [0.147, 0.412, 0.147, 0.147, 0.147]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_DOCS = 50_000
N_EMB = 20_000
EMB_DIM = 64

# --scale N multiplies every row count above (r9 verdict item 5: the
# sf10 tier = --scale 10, one more decade over sf1, to tell whether the
# steepest sf1 ratios flatten — linear-dominant — or compound). region/
# nation stay 5/25 at every scale, like real TPC-H.


def _ts_us(rng, n, start: str, end: str) -> np.ndarray:
    lo = np.datetime64(start, "us").astype("int64")
    hi = np.datetime64(end, "us").astype("int64")
    return rng.integers(lo, hi, n)


def _write(path: str, name: str, table: pa.Table) -> None:
    out = os.path.join(path, f"{name}.parquet")
    pq.write_table(table, out)
    print(f"{name}: {table.num_rows} rows -> {out}")


def main(target: str, scale: int = 1) -> None:
    global N_CUSTOMER, N_SUPPLIER, N_PART, N_ORDERS
    global N_EVENTS, N_USERS, N_DOCS, N_EMB
    N_CUSTOMER *= scale
    N_SUPPLIER *= scale
    N_PART *= scale
    N_ORDERS *= scale
    N_EVENTS *= scale
    N_USERS *= scale
    N_DOCS *= scale
    N_EMB *= scale
    os.makedirs(target, exist_ok=True)
    rng = np.random.default_rng(SEED)

    _write(target, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(target, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(target, "customer", pa.table({
        "c_custkey": pa.array(np.arange(N_CUSTOMER), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(N_CUSTOMER)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, N_CUSTOMER), pa.int32()
        ),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUSTOMER), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, N_CUSTOMER)]
        ),
    }))

    _write(target, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPPLIER), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, N_SUPPLIER), pa.int32()
        ),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPPLIER), 2),
    }))

    names = np.array(
        [f"{a} {n}" for a in P_ADJ for n in P_NOUN]
    )[rng.integers(0, len(P_ADJ) * len(P_NOUN), N_PART)]
    _write(target, "part", pa.table({
        "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
        "p_name": pa.array(names),
        "p_brand": pa.array(np.array(BRANDS)[rng.integers(0, 25, N_PART)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, N_PART)]),
        "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, N_PART), 2),
    }))

    _write(target, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, N_CUSTOMER, N_ORDERS), pa.int64()
        ),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[
                rng.choice(3, N_ORDERS, p=[0.49, 0.49, 0.02])
            ]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
        "o_orderdate": pa.array(
            _ts_us(rng, N_ORDERS, "1995-01-01", "2001-08-01"),
            pa.timestamp("us"),
        ),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, N_ORDERS)]
        ),
    }))

    lines_per_order = rng.integers(1, 8, N_ORDERS)
    l_orderkey = np.repeat(np.arange(N_ORDERS), lines_per_order)
    n_li = len(l_orderkey)
    l_linenumber = (
        np.arange(n_li)
        - np.repeat(
            np.concatenate(([0], np.cumsum(lines_per_order)[:-1])),
            lines_per_order,
        )
        + 1
    )
    qty = rng.integers(1, 51, n_li).astype("float64")
    _write(target, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PART, n_li), pa.int64()),
        "l_suppkey": pa.array(
            rng.integers(0, N_SUPPLIER, n_li), pa.int64()
        ),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(
            qty * rng.uniform(900, 2100, n_li), 2
        ),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[
                rng.choice(3, n_li, p=[0.25, 0.5, 0.25])
            ]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": pa.array(
            _ts_us(rng, n_li, "1995-01-02", "2001-11-04"),
            pa.timestamp("us"),
        ),
    }))

    _write(target, "events", pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array(
            _ts_us(rng, N_EVENTS, "2024-01-01", "2024-01-31"),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(
            rng.integers(0, N_USERS, N_EVENTS), pa.int64()
        ),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, N_EVENTS)]
        ),
        "value": np.round(
            np.minimum(rng.exponential(60, N_EVENTS), 600.0), 2
        ),
        "props": pa.array(
            [
                '{"k": %d}' % k
                for k in rng.integers(0, 100, N_EVENTS)
            ]
        ),
    }))

    vocab = np.array(VOCAB)
    n_words = rng.integers(10, 101, N_DOCS)
    flat = vocab[rng.integers(0, len(vocab), int(n_words.sum()))]
    texts = []
    pos = 0
    for k in n_words:
        texts.append(" ".join(flat[pos: pos + k]))
        pos += k
    _write(target, "documents", pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(
            np.array(LANGS)[rng.choice(5, N_DOCS, p=LANG_W)]
        ),
        "source": pa.array(
            np.array([f"src{i}" for i in range(20)])[
                rng.integers(0, 20, N_DOCS)
            ]
        ),
        "n_chars": pa.array(
            np.array([len(t) for t in texts]), pa.int64()
        ),
    }))

    vecs = rng.normal(0, 1, (N_EMB, EMB_DIM)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(target, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
        "embedding": pa.array(
            list(vecs), pa.list_(pa.float32())
        ),
        "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
    }))


if __name__ == "__main__":
    argv = sys.argv[1:]
    scale = 1
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    default = (
        "/root/repo/.stress/sf1"
        if scale == 1
        else f"/root/repo/.stress/sf{scale}"
    )
    main(argv[0] if argv else default, scale=scale)
