from __future__ import annotations

import os

import pytest

from tscd_datalake_adapter_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    conf = {
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "6g",
    }
    # scripts/run_suite_parallel.py gives each worker process its own
    # warehouse dir so concurrent saveAsTable calls never share a path
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE_DIR")
    if wh:
        conf["spark.sql.warehouse.dir"] = wh
    s = get_spark(
        "tscd-tests",
        conf=conf,
        master=f"local[{os.environ.get('SPARK_GRAFT_TEST_CPUS', '8')}]",
    )
    yield s


def pytest_collection_modifyitems(config, items):
    """Poor-man's pytest-xdist (not installed in this environment):
    ``TEST_SHARD=i/N`` deselects every item whose stable nodeid hash isn't
    congruent to i mod N. scripts/run_suite_parallel.py launches N pytest
    processes (each with its own Spark session and warehouse dir) so the
    full suite's wall time divides by ~N; the union of the N shards is
    exactly the full collection (hash partition of nodeids, no overlap)."""
    shard = os.environ.get("TEST_SHARD")
    if not shard:
        return
    import zlib

    idx, n = (int(x) for x in shard.split("/"))
    keep, drop = [], []
    for item in items:
        if zlib.crc32(item.nodeid.encode()) % n == idx:
            keep.append(item)
        else:
            drop.append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_ORACLE


# --- Gutenberg fixture books (FIXTURES.md §F2) -----------------------------

BOOK_V1 = (
    "The Project Gutenberg eBook of Moby Dick\n"
    "Author: Herman Melville\n"
    "License: Project Gutenberg License\n"
    "*** START OF THE PROJECT GUTENBERG EBOOK MOBY DICK ***\n"
    "Call me Ishmael. Some years ago...\n"
    "It was the whale.\n"
    "*** END OF THE PROJECT GUTENBERG EBOOK MOBY DICK ***\n"
    "End of Project Gutenberg trailer text.\n"
)

BOOK_V2 = (
    "Preamble for variant two\n"
    "*** START OF THIS PROJECT GUTENBERG EBOOK FRANKENSTEIN ***\n"
    "You will rejoice to hear...\n"
    "*** END OF THIS PROJECT GUTENBERG EBOOK FRANKENSTEIN ***\n"
    "Trailer.\n"
)

BOOK_UNICODE = (
    "Préambule — 序文\n"
    "*** START OF THE PROJECT GUTENBERG EBOOK 白鯨 🐋 ***\n"
    "Ahab était là. 彼は叫んだ。🌊 naïve café façade\n"
    "*** END OF THE PROJECT GUTENBERG EBOOK 白鯨 🐋 ***\n"
)

BOOK_NO_START = "Just text\n*** END OF THE PROJECT GUTENBERG EBOOK X ***\n"
BOOK_NO_END = "Head\n*** START OF THE PROJECT GUTENBERG EBOOK X ***\nbody\n"
BOOK_SWAPPED = (
    "Head\n*** END OF THE PROJECT GUTENBERG EBOOK X ***\nmiddle\n"
    "*** START OF THE PROJECT GUTENBERG EBOOK X ***\ntail\n"
)


@pytest.fixture()
def book_dir(tmp_path):
    books = {11: BOOK_V1, 22: BOOK_V2, 33: BOOK_UNICODE}
    d = tmp_path / "books"
    d.mkdir()
    for bid, txt in books.items():
        (d / f"book_{bid}.txt").write_text(txt, encoding="utf-8")
    return d
