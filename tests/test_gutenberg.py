"""Marker-split parity tests (SURVEY.md §5.2 item 1; FIXTURES.md §F2 cases)."""

from tscd_datalake_adapter_spark.lake.gutenberg import (
    END_MARKERS,
    START_MARKERS,
    split_book,
)
from tests.conftest import (
    BOOK_NO_END,
    BOOK_NO_START,
    BOOK_SWAPPED,
    BOOK_UNICODE,
    BOOK_V1,
    BOOK_V2,
)


def test_happy_path_variant1():
    r = split_book(BOOK_V1)
    assert r.ok
    # Header ends with the START-marker prefix (split index is *after* the
    # marker, IngestionService.java:112), not the title tail.
    assert r.header.endswith(START_MARKERS[0])
    assert "Moby Dick" in r.header
    # The retained-title-tail semantic (SURVEY.md §1.1): the rest of the
    # START line stays at the head of the body after trim.
    assert r.body.startswith("MOBY DICK ***")
    assert "Call me Ishmael" in r.body
    # END marker and trailer excluded.
    assert END_MARKERS[0] not in r.body
    assert "trailer" not in r.body


def test_happy_path_variant2():
    r = split_book(BOOK_V2)
    assert r.ok
    assert r.header.endswith(START_MARKERS[1])
    assert r.body.startswith("FRANKENSTEIN ***")
    assert "rejoice" in r.body


def test_unicode_roundtrip():
    r = split_book(BOOK_UNICODE)
    assert r.ok
    assert r.body.startswith("白鯨 🐋 ***")
    assert "彼は叫んだ。🌊 naïve café façade" in r.body


def test_missing_start_fails():
    assert not split_book(BOOK_NO_START).ok


def test_missing_end_fails():
    assert not split_book(BOOK_NO_END).ok


def test_end_before_start_fails():
    # e <= s check, IngestionService.java:57.
    assert not split_book(BOOK_SWAPPED).ok


def test_empty_and_garbage():
    assert not split_book("").ok
    assert not split_book("no markers at all").ok
