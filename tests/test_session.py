"""Session-factory unit coverage (no SparkSession needed)."""

from __future__ import annotations

import pytest

from bigdata_commerce_spark.session import _DEFAULT_HEAP_BYTES, _heap_bytes


@pytest.mark.parametrize(
    ("value", "want"),
    [
        ("8g", 8 * 1024**3),
        ("8G", 8 * 1024**3),
        ("8gb", 8 * 1024**3),  # round-6 advice: crashed int("8gb")
        ("512mb", 512 * 1024**2),
        ("512m", 512 * 1024**2),
        ("64k", 64 * 1024),
        ("1t", 1024**4),
        ("123456789", 123456789),  # bare bytes
        (" 2g ", 2 * 1024**3),  # whitespace tolerated
    ],
)
def test_heap_bytes_parses_every_spark_accepted_form(value, want):
    assert _heap_bytes(value) == want


@pytest.mark.parametrize("value", ["", "lots", "g8", "8q", "-1g", "8.5g"])
def test_heap_bytes_falls_back_on_unparseable(value):
    # round-6 advice: "" hit heap[-1] IndexError; fall back to the
    # 8g default instead of raising.
    assert _heap_bytes(value) == _DEFAULT_HEAP_BYTES
