"""Request-builder validation contracts (request_test.go:10-89 re-expressed)."""

from __future__ import annotations

import pytest

from remilia_spark.request import (
    ALLOWED_METHODS,
    InvalidRequestError,
    frontier_row,
    new_request,
)


@pytest.mark.parametrize("m", sorted(ALLOWED_METHODS))
def test_methods_allowed(m):
    assert new_request("http://a.test/x", method=m.lower()).method == m


@pytest.mark.parametrize("m", ["PATCH", "HEAD", "OPTIONS", "", "get "])
def test_methods_rejected(m):
    with pytest.raises(InvalidRequestError):
        new_request("http://a.test/x", method=m)


def test_url_canonicalized_and_hashed():
    r = new_request("HTTP://A.TEST:80/x#frag")
    assert r.url == "http://a.test/x"
    assert r.host == "a.test"
    from remilia_spark.xxh64 import xxhash64_spark
    assert r.url_hash == xxhash64_spark("http://a.test/x")


def test_invalid_url_rejected():
    for bad in ("", "javascript:void(0)", "notaurl", "mailto:a@b.c"):
        with pytest.raises(InvalidRequestError):
            new_request(bad)


def test_relative_url_with_base():
    r = new_request("../p/2", base="http://a.test/p/1")
    assert r.url == "http://a.test/p/2"


def test_frontier_row_shape():
    row = frontier_row(new_request("http://a.test/x"), depth=1,
                       discovery_order=7, superstep=3)
    assert row["state"] == "pending" and row["next_eligible"] == 3
    assert set(row) == {"url", "url_hash", "host", "depth", "discovery_order",
                        "parent_hash", "link_index", "attempt",
                        "next_eligible", "state"}
