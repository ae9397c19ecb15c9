"""Frontier-row construction — the reference's request builder re-expressed.

The reference builds requests through validating option funcs
(``request.go:58-72``): method whitelisted to GET/POST/PUT/DELETE
(``request.go:19-28``), URL required, headers/query/body attached.  Our
"request" is a frontier row; the fetch is a corpus join, so headers/body
collapse into optional metadata — but the validation surface is kept for
API fidelity, and the canonicalizer runs at construction exactly like
``createWrappedPut`` (``remilia.go:95-114``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .urlnorm import host_of, normalize_url
from .xxh64 import xxhash64_spark

ALLOWED_METHODS = frozenset({"GET", "POST", "PUT", "DELETE"})  # request.go:19-28


class InvalidRequestError(ValueError):
    pass


@dataclass(frozen=True)
class Request:
    url: str
    url_hash: int
    host: str
    method: str = "GET"
    headers: dict[str, str] = field(default_factory=dict)
    query_params: dict[str, str] = field(default_factory=dict)
    body: bytes = b""


def new_request(url: str, *, method: str = "GET",
                headers: dict[str, str] | None = None,
                query_params: dict[str, str] | None = None,
                body: bytes = b"", base: str | None = None) -> Request:
    """Validate + canonicalize into a Request (raises like request.go)."""
    m = method.upper()
    if m not in ALLOWED_METHODS:
        raise InvalidRequestError(f"invalid method: {method!r}")
    canonical = normalize_url(url, base)
    if canonical is None:
        raise InvalidRequestError(f"invalid url: {url!r}")
    return Request(
        url=canonical,
        url_hash=xxhash64_spark(canonical),
        host=host_of(canonical),
        method=m,
        headers=dict(headers or {}),
        query_params=dict(query_params or {}),
        body=body,
    )


def frontier_row(req: Request, *, depth: int = 0, discovery_order: int = 0,
                 superstep: int = 0) -> dict:
    """Request -> frontier-table row dict (engine schema)."""
    return {
        "url": req.url, "url_hash": req.url_hash, "host": req.host,
        "depth": depth, "discovery_order": discovery_order,
        "parent_hash": None, "link_index": 0, "attempt": 0,
        "next_eligible": superstep, "state": "pending",
    }
