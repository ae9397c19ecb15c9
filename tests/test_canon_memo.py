"""Pin the base-independence claim behind the parse-stage canonicalization
memo (round-6 optimization): for hrefs where ``base_independent_key`` fires
(absolute http/https/ftp with an authority), ``normalize_parts(href, base)``
must be identical for EVERY base — that is what lets the memo key on the
href alone and collapse cross-page repeats."""

from __future__ import annotations

import random

from remilia_spark.urlnorm import base_independent_key, normalize_parts

BASES = ["http://a.test/x/y", "https://b.test/", "ftp://c.test/d", None, "",
         "http://host0.test/page/3", "https://x.test/p?q=1", "weird",
         "HTTP://UP.TEST:80/Q"]


def test_base_independent_key_shape():
    assert base_independent_key("http://h.test/p") == "http://h.test/p"
    assert base_independent_key("HTTPS://H.test") == "HTTPS://H.test"
    # empty authority / scheme-relative / relative / other schemes: None
    for href in ("http:///p", "http:/p", "http:p", "//h.test/p", "/p",
                 "p", "", None, "mailto:a@b", "javascript:void(0)",
                 "ftp:///x"):
        assert base_independent_key(href) is None, href


def test_absolute_hrefs_normalize_identically_for_any_base():
    rng = random.Random(5)
    hosts = ["H0.Test", "host1.test", "a.b.co.uk", "1.2.3.4", "[::1]",
             "h.test:8080", "h.test:80", "h.test:443"]
    paths = ["/p", "/a/../b", "", "/%2f%aB", "/p;x=1", "/p?q=1&r=2",
             "/p#f", "/a|b<3>", "/p%ZZ", "//x", "/p?", ";p", "/p?q=%2f"]
    schemes = ["http://", "HTTP://", "https://", "ftp://", "FtP://"]
    tested = 0
    for _ in range(8000):
        href = rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
        if base_independent_key(href) is None:
            continue
        tested += 1
        outs = {normalize_parts(href, b) for b in BASES}
        assert len(outs) == 1, (href, outs)
    assert tested > 4000
