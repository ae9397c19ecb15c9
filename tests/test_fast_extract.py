"""Differential gate for the fast-path extractor (round-6 optimization).

The fast tokenizer must agree with html.parser on EVERY document it
accepts (it may fall back freely, but never diverge).  Three angles:

* the full synthetic corpus (the bench/flagship input) must take the fast
  path AND agree byte-for-byte with the HTMLParser implementation;
* adversarial fuzz built from constructs around the class boundary
  (charrefs, comments, script, single quotes, unquoted attrs, stray '<',
  unterminated quotes, self-closing, nesting, case) must agree whenever
  the fast path engages;
* known out-of-class constructs must fall back (never mis-parse).
"""

from __future__ import annotations

import random

from remilia_spark.corpus import generate_corpus
from remilia_spark.extract import (
    _AnchorExtractor,
    _Extractor,
    _extract_anchors_fast,
    _extract_fast,
    extract,
    extract_anchors,
)


def _reference_extract(html: str):
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p.flush_open()
    return p.links, "\n".join(p.segments)


def _reference_anchors(html: str):
    p = _AnchorExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p._close()
    return p.anchors


def test_corpus_pages_take_fast_path_and_agree():
    c = generate_corpus(n_pages=800, n_hosts=5, seed=11, n_seeds=5)
    fast_hits = 0
    for html in c.pages["html"]:
        s = bytes(html).decode("utf-8", errors="replace")
        fast = _extract_fast(s)
        want = _reference_extract(s)
        if fast is not None:
            fast_hits += 1
            assert (list(fast[0]), fast[1]) == (list(want[0]), want[1])
        afast = _extract_anchors_fast(s)
        if afast is not None:
            assert afast == _reference_anchors(s)
        # the public entry points must equal the reference either way
        assert extract(html) == want
        assert extract_anchors(html) == _reference_anchors(s)
    # the corpus shape IS the fast-path class; a fallback here means the
    # optimization quietly stopped applying to the benchmark input
    assert fast_hits == len(c.pages)


FRAGMENTS = [
    '<a href="/x/y">', '</a>', '<p>', '</p>', 'hello world', '<h1>',
    '</h1>', '<title>', '</title>', '<a href="/weird/a|b<3>">',
    'text < here', '&amp;', '<!-- c -->', "<a href='sq'>",
    '<A HREF="/UP">', '<a/>', '<br/>', '<a href="un terminated>', '"',
    '>', '<', '<script>x</script>', '<p clas=s>', '<a href="q?a=1&b=2">',
    '\n', '<p >', '</p >', '<a name>', '<a href>', '<a href="">',
    '\x00', '<p a="1" a="2">', '<123>', '<a href="x" />', '<-', '</ p>',
    '<p/q>', 'é≤☃', '<title/>', '<h1/>', '<p/>', '<a name href="z">',
    '<a href="1" href="2">', '<P><p>', '</P>', '<a hRef="MiXeD">',
    '<a href="x">text<a href="y">', '<style>p{}</style>',
]


def test_fuzz_fast_path_never_diverges():
    rng = random.Random(2024)
    fast_engaged = 0
    for _ in range(20000):
        s = "".join(rng.choice(FRAGMENTS)
                    for _ in range(rng.randint(1, 14)))
        fast = _extract_fast(s)
        if fast is not None:
            fast_engaged += 1
            want = _reference_extract(s)
            assert (list(fast[0]), fast[1]) == (list(want[0]), want[1]), s
        afast = _extract_anchors_fast(s)
        if afast is not None:
            assert afast == _reference_anchors(s), s
    assert fast_engaged > 1000  # the fast path actually exercises


def test_out_of_class_constructs_fall_back():
    for s in ('&amp;', '<!doctype html>', '<!-- x -->', '<?php ?>',
              '<script>1<2</script>', '<style>a</style>',
              "<a href='single'>x</a>", '<a href=bare>x</a>',
              '<p foo = "spaced">x</p>', 'stray < bracket',
              '</p junk>', '<p☃>'):
        assert _extract_fast(s) is None
        assert _extract_anchors_fast(s) is None
        # ... and the public API still answers via HTMLParser
        assert extract(s) == _reference_extract(s)
        assert extract_anchors(s) == _reference_anchors(s)
