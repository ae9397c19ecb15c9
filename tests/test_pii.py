"""PII detection/redaction (datapipe/pii.py).

The patterns must behave identically under Java regex (Spark), RE2
(DuckDB oracle) and Python ``re`` (this file) — RE2-compatible subset,
no backrefs/lookaround.  The Python side is the hand-checkable referee;
the DuckDB side is pinned by the doc_pii entry in test_entry_oracle.
"""

from __future__ import annotations

import re

from remilia_spark.datapipe import pii

DOCS = [
    # doc 0: one of each, prose around them
    (0, "mail me at jo.doe+99@sub.example.test or call +1-555-010-7788 "
        "from host 192.168.0.1 today"),
    # doc 1: clean prose — the no-op path
    (1, "the quick brown fox jumps over the lazy dog"),
    # doc 2: an IPv4 must be eaten by the IP rule, not the phone rule
    (2, "gateway 10.20.30.40 responded"),
    # doc 3: two emails back to back, digit-heavy local part
    (3, "a12345@x.test b@y-z.example.org wrote"),
    # doc 4: bare 10-digit phone with dot separators
    (4, "fax 555.010.1234 available"),
    # doc 5: short digit runs must NOT match the phone rule
    (5, "order 123456 shipped in 2024"),
]


def _py_counts(text):
    # mirrors pii_signals: emails/IPs on raw text, phones on the
    # email/IP-redacted text (an 8+-digit dotted IPv4 is otherwise
    # indistinguishable from a dotted phone without lookaround)
    half = re.sub(pii.IP_RE, pii.IP_TOKEN,
                  re.sub(pii.EMAIL_RE, pii.EMAIL_TOKEN, text))
    return (len(re.findall(pii.EMAIL_RE, text)),
            len(re.findall(pii.IP_RE, text)),
            len(re.findall(pii.PHONE_RE, half)))


def _py_redact(text):
    t = re.sub(pii.EMAIL_RE, pii.EMAIL_TOKEN, text)
    t = re.sub(pii.IP_RE, pii.IP_TOKEN, t)
    return re.sub(pii.PHONE_RE, pii.PHONE_TOKEN, t)


def test_patterns_hand_checked():
    assert _py_counts(DOCS[0][1]) == (1, 1, 1)
    assert _py_counts(DOCS[1][1]) == (0, 0, 0)
    # the IP is a phone false-positive candidate (8 digits, dotted); the
    # IP rule claims it before the phone rule ever sees the text
    assert _py_counts(DOCS[2][1]) == (0, 1, 0)
    assert _py_counts(DOCS[3][1]) == (2, 0, 0)
    assert _py_counts(DOCS[4][1]) == (0, 0, 1)
    assert _py_counts(DOCS[5][1]) == (0, 0, 0)
    # redaction order: the IP token survives — phone rule never sees it
    assert _py_redact(DOCS[2][1]) == f"gateway {pii.IP_TOKEN} responded"
    assert pii.EMAIL_TOKEN in _py_redact(DOCS[0][1])
    assert "@" not in _py_redact(DOCS[3][1]).replace(pii.EMAIL_TOKEN, "")


def test_signals_and_redaction_match_python_re(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sig = {r["doc_id"]: (r["n_emails"], r["n_ips"], r["n_phones"])
           for r in pii.pii_signals(df).collect()}
    red = {r["doc_id"]: (r["clean_text"], r["n_redacted"])
           for r in pii.redact_pii(df).collect()}
    for doc_id, text in DOCS:
        want = _py_counts(text)
        assert sig[doc_id] == want, f"doc {doc_id} signal mismatch"
        assert red[doc_id][0] == _py_redact(text), f"doc {doc_id} redaction"
        assert red[doc_id][1] == sum(want)
