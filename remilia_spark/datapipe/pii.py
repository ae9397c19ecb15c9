"""PII detection and redaction over the documents table.

The standard pre-training scrub (Dolma's ``pii`` tagger, RefinedWeb §2.5,
The Pile's analysis): e-mail addresses, IPv4 addresses and phone numbers
are detected with conservative regexes and replaced with fixed tokens so
downstream dedup/sampling never shards on a live address.  The reference
engine has no analogue (it stops at fetch/parse, remilia.go:166-199);
this is part of the training-data layer the Spark rebuild adds on top.

Everything here is JVM column math — ``regexp_count`` /
``regexp_replace`` inside whole-stage codegen, no UDFs, no shuffle at
all (one projection per doc).  At 100 TB the operator is embarrassingly
parallel and IO-bound; the care taken is pattern hygiene:

* patterns are RE2-compatible (no backrefs, no lookaround) so the exact
  same strings run under Java regex (Spark), RE2 (DuckDB oracle), and
  Python ``re`` (unit tests) with identical matches;
* the scan order is e-mail -> IPv4 -> phone, and the PHONE count runs on
  the e-mail/IP-redacted text: an IPv4 is 4-12 digits joined by dots —
  without lookaround (which RE2 lacks) the phone pattern cannot be told
  apart from it, so IPs are removed from the phone rule's view instead.
  E-mail and IP counts run on the raw text and are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# conservative on purpose: false negatives are recoverable (run a heavier
# tagger later), false positives silently destroy clean training text
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# an international-ish phone: leading + optional, 8-16 digits total,
# adjacent digits joined by at most one space / dot / dash / paren
PHONE_RE = r"\+?\d(?:[\s().-]?\d){7,15}"

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def _count(col: Column, pat: str) -> Column:
    return F.regexp_count(col, F.lit(pat)).cast("long")


def _email_ip_redacted(col: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN), IP_RE, IP_TOKEN)


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones) — detection counts per doc.

    ``n_emails`` / ``n_ips`` count on the raw text; ``n_phones`` counts on
    the e-mail/IP-redacted text (see module docstring), i.e. exactly the
    occurrences :func:`redact_pii` replaces with ``[PHONE]``.
    """
    t = F.col(text_col)
    return df.select(
        "doc_id",
        _count(t, EMAIL_RE).alias("n_emails"),
        _count(t, IP_RE).alias("n_ips"),
        _count(_email_ip_redacted(t), PHONE_RE).alias("n_phones"),
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_redacted) — fixed-token replacement.

    Three chained ``regexp_replace`` projections in the documented order
    (e-mail -> IPv4 -> phone); ``n_redacted`` is the total number of
    replacements actually made.
    """
    t = F.col(text_col)
    half = _email_ip_redacted(t)
    return df.select(
        "doc_id",
        F.regexp_replace(half, PHONE_RE, PHONE_TOKEN).alias("clean_text"),
        (_count(t, EMAIL_RE) + _count(t, IP_RE) + _count(half, PHONE_RE))
        .alias("n_redacted"),
    )
