"""Registered-domain (eTLD+1) keys and the subdomain-spray trap signal.

Reference parity: the reference has no domain machinery at all (its
`limit.go:5-15` AllowedDomain matches whole hostnames); eTLD+1 scoping is
a north-rule addition for frontier-scale politeness and trap defense.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from remilia_spark.traps import subdomain_spray
from remilia_spark.urlnorm import registered_domain, registered_domain_col

CASES = {
    "www.example.co.uk": "example.co.uk",
    "example.co.uk": "example.co.uk",
    "co.uk": "co.uk",                      # bare suffix: its own key
    "a.b.c.example.com": "example.com",
    "example.com": "example.com",
    "localhost": "localhost",
    "192.168.0.1": "192.168.0.1",
    "[2001:db8::1]": "[2001:db8::1]",
    "sub.blog.example.com.au": "example.com.au",
    "x.gov.cn": "x.gov.cn",                # gov.cn is the suffix
    "single": "single",
    "": "",
}


def test_registered_domain_pinned_cases():
    for host, want in CASES.items():
        assert registered_domain(host) == want, host
    assert registered_domain(None) == ""


def test_registered_domain_col_parity(spark):
    rows = [(h,) for h in CASES] + [(None,)]
    df = spark.createDataFrame(rows, "host string")
    got = {r["host"]: r["rd"] for r in df.select(
        "host", registered_domain_col(F.col("host")).alias("rd")).collect()}
    for host in CASES:
        assert got[host] == registered_domain(host), host
    assert got[None] == ""


def test_subdomain_spray_flags_wildcard_farm(spark):
    urls = []
    # spray.test: 30 hosts x 2 urls — flagged at min_hosts=20
    for i in range(30):
        urls += [f"https://a{i}.spray.test/p/{j}" for j in range(2)]
    # wide.test: 25 hosts x 40 urls — real mass, screened out by the
    # urls-per-host floor when enabled
    for i in range(25):
        urls += [f"https://w{i}.wide.test/p/{j}" for j in range(40)]
    # small.test: 3 hosts — under min_hosts
    urls += [f"https://s{i}.small.test/" for i in range(3)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")

    got = {r["domain"]: r for r in subdomain_spray(
        df, min_hosts=20).collect()}
    assert got["spray.test"]["n_hosts"] == 30
    assert got["spray.test"]["n_urls"] == 60
    assert got["spray.test"]["is_spray"]
    assert got["wide.test"]["is_spray"]          # no floor: flagged too
    assert not got["small.test"]["is_spray"]

    floored = {r["domain"]: r["is_spray"] for r in subdomain_spray(
        df, min_hosts=20, min_urls_per_host=10.0).collect()}
    assert not floored["spray.test"]             # 2 urls/host < 10
    assert floored["wide.test"]                  # 40 urls/host >= 10


def test_subdomain_spray_groups_by_etld1(spark):
    urls = ["https://a.x.co.uk/1", "https://b.x.co.uk/2",
            "https://c.y.co.uk/3"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["domain"]: (r["n_hosts"], r["n_urls"])
           for r in subdomain_spray(df, min_hosts=2).collect()}
    assert got == {"x.co.uk": (2, 2), "y.co.uk": (1, 1)}


# -- property: the column expression and the Python twin agree on ANY host
# built from DNS-ish labels (including bare suffixes, deep subdomain
# chains, numeric labels that are not valid IPs, and hyphens).

from hypothesis import given, settings
from hypothesis import strategies as st

_label = st.text(alphabet="abc0-9", min_size=1, max_size=6).filter(
    lambda s: not s.startswith("-") and not s.endswith("-"))
_hosts = st.lists(
    st.one_of(_label, st.sampled_from(["co", "uk", "com", "au", "gov",
                                       "cn", "192", "0"])),
    min_size=1, max_size=5).map(".".join)


@settings(max_examples=30, deadline=None)
@given(hosts=st.lists(_hosts, min_size=1, max_size=40))
def test_registered_domain_property_python_self_consistent(hosts):
    for h in hosts:
        rd = registered_domain(h)
        # idempotent: a registered domain is its own registered domain
        assert registered_domain(rd) == rd, h
        # suffix of the host (or the host itself for literal branches)
        assert h.endswith(rd), h


def test_registered_domain_spark_parity_generated(spark):
    """One Spark job over a deterministic sample of generated hosts —
    the column twin agrees with the Python twin input-for-input."""
    import itertools
    labels = ["a", "b9", "x-y", "co", "uk", "com", "au", "192", "0"]
    hosts = [".".join(c) for r in (1, 2, 3)
             for c in itertools.islice(itertools.product(labels, repeat=r),
                                       200)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["rd"] for r in df.select(
        "host", registered_domain_col(F.col("host")).alias("rd")).collect()}
    for h in hosts:
        assert got[h] == registered_domain(h), h
