"""Round-5 ADVICE fixes, pinned.

1. robots '*'/'$' wildcard rules (RFC 9309 §2.2.3) in blocked_col — both
   the disallow-only arm and the longest-match Allow arm — with the
   Python oracle twin agreeing rule-for-rule.
2. gap_sessions on TIMESTAMP_NTZ input is timezone- and DST-independent
   (wall-clock epoch, matching DuckDB's epoch_us).
3. The budget fold decrements the bucket from its UNCLAMPED availability
   when the fetch quota binds (oracle rule: available - granted), so a
   raised-quota resume is not artificially starved.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F

from remilia_spark.config import CrawlConfig
from remilia_spark.engine import Engine
from remilia_spark.extract import extract_text
from remilia_spark.robots import blocked_col


WILD_CASES = {
    # rule /*.php : '*' spans any chars, no anchor -> substring-shaped
    ("/*.php", "/index.php"): True,
    ("/*.php", "/a/b/c.php?x=1"): True,       # matches prefix of path
    ("/*.php", "/index.phtml"): False,
    # rule /*.php$ : anchored at path end
    ("/*.php$", "/index.php"): True,
    ("/*.php$", "/index.php?x=1"): False,
    # rule /fish* : same as prefix /fish (per REP examples)
    ("/fish*", "/fishheads"): True,
    ("/fish*", "/catfish"): False,
    # rule /fish$ : exact path only
    ("/fish$", "/fish"): True,
    ("/fish$", "/fishheads"): False,
    # plain rule keeps the pinned prefix fast path
    ("/private/", "/private/a"): True,
    ("/private/", "/priv"): False,
    # regex metachars in rules are literal
    ("/a+b", "/a+b/c"): True,
    ("/a+b", "/aab/c"): False,
    ("/p$q", "/p$q/r"): True,  # '$' mid-rule is literal (end-anchor is
    # end-of-rule only), so the plain prefix fast path applies
}


def test_robots_wildcard_rules(spark):
    rows = [(f"h{i}.test", p, [r])
            for i, ((r, p), _) in enumerate(WILD_CASES.items())]
    df = spark.createDataFrame(
        rows, "host string, path string, disallow array<string>")
    got = df.select("host", blocked_col(
        F.col("path"), F.col("disallow")).alias("b")).collect()
    want = list(WILD_CASES.values())
    assert [r["b"] for r in sorted(
        got, key=lambda r: int(r["host"][1:-5]))] == want


def test_robots_wildcard_oracle_parity(spark):
    """Spark column math == the oracle's pure-Python rule_match on every
    wildcard case, through the Allow longest-match arm too."""
    from remilia_spark.oracle import crawl  # noqa: F401 (import check)
    import re

    def py_match(p, r):
        if "*" not in r and not r.endswith("$"):
            return p.startswith(r)
        ends = r.endswith("$")
        body = r[:-1] if ends else r
        pat = "^" + re.escape(body).replace(r"\*", ".*") + \
            ("$" if ends else "")
        return re.match(pat, p) is not None

    for (r, p), want in WILD_CASES.items():
        assert py_match(p, r) == want, (r, p)

    # Allow arm: wildcard allow outranks a shorter disallow
    df = spark.createDataFrame(
        [("/private/ok.php", ["/private/"], ["/private/*.php$"]),
         ("/private/ok.phpx", ["/private/"], ["/private/*.php$"])],
        "path string, disallow array<string>, allow array<string>")
    got = [r["b"] for r in df.select(blocked_col(
        F.col("path"), F.col("disallow"), F.col("allow"))
        .alias("b")).collect()]
    assert got == [False, True]


def test_sessions_ntz_dst_independent(spark):
    """Two NTZ events straddling the US 2024 spring-forward wall-clock
    gap: their NTZ difference is 100 min (> 30-min threshold -> split),
    while the America/Los_Angeles *elapsed* difference is 40 min (no
    split).  The split must follow the NTZ wall clock (DuckDB epoch_us
    semantics) regardless of the session timezone."""
    from remilia_spark.datapipe.sessions import gap_sessions

    rows = [("a", 1, dt.datetime(2024, 3, 10, 1, 30)),
            ("a", 2, dt.datetime(2024, 3, 10, 3, 10))]
    df = spark.createDataFrame(rows, "host string, id long, ts timestamp_ntz")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        got = gap_sessions(df, "host", "ts", "id", gap_seconds=1800).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert sorted(r["first_id"] for r in got) == [1, 2]  # split happened


def test_quota_clamp_preserves_bucket_avail(spark):
    """budget.quota_clamp: `avail` is clamped for grant filtering but
    `bucket_avail` carries the unclamped token availability for the fold."""
    from remilia_spark.budget import quota_clamp

    pend = spark.createDataFrame([("h", 10)], "host string, avail long")
    quota = spark.createDataFrame([("h", 7)],
                                  "host string, granted_total long")
    row = quota_clamp(pend, quota, cap=8).collect()[0]
    assert row["avail"] == 1          # min(10, 8 - 7)
    assert row["bucket_avail"] == 10  # pre-clamp


def test_budget_fold_unclamped_under_quota(spark, tmp_path):
    """End-to-end: with initial_tokens=10 and a quota of 1, the stored
    bucket after the first superstep must be 10 - 1 = 9 (unclamped fold),
    not 0 (the clamped-avail bug): a raised-quota resume then still has
    its full token entitlement."""
    html = b"<html><body><p>root</p></body></html>"
    pages = pd.DataFrame([{
        "url": "http://h0.test/", "warc_ts": dt.datetime(2024, 8, 7),
        "html": html, "text": extract_text(html), "lang": "en"}])
    seeds = pd.DataFrame({"url": ["http://h0.test/"], "seed_order": [0]})
    cfg = CrawlConfig(max_depth=1, max_attempt=2, max_supersteps=1,
                      bucket_capacity=10, fill_quantum=1, initial_tokens=10,
                      max_fetch_per_key=1)
    eng = Engine(spark, cfg)
    eng.run(spark.createDataFrame(pages), spark.createDataFrame(seeds),
            None, tmp_path / "b")
    from remilia_spark.storage import ParquetSnapshotStorage
    st = ParquetSnapshotStorage(spark, tmp_path / "b")
    s = st.last_committed()
    budgets = {r["host"]: r["tokens"]
               for r in st.read_snapshot("budgets", s).collect()}
    assert budgets["h0.test"] == 9


def test_lang_id_model_seam(spark, tmp_path):
    """textstats.lang_id(model_path=...): the fastText seam made
    executable — a toy TSV model swaps pred_lang to a broadcast-model
    pandas UDF with the same output schema; the pinned column math stays
    the default."""
    from remilia_spark.datapipe import textstats

    model = tmp_path / "langs.tsv"
    model.write_text("der\tde\ndie\tde\nthe\ten\nand\ten\nle\tfr\n")
    docs = spark.createDataFrame(
        [(1, "der hund die katze"), (2, "the cat and the dog"),
         (3, "zzz qqq"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"]
           for r in textstats.lang_id(docs,
                                      model_path=str(model)).collect()}
    assert got == {1: "de", 2: "en", 3: "unknown", 4: "unknown"}
    # schema identical to the pinned default
    assert (textstats.lang_id(docs, model_path=str(model)).columns
            == textstats.lang_id(docs).columns)


def test_lm_model_seam(spark, tmp_path):
    """lm.lm_likelihood_model: the KenLM seam made executable with the
    TSV toy format; same schema as the pinned lm_likelihood."""
    from remilia_spark.datapipe import lm

    model = tmp_path / "bigrams.tsv"
    model.write_text("a b\t0.5\nb c\t0.25\n<unk>\t0.1\n")
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x y"), (3, "solo"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score"])
           for r in lm.lm_likelihood_model(docs, str(model)).collect()}
    assert got[1] == (2, 0.375)   # (0.5 + 0.25) / 2
    assert got[2] == (1, 0.1)     # unknown bigram -> <unk>
    assert got[3] == (0, 0.0) and got[4] == (0, 0.0)
