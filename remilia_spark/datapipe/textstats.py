"""Text analysis over a documents table — pure column math, no Python UDFs.

Every operator here compiles to whole-stage-codegen JVM expressions and has
an exact ANSI-SQL twin for the DuckDB oracle.  Shared conventions:

* tokens        = regexp-split on whitespace of trimmed text ('' -> 0 tokens)
* word hash     = first 15 hex digits of md5, as a 60-bit BIGINT — the same
  value in Spark (``conv(substr(md5(w),1,15),16,10)``) and DuckDB
  (``('0x' || substr(md5(w),1,15))::BIGINT``)
* ratios rounded to 6 dp so both engines hash identically
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small pinned English stopword list (lowercase) for the ratio + lang-ID
# heuristics; must match the SQL literal list in __spark_entry__.
STOPWORDS = (
    "the", "of", "and", "to", "a", "in", "is", "it", "that", "was", "for",
    "on", "are", "with", "as", "at", "be", "this", "have", "from",
)


def tokens_col(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(text), r"\s+"))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return df.select(
        "doc_id",
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )


# BPE-ish pre-tokenization: alphanumeric runs + each punctuation mark as
# its own token — the word-level split every BPE/byte-level tokenizer
# applies before merges, so this count tracks (and upper-bounds the shape
# of) real tokenizer counts without shipping a vocab.  Plain character
# classes only: Java regex (Spark) and RE2-ish engines (DuckDB) agree on
# this pattern exactly, which the DuckDB oracle relies on.
SUBTOKEN_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"


def subtoken_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_subtokens) — BPE-ish regex pre-tokenization count.

    ``regexp_extract_all`` is JVM-side column math (whole-stage codegen);
    at 100 TB this is a pure map stage, no shuffle.
    """
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col(text_col),
                                    F.lit(SUBTOKEN_PATTERN), F.lit(0)))
        .cast("long").alias("n_subtokens"),
    )


def _quality_signal_cols(text_col: str) -> dict[str, Column]:
    """Raw (unrounded) length/punct/stopword signal columns — shared by
    quality_score and gopher_quality_filter so both see identical math."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_tok = F.size(toks)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stops, F.lower(w))))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_chars = F.length(t)
    return {
        "n_tokens": n_tok,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars)
                        .otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tok > 0, n_stop / n_tok)
                           .otherwise(F.lit(0.0)),
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword heuristics + a composite score.

    score = 0.4*min(1, n_tokens/100) + 0.3*stopword_ratio
          + 0.3*(1 - min(1, 4*punct_ratio)), rounded to 6 dp.
    """
    s = _quality_signal_cols(text_col)
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), s["n_tokens"] / F.lit(100.0))
        + F.lit(0.3) * s["stopword_ratio"]
        + F.lit(0.3) * (F.lit(1.0)
                        - F.least(F.lit(1.0), F.lit(4.0) * s["punct_ratio"]))
    )
    return df.select(
        "doc_id",
        s["n_tokens"].cast("long").alias("n_tokens"),
        F.round(s["punct_ratio"], 6).alias("punct_ratio"),
        F.round(s["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


_LANG_MODELS: dict = {}  # per-executor model cache, keyed by path


def _load_lang_model(model_path: str):
    """text -> lang callable from a model file, cached per executor.

    Two formats through one seam:
    * a fastText ``.bin`` (when the ``fasttext`` package is importable on
      the executors) — the production path;
    * a TSV of ``word<TAB>lang`` lines — the deterministic toy twin this
      sandbox tests with: predict = majority vote of the words' langs
      (lexicographically-smallest lang breaks ties), 'unknown' on zero
      hits.
    """
    got = _LANG_MODELS.get(model_path)
    if got is not None:
        return got
    fn = None
    if model_path.endswith(".bin"):
        try:
            import fasttext  # noqa: PLC0415 (optional dependency)
            m = fasttext.load_model(model_path)

            def fn(text: str) -> str:
                labels, _ = m.predict(text.replace("\n", " "))
                return labels[0].removeprefix("__label__") \
                    if labels else "unknown"
        except ImportError:
            fn = None
    if fn is None:
        vocab: dict[str, str] = {}
        with open(model_path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) == 2:
                    vocab[parts[0].lower()] = parts[1]

        def fn(text: str) -> str:  # noqa: F811 (the fallback twin)
            votes: dict[str, int] = {}
            for w in text.lower().split():
                lang = vocab.get(w)
                if lang is not None:
                    votes[lang] = votes.get(lang, 0) + 1
            if not votes:
                return "unknown"
            best = max(votes.values())
            return min(k for k, v in votes.items() if v == best)
    _LANG_MODELS[model_path] = fn
    return fn


def lang_id(df: DataFrame, text_col: str = "text",
            model_path: str | None = None) -> DataFrame:
    """Stopword-hit language ID: >= 3 distinct English stopwords -> 'en'.

    (A deliberately SQL-expressible n-gram-free heuristic so the oracle can
    replicate it exactly; the fastText production path plugs in via
    ``model_path`` — the operator shape, a pure projection, stays
    identical.)

    ``model_path``: when given, ``pred_lang`` comes from the model file
    through an Arrow-batched pandas UDF (model loaded once per executor,
    see :func:`_load_lang_model`); ``stopword_hits`` and the output schema
    are unchanged, and the pinned column math stays the oracle default.
    """
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(toks, lambda w: F.array_contains(stops, F.lower(w))))
    if model_path is not None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _pred(texts: pd.Series) -> pd.Series:
            model = _load_lang_model(model_path)
            return texts.fillna("").map(model)

        pred = _pred(F.col(text_col))
    else:
        is_en = (n_tok > 0) & (hits * 10 >= n_tok)  # >=10% stopword tokens
        pred = F.when(is_en, F.lit("en")).otherwise(F.lit("unknown"))
    return df.select(
        "doc_id",
        hits.cast("int").alias("stopword_hits"),
        pred.alias("pred_lang"),
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """Overlapping word n-grams (space-joined) of a token array; [] when
    the doc has fewer than n tokens."""
    sz = F.size(toks)
    return F.when(sz >= n, F.transform(
        F.sequence(F.lit(0), sz - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )).otherwise(F.array().cast("array<string>"))


def gopher_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals from the Gopher rules (Rae et al.
    2021, "Scaling Language Models: ... Gopher", table A1):

    * dup_line_frac   — fraction of '\\n'-split lines that repeat an
      earlier line: (n_lines - n_distinct) / n_lines
    * top2_char_frac  — fraction of (space-normalized) characters covered
      by the most frequent word 2-gram: max_g count(g)*len(g) / chars.
      Overlapping occurrences can push this past 1.0 on degenerate docs
      ("line line line"); kept uncapped to match the paper's count*len
      accounting — downstream filters threshold at ~0.2 anyway
    * top3_char_frac  — same for 3-grams
    * dup5_char_frac  — fraction of characters covered by 5-grams that
      occur more than once: sum_{count(g)>1} count(g)*len(g) / chars,
      capped at 1 (overlapping grams can over-count)

    All four are per-row higher-order-function expressions — whole-stage
    codegen, zero shuffle, a pure map at 100 TB.  Character totals use the
    single-space re-join of the token array so whitespace runs don't skew
    the denominators.
    """
    s = _gopher_signal_cols(text_col)
    return df.select(
        "doc_id",
        F.round(s["dup_line_frac"], 6).alias("dup_line_frac"),
        F.round(s["top2_char_frac"], 6).alias("top2_char_frac"),
        F.round(s["top3_char_frac"], 6).alias("top3_char_frac"),
        F.round(s["dup5_char_frac"], 6).alias("dup5_char_frac"),
    )


def _gopher_signal_cols(text_col: str) -> dict[str, Column]:
    """Raw (unrounded) Gopher repetition signal columns — shared by
    gopher_repetition and gopher_quality_filter."""
    t = F.col(text_col)
    toks = tokens_col(F.lower(t))
    chars = F.length(F.concat_ws(" ", toks))

    def top_frac(n: int) -> Column:
        g = _word_ngrams(toks, n)
        covered = F.transform(
            F.array_distinct(g),
            lambda x: F.size(F.filter(g, lambda y: y == x)) * F.length(x))
        return F.when((F.size(g) > 0) & (chars > 0),
                      F.array_max(covered) / chars).otherwise(F.lit(0.0))

    g5 = _word_ngrams(toks, 5)
    dup5_covered = F.aggregate(
        F.transform(
            F.array_distinct(g5),
            lambda x: F.when(
                F.size(F.filter(g5, lambda y: y == x)) > 1,
                F.size(F.filter(g5, lambda y: y == x)) * F.length(x)
            ).otherwise(F.lit(0))),
        F.lit(0), lambda acc, x: acc + x)
    dup5 = F.when(chars > 0, F.least(
        F.lit(1.0), dup5_covered / chars)).otherwise(F.lit(0.0))

    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    dup_lines = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines
    ).otherwise(F.lit(0.0))
    return {
        "dup_line_frac": dup_lines,
        "top2_char_frac": top_frac(2),
        "top3_char_frac": top_frac(3),
        "dup5_char_frac": dup5,
    }


# (rule name, signal key, comparison, default threshold) — fixed order; the
# reasons string lists failed rules in this order.  Thresholds are the
# Gopher table-A1 ballpark where a signal maps 1:1, else pipeline-common.
GOPHER_FILTER_RULES = (
    ("too_short", "n_tokens", "lt", 20),
    ("too_long", "n_tokens", "gt", 100_000),
    ("stopword_sparse", "stopword_ratio", "lt", 0.03),
    ("punct_heavy", "punct_ratio", "gt", 0.20),
    ("dup_lines", "dup_line_frac", "gt", 0.30),
    ("top2_repetitive", "top2_char_frac", "gt", 0.20),
    ("top3_repetitive", "top3_char_frac", "gt", 0.18),
    ("dup5_repetitive", "dup5_char_frac", "gt", 0.15),
)


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          overrides: dict[str, float] | None = None
                          ) -> DataFrame:
    """(doc_id, keep, reasons) — the keep/drop decision layer over the
    quality + Gopher repetition signals: ``keep`` is true iff no rule in
    GOPHER_FILTER_RULES fires; ``reasons`` is the comma-joined failed-rule
    names in fixed rule order ('' when kept).

    Single-pass by construction: both signal families are column
    expressions over the same row, so the whole filter is ONE projection —
    one scan, zero shuffle, whole-stage codegen — rather than a join of
    the two signal operators.  Thresholds compare RAW ratios (integer
    ratios are IEEE-identical across engines); ``overrides`` replaces any
    rule's threshold by name.
    """
    ov = overrides or {}
    sig = {**_quality_signal_cols(text_col), **_gopher_signal_cols(text_col)}
    fails = []
    for name, key, op, thr in GOPHER_FILTER_RULES:
        thr = ov.get(name, thr)
        cond = sig[key] < F.lit(thr) if op == "lt" else sig[key] > F.lit(thr)
        fails.append(F.when(cond, F.lit(name)))
    reasons = F.concat_ws(",", *fails)  # concat_ws skips the NULL (passed) slots
    return df.select(
        "doc_id",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def word_hash(col: Column) -> Column:
    """60-bit md5-derived hash — DuckDB-replicable (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — 60-bit fingerprint of lowercase-trimmed text."""
    return df.select(
        "doc_id",
        word_hash(F.lower(F.trim(F.col(text_col)))).alias("fp"),
    )
