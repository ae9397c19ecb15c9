"""CCNet-style language-model quality scoring and bucketing.

CCNet (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") scores every crawled document with an
in-domain n-gram LM (KenLM trained on Wikipedia) and splits the corpus
into head/middle/tail perplexity buckets; LLaMA-class pipelines keep
head+middle.  This module re-expresses that stage Spark-first:

* **train** — token/bigram counts over a *reference* (in-domain) slice of
  the corpus: two ``groupBy`` aggregations, map-side combinable, model
  tables stay distributed (never collected to the driver).
* **score** — every document's bigrams join the model tables (Catalyst
  picks broadcast vs shuffle-hash by model size; at a 10^9-bigram model
  this is a plain shuffle join on the gram key, documents never move
  twice), then a per-document **ordered fold** sums the conditional
  probabilities.
* **bucket** — an exact corpus-wide percentile split via the engine's
  range-partitioned ``ranking.global_rank`` (no one-task global sort;
  driver traffic is P partition counts).

Scoring kernel: add-one-smoothed conditional bigram likelihood,

    p(w2 | w1) = (C(w1 w2) + 1) / (C(w1) + V)
    score(doc) = mean over the doc's bigrams of p(w2 | w1)

i.e. the arithmetic mean conditional likelihood (higher = more in-domain)
rather than KenLM's geometric-mean perplexity: every quantity is a ratio
of integers and the mean is a position-ordered sequential fold, so Spark
and the DuckDB oracle produce **bit-identical doubles** (``exp``/``ln``
are not correctly-rounded across engines and are banned repo-wide — see
textstats).  A real KenLM drops into the same seam: replace
``lm_likelihood`` with a broadcast-model pandas UDF, keep ``train``'s
count tables as the arpa input and ``lm_quality_buckets`` unchanged.

Reference parity note: ShroXd/remilia has no LM stage (its layers stop at
fetch/parse, `pipeline.go`); this is part of the training-data pipeline
surface the graft adds on top.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remilia_spark.datapipe.textstats import tokens_col

# struct-typed bigram list over a token array column named by `t`
_BIGRAMS_TMPL = ("transform(sequence(0, size({t}) - 2), "
                 "i -> struct(i AS pos, {t}[i] AS w1, {t}[i + 1] AS w2))")


@dataclass(frozen=True)
class BigramLM:
    """Distributed bigram model: two count tables + the vocab size.

    ``uni``  (w: string, c1: long)       — token occurrence counts
    ``bi``   (w1: string, w2: string, c2: long) — bigram counts
    ``vocab_size`` — |V| over the reference slice (a driver scalar; one
    bounded ``count()`` over the already-aggregated unigram table).
    """

    uni: DataFrame
    bi: DataFrame
    vocab_size: int


def _doc_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        "doc_id", tokens_col(F.lower(F.col(text_col))).alias("t"))


def _doc_bigrams(toks: DataFrame) -> DataFrame:
    """(doc_id, pos, w1, w2) — rows only for docs with >= 2 tokens (the
    ``sequence(0, size-2)`` guard; callers restore empty docs by joining
    back to the full doc list)."""
    # explode_outer + null filter: the inferred size() filter under a
    # plain explode would rebuild the bigram-struct array per row (see
    # dedup._explode_once); struct elements are never null
    return (
        toks.where(F.size("t") >= 2)
        .select("doc_id", F.explode_outer(F.expr(_BIGRAMS_TMPL.format(t="t")))
                .alias("b"))
        .where(F.col("b").isNotNull())
        .select("doc_id", "b.pos", "b.w1", "b.w2")
    )


def train_bigram_lm(ref: DataFrame, text_col: str = "text") -> BigramLM:
    """Count tables over the reference (in-domain) slice.

    Both aggregations are map-side combinable groupBys on the exploded
    token stream; at 100 TB the model tables are themselves distributed
    DataFrames — nothing is collected.
    """
    toks = _doc_tokens(ref, text_col)
    uni = (toks.select(F.explode("t").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c1")))
    bi = (_doc_bigrams(toks)
          .groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    return BigramLM(uni=uni, bi=bi, vocab_size=uni.count())


def lm_likelihood(df: DataFrame, model: BigramLM,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, lm_score) for every input document.

    lm_score = mean add-one conditional bigram likelihood, summed as a
    position-ordered sequential fold (``array_sort`` on pos, then
    ``F.aggregate``) so the double is independent of shuffle order and
    bit-identical to the oracle's ``list_reduce`` fold.  Documents with
    fewer than 2 tokens score 0.0.  Rounded to 6 dp per repo convention.
    """
    v = int(model.vocab_size)
    bg = _doc_bigrams(_doc_tokens(df, text_col))
    scored = (
        bg.join(model.bi, ["w1", "w2"], "left")
        .join(model.uni.withColumnRenamed("w", "w1"), ["w1"], "left")
        .withColumn(
            "p",
            (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v)).cast("double"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "p"))).alias("ps"))
        .select(
            "doc_id",
            F.size("ps").cast("long").alias("n_bigrams"),
            F.round(
                F.aggregate("ps", F.lit(0.0), lambda acc, x: acc + x["p"])
                / F.size("ps"), 6).alias("lm_score"))
    )
    return (
        df.select("doc_id")
        .join(scored, ["doc_id"], "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("lm_score", F.lit(0.0)).alias("lm_score"))
    )


_LM_MODELS: dict = {}  # per-executor model cache, keyed by path


def _load_lm_model(model_path: str):
    """tokens -> (n_bigrams, mean per-bigram score) callable, cached per
    executor.  Two formats through one seam:

    * a KenLM binary/ARPA (when the ``kenlm`` package is importable on the
      executors) — the CCNet production path: score = full-sentence log10
      probability divided by the bigram count;
    * a TSV of ``w1 w2<TAB>prob`` lines — the deterministic toy twin this
      sandbox tests with (an optional ``<unk><TAB>p`` line sets the
      unknown-bigram probability, default 0.0): score = mean prob over
      the document's bigrams.
    """
    got = _LM_MODELS.get(model_path)
    if got is not None:
        return got
    fn = None
    if model_path.endswith((".bin", ".arpa", ".klm")):
        try:
            import kenlm  # noqa: PLC0415 (optional dependency)
            m = kenlm.Model(model_path)

            def fn(toks: list[str]) -> tuple[int, float]:
                nb = max(0, len(toks) - 1)
                if nb == 0:
                    return 0, 0.0
                return nb, m.score(" ".join(toks)) / nb
        except ImportError:
            fn = None
    if fn is None:
        table: dict[tuple[str, str], float] = {}
        unk = 0.0
        with open(model_path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) != 2:
                    continue
                key, p = parts[0], float(parts[1])
                if key == "<unk>":
                    unk = p
                else:
                    w1, _, w2 = key.partition(" ")
                    table[(w1, w2)] = p

        def fn(toks: list[str]) -> tuple[int, float]:  # noqa: F811
            nb = max(0, len(toks) - 1)
            if nb == 0:
                return 0, 0.0
            s = sum(table.get((a, b), unk)
                    for a, b in zip(toks, toks[1:]))
            return nb, s / nb
    _LM_MODELS[model_path] = fn
    return fn


def lm_likelihood_model(df: DataFrame, model_path: str,
                        text_col: str = "text") -> DataFrame:
    """Model-file twin of :func:`lm_likelihood` — identical output schema
    (doc_id, n_bigrams, lm_score), scoring through a model file on the
    executors' filesystem via one Arrow-batched pandas UDF (model loaded
    once per executor, :func:`_load_lm_model`; KenLM when importable,
    else the TSV toy format).  The pinned add-one bigram math stays the
    oracle default — this is the documented KenLM seam made executable.

    Scale: a pure projection — zero shuffle, one UDF pass; the model file
    ships via ``spark.sparkContext.addFile`` / the image, never through a
    broadcast of Python objects.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_bigrams long, lm_score double")
    def _score(texts: pd.Series) -> pd.DataFrame:
        model = _load_lm_model(model_path)
        pairs = [model(t.split()) for t in texts.fillna("")]
        return pd.DataFrame(pairs, columns=["n_bigrams", "lm_score"])

    out = df.select("doc_id", _score(F.col(text_col)).alias("r"))
    return out.select("doc_id", F.col("r.n_bigrams").alias("n_bigrams"),
                      F.round(F.col("r.lm_score"), 6).alias("lm_score"))


#: ascending-score bucket labels: the highest-likelihood (most in-domain)
#: third is CCNet's "head", the lowest is "tail"
BUCKET_LABELS = ("tail", "middle", "head")


def lm_quality_buckets(scored: DataFrame, n_buckets: int = 3,
                       labels: tuple[str, ...] = BUCKET_LABELS,
                       num_partitions: int = 32,
                       cleanup: list | None = None) -> DataFrame:
    """Exact corpus-percentile split of ``lm_likelihood`` output.

    bucket_idx = floor(rank * n_buckets / n) with rank = ascending global
    sort position over (lm_score, doc_id) — computed by the engine's
    range-partitioned ``global_rank`` (a repartitionByRange + per-partition
    window + P-row offset collect), NEVER a one-task global window.  CCNet
    itself cuts on sampled percentile thresholds; the exact rank keeps the
    output deterministic for the oracle and costs one extra bounded
    collect.  ``cleanup`` receives the persisted frame (see global_rank).
    """
    if len(labels) != n_buckets:
        raise ValueError("labels must match n_buckets")
    from remilia_spark.ranking import global_rank

    # one materialization of the scoring DAG for count + rank (the same
    # double-execution fix as dsir_select; cleanup convention of
    # global_rank)
    scored = scored.persist()
    if cleanup is not None:
        cleanup.append(scored)
    n = scored.count()
    if n == 0:  # empty corpus: keep the schema, no div-by-zero
        return (scored.withColumn("lm_rank", F.lit(0).cast("long"))
                .withColumn("bucket", F.lit(None).cast("string")))
    lab = F.array(*[F.lit(s) for s in labels])
    ranked = global_rank(scored, keys=["lm_score", "doc_id"],
                         out_col="lm_rank", num_partitions=num_partitions,
                         cleanup=cleanup)
    # integer division keeps the index exact on both engines (DuckDB's
    # CAST(double AS INT) rounds where Spark truncates — never compare
    # through that seam)
    return ranked.withColumn(
        "bucket",
        F.element_at(lab, (F.expr(f"(lm_rank * {int(n_buckets)}) div {n}")
                           .cast("int") + 1)))
