"""Deduplication operators over a documents table.

All the *candidate generation* here is pure Spark built-ins — MinHash is an
explode + min-groupBy (JVM, codegen), not a Python loop — so the operators
scale exactly like any other shuffle and stay DuckDB-oracle-checkable.

Scale notes (100 TB):
* exact dedup shuffles (hash, doc) pairs — hash first, shuffle the 16-byte
  digest, never the document text;
* MinHash explodes docs × shingles × permutations; with k-word shingles and
  P permutations the blow-up is bounded by P × n_tokens and is map-side
  combinable (partial min per permutation before the shuffle);
* band buckets are skew-prone (boilerplate shingles) — the pair join filters
  ``a < b`` and dedupes pairs before the (expensive) verify stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_col, word_hash


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_hash, group_size, is_canonical) — md5 exact dedup.

    Canonical row = smallest doc_id in its hash group (deterministic).
    """
    h = F.md5(F.col(text_col)).alias("text_hash")
    w = Window.partitionBy("text_hash")
    return (
        df.select("doc_id", h)
        .withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn(
            "is_canonical",
            F.col("doc_id") == F.min("doc_id").over(w))
    )


def _shingle_array(text_col: str, k: int):
    """Distinct k-word shingles of lowercased text as an ARRAY column.
    '' -> []; 0 < n_tokens < k -> the single whole-text shingle."""
    toks = F.transform(tokens_col(F.lower(F.col(text_col))),
                       lambda w: w)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))),
    ).otherwise(F.when(n > 0, F.array(F.concat_ws(" ", toks)))
                 .otherwise(F.array().cast("array<string>")))


def _explode_once(df: DataFrame, arr, out_cols, pos: bool = False):
    """explode/posexplode an EXPENSIVE array expression exactly once.

    A plain ``explode(arr)`` triggers ``InferFiltersFromGenerate``: the
    optimizer adds ``size(arr) > 0 AND isnotnull(arr)`` under the Generate
    and predicate pushdown substitutes the full array expression into the
    filter — every row then builds the array TWICE (measured ~2x the map
    stage on the shingle/window-hash paths).  The *_outer generators are
    exempt from that rule; for arrays whose elements are never null (all
    of ours — concat_ws/hash outputs), ``explode_outer`` + a null filter
    on the output column is row-for-row identical to ``explode``: empty
    and null arrays emit one all-null row which the filter drops.
    """
    gen = F.posexplode_outer(arr) if pos else F.explode_outer(arr)
    return (df.select("doc_id", gen.alias(*out_cols))
              .where(F.col(out_cols[-1]).isNotNull()))


def shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles of lowercased text."""
    return _explode_once(df, _shingle_array(text_col, k), ["shingle"])


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       k: int = 3, num_perm: int = 16) -> DataFrame:
    """(doc_id, perm, minhash) — min over shingles of h_p(shingle).

    h_p(s) = word_hash(s || '|' || p): one md5 family member per
    permutation — entirely built-in expressions, map-side combinable.
    """
    sh = shingles(df, text_col, k)
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm")
    return (
        sh.select("doc_id", "shingle", perms)
        .select(
            "doc_id", "perm",
            word_hash(F.concat_ws("|", "shingle", "perm")).alias("h"))
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text", k: int = 3,
                        num_perm: int = 16, bands: int = 4) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs from banded MinHash.

    rows-per-band r = num_perm / bands; band key = md5 of the concatenated
    minhashes of that band; pairs = docs sharing any band key (a < b).
    """
    r = num_perm // bands
    sig = minhash_signatures(df, text_col, k, num_perm) \
        .withColumn("band", (F.col("perm") / F.lit(r)).cast("int"))
    band_keys = (
        sig.groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.array_sort(
            F.collect_list(F.concat_ws(":", "perm", "minhash"))))).alias("bkey"))
    )
    a = band_keys.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    b = band_keys.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )


def jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  k: int = 3, threshold: float = 0.5) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard.

    The threshold applies to the RAW ratio; only the output column is
    rounded (6dp) — thresholding a pre-rounded value would keep pairs whose
    true jaccard sits within 5e-7 below the cut, diverging from any SQL
    twin that filters ``i/u >= t``.

    The shingle sets attach as per-row array projections (the shingle
    array is already distinct) instead of the historical explode +
    groupBy(doc_id).collect_set, which shuffled every shingle to compute
    the same sets — intersect/union sizes are order-blind, so the results
    are row-identical (measured ~1.7x on the bench pipeline).  The
    non-empty gate runs on the raw text — a cheap base-column predicate
    (shingles are empty iff trimmed text is ''/null); filtering on the
    array column would re-evaluate the whole shingle expression inside
    the pushed-down predicate.
    """
    sets = df.where(F.length(F.trim(F.col(text_col))) > 0) \
             .select("doc_id", _shingle_array(text_col, k).alias("sh"))
    raw = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (
        pairs
        .join(sets.select(F.col("doc_id").alias("doc_a"),
                          F.col("sh").alias("sh_a")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"),
                          F.col("sh").alias("sh_b")), "doc_b")
        .where(raw >= threshold)
        .select("doc_a", "doc_b", F.round(raw, 6).alias("jaccard"))
    )


def minhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            k: int = 3, num_perm: int = 16, bands: int = 4,
                            threshold: float = 0.5) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: (doc_a, doc_b, jaccard)."""
    pairs = lsh_candidate_pairs(df, text_col, k, num_perm, bands)
    return jaccard_pairs(df, pairs, text_col, k, threshold)


def remove_duplicate_blocks(df: DataFrame, text_col: str = "text",
                            block_tokens: int = 8) -> DataFrame:
    """(doc_id, n_blocks, n_kept, text_kept) — corpus-wide duplicate-passage
    removal at disjoint token-block granularity.

    The batch re-expression of exact-substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2021): instead
    of a suffix array over the concatenated corpus, each document is cut
    into disjoint ``block_tokens``-word blocks; a block whose text appears
    anywhere earlier in the corpus — global order = (doc_id, block_idx) —
    is dropped, and the survivors re-join in order.  Suffix-array
    sharpness (arbitrary-offset matches) is traded for a plan that is a
    pure shuffle on a 60-bit block hash.

    Scale (100 TB): only (block_hash, doc_id, block_idx, block) rows
    shuffle — never whole documents; block hashes are near-uniform so the
    first-occurrence window has no hot keys; reassembly is one groupBy on
    doc_id.  Token-less docs pass through with n_blocks = 0.
    """
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    n_blocks = F.ceil(n / F.lit(float(block_tokens))).cast("int")
    blocks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda j: F.concat_ws(
            " ", F.slice(toks, j * block_tokens + 1, block_tokens)),
    )).otherwise(F.array().cast("array<string>"))
    rows = _explode_once(df, blocks, ["block_idx", "block"], pos=True)
    w = Window.partitionBy(word_hash(F.col("block"))) \
              .orderBy("doc_id", "block_idx")
    flagged = rows.withColumn("rn", F.row_number().over(w))
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
         .cast("long").alias("n_kept"),
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("rn") == 1,
                       F.struct(F.col("block_idx"), F.col("block"))))),
            lambda s: s.getField("block"))).alias("text_kept"),
    )
    return df.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text_kept", F.lit("")).alias("text_kept"),
    )


def remove_duplicate_blocks_sliding(df: DataFrame, text_col: str = "text",
                                    block_tokens: int = 8,
                                    window_tokens: int | None = None
                                    ) -> DataFrame:
    """(doc_id, n_blocks, n_kept, text_kept) — duplicate-passage removal
    with sliding-window detection at block-removal granularity.

    Closes :func:`remove_duplicate_blocks`'s unaligned-duplicate gap: the
    disjoint-block impl only matches passages that land on the same
    ``block_tokens`` grid in both copies, so a passage duplicated at a
    non-block token offset is silently missed.  Here EVERY ``k``-token
    window (stride 1, k = ``window_tokens``, default ``block_tokens``) is
    hashed, so a duplicated run of ≥ k tokens is caught at ANY offset —
    the batch analogue of the suffix-array ExactSubstr of Lee et al. 2021
    at window sharpness.  A window *recurs* when an identical window
    appears earlier in global (doc_id, start_pos) order; every disjoint
    block a recurring window overlaps is dropped, and the corpus-first
    occurrence keeps all its blocks.

    Scale (100 TB): the shuffle carries one row per token position —
    (60-bit window hash, doc_id, pos); window TEXT is hashed *before* the
    exchange and never shuffles.  The ×n_tokens row amplification is the
    same order as the MinHash shingle explode already in this package,
    and window hashes are near-uniform so the first-occurrence window
    rank has no hot keys.  Dropped-block ids shuffle once more as
    (doc_id, block_idx) longs; reassembly stays one groupBy on doc_id.
    """
    k = int(window_tokens or block_tokens)
    B = int(block_tokens)
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    n_blocks = F.ceil(n / F.lit(float(B))).cast("int")
    blocks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda j: F.concat_ws(
            " ", F.slice(toks, j * B + 1, B)),
    )).otherwise(F.array().cast("array<string>"))
    rows = _explode_once(df, blocks, ["block_idx", "block"], pos=True)
    # stride-1 windows, hashed in-array (the text never leaves the map side)
    win_hashes = F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: word_hash(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )).otherwise(F.array().cast("array<long>"))
    wins = _explode_once(df, win_hashes, ["pos", "whash"], pos=True)
    w = Window.partitionBy("whash").orderBy("doc_id", "pos")
    rec = wins.withColumn("rn", F.row_number().over(w)) \
              .where(F.col("rn") > 1)
    # pos <= n-k so the window's last token (pos+k-1) is in-doc — the
    # covering block range needs no clamp
    dup_blocks = rec.select(
        "doc_id",
        F.explode(F.sequence(
            F.floor(F.col("pos") / B).cast("int"),
            F.floor((F.col("pos") + k - 1) / B).cast("int"),
        )).alias("block_idx")
    ).distinct().withColumn("_dup", F.lit(True))
    marked = rows.join(dup_blocks, ["doc_id", "block_idx"], "left")
    keep = F.col("_dup").isNull()
    agg = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(keep.cast("int")).cast("long").alias("n_kept"),
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(
                F.when(keep,
                       F.struct(F.col("block_idx"), F.col("block"))))),
            lambda s: s.getField("block"))).alias("text_kept"),
    )
    return df.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text_kept", F.lit("")).alias("text_kept"),
    )


def remove_boilerplate_lines(df: DataFrame, text_col: str = "text",
                             min_doc_freq: int = 2) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_kept) — corpus-wide boilerplate-line
    removal.

    The line-level dedup step of CCNet / RefinedWeb-style pipelines:
    navigation chrome, cookie banners and copyright footers are lines
    whose *normalized* form (lowercase, trimmed) recurs across many
    documents, while real prose lines are (nearly) unique.  A line is
    dropped from EVERY document when it appears in at least
    ``min_doc_freq`` distinct documents; survivors re-join in original
    line order.  Blank lines normalize to '' and are always dropped as a
    side effect — the reassembled text carries no formatting-only rows.

    Scale (100 TB): lines shuffle twice, both times as small keys —
    (line_hash, doc_id) pairs for the distinct + doc-frequency count
    (map-side combinable after the distinct), then the per-line verdict
    joins back on the 60-bit hash (near-uniform, no hot keys: the whole
    point of the operator is that high-frequency lines exist, but even a
    footer on every page of a 10^10-doc corpus is one hash bucket of
    longs, not of texts).  Reassembly is one groupBy on doc_id, same as
    :func:`remove_duplicate_blocks`.
    """
    lines = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    lh = word_hash(F.lower(F.trim(F.col("line"))))
    keyed = lines.select("doc_id", "pos", "line", lh.alias("line_hash"))
    freq = (keyed.select("line_hash", "doc_id").distinct()
            .groupBy("line_hash")
            .agg(F.count(F.lit(1)).cast("long").alias("line_df")))
    kept = (keyed.join(freq, "line_hash")
            .where((F.col("line_df") < min_doc_freq)
                   & (F.trim(F.col("line")) != "")))
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "line"))),
            lambda s: s.getField("line"))).alias("clean_text"),
    )
    n_lines = df.select(
        "doc_id",
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"))
    return n_lines.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def _distinct_ngrams(text_col: str, n: int):
    """Distinct lowercased n-word grams of a text column; [] below n tokens."""
    toks = tokens_col(F.lower(F.col(text_col)))
    sz = F.size(toks)
    return F.when(sz >= n, F.array_distinct(F.transform(
        F.sequence(F.lit(0), sz - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    ))).otherwise(F.array().cast("array<string>"))


def benchmark_contamination(train: DataFrame, bench: DataFrame,
                            text_col: str = "text", n: int = 8,
                            broadcast_bench: bool = True) -> DataFrame:
    """(doc_id, n_grams, n_hits, contaminated) — test-set decontamination:
    a training document is contaminated when any of its distinct lowercased
    ``n``-word grams appears anywhere in the benchmark corpus (the n-gram
    overlap rule used to de-duplicate eval sets out of web-scale training
    data; 13-grams in the GPT-3 appendix-C formulation, ``n`` configurable
    because real pipelines tune it per benchmark).

    Scale (100 TB): the benchmark side is tiny by definition (eval sets,
    not web dumps) — its distinct gram set reduces to 60-bit hashes and
    broadcasts (``broadcast_bench``; flip off to shuffle-join if a huge
    blocklist is used instead).  The training side never shuffles text:
    grams hash per-row, the left join against the broadcast set is a map,
    and the per-doc rollup is a partial-aggregatable count.  Gram-less
    docs (< n tokens) pass through clean.
    """
    bg = (bench
          .select(F.explode(_distinct_ngrams(text_col, n)).alias("gram"))
          .select(word_hash(F.col("gram")).alias("gh"))
          .distinct()
          .withColumn("hit", F.lit(1)))
    if broadcast_bench:
        bg = F.broadcast(bg)
    tg = train.select(
        "doc_id",
        F.explode_outer(_distinct_ngrams(text_col, n)).alias("gram"),
    ).select("doc_id", word_hash(F.col("gram")).alias("gh"))
    agg = tg.join(bg, "gh", "left").groupBy("doc_id").agg(
        F.count("gh").cast("long").alias("n_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
    )
    return agg.select(
        "doc_id", "n_grams", "n_hits",
        (F.col("n_hits") > 0).alias("contaminated"),
    )


def hamming_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                            hash_col: str = "simhash", bits: int = 48,
                            n_bands: int = 6,
                            max_hamming: int = 5) -> DataFrame:
    """(id_a, id_b, hamming) pairs whose ``hash_col`` fingerprints differ
    in at most ``max_hamming`` bits — the pair-join stage for SimHash
    (text) and dHash (``multimodal.perceptual_hash``, images).

    Banded LSH, never all-pairs: the ``bits``-wide hash splits into
    ``n_bands`` contiguous bands; two hashes within ``max_hamming`` must
    agree on at least one whole band whenever ``max_hamming < n_bands``
    (pigeonhole), so under that precondition the output EQUALS the
    brute-force all-pairs filter — which is what the DuckDB oracles run.
    Only (id, hash) rows shuffle (~16 bytes); with B bands a fingerprint
    explodes into B rows and pairs form per (band, band-value) bucket.
    A bucket of b identical hashes emits b*(b-1)/2 pairs — inherent to
    pair output, not the join (feed ``graph.connected_components`` to turn
    pairs into clusters); exact-dup mega-clusters should be collapsed by
    exact dedup first.  Hashes must be non-negative (the 60/48-bit ops
    here guarantee it), so band extraction is plain integer division.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands > max_hamming "
            f"(got {n_bands}) for the band join to be exhaustive")
    width = -(-bits // n_bands)       # ceil: last band may be narrower
    src = df.select(F.col(id_col).alias("_id"),
                    F.col(hash_col).cast("long").alias("_h"))
    b = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("b")
    # non-literal shift: h DIV 2^(width*b) (exact — width*b < 63, h >= 0)
    bval = F.expr(f"(_h DIV CAST(POW(2.0D, {width} * b) AS BIGINT)) "
                  f"% CAST(POW(2.0D, {width}) AS BIGINT)")
    banded = src.select("_id", "_h", b).withColumn("bv", bval)
    a = banded.select(F.col("_id").alias("id_a"),
                      F.col("_h").alias("h_a"), "b", "bv")
    c = banded.select(F.col("_id").alias("id_b"),
                      F.col("_h").alias("h_b"), "b", "bv")
    return (
        a.join(c, ["b", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b").distinct()
        .withColumn("hamming", F.bit_count(F.expr("h_a ^ h_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash(df: DataFrame, text_col: str = "text",
            bits: int = 48) -> DataFrame:
    """(doc_id, simhash) — term-frequency-weighted SimHash, ``bits`` wide.

    Per bit b: sign of Σ_w cnt(w)·(bit_b(word_hash(w)) ? +1 : -1); the
    fingerprint packs the positive bits as Σ 2^b (exact: powers of two are
    exact doubles below 2^53... we stay in integer math via shiftleft on a
    literal-free path: CAST(POW(2,b) AS BIGINT), exact for b < 63).
    """
    toks = _explode_once(df, tokens_col(F.lower(F.col(text_col))), ["w"])
    counts = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    hashed = counts.withColumn("h", word_hash(F.col("w")))
    b = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    per_bit = (
        hashed.select("doc_id", "h", "cnt", b)
        .select(
            "doc_id", "b",
            # shiftright needs a literal shift in Spark; h DIV 2^b is exact
            # (POW(2,b) is an exact double for b < 63)
            F.when(F.expr("(h DIV CAST(POW(2.0D, b) AS BIGINT)) % 2") == 1,
                   F.col("cnt")).otherwise(-F.col("cnt")).alias("v"))
        .groupBy("doc_id", "b")
        .agg(F.sum("v").alias("s"))
    )
    fp = per_bit.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0,
                     F.pow(F.lit(2.0), F.col("b")).cast("long"))
              .otherwise(F.lit(0))).cast("long").alias("simhash"))
    # token-less docs have no exploded rows; pin their fingerprint to 0
    return df.select("doc_id").join(fp, "doc_id", "left") \
             .select("doc_id", F.coalesce("simhash", F.lit(0)).alias("simhash"))
