"""Link-graph operators — host/page authority for crawl prioritization.

A production crawler ranks its frontier not just by (depth, discovery
order) but by link authority: pages/hosts that the already-crawled web
points at more should be fetched earlier.  The reference has no graph
stage (its ordering is channel arrival, ``pipeline.go:142-158``); this is
a north-rule-scale addition that plugs into the engine as an extra
priority key (join ``pagerank`` output onto the frontier by host before
``ranking.grant_wave``).

Fixed-point determinism
-----------------------
PageRank over floats is not reproducible across partitionings — float
addition is non-associative, so two cluster sizes can disagree in the
last ulp and break the engine's determinism invariant (and any
value-hash oracle).  We therefore run the entire iteration in **integer
fixed point** (BASE = 10^12):

    r0(v)      = BASE div N
    share(u)   = r(u) div outdeg(u)
    contrib(v) = SUM share(u) over in-edges     -- exact integer sum
    dang       = SUM r(u) over dangling u       -- exact integer sum
    r'(v)      = (15*BASE) div (100*N) + (85 * (contrib(v) + dang div N)) div 100

Every op is integer add / floor-div, so the result is bit-identical on
any partitioning, any engine — the DuckDB oracle unrolls the same
recurrence as CTEs.  Ranks sum to ~BASE, so no term exceeds ~10^14 and
64-bit never overflows at any graph size.

Scale notes (10^10-edge graphs)
-------------------------------
* Edges are shuffled onto ``src`` ONCE and persisted; each iteration's
  join re-uses that partitioning, so per-iteration cost is one shuffle
  of the (small) rank table plus one map-side aggregated groupBy(dst).
* ``localCheckpoint`` every iteration truncates the lineage — without it
  the plan doubles per iteration and the driver, not the cluster,
  becomes the bottleneck by iteration ~15.
* The dangling mass is a scalar: computed with a map-side-combined
  SUM (one number to the driver), never a crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = 10**12
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank(edges: DataFrame, iterations: int = 3,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-point PageRank; returns ``(node long, rank_fp long)``.

    ``rank_fp`` is the rank scaled by BASE=10^12 (divide for the float
    value).  Deterministic: equal edges → bit-identical output on any
    cluster size.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node long, rank_fp long")
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one shuffle onto src, reused by every iteration's join
    e = e.repartition("src").persist()
    edge_share = e.join(outdeg, "src")  # (src, dst, outdeg)

    r0 = BASE // n
    ranks = nodes.withColumn("rank_fp", F.lit(r0).cast("long"))
    teleport = (_DAMP_DEN - _DAMP_NUM) * BASE // (_DAMP_DEN * n)
    try:
        for _ in range(iterations):
            shares = edge_share.join(
                ranks.withColumnRenamed("node", "src"), "src"
            ).select(
                "dst", F.expr("rank_fp div outdeg").alias("share"))
            contrib = shares.groupBy("dst").agg(
                F.sum("share").alias("contrib"))
            dang_row = ranks.join(
                outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
            ).agg(F.coalesce(F.sum("rank_fp"), F.lit(0))).collect()[0][0]
            dang_per_node = int(dang_row) // n
            ranks = nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            ).select(
                "node",
                (F.lit(teleport)
                 + F.expr(f"{_DAMP_NUM} * (coalesce(contrib, 0)"
                          f" + {dang_per_node}) div {_DAMP_DEN}")
                 ).cast("long").alias("rank_fp"),
            ).localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return ranks


def connected_components(edges: DataFrame, a: str = "a", b: str = "b",
                         max_iterations: int = 50) -> DataFrame:
    """Connected components by min-label propagation; returns
    ``(node long, component long)`` where ``component`` is the smallest
    node id in the component — the canonical-representative convention
    dedup pipelines use (keep the min doc_id of each near-dup cluster).

    Deterministic: labels are integer mins, so the fixpoint is unique and
    partitioning-independent.  Convergence check is one tiny aggregate per
    iteration: ``SUM(component)`` strictly decreases while any label still
    moves, so equal sums == fixpoint (no row-wise diff join needed).  The
    sum runs in ``decimal(38,0)``: labels are often 63-bit hashes, and at
    10^10 nodes a BIGINT sum overflows — under Spark 4's default ANSI
    mode that is a hard job failure, not a wraparound (10^10 * 2^63 ~
    10^29 fits decimal(38,0) with nine orders to spare).

    Scale: the symmetric edge list shuffles onto ``a`` once and persists;
    each iteration is one join + map-side-combined groupBy + a scalar agg.
    Iterations = graph diameter; web near-dup clusters are shallow (most
    are cliques from a shared LSH bucket), so this converges in 2-4 rounds.
    For adversarially long chains swap in large-star/small-star (Kiveris et
    al.) behind the same signature.
    """
    e = edges.select(F.col(a).cast("long").alias("a"),
                     F.col(b).cast("long").alias("b"))
    sym = (e.unionByName(e.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
           .distinct().repartition("a").persist())
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))
    def label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))) \
                 .collect()[0][0]

    prev_sum = label_sum(labels)
    try:
        for _ in range(max_iterations):
            nbr = (sym.join(labels.withColumnRenamed("node", "a"), "a")
                   .groupBy("b").agg(F.min("component").alias("nc")))
            labels = (labels.join(nbr.withColumnRenamed("b", "node"),
                                  "node", "left")
                      .select("node",
                              F.least(F.col("component"),
                                      F.coalesce("nc", "component"))
                              .alias("component"))
                      .localCheckpoint(eager=True))
            cur_sum = label_sum(labels)
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    finally:
        sym.unpersist()
    return labels


def connected_components_py(edge_list) -> dict[int, int]:
    """Pure-Python union-find twin — the unit-test oracle."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def pagerank_py(edge_list, iterations: int = 3) -> dict[int, int]:
    """Pure-Python twin of :func:`pagerank` — the unit-test oracle."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for u, v in edge_list:
        out.setdefault(u, []).append(v)
    r = {v: BASE // n for v in nodes}
    teleport = (_DAMP_DEN - _DAMP_NUM) * BASE // (_DAMP_DEN * n)
    for _ in range(iterations):
        contrib = dict.fromkeys(nodes, 0)
        for u, dsts in out.items():
            share = r[u] // len(dsts)
            for v in dsts:
                contrib[v] += share
        dang = sum(r[u] for u in nodes if u not in out) // n
        r = {v: teleport + _DAMP_NUM * (contrib[v] + dang) // _DAMP_DEN
             for v in nodes}
    return r


def top_anchor_texts(anchors: DataFrame, k: int = 3,
                     dst_col: str = "href", anchor_col: str = "anchor",
                     normalize: bool = True) -> DataFrame:
    """Per-target top-k anchor texts — the classic web-corpus enrichment
    (anchor text describes the *target* page better than the page itself;
    search engines and LLM-pretraining URL classifiers both consume it).

    Input is the anchor pass output (`extract.anchors_map_in_pandas`):
    one row per ``<a href=…>`` occurrence.  ``normalize`` lowercases and
    collapses inner whitespace so casing variants aggregate together.

    Plan at 10^10 anchors: groupBy (dst, anchor) is map-side combinable
    (the heavy reduction happens before the shuffle); the row_number
    window then runs per-dst over the already-aggregated counts, whose
    group size is the number of DISTINCT anchor strings per target —
    bounded in practice, never the raw in-link count.  Ties break on the
    anchor string so output is total-ordered and oracle-exact.

    Output: (dst, anchor, n, rank), rank 1..k by (n desc, anchor asc).
    """
    from pyspark.sql import Window

    a = F.col(anchor_col)
    if normalize:
        a = F.trim(F.regexp_replace(F.lower(a), r"\s+", " "))
    counts = (
        anchors.select(F.col(dst_col).alias("dst"), a.alias("anchor"))
        .groupBy("dst", "anchor").agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("anchor"))
    return (counts.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k))
