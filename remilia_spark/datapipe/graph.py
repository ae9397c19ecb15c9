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


def hits(edges: DataFrame, iterations: int = 3,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-point HITS (Kleinberg); returns ``(node, hub_fp, auth_fp)``.

    Complements ``pagerank`` for frontier prioritization: authority ranks
    *where to fetch next*, hub scores rank *which fetched pages to re-parse
    for links first* (a good hub's outlinks are worth expanding early).

    Pinned integer spec (frozen — the DuckDB oracle replays it exactly):

        edges       : DISTINCT (src, dst) — multi-links don't multiply score
        h0(v)       = BASE div N
        a_raw(v)    = SUM h(u) over in-edges (u,v)        -- exact int sum
        a(v)        = a_raw(v) div max(A div BASE, 1),  A = SUM a_raw
        h_raw(u)    = SUM a(v) over out-edges (u,v)
        h(u)        = h_raw(u) div max(H div BASE, 1),  H = SUM h_raw

    The normalization divisor is quantized to BASE granularity — a pinned,
    division-free-in-spirit substitute for exact L1 normalization chosen so
    every intermediate stays integer (bit-identical on any partitioning /
    engine).  Scores stay O(BASE); per-node sums stay < indeg·BASE, so
    64-bit holds for in/out-degrees < ~9·10^6 at BASE 10^12 (drop BASE two
    orders for denser graphs).  The two corpus-wide totals A and H are
    HUGEINT/decimal scalar aggregates (one number to the driver each).

    Scale: the edge list is persisted twice, pre-shuffled on src and on
    dst, so each iteration shuffles only the (node, score) table — same
    pattern as ``pagerank``'s src-side persist.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    spark = edges.sparkSession
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node long, hub_fp long, "
                                         "auth_fp long")
    e_src = e.repartition("src").persist()   # joined on src each iteration
    e_dst = e.repartition("dst").persist()   # joined on dst each iteration

    def total(df: DataFrame, col: str) -> int:
        row = df.agg(F.coalesce(
            F.sum(F.col(col).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"))).collect()[0][0]
        return int(row)

    hubs = nodes.withColumn("hub_fp", F.lit(BASE // n).cast("long"))
    auth = None
    try:
        for _ in range(iterations):
            araw = (e_src.join(hubs.withColumnRenamed("node", "src"), "src")
                    .groupBy("dst").agg(F.sum("hub_fp").alias("araw")))
            qa = max(total(araw, "araw") // BASE, 1)
            auth = (nodes.join(araw.withColumnRenamed("dst", "node"),
                               "node", "left")
                    .select("node",
                            F.expr(f"coalesce(araw, 0) div {qa}")
                            .cast("long").alias("auth_fp"))
                    .localCheckpoint(eager=True))
            hraw = (e_dst.join(auth.withColumnRenamed("node", "dst"), "dst")
                    .groupBy("src").agg(F.sum("auth_fp").alias("hraw")))
            qh = max(total(hraw, "hraw") // BASE, 1)
            hubs = (nodes.join(hraw.withColumnRenamed("src", "node"),
                               "node", "left")
                    .select("node",
                            F.expr(f"coalesce(hraw, 0) div {qh}")
                            .cast("long").alias("hub_fp"))
                    .localCheckpoint(eager=True))
    finally:
        e_src.unpersist()
        e_dst.unpersist()
    return hubs.join(auth, "node")


def hits_py(edge_list, iterations: int = 3) -> dict[int, tuple[int, int]]:
    """Pure-Python twin of ``hits`` (same pinned spec) — the unit-test
    oracle.  Returns node -> (hub_fp, auth_fp)."""
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    if not nodes:
        return {}
    n = len(nodes)
    h = {v: BASE // n for v in nodes}
    a = {}
    for _ in range(iterations):
        araw = {v: 0 for v in nodes}
        for u, v in edges:
            araw[v] += h[u]
        qa = max(sum(araw.values()) // BASE, 1)
        a = {v: araw[v] // qa for v in nodes}
        hraw = {v: 0 for v in nodes}
        for u, v in edges:
            hraw[u] += a[v]
        qh = max(sum(hraw.values()) // BASE, 1)
        h = {v: hraw[v] // qh for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


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


def connected_components_star(edges: DataFrame, a: str = "a", b: str = "b",
                              max_iterations: int = 50,
                              iters_out: list | None = None) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
    — the adversarial-diameter path :func:`connected_components`'s
    docstring promises.  Same output contract: ``(node long, component
    long)`` with ``component`` = smallest node id in the component.

    Min-label propagation needs O(diameter) iterations — a chain of n
    nodes takes n rounds.  The star algorithm contracts the graph toward
    per-component stars centered at the minimum node in **O(log n)**
    rounds on ANY shape:

      large-star(u): connect every strictly-larger neighbor v > u to
        m(u) = min(Γ(u) ∪ {u});
      small-star(u): connect every neighbor v ≤ u, and u itself, to m(u).

    Both steps preserve connectivity and only ever link a node to a
    smaller one, so the fixpoint is the star forest whose centers are the
    component minima — read the labels straight off the edges.

    Deterministic: every emitted edge is a (min, node) pair — no
    tie-breaks, no randomness; the fixpoint is unique regardless of
    partitioning.

    Scale: each round is two groupBy-mins + two joins over the CURRENT
    edge set, which only shrinks toward one edge per non-root node; edge
    endpoints are longs (never payloads).  The convergence probe is one
    tiny (count, decimal-sum) aggregate — same overflow-safe decimal
    trick as :func:`connected_components`.

    ``iters_out``: appended with the number of alternating rounds run
    (test hook for the O(log n) claim).
    """
    e = edges.select(F.col(a).cast("long").alias("x"),
                     F.col(b).cast("long").alias("y"))
    nodes = (e.select(F.col("x").alias("node"))
             .unionByName(e.select(F.col("y").alias("node")))
             .distinct().localCheckpoint(eager=True))
    # canonical undirected pairs x < y; self-loops drop (nodes kept above)
    und = (e.where(F.col("x") != F.col("y"))
           .select(F.least("x", "y").alias("x"),
                   F.greatest("x", "y").alias("y"))
           .distinct().localCheckpoint(eager=True))

    def sym(E: DataFrame) -> DataFrame:
        return E.select(F.col("x").alias("u"), F.col("y").alias("v")) \
                .unionByName(E.select(F.col("y").alias("u"),
                                      F.col("x").alias("v")))

    def min_nbr(S: DataFrame) -> DataFrame:
        return S.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))

    def sig(E: DataFrame):
        return tuple(E.agg(
            F.count(F.lit(1)),
            F.sum(F.col("x").cast("decimal(38,0)")),
            F.sum(F.col("y").cast("decimal(38,0)"))).collect()[0])

    prev = sig(und)
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        s1 = sym(und)
        # large-star: (v, m(u)) for v > u; m <= u < v so (m, v) is canonical
        large = (s1.join(min_nbr(s1), "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.col("m").alias("x"), F.col("v").alias("y"))
                 .distinct())
        s2 = sym(large)
        # small-star: (v, m(u)) for v <= u, plus (u, m(u)); again m <= v
        cand = (s2.where(F.col("v") <= F.col("u"))
                .unionByName(s2.select("u").distinct()
                             .withColumn("v", F.col("u"))))
        und_next = (cand.join(min_nbr(s2), "u")
                    .where(F.col("m") != F.col("v"))
                    .select(F.col("m").alias("x"), F.col("v").alias("y"))
                    .distinct().localCheckpoint(eager=True))
        und = und_next
        cur = sig(und)
        if cur == prev:
            break
        prev = cur
    if iters_out is not None:
        iters_out.append(rounds)
    # fixpoint edges are (component-min, member); roots label themselves
    return (nodes.join(und.select(F.col("y").alias("node"),
                                  F.col("x").alias("component")),
                       "node", "left")
            .select("node", F.coalesce("component", "node")
                    .alias("component")))


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
