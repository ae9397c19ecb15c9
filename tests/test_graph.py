"""Fixed-point PageRank: Spark vs the pure-Python twin, plus the
determinism and conservation properties the fixed-point design buys."""

from __future__ import annotations

from remilia_spark.datapipe.graph import (
    BASE,
    connected_components,
    connected_components_py,
    pagerank,
    pagerank_py,
)

# diamond + dangling sink + a cycle back: exercises dangling mass,
# multi-in-degree, and a node with no in-edges
_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (3, 4), (5, 0)]


def test_pagerank_matches_python_twin(spark):
    e = spark.createDataFrame(_EDGES, "src long, dst long")
    got = {r.node: r.rank_fp for r in pagerank(e, iterations=4).collect()}
    assert got == pagerank_py(_EDGES, iterations=4)


def test_pagerank_partitioning_invariant(spark):
    e1 = spark.createDataFrame(_EDGES, "src long, dst long").repartition(1)
    e8 = spark.createDataFrame(_EDGES, "src long, dst long").repartition(8)
    r1 = {r.node: r.rank_fp for r in pagerank(e1, iterations=3).collect()}
    r8 = {r.node: r.rank_fp for r in pagerank(e8, iterations=3).collect()}
    assert r1 == r8  # bit-identical on any partitioning


def test_connected_components(spark):
    # two chains + a singleton-pair + a clique: {0..3}, {10,11,12}, {20,21}
    edges = [(1, 0), (1, 2), (3, 2), (10, 11), (11, 12), (10, 12), (21, 20)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.component
           for r in connected_components(e).collect()}
    assert got == connected_components_py(edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain(spark):
    # a 12-node path needs multiple propagation rounds to converge
    edges = [(i, i + 1) for i in range(11)]
    e = spark.createDataFrame(edges, "a long, b long").repartition(6)
    got = {r.node: r.component for r in connected_components(e).collect()}
    assert got == {i: 0 for i in range(12)}


def test_connected_components_star_matches_twin(spark):
    from remilia_spark.datapipe.graph import connected_components_star

    edges = [(1, 0), (1, 2), (3, 2), (10, 11), (11, 12), (10, 12), (21, 20),
             (30, 30)]  # self-loop: isolated node must still get a label
    e = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.component
           for r in connected_components_star(e).collect()}
    assert got == connected_components_py(edges)


def test_connected_components_star_random_graphs(spark):
    import random

    from remilia_spark.datapipe.graph import connected_components_star

    rng = random.Random(7)
    for n, m in [(20, 12), (30, 45), (16, 8)]:
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        e = spark.createDataFrame(edges, "a long, b long").repartition(5)
        got = {r.node: r.component
               for r in connected_components_star(e).collect()}
        assert got == connected_components_py(edges), (n, m)


def test_star_chain_logarithmic_rounds(spark):
    """The VERDICT-prescribed adversarial shape: a path graph.  Min-label
    needs O(n) rounds (the 24-node chain takes >= 12); large-star/
    small-star contracts it in O(log n) (<= 6 incl. the fixpoint probe)."""
    from remilia_spark.datapipe.graph import connected_components_star

    n = 24
    edges = [(i, i + 1) for i in range(n - 1)]
    e = spark.createDataFrame(edges, "a long, b long").repartition(6)
    iters: list[int] = []
    got = {r.node: r.component
           for r in connected_components_star(e, iters_out=iters).collect()}
    assert got == {i: 0 for i in range(n)}
    assert iters[0] <= 6, iters


def test_pagerank_properties():
    r = pagerank_py(_EDGES, iterations=6)
    # mass approximately conserved (floor-div loses < 1 unit per op)
    assert abs(sum(r.values()) - BASE) < len(r) * 200
    # node 3 has two in-edges from rank-rich nodes: top rank
    assert max(r, key=r.get) == 3
    # node 5 has no in-edges: minimum (pure teleport + dangling share)
    assert min(r, key=r.get) == 5


def test_hits_matches_python_twin(spark):
    from remilia_spark.datapipe.graph import hits, hits_py
    # duplicate edge on purpose: DISTINCT is part of the pinned spec
    edges = _EDGES + [(0, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub_fp, r.auth_fp)
           for r in hits(e, iterations=3).collect()}
    assert got == hits_py(edges, iterations=3)


def test_hits_partitioning_invariant(spark):
    from remilia_spark.datapipe.graph import hits
    e1 = spark.createDataFrame(_EDGES, "src long, dst long").repartition(1)
    e8 = spark.createDataFrame(_EDGES, "src long, dst long").repartition(8)
    r1 = {r.node: (r.hub_fp, r.auth_fp)
          for r in hits(e1, iterations=2).collect()}
    r8 = {r.node: (r.hub_fp, r.auth_fp)
          for r in hits(e8, iterations=2).collect()}
    assert r1 == r8


def test_hits_properties():
    from remilia_spark.datapipe.graph import hits_py
    r = hits_py(_EDGES, iterations=4)
    hubs = {v: h for v, (h, _) in r.items()}
    auth = {v: a for v, (_, a) in r.items()}
    # node 0 is pointed at by the top hub (3) plus 5: top authority
    assert max(auth, key=auth.get) == 0
    # node 3 concentrates the diamond's out-links: top hub
    assert max(hubs, key=hubs.get) == 3
    # node 4 is a pure sink: zero hub score; node 5 links only into the
    # core: nonzero hub, zero authority
    assert hubs[4] == 0 and auth[5] == 0
    # scores stay O(BASE) (the quantized-normalization bound)
    assert all(0 <= x <= 2 * BASE for x in list(hubs.values())
               + list(auth.values()))


def test_hits_empty_and_validation(spark):
    import pytest
    from remilia_spark.datapipe.graph import hits
    e = spark.createDataFrame([], "src long, dst long")
    assert hits(e).count() == 0
    with pytest.raises(ValueError):
        hits(spark.createDataFrame([(1, 2)], "src long, dst long"),
             iterations=0)
