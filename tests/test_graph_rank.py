"""pagerank (operators/graph.py): analytic answers on known graphs,
plus the order-invariance property the DECIMAL discipline promises."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ranks(spark, edges, n_iters=3):
    from babylon_data_loader_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    return {
        r["node"]: r["r"] for r in pagerank(df, n_iters=n_iters).collect()
    }


def test_pagerank_ring_is_uniform(spark):
    """On a directed ring every node has in/out degree 1: the uniform
    vector is the fixed point, so every iteration returns exactly
    1/N."""
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    ranks = _ranks(spark, edges, n_iters=3)
    assert set(ranks) == set(range(n))
    expect = round(1.0 / n, 12)
    assert all(abs(v - expect) < 1e-9 for v in ranks.values())


def test_pagerank_star_matches_reference(spark):
    """Star with bidirectional spokes: compare against a plain-python
    power iteration applying the operator's exact rounding recipe."""
    k = 5  # leaves
    edges = [(0, i) for i in range(1, k + 1)] + [
        (i, 0) for i in range(1, k + 1)
    ]
    n = k + 1
    ranks = {i: round(1.0 / n, 12) for i in range(n)}
    deg = {0: k, **{i: 1 for i in range(1, k + 1)}}
    for _ in range(2):
        nxt = {}
        for node in range(n):
            srcs = [s for s, d in edges if d == node]
            s = sum(round(ranks[sr] / deg[sr], 12) for sr in srcs)
            nxt[node] = round(0.15 / n + 0.85 * s, 12)
        ranks = nxt
    got = _ranks(spark, edges, n_iters=2)
    assert got.keys() == ranks.keys()
    for node in got:
        assert abs(got[node] - ranks[node]) < 1e-11, node
    # the hub must dominate every leaf
    assert got[0] > max(v for nd, v in got.items() if nd != 0)


def test_pagerank_input_order_invariant(spark):
    """Reversing edge-row order cannot change a single digit — the
    per-edge round + DECIMAL-sum accumulation is order-proof."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (0, 2)]
    a = _ranks(spark, edges, n_iters=3)
    b = _ranks(spark, list(reversed(edges)), n_iters=3)
    assert a == b


# triangle_counts -------------------------------------------------------------


def _tri(spark, edges):
    from babylon_data_loader_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    return {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }


def test_triangle_counts_k4(spark):
    """K4 has C(4,3)=4 triangles; every node sits in exactly 3."""
    edges = [
        (a, b) for a in range(4) for b in range(4) if a < b
    ]
    assert _tri(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_triangle_plus_tail(spark):
    """A 3-cycle with a pendant edge: only the cycle nodes count, the
    tail node is absent from the result (zero triangles)."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    assert _tri(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_orientation_and_duplicates_invariant(spark):
    """Reversed, duplicated, and self-loop edges change nothing: the
    operator canonicalizes to an undirected simple graph first."""
    base = [(1, 2), (2, 3), (3, 1)]
    noisy = base + [(2, 1), (3, 2), (1, 3), (1, 1), (2, 3)]
    assert _tri(spark, base) == _tri(spark, noisy) == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_hub_star_has_none(spark):
    """A star (hub + leaves) is triangle-free no matter how skewed the
    hub degree — the degree-ordered orientation must not fabricate
    wedge closures."""
    edges = [(0, i) for i in range(1, 12)]
    assert _tri(spark, edges) == {}


def test_triangle_counts_bowtie_center(spark):
    """Two triangles sharing one vertex: the shared vertex counts 2,
    the wings 1 each."""
    edges = [(1, 2), (2, 0), (0, 1), (0, 3), (3, 4), (4, 0)]
    assert _tri(spark, edges) == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_triangle_counts_random_graphs_match_bruteforce(spark):
    """Seeded Erdős–Rényi graphs vs an itertools brute force: per-node
    counts must agree exactly (orientation must neither lose nor
    duplicate triangles on arbitrary topology, including hubs)."""
    import itertools
    import random

    for seed in [1, 7, 42]:
        rng = random.Random(seed)
        n = 14
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.35
        ]
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        expected = {}
        for a, b, c in itertools.combinations(range(n), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for v in (a, b, c):
                    expected[v] = expected.get(v, 0) + 1
        assert _tri(spark, edges) == expected, f"seed={seed}"
