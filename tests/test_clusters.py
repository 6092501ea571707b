"""dup_clusters: connected components over near-dup pair lists —
pointer-jumping label propagation vs a driver-side union-find oracle."""

import random


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in list(parent):
        root = find(n)
        out.setdefault(root, set()).add(n)
    return {n: min(members) for members in out.values() for n in members}


def _run(spark, edges, **kw):
    from pysearch.ops import dup_clusters

    df = spark.createDataFrame(edges, schema="a long, b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(df, **kw).collect()}
    assert got == _union_find(edges)
    return got


def test_clusters_basic_shapes(spark):
    # two triangles sharing nothing + an isolated pair + a star
    edges = [(1, 2), (2, 3), (1, 3),
             (10, 11), (11, 12),
             (20, 21),
             (30, 31), (30, 32), (30, 33)]
    got = _run(spark, edges)
    assert got[3] == 1 and got[12] == 10 and got[21] == 20 and got[33] == 30


def test_clusters_chain_needs_jumping(spark):
    """A 64-node path component: plain min-propagation needs ~diameter
    rounds; pointer jumping must converge well inside max_iters=10
    (2^10 ≫ 64) — failure to jump would raise the non-convergence error."""
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, edges, max_iters=10)
    assert set(got.values()) == {0}


def test_clusters_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(300))
    edges = [(min(a, b), max(a, b))
             for a, b in (rng.sample(nodes, 2) for _ in range(220))]
    _run(spark, edges)
