"""Scale smoke for connected_components: ~100k edges / ~60k nodes —
two orders of magnitude above the fixture pair volume — cross-checked
against a driver-side union-find ground truth. Pins that the distributed
min-label + pointer-jumping loop converges within its O(log diameter)
budget and stays correct on a graph with many mid-sized components plus
one long chain (the worst diameter case)."""

from __future__ import annotations

import random

from kstreams_spark.operators.dedup import connected_components


def _union_find_labels(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to component minimum (find gives the min because unions
    # always parent the larger root under the smaller one)
    return {n: find(n) for n in nodes}


def test_cc_at_100x_pair_volume(spark):
    rng = random.Random(42)
    edges = []
    # 2000 clusters of ~30 random-internal edges over 25-node id blocks
    for c in range(2000):
        base = c * 50
        for _ in range(30):
            a, b = rng.sample(range(base, base + 25), 2)
            edges.append((min(a, b), max(a, b)))
    # one 5000-node chain starting above the blocks: the diameter case
    chain0 = 2000 * 50
    edges += [(chain0 + i, chain0 + i + 1) for i in range(5000)]
    rng.shuffle(edges)
    nodes = {x for e in edges for x in e}
    want = _union_find_labels(edges, nodes)

    df = spark.createDataFrame(edges, "doc_id1 long, doc_id2 long")
    got = {
        r.node: r.label
        for r in connected_components(df, max_iter=16).collect()
    }
    assert got == want, (
        f"mismatch on {sum(1 for n in want if got.get(n) != want[n])} "
        f"of {len(want)} nodes"
    )
    assert len(set(got.values())) == len(set(want.values()))
