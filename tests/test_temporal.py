"""Earliest-arrival kernel vs a pure-python time-respecting BFS, on graphs
where temporal order matters (edges that exist 'too early' to be taken)."""

from __future__ import annotations

import pytest

from igpm_pem_spark.operators.temporal import earliest_arrival


def _brute(edges, sources, start_ts=0, directed=True):
    inst = set()
    for s, d, t in edges:
        if s == d:
            continue
        inst.add((s, d, t))
        if not directed:
            inst.add((d, s, t))
    arrival = {s: start_ts for s in sources}
    changed = True
    while changed:
        changed = False
        for s, d, t in inst:
            if s in arrival and t >= arrival[s] and t < arrival.get(d, 1 << 60):
                arrival[d] = t
                changed = True
    return arrival


def _tedges(spark, triples):
    return spark.createDataFrame(triples, "src BIGINT, dst BIGINT, ts BIGINT")


# 1→2 only via ts 5; 2→3 exists at ts 3 (BEFORE the walker can reach 2) and
# ts 9; 3→4 at ts 1 only — so 4 is unreachable despite a static path.
TEMPORAL = [
    (1, 2, 5), (2, 3, 3), (2, 3, 9), (3, 4, 1), (1, 5, 2), (5, 3, 4),
    (3, 6, 10),
]


def test_earliest_arrival_respects_time(spark):
    res = earliest_arrival(
        spark, _tedges(spark, TEMPORAL), [1], num_partitions=4
    )
    got = {r.id: r.arrival for r in res.arrivals.collect()}
    assert got == _brute(TEMPORAL, [1])
    assert got[3] == 4  # via 1→5(2)→3(4), not the too-early 2→3(3)
    assert 4 not in got  # static path exists, temporal one doesn't
    assert res.converged


def test_earliest_arrival_multi_seed_and_undirected(spark):
    res = earliest_arrival(
        spark, _tedges(spark, TEMPORAL), [4, 6], directed=False,
        num_partitions=4,
    )
    got = {r.id: r.arrival for r in res.arrivals.collect()}
    assert got == _brute(TEMPORAL, [4, 6], directed=False)


@pytest.mark.parametrize("seed", [0, 7])
def test_earliest_arrival_random_parity(spark, seed):
    import random

    rng = random.Random(seed)
    triples = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(20))
        for _ in range(60)
    ]
    triples = [(s, d, t) for s, d, t in triples if s != d]
    res = earliest_arrival(
        spark, _tedges(spark, triples), [0, 1], num_partitions=4
    )
    got = {r.id: r.arrival for r in res.arrivals.collect()}
    assert got == _brute(triples, [0, 1])
