"""Bow-tie decomposition: pure-Python reference parity on hand-built and
random digraphs."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from .conftest import edges_df


def _bowtie_python(pairs):
    g = nx.DiGraph()
    g.add_edges_from(pairs)
    sccs = sorted(
        (sorted(c) for c in nx.strongly_connected_components(g)),
        key=lambda c: (-len(c), c[0]),
    )
    core = set(sccs[0])
    fwd = set()
    for c in core:
        fwd |= nx.descendants(g, c)
    fwd |= core
    bwd = set()
    for c in core:
        bwd |= nx.ancestors(g, c)
    bwd |= core
    outs = fwd - core
    ins = bwd - core
    fin = set(ins)
    for v in ins:
        fin |= nx.descendants(g, v)
    bout = set(outs)
    for v in outs:
        bout |= nx.ancestors(g, v)
    cls = {}
    for v in g.nodes:
        if v in core:
            cls[v] = "core"
        elif v in ins:
            cls[v] = "in"
        elif v in outs:
            cls[v] = "out"
        elif v in fin and v in bout:
            cls[v] = "tube"
        elif v in fin or v in bout:
            cls[v] = "tendril"
        else:
            cls[v] = "disconnected"
    return cls


# core cycle 1-2-3; IN: 10->1, 11->10; OUT: 3->20, 20->21;
# tube: 10->30->20 (bypasses core); tendril off IN: 10->40;
# tendril into OUT: 41->20; disconnected: 50-51
BOWTIE_PAIRS = [
    (1, 2), (2, 3), (3, 1),
    (10, 1), (11, 10),
    (3, 20), (20, 21),
    (10, 30), (30, 20),
    (10, 40),
    (41, 20),
    (50, 51),
]


def test_bowtie_hand_built(spark):
    from igpm_pem_spark.operators.bowtie import bowtie_decomposition

    res = bowtie_decomposition(spark, edges_df(spark, BOWTIE_PAIRS))
    got = {r.id: r.cls for r in res.classes.collect()}
    assert res.core_scc == 1
    want = _bowtie_python(BOWTIE_PAIRS)
    assert got == want
    # spot-check the interesting classes are all present
    assert got[30] == "tube"
    assert got[40] == "tendril"
    assert got[41] == "tendril"
    assert got[50] == "disconnected"
    assert got[10] == "in" and got[20] == "out"


@pytest.mark.parametrize("seed", [7, 21])
def test_bowtie_random_digraphs(spark, seed):
    from igpm_pem_spark.operators.bowtie import bowtie_decomposition

    rng = random.Random(seed)
    pairs = list(
        {
            (rng.randrange(25), rng.randrange(25))
            for _ in range(60)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {
        r.id: r.cls
        for r in bowtie_decomposition(spark, edges_df(spark, pairs)).classes.collect()
    }
    assert got == _bowtie_python(pairs)
