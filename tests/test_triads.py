"""Parity for the orientation-aware ring: directed triad census
(vs NetworkX ``triadic_census`` closed-triad classes and a brute-force
enumerator) and digraph reciprocity (vs ``nx.reciprocity``), plus the
row-local char-entropy expression vs a pure-python computation."""

from __future__ import annotations

import itertools
import math
import random

import networkx as nx

from igpm_pem_spark.operators.metrics import reciprocity
from igpm_pem_spark.operators.triangles import directed_triad_census

from .conftest import edges_df


def _census(spark, pairs) -> dict[str, int]:
    rows = directed_triad_census(edges_df(spark, pairs)).collect()
    return {r["motif"]: r["n"] for r in rows}


def _brute(pairs) -> dict[str, int]:
    es = {(a, b) for a, b in pairs if a != b}
    verts = sorted({v for e in es for v in e})
    out = {"cyclic": 0, "transitive": 0, "mutual": 0}
    for a, b, c in itertools.combinations(verts, 3):
        und = [
            (u, v)
            for u, v in ((a, b), (a, c), (b, c))
            if (u, v) in es or (v, u) in es
        ]
        if len(und) < 3:
            continue
        if any((u, v) in es and (v, u) in es for u, v in und):
            out["mutual"] += 1
        elif ((a, b) in es and (b, c) in es and (c, a) in es) or (
            (b, a) in es and (c, b) in es and (a, c) in es
        ):
            out["cyclic"] += 1
        else:
            out["transitive"] += 1
    return {k: v for k, v in out.items() if v}


def test_triad_census_handcrafted(spark):
    # one cycle {1,2,3}, one feed-forward {4,5,6}, one mutual-edge
    # triangle {7,8,9}
    pairs = [
        (1, 2), (2, 3), (3, 1),
        (4, 5), (5, 6), (4, 6),
        (7, 8), (8, 7), (8, 9), (7, 9),
    ]
    assert _census(spark, pairs) == {
        "cyclic": 1, "transitive": 1, "mutual": 1,
    }


def test_triad_census_random_brute(spark):
    rng = random.Random(7)
    pairs = list(
        {
            (rng.randrange(18), rng.randrange(18))
            for _ in range(120)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _census(spark, pairs) == _brute(pairs)


def test_triad_census_networkx_closed_classes(spark):
    # on a reciprocal-free digraph the closed NetworkX triad classes map
    # 030C → cyclic and 030T → transitive exactly
    rng = random.Random(3)
    seen = set()
    pairs = []
    for _ in range(90):
        a, b = rng.randrange(16), rng.randrange(16)
        if a != b and (a, b) not in seen and (b, a) not in seen:
            seen.add((a, b))
            pairs.append((a, b))
    g = nx.DiGraph(pairs)
    census = nx.triadic_census(g)
    got = _census(spark, pairs)
    assert got.get("cyclic", 0) == census["030C"]
    assert got.get("transitive", 0) == census["030T"]
    assert "mutual" not in got


def test_triad_census_dedupes_and_drops_loops(spark):
    pairs = [(1, 2), (1, 2), (2, 3), (3, 1), (2, 2)]
    assert _census(spark, pairs) == {"cyclic": 1}


def test_reciprocity_handcrafted(spark):
    # 4 directed edges, one mutual pair → 2/4
    pairs = [(1, 2), (2, 1), (2, 3), (3, 4)]
    row = reciprocity(edges_df(spark, pairs)).first()
    assert row["n_edges"] == 4
    assert row["n_recip"] == 2
    assert row["reciprocity"] == 0.5


def test_reciprocity_networkx(spark):
    rng = random.Random(11)
    pairs = list(
        {(rng.randrange(20), rng.randrange(20)) for _ in range(150)}
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    g = nx.DiGraph(pairs)
    row = reciprocity(edges_df(spark, pairs)).first()
    assert row["n_edges"] == g.number_of_edges()
    assert math.isclose(row["reciprocity"], nx.reciprocity(g))


def test_char_entropy_expression(spark):
    from igpm_pem_spark.queries.graphq2 import _q_char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa", "en", "t", 4),
            (2, "ab", "en", "t", 2),
            (3, "abcdabcd", "en", "t", 8),
            (4, "", "en", "t", 0),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    )
    df.createOrReplaceTempView("documents")
    # _q_char_entropy reads the registered view when given a dir with no
    # parquet to re-register over it
    from igpm_pem_spark.queries import graphq2

    out = {
        r["doc_id"]: r
        for r in graphq2._q_char_entropy(spark, "/nonexistent").collect()
    }
    assert set(out) == {1, 2, 3}  # empty doc filtered
    assert out[1]["ent6"] == 0.0
    assert out[2]["ent6"] == 1.0
    assert out[3]["ent6"] == 2.0
    assert out[3]["n_chars"] == 8 and out[3]["distinct_chars"] == 4


def test_char_entropy_python_parity(spark):
    from collections import Counter

    from igpm_pem_spark.queries import graphq2

    rng = random.Random(5)
    rows = [
        (
            i,
            "".join(
                rng.choice("abcdefgh  .x") for _ in range(rng.randrange(1, 200))
            ),
            "en",
            "t",
            0,
        )
        for i in range(30)
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = {
        r["doc_id"]: r["ent6"]
        for r in graphq2._q_char_entropy(spark, "/nonexistent").collect()
    }
    for i, text, *_ in rows:
        n = len(text)
        cnt = Counter(text)
        ent = math.log2(n) - sum(k * math.log2(k) for k in cnt.values()) / n
        assert abs(got[i] - round(ent, 6)) <= 1e-6
