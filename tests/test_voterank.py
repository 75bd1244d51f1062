"""voterank: exact-integer VoteRank elections on hand-traced graphs."""

from __future__ import annotations

import pytest

from igpm_pem_spark.operators.centrality import voterank


def test_voterank_hand_trace(spark):
    # star 0-{1,2,3,4} plus the far edge 5-6:
    # V=7, S=2E=10, decrement=V=7, all abilities start at 10.
    # R1: score(0)=40 wins; its neighbors drop to 3, va(0)=0.
    # R2: 1..4 now score va(0)=0; 5 and 6 score 10 -> tie, lower id 5.
    # R3: every remaining candidate scores 0 -> lowest id 1.
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)], "src long, dst long"
    )
    got = [(r.rank, r.id, r.score_scaled) for r in voterank(spark, e, k=3).collect()]
    assert got == [(1, 0, 40), (2, 5, 10), (3, 1, 0)]


def test_voterank_fewer_vertices_than_k(spark):
    # single edge: both endpoints elected, then no candidates remain
    e = spark.createDataFrame([(7, 9)], "src long, dst long")
    got = [(r.rank, r.id, r.score_scaled) for r in voterank(spark, e, k=3).collect()]
    assert got == [(1, 7, 2), (2, 9, 0)]


def test_voterank_k0_raises(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="k must be >= 1"):
        voterank(spark, e, k=0)
