"""A1-A3 — post-processing over pattern-match results.

The reference applies Aggregator / Grouping / Ordering over the result
dict after matching (``gray/query_call.py:381-403``; parse
``gray/aggregator.py:14-28``, eval ``:30-52``; ``query/Grouping.py:26-41``
— whose shipped code is defective, semantics kept; ``query/Ordering.py:22-26``).
Here they are one-line DataFrame ops over the match table's per-symbol
prop columns (``a.score`` → column ``a_score``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_AGG_FNS = {
    "COUNT": F.count,
    "MIN": F.min,
    "MAX": F.max,
    "SUM": F.sum,
    "AVG": F.avg,
}


def _col(ref: str) -> str:
    return ref.replace(".", "_")


def apply_aggregate(matches: DataFrame, spec: str) -> DataFrame:
    """``"MAX:a.score"`` → 1-row DataFrame (column ``max_a_score``)."""
    op, _, ref = spec.partition(":")
    op = op.upper()
    if op not in _AGG_FNS:
        raise ValueError(f"unknown aggregate {op!r} (have {sorted(_AGG_FNS)})")
    if op == "COUNT":
        return matches.agg(F.count("*").alias("count"))
    c = _col(ref)
    return matches.agg(_AGG_FNS[op](c).alias(f"{op.lower()}_{c}"))


def apply_groupby(matches: DataFrame, keys: list[str]) -> DataFrame:
    """Group matches by symbol-prop keys → per-group match counts."""
    cols = [_col(k) for k in keys]
    return matches.groupBy(*cols).agg(F.count("*").alias("n_matches"))


def apply_orderby(matches: DataFrame, keys: list[str], descending: bool = False) -> DataFrame:
    cols = [F.col(_col(k)) for k in keys]
    return matches.orderBy(*[c.desc() if descending else c.asc() for c in cols])
