"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[name, (callable, oracle_sql|None)]``
— the callable takes (spark, sf_dir) → DataFrame; the oracle is DuckDB SQL
over the same parquet views, or None for non-SQL-expressible operators
(driver then records a rows-only check).
"""

from __future__ import annotations

from . import graphq, metricsq, patternq, pipeline, pipeline2, pipeline3, relational


def all_queries():
    out = {}
    for mod in (graphq, metricsq, patternq, pipeline, pipeline2, pipeline3, relational):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
