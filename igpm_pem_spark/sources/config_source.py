"""S8 — INI config source: the reference's batch entry point.

Mirrors ``gray/query_call.py:415-438``: a ConfigParser file with
``[G-Ray] input_json / query / steps / base_steps / time_limit`` and
``[Log] profile / level`` drives one query run. Our execution swaps the
G-Ray search for the relational pattern plan (plans/pattern.py); dynamic
configs (steps > 1) replay through the incremental operators.
"""

from __future__ import annotations

import logging
from configparser import ConfigParser
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..plans.pattern import PatternQuery, parse_query_args

_LOG_LEVELS = {"debug": logging.DEBUG, "info": logging.INFO}


@dataclass
class QueryConfig:
    input_json: str
    query: PatternQuery
    query_text: str
    steps: int = 1
    base_steps: int = 1
    time_limit: float = 0.0
    num_proc: int = 1
    log_level: int = logging.WARNING
    profile: bool = False


def load_query_config(path: str) -> QueryConfig:
    """Parse the reference's INI format (``sample/*.ini``). Unknown keys
    are ignored; missing optional keys take the reference's defaults."""
    conf = ConfigParser()
    read = conf.read(path)
    if not read:
        raise FileNotFoundError(path)
    qtext = conf.get("G-Ray", "query")
    return QueryConfig(
        input_json=conf.get("G-Ray", "input_json"),
        query=parse_query_args(qtext),
        query_text=qtext,
        steps=conf.getint("G-Ray", "steps", fallback=1),
        base_steps=conf.getint("G-Ray", "base_steps", fallback=1),
        time_limit=conf.getfloat("G-Ray", "time_limit", fallback=0.0),
        num_proc=conf.getint("G-Ray", "num_proc", fallback=1),
        log_level=_LOG_LEVELS.get(
            conf.get("Log", "level", fallback="warning").lower(), logging.WARNING
        ),
        profile=conf.getboolean("Log", "profile", fallback=False),
    )


def run_query_config(spark: SparkSession, path: str) -> DataFrame:
    """Load the config, read its node-link graph, run the pattern match
    (one row per distinct match) — the S8 end-to-end entry point.

    ``steps > 1`` selects the reference's dynamic mode
    (``run_query_step``, ``incremental/query_call.py:180-258``): edges'
    ``ts`` (the JSON ``add`` attribute) buckets replay through the
    incremental matcher — per step only matches touching new edges are
    enumerated — landing on the same result set as a batch run."""
    from ..operators.incremental import incremental_pattern_match
    from ..plans.pattern import match_pattern
    from .node_link import load_node_link

    cfg = load_query_config(path)
    vertices, edges, _directed = load_node_link(spark, cfg.input_json)
    if cfg.steps > 1:
        res = incremental_pattern_match(
            spark, vertices, edges, cfg.query, base_steps=cfg.base_steps
        )
        return res.state
    return match_pattern(spark, vertices, edges, cfg.query)
