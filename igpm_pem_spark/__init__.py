"""igpm_pem_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities re-expressed Spark-first from the reference engine
hkanezashi/IGPM-PEM (incremental graph pattern matching, single-process
NetworkX — see SURVEY.md):

* iterative vertex-score propagation (PageRank, generalizing the reference's
  RWR power iteration, ``patternmatching/gray/rwr.py``),
* connected components via hash-min message passing (the reference's WCC
  primitive, ``rwr.py:26``),
* deterministic synchronous label propagation (the reference's Louvain-based
  community scoping, ``incremental/query_call.py:130-165``),
* triangle / pattern counting (the reference's ground-truth metric,
  ``incremental/gray_incremental.py:193-202``),
* a relational pattern-match surface (G-Ray re-expressed as chained joins,
  ``gray_multiple.py``), and
* large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing).

Everything on the data path is DataFrame/SQL (Catalyst-optimized); Python
only orchestrates superstep loops. Arrow-vectorized pandas UDFs are used
solely for source-content parsing; no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
