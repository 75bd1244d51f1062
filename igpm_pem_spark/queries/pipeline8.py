"""Round-5 session-5 pipeline additions: sequence packing.

Each entry pairs the Spark operator with a DuckDB oracle replaying the
identical sequential recurrence (here: the next-fit-decreasing packing
walk as a recursive CTE stepping one document per group per iteration).
"""

from __future__ import annotations

from ._common import docs

_PACK_CAP = 512


def _q_seq_packing(spark, sf_dir):
    """Pack each language's documents into 512-token context bins by
    next-fit-decreasing; per-doc (lang, doc_id, n_tok, bin, fill)."""
    from ..operators.packing import pack_sequences

    return pack_sequences(docs(spark, sf_dir), capacity=_PACK_CAP, group_cols=("lang",))


_PACK_SQL = f"""
WITH RECURSIVE t AS (
  SELECT lang, doc_id,
         CAST(LEAST(len(list_filter(string_split(lower(text), ' '),
                                     x -> x <> '')), {_PACK_CAP}) AS BIGINT) AS n_tok
  FROM documents
), o AS (
  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, n_tok,
         row_number() OVER (PARTITION BY lang ORDER BY n_tok DESC, doc_id) AS rn
  FROM t
), pack AS (
  SELECT lang, doc_id, n_tok, rn, CAST(0 AS BIGINT) AS bin, n_tok AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.lang, o.doc_id, o.n_tok, o.rn,
         CASE WHEN p.fill + o.n_tok <= {_PACK_CAP} THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + o.n_tok <= {_PACK_CAP} THEN p.fill + o.n_tok ELSE o.n_tok END
  FROM pack p JOIN o ON o.lang = p.lang AND o.rn = p.rn + 1
)
SELECT lang, doc_id, n_tok, bin, fill FROM pack
"""


QUERIES = {
    "doc_seq_packing": (_q_seq_packing, _PACK_SQL),
}
