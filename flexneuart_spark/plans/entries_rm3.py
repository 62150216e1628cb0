"""Driver-contract entry for RM3 pseudo-relevance feedback
(``FeatExtractorRM3Similarity.java`` — see ``search/rm3.py`` for the
semantics and citations). One Spark callable + an exactly equivalent
DuckDB oracle over the shared tokenization/BM25 building blocks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flexneuart_spark.plans.entries import (
    K,
    SQL_QTOK,
    SQL_TOK,
    _B,
    _K1,
    _doc_tokens,
    _queries_df,
    _rounded_topk,
)
from flexneuart_spark.search.rm3 import rm3_rescore

CAND_QTY = 20
TOP_DOC_QTY = 3
TOP_TERM_QTY = 10
ORIG_WEIGHT = 0.5


def q_rm3_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 rerank over the BM25-qnorm candidate pool
    (gen_rm3_exper_json_desc.py grid point origWeight=0.5/topDocQty=3/
    topTermQty=10; accumulate=True, the Diaz-2015-correct relevance
    model — the Java clear() quirk is unit-tested separately)."""
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    rescored = rm3_rescore(
        docs_tok,
        q_tok,
        cand_qty=CAND_QTY,
        top_doc_qty=TOP_DOC_QTY,
        top_term_qty=TOP_TERM_QTY,
        orig_weight=ORIG_WEIGHT,
    )
    return _rounded_topk(rescored, "rm3_score")


SQL_RM3_RERANK = rf"""
WITH {SQL_TOK}, {SQL_QTOK},
idf AS (
  SELECT d.term, d.df, ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfreq d CROSS JOIN stats s
),
tscore AS (
  SELECT f.doc_id, f.term,
         i.idf * f.tf * ({_K1} + 1.0)
           / (f.tf + {_K1} * (1.0 - {_B} + {_B} * l.doc_len / s.avgdl)) AS term_score
  FROM tf f JOIN idf i ON f.term = i.term
  JOIN dl l ON f.doc_id = l.doc_id CROSS JOIN stats s
),
scored AS (
  SELECT q.query_id, t.doc_id, sum(q.qtf * t.term_score) AS score
  FROM tscore t JOIN qtf q ON t.term = q.term
  GROUP BY 1, 2
),
qnorm AS (
  SELECT q.query_id, sum(i.idf) AS qn
  FROM (SELECT DISTINCT query_id, term FROM qtok) q
  JOIN idf i ON q.term = i.term
  GROUP BY 1
),
nsc AS (
  SELECT s.query_id, s.doc_id,
         CASE WHEN n.qn > 0 THEN s.score / n.qn ELSE s.score END AS nscore
  FROM scored s LEFT JOIN qnorm n ON s.query_id = n.query_id
),
cand AS (
  SELECT * FROM (
    SELECT query_id, doc_id, nscore,
           row_number() OVER (PARTITION BY query_id
                ORDER BY round(nscore, 4) DESC, doc_id DESC) AS crank
    FROM nsc
  ) WHERE crank <= {CAND_QTY}
),
topdoc AS (SELECT * FROM cand WHERE crank <= {TOP_DOC_QTY}),
dnorm AS (SELECT query_id, sum(nscore) AS dn FROM topdoc GROUP BY 1),
relw AS (
  SELECT td.query_id, t.term,
         sum(td.nscore / greatest(dn.dn, 1e-9) * t.term_score) AS w
  FROM topdoc td
  JOIN tscore t ON td.doc_id = t.doc_id
  JOIN dnorm dn ON td.query_id = dn.query_id
  GROUP BY 1, 2
),
topterm AS (
  SELECT * FROM (
    SELECT query_id, term, w,
           row_number() OVER (PARTITION BY query_id
                ORDER BY round(w, 6) DESC, term ASC) AS trank
    FROM relw
  ) WHERE trank <= {TOP_TERM_QTY}
),
tnorm AS (SELECT query_id, sum(w) AS tn FROM topterm GROUP BY 1),
topterm_n AS (
  SELECT t.query_id, t.term, t.w / greatest(n.tn, 1e-9) AS tweight
  FROM topterm t JOIN tnorm n ON t.query_id = n.query_id
),
rm1 AS (
  SELECT c.query_id, c.doc_id, sum(tt.tweight) AS rm1
  FROM cand c
  JOIN (SELECT DISTINCT doc_id, term FROM tok) dt ON c.doc_id = dt.doc_id
  JOIN topterm_n tt ON tt.query_id = c.query_id AND tt.term = dt.term
  GROUP BY 1, 2
),
final AS (
  SELECT c.query_id, c.doc_id,
         {ORIG_WEIGHT} * c.nscore + (1.0 - {ORIG_WEIGHT}) * coalesce(r.rm1, 0.0) AS rm3_score
  FROM cand c LEFT JOIN rm1 r ON c.query_id = r.query_id AND c.doc_id = r.doc_id
),
topk AS (
  SELECT query_id, doc_id, round(rm3_score, 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY round(rm3_score, 4) DESC, doc_id DESC) AS INT) AS rank
  FROM final
)
SELECT query_id, doc_id, score_r, rank FROM topk WHERE rank <= {K}
"""

RM3_QUERIES_REG = {"rm3_rerank": q_rm3_rerank}
RM3_ORACLE_SQL = {"rm3_rerank": SQL_RM3_RERANK}
