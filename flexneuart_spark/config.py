"""Engine-wide constants.

These mirror the reference's observable defaults (citations into
/root/reference):

- BM25 k1/b defaults: ``simil_func/BM25SimilarityLucene.java:29-30``,
  ``flexneuart/ranker/bm25py.py:46``.
- IDF formula: ``simil_func/BM25SimilarityLucene.java:41-44``.
- Max doc size at ingest: ``flexneuart/config.py:42``.
- Doc-id field analogue (DOCNO): ``flexneuart/config.py:66``.
- Run tie-break (score desc, doc_id desc): ``flexneuart/io/runs.py:61-72``.
- Eval cutoffs: ``flexneuart/eval.py:45``.
"""

from __future__ import annotations

# BM25 defaults (reference: BM25SimilarityLucene.java:29-30)
BM25_K1 = 1.2
BM25_B = 0.75

# Ingest truncation (reference: flexneuart/config.py:42)
MAX_DOC_SIZE = 32768

# Passage truncation — one BERT input chunk (reference: flexneuart/config.py:43)
MAX_PASS_SIZE = 8192

# Posting-list block size (docs per compressed block). Lucene uses 128-doc
# blocks for its skip/impact data; we mirror that granularity.
POSTING_BLOCK = 128

# Default number of document shards for the distributed index. Each shard is
# a self-contained mini-index (all terms for a subset of docs) — this is the
# skew story: a head term's postings are automatically split across all
# shards (explicit salting by doc hash), and query-time top-k runs
# shard-parallel with a bounded heap per shard.
# Over-decompose relative to cores (~4x): shard→partition assignment is
# hash-based, so many small shards smooth the per-partition load (no
# straggler task owning 2-3 whole shards) — the standard tasks≫slots rule.
DEFAULT_NUM_SHARDS = 128

# Eval cutoffs mimicking trec_eval (reference: flexneuart/eval.py:45)
EVAL_CUTOFFS = (5, 10, 15, 20, 30, 100, 200, 500, 1000)

# Column names (engine-wide schema contract)
DOC_ID = "doc_id"          # analogue of DOCNO (flexneuart/config.py:66)
QUERY_ID = "query_id"
SCORE = "score"
TERM = "term"
TERM_ID = "term_id"

# TREC run id default (flexneuart/io/runs.py FAKE_RUN_ID analogue)
DEFAULT_RUN_ID = "fake_run"
