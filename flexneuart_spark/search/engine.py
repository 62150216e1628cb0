"""Distributed BM25 top-k query engine over the sharded inverted index.

Spark restatement of the reference's batch retrieval path
(``apps/BaseQueryApp.java:653-741`` + ``LuceneCandidateProvider.java:103-178``;
SURVEY.md §3.2): the per-query thread pool becomes shard-parallel tasks;
the whole query batch is evaluated in ONE pass over the index.

Physical plan:
  1. queries tokenized driver-side (the reference also loads all queries
     into memory — ``BaseQueryApp.java:670``); per-query term slice of the
     dictionary collected + closed over (broadcast only the slice, never
     the dictionary — 10^12-file posture, SURVEY.md §7.4);
  2. ``postings.filter(term IN query_vocab)`` — partition keys + parquet
     row-group stats (postings are written sorted by term within shard)
     prune the scan to the query's posting rows only;
  3. ``groupBy(shard).applyInPandas`` → numpy MaxScore/block-max kernel
     with a bounded heap per (shard, query) → ≤ k rows per shard·query;
  4. label ordinals with doc_ids: broadcast-join the tiny result against
     the forward index projected to (shard, ord, doc_id);
  5. global top-k merge: window by query, (score desc, doc_id desc).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flexneuart_spark.config import BM25_B, BM25_K1
from flexneuart_spark.functions.tokenize import code_tokenize, whitespace_tokenize
from flexneuart_spark.index.builder import IndexTables
from flexneuart_spark.search.scoring import TermPostings, exhaustive_topk, maxscore_topk

_SCORED_SCHEMA = "shard int, query_id string, ord long, score double"


class Searcher:
    def __init__(
        self,
        spark: SparkSession,
        index: IndexTables | str,
        k1: float = BM25_K1,
        b: float = BM25_B,
        tokenizer: str = "code",
    ):
        self.spark = spark
        self.tables = IndexTables(index) if isinstance(index, str) else index
        self.k1, self.b = k1, b
        self.tokenize = code_tokenize if tokenizer == "code" else whitespace_tokenize
        self.n_docs, self.total_tokens, self.avgdl = self.tables.stats(spark)

    def search(self, queries: list[tuple[str, str]], k: int = 10, pruned: bool = True) -> DataFrame:
        """queries: [(query_id, text)]. Returns DataFrame
        (query_id, doc_id, score, rank) — the run, tie rule applied.

        Empty queries (after tokenization) return no rows, matching the
        reference's empty-query skip (LuceneCandidateProvider.java:125-126).
        """
        qtoks = {qid: self.tokenize(text) for qid, text in queries}
        qtf = {qid: dict(Counter(toks)) for qid, toks in qtoks.items() if toks}
        vocab = sorted({t for d in qtf.values() for t in d})
        if not vocab:
            return self._empty_run()

        # per-query dictionary slice (idf per term); OOV terms drop out here
        dic = (
            self.tables.dictionary(self.spark)
            .filter(F.col("term").isin(vocab))
            .select("term", "idf")
            .collect()
        )
        idf = {r.term: float(r.idf) for r in dic}
        live_vocab = [t for t in vocab if t in idf]
        if not live_vocab:
            return self._empty_run()

        k1, b, avgdl = self.k1, self.b, self.avgdl
        kernel = maxscore_topk if pruned else exhaustive_topk
        qweights = {
            qid: {t: c * idf[t] * (k1 + 1.0) for t, c in d.items() if t in idf}
            for qid, d in qtf.items()
        }
        qweights = {qid: d for qid, d in qweights.items() if d}

        def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            by_term = {}
            for row in pdf.itertuples(index=False):
                by_term[row.term] = row
            out_q, out_o, out_s = [], [], []
            for qid, wts in qweights.items():
                entries = []
                for t, w in wts.items():
                    r = by_term.get(t)
                    if r is None:
                        continue
                    entries.append(
                        TermPostings(
                            r.payload, r.block_off, r.block_n,
                            r.block_max_doc, r.block_max_tf, r.block_min_dl,
                            # weight folds qtf·idf·(k1+1); kernel multiplies tf_norm/(k1+1)
                            w,
                        )
                    )
                if not entries:
                    continue
                ords, scores = kernel(entries, k, avgdl, k1, b)
                out_q.extend([qid] * len(ords))
                out_o.extend(ords.tolist())
                out_s.extend(scores.tolist())
            return pd.DataFrame(
                {"shard": shard, "query_id": out_q, "ord": out_o, "score": out_s}
            )

        posts = self.tables.postings(self.spark).filter(F.col("term").isin(live_vocab))
        scored = posts.groupBy("shard").applyInPandas(score_shard, _SCORED_SCHEMA)

        fwd_ids = self.tables.fwd(self.spark).select("shard", "ord", "doc_id")
        labeled = fwd_ids.join(F.broadcast(scored), ["shard", "ord"], "inner")

        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
        return (
            labeled.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank")
        )

    def _empty_run(self) -> DataFrame:
        return self.spark.createDataFrame([], "query_id string, doc_id string, score double, rank int")
