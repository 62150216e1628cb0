"""Distributed inverted-index builder (Spark-first restatement of
``LuceneIndexer.createLuceneIndex`` + ``ForwardIndex.createIndex`` —
reference ``apps/LuceneIndexer.java:143-237``,
``fwdindx/ForwardIndex.java:822-925``; SURVEY.md §3.1).

Architecture (designed for 10^12-file corpora on a 1000-executor cluster):

- **Document-sharded index.** ``shard = pmod(xxhash64(doc_id), num_shards)``.
  Each shard is a self-contained mini-index (all terms for its doc subset).
  This realizes the north rule's *explicit salting of skewed head terms*:
  a term with df = 10^9 is automatically split into ``num_shards``
  independent posting lists keyed (shard, term) — no single reducer ever
  sees a whole head term. Query-time top-k then runs shard-parallel with a
  bounded heap per shard and a tiny global merge (SURVEY.md §2.6 K1).
- **Stage 1 — forward index** (reference §1.3): one tokenize pass
  (vectorized Arrow/pandas UDF), per-doc sorted unique (terms, tfs) +
  doc_len (TreeMap semantics, ``ForwardIndex.java:550-584``), per-shard
  dense doc ordinals (row_number by doc_id within shard), sha256(content)
  per-row invariant. Written once, partitioned by shard; stage 2 reads it
  back instead of re-tokenizing.
- **Stage 2 — inverted index**: explode fwd → (shard, term, ord, tf, dl),
  ``groupBy(shard, term)`` (map-side partial aggregation; the shard key
  bounds every group by the shard size), sort postings by ordinal, encode
  delta-gap varint blocks + block-max metadata (codec.py).
- **Finalize** (idempotent, recomputed from all shards every build):
  global dictionary term→(term_id, df, idf) — the "merge partition-local
  indexes into a global index" step; the only shuffle is (shard, term) →
  term with ≤ num_shards rows per term — plus corpus stats
  (docQty/totalWordQty/avgDocLen, ``ForwardIndex.java:350-353``).
- **Lineage / checkpoint-resume**: one lineage row per completed shard
  (counts, checksum, duration). A resumed build skips completed shards,
  rewrites only missing ones (dynamic partition overwrite → idempotent),
  and re-runs finalize, so df/avgdl are never double-counted.

Word-id assignment: dense ids in ascending term order starting at 1
(MIN_WORD_ID parity, ``ForwardIndex.java:111,880-887``; first-encounter
order is irreproducible in a parallel build — SURVEY.md §2.4 A4 — and ids
are join-key surrogates only, BM25 depends only on df/tf/len). Assignment
is scalable: range-partition by term + per-partition offsets, no global
single-partition window.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flexneuart_spark.config import DEFAULT_NUM_SHARDS, MAX_DOC_SIZE
from flexneuart_spark.functions.tokenize import code_tokenize_pandas
from flexneuart_spark.index.codec import encode_postings

_BOW_FIELDS = [
    T.StructField("terms", T.ArrayType(T.StringType())),
    T.StructField("tfs", T.ArrayType(T.LongType())),
    T.StructField("doc_len", T.LongType()),
]
_BOW_SCHEMA = T.StructType(_BOW_FIELDS)
# positional variant (parsedText / mWordIdSeq mode, ForwardIndex.java:102-108)
_BOW_SEQ_SCHEMA = T.StructType(_BOW_FIELDS + [T.StructField("term_seq", T.ArrayType(T.StringType()))])

_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("df_shard", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("block_off", T.ArrayType(T.LongType())),
        T.StructField("block_n", T.ArrayType(T.IntegerType())),
        T.StructField("block_max_doc", T.ArrayType(T.LongType())),
        T.StructField("block_max_tf", T.ArrayType(T.LongType())),
        T.StructField("block_min_dl", T.ArrayType(T.LongType())),
    ]
)


def _make_bow_udf(tokenizer: str, with_seq: bool = False):
    """Tokenize + per-doc BOW in one Arrow batch (SURVEY.md §2.4 A1).

    Sorted-unique terms mirror the reference's TreeMap build
    (``ForwardIndex.java:550-584``). Empty content → empty arrays, doc
    kept (``LuceneIndexer.java:206-214``). ``with_seq`` additionally
    emits the raw token sequence (positional mode)."""

    schema = _BOW_SEQ_SCHEMA if with_seq else _BOW_SCHEMA

    @F.pandas_udf(schema)
    def doc_bow(content: pd.Series) -> pd.DataFrame:
        if tokenizer == "code":
            tok = code_tokenize_pandas(content)
        else:  # whitespace (T9): split on \s+, drop empties
            tok = content.fillna("").str.split(r"\s+", regex=True).map(
                lambda xs: [t for t in xs if t] if xs is not None else []
            )
        terms_out, tfs_out, len_out = [], [], []
        for lst in tok:
            if not lst:
                terms_out.append([])
                tfs_out.append([])
                len_out.append(0)
                continue
            u, c = np.unique(np.asarray(lst, dtype=object), return_counts=True)
            terms_out.append(u.tolist())
            tfs_out.append(c.tolist())
            len_out.append(int(c.sum()))
        out = {"terms": terms_out, "tfs": tfs_out, "doc_len": len_out}
        if with_seq:
            out["term_seq"] = [lst if lst else [] for lst in tok]
        return pd.DataFrame(out)

    return doc_bow


def _shard_postings_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Build ALL posting lists of one shard in a single vectorized pass
    (applyInPandas over groupBy(shard)).

    This replaces the naive explode → groupBy(shard, term) →
    sort_array(collect_list(...)) plan: the JVM would shuffle one row per
    posting (~doc_len × docs rows); here the only shuffle is the compact
    forward index (arrays per doc) and the explosion happens in numpy.
    Per-term loop is over the shard's vocabulary only; everything else is
    np.repeat / np.lexsort / vectorized varint.
    """
    if len(pdf) == 0:
        return pd.DataFrame({f.name: [] for f in _POSTINGS_SCHEMA.fields})
    shard = int(pdf["shard"].iloc[0])
    reps = np.fromiter((len(t) for t in pdf["terms"]), dtype=np.int64, count=len(pdf))
    nz = reps > 0
    if not nz.any():
        return pd.DataFrame({f.name: [] for f in _POSTINGS_SCHEMA.fields})
    all_terms = np.concatenate([np.asarray(t, dtype=object) for t in pdf["terms"][nz]])
    all_tfs = np.concatenate([np.asarray(t, dtype=np.int64) for t in pdf["tfs"][nz]])
    all_ords = np.repeat(pdf["ord"].to_numpy(np.int64), reps)
    all_dls = np.repeat(pdf["doc_len"].to_numpy(np.int64), reps)
    order = np.lexsort((all_ords, all_terms))
    all_terms, all_tfs = all_terms[order], all_tfs[order]
    all_ords, all_dls = all_ords[order], all_dls[order]
    uniq, starts = np.unique(all_terms, return_index=True)
    bounds = np.append(starts, len(all_terms))
    rows = {f.name: [] for f in _POSTINGS_SCHEMA.fields}
    for i, term in enumerate(uniq):
        s, e = bounds[i], bounds[i + 1]
        enc = encode_postings(all_ords[s:e], all_tfs[s:e], all_dls[s:e])
        rows["shard"].append(shard)
        rows["term"].append(term)
        rows["df_shard"].append(enc["df"])
        rows["payload"].append(enc["payload"])
        rows["block_off"].append(enc["block_off"])
        rows["block_n"].append(enc["block_n"])
        rows["block_max_doc"].append(enc["block_max_doc"])
        rows["block_max_tf"].append(enc["block_max_tf"])
        rows["block_min_dl"].append(enc["block_min_dl"])
    return pd.DataFrame(rows)


@dataclass
class IndexTables:
    """Handles to the index's storage layout (Parquet; Iceberg-shaped —
    swap the reader/writer for ``format("iceberg")`` when the runtime has
    the Iceberg jars; see store.py)."""

    index_dir: str

    @property
    def fwd_dir(self) -> str:
        return f"{self.index_dir}/fwd"

    @property
    def postings_dir(self) -> str:
        return f"{self.index_dir}/postings"

    @property
    def dictionary_dir(self) -> str:
        return f"{self.index_dir}/dictionary"

    @property
    def corpus_stats_dir(self) -> str:
        return f"{self.index_dir}/corpus_stats"

    @property
    def lineage_dir(self) -> str:
        return f"{self.index_dir}/lineage"

    def fwd(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.fwd_dir)

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.postings_dir)

    def dictionary(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.dictionary_dir)

    def corpus_stats(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.corpus_stats_dir)

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.lineage_dir)

    def stats(self, spark: SparkSession) -> tuple[int, int, float]:
        row = self.corpus_stats(spark).collect()[0]
        return int(row.n_docs), int(row.total_tokens), float(row.avg_doc_len)


def derive_doc_id(df: DataFrame) -> DataFrame:
    """DOCNO analogue: ``repo:path@commit`` (FIXTURES.md §1), or an
    existing ``doc_id`` column cast to string."""
    if "doc_id" in df.columns:
        return df.withColumn("doc_id", F.col("doc_id").cast("string"))
    return df.withColumn(
        "doc_id", F.concat_ws("", F.col("repo"), F.lit(":"), F.col("path"), F.lit("@"), F.col("commit"))
    )


def assign_dense_ids(df: DataFrame, order_col: str, id_col: str, num_parts: int = 32) -> DataFrame:
    """Dense 1-based ids in ascending ``order_col`` order, scalably:
    range-partition, count per partition (tiny collect), per-partition
    row_number + offset. No single-partition global window."""
    spark = df.sparkSession
    t = (
        df.repartitionByRange(num_parts, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in t.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(pd.DataFrame(offsets, columns=["_pid", "_off"]))
    w = Window.partitionBy("_pid").orderBy(order_col)
    out = (
        t.withColumn("_local", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )
    # NOTE: `t` stays persisted until the caller's terminal write — the
    # window + join re-read it, and _pid must not be recomputed under a
    # different partitioning. Footprint is one row per distinct term.
    return out


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    num_shards: int = DEFAULT_NUM_SHARDS,
    tokenizer: str = "code",
    text_col: str = "content",
    resume: bool = False,
    only_shards: list[int] | None = None,
    max_doc_size: int = MAX_DOC_SIZE,
    store_positions: bool = False,
) -> IndexTables:
    """Build (or resume) the index. ``only_shards`` restricts the build to
    a shard subset (simulates an interrupted build in tests); ``resume``
    skips shards already recorded in the lineage table."""
    tables = IndexTables(index_dir)
    build_id = uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    docs = derive_doc_id(corpus)
    docs = docs.withColumn("shard", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_shards)).cast("int"))

    done: set[int] = set()
    if resume:
        try:
            done = {int(r.shard) for r in tables.lineage(spark).select("shard").distinct().collect()}
        except Exception:
            done = set()
    todo = [s for s in range(num_shards) if s not in done]
    if only_shards is not None:
        todo = [s for s in todo if s in only_shards]
    if not todo:
        _finalize(spark, tables)
        return tables
    if len(todo) < num_shards:
        docs = docs.filter(F.col("shard").isin(todo))

    t0 = time.time()

    # ---- Stage 1: forward index (tokenize once; A1 BOW; per-shard ordinals)
    # Repartition by shard BEFORE the tokenize UDF: decouples CPU
    # parallelism from the input file layout (a single giant input file
    # must not serialize tokenization) and pre-aligns with the per-shard
    # ordinal window so no second exchange is needed.
    bow = _make_bow_udf(tokenizer, with_seq=store_positions)
    docs = docs.repartition(num_shards, "shard")
    fwd_cols = [
        "shard",
        "doc_id",
        F.col("_bow.terms").alias("terms"),
        F.col("_bow.tfs").alias("tfs"),
        F.col("_bow.doc_len").alias("doc_len"),
        "content_sha256",
    ]
    if store_positions:
        fwd_cols.append(F.col("_bow.term_seq").alias("term_seq"))
    fwd = (
        docs.withColumn("_bow", bow(F.substring(F.col(text_col), 1, max_doc_size)))
        .withColumn("content_sha256", F.sha2(F.col(text_col), 256))
        .select(*fwd_cols)
        .withColumn(
            "ord",
            F.row_number().over(Window.partitionBy("shard").orderBy("doc_id")).cast("long") - 1,
        )
    )
    # NOTE (measured): caching fwd across stages (persist MEMORY_AND_DISK)
    # was tried and is SLOWER here — deserialized block cache + spill
    # doubles memory churn. The columnar snappy round-trip through the fwd
    # parquet wins; stage 2 re-reads only (shard, ord, doc_len, terms, tfs).
    (
        fwd.sortWithinPartitions("shard", "ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(tables.fwd_dir)
    )

    # ---- Stage 2: inverted postings, one vectorized pass per shard
    fwd_r = spark.read.parquet(tables.fwd_dir).filter(F.col("shard").isin(todo))
    plist = fwd_r.select("shard", "ord", "doc_len", "terms", "tfs").groupBy("shard").applyInPandas(
        _shard_postings_kernel, _POSTINGS_SCHEMA
    )
    (
        plist.sortWithinPartitions("shard", "term")  # row-group stats → term pushdown at query time
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(tables.postings_dir)
    )

    # ---- Lineage: one row per completed shard (checkpoint-resume unit)
    duration = time.time() - t0
    lineage = (
        spark.read.parquet(tables.fwd_dir)
        .filter(F.col("shard").isin(todo))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_len").alias("total_tokens"),
            F.sum(F.crc32(F.col("content_sha256"))).alias("checksum"),
        )
        .withColumn("build_id", F.lit(build_id))
        .withColumn("duration_sec", F.lit(float(duration)))
    )
    # replace-by-shard semantics: a rebuilt shard's old lineage row must
    # not survive (stats are derived from lineage — no double counting).
    # The table is tiny (one row per shard) so collect+rewrite is safe.
    try:
        old = tables.lineage(spark).filter(~F.col("shard").isin(todo)).toPandas()
    except Exception:
        old = None
    new = lineage.toPandas()
    merged = pd.concat([old, new], ignore_index=True) if old is not None and len(old) else new
    spark.createDataFrame(merged).coalesce(1).write.mode("overwrite").parquet(tables.lineage_dir)

    _finalize(spark, tables)
    return tables


# Vocabularies up to this size take the collect→pandas finalize fast path
# (3 Spark jobs fewer); larger ones use the fully-distributed id assignment.
_SMALL_VOCAB = 2_000_000


def _finalize(spark: SparkSession, tables: IndexTables) -> None:
    """Idempotent global merge: dictionary (term_id, df, idf) + corpus
    stats, recomputed from ALL shards — resume-safe (no double counting).

    Corpus stats come from the lineage table (one row per completed
    shard — exact, and avoids a full forward-index scan)."""
    import math

    lin = spark.read.parquet(tables.lineage_dir).select("n_docs", "total_tokens").toPandas()
    n_docs = int(lin["n_docs"].sum())
    total_tokens = int(lin["total_tokens"].sum())
    avgdl = (total_tokens / n_docs) if n_docs else 1.0
    stats_pdf = pd.DataFrame(
        {"n_docs": [n_docs], "total_tokens": [total_tokens], "avg_doc_len": [float(avgdl)]}
    )
    spark.createDataFrame(stats_pdf).coalesce(1).write.mode("overwrite").parquet(tables.corpus_stats_dir)

    posts = spark.read.parquet(tables.postings_dir)
    # global df merge: ≤ num_shards rows per term — skew-free by construction
    dic = posts.groupBy("term").agg(F.sum("df_shard").alias("df"))
    head = dic.limit(_SMALL_VOCAB + 1).toPandas()
    if len(head) == 0:
        spark.createDataFrame([], "term string, term_id long, df long, idf double").coalesce(
            1
        ).write.mode("overwrite").parquet(tables.dictionary_dir)
        return
    if len(head) <= _SMALL_VOCAB:
        # fast path: sort + dense ids + idf in pandas, one small write
        head = head.sort_values("term", kind="mergesort").reset_index(drop=True)
        head["term_id"] = np.arange(1, len(head) + 1, dtype=np.int64)
        dfv = head["df"].to_numpy(np.float64)
        head["idf"] = np.log(1.0 + (float(n_docs) - dfv + 0.5) / (dfv + 0.5))
        out = spark.createDataFrame(head[["term", "term_id", "df", "idf"]])
        out.coalesce(1).write.mode("overwrite").parquet(tables.dictionary_dir)
        return
    dic = assign_dense_ids(dic, "term", "term_id")
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (BM25SimilarityLucene.java:41-44)
    dic = dic.withColumn(
        "idf",
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))),
    ).select("term", "term_id", "df", "idf")
    dic.write.mode("overwrite").parquet(tables.dictionary_dir)
