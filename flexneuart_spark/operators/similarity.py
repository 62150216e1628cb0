"""Similarity search over embedding columns (array<float>).

The reference exports dense vectors to NMSLIB for kNN
(``apps/ExportToNMSLIBDenseSparseFusion.java``; distances in
``simil_func/DistanceFunctions.java:43-604``); here the kNN itself is a
Spark plan:

- ``cosine_topk`` — brute-force exact top-k: broadcast the query vectors,
  JVM-side dot products via ``zip_with``/``aggregate`` (no Python in the
  hot path), per-query window top-k. The baseline and the oracle.
- ``lsh_buckets`` / ``lsh_ann_topk`` — sign-bucket LSH: bucket key from
  the signs of ``nbits`` fixed coordinates (axis-aligned hyperplanes —
  deterministic and SQL-checkable; swap in a seeded random projection
  matrix via a pandas UDF for production recall). Candidates are searched
  only within the query's bucket: the 100 TB path (bucket count scales
  the candidate set down ~2^nbits).
- ``ivf_topk`` — IVF-style coarse quantization: the first ``n_cells``
  vectors act as centroids (deterministic); every vector is assigned to
  its nearest centroid (broadcast centroid join); queries probe their own
  cell only (nprobe=1). Exact within the probed cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(col: str):
    return F.sqrt(F.aggregate(F.col(col), F.lit(0.0), lambda a, x: a + x * x))


def cosine_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k neighbours for the given query ids
    (self excluded). Returns (query_vec_id, vec_id, cos_r, rank)."""
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn("nrm", _norm("v"))
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_vec_id"))
        .withColumn("cos_r", F.round(_dot("v", "qv") / (F.col("nrm") * F.col("qn")), 6))
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos_r"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", F.col(id_col).alias("vec_id"), "cos_r", "rank")
    )


def lsh_buckets(emb: DataFrame, nbits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket per vector: '1'/'0' per coordinate 1..nbits."""
    v = _as_double(vec_col)
    key = F.concat_ws(
        "",
        F.transform(F.slice(v, 1, nbits), lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))),
    )
    return emb.select(F.col(id_col), F.col(vec_col), key.alias("bucket"))


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket."""
    b = lsh_buckets(emb, nbits, id_col, vec_col)
    e = b.select(F.col(id_col), "bucket", _as_double(vec_col).alias("v")).withColumn("nrm", _norm("v"))
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), F.col("bucket"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col("query_vec_id"))
        .withColumn("cos_r", F.round(_dot("v", "qv") / (F.col("nrm") * F.col("qn")), 6))
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos_r"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", F.col(id_col).alias("vec_id"), "cos_r", "rank")
    )


def ivf_assign(
    emb: DataFrame, n_cells: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest of the first ``n_cells`` vectors
    (deterministic centroids), by cosine. Returns (id, cell)."""
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn("nrm", _norm("v"))
    cents = e.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "cos", _dot("v", "cv") / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("cell"))
    return (
        scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1).select(id_col, "cell")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF nprobe=1: exact cosine among vectors sharing the query's cell."""
    assign = ivf_assign(emb, n_cells, id_col, vec_col)
    e = (
        emb.join(assign, id_col)
        .select(F.col(id_col), "cell", _as_double(vec_col).alias("v"))
        .withColumn("nrm", _norm("v"))
    )
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), "cell", F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        e.join(F.broadcast(q), "cell")
        .filter(F.col(id_col) != F.col("query_vec_id"))
        .withColumn("cos_r", F.round(_dot("v", "qv") / (F.col("nrm") * F.col("qn")), 6))
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos_r"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", F.col(id_col).alias("vec_id"), "cos_r", "rank")
    )
