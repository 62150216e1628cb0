"""Term-vector providers for the neural matching heads.

Two providers, both Spark-first:

1. **Hash embeddings** (``HASH_DIM``-dim, deterministic): component ``j``
   of term ``t`` is byte ``j`` of ``md5(t)`` mapped to ``[-1, 1]``, then
   L2-normalized. Computable identically in three engines — a Spark
   ``Column`` (pure JVM codegen: ``md5``/``substring``/``conv``), a numpy
   twin for Arrow-batched kernels, and a DuckDB SQL fragment for the
   driver oracles — so every neural entry gets a full cross-engine
   value-hash gate, the same discipline as the simhash/PQ oracles
   (``plans/entries_ops.py``). Hash vectors carry no semantics (random
   directions), which is exactly what the *matching-head* math needs for
   correctness gates: exact-match cosine is 1.0, non-match cosine is a
   deterministic pseudo-random value.

2. **Trained embeddings** (PPMI + random projection): corpus
   co-occurrence counts are a distributed Spark aggregation
   (vocab-capped), and the dimensionality reduction is a single
   distributed matmul against a seeded gaussian ``Ω`` — each term's
   vector is the Johnson-Lindenstrauss projection of its PPMI row, so
   row cosines approximate PPMI-row cosines at ``dim ~ O(log V)``. The
   driver never holds the ``V×V`` PPMI matrix (only the ``V×dim``
   sketch), so the method survives web-scale vocabularies.

Reference context: the neural models consume externally-trained
transformer term vectors (``flexneuart/models/utils.py``,
``models/cedr/*``); this engine substitutes deterministic/corpus-trained
vectors so the heads are testable without external weights.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_DIM = 8  # md5 yields 16 bytes; 8 keeps the SQL oracle compact


# ---------------------------------------------------------------------------
# Hash embeddings — Spark Column form (JVM-only, whole-stage codegen)
# ---------------------------------------------------------------------------

def _raw_components(c: Column) -> list[Column]:
    md5 = F.md5(c.cast("string"))
    return [
        F.conv(F.substring(md5, 1 + 2 * j, 2), 16, 10).cast("double") / 127.5 - 1.0
        for j in range(HASH_DIM)
    ]


def hash_embedding_col(col: Column | str) -> Column:
    """``array<double>`` hash embedding of a term column, L2-normalized.

    Norm is computed over the fixed left-to-right component order so the
    double-precision result is bit-identical to the numpy and DuckDB
    twins (all three sum 8 doubles in index order).
    """
    c = F.col(col) if isinstance(col, str) else col
    comps = _raw_components(c)
    sq = comps[0] * comps[0]
    for x in comps[1:]:
        sq = sq + x * x
    norm = F.sqrt(sq)
    return F.array(*[x / norm for x in comps])


def hash_dot_col(a: Column, b: Column) -> Column:
    """Cosine of two unit hash-embedding arrays: plain index-ordered dot."""
    d = F.element_at(a, 1) * F.element_at(b, 1)
    for j in range(2, HASH_DIM + 1):
        d = d + F.element_at(a, j) * F.element_at(b, j)
    return d


# ---------------------------------------------------------------------------
# Hash embeddings — numpy twin (Arrow kernels)
# ---------------------------------------------------------------------------

def hash_embedding_np(terms) -> np.ndarray:
    """(n, HASH_DIM) float64 unit vectors; bit-identical to the Column form."""
    out = np.empty((len(terms), HASH_DIM), dtype=np.float64)
    for i, t in enumerate(terms):
        dig = hashlib.md5(str(t).encode("utf-8")).digest()
        for j in range(HASH_DIM):
            out[i, j] = dig[j] / 127.5 - 1.0
    # index-ordered sum of squares (matches the Column/SQL association order)
    sq = np.zeros(len(terms), dtype=np.float64)
    for j in range(HASH_DIM):
        sq += out[:, j] * out[:, j]
    return out / np.sqrt(sq)[:, None]


# ---------------------------------------------------------------------------
# Hash embeddings — DuckDB SQL fragment (oracle side)
# ---------------------------------------------------------------------------

def sql_embedding_cte(source_cte: str, term_col: str = "term") -> str:
    """Columns e0..e{d-1}: the same md5-byte embedding, for the oracle.

    Hex pairs decode via the ``instr('0123456789abcdef', …)`` trick the
    simhash oracle already uses (DuckDB md5() returns lowercase hex).
    """
    comps = []
    for j in range(HASH_DIM):
        hi, lo = 1 + 2 * j, 2 + 2 * j
        comps.append(
            f"(((instr('0123456789abcdef', substr(md5({term_col}), {hi}, 1)) - 1) * 16"
            f" + instr('0123456789abcdef', substr(md5({term_col}), {lo}, 1)) - 1)"
            f" / 127.5 - 1.0)"
        )
    raw = ", ".join(f"{c} AS r{j}" for j, c in enumerate(comps))
    sq = " + ".join(f"r{j} * r{j}" for j in range(HASH_DIM))
    unit = ", ".join(f"r{j} / sqrt({sq}) AS e{j}" for j in range(HASH_DIM))
    return (
        f"(SELECT {term_col}, {unit} FROM "
        f"(SELECT {term_col}, {raw} FROM {source_cte}))"
    )


def sql_dot(a: str, b: str) -> str:
    """Index-ordered dot product of two e0..e{d-1} CTE aliases."""
    return " + ".join(f"{a}.e{j} * {b}.e{j}" for j in range(HASH_DIM))


# ---------------------------------------------------------------------------
# Trained embeddings — PPMI + randomized projection (scale path)
# ---------------------------------------------------------------------------

def train_embeddings(
    docs_tok: DataFrame,
    dim: int = 32,
    window: int = 4,
    vocab_size: int = 20000,
    min_count: int = 2,
    seed: int = 42,
) -> pd.DataFrame:
    """Corpus-trained term vectors: windowed co-occurrence → PPMI →
    seeded JL random projection → row-normalize.

    Distributed parts (corpus-sized): token position pairs within
    ``window`` via a self-join on (doc_id, position bucket), one groupBy
    for counts. Driver parts (vocab-bounded): the ``V×dim`` sketch —
    the full ``V×V`` PPMI matrix is NEVER materialized anywhere; each
    PPMI entry is formed inside the distributed matmul aggregation.

    Returns a pandas DataFrame (term, vector) — vocab-capped, i.e.
    broadcast-sized by construction.
    """
    spark = docs_tok.sparkSession

    pos = docs_tok.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )

    # vocab cap: top-V by corpus frequency (deterministic tie rule)
    vocab = (
        pos.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(vocab_size)
    )
    vterms = [r.term for r in vocab.collect()]
    tid = {t: i for i, t in enumerate(vterms)}
    V = len(vterms)
    if V == 0:
        return pd.DataFrame({"term": [], "vector": []})

    vocab_df = F.broadcast(
        spark.createDataFrame([(t, i) for t, i in tid.items()], ["term", "tid"])
    )
    pos_v = pos.join(vocab_df, "term").select("doc_id", "pos", "tid")

    # co-occurrence within |i-j| <= window, i != j: band self-join on
    # coarse position buckets (each pair lands in the left token's bucket
    # or its successor) — avoids the O(len^2) per-doc blowup
    b = window + 1
    left = pos_v.select(
        "doc_id", F.col("pos").alias("pi"), F.col("tid").alias("a"),
        F.floor(F.col("pos") / b).alias("bk"),
    )
    right = pos_v.select(
        "doc_id", F.col("pos").alias("pj"), F.col("tid").alias("bt"),
        F.explode(
            F.array(F.floor(F.col("pos") / b), F.floor(F.col("pos") / b) - 1)
        ).alias("bk"),
    )
    cooc = (
        left.join(right, ["doc_id", "bk"])
        .filter(
            (F.col("pj") > F.col("pi")) & (F.col("pj") - F.col("pi") <= window)
        )
        .groupBy("a", "bt")
        .agg(F.count("*").alias("c"))
    )
    # symmetrize
    cooc = (
        cooc.select("a", "bt", "c")
        .union(cooc.select(F.col("bt").alias("a"), F.col("a").alias("bt"), "c"))
        .groupBy("a", "bt")
        .agg(F.sum("c").alias("c"))
    )

    marg = cooc.groupBy("a").agg(F.sum("c").alias("ca"))
    total_row = cooc.agg(F.sum("c").alias("ct")).collect()[0]
    total = float(total_row.ct or 0)
    if total == 0:
        return pd.DataFrame({"term": vterms, "vector": [np.zeros(dim).tolist()] * V})

    # seeded gaussian Omega (V x dim) — broadcast, then one distributed
    # matmul: sketch[a, :] = sum_b PPMI(a,b) * Omega[b, :]
    rng = np.random.default_rng(seed)
    omega = rng.standard_normal((V, dim))
    omega_b = spark.sparkContext.broadcast(omega)

    ppmi = (
        cooc.join(marg, "a")
        .join(
            marg.select(F.col("a").alias("bt"), F.col("ca").alias("cb")), "bt"
        )
        .select(
            "a",
            "bt",
            F.greatest(
                F.lit(0.0),
                F.log(F.col("c") * F.lit(total) / (F.col("ca") * F.col("cb"))),
            ).alias("w"),
        )
        .filter(F.col("w") > 0)
    )

    def _proj(pdf_iter):
        for pdf in pdf_iter:
            om = omega_b.value
            contrib = pdf["w"].to_numpy()[:, None] * om[pdf["bt"].to_numpy()]
            out = pd.DataFrame(contrib, columns=[str(j) for j in range(om.shape[1])])
            out.insert(0, "a", pdf["a"].to_numpy())
            agg = out.groupby("a", as_index=False).sum()
            yield agg

    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("a", T.LongType())]
        + [T.StructField(str(j), T.DoubleType()) for j in range(dim)]
    )
    sketch_df = ppmi.select(
        F.col("a").cast("long"), F.col("bt").cast("long"), "w"
    ).mapInPandas(_proj, schema=schema)
    sketch_pdf = sketch_df.groupBy("a").agg(
        *[F.sum(str(j)).alias(str(j)) for j in range(dim)]
    ).toPandas()

    sketch = np.zeros((V, dim))
    idx = sketch_pdf["a"].to_numpy().astype(int)
    sketch[idx] = sketch_pdf[[str(j) for j in range(dim)]].to_numpy()

    # row-normalize the V x dim sketch: each row is the JL random
    # projection of that term's PPMI row, so row cosines approximate the
    # PPMI-row cosines (Johnson-Lindenstrauss; dim ~ O(log V) suffices).
    # NO QR/orthonormalization — mixing columns by a non-orthogonal R^-1
    # would distort exactly the row geometry we need.
    norms = np.linalg.norm(sketch, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    q = sketch / norms
    return pd.DataFrame({"term": vterms, "vector": [row.tolist() for row in q]})
