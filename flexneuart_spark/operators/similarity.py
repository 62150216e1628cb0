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
  deterministic and SQL-checkable). Candidates are searched only within
  the query's bucket: the 100 TB path (bucket count scales the candidate
  set down ~2^nbits).
- ``rp_signature`` / ``rp_ann_topk`` — the production-recall variant:
  signs of a SEEDED random Gaussian projection (SRP-LSH, Charikar 2002),
  computed by an Arrow-batched pandas UDF (one BLAS matmul per batch).
  Not SQL-expressible (seeded matrix), so verified by a recall@k-vs-
  brute-force pytest instead of a DuckDB oracle.
- ``ivf_topk`` — IVF-style coarse quantization: centroids are the
  ``n_cells`` vectors with the smallest md5(id) (deterministic, valid for
  string ids); every vector is assigned to its nearest centroid
  (broadcast centroid join); queries probe their ``nprobe`` nearest
  cells. Exact within the probed cells.
- ``pq_train`` / ``pq_encode`` / ``pq_topk`` — product quantization
  (Jégou et al. 2011): per-subspace codebooks, 8·m bits per vector,
  asymmetric-distance (ADC) scoring through per-query LUTs.
- ``ivfpq_topk`` / ``ivfpq_build`` / ``ivfpq_search`` — IVFADC, the
  composition: PQ over the residual x − c(x) inside coarse cells; the
  persisted form stores a cell-partitioned codes table (probe-time
  partition pruning) — the billion-vector layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(col: str):
    return F.sqrt(F.aggregate(F.col(col), F.lit(0.0), lambda a, x: a + x * x))


def _materialize_small(df: DataFrame) -> DataFrame:
    """Collect a broadcast-sized frame (centroids: n_cells rows;
    codebooks: m·n_codes rows) and re-create it as a local DataFrame.
    This CUTS the lineage: a trained codebook otherwise re-runs its
    whole (iterative) training job for every downstream consumer —
    encode, query LUT, centroid⊙codeword table — and per Lloyd round.
    Values are deterministic (md5 seeds + 6dp rounding), so this is a
    pure plan optimization with identical results."""
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


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
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket.

    ``multi_probe=True`` additionally probes every Hamming-distance-1
    bucket (flip each signature bit once — the standard multi-probe LSH
    recall boost: nbits+1 buckets searched instead of 2× the hash count;
    Lv et al., VLDB 2007). Database vectors live in exactly one bucket,
    so probes never produce duplicate candidates."""
    b = lsh_buckets(emb, nbits, id_col, vec_col)
    e = b.select(F.col(id_col), "bucket", _as_double(vec_col).alias("v")).withColumn("nrm", _norm("v"))
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), F.col("bucket"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    if multi_probe:
        flipped = F.concat(
            F.substring("bucket", 1, F.col("j") - F.lit(1)),
            F.when(F.substring("bucket", F.col("j"), 1) == "1", F.lit("0")).otherwise(F.lit("1")),
            F.substring("bucket", F.col("j") + F.lit(1), F.lit(nbits)),
        )
        probes = q.select(
            "query_vec_id", "qv", "qn",
            F.explode(F.sequence(F.lit(1), F.lit(nbits))).alias("j"),
            "bucket",
        ).select("query_vec_id", "qv", "qn", flipped.alias("bucket"))
        q = q.unionByName(probes)
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


def rp_signature(
    emb: DataFrame,
    nbits: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection signature (SRP-LSH): bucket = signs of
    ``R @ v`` where R is a dim×nbits standard Gaussian drawn from a seeded
    generator — every executor derives the identical R, so the operator is
    deterministic with no broadcast needed. One Arrow batch = one BLAS
    matmul; no per-row Python. Hyperplanes are isotropic, so P(bit match)
    = 1 − θ/π holds for ANY input distribution — unlike the axis-aligned
    ``lsh_buckets``, which degrades when coordinates are correlated."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        rng = np.random.default_rng(seed)
        proj = rng.standard_normal((mat.shape[1], nbits))
        bits = (mat @ proj) >= 0.0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    return emb.select(F.col(id_col), F.col(vec_col), _sig(F.col(vec_col)).alias("bucket"))


def rp_ann_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    nbits: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's SRP-LSH bucket
    (random-projection signs — the production-recall scale path)."""
    b = rp_signature(emb, nbits, seed, id_col, vec_col)
    e = b.select(F.col(id_col), "bucket", _as_double(vec_col).alias("v")).withColumn(
        "nrm", _norm("v")
    )
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


def ivf_centroids(
    emb: DataFrame, n_cells: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid pick valid for ANY id type: the ``n_cells``
    vectors with the smallest md5(id) (a uniform pseudo-random sample with
    an exact SQL twin). Executes as TakeOrderedAndProject — a bounded
    top-n, not a global sort. Returns (cell, cv, cn) where ``cell`` is the
    centroid's own id."""
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn("nrm", _norm("v"))
    hk = F.md5(F.col(id_col).cast("string"))
    return (
        e.withColumn("hk", hk)
        .orderBy("hk", id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col("v").alias("cv"), F.col("nrm").alias("cn"))
    )


def _probe_cells_udf(cents_rows: list, nprobe: int = 1):
    """Arrow-batched nearest-cells assignment: the centroids (n_cells
    rows — driver-sized by contract) ship in the UDF closure as one
    numpy matrix; each batch is ONE BLAS matmul. This replaces the
    crossJoin + corpus-wide row_number window, whose N·n_cells-row
    shuffle partitioned by id was the dominant data movement of every
    IVF-family operator at scale — and at a realistic cell count
    (IVF wants ~√N cells) the matmul also beats any per-row expression
    form on CPU. Ordering matches the window's (cos desc, cell asc)
    tie rule: centroid rows are pre-sorted by cell and a STABLE argsort
    keeps the lower cell on exact ties. The per-row |v| factor is
    dropped (constant across cells — identical ordering). BLAS sums in
    a different order than the SQL twin's sequential fold, so two cells
    whose cosines agree to ~1e-14 could in principle rank either way —
    the rp_ann boundary-mass argument: negligible for real data, and
    the oracle entries pin it on the test corpora."""
    from pyspark.sql.functions import pandas_udf

    rows = sorted(cents_rows, key=lambda r: r.cell)
    cmat = np.stack([np.asarray(r.cv, dtype=np.float64) for r in rows])
    cn = np.asarray([float(r.cn) for r in rows])
    cells = [r.cell for r in rows]
    str_cells = isinstance(cells[0], str)

    @pandas_udf("array<string>" if str_cells else "array<long>")
    def _probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(row, dtype=np.float64) for row in v])
        score = (x @ cmat.T) / cn[None, :]
        order = np.argsort(-score, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([[cells[j] for j in row] for row in order])

    return _probe


DEFAULT_ASSIGN = "udf"  # interleaved A/B at sf0.1: udf (Arrow/BLAS) beats window — and it is the shuffle-free huge-N path


def _assign_cells_window(e: DataFrame, cents: DataFrame, id_col: str, nprobe: int) -> DataFrame:
    """Join+window nearest-cells form — the DuckDB oracle's literal
    shape. Shuffles N·n_cells rows partitioned by id; kept as the
    explicit relational twin of the oracle and for environments without
    Python workers — the default is the shuffle-free Arrow path, which
    also measured faster (interleaved medians at sf0.1)."""
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "cos", _dot("v", "cv") / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("cell"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= nprobe)
        .select(id_col, "cell", "r")
    )


def ivf_train(
    emb: DataFrame,
    n_cells: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """Lloyd k-means training for the IVF coarse quantizer: init = the
    md5-hash-picked vectors (:func:`ivf_centroids`), then ``n_iter``
    rounds of assign (broadcast centroids, cosine argmax) + recompute
    (per-cell per-position mean via posexplode/groupBy — one shuffle per
    round, map-side combined). Centroid coordinates are rounded to 6
    decimals each round, which makes the result independent of partial-
    aggregation order (double sums of group-sized inputs agree to ~1e-12,
    far inside the rounding) — so the training has an exact SQL twin.
    Cells that lose all members drop out (standard Lloyd behaviour).
    ``assign``: "udf" (:func:`_probe_cells_udf`, the shuffle-free
    Arrow/BLAS path — measured faster AND the only shape that holds at
    ≫10⁷ vectors or realistic ~√N cell counts) or "window"
    (join+window, the oracle's literal shape). Returns (cell, cv, cn)."""
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn("nrm", _norm("v"))
    cents = ivf_centroids(emb, n_cells, id_col, vec_col)
    for _ in range(n_iter):
        # empty centroid table (degenerate/empty input): the window form
        # below lazily yields an empty frame; the UDF closure can't stack
        # a 0-row matrix, so route the degenerate case there
        if assign == "udf" and (cent_rows := cents.collect()):
            probe = _probe_cells_udf(cent_rows, nprobe=1)
            assigned = e.select(id_col, "v", F.element_at(probe("v"), 1).alias("cell"))
        else:
            scored = e.crossJoin(F.broadcast(cents)).withColumn(
                "cos", _dot("v", "cv") / (F.col("nrm") * F.col("cn"))
            )
            w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("cell"))
            assigned = (
                scored.withColumn("r", F.row_number().over(w))
                .filter(F.col("r") == 1)
                .select(id_col, "v", "cell")
            )
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("mval"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mval"))), lambda s: s["mval"]
                ).alias("cv")
            )
        )
        cents = _materialize_small(
            means.withColumn(
                "cn", F.sqrt(F.aggregate(F.col("cv"), F.lit(0.0), lambda a, x: a + x * x))
            )
        )
    return cents


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """Rank each vector's cells by cosine against the centroids
    (broadcast — n_cells rows; hash-picked by default, or pass trained
    ones from :func:`ivf_train`). Returns (id, cell, r) for r ≤ nprobe;
    r=1 is the storage assignment, r ≤ nprobe>1 is the query probe set.

    ``assign="udf"`` (default) is a NARROW Arrow-batched map
    (:func:`_probe_cells_udf`, one BLAS matmul per batch) — no
    crossJoin, no window shuffle of N·n_cells rows, and measured faster
    in interleaved medians at sf0.1; ``assign="window"`` is the
    join+window form (the DuckDB oracle's literal shape). Both rank
    identically (cos desc, cell asc) — equality is pytest-pinned."""
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn("nrm", _norm("v"))
    cents = centroids if centroids is not None else ivf_centroids(emb, n_cells, id_col, vec_col)
    if assign == "udf":
        cent_rows = cents.collect()
        if not cent_rows:
            # empty centroid table from empty INPUT is the legit empty
            # result (lazy window form below); an explicitly-passed
            # empty model over real data is an upstream bug (wrong or
            # empty index path) and must fail loudly, not emit a
            # silently empty assignment
            if centroids is not None and not emb.isEmpty():
                raise ValueError("ivf_assign: empty centroids for non-empty input")
        else:
            probe = _probe_cells_udf(cent_rows, nprobe=nprobe)
            return (
                e.select(F.col(id_col), F.posexplode(probe("v")).alias("pos", "cell"))
                .select(
                    id_col,
                    "cell",
                    (F.col("pos") + F.lit(1)).cast("int").alias("r"),
                )
            )
    return _assign_cells_window(e, cents, id_col, nprobe)


def ivf_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """IVF ANN: database vectors live in their nearest cell (r=1); each
    query probes its ``nprobe`` nearest cells and runs exact cosine inside
    them. Cells partition the corpus, so the probe join yields each
    candidate once — no dedup needed. Pass ``centroids`` from
    :func:`ivf_train` for the trained quantizer."""
    a = ivf_assign(
        emb, n_cells, id_col, vec_col, nprobe=max(1, nprobe), centroids=centroids, assign=assign
    )
    e = (
        emb.join(a.filter(F.col("r") == 1).drop("r"), id_col)
        .select(F.col(id_col), "cell", _as_double(vec_col).alias("v"))
        .withColumn("nrm", _norm("v"))
    )
    qv = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv"))
    probes = (
        a.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_vec_id"), "cell")
    )
    q = probes.join(qv, "query_vec_id")
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


# ---------------------------------------------------------------------------
# Product Quantization (PQ) — the embedding COMPRESSION scale path
# ---------------------------------------------------------------------------

def _sub_slices(vcol: str, m: int, dsub: int):
    return [F.slice(F.col(vcol), s * dsub + 1, dsub) for s in range(m)]


def _pq_dims(emb: DataFrame, m: int, vec_col: str) -> int:
    row = emb.select(F.size(vec_col).alias("d")).first()
    if row is None:
        return 0  # empty input: callers produce an empty frame downstream
    d = row["d"]
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    return d // m


def _pq_d2(sv: str, cw: str):
    """Rounded squared L2 between subvector and codeword. The expanded
    x·x − 2·x·c + c·c form is used IDENTICALLY in the SQL twin, and the
    6dp rounding turns float-order near-ties into exact ties broken by
    code asc — the ivf_train determinism discipline."""
    return F.round(
        _dot(sv, sv) - F.lit(2.0) * _dot(sv, cw) + _dot(cw, cw), 6
    )


def _nearest_code_udf(cb_rows: list):
    """Arrow-batched nearest-codeword assignment: the codebook
    (m·n_codes rows — driver-sized by contract) ships in the UDF
    closure as per-subspace numpy matrices; each batch is ONE BLAS
    matmul per subspace. This replaces the (id, sub)-window whose
    N·m·n_codes-row shuffle dominated encode/train at scale — and
    unlike a literal-expression LUT (higher-order functions are
    interpreted, not codegen'd), it keeps the per-row cost vectorized.
    d2 is the same expanded + 6dp-rounded form as :func:`_pq_d2`; ties
    break by code asc (codebook rows sorted by code, argmin keeps the
    first) — matching the join+window form the DuckDB oracle spells
    out. Rounding happens at 6dp, far above BLAS-vs-sequential
    summation ulps (the ivf_train argument), so results agree with the
    SQL twin exactly."""
    from pyspark.sql.functions import pandas_udf

    by_sub: dict[int, list] = {}
    for r in cb_rows:
        by_sub.setdefault(int(r.sub), []).append(r)
    mats: dict[int, np.ndarray] = {}
    code_lists: dict[int, list] = {}
    for s, lst in by_sub.items():
        lst.sort(key=lambda r: r.code)
        mats[s] = np.stack([np.asarray(r.cw, dtype=np.float64) for r in lst])
        code_lists[s] = [r.code for r in lst]
    str_codes = isinstance(next(iter(code_lists.values()))[0], str)

    @pandas_udf("string" if str_codes else "long")
    def _assign(sub: pd.Series, sv: pd.Series) -> pd.Series:
        if len(sub) == 0:
            return pd.Series([], dtype=object if str_codes else np.int64)
        subs = sub.to_numpy()
        sv_mat = np.asarray([np.asarray(x, dtype=np.float64) for x in sv])
        out = np.empty(len(subs), dtype=object if str_codes else np.int64)
        for s in np.unique(subs):
            idx = np.nonzero(subs == s)[0]
            x = sv_mat[idx]
            c = mats[int(s)]
            d2 = np.round((x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :], 6)
            best = np.argmin(d2, axis=1)
            codes = code_lists[int(s)]
            for j, b in zip(idx, best):
                out[j] = codes[b]
        return pd.Series(out)

    return _assign


def _assign_codes_window(subs: DataFrame, cb: DataFrame, id_col: str) -> DataFrame:
    """Join+window nearest-codeword form — the DuckDB oracle's literal
    shape (broadcast codebook join, (id, sub)-window). Shuffles
    N·m·n_codes rows — kept as the explicit relational twin; the
    Arrow path is the measured-faster default."""
    scored = subs.join(F.broadcast(cb), "sub").withColumn("d2", _pq_d2("sv", "cw"))
    w = Window.partitionBy(id_col, "sub").orderBy(F.asc("d2"), F.asc("code"))
    return scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)


def pq_train(
    emb: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """Train PQ codebooks (Jégou et al. 2011): split each vector into
    ``m`` subvectors; per subspace, k-means with ``n_codes`` codewords.
    Init = the md5-hash-picked vectors' subvectors (the
    :func:`ivf_centroids` seed trick, same rows for every subspace), then
    ``n_iter`` Lloyd rounds (assign by rounded squared-L2, recompute
    per-(sub, code, pos) means rounded to 6dp → exact SQL twin, like
    :func:`ivf_train`; a codeword with zero assignments keeps its
    previous value, so the codebook always stays m·n_codes rows).
    Returns (sub, code, cw).

    Scale posture: the codebook is m·n_codes·(d/m) floats — driver/
    broadcast-sized regardless of corpus size. ``assign="udf"``
    (default; :func:`_nearest_code_udf`, Arrow/BLAS) removes the
    N·m·n_codes-row assignment shuffle and measured faster in
    interleaved medians; ``assign="window"`` is the join +
    (id, sub)-window form — the oracle's shape. Both break ties
    identically (d2 asc, code asc) on 6dp-rounded distances."""
    dsub = _pq_dims(emb, m, vec_col)
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    # md5-pick seeds (the ivf_centroids trick: bounded top-n, exact SQL
    # twin); code labels are the seed vectors' own ids — arbitrary but
    # stable labels, densifiable with the dictionary range-partition
    # trick if a uint8 storage layout is wanted
    seeds = (
        e.withColumn("hk", F.md5(F.col(id_col).cast("string")))
        .orderBy("hk", id_col)
        .limit(n_codes)
        .select(F.col(id_col).alias("code"), "v")
    )
    cb = seeds.select(
        "code", F.posexplode(F.array(*_sub_slices("v", m, dsub))).alias("sub", "cw")
    ).select("sub", "code", "cw")
    subs = e.select(
        F.col(id_col), F.posexplode(F.array(*_sub_slices("v", m, dsub))).alias("sub", "sv")
    )
    for _ in range(n_iter):
        # empty codebook (degenerate/empty input) → lazy empty window form
        if assign == "udf" and (cb_rows := cb.collect()):
            assign_udf = _nearest_code_udf(cb_rows)
            assigned = subs.select(id_col, "sub", "sv", assign_udf("sub", "sv").alias("code"))
        else:
            assigned = _assign_codes_window(subs, cb, id_col)
        means = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.round(F.avg("val"), 6).alias("mval"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mval"))), lambda s: s["mval"]
                ).alias("new_cw")
            )
        )
        # Classic Lloyd convention: a codeword with no assignments keeps
        # its previous value (left join + coalesce) so the codebook never
        # silently shrinks below n_codes.
        cb = _materialize_small(
            cb.join(means, ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("new_cw", "cw").alias("cw"))
        )
    return cb


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """Encode every vector as ``m`` uint8-sized code ids — 8·m bits per
    vector vs 32·d for raw floats (64-dim float32 → 4 bytes: 64×
    compression at m=4). Returns (vec_id, sub, code): nearest codeword
    per subspace by rounded squared-L2, ties → code asc.
    ``assign="udf"`` (default) = narrow Arrow-batched map
    (:func:`_nearest_code_udf`, one BLAS matmul per batch — no join, no
    shuffle); ``assign="window"`` = broadcast join + (id, sub)-window
    (the oracle's shape)."""
    dsub = _pq_dims(emb, m, vec_col)
    subs = emb.select(
        F.col(id_col),
        F.posexplode(F.array(*_sub_slices(vec_col, m, dsub))).alias("sub", "raw_sv"),
    ).withColumn("sv", F.transform("raw_sv", lambda x: x.cast("double")))
    if assign == "udf":
        cb_rows = codebooks.collect()
        if not cb_rows:
            # codebooks are always caller-supplied here: empty model over
            # real data = upstream bug (wrong/empty index path) — raise
            # rather than emit a silently empty encoded index
            if not emb.isEmpty():
                raise ValueError("pq_encode: empty codebooks for non-empty input")
        else:
            assign_udf = _nearest_code_udf(cb_rows)
            return subs.select(id_col, "sub", assign_udf("sub", "sv").alias("code"))
    return _assign_codes_window(subs, codebooks, id_col).select(id_col, "sub", "code")


def pq_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """PQ ANN with asymmetric distance (ADC): database vectors are
    scored through their reconstructions (concatenated codewords), the
    query stays raw — approx_cos(q, x) = q·recon(x) / (|q|·|recon(x)|),
    accumulated per subspace from a per-query lookup table (the classic
    ADC LUT: m·n_codes partial dot products per query, broadcast-sized).
    Returns (query_vec_id, vec_id, cos_r, rank) — the family shape."""
    cb = (
        codebooks
        if codebooks is not None
        else pq_train(emb, m, n_codes, n_iter, id_col, vec_col, assign=assign)
    )
    dsub = _pq_dims(emb, m, vec_col)
    codes = pq_encode(emb, cb, m, id_col, vec_col, assign=assign)
    qe = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv"))
    qsubs = qe.select(
        "query_vec_id", "qn", F.posexplode(F.array(*_sub_slices("qv", m, dsub))).alias("sub", "qsv")
    )
    lut = qsubs.join(F.broadcast(cb), "sub").select(
        "query_vec_id",
        "qn",
        "sub",
        "code",
        _dot("qsv", "cw").alias("part"),
        _dot("cw", "cw").alias("cwn2"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_vec_id", "qn", F.col(id_col).alias("vec_id"))
        .agg(F.sum("part").alias("num"), F.sum("cwn2").alias("rn2"))
        .filter(F.col("vec_id") != F.col("query_vec_id"))
        .withColumn("cos_r", F.round(F.col("num") / (F.col("qn") * F.sqrt("rn2")), 6))
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id", "cos_r", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC) — the billion-vector composition of the two scale paths
# ---------------------------------------------------------------------------

def ivfpq_residuals(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """Assign every vector to its nearest coarse cell (r=1) and subtract
    that centroid: the residual is what the PQ codebooks quantize
    (Jégou et al. 2011 §V, IVFADC). Returns (id, cell, rv). The
    subtraction is exact IEEE (`zip_with` x−y), so it twins in SQL."""
    a1 = ivf_assign(
        emb, id_col=id_col, vec_col=vec_col, nprobe=1, centroids=centroids, assign=assign
    )
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    return (
        e.join(a1.drop("r"), id_col)
        .join(F.broadcast(centroids.select("cell", "cv")), "cell")
        .select(id_col, "cell", F.zip_with("v", "cv", lambda x, y: x - y).alias("rv"))
    )


def _adc_rank(
    codes: DataFrame,
    cents: DataFrame,
    cb: DataFrame,
    qe: DataFrame,
    probes: DataFrame,
    m: int,
    dsub: int,
    k: int,
    id_col: str,
    exclude_self: bool,
) -> DataFrame:
    """Shared IVFADC scoring tail (used by :func:`ivfpq_topk` and
    :func:`ivfpq_search` — ONE copy of the reconstruction-cosine
    formula). Inputs: ``codes`` (id, sub, code, cell) — the corpus-sized
    table; ``probes`` (query_vec_id, cell); ``qe`` (query_vec_id, qv,
    qn). Builds the broadcast-sized LUTs (ccw: n_cells·m·n_codes; qlut:
    |queries|·m·n_codes; qdotc: |queries|·nprobe) and ranks

        cos(q, x̂) = (q·c + Σ_sub q_sub·cw) /
                    (|q| · sqrt(|c|² + 2·Σ c_sub·cw + Σ|cw|²))
    """
    csubs = cents.select(
        "cell", "cn", F.posexplode(F.array(*_sub_slices("cv", m, dsub))).alias("sub", "csv")
    )
    ccw = csubs.join(F.broadcast(cb), "sub").select(
        "cell", "sub", "code", _dot("csv", "cw").alias("cdotcw"), _dot("cw", "cw").alias("cwn2")
    )
    qdotc = (
        probes.join(qe, "query_vec_id")
        .join(F.broadcast(cents), "cell")
        .select("query_vec_id", "cell", _dot("qv", "cv").alias("qc"), "qn", "cn")
    )
    qsubs = qe.select(
        "query_vec_id", F.posexplode(F.array(*_sub_slices("qv", m, dsub))).alias("sub", "qsv")
    )
    qlut = qsubs.join(F.broadcast(cb), "sub").select(
        "query_vec_id", "sub", "code", _dot("qsv", "cw").alias("qpart")
    )
    persub = (
        codes.join(F.broadcast(probes), "cell")
        .join(F.broadcast(qlut), ["query_vec_id", "sub", "code"])
        .join(F.broadcast(ccw), ["cell", "sub", "code"])
    )
    agg = persub.groupBy("query_vec_id", F.col(id_col).alias("vec_id"), "cell").agg(
        F.sum("qpart").alias("qrec"),
        F.sum("cdotcw").alias("crec"),
        F.sum("cwn2").alias("rn2"),
    )
    scored = agg.join(F.broadcast(qdotc), ["query_vec_id", "cell"])
    if exclude_self:
        scored = scored.filter(F.col("vec_id") != F.col("query_vec_id"))
    scored = scored.withColumn(
        "cos_r",
        F.round(
            (F.col("qc") + F.col("qrec"))
            / (F.col("qn") * F.sqrt(F.col("cn") * F.col("cn") + 2.0 * F.col("crec") + F.col("rn2"))),
            6,
        ),
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id", "cos_r", "rank")
    )


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    n_cells: int = 4,
    nprobe: int = 2,
    m: int = 4,
    n_codes: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assign: str = DEFAULT_ASSIGN,
) -> DataFrame:
    """IVFADC ANN (Jégou et al. 2011 §III-C/V): coarse-quantize into
    ``n_cells`` inverted lists, PQ-encode the RESIDUAL x − c(x) with
    ``m``×``n_codes`` codebooks, and score queries against the probed
    cells' reconstructions x̂ = c + recon(codes):

        cos(q, x̂) = (q·c + Σ_sub q_sub·cw) /
                    (|q| · sqrt(|c|² + 2·Σ c_sub·cw + Σ|cw|²))

    Every c- and q-dependent term comes from broadcast-sized lookup
    tables (ccw: n_cells·m·n_codes rows; qlut: |queries|·m·n_codes), so
    the only big-data operations are one broadcast probe join over the
    code table (N·m rows, never the raw vectors) and one map-side-
    combined groupBy — the memory-bandwidth profile that makes IVFADC
    the billion-vector layout. Pass trained ``centroids`` from
    :func:`ivf_train` for a Lloyd coarse quantizer; the default is the
    md5-picked :func:`ivf_centroids` (exact data vectors → residuals
    stay exactly SQL-twinnable). Returns the family shape
    (query_vec_id, vec_id, cos_r, rank)."""
    dsub = _pq_dims(emb, m, vec_col)
    # materialize the n_cells centroid rows once — every consumer below
    # (storage assign, probes, qdotc, ccw) would otherwise re-run the
    # corpus-wide TakeOrderedAndProject pick
    cents = _materialize_small(
        centroids if centroids is not None else ivf_centroids(emb, n_cells, id_col, vec_col)
    )
    # NOT persisted: callers hold the returned lazy frame, so an eager
    # cache here would leak for the session lifetime (the persisted
    # serving path is ivfpq_build/ivfpq_search); the residual lineage is
    # a narrow scan + broadcast join, cheap to recompute
    resid = ivfpq_residuals(emb, cents, id_col, vec_col, assign=assign)
    cb = pq_train(resid, m, n_codes, n_iter, id_col, "rv", assign=assign)
    codes = pq_encode(resid, cb, m, id_col, "rv", assign=assign).join(
        resid.select(id_col, "cell"), id_col
    )
    qe = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_vec_id"), _as_double(vec_col).alias("qv"))
        .withColumn("qn", _norm("qv"))
    )
    probes = ivf_assign(
        emb.filter(F.col(id_col).isin(query_ids)), id_col=id_col, vec_col=vec_col,
        nprobe=max(1, nprobe), centroids=cents, assign=assign,
    ).select(F.col(id_col).alias("query_vec_id"), "cell")
    return _adc_rank(codes, cents, cb, qe, probes, m, dsub, k, id_col, exclude_self=True)


def ivfpq_build(
    emb: DataFrame,
    path: str,
    n_cells: int = 4,
    m: int = 4,
    n_codes: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assign: str = DEFAULT_ASSIGN,
) -> dict:
    """Persist an IVFADC index: encode once, query many. Layout:

    - ``{path}/centroids``  — (cell, cv, cn): n_cells rows (broadcast).
    - ``{path}/codebooks``  — (sub, code, cw): m·n_codes rows (broadcast).
    - ``{path}/codes``      — (id, cell, sub, code): the ONLY corpus-sized
      table, m small rows per vector (8·m bits of payload each vs 32·d
      for raw floats), written partitioned by ``cell`` so a probe scan
      reads just nprobe/n_cells of the data (partition pruning).

    At 100 TB of raw vectors the codes table is the on-disk working set
    (~64× smaller at d=64/m=4) and queries never touch the raw corpus.
    Returns the params dict (also written to ``{path}/meta.json``-style
    parquet for self-description)."""
    cents = _materialize_small(
        centroids if centroids is not None else ivf_centroids(emb, n_cells, id_col, vec_col)
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    resid = ivfpq_residuals(emb, cents, id_col, vec_col, assign=assign).persist()
    try:
        cb = pq_train(resid, m, n_codes, n_iter, id_col, "rv", assign=assign)
        cb.write.mode("overwrite").parquet(f"{path}/codebooks")
        codes = pq_encode(resid, cb, m, id_col, "rv", assign=assign).join(
            resid.select(id_col, "cell"), id_col
        )
        codes.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    finally:
        resid.unpersist()
    meta = {"n_cells": n_cells, "m": m, "n_codes": n_codes, "id_col": id_col}
    spark = emb.sparkSession
    spark.createDataFrame([meta]).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return meta


def ivfpq_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVFADC index (:func:`ivfpq_build`) with a frame
    of raw query vectors (id_col, vec_col). Probing filters the codes
    scan to the queries' cells BEFORE the read (partition pruning on the
    ``cell`` directory key), then scores through the same broadcast LUTs
    as :func:`ivfpq_topk`. Self-matches are kept: external queries are
    not corpus rows (callers with in-corpus queries filter afterwards)."""
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    m = int(meta["m"])
    cents = _materialize_small(spark.read.parquet(f"{path}/centroids"))
    cb = _materialize_small(spark.read.parquet(f"{path}/codebooks"))
    codes = spark.read.parquet(f"{path}/codes")
    dsub = _pq_dims(queries, m, vec_col)

    qe = (
        queries.select(F.col(id_col).alias("query_vec_id"), _as_double(vec_col).alias("qv"))
        .withColumn("qn", _norm("qv"))
    )
    qscored = qe.crossJoin(F.broadcast(cents)).withColumn(
        "qcos", _dot("qv", "cv") / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("qcos"), F.asc("cell"))
    # materialize the query-sized probe set ONCE: probe_cells derives
    # locally (no extra job) and the three downstream uses don't re-run
    # the queries×centroids assignment
    probes = _materialize_small(
        qscored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= nprobe)
        .select("query_vec_id", "cell")
    )
    probe_cells = sorted({r.cell for r in probes.collect()})
    codes = codes.filter(F.col("cell").isin(probe_cells))  # partition pruning
    codes = codes.select(F.col(meta["id_col"]), "sub", "code", "cell")
    return _adc_rank(codes, cents, cb, qe, probes, m, dsub, k, meta["id_col"], exclude_self=False)
