"""Driver-contract entries for the training-data pipeline operators
(dedup / similarity search / text analysis / multimodal plumbing), each
with an exact DuckDB oracle. See plans/entries.py for the float-noise
discipline (rounding + rounded-rank) these follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexneuart_spark.operators import dedup, multimodal, similarity, text_analysis

EMB_QUERY_IDS = [0, 1, 2, 3, 4]

# shared SQL fragments ------------------------------------------------------

SQL_TOKLIST = r"""
toklist AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
  FROM documents
)
"""

SQL_SHINGLES3 = """
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(l) - 1),
                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
  FROM toklist WHERE len(l) >= 3
)
"""

SQL_EMB = """
emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
"""


# --- dedup -----------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash groupBy). NOTE: the synthetic corpus has no
    byte-identical texts, so 0 rows is the CORRECT answer — the oracle
    agrees; near-dup detection is the entries below."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_duplicates(docs)


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_dups,
       min(doc_id) AS min_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs (trigrams, τ=0.8) — finds the
    corpus's planted near-duplicates. The head-shingle guard
    (max_shingle_df=1000) is ON by default — the oracle mirrors it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.jaccard_near_duplicates(docs, n=3, threshold=0.8)


SQL_DEDUP_JACCARD = f"""
WITH {SQL_TOKLIST}, {SQL_SHINGLES3},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
head AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1000),
csh AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM head)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.id_a = sa.doc_id
JOIN sizes sb ON i.id_b = sb.doc_id
WHERE round(i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter), 6) >= 0.8
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-group resolution: connected components over the Jaccard
    near-dup pair graph (component = min reachable doc_id). Spark side is
    ITERATIVE min-label propagation (checkpointed loop — diameter-bounded);
    the oracle is a DuckDB recursive CTE computing the transitive closure.
    Output: (id, component) for every doc in at least one pair."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.jaccard_near_duplicates(docs, n=3, threshold=0.8)
    return dedup.connected_components(pairs)


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {SQL_TOKLIST}, {SQL_SHINGLES3},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
head AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1000),
csh AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM head)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
jp AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON i.id_a = sa.doc_id
  JOIN sizes sb ON i.id_b = sb.doc_id
  WHERE round(i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter), 6) >= 0.8
),
edges AS (SELECT id_a AS a, id_b AS b FROM jp UNION SELECT id_b, id_a FROM jp),
r AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a
)
SELECT a AS id, least(a, min(b)) AS component FROM r GROUP BY a
"""


def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup pipeline: detect (Jaccard) → group (connected
    components) → APPLY (keep each group's min-id canonical + all
    unpaired docs). Output: the surviving doc ids."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.jaccard_near_duplicates(docs, n=3, threshold=0.8)
    return dedup.apply_dedup(docs, pairs).select("doc_id")


SQL_DEDUP_APPLY = f"""
WITH RECURSIVE {SQL_TOKLIST}, {SQL_SHINGLES3},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
head AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1000),
csh AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM head)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
jp AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON i.id_a = sa.doc_id
  JOIN sizes sb ON i.id_b = sb.doc_id
  WHERE round(i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter), 6) >= 0.8
),
edges AS (SELECT id_a AS a, id_b AS b FROM jp UNION SELECT id_b, id_a FROM jp),
r AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS id, least(a, min(b)) AS component FROM r GROUP BY a)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (8 hashes, bands of 2)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_candidates(docs, n=3, num_hashes=8, band_size=2)


SQL_DEDUP_MINHASH = f"""
WITH {SQL_TOKLIST}, {SQL_SHINGLES3},
hx AS (SELECT doc_id, shingle, unnest(range(0, 8)) AS hash_idx FROM sh),
sig AS (
  SELECT doc_id, hash_idx, min(md5(CAST(hash_idx AS VARCHAR) || ':' || shingle)) AS minhash
  FROM hx GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, CAST(hash_idx // 2 AS INT) AS band_idx,
         string_agg(minhash, '|' ORDER BY minhash) AS band_key
  FROM sig GROUP BY 1, 2
),
cb AS (
  SELECT * FROM bands
  QUALIFY count(*) OVER (PARTITION BY band_idx, band_key) <= 2000
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_bands_shared
FROM cb a JOIN cb b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (16 bits, tf-weighted md5 high-bits)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash(docs, bits=16)


SQL_DEDUP_SIMHASH = rf"""
WITH {SQL_TOKLIST},
tf AS (
  SELECT doc_id, term, count(*) AS tf, md5(term) AS h
  FROM (SELECT doc_id, unnest(l) AS term FROM toklist)
  GROUP BY 1, 2
),
per_bit AS (
  SELECT doc_id, unnest(range(0, 16)) AS bit_idx, tf, h FROM tf
),
bitvals AS (
  SELECT doc_id, bit_idx,
         CASE WHEN sum(CASE WHEN substr(h, bit_idx + 1, 1) IN ('8','9','a','b','c','d','e','f')
                            THEN tf ELSE -tf END) > 0
              THEN '1' ELSE '0' END AS bit
  FROM per_bit GROUP BY 1, 2
)
SELECT doc_id, string_agg(bit, '' ORDER BY bit_idx) AS simhash
FROM bitvals GROUP BY 1
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming radius 1 (pigeonhole block
    candidates — exact recall — then full-signature verify). Radius 1 on
    a 16-bit signature keeps the entry selective; production uses 64-bit
    signatures with radius 3 (same operator, same plan shape)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_near_duplicates(docs, bits=16, max_hamming=1)


SQL_DEDUP_SIMHASH_PAIRS = rf"""
WITH {SQL_TOKLIST},
tf AS (
  SELECT doc_id, term, count(*) AS tf, md5(term) AS h
  FROM (SELECT doc_id, unnest(l) AS term FROM toklist)
  GROUP BY 1, 2
),
per_bit AS (
  SELECT doc_id, unnest(range(0, 16)) AS bit_idx, tf, h FROM tf
),
bitvals AS (
  SELECT doc_id, bit_idx,
         CASE WHEN sum(CASE WHEN substr(h, bit_idx + 1, 1) IN ('8','9','a','b','c','d','e','f')
                            THEN tf ELSE -tf END) > 0
              THEN '1' ELSE '0' END AS bit
  FROM per_bit GROUP BY 1, 2
),
sig AS (
  SELECT doc_id, string_agg(bit, '' ORDER BY bit_idx) AS simhash
  FROM bitvals GROUP BY 1
),
bl AS (
  SELECT doc_id, simhash, block_idx,
         substr(simhash, block_idx * 8 + 1, 8) AS block_val
  FROM (SELECT doc_id, simhash, unnest(range(0, 2)) AS block_idx FROM sig)
),
cbl AS (
  SELECT * FROM bl
  QUALIFY count(*) OVER (PARTITION BY block_idx, block_val) <= 2000
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM cbl a JOIN cbl b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_filter(range(1, 17),
                i -> substr(sa.simhash, i, 1) <> substr(sb.simhash, i, 1))) AS INT) AS hamming
FROM cand c
JOIN sig sa ON c.id_a = sa.doc_id
JOIN sig sb ON c.id_b = sb.doc_id
WHERE len(list_filter(range(1, 17),
          i -> substr(sa.simhash, i, 1) <> substr(sb.simhash, i, 1))) <= 1
"""


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint dedup groups: docs sharing the min-md5 4-gram
    fingerprint (shift-robust near-dup buckets)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = text_analysis.fingerprint(docs, n=4)
    return (
        fp.groupBy("fingerprint")
        .agg(F.count("*").cast("long").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


SQL_DEDUP_FINGERPRINT = f"""
WITH {SQL_TOKLIST},
fp AS (
  SELECT doc_id,
         list_min(list_transform(range(1, len(l) - 2),
                  i -> md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS fingerprint
  FROM toklist WHERE len(l) >= 4
)
SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc_id
FROM fp GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via the DEFAULT banded sign-LSH
    candidate path (no CartesianProduct in the plan — the 100 TB posture).
    cos ≥ 0.45: this synthetic embedding table has no true near-dups; the
    threshold picks the most similar real pairs so the operator is
    exercised non-trivially. Band shape 8×2 over the first 16 coords gives
    ≈0.99 candidate recall at this low threshold (at the production
    τ=0.95 the default 6×4 shape is ≥0.995)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return dedup.embedding_near_duplicates(
        emb, threshold=0.45, method="lsh", n_bands=8, band_bits=2
    )


SQL_DEDUP_EMBEDDING = f"""
WITH {SQL_EMB},
sig AS (
  SELECT vec_id,
         list_transform(v[1:16], x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END) AS bits
  FROM emb
),
bands AS (
  SELECT vec_id, band_idx, bits[band_idx * 2 + 1] || bits[band_idx * 2 + 2] AS band_key
  FROM (SELECT vec_id, bits, unnest(range(0, 8)) AS band_idx FROM sig)
),
cb AS (
  SELECT * FROM bands
  QUALIFY count(*) OVER (PARTITION BY band_idx, band_key) <= 2000
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cb a
  JOIN cb b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
FROM cand c JOIN emb a ON c.id_a = a.vec_id JOIN emb b ON c.id_b = b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.45
"""


# --- similarity search -----------------------------------------------------

def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for query vectors 0..4."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.cosine_topk(emb, EMB_QUERY_IDS, k=5)


SQL_EMB_COSINE_TOPK = f"""
WITH {SQL_EMB},
q AS (SELECT vec_id AS query_vec_id, v AS qv, nrm AS qn FROM emb WHERE vec_id IN (0,1,2,3,4)),
scored AS (
  SELECT q.query_vec_id, e.vec_id,
         round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS cos_r
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_emb_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN top-5 (the scale path)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.lsh_ann_topk(emb, EMB_QUERY_IDS, k=5, nbits=8)


SQL_EMB_LSH_ANN = f"""
WITH {SQL_EMB},
bkt AS (
  SELECT vec_id, v, nrm,
         list_aggregate(list_transform(v[1:8], x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
                        'string_agg', '') AS bucket
  FROM emb
),
q AS (SELECT vec_id AS query_vec_id, bucket, v AS qv, nrm AS qn FROM bkt WHERE vec_id IN (0,1,2,3,4)),
scored AS (
  SELECT q.query_vec_id, e.vec_id,
         round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS cos_r
  FROM bkt e JOIN q USING (bucket) WHERE e.vec_id <> q.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_emb_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN top-5: the query's bucket plus every
    Hamming-1 neighbour bucket (Lv et al. 2007 recall boost)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.lsh_ann_topk(emb, EMB_QUERY_IDS, k=5, nbits=8, multi_probe=True)


SQL_EMB_LSH_MULTIPROBE = f"""
WITH {SQL_EMB},
bkt AS (
  SELECT vec_id, v, nrm,
         list_aggregate(list_transform(v[1:8], x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
                        'string_agg', '') AS bucket
  FROM emb
),
q0 AS (SELECT vec_id AS query_vec_id, bucket, v AS qv, nrm AS qn FROM bkt WHERE vec_id IN (0,1,2,3,4)),
q AS (
  SELECT query_vec_id, bucket, qv, qn FROM q0
  UNION ALL
  SELECT query_vec_id,
         substr(bucket, 1, j - 1)
           || (CASE substr(bucket, j, 1) WHEN '1' THEN '0' ELSE '1' END)
           || substr(bucket, j + 1, 8) AS bucket,
         qv, qn
  FROM (SELECT query_vec_id, bucket, qv, qn, unnest(range(1, 9)) AS j FROM q0)
),
scored AS (
  SELECT q.query_vec_id, e.vec_id,
         round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS cos_r
  FROM bkt e JOIN q USING (bucket) WHERE e.vec_id <> q.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5: centroids = 8 vectors with smallest md5(id) (valid
    for any id type), database vectors in their nearest cell, queries
    probe their nprobe=2 nearest cells."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivf_topk(emb, EMB_QUERY_IDS, k=5, n_cells=8, nprobe=2)


SQL_EMB_IVF_TOPK = f"""
WITH {SQL_EMB},
cents AS (
  SELECT vec_id AS cell, v AS cv, nrm AS cn FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
assign AS (
  SELECT vec_id, cell, r FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.cell ASC) AS r
    FROM emb e CROSS JOIN cents c
  ) WHERE r <= 2
),
ea AS (SELECT e.*, a.cell FROM emb e JOIN assign a ON e.vec_id = a.vec_id AND a.r = 1),
q AS (
  SELECT a.vec_id AS query_vec_id, a.cell, e.v AS qv, e.nrm AS qn
  FROM assign a JOIN emb e ON a.vec_id = e.vec_id
  WHERE a.vec_id IN (0,1,2,3,4)
),
scored AS (
  SELECT q.query_vec_id, e.vec_id,
         round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS cos_r
  FROM ea e JOIN q USING (cell) WHERE e.vec_id <> q.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


# --- text analysis ---------------------------------------------------------

def q_emb_rp_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (SRP-LSH) ANN top-5 — the production-recall scale
    path. The seeded Gaussian projection IS deterministic, so the DuckDB
    oracle is GENERATED: the same ``default_rng(13)`` 64x6 matrix is
    embedded as full-precision SQL literals and each sign bit becomes a
    ``list_dot_product(v, [col_j]) >= 0`` CASE — one seed, two derived
    evaluators (the krovetz/lambdamart generated-twin pattern). Sign
    agreement is safe: both sides compute the dot in float64 and a
    Gaussian projection of 64-dim data landing within ~1e-12 of zero
    (where summation order could flip the bit) has negligible mass."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.rp_ann_topk(emb, EMB_QUERY_IDS, k=5, nbits=6, seed=13)


def _rp_bucket_sql(dim: int = 64, nbits: int = 6, seed: int = 13) -> str:
    """SQL expression for the SRP-LSH bucket string: sign bits of
    ``v @ R`` with R the seeded Gaussian the Spark kernel draws
    (operators/similarity.py::rp_signature) — emitted as literals."""
    import numpy as np

    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((dim, nbits))
    bits = []
    for j in range(nbits):
        vec = ", ".join(repr(float(x)) for x in proj[:, j])
        bits.append(f"(CASE WHEN list_dot_product(v, [{vec}]) >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


SQL_EMB_RP_ANN = f"""
WITH {SQL_EMB},
bkt AS (SELECT vec_id, v, nrm, {_rp_bucket_sql()} AS bucket FROM emb),
q AS (
  SELECT vec_id AS query_vec_id, bucket, v AS qv, nrm AS qn
  FROM bkt WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_vec_id, e.vec_id,
         round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS cos_r
  FROM bkt e JOIN q USING (bucket) WHERE e.vec_id <> q.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_emb_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a TRAINED coarse quantizer: one Lloyd round (assign to
    hash-picked seeds, recompute per-cell means rounded to 6dp), then the
    standard nprobe=2 probe search. The rounding makes training exactly
    reproducible in SQL (see similarity.ivf_train)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_train(emb, n_cells=8, n_iter=1)
    return similarity.ivf_topk(emb, EMB_QUERY_IDS, k=5, nprobe=2, centroids=cents)


SQL_EMB_IVF_TRAINED = f"""
WITH {SQL_EMB},
c0 AS (
  SELECT vec_id AS cell, v AS cv, nrm AS cn FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
a0 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.cell ASC) AS r
    FROM emb e CROSS JOIN c0 c
  ) WHERE r = 1
),
expl AS (
  SELECT a.cell, unnest(e.v) AS val, unnest(range(1, len(e.v) + 1)) AS pos
  FROM a0 a JOIN emb e USING (vec_id)
),
m1 AS (SELECT cell, pos, round(avg(val), 6) AS mval FROM expl GROUP BY 1, 2),
c1 AS (
  SELECT cell, array_agg(mval ORDER BY pos) AS cv FROM m1 GROUP BY 1
),
c1n AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM c1),
a1 AS (
  SELECT vec_id, cell, r FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.cell ASC) AS r
    FROM emb e CROSS JOIN c1n c
  ) WHERE r <= 2
),
db AS (SELECT e.*, a.cell FROM emb e JOIN a1 a ON e.vec_id = a.vec_id AND a.r = 1),
q AS (
  SELECT a.vec_id AS query_vec_id, a.cell, e.v AS qv, e.nrm AS qn
  FROM a1 a JOIN emb e ON a.vec_id = e.vec_id
  WHERE a.vec_id IN (0,1,2,3,4)
),
scored AS (
  SELECT q.query_vec_id, e.vec_id,
         round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS cos_r
  FROM db e JOIN q USING (cell) WHERE e.vec_id <> q.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_analysis.token_counts(docs)


SQL_TEXT_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_analysis.quality_score(docs)


_Q_STOPS_SQL = ", ".join(f"'{w}'" for w in ["the", "a", "of", "and", "is", "to", "in"])

SQL_TEXT_QUALITY = rf"""
WITH tl AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
  FROM documents
)
SELECT doc_id,
       CAST(len(l) AS BIGINT) AS n_tokens,
       round(CASE WHEN len(l) > 0
             THEN list_sum(list_transform(l, x -> len(x))) * 1.0 / len(l) ELSE 0.0 END, 6) AS avg_token_len,
       round(CASE WHEN len(l) > 0
             THEN len(list_distinct(l)) * 1.0 / len(l) ELSE 0.0 END, 6) AS type_token_ratio,
       round(CASE WHEN length(text) > 0
             THEN length(regexp_replace(text, '[A-Za-z0-9\s]+', '', 'g')) * 1.0 / length(text)
             ELSE 0.0 END, 6) AS punct_ratio,
       round(CASE WHEN len(l) > 0
             THEN len(list_filter(l, x -> list_contains([{_Q_STOPS_SQL}], x))) * 1.0 / len(l)
             ELSE 0.0 END, 6) AS stopword_ratio,
       round(least(1.0, len(l) / 100.0)
             * (CASE WHEN len(l) > 0 THEN len(list_distinct(l)) * 1.0 / len(l) ELSE 0.0 END), 6) AS quality
FROM tl
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_analysis.lang_id(docs)


def _sql_lang_hits(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in text_analysis.LANG_MARKERS[lang])
    return f"len(list_filter(l, x -> list_contains([{markers}], x)))"


SQL_TEXT_LANG_ID = f"""
WITH {SQL_TOKLIST},
hits AS (
  SELECT doc_id,
         {_sql_lang_hits('de')} AS h_de,
         {_sql_lang_hits('en')} AS h_en,
         {_sql_lang_hits('fr')} AS h_fr
  FROM toklist
)
SELECT doc_id,
       CASE WHEN greatest(h_de, h_en, h_fr) = 0 THEN 'unknown'
            WHEN (CASE WHEN h_de = greatest(h_de, h_en, h_fr) THEN 1 ELSE 0 END
                + CASE WHEN h_en = greatest(h_de, h_en, h_fr) THEN 1 ELSE 0 END
                + CASE WHEN h_fr = greatest(h_de, h_en, h_fr) THEN 1 ELSE 0 END) > 1 THEN 'unknown'
            WHEN h_de = greatest(h_de, h_en, h_fr) THEN 'de'
            WHEN h_en = greatest(h_de, h_en, h_fr) THEN 'en'
            ELSE 'fr' END AS pred_lang
FROM hits
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_analysis.fingerprint(docs, n=4)


SQL_DOC_FINGERPRINT = f"""
WITH {SQL_TOKLIST}
SELECT doc_id,
       list_min(list_transform(range(1, len(l) - 2),
                i -> md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS fingerprint
FROM toklist WHERE len(l) >= 4
"""


# --- multimodal plumbing ---------------------------------------------------

def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas decode stub (deterministic fake dims)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = multimodal.attach_payload(docs)
    return multimodal.decode_images(payloads).select("doc_id", "width", "height", "n_bytes")


SQL_MULTIMODAL_DECODE = """
WITH pb AS (
  SELECT doc_id,
         (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
           + instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1 AS b0,
         (instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
           + instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1 AS b1
  FROM documents
)
SELECT doc_id,
       CAST(1 + b0 % 64 AS INT) AS width,
       CAST(1 + b1 % 64 AS INT) AS height,
       CAST(16 AS BIGINT) AS n_bytes
FROM pb
"""


# --- packed binary vectors (reference io/pack.py layout) -------------------

def q_packed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack every embedding into the reference's little-endian dense
    binary layout (tag <I=0 + dim×<f), unpack it back, and report
    properties computable from the raw floats — an exact inverse check
    the DuckDB oracle reproduces without touching bytes. Byte-level
    layout equality vs the reference struct masks is pytest-covered
    (tests/test_pack_ranklib.py)."""
    from flexneuart_spark.io.pack import pack_dense_col, unpack_dense_col

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    packed = emb.select("vec_id", pack_dense_col("embedding").alias("p"))
    un = packed.select("vec_id", F.length("p").cast("int").alias("n_bytes"),
                       unpack_dense_col("p").alias("u"))
    v = F.transform(F.col("u"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return un.select(
        "vec_id",
        "n_bytes",
        F.size("u").cast("int").alias("dim"),
        F.round(F.element_at(F.col("u"), 1).cast("double"), 6).alias("first_r"),
        F.round(l2, 6).alias("l2_r"),
    )


SQL_PACKED_VECTORS = """
SELECT vec_id,
       CAST(4 + 4 * len(embedding) AS INT) AS n_bytes,
       CAST(len(embedding) AS INT) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_r,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_r
FROM embeddings
"""


# --- events (streaming-shaped batch aggregation) ---------------------------

def q_events_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed event aggregation (batch equivalent of the streaming
    minutely rollup in flexneuart_spark.streaming)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.withColumn("minute", F.floor(F.unix_timestamp("ts") / 60).cast("long"))
        .groupBy("event_type", "minute")
        .agg(F.count("*").cast("long").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


SQL_EVENTS_MINUTELY = """
SELECT event_type, CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_emb_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-Quantization ANN (Jégou et al. 2011) — the embedding
    COMPRESSION scale path: m=4 subspaces × 16 codewords (64-dim → 4
    code labels per vector), one Lloyd round per subspace from md5-picked
    seeds, asymmetric-distance (ADC) scoring through a per-query LUT.
    Training is deterministic (6dp-rounded means + rounded-d2 assignment,
    ties → code asc), so the ENTIRE pipeline — train, encode, score —
    has an exact SQL twin."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.pq_topk(emb, EMB_QUERY_IDS, k=5, m=4, n_codes=16, n_iter=1)


def _pq_subs_sql(m: int = 4, dsub: int = 16) -> str:
    parts = [
        f"SELECT vec_id, {s} AS sub, v[{s * dsub + 1}:{(s + 1) * dsub}] AS sv FROM emb"
        for s in range(m)
    ]
    return " UNION ALL ".join(parts)


_PQ_D2 = (
    "round(list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.cw)"
    " + list_dot_product(c.cw, c.cw), 6)"
)

SQL_EMB_PQ_ANN = f"""
WITH {SQL_EMB},
subs AS ({_pq_subs_sql()}),
seeds AS (
  SELECT vec_id AS code, v FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
cb0 AS (
  SELECT s.sub, d.code, s.sv AS cw
  FROM subs s JOIN seeds d ON s.vec_id = d.code
),
a0 AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {_PQ_D2} ASC, c.code ASC) AS r
    FROM subs s JOIN cb0 c USING (sub)
  ) WHERE r = 1
),
expl AS (
  SELECT a.sub, a.code, unnest(s.sv) AS val, unnest(range(1, len(s.sv) + 1)) AS pos
  FROM a0 a JOIN subs s ON a.vec_id = s.vec_id AND a.sub = s.sub
),
m1 AS (SELECT sub, code, pos, round(avg(val), 6) AS mval FROM expl GROUP BY 1, 2, 3),
cb1m AS (SELECT sub, code, array_agg(mval ORDER BY pos) AS cw FROM m1 GROUP BY 1, 2),
cb1 AS (
  SELECT c.sub, c.code, coalesce(n.cw, c.cw) AS cw
  FROM cb0 c LEFT JOIN cb1m n ON c.sub = n.sub AND c.code = n.code
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {_PQ_D2} ASC, c.code ASC) AS r
    FROM subs s JOIN cb1 c USING (sub)
  ) WHERE r = 1
),
q AS (SELECT vec_id AS query_vec_id, nrm AS qn FROM emb WHERE vec_id IN (0, 1, 2, 3, 4)),
qsubs AS (
  SELECT vec_id AS query_vec_id, sub, sv AS qsv FROM subs WHERE vec_id IN (0, 1, 2, 3, 4)
),
lut AS (
  SELECT qs.query_vec_id, qs.sub, c.code,
         list_dot_product(qs.qsv, c.cw) AS part,
         list_dot_product(c.cw, c.cw) AS cwn2
  FROM qsubs qs JOIN cb1 c USING (sub)
),
scored AS (
  SELECT l.query_vec_id, cd.vec_id,
         round(sum(l.part) / (q.qn * sqrt(sum(l.cwn2))), 6) AS cos_r
  FROM codes cd
  JOIN lut l ON cd.sub = l.sub AND cd.code = l.code
  JOIN q ON q.query_vec_id = l.query_vec_id
  WHERE cd.vec_id <> l.query_vec_id
  GROUP BY l.query_vec_id, cd.vec_id, q.qn
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_emb_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §III-C/V) — the billion-vector ANN
    layout: 4 coarse cells (md5-picked centroids → exact residuals),
    PQ over the RESIDUAL x − c(x) with 4×16 codebooks (one Lloyd round,
    dead codewords retained), nprobe=2 probe search scored against the
    reconstructions c + recon(codes). The whole pipeline — coarse
    assign, residual, codebook training, encode, ADC — follows the
    ivf_train/pq_train determinism discipline (6dp-rounded means and
    distances, ties by code/cell asc), so it has an exact SQL twin."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivfpq_topk(
        emb, EMB_QUERY_IDS, k=5, n_cells=4, nprobe=2, m=4, n_codes=16, n_iter=1
    )


def _sub_slices_sql(src: str, cols: str, out: str, m: int = 4, dsub: int = 16) -> str:
    """UNION ALL of the m subvector slices of a list column (the
    _pq_subs_sql pattern, parameterized over the source CTE)."""
    parts = [
        f"SELECT {cols}, {s} AS sub, {out}[{s * dsub + 1}:{(s + 1) * dsub}] AS sv FROM {src}"
        for s in range(m)
    ]
    return " UNION ALL ".join(parts)


SQL_EMB_IVFPQ_ANN = f"""
WITH {SQL_EMB},
cents AS (
  SELECT vec_id AS cell, v AS cv, nrm AS cn FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4
),
assign AS (
  SELECT vec_id, cell, r FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.cell ASC) AS r
    FROM emb e CROSS JOIN cents c
  ) WHERE r <= 2
),
rex AS (
  SELECT e.vec_id, a.cell,
         unnest(e.v) AS ev, unnest(c.cv) AS cvv,
         unnest(range(1, len(e.v) + 1)) AS pos
  FROM emb e JOIN assign a ON e.vec_id = a.vec_id AND a.r = 1
  JOIN cents c ON a.cell = c.cell
),
resid AS (
  SELECT vec_id, cell, array_agg(ev - cvv ORDER BY pos) AS rv
  FROM rex GROUP BY vec_id, cell
),
rsubs AS ({_sub_slices_sql("resid", "vec_id", "rv")}),
seeds AS (
  SELECT vec_id AS code, rv FROM resid
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
cb0 AS (
  SELECT s.sub, d.code, s.sv AS cw
  FROM rsubs s JOIN seeds d ON s.vec_id = d.code
),
a0 AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {_PQ_D2} ASC, c.code ASC) AS r
    FROM rsubs s JOIN cb0 c USING (sub)
  ) WHERE r = 1
),
expl AS (
  SELECT a.sub, a.code, unnest(s.sv) AS val, unnest(range(1, len(s.sv) + 1)) AS pos
  FROM a0 a JOIN rsubs s ON a.vec_id = s.vec_id AND a.sub = s.sub
),
m1 AS (SELECT sub, code, pos, round(avg(val), 6) AS mval FROM expl GROUP BY 1, 2, 3),
cb1m AS (SELECT sub, code, array_agg(mval ORDER BY pos) AS cw FROM m1 GROUP BY 1, 2),
cb1 AS (
  SELECT c.sub, c.code, coalesce(n.cw, c.cw) AS cw
  FROM cb0 c LEFT JOIN cb1m n ON c.sub = n.sub AND c.code = n.code
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {_PQ_D2} ASC, c.code ASC) AS r
    FROM rsubs s JOIN cb1 c USING (sub)
  ) WHERE r = 1
),
csubs AS ({_sub_slices_sql("cents", "cell, cn", "cv")}),
ccw AS (
  SELECT cs.cell, cs.sub, c.code,
         list_dot_product(cs.sv, c.cw) AS cdotcw,
         list_dot_product(c.cw, c.cw) AS cwn2
  FROM csubs cs JOIN cb1 c USING (sub)
),
probes AS (
  SELECT vec_id AS query_vec_id, cell FROM assign
  WHERE r <= 2 AND vec_id IN (0, 1, 2, 3, 4)
),
qdotc AS (
  SELECT p.query_vec_id, p.cell,
         list_dot_product(e.v, c.cv) AS qc, e.nrm AS qn, c.cn
  FROM probes p JOIN emb e ON p.query_vec_id = e.vec_id
  JOIN cents c ON p.cell = c.cell
),
qraw AS (SELECT vec_id AS query_vec_id, v FROM emb WHERE vec_id IN (0, 1, 2, 3, 4)),
qsubs AS ({_sub_slices_sql("qraw", "query_vec_id", "v")}),
qlut AS (
  SELECT qs.query_vec_id, qs.sub, c.code,
         list_dot_product(qs.sv, c.cw) AS qpart
  FROM qsubs qs JOIN cb1 c USING (sub)
),
cand AS (SELECT cd.vec_id, cd.sub, cd.code, r.cell FROM codes cd JOIN resid r USING (vec_id)),
agg AS (
  SELECT p.query_vec_id, c.vec_id, c.cell,
         sum(ql.qpart) AS qrec, sum(cw.cdotcw) AS crec, sum(cw.cwn2) AS rn2
  FROM cand c
  JOIN probes p USING (cell)
  JOIN qlut ql ON ql.query_vec_id = p.query_vec_id AND ql.sub = c.sub AND ql.code = c.code
  JOIN ccw cw ON cw.cell = c.cell AND cw.sub = c.sub AND cw.code = c.code
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT a.query_vec_id, a.vec_id,
         round((d.qc + a.qrec) / (d.qn * sqrt(d.cn * d.cn + 2 * a.crec + a.rn2)), 6) AS cos_r
  FROM agg a JOIN qdotc d ON a.query_vec_id = d.query_vec_id AND a.cell = d.cell
  WHERE a.vec_id <> a.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos_r,
         CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY cos_r DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


OPS_QUERIES_REG = {
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_components": q_dedup_components,
    "dedup_apply": q_dedup_apply,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_fingerprint": q_dedup_fingerprint,
    "dedup_embedding": q_dedup_embedding,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_lsh_ann": q_emb_lsh_ann,
    "emb_lsh_multiprobe": q_emb_lsh_multiprobe,
    "emb_ivf_topk": q_emb_ivf_topk,
    "emb_ivf_trained": q_emb_ivf_trained,
    "emb_rp_ann": q_emb_rp_ann,
    "emb_pq_ann": q_emb_pq_ann,
    "emb_ivfpq_ann": q_emb_ivfpq_ann,
    "text_token_counts": q_text_token_counts,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_decode": q_multimodal_decode,
    "packed_vectors": q_packed_vectors,
    "events_minutely": q_events_minutely,
}

OPS_ORACLE_SQL = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "dedup_apply": SQL_DEDUP_APPLY,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
    "dedup_fingerprint": SQL_DEDUP_FINGERPRINT,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "emb_cosine_topk": SQL_EMB_COSINE_TOPK,
    "emb_lsh_ann": SQL_EMB_LSH_ANN,
    "emb_lsh_multiprobe": SQL_EMB_LSH_MULTIPROBE,
    "emb_ivf_topk": SQL_EMB_IVF_TOPK,
    "emb_ivf_trained": SQL_EMB_IVF_TRAINED,
    "emb_rp_ann": SQL_EMB_RP_ANN,
    "emb_pq_ann": SQL_EMB_PQ_ANN,
    "emb_ivfpq_ann": SQL_EMB_IVFPQ_ANN,
    "text_token_counts": SQL_TEXT_TOKEN_COUNTS,
    "text_quality": SQL_TEXT_QUALITY,
    "text_lang_id": SQL_TEXT_LANG_ID,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "packed_vectors": SQL_PACKED_VECTORS,
    "events_minutely": SQL_EVENTS_MINUTELY,
}
