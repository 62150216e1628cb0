"""IBM Model 1 translation-likelihood scoring (SURVEY.md §2.8 C7).

Reference semantics (``letor/FeatExtrModel1Similarity.java:150-200``,
full/no-truncation path):

- per-doc source-word distribution ``p(w|d) = tf_w / doc_len``
  (``:146-153`` — ``aSourceWordProb``);
- per query word q: ``tot(q,d) = Σ_w T(q|w)·p(w|d)`` over translation
  probs ``T ≥ minModel1Prob`` (``:160-171``);
- collection smoothing: ``cp(q) = max(probOOV, P_collection(q))``
  (``:174``), ``P_collection`` the unigram collection probability;
- word score ``log((1−λ)·tot + λ·cp) − log(λ·cp)`` (``:181-182``) —
  zero when tot = 0, so only docs sharing a translated term matter;
- doc score = Σ_q qtf_q · wordScore(q) / max(1, |unique query terms|)
  (``computeOverallScore``, ``:200-221``).

The reference learns T from GIZA bitext; training is an external MGIZA
subprocess there and out of scope here (SURVEY §7.0). Scoring is fully
relational. ``first_char_tran_table`` builds a deterministic synthetic
table (self-translation mass ``prob_self``, the rest df-weighted over
terms sharing the first character) so the operator is testable end-to-end
against a SQL oracle with no external model.

Typical parameter values from the reference's experiment descriptors
(``scripts/gen_exper_desc/gen_model1_exper_json_desc.py:40-65``):
probSelfTran grid incl. 0.5, λ grid incl. 0.05, minModel1Prob 2.5e-3;
probOOV default 1e-9 (``FeatExtrModel1Similarity.java:91``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROB_SELF_TRAN = 0.5
MODEL1_LAMBDA = 0.05
MIN_MODEL1_PROB = 2.5e-3
PROB_OOV = 1e-9


def first_char_tran_table(
    dfreq: DataFrame, q_vocab: DataFrame, prob_self: float = PROB_SELF_TRAN
) -> DataFrame:
    """Deterministic synthetic translation table restricted to target
    words in ``q_vocab`` (scoring only ever consults T(q|·) for query
    terms, ``FeatExtrModel1Similarity.java:160-171``):

      T(q|w) = prob_self                         if q = w (1.0 if w is
                                                 alone in its group)
             = (1−prob_self)·df(q)/(Σ_g df − df(w))   for q ≠ w sharing
                                                 w's first character.

    ``dfreq``: (term, df). ``q_vocab``: (term). Returns (w_term, q_term, p).
    """
    grp = dfreq.select("term", F.substring("term", 1, 1).alias("c"), "df")
    gsum = grp.groupBy("c").agg(F.sum("df").alias("sdf"), F.count("*").alias("n"))
    qg = grp.join(q_vocab.select("term").distinct(), "term").select(
        F.col("term").alias("q_term"), "c", F.col("df").alias("q_df")
    )
    w = grp.select(F.col("term").alias("w_term"), "c", F.col("df").alias("w_df"))
    return (
        w.join(qg, "c")
        .join(gsum, "c")
        .select(
            "w_term",
            "q_term",
            F.when(
                F.col("w_term") == F.col("q_term"),
                F.when(F.col("n") == 1, F.lit(1.0)).otherwise(F.lit(prob_self)),
            )
            .otherwise(
                F.lit(1.0 - prob_self) * F.col("q_df") / (F.col("sdf") - F.col("w_df"))
            )
            .alias("p"),
        )
    )


def model1_scores(
    docs_tok: DataFrame,
    q_tok: DataFrame,
    tran: DataFrame,
    lambda_: float = MODEL1_LAMBDA,
    min_prob: float = MIN_MODEL1_PROB,
    oov_prob: float = PROB_OOV,
) -> DataFrame:
    """(query_id, doc_id, score) for docs sharing ≥1 translated term.

    ``docs_tok``: (doc_id, tokens); ``q_tok``: (query_id, tokens);
    ``tran``: (w_term, q_term, p). Pure relational plan: two explodes,
    one translation join, two aggregations — no UDFs."""
    dl = docs_tok.select("doc_id", F.size("tokens").cast("long").alias("doc_len")).filter(
        F.col("doc_len") > 0
    )
    tf = (
        docs_tok.select("doc_id", F.explode("tokens").alias("w_term"))
        .groupBy("doc_id", "w_term")
        .agg(F.count("*").alias("tf"))
    )
    ctf = tf.groupBy("w_term").agg(F.sum("tf").alias("ctf"))
    total = dl.agg(F.sum("doc_len").alias("total_tokens"))

    qterms = q_tok.select("query_id", F.explode("tokens").alias("q_term")).groupBy(
        "query_id", "q_term"
    ).agg(F.count("*").alias("qtf"))
    qnorm = qterms.groupBy("query_id").agg(
        F.greatest(F.lit(1), F.count("*")).cast("double").alias("qnorm")
    )

    # collection probability of each query term (OOV floor)
    cp = (
        qterms.select("q_term").distinct()
        .join(ctf.withColumnRenamed("w_term", "q_term"), "q_term", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "q_term",
            F.greatest(F.lit(oov_prob), F.coalesce(F.col("ctf") / F.col("total_tokens"), F.lit(0.0))).alias("cp"),
        )
    )

    p_src = tf.join(dl, "doc_id").select("doc_id", "w_term", (F.col("tf") / F.col("doc_len")).alias("p_src"))
    tot = (
        p_src.join(F.broadcast(tran.filter(F.col("p") >= min_prob)), "w_term")
        .groupBy("doc_id", "q_term")
        .agg(F.sum(F.col("p") * F.col("p_src")).alias("tot"))
    )
    contrib = (
        tot.join(F.broadcast(qterms), "q_term")
        .join(F.broadcast(cp), "q_term")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * (
                    F.log(F.lit(1.0 - lambda_) * F.col("tot") + F.lit(lambda_) * F.col("cp"))
                    - F.log(F.lit(lambda_) * F.col("cp"))
                )
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("s"))
        .join(F.broadcast(qnorm), "query_id")
        .select("query_id", "doc_id", (F.col("s") / F.col("qnorm")).alias("score"))
    )


# ---------------------------------------------------------------------------
# IBM Model 1 EM training (closes the training side of C7)
# ---------------------------------------------------------------------------

NULL_TOKEN = "@NULL@"  # GIZA's empty word (vocab id 0); '@' never tokenizes


def _normalize_per_source(df: DataFrame, value_col: str) -> DataFrame:
    """(s_term, t_term, value) → (s_term, t_term, p) with Σ_t p = 1 per s.

    Deliberately groupBy + equi-join, NOT ``sum over
    Window.partitionBy(s_term)``: the window funnels a hot source term's
    whole translation distribution into a single task, while the groupBy
    partial-aggregates map-side (one shuffled row per (s_term, map
    partition)) and the join back is skew-splittable by AQE.
    """
    totals = df.groupBy("s_term").agg(F.sum(value_col).alias("_tot"))
    return df.join(totals, "s_term").select(
        "s_term", "t_term", (F.col(value_col) / F.col("_tot")).alias("p")
    )


def model1_em_train(
    pairs: DataFrame,
    iterations: int = 5,
    include_null: bool = True,
) -> DataFrame:
    """Train an IBM Model 1 translation table T(t|s) with EM over parallel
    sentence pairs — the Spark-native replacement for the reference's
    external MGIZA subprocess (``scripts/giza/run_mgiza.sh:11-20`` runs
    ``plain2snt``/``snt2cooc``/``mgiza`` for ``GIZA_ITER_QTY`` Model 1
    iterations over the bitext that ``apps/CreateBitextFromQRELs.java``
    emits; ``scripts/giza/create_tran.sh:124-136`` orchestrates).

    ``pairs``: (pair_id, src_tokens: array<string>, tgt_tokens:
    array<string>). Returns (s_term, t_term, p) with Σ_t p = 1 per s —
    the same (w_term, q_term, p) shape ``model1_scores`` consumes after
    renaming.

    Semantics (Brown et al. 1993, the classic Model 1 EM):

    - init: T0(t|s) uniform over s's co-occurrence support;
    - E-step, per pair p and target token t (multiplicity cnt_t):
      z(p,t) = Σ_s cnt_s(p)·T(t|s); posterior count
      c(s,t) += cnt_t·cnt_s(p)·T(t|s)/z(p,t);
    - M-step: T'(t|s) = c(s,t)/Σ_t' c(s,t');
    - the NULL source word (``include_null``, GIZA default) joins every
      pair once, absorbing unaligned target mass.

    Scale posture (100 TB bitext): the working set is the co-occurrence
    table — Σ_p |unique src|·|unique tgt| rows, bounded because bitext
    chunks are capped at ratio·|query| words (``q_bitext_pairs``); it is
    computed ONCE, persisted, and every EM round reuses it. Each round is
    two joins + three aggregations, all keyed by (s,t) or (pair,t) — no
    per-word hot key, since the finest-grained groupBy always includes t
    or pair, and partial aggregation combines map-side. The M-step
    normalization is a groupBy("s_term") + join rather than a window over
    ``partitionBy("s_term")``: a window would materialize a hot source
    term's ENTIRE translation distribution in one partition, while the
    groupBy partial-aggregates map-side (the shuffle carries one row per
    (s_term, partition)) and the join back is an equi-join AQE can split
    on skew. The model is ``localCheckpoint``-ed per round to truncate
    lineage. Cost is O(iterations·|cooc|) with no driver-side data
    movement.
    """
    src = (
        pairs.select("pair_id", F.explode("src_tokens").alias("s_term"))
        .groupBy("pair_id", "s_term")
        .agg(F.count("*").cast("double").alias("cnt_s"))
    )
    if include_null:
        src = src.unionByName(
            pairs.select(
                "pair_id",
                F.lit(NULL_TOKEN).alias("s_term"),
                F.lit(1.0).alias("cnt_s"),
            ).distinct()
        )
    tgt = (
        pairs.select("pair_id", F.explode("tgt_tokens").alias("t_term"))
        .groupBy("pair_id", "t_term")
        .agg(F.count("*").cast("double").alias("cnt_t"))
    )
    cooc = src.join(tgt, "pair_id").select(
        "pair_id", "s_term", "t_term", "cnt_s", "cnt_t"
    )
    cooc = cooc.persist()
    try:
        sup = cooc.select("s_term", "t_term").distinct()
        model = _normalize_per_source(
            sup.withColumn("_one", F.lit(1.0)), "_one"
        ).localCheckpoint()
        for _ in range(iterations):
            scored = cooc.join(model, ["s_term", "t_term"]).select(
                "pair_id",
                "s_term",
                "t_term",
                (F.col("cnt_s") * F.col("p")).alias("score"),
                "cnt_t",
            )
            z = scored.groupBy("pair_id", "t_term").agg(F.sum("score").alias("z"))
            counts = (
                scored.join(z, ["pair_id", "t_term"])
                .groupBy("s_term", "t_term")
                .agg(F.sum(F.col("cnt_t") * F.col("score") / F.col("z")).alias("c"))
            )
            model = _normalize_per_source(counts, "c").localCheckpoint()
        return model
    finally:
        cooc.unpersist()
