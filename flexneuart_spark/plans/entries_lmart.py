"""Driver entry for RankLib LambdaMART tree-ensemble evaluation
(SURVEY.md §2.11; reference vendors the format at
``java/lemur-code-r2792-RankLib-trunk/.../learning/tree/Ensemble.java``,
eval shape ``letor/DataPointWrapper.java``).

The fixture model below is parsed by the REAL parser
(``io/ranklib.py::parse_ranklib_ensemble``) and evaluated two ways:
Spark scores with the vectorized numpy walk inside one pandas UDF
(``operators/features.py::ensemble_rerank``'s kernel); the DuckDB oracle
scores with a nested-CASE expression GENERATED from the same parsed
trees (``sql_ensemble_score_expr``) — one model, two derived evaluators,
zero drift surface.

Features are corpus statistics every LTR stack has on hand (doc length,
distinct terms, type/token ratio), computed identically JVM-side and in
SQL. Thresholds in the fixture are tuned to the sf corpus ranges so the
walk exercises every branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexneuart_spark.functions.tokenize import whitespace_tokens_col
from flexneuart_spark.io.ranklib import (
    parse_ranklib_ensemble,
    sql_ensemble_score_expr,
)

# A small LambdaMART model in RankLib's exact save format. Feature ids:
# 1 = n_tokens, 2 = n_distinct, 3 = type/token ratio.
LMART_FIXTURE_MODEL = """\
## LambdaMART
## No. of trees = 3
## No. of leaves = 4
<ensemble>
	<tree id="1" weight="0.1">
		<split>
			<feature> 1 </feature>
			<threshold> 40.0 </threshold>
			<split pos="left">
				<output> -1.5 </output>
			</split>
			<split pos="right">
				<feature> 2 </feature>
				<threshold> 18.0 </threshold>
				<split pos="left">
					<output> 0.5 </output>
				</split>
				<split pos="right">
					<output> 2.0 </output>
				</split>
			</split>
		</split>
	</tree>
	<tree id="2" weight="0.2">
		<split>
			<feature> 3 </feature>
			<threshold> 0.5 </threshold>
			<split pos="left">
				<output> 1.0 </output>
			</split>
			<split pos="right">
				<feature> 1 </feature>
				<threshold> 25.0 </threshold>
				<split pos="left">
					<output> -0.25 </output>
				</split>
				<split pos="right">
					<output> 0.75 </output>
				</split>
			</split>
		</split>
	</tree>
	<tree id="3" weight="0.05">
		<split>
			<output> 1.0 </output>
		</split>
	</tree>
</ensemble>
"""

_ENSEMBLE = parse_ranklib_ensemble(LMART_FIXTURE_MODEL)


def q_lambdamart_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the fixture LambdaMART ensemble over
    (n_tokens, n_distinct, ttr) features — (doc_id, lm_score)."""
    from flexneuart_spark.operators.features import ensemble_rerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = whitespace_tokens_col("text")
    feats = docs.select(
        F.lit("q0").alias("query_id"),
        F.col("doc_id"),
        F.size(toks).cast("double").alias("f_len"),
        F.size(F.array_distinct(toks)).cast("double").alias("f_dist"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("f_ttr"),
    )
    scored = ensemble_rerank(feats, _ENSEMBLE, ["f_len", "f_dist", "f_ttr"], k=1_000_000)
    return scored.select("doc_id", F.round("score", 6).alias("lm_score"))


_SCORE_EXPR = sql_ensemble_score_expr(_ENSEMBLE, ["f_len", "f_dist", "f_ttr"])

SQL_LAMBDAMART_SCORE = rf"""
WITH toklist AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
  FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(len(l) AS DOUBLE) AS f_len,
         CAST(len(list_distinct(l)) AS DOUBLE) AS f_dist,
         len(list_distinct(l)) * 1.0 / len(l) AS f_ttr
  FROM toklist
)
SELECT doc_id, round({_SCORE_EXPR}, 6) AS lm_score FROM feats
"""

LMART_QUERIES_REG = {"lambdamart_score": q_lambdamart_score}
LMART_ORACLE_SQL = {"lambdamart_score": SQL_LAMBDAMART_SCORE}
