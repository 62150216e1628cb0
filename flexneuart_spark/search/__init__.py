from flexneuart_spark.search.bm25 import bm25_topk_relational, tokens_df  # noqa: F401
from flexneuart_spark.search.engine import Searcher  # noqa: F401
