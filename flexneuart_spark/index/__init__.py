from flexneuart_spark.index.codec import decode_postings, encode_postings  # noqa: F401
from flexneuart_spark.index.builder import build_index, IndexTables  # noqa: F401
