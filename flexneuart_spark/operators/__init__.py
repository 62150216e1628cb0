from flexneuart_spark.operators import dedup, multimodal, similarity, text_analysis  # noqa: F401
