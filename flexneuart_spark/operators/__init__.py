from flexneuart_spark.operators import (  # noqa: F401
    dedup,
    features,
    model1,
    multimodal,
    pipeline,
    similarity,
    text_analysis,
)
