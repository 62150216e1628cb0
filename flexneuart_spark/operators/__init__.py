from flexneuart_spark.operators import (  # noqa: F401
    coord_ascent,
    dedup,
    features,
    lambdamart,
    model1,
    multimodal,
    pipeline,
    similarity,
    text_analysis,
)
