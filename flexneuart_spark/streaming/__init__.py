from flexneuart_spark.streaming.incremental import (  # noqa: F401
    list_segments,
    start_incremental_index,
)
