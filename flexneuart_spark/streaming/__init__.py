from flexneuart_spark.streaming.incremental import (  # noqa: F401
    list_segments,
    start_incremental_index,
)
from flexneuart_spark.streaming.stateful import (  # noqa: F401
    minutely_counts_stream,
    streaming_exact_dedup,
)
