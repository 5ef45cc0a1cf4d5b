from project_gutenberg_full_text_search_spark.streaming.incremental import (  # noqa: F401
    append_docs,
    refresh_derived,
    stream_refresh,
)
from project_gutenberg_full_text_search_spark.streaming.operators import (  # noqa: F401
    stream_dedup_exact,
    windowed_rollup,
)
