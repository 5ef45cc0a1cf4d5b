from project_gutenberg_full_text_search_spark.opds.feeds import (  # noqa: F401
    OpdsFeeds,
    parse_field,
    parse_pagination,
    url_with_params,
)
