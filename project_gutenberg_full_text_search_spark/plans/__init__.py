from project_gutenberg_full_text_search_spark.plans.parser import (  # noqa: F401
    Clause,
    ParsedQuery,
    parse_websearch,
)
