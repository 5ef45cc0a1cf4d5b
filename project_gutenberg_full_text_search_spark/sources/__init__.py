from project_gutenberg_full_text_search_spark.sources.tables import (  # noqa: F401
    load_testdata,
    read_table,
    write_table,
)
