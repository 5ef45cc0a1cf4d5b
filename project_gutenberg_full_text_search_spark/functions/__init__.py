from project_gutenberg_full_text_search_spark.functions import codec, hashing, text  # noqa: F401
