from pdf_parser_spark.streaming.incremental import (  # noqa: F401
    stream_extract,
)
