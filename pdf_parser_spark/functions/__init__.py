from pdf_parser_spark.functions.scalars import (  # noqa: F401
    additive_keyword_score,
    bbox_height,
    bbox_width,
    chunk_id,
    distance_to_similarity,
    image_display,
    keyword_hit,
    null_safe_length,
    similarity_decay,
    table_linearize_sql,
    truncate_ellipsis,
)
