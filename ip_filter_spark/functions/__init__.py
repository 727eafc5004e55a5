from ip_filter_spark.functions.text import (
    lang_id_expr,
    quality_exprs,
    token_count_expr,
    tokens_expr,
    fingerprint_expr,
)

__all__ = [
    "lang_id_expr",
    "quality_exprs",
    "token_count_expr",
    "tokens_expr",
    "fingerprint_expr",
]
