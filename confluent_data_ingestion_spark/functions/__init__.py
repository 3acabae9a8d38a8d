from .dialect import translate_expr
from .exprs import (
    auto_expr,
    cast_wrap,
    choose_expr,
    rewrite_predicate_as_json,
    sanitize_predicate,
)

__all__ = [
    "translate_expr",
    "auto_expr",
    "cast_wrap",
    "choose_expr",
    "sanitize_predicate",
    "rewrite_predicate_as_json",
]
