from .ottl import compile_ottl
from .scalars import (
    attr,
    first_non_nil,
    normalize_path,
    ottl_concat,
    parse_sql,
    remove_query_params,
    span_kind_to_string,
)

__all__ = [
    "attr",
    "compile_ottl",
    "first_non_nil",
    "normalize_path",
    "ottl_concat",
    "parse_sql",
    "remove_query_params",
    "span_kind_to_string",
]
