from .normalize import escape_control_chars, content_digest, micros_format
from .typed_view import typed_view_columns, raw_string_columns

__all__ = [
    "escape_control_chars",
    "content_digest",
    "micros_format",
    "typed_view_columns",
    "raw_string_columns",
]
