"""Content normalization + digests — the vectorized replacement for the
reference's per-row Python string escaping.

The reference escapes ``\\`` → ``\\\\``, CR → literal ``\\r``, LF →
literal ``\\n`` one row and one field at a time in Python
(``mysql_datasource.py:38-51``) and pads datetimes to 6-digit
microseconds (``:47-49``). Here the same transforms are single Catalyst
expressions (whole-stage codegen, zero Python), and the content digest —
the engine's per-row invariant (BASELINE.json ``input_hint``) — is the
JVM-side ``sha2``; a pandas-UDF twin exists in operators/multimodal.py
for binary payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_BACKSLASH = "\\"
_CR = "\r"
_LF = "\n"


def escape_control_chars(col: Column) -> Column:
    """``\\`` → ``\\\\``, CR → ``\\r``, LF → ``\\n`` (reference F8)."""
    out = F.replace(col, F.lit(_BACKSLASH), F.lit(_BACKSLASH + _BACKSLASH))
    out = F.replace(out, F.lit(_CR), F.lit(_BACKSLASH + "r"))
    out = F.replace(out, F.lit(_LF), F.lit(_BACKSLASH + "n"))
    return out


def content_digest(col: Column) -> Column:
    """sha256 hex digest of a string column (the per-row invariant)."""
    return F.sha2(col, 256)


def micros_format(col: Column) -> Column:
    """Datetime → ``%Y-%m-%d %H:%M:%S.%f`` with 6-digit microseconds
    (reference F9, ``mysql_datasource.py:47-49``)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
