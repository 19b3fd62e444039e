"""panorama_elt_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimagination of the capabilities of ``aulasneo/panorama-elt``
(reference surveyed in SURVEY.md): an ordered change-event stream
(insert/update/delete with LSN ordinals) is tailed and applied to a
lakehouse table with last-writer-wins semantics, schema evolution, and an
exactly-once idempotent sink — all expressed Spark-first (DataFrame/SQL,
Catalyst-optimized, zero per-row Python).

Layout:
    lakehouse/   snapshot-based table format (atomic commits, bucketed
                 copy-on-write MERGE, field-id schema evolution)
    cdc/         change-log generator, LWW dedupe, merge, checkpointed
                 replay engine with per-partition lineage
    operators/   relational + training-data operators (joins, aggs,
                 dedup, similarity search, text analysis, multimodal)
    sources/     batch sources (csv, jdbc-shaped, change-log)
    functions/   column-level functions (digest, normalize, typed views)
    streaming/   Structured Streaming variant of the CDC tail
"""

__version__ = "0.1.0"

from .caching import persist_scope, track_persist

__all__ = ["persist_scope", "track_persist"]
