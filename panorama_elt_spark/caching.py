"""Persist-barrier lifecycle for composable operators.

Several operators (LSH dedup, ANN, the nested parent fill) materialize
an intermediate behind ``persist()`` because it is consumed by more
than one branch of the plan — without the barrier the upstream work
re-executes per branch. But an operator cannot unpersist its own
barrier: the returned DataFrame is lazy, and the cache must live until
the *caller* runs the terminal action. Leaving it pinned instead leaks
executor memory across a long-lived session composing many operators
(the t2-style pipeline).

``persist_scope`` closes that gap: operators register every barrier
with the innermost active scope via ``track_persist``, and the scope
releases them all when the caller's action is done::

    with persist_scope():
        df = minhash_lsh_pairs(docs)
        rows = df.collect()        # terminal action inside the scope
    # barriers released; executor storage back to empty

Without an active scope ``track_persist`` degrades to a plain
``persist()`` (the caller owns release — e.g. via
``spark.catalog.clearCache()``), so one-shot scripts keep working
unchanged. Scopes nest (inner scopes release only their own barriers)
and are thread-local, so concurrent driver threads — the CDC stats
prefetch, notebook cells — never release each other's caches.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_local = threading.local()


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()``, registered with the innermost active
    ``persist_scope`` (if any) for release on scope exit."""
    df.persist()
    stack = getattr(_local, "stack", None)
    if stack:
        stack[-1].append(df)
    return df


class persist_scope:
    """Context manager releasing every barrier tracked inside it."""

    def __enter__(self) -> "persist_scope":
        if not hasattr(_local, "stack"):
            _local.stack = []
        self._dfs: list[DataFrame] = []
        _local.stack.append(self._dfs)
        return self

    def __exit__(self, *exc) -> bool:
        _local.stack.pop()
        for df in self._dfs:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
        return False
