"""Property-based LWW merge semantics: for ANY event log (random keys,
ops, duplicate deliveries, arbitrary batch splits, any strategy), the
engine's final table state must equal a trivial dict-replay model.

hypothesis drives the log shapes; the model is ~10 lines of Python that
is obviously correct, so a divergence is an engine bug by construction.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from panorama_elt_spark.cdc.merge import merge_batch
from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema

SCHEMA = TableSchema(
    [
        Field(1, "repo", "string", False),
        Field(2, "path", "string", False),
        Field(3, "content", "string"),
    ],
    schema_version=1,
)

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "b"), ("r2", "c")]

# an event: (key_idx, op, content_idx); lsn = position in the list.
events_strategy = st.lists(
    st.tuples(
        st.integers(0, len(KEYS) - 1),
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 9),
    ),
    min_size=1,
    max_size=40,
)


def model_replay(events):
    """The obviously-correct model: last op per key wins, deletes drop."""
    state = {}
    for key_idx, op, cidx in events:
        key = KEYS[key_idx]
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = f"c{cidx}"
    return {k + (v,) for k, v in state.items()}


def to_rows(events, *, duplicate_every=3):
    rows = []
    for lsn, (key_idx, op, cidx) in enumerate(events):
        repo, path = KEYS[key_idx]
        content = None if op == "D" else f"c{cidx}"
        rows.append((lsn, op, repo, path, content))
        if lsn % duplicate_every == 0:  # at-least-once re-delivery
            rows.append((lsn, op, repo, path, content))
    return rows


@pytest.mark.parametrize("strategy", ["fused", "append_delta"])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(events=events_strategy, split=st.integers(1, 39))
def test_engine_matches_model(spark, tmp_path_factory, strategy, events, split):
    df = spark.createDataFrame(
        to_rows(events), "lsn long, op string, repo string, path string, content string"
    )
    root = tmp_path_factory.mktemp("prop") / "t"
    t = LakeTable.create(spark, str(root), SCHEMA, ["repo", "path"], n_buckets=4)
    from pyspark.sql import functions as F

    cut = min(split, len(events))
    merge_batch(t, df.filter(F.col("lsn") < cut), "b0", strategy=strategy)
    merge_batch(t, df.filter(F.col("lsn") >= cut), "b1", strategy=strategy)
    got = {tuple(r) for r in t.read().select("repo", "path", "content").collect()}
    assert got == model_replay(events)
