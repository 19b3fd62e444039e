"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree on
keys, and a representative subset cross-checks against DuckDB at the
smoke scale. (Full sweep: python tools/check_oracle.py <sf_dir>.)"""

import importlib.util
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import norm_rows  # noqa: E402


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "n_active_keys", "latest_ts", "latest_value_total"}


def test_oracle_keys_subset_of_queries():
    mod = _load_entry()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    # every query has an oracle pair — the stateful CDC replays persist
    # their generated logs, and the fitted-k-means IVF persists its
    # deterministic centroids, so each oracle replays the same bytes
    assert set(q) == set(o)


@pytest.mark.parametrize(
    "name",
    ["w1_lww_latest_window", "d2_minhash_signatures", "t1_text_profile",
     "s1_ann_cosine_topk", "s3_ann_cosine_ivf", "d6_ngram_jaccard"],
)
def test_query_matches_oracle(spark, sf_dir, name):
    mod = _load_entry()
    sdf = mod.queries()[name](spark, sf_dir)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    res = con.execute(mod.oracle_sql()[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    s_rows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert norm_rows(sdf.columns, s_rows) == norm_rows(d_cols, d_rows)
