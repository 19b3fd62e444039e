"""Operator-level contracts added in round 2: multimodal kernel parity,
LSH hot-bucket capping, scale-safe blocking, fill_parents attribute
copy-down, nested-document flatten."""

import pytest
from pyspark.sql import functions as F

from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema
from panorama_elt_spark.operators import multimodal, nested, textdedup
from panorama_elt_spark.sources.testdata import load_table


def test_multimodal_builtin_matches_codec_path(spark, sf_dir):
    """The shipped built-in kernel and the mapInPandas codec extension
    point produce identical features — swapping a real decoder in only
    changes the `run` body, not the results contract."""
    docs = load_table(spark, sf_dir, "documents").limit(64)
    media = multimodal.documents_as_media(docs)

    def key(rows):
        return {
            r["media_id"]: (r["byte_len"], r["digest"], round(r["fake_dim0"], 12))
            for r in rows
        }

    builtin = key(multimodal.extract_features_builtin(media).collect())
    codec = key(multimodal.extract_features(media).collect())
    assert builtin == codec
    assert len(builtin) == 64


def test_multimodal_builtin_plan_has_no_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(8)
    plan = (
        multimodal.extract_features_builtin(multimodal.documents_as_media(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython / MapInPandas


def test_fill_parent_attrs_copies_ancestor_names(spark):
    """The true J4 semantics: child rows carry their ancestors' display
    names through the fixed 5-level walk (ref
    course_structures_datasource.py:389-438)."""
    docs = nested.generate_course_docs(spark, n_courses=3)
    flat = nested.flatten_blocks(nested.filter_published(docs))
    out = nested.fill_parent_attrs(flat, max_depth=4)
    rows = {r["block_id"]: r for r in out.collect()}
    assert len(rows) == flat.count()  # every published block reachable
    comp = next(r for r in rows.values() if r["block_type"] == "component")
    c = comp["block_id"].split(".")[0]
    assert comp["level"] == 4
    assert comp["course_name"] == f"Course {c[1:]}"
    assert comp["chapter_name"].startswith("Chapter ")
    assert comp["sequential_name"].startswith("Seq ")
    assert comp["vertical_name"].startswith("Vert ")
    root = next(r for r in rows.values() if r["block_type"] == "course")
    assert root["level"] == 0
    assert root["chapter_name"] is None and root["vertical_name"] is None


def test_nested_existence_filter_drops_unpublished(spark):
    docs = nested.generate_course_docs(spark, n_courses=20)
    n_all = docs.count()
    n_pub = nested.filter_published(docs).count()
    assert 0 < n_pub < n_all  # the fixture plants unpublished courses


def test_lsh_hot_bucket_cap_drops_boilerplate(spark):
    """A degenerate boilerplate bucket (30 byte-identical docs) is
    dropped by the cap; genuinely small near-dup buckets survive."""
    boiler = [(i, "the same boilerplate text repeated again and again ok") for i in range(30)]
    # tokenizer lowercases + squeezes whitespace → identical shingle sets
    pair = [
        (100, "alpha beta gamma delta epsilon zeta"),
        (101, "ALPHA  beta gamma delta epsilon zeta"),
    ]
    df = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    unc = {
        (r["doc_a"], r["doc_b"])
        for r in textdedup.minhash_lsh_pairs(
            df, "doc_id", "text", jaccard_threshold=0.0
        ).collect()
    }
    cap = {
        (r["doc_a"], r["doc_b"])
        for r in textdedup.minhash_lsh_pairs(
            df, "doc_id", "text", jaccard_threshold=0.0, max_bucket_size=8
        ).collect()
    }
    assert (100, 101) in unc and (100, 101) in cap
    assert unc - cap  # the boilerplate pairs existed uncapped...
    assert all(a < 100 and b < 100 for a, b in unc - cap)  # ...and only they were dropped


def test_register_and_drop_view(spark, tmp_path):
    schema = TableSchema([Field(1, "k", "string", False), Field(2, "v", "string")], 1)
    t = LakeTable.create(spark, str(tmp_path / "T"), schema, ["k"], n_buckets=4)
    t.register_view("t_view")
    assert spark.sql("SELECT count(*) AS n FROM t_view").collect()[0]["n"] == 0
    assert t.drop_view("t_view") is True
    assert t.drop_view("t_view") is False
    t.drop()
    import os

    assert not os.path.exists(t.root)
