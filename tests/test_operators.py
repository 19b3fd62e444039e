"""Operator-level contracts added in round 2: multimodal kernel parity,
LSH hot-bucket capping, scale-safe blocking, fill_parents attribute
copy-down, nested-document flatten."""

import pytest
from pyspark.sql import functions as F

from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema
from panorama_elt_spark.operators import multimodal, nested, similarity, textdedup
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


def test_kmeans_centroids_deterministic_and_converging(spark, sf_dir):
    from panorama_elt_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    c1, inertia1 = similarity.kmeans_centroids(emb, k=4, iters=3)
    c2, inertia2 = similarity.kmeans_centroids(emb, k=4, iters=3)
    assert c1 == c2 and inertia1 == inertia2  # pure function of (data, seed)
    assert len(c1) == 4 and all(len(c) == 64 for c in c1)
    # Lloyd updates never increase inertia
    assert all(b <= a + 1e-9 for a, b in zip(inertia1, inertia1[1:]))
    # fitted centroids beat the first-N stand-in on the same data
    emb_v = emb.select(F.col("vec_id"), F.col("embedding"))
    fitted_cells = similarity.ivf_cells(emb_v, centroids=c1)
    assert fitted_cells.select("cid").distinct().count() <= 4
    assert fitted_cells.count() == emb.count()


def test_ivf_topk_with_fitted_centroids(spark, sf_dir):
    from panorama_elt_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = similarity.kmeans_centroids(emb, k=4, iters=2)
    out = similarity.cosine_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 3), k=5, centroids=cents
    )
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    assert all(1 <= r["rank"] <= 5 for r in rows)


def test_left_join_chain_broadcasts_only_hinted_dims(spark, sf_dir):
    """j1's scale policy: with auto-broadcast off, exactly the 4 bounded
    dims compile to BroadcastHashJoin; orders/customer take the shuffle
    path (AQE may upgrade them at runtime from observed sizes — that is
    the intended toy-SF behavior, not a plan property)."""
    from panorama_elt_spark.queries import j1_left_join_chain

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            j1_left_join_chain(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("BroadcastHashJoin") == 4
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


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


def test_kmeans_assignment_paths_agree(spark, sf_dir):
    """The O(k)-literal-expression argmin and the broadcast-join +
    min(struct) argmin are the same function: identical centroids and
    inertias at k=8 (and the auto switch picks join above k=16)."""
    from panorama_elt_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    c_lit, i_lit = similarity.kmeans_centroids(emb, k=8, iters=2, assign="literal")
    c_join, i_join = similarity.kmeans_centroids(emb, k=8, iters=2, assign="join")
    assert c_lit == c_join
    assert i_lit == i_join
    # the scale path also runs standalone at a k where literal would be
    # a degenerate expression tree
    c_big, i_big = similarity.kmeans_centroids(emb, k=24, iters=1, assign="auto")
    assert len(c_big) == 24 and len(i_big) == 1


def test_ivf_nprobe_recall_superset(spark, sf_dir):
    """nprobe=2 probes a superset of nprobe=1's candidate lists, so per
    query the nprobe=2 top-k cosine at any rank is >= the nprobe=1 one
    (recall can only improve)."""
    from panorama_elt_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    r1 = similarity.cosine_topk_ivf(emb, q, k=5, n_centroids=4, nprobe=1)
    r2 = similarity.cosine_topk_ivf(emb, q, k=5, n_centroids=4, nprobe=2)
    s1 = {(r["query_id"], r["rank"]): r["cos_sim"] for r in r1.collect()}
    s2 = {(r["query_id"], r["rank"]): r["cos_sim"] for r in r2.collect()}
    for key, sim1 in s1.items():
        assert s2[key] >= sim1


def test_simhash64_identical_and_disjoint(spark):
    """64-bit fingerprints: identical docs have hamming 0 (and land in
    every chunk bucket together); unrelated docs are far apart."""
    from panorama_elt_spark.operators.textdedup import simhash64_df, simhash_near_dupes

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely unrelated legal boilerplate paragraph here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sh = {r["doc_id"]: r["simhash"] for r in simhash64_df(df, "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    assert bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1") > 3
    pairs = simhash_near_dupes(
        df, "doc_id", "text", n_bits=64, n_chunks=4, max_hamming=3
    ).collect()
    assert {(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs} == {(1, 2, 0)}


def test_persist_scope_releases_operator_barriers(spark, sf_dir):
    """Cache hygiene: every persist barrier an operator pins is released
    when the caller's persist_scope exits, so a long-lived session
    composing many operators (the t2 pattern) accumulates no executor
    storage. Checked against the session CacheManager — the registry
    DataFrame.persist actually uses."""
    from panorama_elt_spark import queries as Q
    from panorama_elt_spark.caching import persist_scope, track_persist

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()  # clean slate regardless of earlier tests
    assert cache_mgr.isEmpty()
    for name in [
        "d3_minhash_lsh_pairs", "d6_ngram_jaccard", "s2_ann_cosine_lsh",
        "s3_ann_cosine_ivf", "s4_ann_cosine_ivf_kmeans", "j4b_fill_parent_attrs",
    ]:
        with persist_scope():
            rows = Q.queries()[name](spark, sf_dir).collect()
            assert len(rows) >= 0
            assert not cache_mgr.isEmpty()  # the barrier was real
        assert cache_mgr.isEmpty(), f"{name} leaked persist barriers"

    # nesting: the inner scope releases only its own barrier
    df_outer = track_persist(spark.range(10).toDF("id"))  # no scope active
    with persist_scope():
        track_persist(spark.range(5).toDF("id")).count()
        with persist_scope():
            track_persist(spark.range(3).toDF("id")).count()
        # inner released; outer scope's barrier still cached
        assert not cache_mgr.isEmpty()
    # without an active scope track_persist degrades to plain persist
    assert not cache_mgr.isEmpty()
    df_outer.unpersist()
    assert cache_mgr.isEmpty()


def test_ivf_query_join_shapes_parity(spark, sf_dir):
    """cosine_topk_ivf's query side auto-switches broadcast→shuffled cid
    join above the broadcast limit; both physical shapes return the
    identical result set."""
    from panorama_elt_spark.operators import similarity
    from panorama_elt_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)

    def run(**kw):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in similarity.cosine_topk_ivf(emb, q, k=5, n_centroids=4, **kw).collect()
        )

    bcast = run(broadcast_queries=True)
    shuffled = run(broadcast_queries=False)
    auto_small = run()  # 8 queries → broadcast branch
    auto_forced_shuffle = run(broadcast_query_limit=2)  # 8 > 2 → cid join
    assert bcast == shuffled == auto_small == auto_forced_shuffle
    assert len(bcast) > 0
