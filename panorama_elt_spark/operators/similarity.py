"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, dot products via ``zip_with``/``aggregate`` in the
  JVM (no Python), rank per query. At 100 TB corpus scale this is one
  broadcast join + one window over |corpus|×|queries| rows — the
  baseline every ANN variant is measured against.
* ``cosine_topk_lsh`` — the scale path: random-hyperplane LSH (signs of
  dot products with deterministic hash-derived planes) buckets the
  corpus; each query probes only its bucket (and the exact rerank runs
  inside buckets). Recall < 1 by construction; the bench compares both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..caching import track_persist


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    # cast + norm are computed once per row and materialized: inlined
    # into the broadcast-join projection they re-evaluate per (query,
    # corpus-row) pair — |q|× redundant work over the whole corpus. At
    # warehouse scale the normalized projection is a persisted table.
    c = track_persist(corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv"))))
    q = track_persist(queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv"))))
    sim = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_signs(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix from md5 parity — a pure
    constant (computed once on the driver, broadcast as literals), so no
    per-row hashing and the same planes are reproducible in any engine."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{seed}|{p}|{i}".encode()).digest()[0] % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 42, first_plane: int = 0
) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(v · h_p), planes
    ``first_plane..first_plane+n_planes-1`` from ``plane_signs``
    (sign-pattern constants folded by Catalyst)."""
    signs = plane_signs(dim, first_plane + n_planes, seed)
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(s) for s in signs[first_plane + p]])
        proj = dot(_to_double(vec), plane)
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def embedding_neardup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.35,
    n_bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via *banded* hyperplane LSH
    (OR of ``n_bands`` AND-blocks of ``planes_per_band`` planes) with an
    exact-cosine verify — the classic SimHash-family block-then-verify.

    Scale bound: each band partitions the corpus into 2^planes_per_band
    buckets; raising ``planes_per_band`` grows bucket cardinality
    exponentially (and ``n_bands`` restores recall), so block width is a
    tunable O(|corpus| / 2^p) — never a fixed attribute domain whose
    blocks grow linearly with the data. Candidate generation self-joins
    only (vec_id, band, bucket); vectors and norms are computed once
    behind a persist barrier and join in per *pair*.

    Returns (vec_a, vec_b, cos_sim) with cos_sim >= threshold.
    """
    base = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            _to_double(F.col(vec_col)).alias("v"),
            *[
                hyperplane_bucket(
                    F.col(vec_col), dim, planes_per_band, seed, first_plane=b * planes_per_band
                ).alias(f"bkt{b}")
                for b in range(n_bands)
            ],
        )
        .withColumn("nrm", norm(F.col("v")))
    )
    base = track_persist(base)
    buckets = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"bkt{b}").alias("bucket"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bucket")
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.vec_id") < F.col("b.vec_id"),
            ],
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    vecs = base.select("vec_id", "v", "nrm")
    pairs = (
        cand.join(
            vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")),
            on="vec_a",
        )
        .join(
            vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")),
            on="vec_b",
        )
    )
    cos = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos_sim")
    return (
        pairs.select("vec_a", "vec_b", cos)
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    seed: int = 42,
    assign: str = "auto",
) -> tuple[list[list[float]], list[float]]:
    """Distributed Lloyd k-means over the embedding column — the real
    centroid provider for IVF (replacing the deterministic first-N
    stand-in when index quality matters).

    * init: the k rows with the smallest md5(seed‖id) — a deterministic
      hash-ordered sample (k-means‖-style seeding without RNG state, so
      the fit reproduces at any parallelism).
    * iterate: assign = argmin squared-L2; update = per-dimension mean
      via ``posexplode`` + one partial-aggregated groupBy((cid, dim)) —
      the only shuffle per iteration carries (cid, dim, partial sums),
      never vectors.
    * driver state: k×dim floats per iteration — constants, not data.

    Two assignment shapes (``assign``):

    * ``"literal"`` — the centroids are folded in as O(k) literal
      expressions; map-only (zero shuffle), ideal at small k but the
      expression tree grows linearly with k and breaks down at real
      index sizes (k ≈ 64k).
    * ``"join"`` — the centroid *table* broadcast-joins the corpus and a
      lexicographic ``min(struct(d2, cid))`` per vid picks the argmin —
      the shape that survives any k (the broadcast is k×dim doubles; the
      extra exchange carries (vid, d2, cid), never vectors twice).
    * ``"auto"`` — literal for k ≤ 16, join above.

    Both produce identical assignments (ties → lowest cid; parity is
    pytest-asserted). Returns (centroids, inertia-per-iteration);
    inertia is non-increasing under Lloyd updates and the test asserts
    it.
    """
    if assign not in ("auto", "literal", "join"):
        raise ValueError(f"unknown assign strategy {assign!r}")
    use_join = assign == "join" or (assign == "auto" and k > 16)
    spark = corpus.sparkSession
    base = (
        corpus.select(F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("v"))
        .persist()
    )
    seeds = (
        base.select("vid", "v", F.md5(F.concat(F.lit(str(seed)), F.col("vid").cast("string"))).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    cents = [list(r["v"]) for r in seeds]
    inertias: list[float] = []
    for _ in range(iters):
        if use_join:
            cents_df = spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
                "cid int, cv array<double>",
            )
            d2 = F.aggregate(
                F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            scored = base.join(F.broadcast(cents_df)).select(
                "vid", d2.alias("d2"), "cid"
            )
            best_by_vid = scored.groupBy("vid").agg(
                F.min(F.struct(F.col("d2"), F.col("cid"))).alias("m")
            )
            assigned = base.join(best_by_vid, on="vid").select(
                "vid", "v", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2")
            )
        else:
            # nearest centroid by squared L2 against literal matrices
            d2s = [
                F.aggregate(
                    F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in cents
            ]
            pairs = F.array(
                *[F.struct(d2.alias("d2"), F.lit(i).alias("i")) for i, d2 in enumerate(d2s)]
            )
            best = F.array_min(pairs)  # lexicographic: min d2, ties → lowest cid
            assigned = base.select(
                "vid", "v", best["i"].cast("int").alias("cid"), best["d2"].alias("d2")
            )
        agg = (
            assigned.select("cid", "d2", F.posexplode("v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.sum("x").alias("sx"), F.count("*").alias("n"), F.sum("d2").alias("sd2"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        total_d2, total_n = 0.0, 0
        for r in agg:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = r["sx"] / r["n"]
            counts[r["cid"]] = r["n"]
            if r["dim"] == 0:
                total_d2 += r["sd2"]
                total_n += r["n"]
        inertias.append(total_d2 / max(total_n, 1))
        new_cents = []
        for ci in range(len(cents)):
            dims = by_cid.get(ci)
            if not dims:  # empty cluster keeps its centroid
                new_cents.append(cents[ci])
            else:
                new_cents.append([dims[d] for d in range(len(cents[ci]))])
        cents = new_cents
    base.unpersist()
    return cents, inertias


def _prep_vecs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", norm(F.col("v")))


def _centroid_frame(
    c: DataFrame, n_centroids: int, centroids: list[list[float]] | None
) -> DataFrame:
    """(cid, cv, cn). Default centroids are the first ``n_centroids``
    corpus vectors by id — a deterministic, engine-portable stand-in
    (keeps the DuckDB oracle exact). Pass ``centroids`` (e.g. from
    ``kmeans_centroids``) for a quality-fitted index."""
    if centroids is not None:
        spark = c.sparkSession
        return spark.createDataFrame(
            [(i, [float(x) for x in cv]) for i, cv in enumerate(centroids)],
            "cid int, cv array<double>",
        ).select("cid", "cv", norm(F.col("cv")).alias("cn"))
    return c.filter(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )


def _assign_cells(c: DataFrame, cents: DataFrame, nprobe: int = 1) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (argmax, ties → lowest centroid id). The centroid side is broadcast,
    so assignment is a map-only stage — no shuffle over the corpus.
    Returns (vid, v, nrm, cid), one row per probed cell."""
    scored = c.join(F.broadcast(cents)).select(
        "vid",
        "v",
        "nrm",
        "cid",
        F.round(
            dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6
        ).alias("ccos"),
    )
    wa = Window.partitionBy("vid").orderBy(F.col("ccos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= nprobe)
        .select("vid", "v", "nrm", "cid")
    )


def ivf_cells(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF coarse quantization of the corpus (every vector in exactly
    one cell). Returns (vid, v, nrm, cid)."""
    c = track_persist(_prep_vecs(corpus, id_col, vec_col))
    return _assign_cells(c, _centroid_frame(c, n_centroids, centroids), 1)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 8,
    centroids: list[list[float]] | None = None,
    nprobe: int = 1,
    broadcast_queries: bool | None = None,
    broadcast_query_limit: int = 100_000,
) -> DataFrame:
    """IVF-style approximate top-k: quantize corpus + queries to
    centroid cells, then exact cosine rerank within the query's
    ``nprobe`` nearest cells. Same output shape as ``cosine_topk``. At
    scale the cell join shuffles on cid — each task scans one inverted
    list, so work per query is nprobe × |cell|, not |corpus|; raising
    ``nprobe`` buys recall linearly in probed-list size (the standard
    IVF recall knob, lifting the nprobe=1 blind spot of a query sitting
    near a cell boundary). Pass ``centroids`` from ``kmeans_centroids``
    for a fitted index.

    Query-batch safety: a *small* query set broadcasts into the cell
    join (map-only rerank); above ``broadcast_query_limit`` rows the
    join auto-switches to a shuffled cid join, so handing the operator
    a huge query batch degrades to one bounded exchange instead of
    blowing the driver's broadcast budget (mirrors the k-means
    literal→join auto). ``broadcast_queries`` forces either shape; both
    produce identical results (pytest parity)."""
    # materialize the normalized corpus + inverted index once — the
    # query branch and the corpus branch both read them (at warehouse
    # scale these are persisted tables)
    c = track_persist(_prep_vecs(corpus, id_col, vec_col))
    cents = _centroid_frame(c, n_centroids, centroids)
    cells = track_persist(_assign_cells(c, cents, 1))
    q_ids = queries.select(F.col(id_col).alias("vid"))
    if nprobe == 1:
        q_cells = cells.join(q_ids, on="vid", how="left_semi")
    else:
        # the query side probes its top-nprobe cells; corpus rows stay
        # uniquely assigned, so a (query, neighbor) pair appears at most
        # once across probed cells — no dedup stage needed
        q_cells = _assign_cells(
            c.join(q_ids, on="vid", how="left_semi"), cents, nprobe
        )
    q = q_cells.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "cid",
    )
    if broadcast_queries is None:
        broadcast_queries = q_ids.count() <= broadcast_query_limit
    q_side = F.broadcast(q) if broadcast_queries else q
    sim = (
        cells.join(q_side, on="cid")
        .filter(F.col("query_id") != F.col("vid"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return sim.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: exact rerank within each query's LSH bucket.
    Same output shape as ``cosine_topk``; recall traded for a
    |bucket|-bounded join instead of the full cross product."""
    c = track_persist(corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cv"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).withColumn("cn", norm(F.col("cv"))))
    q = track_persist(queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qv"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).withColumn("qn", norm(F.col("qv"))))
    sim = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return sim.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
