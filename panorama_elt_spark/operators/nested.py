"""Nested-document ingestion: existence filter on a nested field,
struct-array flatten, and the bounded parent→child attribute copy-down.

Mirrors the reference's course-structure pipeline
(``course_structures_datasource.py``):

* S5 — scan documents whose nested ``versions.published-branch`` exists
  (``course_structures_datasource.py:160-197``) → ``filter_published``.
* flatten — each document carries a ``blocks`` array of structs with a
  ``children`` id list (``:263-387``) → ``flatten_blocks`` /
  ``child_edges`` (explode, pure column ops — at 100 TB the explode is
  map-only, no shuffle).
* J4 — ``fill_parents`` walks ≤5 fixed levels copying parent display
  names *into child rows* (``:389-438``) → ``fill_parent_attrs``: a
  fixed-depth chain of self-joins on (course_id, parent_id). Each level
  is one shuffle on the edge key; depth is a constant (5), so the plan
  is 5 joins regardless of data size — no recursion operator, no
  driver-side iteration over rows.

The nested fixture is synthesized deterministically (pure function of a
seed) — a stand-in for the MongoDB ``modulestore.structures``
collection that needs no external service.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..caching import track_persist

DOC_SCHEMA = (
    "course_id string, "
    "versions struct<published_branch string, draft_branch string>, "
    "blocks array<struct<block_id string, block_type string, "
    "display_name string, children array<string>>>"
)

_LEVEL_TYPES = ["course", "chapter", "sequential", "vertical", "component"]


def generate_course_docs(
    spark: SparkSession, n_courses: int = 40, seed: int = 7
) -> DataFrame:
    """Deterministic nested course-structure documents: a 5-level block
    tree per course (course→chapter→sequential→vertical→component), some
    courses unpublished (null ``versions.published_branch`` — the S5
    filter must drop them). Fixture-sized; the operators below are the
    scale path, not this generator."""

    def h(s: str) -> int:
        return int.from_bytes(hashlib.md5(f"{seed}|{s}".encode()).digest()[:4], "big")

    rows = []
    for c in range(n_courses):
        course_id = f"course-v1:org{c % 7}+C{c}+run1"
        published = None if h(f"{c}|pub") % 5 == 0 else f"p{h(f'{c}|pb') % 16**8:08x}"
        versions = {"published_branch": published, "draft_branch": f"d{h(f'{c}|db') % 16**8:08x}"}
        blocks = []

        def add(block_id: str, block_type: str, name: str) -> dict:
            b = {"block_id": block_id, "block_type": block_type,
                 "display_name": name, "children": []}
            blocks.append(b)
            return b

        root = add(f"c{c}", "course", f"Course {c}")
        for ch in range(1 + h(f"{c}|nch") % 3):
            chap = add(f"c{c}.ch{ch}", "chapter", f"Chapter {c}.{ch}")
            root["children"].append(chap["block_id"])
            for sq in range(1 + h(f"{c}.{ch}|nsq") % 3):
                seq = add(f"c{c}.ch{ch}.s{sq}", "sequential", f"Seq {c}.{ch}.{sq}")
                chap["children"].append(seq["block_id"])
                for vt in range(1 + h(f"{c}.{ch}.{sq}|nvt") % 2):
                    ver = add(f"c{c}.ch{ch}.s{sq}.v{vt}", "vertical", f"Vert {c}.{ch}.{sq}.{vt}")
                    seq["children"].append(ver["block_id"])
                    for cp in range(1 + h(f"{c}.{ch}.{sq}.{vt}|ncp") % 3):
                        comp = add(
                            f"c{c}.ch{ch}.s{sq}.v{vt}.p{cp}",
                            "component",
                            f"Comp {c}.{ch}.{sq}.{vt}.{cp}",
                        )
                        ver["children"].append(comp["block_id"])
        rows.append((course_id, versions, blocks))
    return spark.createDataFrame(rows, DOC_SCHEMA)


def filter_published(docs: DataFrame) -> DataFrame:
    """S5: keep documents whose nested ``versions.published_branch``
    exists (ref ``course_structures_datasource.py:160-197`` — the Mongo
    ``{'versions.published-branch': {'$exists': true}}`` scan). The
    nested predicate pushes into the parquet scan (struct-field filter
    pushdown)."""
    return docs.filter(F.col("versions.published_branch").isNotNull())


def flatten_blocks(docs: DataFrame) -> DataFrame:
    """Explode the per-document block array into a flat block table
    (ref ``course_structures_datasource.py:263-387``)."""
    return docs.select("course_id", F.explode("blocks").alias("b")).select(
        "course_id",
        F.col("b.block_id").alias("block_id"),
        F.col("b.block_type").alias("block_type"),
        F.col("b.display_name").alias("display_name"),
        F.col("b.children").alias("children"),
    )


def child_edges(blocks_flat: DataFrame) -> DataFrame:
    """(course_id, parent_id, child_id) edge list from the children
    arrays."""
    return blocks_flat.select(
        "course_id",
        F.col("block_id").alias("parent_id"),
        F.explode("children").alias("child_id"),
    )


def fill_parent_attrs(
    blocks_flat: DataFrame, *, root_type: str = "course", max_depth: int = 4
) -> DataFrame:
    """The true J4: copy ancestor display names into every block row
    through ``max_depth`` fixed levels (ref
    ``course_structures_datasource.py:389-438``).

    Iterative self-join: level-d rows join the edge list to produce
    level-d+1 rows carrying the accumulated ancestor-name path; the
    union of all levels is the filled block table. Exactly
    ``max_depth`` joins — a constant-depth plan. Blocks not reachable
    from a ``root_type`` root are excluded (same as the reference,
    which walks down from the course root).

    Output: (course_id, block_id, block_type, display_name, level,
    course_name, chapter_name, sequential_name, vertical_name) — the
    *_name columns are the block's ancestors at tree levels 0-3 (null
    where the block is above that depth).
    """
    attrs = track_persist(blocks_flat.select(
        "course_id", "block_id", "block_type", "display_name"
    ))
    # referenced once per level — without the barrier the source explode
    # re-runs max_depth times
    edges = track_persist(child_edges(blocks_flat))
    cur = attrs.filter(F.col("block_type") == root_type).select(
        "course_id",
        "block_id",
        "block_type",
        "display_name",
        F.array("display_name").alias("anc"),
        F.lit(0).cast("int").alias("level"),
    )
    levels = [cur]
    for d in range(1, max_depth + 1):
        parents = cur.select(
            "course_id", F.col("block_id").alias("parent_id"), "anc"
        )
        cur = (
            parents.join(edges, on=["course_id", "parent_id"])
            .join(
                attrs.withColumnRenamed("block_id", "child_id"),
                on=["course_id", "child_id"],
            )
            .select(
                "course_id",
                F.col("child_id").alias("block_id"),
                "block_type",
                "display_name",
                F.concat(F.col("anc"), F.array("display_name")).alias("anc"),
                F.lit(d).cast("int").alias("level"),
            )
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    # F.get is null-safe out of bounds (element_at errors under ANSI)
    return out.select(
        "course_id",
        "block_id",
        "block_type",
        "display_name",
        "level",
        F.get("anc", 0).alias("course_name"),
        F.get("anc", 1).alias("chapter_name"),
        F.get("anc", 2).alias("sequential_name"),
        F.get("anc", 3).alias("vertical_name"),
    )
