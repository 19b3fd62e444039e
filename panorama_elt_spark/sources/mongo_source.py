"""Mongo-shaped nested-document source — the datasource type behind the
reference's flagship course-structures pipeline
(``course_structures_datasource.py:143-197``: pymongo ``find`` with
``$exists`` / ``$in`` over ``modulestore.active_versions`` /
``structures``).

Spark-first recomposition: the *semantics* of those Mongo queries are
the nested operators (``operators/nested.py`` — ``filter_published`` is
the ``$exists`` scan, the structures semi-join is ``left_semi``), so
this module only supplies the document *scan*:

* **live path** (gated): a real deployment reads the collection through
  the MongoDB Spark connector (``format("mongodb")``). No connector jar
  ships in this sandbox, so the attempt surfaces as
  ``MongoUnavailable`` with a precise reason — the same contract as
  ``JdbcUnavailable``.
* **offline path**: ``location:`` points at nested-document parquet
  (the ``DOC_SCHEMA`` shape: ``course_id``, ``versions`` struct,
  ``blocks`` array of structs) — an exported/landed copy of the
  collection. Everything downstream (existence filter → flatten →
  parent fill) is identical for both paths, so the e2e pipeline is
  fully testable without a Mongo service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class MongoUnavailable(RuntimeError):
    pass


def read_mongo_docs(spark: SparkSession, ds: dict) -> DataFrame:
    """Scan a datasource's nested-document collection.

    ``ds`` keys: ``location`` (nested-doc parquet — offline path, wins
    when present) or ``uri`` + ``database`` + ``collection`` (live
    connector path, gated)."""
    location = ds.get("location")
    if location:
        return spark.read.parquet(location)
    uri, database, collection = ds.get("uri"), ds.get("database"), ds.get("collection")
    if not (uri and database and collection):
        raise MongoUnavailable(
            f"mongo datasource {ds.get('name', '?')!r} declares neither a "
            "nested-doc parquet 'location:' nor a full live target "
            "(uri + database + collection)"
        )
    try:
        return (
            spark.read.format("mongodb")
            .option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .load()
        )
    except Exception as exc:  # connector jar missing, host unreachable, ...
        raise MongoUnavailable(
            f"MongoDB read of {database}.{collection} failed (mongo-spark-"
            f"connector jar present? host reachable?): {exc}"
        ) from exc
