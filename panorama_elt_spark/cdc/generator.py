"""Deterministic, distributed change-log synthesis (FIXTURES.md §1-2).

The 10^10-event CDC log is *defined*, not stored: every attribute of
event ``lsn`` is a pure hash function of ``(seed, lsn)``, computed with
built-in column expressions over ``spark.range(n)``. That makes the log

* reproducible at any scale and any parallelism (no RNG state, no
  ``rand()`` — SURVEY.md §7.4(3)),
* generable in parallel on every executor with zero shuffle,
* and scalable: tests run 10^4, bench 10^6-10^7, the same definition
  extrapolates to 10^10.

Shape per BASELINE.json.input_hint: key (repo, path), payload
(commit, lang, content). Properties guaranteed (FIXTURES.md §2):
Zipf-skewed keys (hot repos exercise skew handling), multiple updates
per key per batch, ~8% deletes, ~10% duplicated events (at-least-once
delivery), out-of-order arrival within a batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedupe import lww_dedupe_window

_LANGS = ["py", "scala", "java", "sql", "md", "yaml"]
_EXT = {"py": "py", "scala": "scala", "java": "java", "sql": "sql", "md": "md", "yaml": "yaml"}


@dataclass(frozen=True)
class ChangeLogSpec:
    n_events: int
    n_keys: int = 1000
    seed: int = 42
    n_orgs: int = 50
    skew_exponent: float = 3.0  # key_id = floor(n_keys * u^e); e=3 → top key ~ (1/n)^(1/3) of events
    delete_pct: int = 8
    duplicate_pct: int = 10
    # lsn ≥ this boundary carries schema_version 2 (adds `stars int`); -1 = single version
    schema_v2_from_lsn: int = -1


def _u01(col, salt: str, seed: int):
    """Deterministic uniform [0,1) from a column (hash-based, no RNG)."""
    return (
        F.pmod(F.xxhash64(col, F.lit(salt), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    )


def generate_change_log(spark: SparkSession, spec: ChangeLogSpec) -> DataFrame:
    """The ordered change stream: one row per (possibly duplicated) event.

    Columns: lsn bigint, op string(I/U/D), repo, path, commit, lang,
    content string, schema_version int, stars int (null pre-v2).
    """
    base = spark.range(0, spec.n_events).withColumnRenamed("id", "lsn")

    u_key = _u01(F.col("lsn"), "key", spec.seed)
    key_id = F.floor(F.pow(u_key, F.lit(spec.skew_exponent)) * spec.n_keys).cast("bigint")

    u_op = F.pmod(F.xxhash64(F.col("lsn"), F.lit("op"), F.lit(spec.seed)), F.lit(100))
    op = (
        F.when(u_op < spec.delete_pct, F.lit("D"))
        .when(u_op < spec.delete_pct + 30, F.lit("I"))
        .otherwise(F.lit("U"))
    )

    lang_idx = F.pmod(F.xxhash64(key_id, F.lit("lang"), F.lit(spec.seed)), F.lit(len(_LANGS)))
    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (lang_idx + 1).cast("int"))

    repo = F.format_string(
        "org%d/repo%d",
        F.pmod(key_id, F.lit(spec.n_orgs)).cast("int"),
        key_id.cast("int"),
    )
    d1 = F.pmod(F.xxhash64(key_id, F.lit("d1"), F.lit(spec.seed)), F.lit(8))
    d2 = F.pmod(F.xxhash64(key_id, F.lit("d2"), F.lit(spec.seed)), F.lit(16))
    path = F.format_string(
        "src/m%d/p%d/file_%d.%s", d1.cast("int"), d2.cast("int"), key_id.cast("int"), lang
    )

    commit = F.substring(
        F.sha2(F.concat_ws("|", repo, path, F.col("lsn").cast("string")), 256), 1, 40
    )
    # pseudo-source text, 64-4096 chars, pure function of (repo, path, lsn)
    blob = F.sha2(F.concat_ws("#", repo, path, F.col("lsn").cast("string"), F.lit(spec.seed)), 512)
    length = (64 + F.pmod(F.xxhash64(F.col("lsn"), F.lit("len"), F.lit(spec.seed)), F.lit(4032))).cast("int")
    content = F.substring(F.repeat(blob, 33), F.lit(1), length)  # 128*33 > 4096

    schema_version = (
        F.when(
            F.lit(spec.schema_v2_from_lsn >= 0) & (F.col("lsn") >= spec.schema_v2_from_lsn),
            F.lit(2),
        ).otherwise(F.lit(1))
    ).cast("int")
    stars = F.when(
        schema_version >= 2,
        F.pmod(F.xxhash64(F.col("lsn"), F.lit("stars"), F.lit(spec.seed)), F.lit(10_000)).cast("int"),
    )

    events = base.select(
        F.col("lsn"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        F.when(op != "D", commit).alias("commit"),
        F.when(op != "D", lang).alias("lang"),
        F.when(op != "D", content).alias("content"),
        schema_version.alias("schema_version"),
        F.when(op != "D", stars).alias("stars"),
    )

    # at-least-once delivery: ~duplicate_pct% of events appear twice,
    # byte-identical (same lsn) — idempotent apply must collapse them.
    dups = events.filter(
        F.pmod(F.xxhash64(F.col("lsn"), F.lit("dup"), F.lit(spec.seed)), F.lit(100))
        < spec.duplicate_pct
    )
    return events.unionAll(dups)


def expected_final_state(spark: SparkSession, spec: ChangeLogSpec) -> DataFrame:
    """Independent oracle: LWW by window row_number (a different physical
    plan than the engine's max_by aggregate), deletes dropped."""
    log = generate_change_log(spark, spec).dropDuplicates(["lsn"])
    final = lww_dedupe_window(log, ["repo", "path"], "lsn")
    return final.filter(F.col("op") != "D").drop("op")
