"""Reference-semantics relational operators, Spark-first.

Each function re-expresses one operator family from SURVEY.md §2 over
arbitrary input DataFrames. Joins lean on Catalyst/AQE for strategy
(small dims get an explicit ``broadcast`` hint — at 100 TB the fact side
never moves for a dim join); aggregations use built-ins that keep
map-side partial aggregation (``count_if``, ``max_by``, ``min_by``),
never UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def left_join_chain(
    fact: DataFrame,
    dims: list[tuple],
) -> DataFrame:
    """The reference's J1: a fact table left-joined through a chain of
    dimensions (``openedx_view_enrollments.sql:40-49`` joins 7+ dims).

    ``dims``: [(df, on)] or [(df, on, broadcast: bool)]. Broadcast is
    opt-in per dimension and must be claimed only for *bounded* tables
    (nation, region — tables whose size is independent of the fact
    scale): a broadcast side that grows with the data (orders, customer)
    OOMs executors at 100×. Unhinted sides are left to Catalyst/AQE,
    which picks broadcast when the runtime size allows and falls back to
    shuffled join otherwise — the scale-safe default.
    """
    out = fact
    for dim in dims:
        df, on = dim[0], dim[1]
        bcast = dim[2] if len(dim) > 2 else False
        out = out.join(F.broadcast(df) if bcast else df, on=on, how="left")
    return out


def conditional_count_pivot(
    df: DataFrame,
    group_cols: list[str],
    pivots: dict[str, Column],
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """A1: GROUP BY + ``count_if(predicate)`` columns — the role→boolean
    pivot of ``openedx_view_student_courseaccessrole.sql:1-12``."""
    aggs = [F.count_if(pred).alias(name) for name, pred in pivots.items()]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def argminmax_summary(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    firsts: dict[str, str],
    lasts: dict[str, str],
    csv_cols: dict[str, str] | None = None,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """A2+A3: per-group argmin/argmax (``max_by``/``min_by``) plus
    order-preserving list-agg joined to CSV strings
    (``openedx_view_student_manualenrollment.sql:1-16``).

    The CSV agg sorts *within groups only* (array_sort over collected
    structs) — no global sort, so the plan is one hash aggregate.
    """
    aggs: list[Column] = []
    for out, src in firsts.items():
        aggs.append(F.min_by(F.col(src), F.col(order_col)).alias(out))
    for out, src in lasts.items():
        aggs.append(F.max_by(F.col(src), F.col(order_col)).alias(out))
    for out, src in (csv_cols or {}).items():
        packed = F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(src).alias("v"))))
        aggs.append(F.array_join(F.transform(packed, lambda s: s["v"].cast("string")), ",").alias(out))
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def changed_keys(
    df: DataFrame, key_cols: list[str], ts_col: str, lookback_expr: str
) -> DataFrame:
    """P4+P6/A4: the reference's change discovery —
    ``SELECT DISTINCT <keys> WHERE ts >= now() - interval``
    (``mysql_datasource.py:258-272``) — anchored to max(ts) so it is
    deterministic. The filter is pushed to the scan; DISTINCT is a
    partial-aggregated hash aggregate."""
    cutoff = df.agg(F.max(ts_col).alias("m")).select(
        (F.col("m") - F.expr(lookback_expr)).alias("cutoff")
    )
    return (
        df.join(F.broadcast(cutoff))
        .filter(F.col(ts_col) >= F.col("cutoff"))
        .select(*key_cols)
        .distinct()
    )


def lww_latest_window(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """The LWW niche (SURVEY.md §2.6): latest row per key via
    ``row_number() = 1`` with a total order (ties broken by trailing
    order columns)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J3: existence filter (the Mongo ``$in`` semi-join,
    ``course_structures_datasource.py:153``)."""
    return left.join(F.broadcast(right.select(*on).distinct()), on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """Complement of J3 — e.g. keys deleted upstream."""
    return left.join(F.broadcast(right.select(*on).distinct()), on=on, how="left_anti")


def fill_parents(
    levels: list[tuple[DataFrame, str, str | None]],
) -> DataFrame:
    """J4 (edge-list form): the bounded parent-child tree as a union of
    per-level (node, parent, level) projections — a fixed-depth plan, no
    recursion operator. The reference's full semantics — copying parent
    display names *into child rows* through 5 fixed levels
    (``course_structures_datasource.py:389-438``) — live in
    ``operators.nested.fill_parent_attrs`` (iterative self-join).

    ``levels``: [(df, node_col, parent_col_or_None)] ordered root→leaf,
    where each non-root df already carries its parent's node column.
    """
    parts = []
    for depth, (df, node_col, parent_col) in enumerate(levels):
        parts.append(
            df.select(
                F.col(node_col).cast("string").alias("node"),
                (F.col(parent_col).cast("string") if parent_col else F.lit(None).cast("string")).alias("parent"),
                F.lit(depth).alias("level"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
