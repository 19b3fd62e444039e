"""Z-order (Morton) clustering for multi-dimension zone-map skipping.

A linear ``compact(sort_by=["ts"])`` gives each rolled file a disjoint
``ts`` window — range queries on ``ts`` skip files, but a predicate on
any *other* column still scans everything, because sorting on one key
scatters every other key across the whole bucket. Z-ordering interleaves
the bits of several columns' rank values into one sort key, so rows
close in the multi-dimensional space land in the same files and every
participating column gets a *narrow* zone-map window — the Delta
``OPTIMIZE ZORDER BY`` / Iceberg sort-order rewrite shape.

Built to stay entirely inside whole-stage codegen: each dimension is an
affine rescale of the column onto ``2**bits`` integer cells (bounds come
from the manifests' existing zone maps — no extra scan), and the Morton
interleave is a fixed tree of ``shiftright``/``bitwiseAND``/
``shiftleft``/``bitwiseOR`` built-ins. No UDF, no extra shuffle: the
expression feeds the same per-bucket ``sortWithinPartitions`` the linear
path uses, evaluated for the sort only (never materialized in the files).

Affine rescaling (not rank/ntile) is deliberate for the 100 TB design
point: a global rank needs either a total sort or an approx-quantile
pass over the data; the affine map needs two numbers per column that the
manifests already hold. Skewed columns degrade toward fewer effective
bits — layout quality, never correctness (zone maps remain exact).

Scale-relevant at 100 TB because the *planner* wins multiply: a query
windowing 1% of ``ts`` AND 1% of ``size`` plans ~``sqrt``-fewer files
under z-order than under either single-column sort.

Reference parity note: the reference has no layout control at all
(wholesale CSV re-upload, ``panorama_datalake.py:215-258``); this module
is a scale addition over the lakehouse layer, not a port.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, functions as F

# types an affine rescale onto integer cells is defined for (strings
# have no bounded affine embedding — callers put them last in a linear
# suffix instead)
ZORDERABLE_TYPES = {
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "date",
    "timestamp",
}

_MAX_TOTAL_BITS = 60  # stay clear of the long sign bit


def _as_double(col: Column, ddl_type: str) -> Column:
    """Monotonic numeric view of a column, Spark-side (timestamps/dates
    go through Spark's own casts so the session time zone is applied
    consistently to data and bounds alike)."""
    if ddl_type == "date":
        col = col.cast("timestamp")
    return col.cast("double")


def _bound_as_double(value, ddl_type: str) -> Column:
    """The manifest bound (``filestats.decode_bound`` output) as a
    double Column through the same cast chain as the data."""
    if isinstance(value, _dt.datetime):
        return F.lit(value.isoformat()).cast("timestamp").cast("double")
    if isinstance(value, _dt.date):
        return F.lit(value.isoformat()).cast("timestamp").cast("double")
    return F.lit(float(value)).cast("double")


def dimension_cell(col: Column, ddl_type: str, lo, hi, bits: int) -> Column:
    """Map ``col`` onto an integer cell in ``[0, 2**bits)`` by affine
    rescale over the inclusive ``[lo, hi]`` bounds. Values outside the
    bounds clamp to the edge cells; NULLs map to cell 0 (they sort
    together first — zone maps track null_count separately, so skipping
    is unaffected)."""
    cells = (1 << bits) - 1
    v = _as_double(col, ddl_type)
    lo_c = _bound_as_double(lo, ddl_type)
    hi_c = _bound_as_double(hi, ddl_type)
    span = hi_c - lo_c
    scaled = F.when(span <= F.lit(0.0), F.lit(0.0)).otherwise(
        (v - lo_c) / span * F.lit(float(cells))
    )
    cell = F.least(
        F.greatest(scaled, F.lit(0.0)), F.lit(float(cells))
    ).cast("long")
    return F.coalesce(cell, F.lit(0).cast("long"))


def interleave_bits(dims: list[Column], bits: int) -> Column:
    """Morton-interleave ``dims`` (long Columns in ``[0, 2**bits)``)
    into one long: bit ``i`` of dimension ``j`` lands at position
    ``i * len(dims) + j``, so all dimensions contribute equally at every
    scale of the curve."""
    n = len(dims)
    acc = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        for j, d in enumerate(dims):
            bit = F.shiftright(d, i).bitwiseAND(one)
            acc = acc.bitwiseOR(F.shiftleft(bit, i * n + j))
    return acc


def zorder_bits(n_dims: int) -> int:
    """Bits per dimension: as many as fit the long budget, capped at 16
    (65k cells per dimension out-resolves any realistic file count)."""
    return min(16, _MAX_TOTAL_BITS // max(n_dims, 1))


def zorder_key(
    cols: list[str],
    types_by_col: dict[str, str],
    bounds: dict[str, tuple],
    bits: int | None = None,
) -> Column:
    """The Z-order sort key over ``cols``. ``bounds[c]`` is the global
    inclusive ``(lo, hi)`` for each column (manifest-derived or from one
    bounds aggregate). Raises on a column whose type has no affine
    embedding — the caller decides the fallback, this module never
    silently degrades to a meaningless key."""
    for c in cols:
        t = types_by_col.get(c)
        if t not in ZORDERABLE_TYPES:
            raise ValueError(
                f"z-order needs an affinely-embeddable column; {c!r} has "
                f"type {t!r} (supported: {sorted(ZORDERABLE_TYPES)}). Put "
                "string columns in a linear sort suffix instead."
            )
        if c not in bounds or bounds[c][0] is None or bounds[c][1] is None:
            raise ValueError(f"z-order bounds unknown for column {c!r}")
    b = bits or zorder_bits(len(cols))
    dims = [
        dimension_cell(F.col(c), types_by_col[c], bounds[c][0], bounds[c][1], b)
        for c in cols
    ]
    return interleave_bits(dims, b)
