"""Multi-dimensional data layout: Z-order (Morton) clustering.

A 100 TB table filtered on TWO columns can only be partition-pruned on one
of them with linear sort layouts; interleaving the bits of both keys gives
every file a small bounding box in BOTH dimensions, so min/max row-group
skipping works for either predicate (the technique behind Delta/Iceberg
OPTIMIZE ZORDER). Z-order is codegen bit arithmetic; Hilbert defaults to
a vectorized Arrow kernel for its iterative recurrence (measured 10x over
the interpreter-bound JVM fold, which remains available — see
hilbert_value). The rescale uses one tiny min/max aggregate broadcast
back, so a layout pass is one extra shuffle (the range repartition) over
the data."""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "zorder_value",
    "zorder_layout",
    "zorder_bucket_stats",
    "hilbert_value",
    "hilbert_layout",
    "parquet_skipping_stats",
]


def _interleave(cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each (already rescaled) column: bit i of
    column d lands at position i * ndims + d. Pure shift/and/or chains —
    whole-stage codegen, ~bits*ndims ops."""
    ndims = len(cols)
    pieces = []
    for d, c in enumerate(cols):
        for i in range(bits):
            pieces.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * ndims + d
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), pieces)


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = "__z"
) -> DataFrame:
    """Add the Morton code of ``cols`` as ``out_col``: each column is
    affinely rescaled to [0, 2^bits) from its GLOBAL min/max (one tiny
    aggregate, broadcast back — no window), floored, and bit-interleaved.

    ``bits * len(cols)`` must stay < 63 (the code is a long). Null inputs
    rescale to 0 — nulls cluster at the curve's origin."""
    if bits * len(cols) >= 63:
        raise ValueError(f"bits={bits} x {len(cols)} dims overflows a long")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
        ]
    ranges = df.agg(*aggs)
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        frac = (F.col(c).cast("double") - lo) / F.when(hi > lo, hi - lo).otherwise(
            F.lit(1.0)
        )
        scaled.append(
            F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(F.coalesce(frac, F.lit(0.0)) * (1 << bits)).cast("long"),
                ),
            )
        )
    return df.crossJoin(F.broadcast(ranges)).withColumn(
        out_col, _interleave(scaled, bits)
    ).drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def hilbert_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "__h",
    impl: str = "kernel",
) -> Column | DataFrame:
    """Add the 2-D HILBERT index of ``cols`` as ``out_col``. Same rescale
    contract as :func:`zorder_value` (global min/max → [0, 2^bits),
    nulls → 0); the curve index is the classic xy2d recurrence (one
    rotate-and-accumulate step per bit level).

    Two implementations, selected by ``impl`` and test-pinned equal
    (integer math — no float-order caveats, so the DuckDB oracle matches
    either):

    - ``"kernel"`` (default): the recurrence vectorized over Arrow
      batches in numpy — 16 passes over int64 arrays. Measured at sf0.1
      lineitem (600k rows): 0.4 s vs the fold's 4.4 s.
    - ``"fold"``: ONE ``F.aggregate`` over the level sequence with a
      (x, y, d) struct accumulator — JVM-side, UDF-free, but Catalyst
      evaluates higher-order-function lambdas in the INTERPRETER
      (~7 µs/row here; unrolling into plain codegen-able expressions is
      not an option because each level references the previous x/y
      several times, so the collapsed expression tree grows ~4^bits).
      Kept for UDF-free deployments and as the cross-check.

    Why offer it next to Z-order: Hilbert has no long curve jumps, so a
    rectangular predicate touches fewer curve segments than the Morton
    curve at the same file count (measured in README). 2-D only — use
    zorder_value for 3+ dims."""
    if len(cols) != 2:
        raise ValueError("hilbert_value is 2-D; use zorder_value for other dims")
    if bits * 2 >= 63:
        raise ValueError(f"bits={bits} x 2 dims overflows a long")
    if impl not in ("kernel", "fold"):
        raise ValueError(f"impl must be 'kernel' or 'fold', got {impl!r}")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
        ]
    ranges = df.agg(*aggs)
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        frac = (F.col(c).cast("double") - lo) / F.when(hi > lo, hi - lo).otherwise(
            F.lit(1.0)
        )
        scaled.append(
            F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(F.coalesce(frac, F.lit(0.0)) * (1 << bits)).cast("long"),
                ),
            )
        )

    if impl == "kernel":

        @pandas_udf("long")
        def xy2d(xs: pd.Series, ys: pd.Series) -> pd.Series:
            if len(xs) == 0:
                return pd.Series([], dtype="int64")
            x = xs.to_numpy(dtype=np.int64).copy()
            y = ys.to_numpy(dtype=np.int64).copy()
            d = np.zeros_like(x)
            s = np.int64(1 << (bits - 1))
            while s > 0:
                rx = ((x & s) > 0).astype(np.int64)
                ry = ((y & s) > 0).astype(np.int64)
                d += s * s * ((3 * rx) ^ ry)
                mx = np.where(rx == 1, s - 1 - x, x)
                my = np.where(rx == 1, s - 1 - y, y)
                ry0 = ry == 0
                x, y = np.where(ry0, my, x), np.where(ry0, mx, y)
                s >>= 1
            return pd.Series(d)

        return (
            df.crossJoin(F.broadcast(ranges))
            .withColumn(out_col, xy2d(scaled[0], scaled[1]))
            .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
        )

    def step(acc: Column, s: Column) -> Column:
        # one xy2d rotate-and-accumulate level at side length s
        x, y, d = acc["x"], acc["y"], acc["d"]
        rx = F.when(x.bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        ry = F.when(y.bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        nd = d + s * s * ((F.lit(3).cast("long") * rx).bitwiseXOR(ry))
        # rotate the quadrant: on ry==0, mirror when rx==1, then swap x/y
        mx = F.when(rx == 1, s - 1 - x).otherwise(x)
        my = F.when(rx == 1, s - 1 - y).otherwise(y)
        nx = F.when(ry == 0, my).otherwise(x)
        ny = F.when(ry == 0, mx).otherwise(y)
        return F.struct(nx.alias("x"), ny.alias("y"), nd.alias("d"))

    # the level sequence is the literal array of side lengths s =
    # 2^(bits-1) .. 1 (descending), folded left to right
    levels = F.array(
        *[F.lit(1 << (bits - 1 - i)).cast("long") for i in range(bits)]
    )
    h = F.aggregate(
        levels,
        F.struct(
            scaled[0].alias("x"),
            scaled[1].alias("y"),
            F.lit(0).cast("long").alias("d"),
        ),
        step,
        lambda acc: acc["d"],
    )
    return df.crossJoin(F.broadcast(ranges)).withColumn(out_col, h).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def hilbert_layout(
    df: DataFrame, cols: list[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Cluster ``df`` along the 2-D Hilbert curve of ``cols``:
    range-repartition + sort on the curve index (the zorder_layout shape
    with the jump-free curve)."""
    h = hilbert_value(df, cols, bits)
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        h.repartitionByRange(int(parts), "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional locality: range-repartition +
    sort on the Morton code of ``cols``. Write the result with any sink and
    every output file covers a small rectangle in all ``cols`` — min/max
    skipping then prunes on ANY of them."""
    z = zorder_value(df, cols, bits)
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        z.repartitionByRange(int(parts), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def hilbert_bucket_stats(
    df: DataFrame, cols: list[str], bits: int = 16, buckets_log2: int = 8
) -> DataFrame:
    """Locality audit for the Hilbert layout — zorder_bucket_stats' twin:
    bucket the curve index into ``2^buckets_log2`` segments and report
    each segment's row count and per-column min/max spans."""
    h = hilbert_value(df, cols, bits)
    shift = bits * 2 - buckets_log2
    return h.groupBy(
        F.shiftright("__h", shift).alias("h_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            a
            for c in cols
            for a in (
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            )
        ],
    )


def parquet_skipping_stats(path: str, box: dict[str, tuple]) -> dict:
    """Row-group / file skipping audit for a rectangular predicate
    ``{col: (lo, hi)}``: read each parquet footer's per-row-group min/max
    (the exact statistics Spark's pushed-down parquet filter prunes on —
    a row group whose [min, max] misses the box is never decompressed)
    and count how many row groups / files / rows a scan with that
    predicate must touch.

    Driver-side metadata audit (footers only, no data pages) — the tool
    that turns zorder_layout's locality claim into a measured
    files-touched number against a linear layout of the same data.
    Returns {files, files_hit, row_groups, row_groups_hit, rows,
    rows_in_hit_groups}."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = {
        "files": 0,
        "files_hit": 0,
        "row_groups": 0,
        "row_groups_hit": 0,
        "rows": 0,
        "rows_in_hit_groups": 0,
    }
    # recurse: optimize_parquet produces Hive-partitioned leaves, so a
    # top-level-only glob at the store root would silently report
    # all-zero counts (reading as "everything skipped"). Mirror
    # _list_data_files and audit every leaf; raise if nothing matches.
    files = sorted(
        f
        for f in glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
        # exclude compactor staging dirs: a crashed compact_parquet
        # leaves leaf__precompact (recovered on its next run) and an
        # in-flight one keeps leaf__compacting — counting those would
        # double every row in the audit
        if "__precompact" not in f and "__compacting" not in f
    )
    if not files:
        raise FileNotFoundError(
            f"parquet_skipping_stats: no *.parquet files under {path!r} "
            "(pass the store root; partitioned leaves are recursed)"
        )
    for f in files:
        md = pq.ParquetFile(f).metadata
        out["files"] += 1
        file_hit = False
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            out["row_groups"] += 1
            out["rows"] += rg.num_rows
            hit = True
            for j in range(rg.num_columns):
                col = rg.column(j)
                name = col.path_in_schema
                if name not in box:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot skip, stays hit
                lo, hi = box[name]
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            if hit:
                out["row_groups_hit"] += 1
                out["rows_in_hit_groups"] += rg.num_rows
                file_hit = True
        if file_hit:
            out["files_hit"] += 1
    return out


def zorder_bucket_stats(
    df: DataFrame, cols: list[str], bits: int = 16, buckets_log2: int = 8
) -> DataFrame:
    """Locality audit: bucket the Morton code into ``2^buckets_log2``
    curve segments and report each segment's row count and per-column
    min/max spans — the quantity min/max file skipping actually prunes on.
    Small output (one row per non-empty bucket), deterministic."""
    z = zorder_value(df, cols, bits)
    shift = bits * len(cols) - buckets_log2
    out = z.groupBy(
        F.shiftright("__z", shift).alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            a
            for c in cols
            for a in (
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            )
        ],
    )
    return out
