"""Z-order clustered write layout — multi-dimensional data skipping.

A table laid out sorted on one column skips beautifully on that column
and not at all on any other.  Interleaving the bits of two (or more)
bucketed sort keys into one Morton/Z-value and range-partitioning the
write on it gives every output file a NARROW min/max envelope on ALL
participating columns simultaneously, so parquet footer statistics can
skip most files/row-groups for predicates on any of them — the layout
optimization a 100 TB fact table needs when queries filter on more than
one dimension (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER``,
from public literature: Morton 1966; the Z-curve locality argument).

This is a WRITE-side operator: the one-time clustering job pays one
range shuffle; every subsequent scan benefits.  Bucketing uses
uniform-width buckets over the column min/max (one tiny agg) — swap in
approx-quantile boundaries for heavily skewed columns (documented
caveat; the interleave itself is unchanged).

Reference analogue: none (the reference has no storage layout layer);
engine-added scale infrastructure like ``sources/bucketing.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the Z-value (2 dims x 10 bits = 20-bit curve).
Z_BITS = 10


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Uniform-width bucket id in [0, 2^bits) for a numeric column."""
    span = max(hi - lo, 1e-12)
    raw = F.floor((col.cast("double") - F.lit(lo))
                  / F.lit(span) * F.lit(1 << bits)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit((1 << bits) - 1))


def z_value(b1: Column, b2: Column, bits: int = Z_BITS) -> Column:
    """Interleave two ``bits``-wide bucket ids into one Morton code:
    bit i of b1 -> bit 2i, bit i of b2 -> bit 2i+1.  Pure bitwise
    Column arithmetic — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)),
                        2 * i + 1))
    return z


def zorder_write(df: DataFrame, path: str, col1: str, col2: str, *,
                 bits: int = Z_BITS, n_files: int = 16) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of (col1, col2):
    bucket both columns over their global min/max, interleave, range-
    partition into ``n_files`` and sort within each — every file gets a
    tight min/max envelope on BOTH columns."""
    stats = df.agg(F.min(col1), F.max(col1),
                   F.min(col2), F.max(col2)).first()
    lo1, hi1, lo2, hi2 = (float(v) for v in stats)
    z = z_value(_bucket(F.col(col1), lo1, hi1, bits),
                _bucket(F.col(col2), lo2, hi2, bits), bits)
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def file_envelopes(path: str, *cols: str) -> list[dict]:
    """Per-parquet-file min/max footer statistics for ``cols`` — the
    exact metadata a stats-based scan planner prunes with.  Used by the
    layout tests to PROVE the multi-dimensional skipping property."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        env = {"file": os.path.basename(f)}
        for c in cols:
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema == c and col.statistics:
                        mins.append(col.statistics.min)
                        maxs.append(col.statistics.max)
            env[c] = (min(mins), max(maxs)) if mins else None
        out.append(env)
    return out
