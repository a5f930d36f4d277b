"""Physical layout helpers: Z-order clustering for multi-dimensional data
skipping.

Parquet scans prune row groups whose column min/max statistics exclude the
predicate.  A single-column sort gives tight statistics on that column only;
Z-ordering interleaves the bits of several columns so that *each* row group
covers a small hyper-rectangle of the key space — point or range predicates
on ANY of the clustered columns then exclude most row groups (≈ N^(1-1/d)
of them for d dimensions), which is how engines with OPTIMIZE ZORDER BY
(Delta, Hudi, Iceberg's sort orders) buy scan locality without an index.

Everything is codegen expressions: a one-pass min/max aggregate normalizes
each column to ``bits``-bit integers (driver-side scalars — a layout-time
decision, same as the advisor's bucket choice), then the interleave is a
fixed chain of shift/and/or terms.  ``repartitionByRange`` on the z-value
plus ``sortWithinPartitions`` yields files whose row groups tile the curve.

Scale: this is a write-time operation (one extra range shuffle over the
data being laid out, the same cost class as bucketBy); the payoff is every
subsequent scan.  Used for the fact-table layouts the advisor cannot serve
with a single bucket key — e.g. events filtered sometimes by user and
sometimes by value band.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale col into [0, 2^bits) as a long; constant range collapses to 0."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    top = (1 << bits) - 1
    scaled = ((col.cast("double") - F.lit(lo)) / F.lit(span)) * F.lit(top)
    return F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(top))


def z_value(norm_cols: list[Column], bits: int) -> Column:
    """Bit-interleave ``bits``-bit normalized columns into one z-value."""
    d = len(norm_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(norm_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def _as_numeric(df: DataFrame, col: str) -> Column:
    """A double-valued expression for any orderable column: timestamps and
    dates go through an epoch-seconds cast (the advisor recommends
    Z-ordering on whatever the workload filters on — date columns chief
    among them for TPC-H-shaped scans); strings map to an order-preserving
    numeric surrogate (the advisor also recommends Z-ordering on string
    filter columns like part.p_type, where a blind double-cast is
    malformed); everything else casts directly."""
    dt = df.schema[col].dataType.simpleString()
    c = F.col(col)
    if dt.startswith("timestamp_ntz"):
        c = c.cast("timestamp")
    if dt.startswith(("timestamp", "date")):
        return c.cast("timestamp").cast("double")
    if dt == "string":
        # big-endian value of the first 7 UTF-8 bytes, right-padded in hex
        # to fixed width: < 2^56 so it is EXACT in a double, and the fixed
        # width makes it order-preserving on the prefix ("b" > "ab" must
        # hold after the mapping) — clustering needs an orderable
        # surrogate, not the value itself; NULLs collapse to 0 (clustered
        # together at the low end, same as a NULLS FIRST sort)
        h = F.rpad(F.hex(F.substring(c.cast("binary"), 1, 7)), 14, "0")
        return F.coalesce(F.conv(h, 16, 10).cast("double"), F.lit(0.0))
    return c.cast("double")


def zorder(df: DataFrame, cols: list[str], bits: int = 8, n_files: int = 16) -> DataFrame:
    """Return ``df`` re-arranged along the Z-curve of ``cols``; write the
    result to get row groups that prune on every clustered column."""
    nums = {c: _as_numeric(df, c) for c in cols}
    row = df.agg(
        *[F.min(nums[c]).alias(f"lo{i}") for i, c in enumerate(cols)],
        *[F.max(nums[c]).alias(f"hi{i}") for i, c in enumerate(cols)],
    ).first()
    norms = [
        _normalize(nums[c], float(row[f"lo{i}"]), float(row[f"hi{i}"]), bits)
        for i, c in enumerate(cols)
    ]
    zed = df.withColumn("__z", z_value(norms, bits))
    return (
        zed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
