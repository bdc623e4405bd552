"""Z-order (Morton) clustering for multi-column data skipping.

A lake clustered on one column skips files well for that column and
terribly for every other; interleaving the bits of two key columns gives
every file a BOUNDED range in BOTH dimensions, so parquet min/max zone
maps prune scans filtered on either key. This is the layout-level
counterpart of partition pruning: partitioning handles the coarse key
(e.g. date), z-ordering handles the fine keys inside each partition
(e.g. user × day inside a month).

``morton_key`` is the classic magic-number bit spread — pure integer
shifts/masks, bit-identical on any engine (the registered query's DuckDB
oracle runs the same formula). ``zorder_layout`` is the writer-side
recipe: range-partition by the key so each output file covers one compact
Z-curve segment, then sort within partitions so row groups are compact
too. Locality (bounded per-file min/max in both dimensions vs a
single-column sort) is asserted in tests/test_scale_tools.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) pairs that spread a 16-bit int to even bit positions
_SPREAD = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread16(x: Column) -> Column:
    x = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two integer columns into a 32-bit
    Z-curve key (a in even positions, b in odd)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def morton_sql(a: str, b: str) -> str:
    """The same spread-and-interleave formula as ANSI SQL text (for the
    DuckDB oracle) — keep in lockstep with :func:`morton_key`."""

    def spread(x: str) -> str:
        e = f"({x} & 65535)"
        for shift, mask in _SPREAD:
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    return f"({spread(a)} | ({spread(b)} << 1))"


def zorder_layout(
    df: DataFrame, a: str, b: str, n_files: int, key_col: str = "__zkey"
) -> DataFrame:
    """Cluster ``df`` for a write: range-partition on the Morton key of
    (a, b) into ``n_files`` compact Z-curve segments and sort within each
    so parquet row-group zone maps are tight in both dimensions. Write
    the result with ``.write`` (one file per partition)."""
    keyed = df.withColumn(key_col, morton_key(F.col(a), F.col(b)))
    return keyed.repartitionByRange(n_files, key_col).sortWithinPartitions(key_col)
