"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
scan pruning.

Not in the reference (single unpartitioned CSV — SURVEY.md §1 "Physical
layout"); this is a scale extension. Parquet min/max row-group statistics
prune a scan only when the file layout correlates with the filter column. A
sort on one column gives perfect pruning on it and none on any other; the
Z-order (Morton) curve interleaves the bits of several columns so that rows
close on the curve are close in *every* dimension — filters on any of the
interleaved columns then skip most files (the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``).

Everything here is pure bit arithmetic on JVM-side built-ins (shifts, masks,
ors) — whole-stage codegen'd, no shuffle until the final range-partition of
the write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_key_width(d: int, bits: int) -> None:
    # bit i of column k lands at position i*d + k; position 63 is the long
    # sign bit — reaching it would make high-coordinate keys NEGATIVE, so
    # range-partition/sort order the hottest rows first and the curve (and
    # every min/max prune built on it) silently corrupts.
    if d * bits > 63:
        raise ValueError(
            f"zorder_key: {d} columns x {bits} bits = {d * bits} key bits; "
            f"the key is a signed 64-bit long, so at most 63 are usable — "
            f"lower `bits` (e.g. bits={63 // d}) or drop a column"
        )


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Inputs must be non-negative integers below ``2**bits`` (quantize /
    ``pmod`` beforehand). For ``d`` columns the key is ``d*bits`` wide; bit
    ``i`` of column ``k`` lands at key position ``i*d + k``. ``d*bits`` must
    be ≤ 63 (signed-long key; raises ``ValueError`` otherwise — e.g. the
    default ``bits=16`` supports at most 3 columns).
    """
    d = len(cols)
    _check_key_width(d, bits)
    terms: list[Column] = []
    for k, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        for i in range(bits):
            bit = F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * d + k))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zkey")


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as a portable SQL expression (``>> & <<``
    arithmetic is exact and engine-independent) — used by the DuckDB oracle
    so the bit math itself is value-checked cross-engine."""
    d = len(cols)
    _check_key_width(d, bits)
    terms = [
        f"((({c} >> {i}) & 1) << {i * d + k})"
        for k, c in enumerate(cols)
        for i in range(bits)
    ]
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``.

    ``repartitionByRange`` on the key splits the curve into ``num_files``
    contiguous segments (range exchange with a sampled-boundaries pass), and
    the in-partition sort makes row groups within each file curve-contiguous
    too — so both file-level AND row-group-level min/max stats become tight
    boxes in every interleaved dimension.
    """
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
