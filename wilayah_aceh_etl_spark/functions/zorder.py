"""Z-order (Morton) clustering for multi-column data-skipping.

A table sorted on one column prunes row groups tightly on that column
and not at all on any other. Interleaving the bits of two (or more)
quantized key columns into one Morton code and RANGE-PARTITIONING +
SORTING on that code gives every file a small bounding BOX in key
space — min/max footer stats then prune effectively on EITHER column.
This is Delta/Iceberg `ZORDER BY`, built from Catalyst bit arithmetic
(shiftleft / shiftright / bitwiseAND / bitwiseOR — all codegen'd, no
UDFs) so the codes are reproducible bit-for-bit by any engine with
integer bit ops (the DuckDB oracle recomputes them with `<<`/`&`/`|`).

Scale: the quantization bounds come from one tiny min/max aggregate
(broadcast, 1 row); code computation is map-side; the only wide op in
a re-layout job is the repartitionByRange on the code — exactly the
shuffle any global sort pays, but paid once at write time to make
every future scan prune.

Relationship to `sources/maintenance.zorder_key`: that is the
generic N-column WRITE-path variant (float min-max scaling — fine
for layout, where only locality matters). This module is the
integer-exact 2-column variant whose arithmetic is reproducible
bit-for-bit by the DuckDB oracle (`layout_zorder_morton`), which
float scaling cannot guarantee; both interleaves are property-tested.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize_minmax(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Map v ∈ [vmin, vmax] to an integer cell in [0, 2^bits - 1]
    with pure integer arithmetic (no float rounding to diverge across
    engines): ((v - vmin) * (2^bits - 1)) div max(1, vmax - vmin).
    The div is expressed as (a - a % b) / b — exact for the
    non-negative operands here, and every step stays codegen'd."""
    span = F.greatest(vmax.cast("long") - vmin.cast("long"), F.lit(1))
    scaled = (v.cast("long") - vmin.cast("long")) * F.lit((1 << bits) - 1)
    return ((scaled - scaled % span) / span).cast("long")


def quantize_minmax_sql(v: str, vmin: str, vmax: str, bits: int) -> str:
    """The same quantization as a portable SQL fragment (DuckDB
    oracle side). Integer division is spelled (a - a % b) / b because
    the div token differs between engines (`div` vs `//`) while `%`,
    `-` and exact-on-divisible `/` agree."""
    top = (1 << bits) - 1
    a = f"(({v} - {vmin}) * {top})"
    b = f"GREATEST({vmax} - {vmin}, 1)"
    return f"CAST(({a} - ({a} % {b})) / {b} AS BIGINT)"


def morton_interleave(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low `bits` of two non-negative ints:
    bit i of x lands at position 2i+1, bit i of y at 2i. Unrolled
    into 2*bits codegen'd bit ops — no loop at runtime."""
    z = F.lit(0).cast("long")
    xl = x.cast("long")
    yl = y.cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def morton_interleave_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical interleave as a SQL fragment (Spark and DuckDB
    share `<<`, `>>`, `&`, `|` semantics on BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"
