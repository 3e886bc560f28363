"""Pure-Python readers for Spark's serialized sketch types.

Spark SQL can BUILD a count-min sketch distributedly
(`F.count_min_sketch`) but offers no SQL surface to PROBE one — the
only in-box reader is `org.apache.spark.util.sketch.CountMinSketch`,
reachable solely through `spark._jvm` reflection, which is a private
API and does not exist under Spark Connect. This module decodes the
sketch's wire format directly, so probing needs no JVM access at all:
the sketch bytes come back from a normal aggregation row and the
driver reads them as data.

Wire format (reverse-engineered against the JVM reader and pinned by
tests/test_ext_operators.py::test_python_cms_reader_matches_jvm; all
big-endian, java.io.DataOutputStream):

    int32   version (1)
    int64   totalCount
    int32   depth
    int32   width
    int64   hashA[depth]          -- per-row hash coefficients
    int64   table[depth][width]   -- the counters, row-major

Long-key estimation is the classic Carter-Wegman scheme the JVM
implementation uses: h = hashA[i]*item; h += h >> 32 (signed 64-bit);
h &= (2^31 - 1); column = h % width; estimate = min over rows.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_PRIME_MODULUS = (1 << 31) - 1
_U64 = (1 << 64) - 1


def _as_java_long(x: int) -> int:
    """Wrap Python's unbounded int to signed 64-bit (Java long)."""
    x &= _U64
    return x - (1 << 64) if x >= (1 << 63) else x


@dataclass(frozen=True)
class CountMinSketchReader:
    total_count: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: tuple[tuple[int, ...], ...]

    @classmethod
    def from_bytes(cls, payload: bytes) -> "CountMinSketchReader":
        (version,) = struct.unpack(">i", payload[:4])
        if version != 1:
            raise ValueError(f"unsupported CountMinSketch version {version}")
        (total,) = struct.unpack(">q", payload[4:12])
        depth, width = struct.unpack(">ii", payload[12:20])
        off = 20
        hash_a = struct.unpack(f">{depth}q", payload[off : off + 8 * depth])
        off += 8 * depth
        table = []
        for _ in range(depth):
            table.append(
                struct.unpack(f">{width}q", payload[off : off + 8 * width])
            )
            off += 8 * width
        if off != len(payload):
            raise ValueError(
                f"trailing bytes in sketch: read {off} of {len(payload)}"
            )
        return cls(int(total), depth, width, tuple(hash_a), tuple(table))

    def estimate_count(self, item: int) -> int:
        """Frequency estimate for an integer key — bit-identical to
        the JVM's CountMinSketchImpl.estimateCount(long)."""
        est = None
        for i in range(self.depth):
            h = _as_java_long(self.hash_a[i] * item)
            h = _as_java_long(h + (h >> 32))
            h &= _PRIME_MODULUS
            v = self.table[i][h % self.width]
            est = v if est is None else min(est, v)
        return int(est)
