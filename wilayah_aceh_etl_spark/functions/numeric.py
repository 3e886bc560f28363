"""Driver-side numeric helpers shared by the oracle-exact operators.

One function, deliberately: `round_half_away` is the rounding both
DuckDB's ROUND and Spark's ROUND implement, while Python's built-in
`round()` is banker's (half-to-even). Every operator whose Python
driver loop must agree bit-for-bit with a SQL oracle at exact .5
boundaries (JPEG quantizer/IDCT, Bradley-Terry quantized MM) imports
THIS helper rather than re-deriving it — a divergent copy silently
breaks engine/oracle parity only on the rare half-boundary input,
the worst kind of flake.
"""

from __future__ import annotations

import math


def round_half_away(x: float) -> int:
    """Round half away from zero, matching SQL ROUND semantics:
    rh(0.5) = 1, rh(-0.5) = -1 (Python's round() gives 0 for both)."""
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)
