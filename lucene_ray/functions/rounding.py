"""Half-away-from-zero rounding, matching DuckDB's ROUND(DOUBLE, n).

numpy's ``np.round`` is banker's (half-to-even), which diverges from SQL
ROUND on exactly-representable midpoints (e.g. 1/32 = 0.03125 at 4 digits).
Every pipeline that emits rounded floats for the DuckDB correctness oracle
must round through this helper so both sides agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, digits: int):
    """Vectorized round-half-away-from-zero (SQL ROUND semantics)."""
    m = 10.0 ** digits
    a = np.asarray(x, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * m + 0.5) / m
