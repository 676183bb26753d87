"""Numeric helpers shared by Ray kernels and oracle-SQL parity.

DuckDB's ``round`` is round-half-away-from-zero; numpy/pyarrow default
to half-to-even.  Every rounded column that feeds the correctness gate
goes through :func:`round_away` so both sides agree at .5 boundaries.
"""

from __future__ import annotations

import numpy as np


def round_away(x, ndigits: int = 6) -> np.ndarray:
    """Round half away from zero (DuckDB semantics)."""
    a = np.asarray(x, dtype=np.float64)
    scale = 10.0**ndigits
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale
