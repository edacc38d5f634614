"""Driver-side float rounding that matches the engines.

Spark's F.round on DoubleType converts the double to a decimal via its
shortest repr (java BigDecimal.valueOf) and setScale(HALF_UP); DuckDB's
round() agrees with it on every value the oracle gate has hashed.
Python's builtin round() is HALF_EVEN and disagrees exactly on .5
decimal boundaries — found by the mmr_topk gate (objective 0.5904685
→ Spark/DuckDB 0.590469, Python 0.590468). Any driver-side arithmetic
whose result is compared against Spark/DuckDB values must round with
this helper, not the builtin.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, dp: int) -> float:
    """Decimal round-half-away-from-zero of x's shortest repr at dp
    places — the F.round(col, dp) twin for driver-side floats."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))
