"""Cross-engine-stable 6-dp rounding for declared queries and their
DuckDB oracle twins.

Spark's ``F.round`` on DOUBLE rounds the value's SHORTEST DECIMAL
REPRESENTATION (java BigDecimal.valueOf → Double.toString) half-up;
DuckDB's ``round(x, 6)`` computes ``round(x * 1e6)/1e6`` in binary; a
DECIMAL-cast detour rounds the value's 16-fractional-digit expansion.
All three DISAGREE on doubles whose true value sits within one ulp of a
.XXXXXX5 boundary — which ratio-of-small-integer metrics (k/64-style)
and 2-dp-step sums hit systematically. The sf0.1 full-corpus sweep
caught three queries flipping their last digit this way even though
both engines held bit-identical unrounded doubles.

The fix is to stop rounding in decimal space at all: both sides compute

    floor(x * 1e6 + 0.5) / 1e6

— multiply, add, floor and divide are correctly-rounded IEEE-754
operations, so for identical input doubles the two engines produce
IDENTICAL output doubles, boundary or not. (Semantics: round-half-up
toward +infinity in the BINARY value; for negative inputs this is
floor-style rather than away-from-zero — acceptable because both sides
agree by construction.) Overflow bound: |x| < ~9e12 (long floor).
"""

from __future__ import annotations


def r6(expr: str) -> str:
    """DuckDB SQL half-up-in-binary 6-dp round of a double expression."""
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"


def round6(col):
    """Spark Column twin of :func:`r6` — use in place of F.round(col, 6)
    for metrics that can land on a .XXXXXX5 boundary (ratios of small
    integers, fixed-step sums)."""
    from pyspark.sql import functions as F

    return F.floor(col * 1_000_000.0 + 0.5) / 1_000_000.0
