"""Numeric emit helpers shared by oracle-matched operators.

``round6`` exists because numpy rounds half-to-even while DuckDB's
``ROUND`` rounds half-away-from-zero: ``np.round(1/128, 6)`` is
``0.007812`` but DuckDB says ``0.007813``.  Any emitted quotient of
integers (novelty, TTR, Jaccard, MinHash estimates, rank fractions)
can land exactly on an odd/2^k midpoint, so every oracle-facing
rounded emit must use half-away semantics.  Verified against DuckDB
``ROUND(x, 6)`` over 40k tie and random cases (zero divergence; plain
``np.round`` diverges).  See NOTES_r3.md "np.round is half-even".
"""

from __future__ import annotations

import numpy as np

__all__ = ["round6", "round_half_away", "md5_key52", "to_int_units"]


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero — DuckDB / ANSI-SQL ``ROUND`` semantics.

    Elementwise over numpy arrays (and scalars); always returns float64.
    ``copysign + floor(|x|*10^d + 0.5)`` matches DuckDB bit-for-bit on
    dyadic-rational ties where ``np.round``'s banker's rounding differs.
    """
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0**ndigits
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


# Signature-compatible drop-in for the common ``np.round(arr, 6)`` emit.
round6 = round_half_away


def md5_key52(s) -> int:
    """The house deterministic-shuffle key: first 13 hex chars (52 bits)
    of md5(str(s)) as a non-negative int64. SQL mirror (pin this
    EXACTLY in every oracle that ranks by it):
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 13))::BIGINT``.
    One shared definition so the cross-engine parity contract cannot
    drift between call sites (13 vs 16 chars silently breaks only one
    query's oracle)."""
    import hashlib

    return int(hashlib.md5(str(s).encode("utf-8")).hexdigest()[:13], 16)


def to_int_units(scale: int = 1):
    """Factory for the house float->int64-unit transform used by ops
    that reduce in exact integers (group_corr, pareto_front,
    isotonic_calibrate, ...): ``round_half_away(x * scale, 0)`` cast to
    int64 — HALF-AWAY-FROM-ZERO, so the transform is the exact mirror
    of SQL ``CAST(ROUND(x * scale) AS BIGINT)`` even on .5 ties (np.round
    is banker's-rounded and silently diverges there). One definition so
    the rounding contract cannot drift between call sites."""
    def f(a):
        return round_half_away(np.asarray(a, np.float64) * scale, 0).astype(
            np.int64
        )

    return f
