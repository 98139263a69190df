"""Distance kernels shared by tests and the index path.

sfa_lb_distance — reference SFADistance.getDistance
(`/root/reference/src/main/java/sfa/transformation/SFADistance.java:22-67`):
lower bound between a query's DFT values and a candidate's SFA WORD,
using the bin boundaries: per coefficient, distance from the query
value to the candidate symbol's bin interval (0 if inside), ×2 for
rfft conjugate symmetry. Because quantization only widens intervals,
this lower-bounds the DFT distance, which lower-bounds ED
(tested in tests/test_index.py, the SFAMinDistanceTest twin).
"""

from __future__ import annotations

import math


def sfa_lb_distance(
    qdft: list[float], csyms: list[int], bins: dict[int, list[float]]
) -> float:
    """√(2·Σ gap(q_i, interval(sym_i))²). bins[seg] = ascending
    boundaries; symbol c ↔ interval [bins[c−1], bins[c])."""
    total = 0.0
    for i, (v, c) in enumerate(zip(qdft, csyms)):
        bs = bins[i]
        lo = -math.inf if c == 0 else bs[c - 1]
        hi = math.inf if c >= len(bs) else bs[c]
        if v < lo:
            d = lo - v
        elif v > hi:
            d = v - hi
        else:
            d = 0.0
        total += 2.0 * d * d
    return math.sqrt(total)
