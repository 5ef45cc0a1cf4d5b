"""Cross-engine deterministic rounding for integer-ratio statistics.

Spark's ``F.round(double, d)`` rounds the double's SHORTEST-DECIMAL
representation half-up (``BigDecimal.valueOf``); DuckDB's
``round(DOUBLE, d)`` rounds the BINARY double half-away-from-zero
(``std::round`` of ``x·10^d``). The two agree except when the value's
true decimal expansion lands EXACTLY on the half grid (…5 in digit
d+1) while its binary double sits an ε below — which happens
systematically for ratios of small integers whose denominator carries a
factor 5 (e.g. 3k/800 → 37.5k/10⁴): observed on `quality_score`
(0.72625 → Spark 0.7263 vs oracle 0.7262) and a windowed `avg_value`.

``half_away_col`` reproduces DuckDB's semantics exactly for finite
inputs (verified against 200k random + boundary-adversarial values):
``t = x·10^d``; take ``floor(|t|)`` and add 1 iff the true fractional
part is ≥ 0.5 (computed as a comparison, never by adding 0.5 — ``t+0.5``
itself rounds for t within half an ulp of the boundary); restore sign.

Used by the operators whose rounded outputs are integer ratios or sums
of limited-precision values (text profile, gopher display columns,
repetition ratios, windowed rollup). Score-valued paths (BM25 / cosine /
tf-idf) keep ``F.round``: their doubles derive from logs and square
roots, which cannot land exactly on a decimal half grid, and the
champion-serving machinery's rounding-hazard analysis is built around
``F.round``'s semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_away_col(c: Column, digits: int = 4) -> Column:
    """DuckDB-exact round: half away from zero on the binary double."""
    scale = float(10**digits)
    t = c * F.lit(scale)
    a = F.abs(t)
    fa = F.floor(a).cast("double")
    r = fa + (a - fa >= F.lit(0.5)).cast("double")
    return (F.when(t < 0, -r).otherwise(r) / F.lit(scale)).cast("double")


def half_away_py(x: float, digits: int = 4) -> float:
    """Python twin (vectorizable formula; see textstats arrow impl)."""
    scale = float(10**digits)
    t = x * scale
    a = abs(t)
    fa = math.floor(a)
    r = fa + (1.0 if a - fa >= 0.5 else 0.0)
    return (-r if t < 0 else r) / scale
