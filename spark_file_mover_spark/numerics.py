"""Engine-portable numeric snapping.

``ROUND(double, n)`` diverges between Spark (HALF_UP over the
shortest-decimal representation) and DuckDB (multiply-based) on
tie-adjacent values — the ``agg-ols-trend`` r10 differential catch,
recorded in SURVEY §5 at ~1e-10/value odds on organic data. The
portable idiom is the multiply/floor sequence computed in IEEE double
arithmetic IDENTICALLY by both engines:

    FLOOR(x * 10^d + 0.5) / 10^d

Every registered query snaps derived doubles with :func:`snap` on the
Spark side and the textual ``FLOOR((x) * 1e{d} + 0.5) / 1e{d}`` in its
oracle SQL. ``F.round`` must not appear on a double output in any
registered query (pinned by tests/test_no_round_snaps.py).

MAGNITUDE HAZARD (r12, pinned in test_no_round_snaps.py): Spark's
``floor(double)`` returns BIGINT and SATURATES at Long.MaxValue for
|x·10^d| >= 2^63, while DuckDB's ``FLOOR`` stays double — so the two
engines diverge for |x| >= 2^63/10^d (~9.22 at d=9 ... e9, i.e. any
snapped-at-9dp value above ~9.22e9). Every registered snapped column
is a bounded ratio / statistic / log-space quantity orders of
magnitude inside that envelope; an UNBOUNDED metric (raw revenue
totals, epoch micros) must be emitted as exact DECIMAL/BIGINT, never
snapped. The boundary behavior is pinned adversarially so a Spark
semantics change (e.g. ANSI raising instead of saturating) trips a
test, not a driver hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def snap(col: Column | str, digits: int = 9) -> Column:
    """FLOOR(x * 10^digits + 0.5) / 10^digits as a DOUBLE column —
    bitwise-identical in Spark and DuckDB for any |x·10^d| < 2^53
    (every registered metric is a bounded ratio/statistic well inside
    that). NULL propagates; sign needs no care because parity needs
    only that both engines evaluate the SAME IEEE expression."""
    s = F.lit(float(10**digits))
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * s + F.lit(0.5)) / s
