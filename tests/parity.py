"""Order-insensitive Spark↔DuckDB result comparison.

Mirrors (and is stricter than) the driver's value-hash check: every cell
is canonicalized to a string (shortest round-trip repr for floats, so two
doubles compare equal iff bit-identical), rows are sorted, and the two
row-sets must be exactly equal.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


# DuckDB result types the driver's canonicalization preserves exactly.
# HUGEINT and DECIMAL are the r4 failure class: this harness compares via
# fetchall() (exact Python ints), but the driver hashes cells through a
# pandas/float path, so a HUGEINT `SUM()` that round-trips fine here loses
# low bits there (688652606379068264 -> 6.886526e+17). Raw TIMESTAMP/DATE
# are excluded too: registry policy formats temporals to strings on both
# sides before output.
_SAFE_DUCK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
}


def compare(spark_df, duck_rel, allow_empty: bool = False) -> tuple[bool, str]:
    """Compare a Spark DataFrame against a DuckDB relation. Returns
    (ok, message).

    Stricter than the driver in two ways: oracle result columns must use
    driver-safe DuckDB types (see ``_SAFE_DUCK_TYPES``), and an empty
    result set fails unless ``allow_empty=True`` — a 0-row == 0-row
    "pass" certifies nothing (the r4 sink-sorted-pruning vacuity)."""
    bad_types = [
        (c, str(t))
        for c, t in zip(duck_rel.columns, duck_rel.types)
        if str(t) not in _SAFE_DUCK_TYPES
    ]
    if bad_types:
        return False, (
            "oracle column types unsafe under the driver's float-coercing "
            f"canonicalization (cast to BIGINT/DOUBLE/VARCHAR): {bad_types}"
        )

    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    if not s_rows and not allow_empty:
        return False, "both sides returned 0 rows — vacuous check"
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        return False, f"value mismatch; first diffs (spark,duck): {diffs}"
    return True, "ok"
