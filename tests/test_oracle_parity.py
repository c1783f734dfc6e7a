"""Every registered query with an oracle must hash-match DuckDB at the
test scale factor — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from spark_file_mover_spark import registry
from tests.parity import compare

registry.load_all()

KEYS = sorted(registry.ORACLES)


@pytest.mark.parametrize("key", KEYS)
def test_oracle_parity(key, spark, sf_dir, duck):
    df = registry.QUERIES[key](spark, sf_dir)
    rel = duck.sql(registry.ORACLES[key])
    ok, msg = compare(df, rel)
    assert ok, f"{key}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(key, spark, sf_dir):
    """Rows-only keys (no oracle) must execute, return rows and a schema."""
    df = registry.QUERIES[key](spark, sf_dir)
    assert len(df.columns) >= 1, key
    assert df.count() > 0, key
