"""The generated-SQL argmin builder (`_nearest_fold_sql`) vs a pure
Python reference — random literal tables with DELIBERATE distance ties,
pinning the min-dist-then-min-id rule the clustering/PQ family relies
on (array_min over (d, c) structs is lexicographic)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from spark_file_mover_spark.llm.clustering import (
    _long_lit,
    _nearest_fold_sql,
)

_DIM = 4


def _py_argmin(vec, table):
    best = None
    for ident, lits in table:
        d = sum((a - b) * (a - b) for a, b in zip(vec, lits))
        cand = (d, ident)
        if best is None or cand < best:
            best = cand
    return best  # (dist, id)


@settings(max_examples=15, deadline=None)
@given(
    data=st.data(),
    n_cands=st.integers(min_value=1, max_value=6),
)
def test_nearest_fold_sql_matches_python_argmin(spark, data, n_cands):
    ints = st.integers(min_value=-50, max_value=50)
    vecs = data.draw(
        st.lists(
            st.lists(ints, min_size=_DIM, max_size=_DIM),
            min_size=1,
            max_size=5,
        )
    )
    cands = data.draw(
        st.lists(
            st.lists(ints, min_size=_DIM, max_size=_DIM),
            min_size=n_cands,
            max_size=n_cands,
        )
    )
    # force tie pressure: duplicate the first candidate under a higher id
    table = [(i, c) for i, c in enumerate(cands)] + [(len(cands), cands[0])]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vid long, qv array<bigint>"
    )
    expr = _nearest_fold_sql("qv", table, "CAST(0 AS BIGINT)", _long_lit)
    rows = df.select(
        "vid", F.expr(f"({expr}).d").alias("d"), F.expr(f"({expr}).c").alias("c")
    ).collect()
    for r in rows:
        want_d, want_c = _py_argmin(vecs[r.vid], table)
        assert (r.d, r.c) == (want_d, want_c), f"vec {r.vid}"
