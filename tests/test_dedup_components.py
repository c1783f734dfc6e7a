"""connected_components: the transitive-closure clustering pass that the
single-pass min-neighbor step in dedup-near-minhash approximates."""

from __future__ import annotations

import pytest

from spark_file_mover_spark.llm.dedup import (
    connected_components,
    minhash_clusters,
)


def _components(spark, pairs):
    edges = spark.createDataFrame(pairs, "a long, b long")
    rows = connected_components(edges).collect()
    return {r.doc_id: r.component_id for r in rows}


def test_chain_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4: 1 and 4 never share a pair but are transitively dups
    got = _components(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_disjoint(spark):
    got = _components(spark, [(1, 2), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges_within_iterations(spark):
    # a 12-node path — worst case for label propagation (diameter 11);
    # min-label + pointer jumping floods it in O(log diameter) rounds
    pairs = [(i, i + 1) for i in range(12)]
    got = _components(spark, pairs)
    assert set(got.values()) == {0}


def test_direction_and_duplicates_are_irrelevant(spark):
    got = _components(spark, [(5, 3), (3, 5), (5, 3), (7, 5)])
    assert got == {3: 3, 5: 3, 7: 3}


def test_non_convergence_raises_instead_of_returning_partial(spark):
    # with pointer jumping a round covers distance 2^(k+1)-1, so one
    # round reaches distance 3 — diameter 11 cannot flood in a single
    # round; a silent partial result would split one dup cluster into
    # several, so the API must raise
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_minhash_clustering_stable_across_runs(spark, sf_dir):
    """Fixed permutation seeds + deterministic hashing: two independent
    invocations must produce the identical (doc_id, cluster_id) relation
    — the reproducibility property a curation pipeline depends on."""
    first = sorted(map(tuple, minhash_clusters(spark, sf_dir).collect()))
    second = sorted(map(tuple, minhash_clusters(spark, sf_dir).collect()))
    assert first == second
    assert len(first) > 0


def test_minhash_cluster_invariants(spark, sf_dir):
    """The invariants the dedup-near-minhash oracle audits, checked
    directly on the raw clustering relation."""
    rows = minhash_clusters(spark, sf_dir).collect()
    ids = {r.doc_id for r in rows}
    assert all(r.cluster_id <= r.doc_id for r in rows)
    assert all(r.cluster_id in ids for r in rows)


def _union_find(pairs):
    """Reference closure: plain union-find with min-root relabeling."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_components_match_union_find(spark, pairs):
        """Property: the distributed min-label closure equals a plain
        union-find on any random edge list (self-loops and duplicates
        included)."""
        got = _components(spark, [(a, b) for a, b in pairs])
        assert got == _union_find(pairs)

except ImportError:  # pragma: no cover - hypothesis ships in the container
    pass
