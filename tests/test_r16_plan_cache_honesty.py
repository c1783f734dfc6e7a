"""r16 (verdict item 1): the plan cache may never become a result
cache.

Two contracts, pinned with Spark job counts:

* a plan-cache HIT must still run Spark jobs below the former barrier
  — the corpus scan re-executes per action (for a key whose r15 build
  ran an eager ``localCheckpoint``, a hit used to serve the
  materialized intermediate and only the tiny post-barrier remainder
  executed);
* a key whose build legitimately KEEPS an eager barrier (collect /
  range-bound determinism / scale-critical materialization) must not
  be ``@plan_cached`` at all: its second invocation re-runs the
  barrier jobs at BUILD time.

Plus the registry-wide invariant the r16 audit enforces: no
``@plan_cached`` key runs jobs during a warm (artifact caches
populated) build.
"""

from __future__ import annotations

from spark_file_mover_spark import registry
from spark_file_mover_spark.sources import io as sio

registry.load_all()

SF = "/root/testdata/sf0.001"

# r15 offenders de-barriered in r16: build is pure lazy construction,
# @plan_cached kept — a hit must re-read parquet on every action.
DEBARRIERED = "agg-kendall-tau"
# r15 offenders whose barrier is load-bearing: @plan_cached stripped —
# the second invocation must re-run the barrier jobs in the build.
STRIPPED = "agg-tukey-fences"


def _jobs_in_group(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def test_plan_cache_hit_runs_corpus_jobs(spark):
    # cold: populate the plan cache
    df1 = registry.QUERIES[DEBARRIERED](spark, SF)
    rows1 = df1.collect()

    # hit: build must be job-free, the ACTION must run >0 jobs (the
    # corpus scan re-executes below the former barrier)
    df2, build_jobs = _jobs_in_group(
        spark, "r16-hit-build", lambda: registry.QUERIES[DEBARRIERED](spark, SF)
    )
    assert build_jobs == 0, "plan-cached build ran Spark jobs"
    assert any(k[1] == DEBARRIERED for k in sio._QUERY_PLAN_CACHE)
    rows2, action_jobs = _jobs_in_group(
        spark, "r16-hit-action", lambda: df2.collect()
    )
    assert action_jobs > 0, "cache hit executed no jobs: result caching"
    assert rows1 == rows2
    # the hit plan's leaves are the parquet inputs, not a materialized
    # intermediate (LogicalRDD / Scan ExistingRDD)
    analyzed = df2._jdf.queryExecution().analyzed().toString()
    assert "Relation" in analyzed and "parquet" in analyzed
    assert "LogicalRDD" not in analyzed


def test_stripped_barrier_key_rebuilds_per_invocation(spark):
    # first invocation: barrier runs
    df1, jobs1 = _jobs_in_group(
        spark, "r16-strip-1", lambda: registry.QUERIES[STRIPPED](spark, SF)
    )
    assert jobs1 > 0, "expected the eager barrier to run at build time"
    # second invocation: NOT plan-cached, barrier runs again
    df2, jobs2 = _jobs_in_group(
        spark, "r16-strip-2", lambda: registry.QUERIES[STRIPPED](spark, SF)
    )
    assert jobs2 > 0, (
        "second build ran no jobs — the key is result-cached somewhere"
    )
    assert not any(k[1] == STRIPPED for k in sio._QUERY_PLAN_CACHE)
    assert df1.collect() == df2.collect()


def test_no_plan_cached_key_has_eager_build(spark):
    """Registry-wide: every @plan_cached key's SECOND build (artifact
    caches warm) is job-free. Runs at sf0.001 so the sweep stays
    cheap; the per-key audit tool (tools/audit_build_jobs.py) is the
    sf0.01 version of the same gate."""
    sc = spark.sparkContext
    real = sio.cached_plan
    sio.cached_plan = lambda spark, sf_dir, name, make: make()
    offenders = {}
    try:
        wrapped = [
            key
            for key, fn in registry.QUERIES.items()
            if getattr(fn, "__wrapped__", None) is not None
            and hasattr(fn.__wrapped__, "__wrapped__")
        ]
        assert len(wrapped) > 100  # the cache is still in wide use
        for key in wrapped:
            registry.QUERIES[key](spark, SF)  # warm artifacts
            group = f"r16-audit-{key}"
            sc.setJobGroup(group, key)
            try:
                registry.QUERIES[key](spark, SF)
            finally:
                sc.setJobGroup(None, None)
            n = len(sc.statusTracker().getJobIdsForGroup(group))
            if n:
                offenders[key] = n
    finally:
        sio.cached_plan = real
    assert not offenders, f"plan_cached keys with eager builds: {offenders}"
