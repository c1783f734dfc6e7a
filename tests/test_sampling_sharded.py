"""pack_offsets_sharded: the two-pass shard-parallel packing layout must
produce byte-identical offsets to the single-global-window declared form
(sample-pack-sequences), for several shard counts including degenerate
ones (1 shard = the single-window case; more shards than natural
splits)."""

from __future__ import annotations

import pytest

from spark_file_mover_spark.llm.sampling import (
    pack_offsets_sharded,
    sample_pack_sequences,
)


@pytest.mark.parametrize("n_shards", [1, 3, 8, 32])
def test_sharded_equals_single_window(spark, sf_dir, n_shards):
    single = sample_pack_sequences(spark, sf_dir).collect()
    sharded = pack_offsets_sharded(spark, sf_dir, n_shards=n_shards).collect()
    assert sharded == single


def test_sharded_offsets_are_contiguous(spark, sf_dir):
    """Adjacent documents must tile the token stream with no gaps or
    overlaps — the property the per-shard base arithmetic could silently
    break if a shard total or base were off by one."""
    rows = pack_offsets_sharded(spark, sf_dir, n_shards=8).collect()
    pos = 0
    for r in rows:
        assert r.start_offset == pos
        pos += r.n_tok
