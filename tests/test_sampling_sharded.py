"""pack_offsets_sharded: the two-pass shard-parallel packing layout must
produce byte-identical offsets to the single-global-window declared form
(sample-pack-sequences), for several shard counts including degenerate
ones (1 shard = the single-window case; more shards than natural
splits)."""

from __future__ import annotations

import pytest

from spark_file_mover_spark.llm.sampling import (
    pack_offsets_sharded,
    pack_offsets_single,
)


@pytest.mark.parametrize("n_shards", [1, 3, 8, 32])
def test_sharded_equals_single_window(spark, sf_dir, n_shards):
    single = pack_offsets_single(spark, sf_dir).collect()
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


def test_chunk_layout_tiles_with_overlap(spark, sf_dir):
    """Property of the sliding-chunk math: per doc, chunk starts advance
    by exactly the stride, the first chunk starts at 0, every chunk is
    non-empty and at most CHUNK long, and the final chunk reaches (but
    never passes) the document's token count."""
    from spark_file_mover_spark.llm.features import (
        _CHUNK,
        _STRIDE,
        text_chunk_sliding,
    )
    from spark_file_mover_spark.llm.sampling import sample_pack_sequences

    rows = text_chunk_sliding(spark, sf_dir).collect()
    n_tok = {
        r.doc_id: r.n_tok for r in sample_pack_sequences(spark, sf_dir).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_tok)  # every doc is chunked
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        total = n_tok[doc_id]
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.start_tok == i * _STRIDE
            assert 1 <= c.chunk_len <= _CHUNK
        last = chunks[-1]
        assert last.start_tok + last.chunk_len == min(
            total, last.start_tok + _CHUNK
        )
        # the chunk set covers the whole stream: the last window reaches
        # the end, and no extra window would start inside the stream
        assert last.start_tok + last.chunk_len >= total or (
            last.start_tok + _CHUNK >= total
        )
        assert (len(chunks) - 1) * _STRIDE < max(total - _CHUNK, 0) + _STRIDE
