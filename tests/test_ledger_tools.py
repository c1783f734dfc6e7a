"""Unit tests for tools/ledger.py — the shared driver-green criterion.

Pins the r14-verdict "What's wrong" item 1 fix: a ledger row that
matches rows but FAILS the value hash is stale evidence, not green —
it must sort to the FRONT of the rotation (re-scored next round), not
the back. rows_match only counts for keys declared rows-only (no
registered oracle, so the driver never computed a hash for them).

No SparkSession needed — pure-python over a synthetic ledger dir.
"""

import json

from tools.ledger import is_green, latest_green_rounds


ROWS_ONLY = frozenset({"stream-custom-stateful"})


def test_hash_match_is_green():
    assert is_green({"rows_match": True, "hash_match": True}, "agg-hash", ROWS_ONLY)


def test_rows_only_pass_without_hash_is_not_green_for_oracled_key():
    # the pathology: hash failed, rows matched, key HAS an oracle
    row = {"rows_match": True, "schema_match": True, "hash_match": False}
    assert not is_green(row, "agg-hash", ROWS_ONLY)


def test_rows_match_counts_for_declared_rows_only_key():
    row = {"rows_match": True, "hash_match": False}
    assert is_green(row, "stream-custom-stateful", ROWS_ONLY)
    assert not is_green({"rows_match": False}, "stream-custom-stateful", ROWS_ONLY)


def test_hash_fail_key_sorts_to_front_of_rotation(tmp_path):
    # synthetic two-round ledger: key "b" hash-passes only in r1 and
    # hash-fails (rows-only) in r2 -> its latest green round is 1, so
    # it is STALER than "a" (green in r2) and rotates ahead of it.
    (tmp_path / "CORRECTNESS_r1.json").write_text(json.dumps({
        "a": {"rows_match": True, "hash_match": True},
        "b": {"rows_match": True, "hash_match": True},
    }))
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps({
        "a": {"rows_match": True, "hash_match": True},
        "b": {"rows_match": True, "hash_match": False},
        "retired-key": {"rows_match": True, "hash_match": True},
    }))
    latest = latest_green_rounds(["a", "b"], frozenset(), repo=tmp_path)
    assert latest == {"a": 2, "b": 1}
    keys = ["a", "b"]
    ordered = sorted(keys, key=lambda k: (latest.get(k, -1), keys.index(k)))
    assert ordered == ["b", "a"]


def test_never_scored_key_sorts_first(tmp_path):
    (tmp_path / "CORRECTNESS_r3.json").write_text(json.dumps({
        "a": {"rows_match": True, "hash_match": True},
    }))
    latest = latest_green_rounds(["a", "new-op"], frozenset(), repo=tmp_path)
    keys = ["a", "new-op"]
    ordered = sorted(keys, key=lambda k: (latest.get(k, -1), keys.index(k)))
    assert ordered == ["new-op", "a"]
