"""Property-based tests (hypothesis) for the file-mover's pure plan
functions — the template tokenizer and partition parser are exactly the
kind of string-semantics code where example tests miss edge cases the
reference's regexes actually define."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_file_mover_spark.filemover import (
    NoSuchPartitionVariable,
    extract_partitions,
    has_collisions,
    plan_moves,
    render_segment,
    render_target,
)

VAR_NAMES = st.from_regex(r"[a-zA-Z0-9]{1,8}", fullmatch=True)
# the reference's partition-value char class is the ASCII range ' '..'_'
# plus alphanumerics; '/' is excluded because Spark's writer percent-
# encodes it in partition paths — a raw '/' could never appear in a
# written directory name
VALUE_CHARS = st.text(
    alphabet=st.sampled_from(
        [chr(c) for c in range(ord(" "), ord("_") + 1) if chr(c) != "/"]
        + list("abcdefghijklmnopqrstuvwxyz")
    ),
    max_size=12,
)
LITERALS = st.text(
    alphabet=st.sampled_from(list("abcdefghijklmnopqrstuvwxyz.-")), max_size=6
)


@given(name=VAR_NAMES, value=VALUE_CHARS)
def test_single_variable_substitutes(name, value):
    assert render_segment(f"${name}", {name: value}) == value


@given(name=VAR_NAMES)
def test_unknown_variable_always_raises(name):
    with pytest.raises(NoSuchPartitionVariable):
        render_segment(f"${name}", {})


@given(lit=LITERALS)
def test_literal_segments_pass_through(lit):
    # no '$' → never touched, never raises, even with an empty env
    # (the LITERALS alphabet never contains '$', so assert unconditionally)
    assert render_segment(lit, {}) == lit
    assert render_target(f"/out/{lit}", {}, root="/") == (
        f"/out/{lit}" if lit else "/out"
    )


@given(a=VAR_NAMES, b=VAR_NAMES, va=VALUE_CHARS, vb=VALUE_CHARS)
def test_underscore_delimits_two_variables(a, b, va, vb):
    """'$a_$b' must parse as var a + literal '_' + var b — underscore is
    never part of a variable name (reference scala :30)."""
    env = {a: va, b: vb}
    if a == b:
        env = {a: va}
        assert render_segment(f"${a}_${b}", env) == f"{va}_{va}"
    else:
        assert render_segment(f"${a}_${b}", env) == f"{va}_{vb}"


@given(key=VAR_NAMES, v1=VALUE_CHARS, v2=VALUE_CHARS)
def test_deeper_partition_segment_wins(key, v1, v2):
    path = f"/out/{key}={v1}/{key}={v2}/part-0.csv"
    parts = extract_partitions(path, "/out")
    # the reference regex must fullmatch the dir name for it to count
    if re.fullmatch(r"(\w+)=([a-zA-Z0-9 -_]*)", f"{key}={v2}"):
        assert parts[key] == v2


@given(
    files=st.lists(
        st.from_regex(r"/out/k=[a-z]{1,4}/part-[0-9]\.csv", fullmatch=True),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
@settings(max_examples=50)
def test_plan_is_total_and_collision_guard_is_global(files):
    """Every listed file gets exactly one plan entry; the guard fires iff
    two files render to the same target."""
    plan = plan_moves(files, "/out", "$outputDirectory/$k.csv")
    assert set(plan) == set(files)
    targets = list(plan.values())
    assert has_collisions(plan) == (len(set(targets)) != len(targets))


@given(name=VAR_NAMES, value=VALUE_CHARS)
def test_output_directory_always_overrides_partition(name, value):
    parts = extract_partitions(
        f"/real/outputDirectory={value}/f.csv", "/real"
    )
    assert parts["outputDirectory"] == "/real"
