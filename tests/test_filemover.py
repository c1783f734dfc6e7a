"""File-mover tests: the reference's 8 end-to-end scenarios
(MoveFilesOutputCommiterTest.scala:60-154) ported against file://, plus
unit tests of the pure plan functions (template/partition semantics).

The reference asserts on filesystem state only (isFile/isDirectory,
test :156-165); these tests do the same via pathlib.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from spark_file_mover_spark.filemover import (
    NoSuchPartitionVariable,
    extract_partitions,
    has_collisions,
    move_files,
    plan_moves,
    render_segment,
    render_target,
    write_single_file,
)

# reference canonical dataset (test :46-51): note the duplicate
# (category=data, id=1) partition pair
EXAMPLE_DATA = [
    ("data", 1, "foo"),
    ("data", 1, "fooagain"),
    ("data", 2, "bar"),
    ("info", 3, "baz"),
]
COLUMNS = ["category", "id", "value"]


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="filemover-")
    yield str(Path(d) / "test")
    shutil.rmtree(d, ignore_errors=True)


def _write(df, out, partition_by=None, pattern="$outputDirectory", single=True):
    return write_single_file(
        df, out, template=pattern, partition_by=partition_by, single=single
    )


# --- the 8 reference scenarios -------------------------------------------


def test_no_move_when_multiple_files_in_dir(spark, tmp_out):
    """ref test :60-66: 5 files → one target → collision → directory stays."""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS).repartition(5)
    res = _write(df, tmp_out, pattern="$outputDirectory.csv", single=False)
    assert not res.moved
    assert Path(tmp_out).is_dir()
    assert not Path(tmp_out + ".csv").exists()


def test_no_move_without_file_extension(spark, tmp_out):
    """ref test :68-74: default pattern '$outputDirectory' — all 5 files map
    onto the output dir itself → collision → no move. (Despite the test
    name, no extension check exists in the reference; the behavior falls
    out of the collision guard, scala :51.)"""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS).repartition(5)
    res = _write(df, tmp_out, single=False)
    assert not res.moved
    assert Path(tmp_out).is_dir()


def test_moves_single_file(spark, tmp_out):
    """ref test :75-82: one file → unique target → moved to /test.csv."""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    res = _write(df, tmp_out, pattern="$outputDirectory.csv")
    assert res.moved
    assert Path(tmp_out + ".csv").is_file()


def test_moves_single_file_per_partition(spark, tmp_out):
    """ref test :84-95: partitionBy(category,id), template
    '$outputDirectory/cat_$category_id_$id.csv' — one named file per
    partition, underscore-delimited variable parse."""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    res = _write(
        df,
        tmp_out,
        partition_by=["category", "id"],
        pattern="$outputDirectory/cat_$category_id_$id.csv",
    )
    assert res.moved
    for cat, id_, _ in EXAMPLE_DATA:
        assert (Path(tmp_out) / f"cat_{cat}_id_{id_}.csv").is_file()


def test_moves_fixed_name_without_partition(spark, tmp_out):
    """ref test :96-104: fixed (no-variable) file segment."""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    res = _write(df, tmp_out, pattern="$outputDirectory/fixed_file_name.csv")
    assert res.moved
    assert (Path(tmp_out) / "fixed_file_name.csv").is_file()


def test_special_characters_in_partition_values(spark, tmp_out):
    """ref test :106-124: space/underscore/dash in partition values pass
    through the partition regex's broad char class."""
    df = spark.createDataFrame(
        [
            ("data with space", 1, "foo"),
            ("data_with_underscore", 2, "bar"),
            ("data-with-dash", 3, "baz"),
        ],
        COLUMNS,
    )
    res = _write(
        df,
        tmp_out,
        partition_by=["category", "id"],
        pattern="$outputDirectory/cat_$category_id_$id.csv",
    )
    assert res.moved
    for name in [
        "cat_data with space_id_1.csv",
        "cat_data_with_underscore_id_2.csv",
        "cat_data-with-dash_id_3.csv",
    ]:
        assert (Path(tmp_out) / name).is_file(), name


def test_null_and_empty_partition_values(spark, tmp_out):
    """ref test :126-142: null AND empty partition values are written as
    __HIVE_DEFAULT_PARTITION__ and substitute as that literal string."""
    df = spark.createDataFrame([("", 1, "foo"), (None, 2, "bar")], COLUMNS)
    res = _write(
        df,
        tmp_out,
        partition_by=["category", "id"],
        pattern="$outputDirectory/cat_$category_id_$id.csv",
    )
    assert res.moved
    for name in [
        "cat___HIVE_DEFAULT_PARTITION___id_1.csv",
        "cat___HIVE_DEFAULT_PARTITION___id_2.csv",
    ]:
        assert (Path(tmp_out) / name).is_file(), name


def test_unknown_template_variable_raises(spark, tmp_out):
    """ref test :144-154: '$nonexistent' fails the whole move (the
    reference surfaces NoSuchElementException as SparkException; here the
    post-write pass raises before any rename)."""
    df = spark.createDataFrame([("data", 1, "foo")], COLUMNS)
    with pytest.raises(NoSuchPartitionVariable):
        _write(
            df,
            tmp_out,
            partition_by=["category", "id"],
            pattern="$outputDirectory/cat_$nonexistent.csv",
        )
    # nothing was renamed: the partition layout is intact
    assert any(Path(tmp_out).glob("category=data/id=1/*.csv"))


# --- pure-function unit tests ---------------------------------------------


def test_extract_partitions_deeper_segment_wins():
    parts = extract_partitions("/out/k=a/k=b/file.csv", "/out")
    assert parts["k"] == "b"


def test_extract_partitions_output_directory_overrides():
    parts = extract_partitions("/out/outputDirectory=evil/f.csv", "/real-out")
    assert parts["outputDirectory"] == "/real-out"


def test_render_segment_underscore_delimits():
    env = {"category": "data", "id": "1"}
    assert render_segment("cat_$category_id_$id.csv", env) == "cat_data_id_1.csv"


def test_render_segment_unknown_var_raises():
    with pytest.raises(NoSuchPartitionVariable):
        render_segment("$nope", {})


def test_render_target_absolute_output_directory():
    env = {"outputDirectory": "file:/tmp/out"}
    assert render_target("$outputDirectory.csv", env) == "file:/tmp/out.csv"
    assert (
        render_target("$outputDirectory/f.csv", env) == "file:/tmp/out/f.csv"
    )


def test_collision_guard_global():
    plan = {"/a/x": "/t.csv", "/a/y": "/t.csv", "/a/z": "/u.csv"}
    assert has_collisions(plan)
    assert not has_collisions({"/a/x": "/t.csv", "/a/z": "/u.csv"})


def test_plan_moves_end_to_end_pure():
    files = [
        "/out/category=data/id=1/part-0.csv",
        "/out/category=info/id=3/part-0.csv",
    ]
    plan = plan_moves(files, "/out", "$outputDirectory/cat_$category_id_$id.csv")
    assert plan == {
        files[0]: "/out/cat_data_id_1.csv",
        files[1]: "/out/cat_info_id_3.csv",
    }


def test_move_files_is_idempotent_surface(spark, tmp_out):
    """move_files on an already-moved dir re-plans from current state; the
    manifest surface (plan dict) is always complete even when not moved."""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    res = _write(df, tmp_out, pattern="$outputDirectory/data.csv")
    assert res.moved and len(res.renames) == 1
    res2 = move_files(spark, tmp_out, "$outputDirectory/data.csv")
    assert len(res2.renames) == 1  # the moved file is listed again


# --- staged publish (r13 verdict item 4) ----------------------------------


def _visible_walk(root: str) -> set[str]:
    """Every non-hidden path under root, skipping dot/underscore-prefixed
    names the way Hadoop/Spark readers do."""
    import os

    seen: set[str] = set()
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d for d in dirnames if not d.startswith((".", "_"))
        ]
        for n in dirnames + [
            f for f in filenames if not f.startswith((".", "_"))
        ]:
            seen.add(os.path.relpath(os.path.join(dirpath, n), root))
    return seen


def test_staged_single_file_end_state_matches_unstaged(spark, tmp_out):
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    res = write_single_file(
        df, tmp_out, template="$outputDirectory.csv", staged=True
    )
    assert res.moved
    assert Path(tmp_out + ".csv").is_file()
    # no staging residue anywhere under the output dir
    assert not list(Path(tmp_out).glob("**/.__staging__-*"))


def test_staged_per_partition_moves(spark, tmp_out):
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    res = write_single_file(
        df,
        tmp_out,
        template="$outputDirectory/cat_$category_id_$id.csv",
        partition_by=["category", "id"],
        staged=True,
    )
    assert res.moved
    for cat, id_, _ in EXAMPLE_DATA:
        assert (Path(tmp_out) / f"cat_{cat}_id_{id_}.csv").is_file()
    assert not list(Path(tmp_out).glob("**/.__staging__-*"))


def test_staged_collision_abort_preserves_raw_layout(spark, tmp_out):
    """Parity with the unstaged abort: 5 files onto one target move
    NOTHING; the written Hive layout surfaces at the output dir."""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS).repartition(5)
    res = write_single_file(
        df,
        tmp_out,
        template="$outputDirectory.csv",
        single=False,
        staged=True,
    )
    assert not res.moved
    assert not Path(tmp_out + ".csv").exists()
    parts = list(Path(tmp_out).glob("part-*"))
    # 4 rows over 5 partitions: empty partitions write no CSV file, so
    # ≥2 part files is what makes the collision real
    assert len(parts) >= 2  # raw layout published, unmoved
    assert not list(Path(tmp_out).glob("**/.__staging__-*"))
    # and the published rows are intact
    got = sorted(
        line
        for p in parts
        for line in p.read_text().splitlines()
    )
    assert got == sorted(f"{c},{i},{v}" for c, i, v in EXAMPLE_DATA)


def test_staged_unknown_variable_raises_and_preserves_layout(
    spark, tmp_out
):
    """partition_by makes the raw publish rebuild key=value dirs that
    never existed at the output root (the _raw_publish mkdirs path)."""
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    with pytest.raises(NoSuchPartitionVariable):
        write_single_file(
            df,
            tmp_out,
            template="$outputDirectory/cat_$doesnotexist.csv",
            partition_by=["category", "id"],
            staged=True,
        )
    # layout published raw, Hive dirs reconstructed at visible level
    assert list(Path(tmp_out).glob("category=data/id=1/part-*"))
    assert list(Path(tmp_out).glob("category=info/id=3/part-*"))
    assert not list(Path(tmp_out).glob("**/.__staging__-*"))


def test_staged_publish_has_no_intermediate_visibility(spark, tmp_out):
    """The headline property: a concurrent reader polling the output dir
    during a staged write+publish NEVER sees the un-moved layout (part
    files or key=value dirs) — only nothing, hidden names, or the final
    file. The unstaged pass reliably exposes part files mid-pass (the
    window this closes)."""
    import threading
    import time

    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    observed: set[str] = set()
    stop = threading.Event()

    def watch() -> None:
        while not stop.is_set():
            if Path(tmp_out).exists():
                observed.update(_visible_walk(tmp_out))
            time.sleep(0.001)

    t = threading.Thread(target=watch)
    t.start()
    try:
        res = write_single_file(
            df,
            tmp_out,
            template="$outputDirectory/final.csv",
            staged=True,
        )
    finally:
        stop.set()
        t.join()
    assert res.moved
    bad = {
        p
        for p in observed
        if "part-" in p or "=" in p
    }
    assert not bad, f"unmoved layout was visible mid-publish: {bad}"
    assert observed <= {"final.csv"}


def test_staged_overwrite_clears_preexisting_content(spark, tmp_out):
    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    old = Path(tmp_out) / "stale.csv"
    old.parent.mkdir(parents=True)
    old.write_text("old,rows\n")
    res = write_single_file(
        df,
        tmp_out,
        template="$outputDirectory/final.csv",
        mode="overwrite",
        staged=True,
    )
    assert res.moved
    assert not old.exists()
    assert (Path(tmp_out) / "final.csv").is_file()


def test_staged_equals_unstaged_end_state_differential(spark, tmp_out):
    """Differential pin over the reference's hardest scenarios: for
    special-char, null/empty, and plain partition values, the staged
    and unstaged passes land BYTE-IDENTICAL final trees (same relative
    paths, same contents) — staging changes only mid-publish
    visibility, never the end state. (Unstaged trees keep the empty
    source partition-dir skeleton the reference also leaves behind;
    the comparison is over FILES.)"""
    import os

    df = spark.createDataFrame(
        [
            ("data with space", 1, "foo"),
            ("data_with_underscore", 2, "bar"),
            ("data-with-dash", 3, "baz"),
            ("", 4, "qux"),
            (None, 5, "quux"),
            ("plain", 6, "corge"),
        ],
        COLUMNS,
    )

    def tree(root: str) -> dict[str, bytes]:
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if f.startswith((".", "_")):
                    continue  # .crc sidecars etc. — reader-invisible
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = Path(p).read_bytes()
        return out

    pattern = "$outputDirectory/cat_$category_id_$id.csv"
    a, b = tmp_out + "-unstaged", tmp_out + "-staged"
    ra = write_single_file(
        df, a, template=pattern, partition_by=["category", "id"]
    )
    rb = write_single_file(
        df, b, template=pattern, partition_by=["category", "id"],
        staged=True,
    )
    assert ra.moved and rb.moved
    assert tree(a) == tree(b)
    assert len(tree(a)) == 6
    # the two plans agree on every FINAL target name
    assert sorted(
        t.rsplit("/", 1)[-1] for t in ra.renames.values()
    ) == sorted(t.rsplit("/", 1)[-1] for t in rb.renames.values())
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)


# --- staged save-mode semantics vs output_dir (ADVICE r14) -----------------
# The staging dir is always fresh, so the writer's own mode check never
# fires there; write_single_file must enforce error/ignore/append
# against output_dir itself, matching the unstaged pass.


def _file_tree(root: str) -> dict[str, bytes]:
    """Visible FILES only (relpath -> bytes). Dirs excluded on purpose:
    the staged pass documents file-level parity — the unstaged pass's
    empty drained key=value skeleton is a known directory-level delta."""
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = Path(p).read_bytes()
    return out


def test_staged_error_mode_raises_on_existing_output_dir(spark, tmp_out):
    from pyspark.errors import AnalysisException

    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    Path(tmp_out).mkdir(parents=True)
    (Path(tmp_out) / "pre.csv").write_text("keep\n")
    for m in ("error", "errorifexists"):
        with pytest.raises(AnalysisException):
            write_single_file(
                df, tmp_out, template="$outputDirectory.csv",
                mode=m, staged=True,
            )
    # raised BEFORE any write: no staging residue, content untouched
    assert not list(Path(tmp_out).glob(".__staging__-*"))
    assert _file_tree(tmp_out) == {"pre.csv": b"keep\n"}
    # and the unstaged pass raises the same class on the same state
    with pytest.raises(AnalysisException):
        write_single_file(
            df, tmp_out, template="$outputDirectory.csv", mode="error"
        )


def test_staged_ignore_mode_noops_but_still_runs_move_pass(spark, tmp_out):
    df1 = spark.createDataFrame(EXAMPLE_DATA[:2], COLUMNS)
    df2 = spark.createDataFrame(EXAMPLE_DATA[2:], COLUMNS)
    a, b = tmp_out + "-unstaged", tmp_out + "-staged"
    for out in (a, b):
        df1.coalesce(1).write.csv(out)
    ra = write_single_file(
        df2, a, template="$outputDirectory.csv", mode="ignore"
    )
    rb = write_single_file(
        df2, b, template="$outputDirectory.csv", mode="ignore", staged=True
    )
    # the write was a no-op (df2 appears nowhere), but the move pass ran
    # over the pre-existing content — unstaged behavior, exactly
    for out, res in ((a, ra), (b, rb)):
        assert res.moved
        got = sorted(Path(out + ".csv").read_text().splitlines())
        assert got == sorted(f"{c},{i},{v}" for c, i, v in EXAMPLE_DATA[:2])
    assert _file_tree(a) == _file_tree(b)
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)
    Path(a + ".csv").unlink(missing_ok=True)
    Path(b + ".csv").unlink(missing_ok=True)


def test_staged_append_replans_existing_files(spark, tmp_out):
    """Unstaged append re-plans EVERY file under output_dir; staged must
    plan pre-existing files (their real paths) alongside staged ones."""
    df1 = spark.createDataFrame(EXAMPLE_DATA[:3], COLUMNS)  # data/1,2
    df2 = spark.createDataFrame(EXAMPLE_DATA[3:], COLUMNS)  # info/3
    pattern = "$outputDirectory/cat_$category_id_$id.csv"
    a, b = tmp_out + "-unstaged", tmp_out + "-staged"
    for out in (a, b):
        # pre-existing Hive layout from a plain Spark write (no move)
        df1.coalesce(1).write.option(
            "mapreduce.fileoutputcommitter.marksuccessfuljobs", "false"
        ).partitionBy("category", "id").csv(out)
    ra = write_single_file(
        df2, a, template=pattern, partition_by=["category", "id"],
        mode="append",
    )
    rb = write_single_file(
        df2, b, template=pattern, partition_by=["category", "id"],
        mode="append", staged=True,
    )
    assert ra.moved and rb.moved
    # old AND new partitions are at their final names in both trees
    for out in (a, b):
        for cat, id_ in [("data", 1), ("data", 2), ("info", 3)]:
            assert (Path(out) / f"cat_{cat}_id_{id_}.csv").is_file(), out
    assert _file_tree(a) == _file_tree(b)
    assert len(rb.renames) == len(ra.renames)
    assert not list(Path(b).glob("**/.__staging__-*"))
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)


def test_staged_overwrite_sweeps_stale_orphan_staging_dirs(spark, tmp_out):
    import os
    import time

    df = spark.createDataFrame(EXAMPLE_DATA, COLUMNS)
    old = Path(tmp_out) / ".__staging__-deadbeefcrashed"
    young = Path(tmp_out) / ".__staging__-freshconcurrent"
    for d in (old, young):
        d.mkdir(parents=True)
        (d / "part-orphan.csv").write_text("orphan\n")
    two_h_ago = time.time() - 7200
    os.utime(old, (two_h_ago, two_h_ago))

    res = write_single_file(
        df, tmp_out, template="$outputDirectory/final.csv",
        mode="overwrite", staged=True,
    )
    assert res.moved
    assert (Path(tmp_out) / "final.csv").is_file()
    # crashed-run residue swept; a young dir (possibly a concurrent
    # writer's in-flight stage) survives, invisible to readers
    assert not old.exists()
    assert young.is_dir()
