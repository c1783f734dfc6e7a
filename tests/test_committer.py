"""Config-driven committer surface (reference activation parity).

The reference turns the move pass on with CONFIGURATION
(`spark.writer.movefiles` holding the template,
MoveFilesOutputCommitter.scala:9-17) so every write picks it up with no
call-site change. These tests pin the PySpark re-expression in
spark_file_mover_spark/committer.py: install once, conf on -> any
path-write moves; conf off -> plain write; explicit write_single_file
suppresses the config move (its own template wins); uninstall restores
the stock writer.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from spark_file_mover_spark.committer import (
    MOVE_FILES_OPTION,
    install_move_files_committer,
    uninstall_move_files_committer,
)
from spark_file_mover_spark.filemover import write_single_file

ROWS = [("data", 1, "foo"), ("data", 2, "bar"), ("info", 3, "baz")]
COLS = ["category", "id", "value"]


@pytest.fixture()
def committer(spark):
    install_move_files_committer()
    yield
    spark.conf.unset(MOVE_FILES_OPTION)
    uninstall_move_files_committer()


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="committer-")
    yield str(Path(d) / "test")
    shutil.rmtree(d, ignore_errors=True)


def test_conf_on_moves_any_write(spark, committer, tmp_out):
    spark.conf.set(MOVE_FILES_OPTION, "$outputDirectory.csv")
    df = spark.createDataFrame(ROWS, COLS)
    df.coalesce(1).write.csv(tmp_out)  # plain writer call, no library API
    assert Path(tmp_out + ".csv").is_file()


def test_conf_off_leaves_plain_write(spark, committer, tmp_out):
    df = spark.createDataFrame(ROWS, COLS)
    df.coalesce(1).write.csv(tmp_out)
    assert not Path(tmp_out + ".csv").exists()
    assert list(Path(tmp_out).glob("part-*"))


def test_partitioned_template_via_generic_save(spark, committer, tmp_out):
    spark.conf.set(
        MOVE_FILES_OPTION, "$outputDirectory/cat_$category_id_$id.parquet"
    )
    df = spark.createDataFrame(ROWS, COLS).coalesce(1)
    df.write.partitionBy("category", "id").format("parquet").save(tmp_out)
    for cat, id_, _ in ROWS:
        assert (Path(tmp_out) / f"cat_{cat}_id_{id_}.parquet").is_file()


def test_save_path_as_keyword(spark, committer, tmp_out):
    spark.conf.set(MOVE_FILES_OPTION, "$outputDirectory.json")
    df = spark.createDataFrame(ROWS, COLS).coalesce(1)
    df.write.format("json").save(path=tmp_out)
    assert Path(tmp_out + ".json").is_file()


def test_collision_parity_moves_nothing(spark, committer, tmp_out):
    """Reference scala :50-53: >1 source per target -> NO file moves."""
    spark.conf.set(MOVE_FILES_OPTION, "$outputDirectory.csv")
    df = spark.createDataFrame(ROWS, COLS).repartition(3)
    df.write.csv(tmp_out)
    assert not Path(tmp_out + ".csv").exists()
    assert len(list(Path(tmp_out).glob("part-*"))) >= 2


def test_unknown_variable_fails_the_write_call(spark, committer, tmp_out):
    spark.conf.set(MOVE_FILES_OPTION, "$outputDirectory/$nope.csv")
    df = spark.createDataFrame(ROWS, COLS).coalesce(1)
    from spark_file_mover_spark.filemover import NoSuchPartitionVariable

    with pytest.raises(NoSuchPartitionVariable):
        df.write.csv(tmp_out)  # parity: commitJob failure fails the job


def test_explicit_write_single_file_suppresses_conf_move(
    spark, committer, tmp_out
):
    """The two surfaces compose: an explicit template wins; the conf
    template must not ALSO fire on the internal save (double move)."""
    spark.conf.set(MOVE_FILES_OPTION, "$outputDirectory.SHOULD_NOT_EXIST")
    df = spark.createDataFrame(ROWS, COLS)
    res = write_single_file(df, tmp_out, template="$outputDirectory.csv")
    assert res.moved
    assert Path(tmp_out + ".csv").is_file()
    assert not Path(tmp_out + ".SHOULD_NOT_EXIST").exists()


def test_uninstall_restores_stock_writer(spark, tmp_out):
    from pyspark.sql.readwriter import DataFrameWriter

    stock = DataFrameWriter.csv
    install_move_files_committer()
    assert DataFrameWriter.csv is not stock
    install_move_files_committer()  # idempotent: no double wrap
    uninstall_move_files_committer()
    assert DataFrameWriter.csv is stock
    uninstall_move_files_committer()  # idempotent on empty
    assert DataFrameWriter.csv is stock
