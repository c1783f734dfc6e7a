"""Non-local-scheme smoke for the file-mover plane.

The reference's fixture is a real MiniDFSCluster on hdfs://localhost:9000
(`MoveFilesOutputCommiterTest.scala:18-31`); this container has no HDFS
test jars, so the next-best proof is a mocked FileSystem client driven
through the REAL py4j seams: `move_files` / `list_output_files` /
`plan_moves_df` run unmodified against real Hadoop ``Path`` objects
carrying ``hdfs://namenode:9000`` URIs, with the FS client's
resolvePath / listFiles / rename observed and recorded.

What this pins down (everything scheme-specific in the mover):

* the qualified root comes from ``fs.resolvePath(Path("/"))`` and keeps
  scheme+authority, so every rendered target is a fully-qualified
  ``hdfs://namenode:9000/...`` URI (never a bare ``/...`` path);
* partition extraction sees the URI path segments, not the authority;
* renames are issued through the SAME FS client with source and target
  on the same scheme (HDFS rename is same-FS metadata-only);
* collision aborts before any rename reaches the client.
"""

from __future__ import annotations

import pytest

from spark_file_mover_spark import filemover
from spark_file_mover_spark.filemover import (
    list_output_files,
    move_files,
    plan_moves_df,
)

NN = "hdfs://namenode:9000"


class FakeStatus:
    def __init__(self, jpath, size):
        self._p = jpath
        self._size = size

    def getPath(self):
        return self._p

    def getLen(self):
        return self._size


class FakeIter:
    def __init__(self, statuses):
        self._it = iter(statuses)
        self._next = None

    def hasNext(self):
        if self._next is None:
            self._next = next(self._it, None)
        return self._next is not None

    def next(self):
        if not self.hasNext():
            raise StopIteration
        out, self._next = self._next, None
        return out


class FakeHdfs:
    """Stand-in for the py4j Hadoop FileSystem client: same call surface
    the mover uses (resolvePath / listFiles / rename), hdfs semantics
    (qualify against the namenode authority; rename is metadata-only)."""

    def __init__(self, jvm, files: dict[str, int]):
        self._jvm = jvm
        self.files = dict(files)  # path string -> size
        self.renames: list[tuple[str, str]] = []
        self.resolved: list[str] = []
        self.deleted: list[str] = []

    def _jpath(self, s: str):
        return self._jvm.org.apache.hadoop.fs.Path(s)

    def resolvePath(self, jpath):
        s = jpath.toString()
        self.resolved.append(s)
        if not s.startswith(NN):
            s = NN + s  # qualify a scheme-less path against the namenode
        return self._jpath(s)

    def listFiles(self, jpath, recursive):
        assert recursive is True
        prefix = jpath.toString().rstrip("/") + "/"
        return FakeIter(
            [
                FakeStatus(self._jpath(p), sz)
                for p, sz in sorted(self.files.items())
                if p.startswith(prefix)
            ]
        )

    def rename(self, src, dst):
        s, d = src.toString(), dst.toString()
        if s not in self.files or d in self.files:
            return False  # hdfs rename: false, never throws (scala :52)
        self.files[d] = self.files.pop(s)
        self.renames.append((s, d))
        return True

    # --- staged-publish surface (exists / mkdirs / delete) ---

    def exists(self, jpath):
        s = jpath.toString().rstrip("/")
        return s in self.files or any(
            p.startswith(s + "/") for p in self.files
        )

    def mkdirs(self, jpath):
        return True  # dirs are implicit in the path-map model

    def delete(self, jpath, recursive):
        assert recursive is True
        s = jpath.toString().rstrip("/")
        for p in [p for p in self.files if p == s or p.startswith(s + "/")]:
            del self.files[p]
        self.deleted.append(s)
        return True


@pytest.fixture()
def fake_fs_factory(spark, monkeypatch):
    def install(files: dict[str, int]) -> FakeHdfs:
        fake = FakeHdfs(spark._jvm, files)

        def _fake_hadoop_fs(spark_, path: str):
            return fake, fake._jpath(path)

        monkeypatch.setattr(filemover, "_hadoop_fs", _fake_hadoop_fs)
        return fake

    return install


OUT = f"{NN}/data/out"


def test_list_excludes_success_and_keeps_scheme(spark, fake_fs_factory):
    fake = fake_fs_factory(
        {
            f"{OUT}/category=data/part-0.csv": 10,
            f"{OUT}/category=info/part-0.csv": 20,
            f"{OUT}/_SUCCESS": 0,
        }
    )
    files = list_output_files(spark, OUT)
    assert files == [
        (f"{OUT}/category=data/part-0.csv", 10),
        (f"{OUT}/category=info/part-0.csv", 20),
    ]
    assert fake.renames == []


def test_move_renders_fully_qualified_targets_and_renames(
    spark, fake_fs_factory
):
    fake = fake_fs_factory(
        {
            f"{OUT}/category=data/part-0.csv": 10,
            f"{OUT}/category=info/part-0.csv": 20,
            f"{OUT}/_SUCCESS": 0,
        }
    )
    res = move_files(spark, OUT, "$outputDirectory/cat_$category.csv")
    assert res.moved
    # targets are fully qualified hdfs URIs (root folded from
    # resolvePath(Path("/")) → scheme+authority preserved, scala :37)
    assert res.renames == {
        f"{OUT}/category=data/part-0.csv": f"{OUT}/cat_data.csv",
        f"{OUT}/category=info/part-0.csv": f"{OUT}/cat_info.csv",
    }
    # renames executed through the same client, same scheme both sides
    assert fake.renames == sorted(res.renames.items())
    # the root fold consulted resolvePath for both the out dir and "/"
    assert OUT in fake.resolved and "/" in fake.resolved


def test_collision_reaches_no_rename_call(spark, fake_fs_factory):
    fake = fake_fs_factory(
        {
            f"{OUT}/category=data/part-0.csv": 10,
            f"{OUT}/category=data/part-1.csv": 11,
        }
    )
    res = move_files(spark, OUT, "$outputDirectory/cat_$category.csv")
    assert not res.moved
    assert fake.renames == []  # guard fired before ANY client rename


def test_plan_moves_df_matches_move_files_targets(spark, fake_fs_factory):
    files = {
        f"{OUT}/category=data/part-0.csv": 10,
        f"{OUT}/category=info/part-0.csv": 20,
    }
    fake = fake_fs_factory(files)
    manifest = {
        r.source: r.target
        for r in plan_moves_df(
            spark, OUT, "$outputDirectory/cat_$category.csv"
        ).collect()
    }
    res = move_files(spark, OUT, "$outputDirectory/cat_$category.csv")
    # the DataFrame manifest and the executed plan agree exactly —
    # including the scheme+authority on every target (ADVICE r02: the
    # manifest used to resolve against root "/" and emit bare paths)
    assert manifest == res.renames
    assert all(t.startswith(NN) for t in manifest.values())


# --- staged publish over the non-local scheme (r14) -----------------------


def test_staged_publish_renames_direct_to_final_on_hdfs(
    spark, fake_fs_factory
):
    """The staged pass on hdfs:// is single-hop: every rename goes
    STAGED source -> fully-qualified FINAL target (metadata-only,
    same-FS), the un-moved layout never exists outside the hidden
    staging dir, and the staging dir is deleted after publish."""
    stage = f"{OUT}/.__staging__-abc123"
    fake = fake_fs_factory(
        {
            f"{stage}/category=data/part-0.csv": 10,
            f"{stage}/category=info/part-0.csv": 11,
            f"{stage}/_SUCCESS": 0,
        }
    )
    res = filemover._publish_staged(
        spark, stage, OUT, "$outputDirectory/$category.csv"
    )
    assert res.moved
    # _SUCCESS excluded; both data files at final, qualified targets
    assert {p for p in fake.files if not p.endswith("_SUCCESS")} == {
        f"{OUT}/data.csv",
        f"{OUT}/info.csv",
    }
    for s, d in fake.renames:
        assert ".__staging__" in s and ".__staging__" not in d
        assert s.startswith(NN) and d.startswith(NN)
    assert fake.deleted == [stage]
    # the plan is rendered in FINAL-layout terms (virtual sources)
    assert all(".__staging__" not in src for src in res.renames)


def test_staged_collision_publishes_raw_layout_on_hdfs(
    spark, fake_fs_factory
):
    stage = f"{OUT}/.__staging__-abc123"
    fake = fake_fs_factory(
        {
            f"{stage}/part-0.csv": 10,
            f"{stage}/part-1.csv": 11,
        }
    )
    res = filemover._publish_staged(
        spark, stage, OUT, "$outputDirectory.csv"
    )
    assert not res.moved
    assert f"{OUT}.csv" not in fake.files
    # raw layout published at the unstaged positions, staging gone
    assert set(fake.files) == {f"{OUT}/part-0.csv", f"{OUT}/part-1.csv"}
    assert fake.deleted == [stage]
