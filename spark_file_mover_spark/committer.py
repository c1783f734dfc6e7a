"""Config-driven activation of the move-files pass (reference parity).

The reference is activated by CONFIGURATION, not by call site: setting
``spark.sql.sources.outputCommitterClass`` to the committer class plus
the ``spark.writer.movefiles`` template makes EVERY Hadoop-committed
write run the rename pass inside ``commitJob``
(MoveFilesOutputCommitter.scala:9-17, :16-53) with no code change at
any write call. PySpark cannot inject a Java committer subclass, so
this module re-expresses the same injection point at the
``DataFrameWriter`` boundary instead:

    >>> install_move_files_committer()          # once per process
    >>> spark.conf.set(MOVE_FILES_OPTION, "$outputDirectory.csv")
    >>> df.coalesce(1).write.csv(path)          # any write, any call site
    # -> the post-write move pass ran; path + ".csv" is the single file

Activation semantics match the reference: the conf key is the SAME
(``spark.writer.movefiles``), its VALUE is the template (scala :16-17
reads the template straight from the option), conf set -> behavior on
for every subsequent path-write in that session, conf unset -> plain
writes. The moved end state is identical to the committer's because
``df.write...save(path)`` blocks until job commit — the residual
difference remains the concurrent-reader visibility window documented
in :mod:`spark_file_mover_spark.filemover` (use
``write_single_file(..., staged=True)`` where that window matters).

Scope and honesty notes:

* The wrap covers the classic ``pyspark.sql.readwriter.DataFrameWriter``
  path methods (``save``/``parquet``/``csv``/``json``/``orc``/``text``
  — the convenience methods call the JVM directly, so each is wrapped,
  not just ``save``). Spark Connect sessions and non-path
  (``saveAsTable``) writes are out of scope, as is any OTHER JVM
  process writing with the same conf — the reference's Java committer
  would cover those; this surface is per-Python-process by nature.
* ``write_single_file`` / ``move_files`` remain the explicit API; the
  installer suppresses itself inside ``write_single_file`` so the two
  surfaces compose without double-moving (the explicit call's template
  wins, exactly as a user passing an explicit template expects).
"""

from __future__ import annotations

import contextlib
import functools
import threading

from pyspark.sql.readwriter import DataFrameWriter

from spark_file_mover_spark.filemover import MOVE_FILES_OPTION, move_files

__all__ = [
    "MOVE_FILES_OPTION",
    "install_move_files_committer",
    "uninstall_move_files_committer",
    "suppress_move_on_write",
]

# method name -> original unbound function; non-empty iff installed
_PATCHED: dict[str, object] = {}

# every DataFrameWriter method that takes a filesystem path (the
# convenience methods do NOT funnel through Python-side save(): each
# calls its own JVM method, so each needs its own wrap)
_PATH_METHODS = ("save", "parquet", "csv", "json", "orc", "text")

_tls = threading.local()


@contextlib.contextmanager
def suppress_move_on_write():
    """Disable the config-driven move for writes issued inside the
    block (re-entrant; used by ``write_single_file`` so its internal
    save never double-moves under an installed committer)."""
    prev = getattr(_tls, "off", False)
    _tls.off = True
    try:
        yield
    finally:
        _tls.off = prev


def _conf_template(spark) -> str | None:
    try:
        value = spark.conf.get(MOVE_FILES_OPTION, None)
    except Exception:
        return None
    return value or None


def install_move_files_committer() -> None:
    """Wrap the writer's path methods once per process. Idempotent."""
    if _PATCHED:
        return
    for name in _PATH_METHODS:
        orig = getattr(DataFrameWriter, name)

        @functools.wraps(orig)
        def wrapper(self, path=None, *args, __orig=orig, **kwargs):
            out = __orig(self, path, *args, **kwargs)
            target = path if path is not None else kwargs.get("path")
            if target is not None and not getattr(_tls, "off", False):
                spark = self._df.sparkSession
                template = _conf_template(spark)
                if template:
                    # reference parity: the pass runs as part of the
                    # write (commitJob); an unknown-variable error
                    # therefore fails the write call itself (scala :40)
                    move_files(spark, target, template)
            return out

        _PATCHED[name] = orig
        setattr(DataFrameWriter, name, wrapper)


def uninstall_move_files_committer() -> None:
    """Restore the original writer methods. Idempotent."""
    for name, orig in _PATCHED.items():
        setattr(DataFrameWriter, name, orig)
    _PATCHED.clear()
