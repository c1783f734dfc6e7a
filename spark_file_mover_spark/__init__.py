"""spark_file_mover_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``nightscape/spark-file-mover`` (a Spark output-committer extension for
landing writes as single named files — see
``/root/reference/src/main/scala/dev/mauch/spark/MoveFilesOutputCommitter.scala``)
plus the relational / windowing / streaming / LLM-data-pipeline operator
substrate mandated for 100 TB-scale training-data processing.

Design stance (SURVEY.md §3-§4): everything declarative goes through the
stock DataFrame/SQL API so Catalyst + AQE own planning; the file-mover is
an idiomatic driver-side post-write pass (no committer subclass needed in
Python); Python touches data only through Arrow-vectorized pandas UDFs.
"""

from spark_file_mover_spark.session import get_spark
from spark_file_mover_spark.registry import QUERIES, ORACLES

__all__ = ["get_spark", "QUERIES", "ORACLES"]
__version__ = "0.2.0"
