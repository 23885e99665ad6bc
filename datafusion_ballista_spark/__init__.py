"""datafusion_ballista_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of apache/datafusion-ballista.

The reference engine (studied read-only at /root/reference) is a distributed
query layer around Apache DataFusion; Spark already owns that entire
distribution layer (scheduler, shuffle, AQE, broadcast — SURVEY.md §0, §4).
This package therefore provides:

- a thin session facade mirroring Ballista's ``SessionContext`` surface
  (reference: ballista/client/src/extension.rs:64-127) on ``SparkSession``
- a config-translation table (``ballista.* -> spark.*``,
  reference: ballista/core/src/config.rs:32-171)
- a scalar-function compat layer for DataFusion functions with no direct
  PySpark builtin (reference registry: ballista/core/src/registry.rs:20-73)
- SQL-dialect shims for DataFusion-isms Spark SQL rejects
- the relational operator inventory re-expressed Spark-first
  (``inventory/``), each query paired with a DuckDB oracle
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) built partition-parallel
"""

from datafusion_ballista_spark.session import BallistaSession, get_session

__all__ = ["BallistaSession", "get_session"]
__version__ = "0.1.0"
