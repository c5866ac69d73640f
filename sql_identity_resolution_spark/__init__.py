"""sql_identity_resolution_spark — a from-scratch, PySpark-native identity-resolution
engine with the query semantics of the reference ``anilkulkarni87/sql-identity-resolution``
(blocking → matching → clustering), re-expressed as declarative DataFrame operators.

Layout
------
- ``session``    : SparkSession builder tuned for AQE / Arrow / UTC.
- ``config``     : configuration-as-data (rules, mappings, exclusions, survivorship).
- ``sources``    : versioned parquet catalog with MERGE semantics (Iceberg-compatible
                   interface), transcripts source with signature building.
- ``functions``  : vectorized pandas/Arrow UDFs (MinHash, similarity) + JVM-side helpers.
- ``operators``  : the pipeline stages as pure DataFrame->DataFrame functions, plus
                   training-data operators (dedup, ANN, text analysis, multimodal).
- ``plans``      : the end-to-end pipeline orchestration (FULL/INCR/dry-run, metrics,
                   lineage, resume).
- ``streaming``  : Structured Streaming incremental driver (foreachBatch micro-runs).

Reference semantics are cited per-function as ``file:line`` into ``/root/reference``.
"""

__version__ = "0.1.0"

from sql_identity_resolution_spark.config import (  # noqa: F401
    AttributeMapping,
    EngineConfig,
    Exclusion,
    IdentifierMapping,
    Rule,
    SourceTable,
    SourceTrust,
)
from sql_identity_resolution_spark.plans.pipeline import (  # noqa: F401
    ConvergenceError,
    IDRPipeline,
    RunResult,
)
