"""yardstick_spark — a PySpark-native "Measures in SQL" engine.

Re-implements the capabilities of the sidequery/yardstick DuckDB extension
(Julian Hyde, "Measures in SQL", arXiv:2406.00251) as a measure-aware
semantic layer on Spark: a measure catalog, an AGGREGATE()/AT rewriter
that lowers to grouped-aggregate + null-safe-join / window plans, and the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference does not have.
"""

from .api import MeasureExpr, MeasureQuery, measure
from .catalog import MeasureCatalog, MeasureView, ViewMeasure
from .session import MeasureSession, YardstickError

__all__ = [
    "MeasureCatalog",
    "MeasureExpr",
    "MeasureQuery",
    "MeasureSession",
    "MeasureView",
    "ViewMeasure",
    "YardstickError",
    "connect",
    "measure",
]

__version__ = "0.1.0"


def connect(spark=None, **kwargs) -> MeasureSession:
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
    return MeasureSession(spark, **kwargs)
