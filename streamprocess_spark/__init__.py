"""streamprocess_spark — a PySpark-native analytics/stream engine.

A from-scratch rebuild of the query and data-processing capabilities of
the StreamProcess reference (queue-based multimodal stream pipeline),
re-expressed Spark-first: DataFrame/SQL for the relational surface,
Structured Streaming + applyInPandasWithState for the stateful core,
Arrow pandas UDFs for the per-record transform library.

Layout:
    session        SparkSession factory (scale-tuned confs)
    schemas        StructType registry for every entity
    io.tables      parquet table loaders / temp-view registration
    io.streams     file-stream replay helpers (events as a stream)
    operators.*    routing, batching, aggregation, window, join, dedup,
                   similarity, text-analysis operators
    functions.*    pandas-UDF scalar library (audio/image/inference mocks)
    streaming.*    watermarked windows, stateful sessionizer, queue dataflow
    plans.queries  the named query registry (Spark builder + DuckDB oracle)
"""

from streamprocess_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
