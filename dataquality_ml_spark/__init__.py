"""dataquality_ml_spark — a PySpark-native data-quality / analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference application ``francesco-camaione/dataquality_ML``
(see SURVEY.md): data-quality profiling, feature pipelines, anomaly scoring,
threshold derivation, evaluation metrics — plus the large-scale training-data
operators a 100 TB pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing).

Design stance (SURVEY.md §7):
- Declarative DataFrame plans; Catalyst/Tungsten pick physical strategy.
- Row data never visits the driver; only aggregates and model weights do.
- Models fit on bounded samples, applied distributed via Arrow pandas UDFs.
- Every SQL-expressible operator is oracle-checked against DuckDB.
"""

from dataquality_ml_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
