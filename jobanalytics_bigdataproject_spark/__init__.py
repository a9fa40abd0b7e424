"""jobanalytics_bigdataproject_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference project
``Jana-Alrzoog/JobAnalytics_BigDataProject`` (a 4-phase Spark/Scala pipeline:
CSV→Parquet ETL, RDD analytics, SQL reporting, MLlib regression) as an
idiomatic, composable Spark SQL + DataFrame library, extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
streaming event processing) designed for 100 TB scale.

Design rules (see SURVEY.md):
- DataFrame/SQL only; zero RDD usage; zero row-at-a-time Python UDFs on the
  hot path (the whole reference surface maps to JVM built-ins).
- Declarative plans → Catalyst/AQE pick physical strategy; we add explicit
  ``broadcast()`` hints for dimension joins and keep windows partitioned.
- Every operator is a ``DataFrame -> DataFrame`` function: composable and
  unit-testable without I/O.
"""

from jobanalytics_bigdataproject_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
