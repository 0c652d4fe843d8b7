"""imitation_learning_data_pipeline_spark — PySpark-native analytics/ETL engine.

A from-scratch, Spark-first rebuild of the capabilities of
saviogeorge/Imitation_Learning_Data_Pipeline (a five-stage Polars/Python
ETL pipeline for LeRobot-format robot-demonstration data), re-expressed as
declarative DataFrame plans so Catalyst/Tungsten/AQE pick the physical
strategy, plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal columns) such a pipeline needs at 100 TB.

Layout:
  sources/    — schema-typed readers, file listing/fingerprint sources
  functions/  — scalar/vector/text column expression builders (pure F.*)
  operators/  — window ops, stats reduction, dedup, similarity ops
  plans/      — named end-to-end query plans (the driver-contract surface)
  pipeline/   — the five reference stages as DataFrame transformations
  streaming/  — Structured Streaming variants (incremental discover)
"""

__version__ = "0.1.0"
