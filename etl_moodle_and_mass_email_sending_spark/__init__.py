"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of the reference repo ``smoraleslo/ETL-Moodle-and-mass-email-sending``
(surveyed in SURVEY.md), re-expressed Spark-first.

Layout
------
- ``functions/`` : columnar scalar functions (accent fold, username rules,
  email selection, portable hashing, template/pattern compiler).
- ``sources/``   : readers — header-promotion Excel/CSV, schema-variant
  dispatch normalizer, parquet catalog.
- ``plans/``     : end-to-end declarative pipelines (Moodle normalize, mail
  render) built only from Column expressions.
- ``sinks/``     : single-file CSV sink, SMTP foreachPartition sink with
  retry/throttle/receipts/dry-run.
- ``operators/`` : relational (join/agg/window/setops) and LLM-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal).
- ``streaming/`` : Structured Streaming variant of the send pipeline.

Every operator is designed for 100 TB scale: declarative plans (Catalyst
optimizes), broadcast joins for dims, no driver-side collects in any hot
path, AQE enabled by default in :func:`session.get_spark`.
"""

__version__ = "0.1.0"
