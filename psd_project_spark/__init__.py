"""psd_project_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference system lapankrz/PSD-Project (a Flink 1.12
investment-portfolio risk-alerting pipeline; see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the stream path, and Arrow-vectorized Pandas UDFs only
where built-in operators cannot express the semantics.

Layout
------
- ``functions/``  — measure & scalar expression library (the six risk
  measures of StreamingJob.java:184-234, text/array helpers).
- ``operators/``  — composed relational operators (count windows, alert
  pipeline, dedup, similarity, as-of joins, analytics).
- ``sources/``    — table/stream registries and parsers (CSV sample
  stream with DROPMALFORMED accounting, parquet test tables).
- ``streaming/``  — Structured Streaming jobs (stateful count-window
  operator, alert sink).
- ``plans/``      — plan-inspection helpers (pushdown/broadcast checks).
- ``fixtures/``   — deterministic generators mirroring dataGeneration/psd.R.
"""

__version__ = "0.1.0"
