"""big_data_virus_analysis_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query semantics of
davisengeler/big-data-virus-analysis (a Spark-1.4.1 RDD pipeline that
classifies Windows executables from API-call logs) as an idiomatic
Spark DataFrame/SQL engine, extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text quality,
streaming).

Layout:
  sources/    readers + writers (parquet tables, raw api-log text, LIBSVM)
  functions/  column-expression helpers (entropy, info-gain, text, vectors)
  operators/  composed dataflow operators (feature ranking, dedup, ANN, reports)
  ml/         pyspark.ml surface (KMeans, DecisionTree, LinearSVC grids)
  streaming/  Structured Streaming over the events table
  plans/      the query catalog consumed by __spark_entry__.py

Design stance (100 TB target): declare logical plans with the DataFrame
API and let Catalyst/AQE pick physical strategies; broadcast dimension
tables; keep hot paths inside whole-stage codegen (no row-at-a-time
Python UDFs); Arrow-batched pandas UDFs only where VectorUDT assembly
or opaque binary decode genuinely requires Python.
"""

__version__ = "0.1.0"
