"""PySpark-native analytics engine with the query/data-processing
capabilities of paypay/DataEngineerChallenge (spec at
/root/reference/README.md), re-expressed Spark-first.

The reference is a spec-only interview challenge (no implementation code);
every operator here is derived from its declared analytical goals
(README.md:7-23), input format (README.md:44-45) and constraints
(README.md:40-43), plus the driver's north-star LLM-pipeline extensions.

Layout:
  session.py    SparkSession factory with scale-oriented defaults
  registry.py   query/oracle registration backing __spark_entry__.py
  sources/      parquet + ELB-log + streaming sources, sinks
  operators/    sessionization, joins, dedup, similarity
  functions/    vector / UDF / exact-arithmetic column helpers
  streaming/    Structured Streaming twins of the batch operators
  ml/           MLE goal pipelines (pyspark.ml)
  queries/      registered queries()/oracle_sql() pairs per SURVEY §2
"""

__version__ = "0.1.0"
