"""PySpark-native analytics engine with the capabilities of
aws-samples/streaming-ingestion-from-snowflake-to-apache-iceberg-with-apache-flink.

The reference is a Flink 1.18 job that incrementally ingests one Snowflake
table into an Iceberg table (see SURVEY.md). This package re-expresses every
operator of that pipeline — plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing) —
as idiomatic PySpark DataFrame programs: declarative plans that Catalyst
optimizes, shuffles only on real keys, broadcasts for small dimensions, and
Pandas UDFs only where built-ins genuinely cannot express the semantics.

Layout:
- ``config``     — the reference's 19-parameter surface + validations
- ``schema``     — the reference's type whitelist as StructType utilities
- ``session``    — SparkSession builder tuned for scale (AQE, shuffle sizing)
- ``sources``    — parquet/JDBC readers, snowflake-like staging views
- ``operators``  — the operator inventory from SURVEY.md §2 (pure DataFrame fns)
- ``functions``  — reusable column expressions (vector math, hashing, text)
- ``sinks``      — partitioned catalog tables: append / upsert-merge / overwrite
- ``streaming``  — the incremental micro-batch ingestion runtime (the job)
- ``plans``      — plan-inspection helpers (pushdown/codegen assertions)
"""

__version__ = "0.1.0"
