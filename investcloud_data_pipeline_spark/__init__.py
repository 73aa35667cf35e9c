"""investcloud_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
``Jayaswaroop/investcloud-data-pipeline`` (a Databricks medallion streaming
ETL over user-activity logs), extended with the operators a large-scale
training-data pipeline needs: deduplication (exact + fuzzy), similarity
search, multimodal columns, and text analysis.

Layout:
    config      — paths, schemas (reference ``00_utils.py`` config, enforced)
    session     — SparkSession builder with scale-posture defaults
    datagen     — deterministic activity-log generator (reference
                  ``data_generator/data_generator.py`` semantics, seeded)
    sources/    — batch + streaming readers (S1-S3), corrupt-record routing
    operators/  — quality split, dedup, enrichment, gold aggregation,
                  fuzzy dedup, similarity search, text analysis, multimodal
    functions/  — reusable column expressions (vector math, text metrics)
    plans/      — named query plans (reference pipeline batch forms,
                  TPC-H-style relational coverage)
    streaming/  — structured-streaming pipeline (bronze/silver/gold)

Everything is DataFrame/Spark-SQL first: plans are declared logically and
Catalyst/Tungsten choose the physical strategy. Python UDFs appear only
where built-ins cannot express the semantics, and then always as
Arrow-vectorized pandas UDFs / ``mapInPandas``.
"""

__version__ = "0.1.0"
