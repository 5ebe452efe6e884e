"""cinegraph_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``Data-Wrangling-and-Visualization-2026/CineGraph`` (subtitle pipeline →
emotion windows → feature aggregation → cluster tree → tree/vector serving)
as idiomatic Spark DataFrame / SQL / Structured Streaming operators, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) a 100 TB training-data pipeline needs.

Layout
------
- ``session``    — SparkSession factory (AQE, Arrow, sane shuffle defaults)
- ``schemas``    — single-definition StructType registry (SURVEY §1.3)
- ``sources``    — readers/writers for the engine's tables and text corpora
- ``functions``  — pure column-expression libraries (text cleaning F1-F11,
                   text stats, vector math) — JVM-side, codegen-friendly
- ``operators``  — DataFrame-in/DataFrame-out operators (windowize, features,
                   dedup, similarity, tree queries, clustering)
- ``queries``    — the declared query registry: every operator exposed as a
                   (spark_fn, duckdb_oracle_sql) pair over the driver tables
- ``streaming``  — Structured Streaming surface (windows, watermark, dedup)
- ``multimodal`` — binary-column plumbing (decode stubs, real Spark plumbing)
"""

__version__ = "0.1.0"
