"""replibyte_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Qovery/Replibyte (reference: /root/reference,
Rust, v0.10.0), rebuilt Spark-first.

The reference is a dump → subset → transform → store → restore ETL pipeline
(see /root/reference/README.md:55-67). This package re-expresses every one of
its operators as declarative DataFrame plans optimized by Catalyst, and layers
on the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) that a 100 TB pipeline needs.

Layout
------
- ``session``      SparkSession bootstrap tuned for scale (AQE, Arrow, pushdown)
- ``catalog``      table loading / schema registry for the test fixtures
- ``dialect``      cross-dialect SQL expression builder (Spark + DuckDB) — the
                   single source of truth that keeps engine results and the
                   DuckDB oracle in exact agreement
- ``functions``    transformer library (reference §2.5) + text analysis
- ``operators``    subset closure, sampling, dedup family, similarity search
- ``sources``      parquet / sql-dump-text / jdbc readers
- ``sinks``        datastore (dump/restore manifest), sql-dump text sink
- ``plans``        config-driven pipeline assembly (dump create / restore)
- ``streaming``    structured-streaming ingestion & windowed aggregation
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
