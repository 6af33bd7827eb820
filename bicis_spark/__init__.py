"""bicis_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference pipeline (elsonidoq/bicis).

Brand-new, Spark-first design (see SURVEY.md): one IR (DataFrame/Catalyst)
end-to-end, explicit schemas, no RDD hops, no external KV store, broadcast
joins instead of per-row lookups, window functions instead of groupByKey.

Layout:
    session      SparkSession factory (AQE, UTC, shuffle sizing)
    schemas      explicit StructTypes for every table
    sources      readers/writers (parquet/csv/json) + dialect registry
    operators    relational/time-series operators (unify, split, profiles,
                 targets, features, dataset, quality)
    functions    scalar-function library (timestamp/duration parsing, iso
                 calendar, text metrics)
    plans        runner-level memoization + pipeline composition
    streaming    Structured Streaming variants of the batch operators
    extensions   LLM-data-pipeline operators (dedup, similarity search,
                 text analysis, multimodal columns)
"""

__version__ = "0.1.0"
