"""Sources & sinks (SURVEY.md §2.1)."""

from bicis_spark.sources.io import read_table, read_tables, write_parquet

__all__ = ["read_table", "read_tables", "write_parquet"]
