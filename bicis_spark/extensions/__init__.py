"""LLM-data-pipeline extension operators (SURVEY.md §7.8, BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
columns. Not present in the reference — these are the ops a 100 TB
training-data pipeline needs, built Spark-first on the same engine."""
