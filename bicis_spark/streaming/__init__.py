"""Structured Streaming variants of the batch operators (SURVEY.md §2.9)."""
