"""Declared queries for the LLM-data-pipeline extension operators
(dedup, similarity search, text analysis, multimodal). Filled in as
operators land (SURVEY.md §7.8)."""

from __future__ import annotations
