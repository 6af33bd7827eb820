"""Declared queries for the full bicis pipeline stages (split, window
target, lag features, dataset assembly, quality). Filled in as operators
land (SURVEY.md §7 build order)."""

from __future__ import annotations
