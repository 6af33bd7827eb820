"""Query registry + pipeline composition (SURVEY.md §2.12, §3)."""
