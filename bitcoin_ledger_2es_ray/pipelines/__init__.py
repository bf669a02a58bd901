"""End-to-end pipelines (SURVEY.md §3): build, query, resume."""
