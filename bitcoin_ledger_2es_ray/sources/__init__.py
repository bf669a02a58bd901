"""Sources / sinks (SURVEY.md §2.1): corpus reader, synthetic corpus, queries."""
