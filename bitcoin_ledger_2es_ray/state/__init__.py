"""Checkpoint / lineage state (SURVEY.md §2.1 S4, §3.3)."""
