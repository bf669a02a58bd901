"""map_batches / map_groups stage bodies (SURVEY.md §2.2–§2.4)."""
