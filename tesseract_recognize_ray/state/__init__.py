"""Checkpoint manifest + resumable partitioned execution (SURVEY.md §4)."""
