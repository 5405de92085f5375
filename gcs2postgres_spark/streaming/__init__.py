"""Structured Streaming twins of the batch event-window queries
(SURVEY.md §2.7)."""
