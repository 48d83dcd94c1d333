"""Stateful streaming operators (SURVEY.md §2.10)."""
